// Header-only MapDrawer stub shadowing the reference include/MapDrawer.h
// (which requires Pangolin). Only SetCurrentCameraPose is reachable from the
// stubbed-viewer build; the draw methods are dead no-ops.
#ifndef MAPDRAWER_H
#define MAPDRAWER_H

#include <mutex>
#include <string>

#include <opencv2/core/core.hpp>

#include "pangolin/pangolin.h"

namespace ORB_SLAM2 {

class Map;

class MapDrawer {
 public:
  MapDrawer(Map* pMap, const std::string&) : mpMap(pMap) {}
  void DrawMapPoints() {}
  void DrawKeyFrames(bool, bool) {}
  void DrawCurrentCamera(pangolin::OpenGlMatrix&) {}
  void SetCurrentCameraPose(const cv::Mat& Tcw) {
    std::unique_lock<std::mutex> lock(mMutexCamera);
    mCameraPose = Tcw.clone();
  }
  void SetReferenceKeyFrame(void*) {}
  void GetCurrentOpenGLCameraMatrix(pangolin::OpenGlMatrix&) {}

  Map* mpMap;

 private:
  cv::Mat mCameraPose;
  std::mutex mMutexCamera;
};

}  // namespace ORB_SLAM2
#endif
