// Header-only Viewer stub shadowing the reference include/Viewer.h (which
// requires Pangolin). The baseline binaries run with useViewer=false, but
// System constructs the Viewer object unconditionally, so the class must
// exist with the methods System/Tracking call.
#ifndef VIEWER_H
#define VIEWER_H

#include <string>

namespace ORB_SLAM2 {

class Tracking;
class FrameDrawer;
class MapDrawer;
class System;

class Viewer {
 public:
  Viewer(System*, FrameDrawer*, MapDrawer*, Tracking*, const std::string&) {}
  void Run() {}
  void RequestFinish() {}
  void RequestStop() {}
  bool isFinished() { return true; }
  bool isStopped() { return true; }
  void Release() {}
};

}  // namespace ORB_SLAM2
#endif
