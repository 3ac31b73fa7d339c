// Pangolin stub: the baseline build runs headless (useViewer=false); the only
// Pangolin symbol reachable outside Viewer/MapDrawer (both stubbed) is
// System::Shutdown's BindToContext.
#pragma once
#include <string>
namespace pangolin {
inline void BindToContext(const std::string&) {}
struct OpenGlMatrix { double m[16]; };
}  // namespace pangolin
