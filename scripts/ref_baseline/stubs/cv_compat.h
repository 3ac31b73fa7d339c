// Legacy OpenCV 2.4 API names for building the reference against OpenCV 4.x,
// plus the C++11 feature macro the reference's Examples expect and unistd.h
// for their usleep pacing loops. Force-included into every reference TU.
//
// The Viewer/MapDrawer stubs are force-included FIRST: quoted includes
// resolve relative to the including file, so the reference's own headers
// would otherwise win over the stub directory; pre-claiming their include
// guards makes the real (Pangolin-dependent) headers no-ops.
#pragma once
#ifndef COMPILEDWITHC11
#define COMPILEDWITHC11 1
#endif
#include <unistd.h>
#include <opencv2/core/core_c.h>
#include <opencv2/imgproc/types_c.h>
#include <opencv2/imgcodecs/legacy/constants_c.h>
#include "Viewer.h"
#include "MapDrawer.h"
