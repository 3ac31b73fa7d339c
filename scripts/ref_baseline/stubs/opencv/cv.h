// OpenCV 1.x umbrella header shim for OpenCV 4.x builds of the reference.
#pragma once
#include <opencv2/opencv.hpp>
#include <opencv2/core/core_c.h>
#include <opencv2/imgproc/types_c.h>
