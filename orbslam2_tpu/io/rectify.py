"""Stereo rectification from the reference's EuRoC-style YAML.

The reference's EuRoC stereo driver builds cv2 rectification maps from the
LEFT.*/RIGHT.* opencv-matrix blocks in the settings YAML
(Examples/Stereo/stereo_EuRoC.cpp:35-90). This helper reads the same keys
via cv2.FileStorage and returns per-image remap functions (host IO path).
"""
from __future__ import annotations

import numpy as np


def load_rectification(settings_yaml):
    """Returns (rectify_left, rectify_right, fx, fy, cx, cy, bf) or None if
    the YAML carries no LEFT./RIGHT. blocks."""
    import cv2
    fs = cv2.FileStorage(str(settings_yaml), cv2.FILE_STORAGE_READ)
    try:
        def mat(key):
            node = fs.getNode(key)
            return None if node.empty() else node.mat()

        K_l, K_r = mat("LEFT.K"), mat("RIGHT.K")
        P_l, P_r = mat("LEFT.P"), mat("RIGHT.P")
        R_l, R_r = mat("LEFT.R"), mat("RIGHT.R")
        D_l, D_r = mat("LEFT.D"), mat("RIGHT.D")
        rows = int(fs.getNode("LEFT.height").real() or 0)
        cols = int(fs.getNode("LEFT.width").real() or 0)
        if any(x is None for x in (K_l, K_r, P_l, P_r, R_l, R_r, D_l, D_r)) \
                or rows == 0:
            return None
        m1l, m2l = cv2.initUndistortRectifyMap(
            K_l, D_l, R_l, P_l[:3, :3], (cols, rows), cv2.CV_32F)
        m1r, m2r = cv2.initUndistortRectifyMap(
            K_r, D_r, R_r, P_r[:3, :3], (cols, rows), cv2.CV_32F)

        def rect_l(img):
            return cv2.remap(img, m1l, m2l, cv2.INTER_LINEAR)

        def rect_r(img):
            return cv2.remap(img, m1r, m2r, cv2.INTER_LINEAR)

        fx, fy = float(P_l[0, 0]), float(P_l[1, 1])
        cx, cy = float(P_l[0, 2]), float(P_l[1, 2])
        # P_r[0,3] = -fx * baseline for rectified pairs
        bf = float(-P_r[0, 3])
        return rect_l, rect_r, fx, fy, cx, cy, bf
    finally:
        fs.release()
