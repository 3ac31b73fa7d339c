"""Tiny numpy mirrors of the SE(3) helpers for host-side bookkeeping.

Tracking's per-frame host logic composes a handful of single poses; doing it
with jnp would pay a device dispatch (~ms each) per op. Device programs keep
using geometry/se3.py.
"""
from __future__ import annotations

import numpy as np


def compose(Ta: np.ndarray, Tb: np.ndarray) -> np.ndarray:
    R = Ta[:, :3] @ Tb[:, :3]
    t = Ta[:, :3] @ Tb[:, 3] + Ta[:, 3]
    return np.hstack([R, t[:, None]]).astype(np.float32)


def inverse(T: np.ndarray) -> np.ndarray:
    Rt = T[:, :3].T
    return np.hstack([Rt, (-Rt @ T[:, 3])[:, None]]).astype(np.float32)


def camera_center(Tcw: np.ndarray) -> np.ndarray:
    return -Tcw[:, :3].T @ Tcw[:, 3]


def identity() -> np.ndarray:
    return np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
