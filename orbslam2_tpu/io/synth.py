"""Synthetic corner-rich sequence renderer with exact ground truth.

The reference is validated only on recorded datasets (TUM/KITTI/EuRoC,
Examples/*); those are not available in this environment, so this module
renders controllable sequences: world points drawn as depth-scaled intensity
squares (strong FAST corners, stable BRIEF appearance) under a known
trajectory. Used by tests and the e2e demo (run_synth.py) to measure ATE
against exact ground truth.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class SynthScene:
    pts: np.ndarray        # [M, 3] world points
    intensity: np.ndarray  # [M]
    size_world: np.ndarray  # [M] half-size in meters
    K: np.ndarray          # [3, 3]
    width: int
    height: int


def make_scene(seed=0, n_pts=600, width=640, height=480,
               fx=500.0, fy=500.0, depth_range=(4.0, 9.0),
               spread=(6.0, 4.5)) -> SynthScene:
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-spread[0], spread[0], n_pts),
        rng.uniform(-spread[1], spread[1], n_pts),
        rng.uniform(*depth_range, n_pts),
    ], -1).astype(np.float32)
    # alternate dark/bright squares for strong corners on the gray background
    inten = np.where(rng.random(n_pts) < 0.5,
                     rng.uniform(0, 60, n_pts), rng.uniform(190, 255, n_pts))
    size = rng.uniform(0.03, 0.07, n_pts).astype(np.float32)
    K = np.array([[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]], np.float32)
    return SynthScene(pts, inten.astype(np.float32), size, K, width, height)


def render(scene: SynthScene, Tcw: np.ndarray, noise=1.5, seed=0) -> np.ndarray:
    """Render one view. Painter's algorithm: far squares first."""
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = scene.pts @ R.T + t
    z = pc[:, 2]
    vis = z > 0.5
    uv = pc[:, :2] / np.maximum(z[:, None], 1e-6)
    u = scene.K[0, 0] * uv[:, 0] + scene.K[0, 2]
    v = scene.K[1, 1] * uv[:, 1] + scene.K[1, 2]
    half = scene.size_world * scene.K[0, 0] / np.maximum(z, 1e-6)
    img = np.full((scene.height, scene.width), 128.0, np.float32)
    order = np.argsort(-z)
    for i in order:
        if not vis[i]:
            continue
        h = half[i]
        x0, x1 = int(u[i] - h), int(u[i] + h) + 1
        y0, y1 = int(v[i] - h), int(v[i] + h) + 1
        if x1 <= 0 or y1 <= 0 or x0 >= scene.width or y0 >= scene.height:
            continue
        img[max(y0, 0):min(y1, scene.height), max(x0, 0):min(x1, scene.width)] = scene.intensity[i]
    if noise > 0:
        rng = np.random.default_rng(seed)
        img = img + rng.normal(0, noise, img.shape).astype(np.float32)
    return np.clip(img, 0, 255)


def orbit_trajectory(n_frames: int, radius=0.8, forward=0.0, seed=0):
    """Smooth sideways arc with small yaw, keeping the scene in view.
    Returns [F, 3, 4] ground-truth Tcw poses."""
    poses = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        # camera center moves along x with slight z progress; yaw keeps
        # looking at scene center
        cx = radius * np.sin(s * np.pi * 0.5)
        cz = forward * s
        yaw = -0.25 * s  # radians
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rwc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
        C = np.array([cx, 0.02 * np.sin(s * 6), cz], np.float32)
        Rcw = Rwc.T
        tcw = -Rcw @ C
        poses.append(np.hstack([Rcw, tcw[:, None]]).astype(np.float32))
    return np.stack(poses)


def make_sequence(n_frames=60, seed=0, **scene_kw):
    """Convenience: scene + trajectory + rendered frames generator."""
    scene = make_scene(seed=seed, **scene_kw)
    poses = orbit_trajectory(n_frames)
    frames = [render(scene, poses[i], seed=seed * 1000 + i) for i in range(n_frames)]
    return scene, poses, frames
