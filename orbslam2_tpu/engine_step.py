"""The fused per-frame tracking device program.

This is the engine's "forward step": one jit-compiled program that takes an
image plus the projected local-map slice and produces the optimized camera
pose — extraction (pyramid FAST + BRIEF), projection-guided Hamming
matching, and the 4x10 LM pose optimization fused into a single dispatch.
Used by __graft_entry__.entry() as the compile-check target and by bench.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .config import OrbParams
from .ops import features as F
from .ops import matching as M
from .ops import pose_opt as PO


@functools.partial(
    jax.jit,
    static_argnames=("params", "height", "width", "fx", "fy", "cx", "cy", "bf"))
def tracking_step(img, T_pred, pts_xyz, pt_desc, pt_octave, pt_valid,
                  scale_factors, sigma2,
                  params: OrbParams, height: int, width: int,
                  fx: float, fy: float, cx: float, cy: float, bf: float):
    """One tracked frame: extract -> project+match -> pose-only LM.

    Returns (T_new [3,4], n_inliers, features)."""
    feats = F.extract_orb(img, params, height, width)

    R, t = T_pred[:, :3], T_pred[:, 3]
    pc = pts_xyz @ R.T + t
    z = pc[:, 2]
    ok = pt_valid & (z > 0.1)
    uv = jnp.stack([fx * pc[:, 0] / jnp.maximum(z, 1e-6) + cx,
                    fy * pc[:, 1] / jnp.maximum(z, 1e-6) + cy], -1)
    res = M.search_by_projection(
        uv, pt_octave, jnp.full(pts_xyz.shape[0], 15.0), pt_desc, ok,
        feats.xy, feats.octave, feats.desc, feats.valid, scale_factors,
        max_dist=M.TH_HIGH, ratio=0.9, level_window=(-1, 1))
    res = M.resolve_duplicate_targets(res, feats.xy.shape[0])

    # scatter matches into per-keypoint observation slots
    n_kp = feats.xy.shape[0]
    target = jnp.where(res.valid, res.idx, n_kp)  # n_kp = out-of-bounds, dropped
    kp_pt = jnp.full((n_kp,), -1, jnp.int32).at[target].set(
        jnp.arange(pts_xyz.shape[0]), mode="drop")
    matched = kp_pt >= 0
    obs = jnp.concatenate([feats.xy, jnp.zeros((n_kp, 1))], -1)
    info = 1.0 / sigma2[jnp.clip(feats.octave, 0, sigma2.shape[0] - 1)]
    opt = PO.pose_optimize(
        T_pred, pts_xyz[jnp.clip(kp_pt, 0)], obs,
        jnp.zeros((n_kp,), bool), info, matched & feats.valid,
        fx, fy, cx, cy, bf)
    return opt.T, opt.n_inliers, feats
