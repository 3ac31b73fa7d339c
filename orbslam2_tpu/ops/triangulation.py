"""Jitted batched triangulation with the reference's acceptance gates.

One fixed-shape device program for LocalMapping::CreateNewMapPoints'
numerical core (src/LocalMapping.cpp:440-573): DLT triangulation + parallax,
cheirality, chi2-reprojection and scale-consistency gates. Pairs are padded
to a static bucket by the caller (variable-shape calls would recompile every
keyframe — observed 0.6 s/call on host before this existed).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import twoview as TV


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "scale_factor"))
def triangulate_gated(T1, T2, xy1, xy2, oct1, oct2, valid, sigma2_levels,
                      scale_factors,
                      fx: float, fy: float, cx: float, cy: float,
                      scale_factor: float):
    """T1/T2: [3,4] Tcw. xy: [M,2] undistorted pixel pairs. Returns (X [M,3]
    world points, ok [M])."""
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], jnp.float32)
    P1 = K @ T1
    P2 = K @ T2
    X = TV.triangulate_dlt(P1, P2, xy1, xy2)

    Ow1 = -T1[:, :3].T @ T1[:, 3]
    Ow2 = -T2[:, :3].T @ T2[:, 3]
    r1 = X - Ow1[None]
    r2 = X - Ow2[None]
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    cos_par = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(d1 * d2, 1e-12)
    pc1 = X @ T1[:, :3].T + T1[:, 3]
    pc2 = X @ T2[:, :3].T + T2[:, 3]
    ok = valid & jnp.isfinite(X).all(-1) & (pc1[:, 2] > 0.05) & \
        (pc2[:, 2] > 0.05) & (cos_par < 0.9998)

    sig = sigma2_levels

    def chi2(pc, xy, octv):
        z = jnp.maximum(pc[:, 2], 1e-9)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        e2 = (u - xy[:, 0]) ** 2 + (v - xy[:, 1]) ** 2
        return e2 / sig[jnp.clip(octv, 0, sig.shape[0] - 1)]

    ok &= chi2(pc1, xy1, oct1) < 5.991
    ok &= chi2(pc2, xy2, oct2) < 5.991

    sf = scale_factors
    ratio_dist = d2 / jnp.maximum(d1, 1e-12)
    ratio_oct = sf[jnp.clip(oct1, 0, sf.shape[0] - 1)] / \
        sf[jnp.clip(oct2, 0, sf.shape[0] - 1)]
    factor = 1.5 * scale_factor
    ok &= (ratio_dist < ratio_oct * factor) & (ratio_dist * factor > ratio_oct)
    return X, ok
