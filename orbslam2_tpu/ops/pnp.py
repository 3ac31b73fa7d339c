"""Batched PnP RANSAC for relocalization.

Replaces PnPsolver (src/PnPsolver.cpp, Lepetit's EPnP + RANSAC): the
reference iterates 300 sequential RANSAC rounds of 4-point EPnP; here all
hypotheses run as one vmapped device program. Deviation (documented): the
minimal solver is 6-point DLT with SVD orthonormalization instead of EPnP —
equally batched, and hypothesis quality only needs to be good enough for
the chi2 inlier vote; the winning pose is always refined by the 4x10 LM
pose optimizer afterwards (Tracking::Relocalization does the same,
src/Tracking.cpp:1890-1950).

RANSAC parameters mirror SetRansacParameters defaults used at
src/Tracking.cpp:1851: 300 iterations max (we run them all in parallel),
chi2 threshold 5.991 * sigma^2(octave).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

N_HYPOTHESES = 256
MIN_SET = 6


class PnPResult(NamedTuple):
    T: jnp.ndarray          # [3, 4] best hypothesis pose
    inliers: jnp.ndarray    # [N] bool
    n_inliers: jnp.ndarray


def _dlt_pnp(X, uv, fx, fy, cx, cy):
    """6+-point DLT pose from world points [M, 3] and pixels [M, 2]."""
    # normalized camera coords
    xn = (uv[:, 0] - cx) / fx
    yn = (uv[:, 1] - cy) / fy
    Xh = jnp.concatenate([X, jnp.ones_like(X[:, :1])], -1)  # [M, 4]
    z = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, z, -xn[:, None] * Xh], -1)
    r2 = jnp.concatenate([z, Xh, -yn[:, None] * Xh], -1)
    A = jnp.concatenate([r1, r2], 0)  # [2M, 12]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[-1].reshape(3, 4)
    # cheirality: fix the DLT's overall sign FIRST, on the projective depths
    # w = P[2]·Xh (majority of points must have w>0 so that M3 ~ +lam*R with
    # lam>0), THEN project to the nearest rotation. Negating only R after
    # orthonormalization would leave t inconsistent with the flipped R.
    w = Xh @ P[2]
    P = jnp.where(jnp.sum(w > 0) < jnp.sum(w < 0), -P, P)
    M3 = P[:, :3]
    u, s, v = jnp.linalg.svd(M3)
    d = jnp.linalg.det(u @ v)  # +1 in the noiseless case after the sign fix
    R = u @ jnp.diag(jnp.array([1.0, 1.0, 0.0]).at[2].set(d)) @ v
    lam = jnp.mean(s)
    t = P[:, 3] / jnp.maximum(lam, 1e-12)
    return jnp.concatenate([R, t[:, None]], -1)


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy"))
def pnp_ransac(key, X, uv, sigma2, valid,
               fx: float, fy: float, cx: float, cy: float) -> PnPResult:
    """X: [N, 3] world points; uv: [N, 2] observed pixels; sigma2: [N]
    per-observation variance; valid: [N]."""
    n = X.shape[0]
    probs = valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1.0)
    keys = jax.random.split(key, N_HYPOTHESES)

    def hypo(k):
        idx = jax.random.choice(k, n, (MIN_SET,), replace=False, p=probs)
        return _dlt_pnp(X[idx], uv[idx], fx, fy, cx, cy)

    Ts = jax.vmap(hypo)(keys)  # [H, 3, 4]

    def score(T):
        pc = X @ T[:, :3].T + T[:, 3]
        z = pc[:, 2]
        u = fx * pc[:, 0] / jnp.maximum(z, 1e-6) + cx
        v = fy * pc[:, 1] / jnp.maximum(z, 1e-6) + cy
        chi2 = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) / sigma2
        inl = valid & (z > 0.05) & (chi2 < 5.991)
        return jnp.sum(inl), inl

    counts, inls = jax.vmap(score)(Ts)
    best = jnp.argmax(counts)
    return PnPResult(T=Ts[best], inliers=inls[best], n_inliers=counts[best])
