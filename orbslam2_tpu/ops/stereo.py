"""Stereo keypoint matching kernel.

TPU-native redesign of Frame::ComputeStereoMatches (src/Frame.cpp:551-770):
the reference builds per-row candidate tables and loops; here the whole
left-vs-right association is one dense masked Hamming matrix with the same
gates:

- row band: |v_L - v_R| <= 2 * scale(octave_R) (src/Frame.cpp:574-589)
- octave window: octave_R in [octave_L - 1, octave_L + 1] (:628)
- disparity range (0, max_disp], max_disp = fx i.e. depth >= baseline
  (:591-595)
- Hamming <= TH_HIGH, then a median-based outlier trim
  (1.5 * 1.4 * median, :754-769, applied to Hamming distance here — the
  reference applies it to the SAD refine score; deviation documented)

Sub-pixel SAD refinement (:662-750) is not yet ported; disparity precision
is that of the (scaled) keypoint grid. TODO(perf/accuracy): add the slide-
window SAD parabola refine as a Pallas kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import matching as M


@functools.partial(jax.jit, static_argnames=("bf", "fx"))
def stereo_match(l_xy, l_oct, l_desc, l_valid,
                 r_xy, r_oct, r_desc, r_valid,
                 scale_factors, bf: float, fx: float):
    """Associate left keypoints with right keypoints along epipolar rows.

    Inputs are level-0 (raw/rectified) coords. Returns (ur [N], depth [N]),
    -1 where unmatched.
    """
    sf = jnp.asarray(scale_factors)
    dv = jnp.abs(l_xy[:, None, 1] - r_xy[None, :, 1])
    band = 2.0 * sf[jnp.clip(r_oct, 0, sf.shape[0] - 1)]
    row_ok = dv <= band[None, :]
    d_oct = l_oct[:, None] - r_oct[None, :]
    oct_ok = (d_oct >= -1) & (d_oct <= 1)
    disp = l_xy[:, None, 0] - r_xy[None, :, 0]
    disp_ok = (disp > 0.1) & (disp <= fx)
    cand = row_ok & oct_ok & disp_ok & l_valid[:, None] & r_valid[None, :]

    dist = M.hamming_matrix(l_desc, r_desc)
    res = M.masked_best_match(dist, cand, M.TH_HIGH, ratio=None)

    matched = res.valid
    best_disp = jnp.where(matched,
                          l_xy[:, 0] - r_xy[jnp.clip(res.idx, 0), 0], -1.0)
    # median-based trim of weak matches
    d = jnp.where(matched, res.dist, 10_000)
    med = jnp.nanmedian(jnp.where(matched, res.dist.astype(jnp.float32), jnp.nan))
    med = jnp.nan_to_num(med, nan=float(M.TH_HIGH))
    keep = matched & (d.astype(jnp.float32) <= 1.5 * 1.4 * med) & (best_disp > 0.1)

    depth = jnp.where(keep, bf / jnp.maximum(best_disp, 1e-6), -1.0)
    ur = jnp.where(keep, r_xy[jnp.clip(res.idx, 0), 0], -1.0)
    return ur, depth
