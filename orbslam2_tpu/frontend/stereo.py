"""Stereo frame construction: extract both images, row-band match.

Replaces the stereo path of the Frame constructor (src/Frame.cpp:68-130):
left/right extraction (the reference runs them in two threads,
Frame::ExtractORB left|right — here they are two device dispatches) followed
by the stereo association kernel (ops/stereo.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops import features as F
from ..ops import stereo as S


def stereo_depths_for_frame(cfg: SlamConfig, feats_left, right_img: np.ndarray):
    """Compute per-left-keypoint (ur, depth) from the right image.

    feats_left: FrameFeatures of the left image (device arrays).
    """
    h, w = right_img.shape
    # native dtype on the wire; extract_orb casts on device
    right = jnp.asarray(right_img)
    feats_r = F.extract_orb(right, cfg.orb, h, w)
    cam = cfg.camera
    ur, depth = S.stereo_match(
        feats_left.xy, feats_left.octave, feats_left.desc, feats_left.valid,
        feats_r.xy, feats_r.octave, feats_r.desc, feats_r.valid,
        jnp.asarray(F.scale_factors(cfg.orb)), cam.bf, cam.fx)
    return ur, depth, right


def stereo_depths_refined(cfg: SlamConfig, feats_left, left_img, right_img):
    """Row-band match + sub-pixel SAD refinement (the full
    Frame::ComputeStereoMatches equivalent)."""
    ur, depth, right = stereo_depths_for_frame(cfg, feats_left, right_img)
    cam = cfg.camera
    ur2, depth2 = S.refine_disparity(
        jnp.asarray(left_img, jnp.float32), right.astype(jnp.float32),
        feats_left.xy, feats_left.octave, ur, depth,
        cfg.orb.n_levels, cfg.orb.scale_factor, cam.height, cam.width, cam.bf)
    return np.asarray(ur2), np.asarray(depth2)
