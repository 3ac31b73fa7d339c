"""Measurement-error probe: quantifies the front-end's 2D measurement error
against exact ground truth, with and without feature-metric refinement.

Renders two room views with known poses/depth, extracts features in both,
backprojects view-A keypoints to 3D via GT depth, projects them into view B,
matches A->B, and compares B's measured keypoint positions (raw vs refined)
to the GT projections. Prints bias/std/RMS in pixels.

Usage: JAX_PLATFORMS=cpu python scripts/exp_measure.py
"""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from orbslam2_tpu.config import OrbParams  # noqa: E402
from orbslam2_tpu.io import synth  # noqa: E402
from orbslam2_tpu.ops import features as F  # noqa: E402
from orbslam2_tpu.ops import matching as M  # noqa: E402
from orbslam2_tpu.ops import refine as RF  # noqa: E402


def main(frame_gap=3):
    scene = synth.make_room(seed=0)
    gt = synth.orbit_trajectory(30)
    Ta, Tb = gt[0], gt[frame_gap]
    imA = synth.render_room(scene, Ta, seed=0)
    imB = synth.render_room(scene, Tb, seed=frame_gap)
    dA = synth.depth_room(scene, Ta)
    params = OrbParams()
    fa = F.extract_orb(jnp.asarray(imA), params, 480, 640)
    fb = F.extract_orb(jnp.asarray(imB), params, 480, 640)
    fa = type(fa)(*[np.asarray(x) for x in fa])
    fb = type(fb)(*[np.asarray(x) for x in fb])

    K = scene.K
    # GT 3D of A's keypoints via GT depth (bilinear depth at subpixel)
    xi = np.clip(fa.xy[:, 0], 0, 639)
    yi = np.clip(fa.xy[:, 1], 0, 479)
    z = dA[np.round(yi).astype(int), np.round(xi).astype(int)]
    okA = fa.valid & (z > 0.1)
    x = (fa.xy[:, 0] - K[0, 2]) / K[0, 0] * z
    y = (fa.xy[:, 1] - K[1, 2]) / K[1, 1] * z
    Xc = np.stack([x, y, z], -1)
    Rwa = Ta[:, :3].T
    Xw = Xc @ Rwa.T + (-Rwa @ Ta[:, 3])
    # GT projection into B
    Xb = Xw @ Tb[:, :3].T + Tb[:, 3]
    gt_u = K[0, 0] * Xb[:, 0] / Xb[:, 2] + K[0, 2]
    gt_v = K[1, 1] * Xb[:, 1] / Xb[:, 2] + K[1, 2]
    inB = (Xb[:, 2] > 0.3) & (gt_u > 25) & (gt_u < 615) & (gt_v > 25) & (gt_v < 455)

    # descriptor match A->B (best match under TH_LOW)
    dist = M.hamming_matrix(jnp.asarray(fa.desc), jnp.asarray(fb.desc))
    cand = jnp.asarray(okA & inB)[:, None] & jnp.asarray(fb.valid)[None, :]
    res = M.masked_best_match(dist, cand, max_dist=50, ratio=0.8)
    idx = np.asarray(res.idx)
    src = np.flatnonzero(idx >= 0)
    dst = idx[src]

    meas = fb.xy[dst]
    gtp = np.stack([gt_u[src], gt_v[src]], -1)
    err_raw = meas - gtp
    # keep plausible correspondences only (mismatches are off by >3px)
    keep = np.abs(err_raw).max(-1) < 2.0
    src, dst, gtp = src[keep], dst[keep], gtp[keep]
    err_raw = err_raw[keep]

    # refined measurement: align B's window to A's template
    tplA = np.asarray(RF.template_of(fa.patch[src]))
    delta, rok = RF.refine_offsets(
        jnp.asarray(fb.patch[dst]), jnp.asarray(tplA),
        jnp.asarray(np.ones(len(dst), bool)))
    delta, rok = np.asarray(delta), np.asarray(rok)
    sf = F.scale_factors(params)[np.clip(fb.octave[dst], 0, 7)]
    meas_ref = fb.xy[dst] + delta * sf[:, None]
    err_ref = (meas_ref - gtp)[rok]

    def stats(name, e):
        print(f"{name}: n={len(e)} bias=({e[:,0].mean():+.3f},{e[:,1].mean():+.3f}) "
              f"std=({e[:,0].std():.3f},{e[:,1].std():.3f}) "
              f"rms={np.sqrt((e**2).sum(-1)).mean():.3f} px")

    print(f"frame gap {frame_gap}: {len(err_raw)} verified matches, "
          f"refine-ok {rok.mean():.2f}")
    stats("raw    ", err_raw)
    stats("refined", err_ref)

    # also: A-side self-consistency — where does A's own measurement sit vs
    # GT? (requires inverting: project A's GT 3D back into A)
    Xa2 = Xw @ Ta[:, :3].T + Ta[:, 3]
    au = K[0, 0] * Xa2[:, 0] / Xa2[:, 2] + K[0, 2]
    av = K[1, 1] * Xa2[:, 1] / Xa2[:, 2] + K[1, 2]
    ea = fa.xy[src] - np.stack([au[src], av[src]], -1)
    stats("A self ", ea)  # ~0 by construction (checks the probe itself)


if __name__ == "__main__":
    for gap in (1, 3, 8):
        main(gap)
        print()
