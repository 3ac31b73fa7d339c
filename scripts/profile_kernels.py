"""Per-kernel device timings + roofline notes (SURVEY.md phase 7).

Times each major device program in isolation with the chained-dependency
pattern (outputs feed the next call's inputs, one block_until_ready per
batch) — per-call block_until_ready over the axon tunnel measures RTT, not
kernel time (docs/ROUND1_NOTES.md gotchas).

Run on TPU:  python scripts/profile_kernels.py
Run on CPU:  python scripts/profile_kernels.py --cpu
Emits a markdown table + simple roofline classification per kernel
(arithmetic intensity vs the v5e knee ~240 FLOP/byte bf16, ~120 f32).
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def timed(fn, args, n=30, chain=None):
    """Median per-call ms with async chaining. chain(out, args) -> args
    threads a dependency through successive calls."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        if chain is not None:
            args = chain(out, args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args_cli = ap.parse_args()
    import jax
    if args_cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    import jax.numpy as jnp
    import numpy as np
    from orbslam2_tpu.config import OrbParams
    from orbslam2_tpu.ops import features as F
    from orbslam2_tpu.ops import matching as M
    from orbslam2_tpu.ops import pose_opt as PO
    from orbslam2_tpu.ops import refine as RF
    from orbslam2_tpu.ops import ba as BA
    import functools

    dev = jax.devices()[0].platform
    print(f"device: {dev}")
    rng = np.random.default_rng(0)
    params = OrbParams()
    H, W = 480, 640
    N = F.padded_capacity(params.n_features)
    rows = []

    # ---- extraction: pyramid + FAST + NMS + select + IC angle + BRIEF ----
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    ex = functools.partial(F.extract_orb, params=params, height=H, width=W)
    jex = jax.jit(lambda im: ex(im))
    ms = timed(jex, (img,))
    # traffic estimate: pyramid atlas [8,H,W] f32 read ~3x (FAST, blur,
    # windows) + FAST shifted-stack traffic if materialized
    bytes_min = 8 * H * W * 4 * 3
    rows.append(("extract_orb (1000 kp, 8 levels)", ms,
                 f"HBM-bound; >= {bytes_min/1e6:.0f} MB/frame minimum traffic"))

    # ---- Hamming matrix 1024x1024 ----
    da = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    db = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    jham = jax.jit(M.hamming_matrix)
    ms = timed(jham, (da, db))
    ops = N * N * 8 * 2  # xor + popcount per u32
    rows.append((f"hamming_matrix [{N}x{N}]", ms,
                 f"VPU int ops ~{ops/1e6:.0f}M; {N*N*4/1e6:.1f} MB out"))

    # ---- pose-only LM (4x10) ----
    pts = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32) + [0, 0, 6])
    T = jnp.asarray(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32))
    pc = np.asarray(pts) @ np.eye(3).T
    obs = jnp.asarray(np.stack(
        [500 * pc[:, 0] / pc[:, 2] + 320, 500 * pc[:, 1] / pc[:, 2] + 240,
         np.zeros(N)], -1).astype(np.float32))
    info = jnp.ones(N, jnp.float32)
    valid = jnp.ones(N, bool)
    jpo = jax.jit(lambda T: PO.pose_optimize(
        T, pts, obs, jnp.zeros(N, bool), info, valid,
        500.0, 500.0, 320.0, 240.0, 0.0).T)
    ms = timed(jpo, (T,), chain=lambda out, a: (out,))
    rows.append(("pose_optimize (4x10 LM, 1024 obs)", ms,
                 "latency-bound: 40 tiny sequential solves"))

    # ---- LK refinement (512 windows) ----
    win = jnp.asarray(rng.uniform(0, 255, (N, 15, 15)).astype(np.float32))
    tpl = jnp.asarray(rng.uniform(0, 255, (N, 11, 11)).astype(np.float32))
    vm = jnp.ones(N, bool)
    jrf = jax.jit(RF.refine_offsets)
    ms = timed(jrf, (win, tpl, vm))
    rows.append((f"refine_offsets ({N} windows, IC-LK)", ms,
                 "VPU-bound separable shift-blends"))

    # ---- Schur BA: local-BA-sized and GBA-sized ----
    sys.path.insert(0, ".")
    from __graft_entry__ import _make_ba_problem
    for (C, P, E, tag) in ((16, 2048, 8192, "local-BA"),
                           (128, 8192, 65536, "global-BA")):
        prob, (fx, fy, cx, cy, bf) = _make_ba_problem(C, P, E)
        for solver, note in (
                ("cg", "24 sequential CG matvecs/iter (sharded formulation)"),
                ("dense", "materialized Schur + Cholesky (MXU einsum)")):
            jba = jax.jit(lambda p, s=solver: BA.ba_solve(
                p, fx, fy, cx, cy, bf, iters1=5, iters2=10, cg_iters=24,
                solver=s).cam_T)
            ms = timed(jba, (prob,), n=10)
            rows.append((f"ba_solve[{solver}] {tag} (C={C} P={P} E={E}, "
                         f"5+10 LM)", ms, note))

    print()
    print("| kernel | median ms | roofline note |")
    print("|---|---|---|")
    for name, ms, note in rows:
        print(f"| {name} | {ms:.3f} | {note} |")


if __name__ == "__main__":
    main()
