"""Distributed Schur-complement bundle adjustment over a device mesh.

The multi-host/multi-chip scaling axis of the engine (BASELINE.json north
star; the reference has no distributed backend at all — SURVEY.md 2.4).

Design: the BA edge list is the data axis. Edges (observations) are sharded
across the mesh; camera and point blocks are replicated. Every per-edge
operation (residuals, Jacobians, the W couplings, the CG matvec's two
gathers) is embarrassingly parallel over edges; the only cross-device
communication is the segment-sum reductions (Hcc/Hpp/b assembly and the
coupling term), which GSPMD lowers to all-reduce/reduce-scatter collectives
over ICI. This is the standard "shard the residual blocks, replicate the
reduced system" BA decomposition — the reduced camera system is tiny
([C,6]) compared to the edge set, so replicating its CG is free.

Implementation: `jax.jit` with explicit NamedSharding on the edge arrays;
XLA inserts the collectives. The same `ops/ba.ba_solve` computation is
reused unchanged — sharding is purely an annotation layer, which is the
point of the design (segment-sums become collectives without rewriting the
solver).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ba as BA


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_problem(p: BA.BAProblem, mesh: Mesh, axis: str = "data") -> BA.BAProblem:
    """Place edge arrays sharded along the mesh, cams/points replicated.
    Edge count must divide by mesh size (pad buckets already ensure 256|E)."""
    edge1 = NamedSharding(mesh, P(axis))
    edge2 = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    return BA.BAProblem(
        cam_T=put(p.cam_T, repl),
        cam_fixed=put(p.cam_fixed, repl),
        cam_valid=put(p.cam_valid, repl),
        pts=put(p.pts, repl),
        pt_valid=put(p.pt_valid, repl),
        e_cam=put(p.e_cam, edge1),
        e_pt=put(p.e_pt, edge1),
        e_obs=put(p.e_obs, edge2),
        e_stereo=put(p.e_stereo, edge1),
        e_info=put(p.e_info, edge1),
        e_valid=put(p.e_valid, edge1),
    )


def dist_ba_solve(p: BA.BAProblem, mesh: Mesh, fx, fy, cx, cy, bf,
                  iters1: int = 5, iters2: int = 10, cg_iters: int = 24,
                  axis: str = "data") -> BA.BAResult:
    """Solve BA with edges sharded over the mesh. Single-chip calls work too
    (mesh of one device)."""
    p = shard_problem(p, mesh, axis)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else _null():
        return BA.ba_solve(p, fx, fy, cx, cy, bf,
                           iters1=iters1, iters2=iters2, cg_iters=cg_iters)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
