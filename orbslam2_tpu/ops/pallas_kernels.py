"""Pallas TPU kernels for the hottest inner ops.

The engine's most-executed primitive is the dense XOR-popcount Hamming
matrix behind every matcher (ops/matching.py): [A, 8] x [B, 8] uint32 ->
[A, B] distances, A, B up to 2048. XLA already fuses the jnp version well;
this Pallas kernel tiles it explicitly onto VMEM ([TA, 8] x [TB, 8] blocks,
VPU popcounts, accumulate over the 8 words) and is used on TPU backends.

Dispatch: `hamming_matrix(...)` in ops/matching.py routes here when the
default backend is TPU and shapes tile cleanly; everything else falls back
to the XLA path (identical results).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # Pallas import is TPU/CPU-safe; guard for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

TILE_A = 256
TILE_B = 256


def _hamming_kernel(a_ref, b_ref, out_ref):
    # a_ref: [TILE_A, 8] u32; b_ref: [TILE_B, 8] u32; out: [TILE_A, TILE_B] i32
    acc = jnp.zeros((TILE_A, TILE_B), jnp.int32)
    for w in range(8):
        aw = a_ref[:, w]                      # [TA] u32
        bw = b_ref[:, w]                      # [TB] u32
        x = jnp.bitwise_xor(aw[:, None], bw[None, :])
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """[A, 8] u32 x [B, 8] u32 -> [A, B] int32; A, B must be multiples of
    the tile sizes (the callers' capacities are 256-padded). interpret=True
    runs the kernel in the Pallas interpreter (CPU parity tests)."""
    A, B = desc_a.shape[0], desc_b.shape[0]
    grid = (A // TILE_A, B // TILE_B)
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((A, B), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_A, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_B, 8), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_A, TILE_B), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(desc_a, desc_b)


def pallas_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def pallas_enabled() -> bool:
    """Dispatch gate for the matchers: ON by default on TPU backends
    (parity-tested vs the XLA path, tests/test_features.py). Set
    ORBSLAM2_TPU_PALLAS=0 to force the XLA expression. An earlier round
    measured Pallas custom calls de-pipelining the axon relay after a
    device->host transfer; re-measured on jax 0.9.0 this no longer
    reproduces (the Pallas path was faster in that regime, docs/PERF.md),
    so the kernel is now the TPU default."""
    import os
    return os.environ.get("ORBSLAM2_TPU_PALLAS", "1") != "0" and pallas_available()
