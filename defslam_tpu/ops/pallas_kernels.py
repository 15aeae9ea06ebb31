"""Pallas TPU kernels for the matcher hot ops.

The dense Hamming-distance matrix (XOR + popcount over 8 uint32 words) is
the single most-executed matching primitive (every frame: points x frame
keypoints; every mapping step: keyframe x keyframe).  The XLA path
(ops.matching.hamming_matrix) materializes the (N, M, 8) XOR tensor in HBM
before reducing; this kernel tiles the computation so each (TN, TM) output
block is produced from VMEM-resident descriptor tiles with the word loop
kept in registers — no (N, M, 8) intermediate traffic.

Kernels are validated against the jnp reference in interpret mode on CPU
(tests/test_pallas.py).  Production wiring: ``ops.matching.hamming_auto``
dispatches here whenever the default backend is TPU, so the per-frame
projection search (tracker.match_points_to_frame) and relocalization voting
run through this kernel on hardware; vmapped call sites (densify over
keyframe pairs) force the XLA path via ``use_pallas=False``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
TILE_M = 128


def _hamming_kernel(a_ref, b_ref, out_ref):
    """a_ref: (TILE_N, 8) u32; b_ref: (TILE_M, 8) u32; out: (TILE_N, TILE_M) i32."""
    acc = jnp.zeros((TILE_N, TILE_M), jnp.int32)
    for w in range(8):
        x = a_ref[:, w][:, None] ^ b_ref[:, w][None, :]  # (TN, TM) u32
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(
    desc_a: jnp.ndarray, desc_b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(N, 8) u32 x (M, 8) u32 -> (N, M) i32 Hamming distances.

    N and M are padded to the 128-tile internally; callers mask invalid
    rows/columns anyway (ops.matching.masked_hamming).
    """
    n, m = desc_a.shape[0], desc_b.shape[0]
    n_pad = -n % TILE_N
    m_pad = -m % TILE_M
    a = jnp.pad(desc_a, ((0, n_pad), (0, 0)))
    b = jnp.pad(desc_b, ((0, m_pad), (0, 0)))
    np_, mp_ = a.shape[0], b.shape[0]
    out = pl.pallas_call(
        _hamming_kernel,
        grid=(np_ // TILE_N, mp_ // TILE_M),
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, TILE_M), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.int32),
        interpret=interpret,
    )(a, b)
    return out[:n, :m]
