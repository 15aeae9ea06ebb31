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


def unpack_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """(..., 8) u32 packed 256-bit descriptors -> (..., 256) bf16 in
    {-1, +1}.  Hamming(a, b) == (256 - dot(ua, ub)) / 2 exactly, which
    moves descriptor matching onto the MXU."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts) & jnp.uint32(1)  # (..., 8, 32)
    flat = bits.reshape(*desc.shape[:-1], 256)
    return (2.0 * flat.astype(jnp.bfloat16)) - 1.0


def _hamming_kernel(a_ref, b_ref, out_ref):
    """a_ref: (TILE_N, 256) bf16 +-1; b_ref: (TILE_M, 256) bf16 +-1;
    out: (TILE_N, TILE_M) i32.  Hamming as an MXU dot (see unpack_pm1);
    the XOR+popcount form is VPU-bound because TPU population_count
    lowers to a shift/mask emulation."""
    dot = jax.lax.dot_general(
        a_ref[:, :], b_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :] = (128.0 - 0.5 * dot).astype(jnp.int32)


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
    a = unpack_pm1(jnp.pad(desc_a, ((0, n_pad), (0, 0))))
    b = unpack_pm1(jnp.pad(desc_b, ((0, m_pad), (0, 0))))
    np_, mp_ = a.shape[0], b.shape[0]
    out = pl.pallas_call(
        _hamming_kernel,
        grid=(np_ // TILE_N, mp_ // TILE_M),
        in_specs=[
            pl.BlockSpec((TILE_N, 256), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 256), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, TILE_M), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.int32),
        interpret=interpret,
    )(a, b)
    return out[:n, :m]


def _match_reduce_kernel(
    a_ref, b_ref, ra_ref, rb_ref, va_ref, vb_ref,
    best_ref, idx_ref, second_ref, *, radius: float, invalid: int,
):
    """One (batch, row-tile, col-tile) step of the fused windowed-Hamming
    two-min reduction.

    a_ref: (1, TILE_N, 256) bf16 +-1-unpacked row descriptors; b_ref:
    (1, TILE_M, 256) bf16 column descriptors; ra_ref/rb_ref: (1, T, 2) f32 row/col positions in
    the SAME retina (rows carry their warp-predicted position); va/vb:
    (1, T, 1) row/col validity (f32 0/1; trailing singleton keeps the TPU
    block layout legal).  Outputs (1, TILE_N, 1) i32, revisited across the
    innermost (column-tile) grid dim: running best distance, its column
    index, and the second-best distance (for the Lowe ratio).

    The (N, M) distance matrix never exists outside VMEM — the XLA path
    materializes it (plus the (N, M, 8) XOR tensor) in HBM, which is the
    keyframe chain's dominant cost at reference scale (BASELINE.md r5).
    """
    j = pl.program_id(2)
    # Hamming on the MXU: descriptors arrive unpacked to +-1 bf16, and
    # h(a, b) = (256 - a.b) / 2 exactly (+-1 products accumulated in f32
    # stay integral) — the XOR+popcount formulation is VPU-bound on TPU
    # because population_count lowers to a shift/mask emulation sequence
    # (measured 36 ms for the full densify batch; the dot form is MXU work
    # at ~19 GFLOP total for 8 pairs x 1536^2 x 256 bits)
    dot = jax.lax.dot_general(
        a_ref[0], b_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_N, TILE_M)
    acc = (128.0 - 0.5 * dot).astype(jnp.int32)
    # Chebyshev window around the row's predicted position + validity
    dx = jnp.abs(ra_ref[0, :, 0][:, None] - rb_ref[0, :, 0][None, :])
    dy = jnp.abs(ra_ref[0, :, 1][:, None] - rb_ref[0, :, 1][None, :])
    ok = (
        (jnp.maximum(dx, dy) <= radius)
        & (va_ref[0, :, 0][:, None] > 0.5)
        & (vb_ref[0, :, 0][None, :] > 0.5)
    )
    d = jnp.where(ok, acc, invalid)
    # tile-local two smallest per row (+ first-argmin column)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, TILE_M), 1)
    m1 = jnp.min(d, axis=1)
    am = jnp.min(jnp.where(d == m1[:, None], col, TILE_M), axis=1)
    d2 = jnp.where(col == am[:, None], invalid, d)
    m2 = jnp.min(d2, axis=1)
    am = am + j * TILE_M

    @pl.when(j == 0)
    def _init():
        best_ref[0, :, 0] = m1
        idx_ref[0, :, 0] = am
        second_ref[0, :, 0] = m2

    @pl.when(j > 0)
    def _merge():
        pb = best_ref[0, :, 0]
        pi = idx_ref[0, :, 0]
        ps = second_ref[0, :, 0]
        take = m1 < pb
        nb = jnp.where(take, m1, pb)
        ni = jnp.where(take, am, pi)
        loser = jnp.where(take, pb, m1)
        ns = jnp.minimum(jnp.minimum(ps, m2), loser)
        best_ref[0, :, 0] = nb
        idx_ref[0, :, 0] = ni
        second_ref[0, :, 0] = ns


@functools.partial(
    jax.jit, static_argnames=("radius", "interpret")
)
def windowed_match_pallas(
    desc_a: jnp.ndarray,  # (B, N, 8) u32 row descriptors
    desc_b: jnp.ndarray,  # (B, M, 8) u32 column descriptors
    xy_a: jnp.ndarray,  # (B, N, 2) f32 row positions (e.g. warp predictions)
    xy_b: jnp.ndarray,  # (B, M, 2) f32 column positions
    valid_a: jnp.ndarray,  # (B, N) bool
    valid_b: jnp.ndarray,  # (B, M) bool
    radius: float,
    interpret: bool = False,
):
    """Fused windowed Hamming matching, batched over pairs: for every row
    keypoint, the (best distance, best column, second-best distance) over
    all columns within `radius` (Chebyshev, the reference's
    GetFeaturesInArea semantics).  Returns three (B, N) i32 arrays.

    Equivalent to masked_hamming + two-min per row (tests/test_pallas.py)
    without ever materializing the (B, N, M) matrix in HBM.
    """
    bsz, n = desc_a.shape[0], desc_a.shape[1]
    m = desc_b.shape[1]
    n_pad, m_pad = -n % TILE_N, -m % TILE_M
    a = unpack_pm1(jnp.pad(desc_a, ((0, 0), (0, n_pad), (0, 0))))
    b = unpack_pm1(jnp.pad(desc_b, ((0, 0), (0, m_pad), (0, 0))))
    ra = jnp.pad(xy_a.astype(jnp.float32), ((0, 0), (0, n_pad), (0, 0)))
    rb = jnp.pad(xy_b.astype(jnp.float32), ((0, 0), (0, m_pad), (0, 0)))
    va = jnp.pad(valid_a.astype(jnp.float32), ((0, 0), (0, n_pad)))[..., None]
    vb = jnp.pad(valid_b.astype(jnp.float32), ((0, 0), (0, m_pad)))[..., None]
    np_, mp_ = n + n_pad, m + m_pad
    grid = (bsz, np_ // TILE_N, mp_ // TILE_M)
    row = lambda k, i, j: (k, i, 0)  # noqa: E731
    colmap = lambda k, i, j: (k, j, 0)  # noqa: E731
    kernel = functools.partial(
        # 10_000 = ops.matching.INVALID (literal: that module-level value
        # is a jnp scalar, which cannot parameterize a traced kernel)
        _match_reduce_kernel, radius=float(radius), invalid=10_000
    )
    best, idx, second = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_N, 256), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, 256), colmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, 2), colmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, 1), colmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_N, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, np_, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, np_, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, np_, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a, b, ra, rb, va, vb)
    return best[:, :n, 0], idx[:, :n, 0], second[:, :n, 0]
