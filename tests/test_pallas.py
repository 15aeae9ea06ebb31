"""Pallas kernels vs jnp references (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from defslam_tpu.ops import matching
from defslam_tpu.ops.pallas_kernels import hamming_matrix_pallas


def test_hamming_pallas_matches_reference():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, (200, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (333, 8), dtype=np.uint32))
    ref = matching.hamming_matrix(a, b)
    out = hamming_matrix_pallas(a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_hamming_pallas_tile_multiples():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (128, 8), dtype=np.uint32))
    ref = matching.hamming_matrix(a, b)
    out = hamming_matrix_pallas(a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_windowed_match_pallas_matches_reference():
    """Fused windowed two-min reduction == masked_hamming + row-wise
    best/second (the densify_matches hot path)."""
    from defslam_tpu.ops.pallas_kernels import windowed_match_pallas

    rng = np.random.default_rng(2)
    B, N, M = 3, 150, 200
    da = jnp.asarray(rng.integers(0, 2**32, (B, N, 8), dtype=np.uint32))
    db = jnp.asarray(rng.integers(0, 2**32, (B, M, 8), dtype=np.uint32))
    xa = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    xb = jnp.asarray(rng.uniform(-1, 1, (B, M, 2)).astype(np.float32))
    va = jnp.asarray(rng.uniform(size=(B, N)) > 0.2)
    vb = jnp.asarray(rng.uniform(size=(B, M)) > 0.2)
    radius = 0.35
    best, idx, second = windowed_match_pallas(
        da, db, xa, xb, va, vb, radius, interpret=True
    )
    for k in range(B):
        d = matching.masked_hamming(
            da[k], db[k], va[k], vb[k],
            pair_mask=matching.window_mask(xa[k], xb[k], radius),
            use_pallas=False,
        )
        d = np.asarray(d)
        b1 = d.min(axis=1)
        j1 = d.argmin(axis=1)
        d2 = d.copy()
        d2[np.arange(N), j1] = int(matching.INVALID)
        b2 = d2.min(axis=1)
        np.testing.assert_array_equal(np.asarray(best[k]), b1)
        np.testing.assert_array_equal(np.asarray(second[k]), np.minimum(b2, int(matching.INVALID)))
        # index only meaningful where a real match exists
        real = b1 < int(matching.INVALID)
        np.testing.assert_array_equal(np.asarray(idx[k])[real], j1[real])
