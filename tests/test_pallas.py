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
