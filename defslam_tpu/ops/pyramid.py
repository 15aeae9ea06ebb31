"""Image pyramid + separable Gaussian blur, pure jnp (XLA convs).

Replaces the reference's ``ORBextractor::ComputePyramid``
(``Thirdparty/ORBSLAM_2/src/ORBextractor.cc:1120-1190``: cv::resize +
cv::GaussianBlur per level).  Levels have static shapes derived from the
config at trace time, so the whole pyramid is one fused XLA computation; all
convolutions run NHWC on the MXU-friendly conv path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(height: int, width: int, n_levels: int, scale_factor: float):
    """Static (h, w) per pyramid level, reference scaling semantics
    (round, like cv::resize with 1/scale^level)."""
    shapes = []
    for lv in range(n_levels):
        s = 1.0 / (scale_factor**lv)
        shapes.append((int(round(height * s)), int(round(width * s))))
    return shapes


@functools.lru_cache(maxsize=16)
def _gaussian_kernel(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, radius: int = 3):
    """Separable Gaussian blur of a single-channel image (H, W) f32.
    Matches the 7x7 sigma=2 blur the reference applies before BRIEF
    (ORBextractor.cc:1038-1045)."""
    k = jnp.asarray(_gaussian_kernel(sigma, radius))
    x = img[None, :, :, None]  # NHWC
    kh = k.reshape(1, -1, 1, 1)
    kw = k.reshape(-1, 1, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(0, 0), (radius, radius)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(radius, radius), (0, 0)], dimension_numbers=dn)
    return x[0, :, :, 0]


def gaussian_blur_batched(stack: jnp.ndarray, sigma: float = 2.0,
                          radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur of a batch of single-channel images
    (L, H, W) f32 — one conv pair for every pyramid level instead of one
    per level (identical per-level values: the zero padding of the canvas
    matches the zero-pad conv boundary of :func:`gaussian_blur`)."""
    k = jnp.asarray(_gaussian_kernel(sigma, radius))
    x = stack[..., None]  # LHWC
    kh = k.reshape(1, -1, 1, 1)
    kw = k.reshape(-1, 1, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(0, 0), (radius, radius)], dimension_numbers=dn
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(radius, radius), (0, 0)], dimension_numbers=dn
    )
    return x[..., 0]


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float):
    """f32 image (H, W) -> list of n_levels images with static shapes.

    Bilinear resize from the previous level (like cv::resize INTER_LINEAR in
    the reference), not from level 0, to match its low-pass cascade.
    """
    shapes = level_shapes(img.shape[0], img.shape[1], n_levels, scale_factor)
    levels = [img]
    for lv in range(1, n_levels):
        prev = levels[-1]
        levels.append(
            jax.image.resize(prev, shapes[lv], method="linear", antialias=False)
        )
    return levels


def scale_factors(n_levels: int, scale_factor: float) -> np.ndarray:
    return np.asarray([scale_factor**lv for lv in range(n_levels)], np.float32)
