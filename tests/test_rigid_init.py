"""Two-view initializer: recover known (R, t) from synthetic correspondences.

Mirrors the reference's implicit contract (Initializer.cc): general scenes go
through the fundamental path, planar scenes through the homography path; the
returned motion matches ground truth up to the monocular scale gauge.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from defslam_tpu.rigid import initializer as ini

K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])


def _project(K, R, t, X):
    Xc = X @ np.asarray(R).T + np.asarray(t)
    return (
        np.stack(
            [
                500.0 * Xc[:, 0] / Xc[:, 2] + 320.0,
                500.0 * Xc[:, 1] / Xc[:, 2] + 240.0,
            ],
            axis=-1,
        ),
        Xc[:, 2],
    )


def _rot(axis, deg):
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    th = np.radians(deg)
    Kx = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx


def _run_case(X, R, t, n_pad=512, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    xy1, z1 = _project(K, np.eye(3), np.zeros(3), X)
    xy2, z2 = _project(K, R, t, X)
    ok = (z1 > 0.1) & (z2 > 0.1)
    ok &= (np.abs(xy1[:, 0] - 320) < 310) & (np.abs(xy1[:, 1] - 240) < 230)
    ok &= (np.abs(xy2[:, 0] - 320) < 310) & (np.abs(xy2[:, 1] - 240) < 230)
    xy1 = xy1 + rng.normal(0, noise, xy1.shape)
    xy2 = xy2 + rng.normal(0, noise, xy2.shape)
    n = X.shape[0]
    p1 = np.zeros((n_pad, 2), np.float32)
    p2 = np.zeros((n_pad, 2), np.float32)
    m = np.zeros(n_pad, bool)
    p1[:n], p2[:n], m[:n] = xy1, xy2, ok
    res = ini.two_view_init_jit(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(m), K, jax.random.PRNGKey(3)
    )
    return jax.device_get(res)


def _angle_between(Ra, Rb):
    ctheta = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(ctheta, -1, 1)))


def test_general_scene_fundamental_path():
    rng = np.random.default_rng(1)
    X = rng.uniform([-2, -1.5, 4.0], [2, 1.5, 9.0], (300, 3))
    R = _rot([0.2, 1.0, 0.1], 6.0)
    t = np.array([0.4, 0.02, 0.05])
    res = _run_case(X, R, t)
    assert bool(res.ok)
    assert not bool(res.used_h)
    assert _angle_between(np.asarray(res.R), R) < 1.0
    t_est = np.asarray(res.t)
    cos = abs(t_est @ t / np.linalg.norm(t))
    assert cos > 0.995  # translation direction (scale is unobservable)
    # triangulated structure matches GT up to the same global scale
    good = np.asarray(res.good)
    assert good.sum() > 150
    Xe = np.asarray(res.xyz)[good]
    Xg = X[good[: X.shape[0]].nonzero()[0]]
    s = np.median(Xg[:, 2] / Xe[:, 2])
    assert np.median(np.linalg.norm(Xe * s - Xg, axis=1)) < 0.1


def test_planar_scene_homography_path():
    rng = np.random.default_rng(2)
    uv = rng.uniform([-2, -1.5], [2, 1.5], (300, 2))
    # plane with slight tilt at z=6
    X = np.stack([uv[:, 0], uv[:, 1], 6.0 + 0.3 * uv[:, 0]], axis=-1)
    R = _rot([0.0, 1.0, 0.0], 8.0)
    t = np.array([0.6, 0.05, 0.1])
    res = _run_case(X, R, t)
    assert bool(res.ok)
    assert bool(res.used_h)
    assert _angle_between(np.asarray(res.R), R) < 1.5
    cos = abs(np.asarray(res.t) @ t / np.linalg.norm(t))
    assert cos > 0.99


def test_pure_rotation_rejected():
    rng = np.random.default_rng(3)
    X = rng.uniform([-2, -1.5, 4.0], [2, 1.5, 9.0], (300, 3))
    R = _rot([0, 1, 0], 3.0)
    res = _run_case(X, R, np.zeros(3) + 1e-6)
    assert not bool(res.ok)  # no parallax -> must not initialize


def test_too_few_matches_rejected():
    rng = np.random.default_rng(4)
    X = rng.uniform([-2, -1.5, 4.0], [2, 1.5, 9.0], (30, 3))
    R = _rot([0.2, 1.0, 0.1], 6.0)
    res = _run_case(X, R, np.array([0.4, 0.0, 0.0]))
    assert not bool(res.ok)  # < MIN_TRIANGULATED
