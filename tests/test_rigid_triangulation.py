"""Epipolar search + triangulation + fuse on a synthetic rigid two-view rig."""

import jax
import jax.numpy as jnp
import numpy as np

from defslam_tpu.geometry import se3
from defslam_tpu.rigid import triangulation as tri

K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])
SIG2 = tri.level_sigma2(8, 1.2)


def _pose(R, t):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    return jnp.asarray(T)


def _setup(n=200, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-2, -1.5, 4.0], [2, 1.5, 9.0], (n, 3)).astype(np.float32)
    T1 = _pose(np.eye(3), np.zeros(3))
    th = np.radians(5.0)
    R2 = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        np.float32,
    )
    T2 = _pose(R2, np.array([-0.5, 0.0, 0.0], np.float32))

    def proj(T):
        Xc = np.asarray(se3.transform(T, jnp.asarray(X)))
        return np.stack(
            [
                500 * Xc[:, 0] / Xc[:, 2] + 320,
                500 * Xc[:, 1] / Xc[:, 2] + 240,
            ],
            axis=-1,
        ).astype(np.float32)

    xy1, xy2 = proj(T1), proj(T2)
    desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    return X, T1, T2, xy1, xy2, desc, rng


def test_epipolar_search_and_triangulation():
    n = 200
    X, T1, T2, xy1, xy2, desc, rng = _setup(n)
    perm = rng.permutation(n)  # kps in image 2 stored shuffled
    xy2s, descs = xy2[perm], desc[perm]
    valid = jnp.ones(n, bool)
    pid = jnp.full(n, -1, jnp.int32)
    ang = jnp.zeros(n)
    lvl = jnp.zeros(n, jnp.int32)

    m = tri.search_for_triangulation(
        jnp.asarray(xy1), jnp.asarray(desc), valid, ang, pid,
        jnp.asarray(xy2s), jnp.asarray(descs), valid, ang, pid,
        lvl, tri.fundamental_from_poses(T1, T2, K), SIG2,
    )
    idx2 = np.asarray(m.idx2)
    found = idx2 >= 0
    assert found.sum() > 0.9 * n
    # matches map back through the shuffle to the same point
    assert (perm[idx2[found]] == np.nonzero(found)[0]).mean() > 0.99

    res = tri.triangulate_matches(
        T1, T2, K,
        jnp.asarray(xy1), lvl, jnp.asarray(xy2s), lvl,
        m.idx2, SIG2, 1.2,
    )
    ok = np.asarray(res.ok)
    assert ok.sum() > 0.9 * n
    err = np.linalg.norm(np.asarray(res.xyz)[ok] - X[ok], axis=1)
    assert np.median(err) < 0.02


def test_triangulation_rejects_low_parallax():
    n = 100
    X, T1, _, xy1, _, desc, _ = _setup(n)
    # nearly identical second camera -> no parallax
    T2 = _pose(np.eye(3), np.array([1e-5, 0, 0], np.float32))
    Xc = np.asarray(se3.transform(T2, jnp.asarray(X)))
    xy2 = np.stack(
        [500 * Xc[:, 0] / Xc[:, 2] + 320, 500 * Xc[:, 1] / Xc[:, 2] + 240], axis=-1
    ).astype(np.float32)
    lvl = jnp.zeros(n, jnp.int32)
    res = tri.triangulate_matches(
        T1, T2, K,
        jnp.asarray(xy1), lvl, jnp.asarray(xy2), lvl,
        jnp.arange(n, dtype=jnp.int32), SIG2, 1.2,
    )
    assert np.asarray(res.ok).sum() < 0.05 * n


def test_fuse_finds_duplicates_and_free_keypoints():
    n = 120
    X, T1, T2, xy1, xy2, desc, rng = _setup(n)
    # keyframe 2 sees all n keypoints; first 60 already bound to points 0..59
    pid = np.full(n, -1, np.int32)
    pid[:60] = np.arange(60)
    valid = jnp.ones(n, bool)
    res = tri.fuse_into_keyframe(
        jnp.asarray(X), jnp.asarray(desc), valid,
        T2, K, jnp.asarray(xy2), jnp.asarray(desc), valid,
        jnp.zeros(n, jnp.int32), jnp.asarray(pid),
        SIG2, 640, 480, radius=3.0,
    )
    kp = np.asarray(res.kp_idx)
    ex = np.asarray(res.existing_pid)
    assert (kp == np.arange(n)).mean() > 0.95  # each point finds its own kp
    hit = kp >= 0
    assert (ex[hit & (kp < 60)] >= 0).all()  # duplicates detected
    assert (ex[hit & (kp >= 60)] == -1).all()  # free keypoints


def test_apply_replacements_lut():
    tables = jnp.asarray(np.array([[0, 1, 2, -1], [3, 2, 0, 1]], np.int32))
    src = jnp.asarray(np.array([2, 0, -1], np.int32))
    dst = jnp.asarray(np.array([7, 5, 0], np.int32))
    out = np.asarray(tri.apply_replacements(tables, src, dst, 8))
    np.testing.assert_array_equal(out, [[5, 1, 7, -1], [3, 7, 5, 1]])
