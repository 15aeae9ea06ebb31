import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from defslam_tpu.geometry import se3


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    # |w| < pi so the log is the principal branch
    w = jnp.asarray(rng.normal(size=(32, 3)) * 0.6, dtype=jnp.float32)
    R = jax.vmap(se3.so3_exp)(w)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    w2 = jax.vmap(se3.so3_log)(R)
    np.testing.assert_allclose(w, w2, atol=1e-4)
    # beyond pi, exp(log(R)) must still reproduce R (equivalent rotation)
    wbig = jnp.asarray(rng.normal(size=(8, 3)) * 2.0, dtype=jnp.float32)
    Rb = jax.vmap(se3.so3_exp)(wbig)
    Rb2 = jax.vmap(se3.so3_exp)(jax.vmap(se3.so3_log)(Rb))
    np.testing.assert_allclose(Rb, Rb2, atol=1e-3)


def test_so3_exp_matches_scipy():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(16, 3))
    R_ours = np.asarray(jax.vmap(se3.so3_exp)(jnp.asarray(w, jnp.float32)))
    R_scipy = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)


def test_so3_small_angle():
    w = jnp.asarray([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]], jnp.float32)
    R = jax.vmap(se3.so3_exp)(w)
    assert np.isfinite(np.asarray(R)).all()
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-7)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.normal(size=(32, 6)), dtype=jnp.float32)
    # keep rotation part below pi (principal branch)
    xi = xi.at[:, 3:].multiply(0.5)
    T = jax.vmap(se3.se3_exp)(xi)
    xi2 = jax.vmap(se3.se3_log)(T)
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_se3_inverse_compose():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32)
    T = se3.se3_exp(xi)
    np.testing.assert_allclose(T @ se3.inverse(T), np.eye(4), atol=1e-5)


def test_transform_points():
    xi = jnp.asarray([0.1, -0.2, 0.3, 0.05, 0.02, -0.04], jnp.float32)
    T = se3.se3_exp(xi)
    p = jnp.asarray(np.random.default_rng(4).normal(size=(10, 3)), jnp.float32)
    q = se3.transform(T, p)
    q_ref = (np.asarray(T[:3, :3]) @ np.asarray(p).T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(q, q_ref, atol=1e-5)


def test_horn_alignment_recovers_sim3():
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    R_true = Rotation.from_rotvec([0.2, -0.1, 0.4]).as_matrix().astype(np.float32)
    s_true, t_true = 2.5, np.array([0.3, -1.0, 0.7], np.float32)
    dst = s_true * src @ R_true.T + t_true
    w = jnp.ones(50)
    s, R, t = se3.horn_alignment(src, jnp.asarray(dst), w)
    np.testing.assert_allclose(float(s), s_true, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)


def test_horn_alignment_respects_mask():
    rng = np.random.default_rng(6)
    src = rng.normal(size=(60, 3)).astype(np.float32)
    R_true = Rotation.from_rotvec([0.1, 0.2, -0.3]).as_matrix().astype(np.float32)
    dst = 1.7 * src @ R_true.T + np.array([1.0, 2.0, 3.0], np.float32)
    # corrupt masked-out points
    dst[40:] += rng.normal(size=(20, 3)).astype(np.float32) * 100
    w = jnp.asarray(np.r_[np.ones(40), np.zeros(20)], jnp.float32)
    s, R, t = se3.horn_alignment(jnp.asarray(src), jnp.asarray(dst), w)
    np.testing.assert_allclose(float(s), 1.7, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
