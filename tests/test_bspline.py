import numpy as np
import jax.numpy as jnp
from scipy.interpolate import BSpline

from defslam_tpu.ops import bspline


def _scipy_design(x, lo, hi, n, order):
    """1D uniform cubic B-spline design matrix via scipy (oracle)."""
    h = (hi - lo) / (n - 3)
    knots = lo + (np.arange(n + 4) - 3) * h
    rows = np.zeros((len(x), n))
    for j in range(n):
        c = np.zeros(n)
        c[j] = 1.0
        spl = BSpline(knots, c, 3, extrapolate=True)
        rows[:, j] = spl(x, nu=order)
    return rows


def test_basis_partition_of_unity():
    x = jnp.linspace(0.0, 1.0, 57)
    C = bspline.coloc_1d(x, 0.0, 1.0, 13, 0)
    np.testing.assert_allclose(np.asarray(C).sum(axis=1), 1.0, atol=1e-5)


def test_coloc_1d_matches_scipy():
    lo, hi, n = -0.4, 0.9, 13
    x = np.linspace(lo, hi - 1e-6, 40)
    for order in (0, 1, 2):
        ours = np.asarray(bspline.coloc_1d(jnp.asarray(x, jnp.float32), lo, hi, n, order))
        ref = _scipy_design(x, lo, hi, n, order)
        np.testing.assert_allclose(ours, ref, atol=2e-3 * (10.0**order))


def test_evaluate_reproduces_polynomial():
    # fit a bicubic polynomial (inside the spline space) and check values +
    # derivatives analytically
    dom = jnp.asarray([0.0, 2.0, -1.0, 1.0])
    nu, nv = 13, 15

    def f(u, v):
        return 0.5 + u + 0.3 * v + 0.2 * u * v + 0.1 * u**2 - 0.05 * v**2

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(0, 2, 400), jnp.float32)
    v = jnp.asarray(rng.uniform(-1, 1, 400), jnp.float32)
    y = f(u, v)[:, None]
    B = bspline.bending_matrix(dom, nu, nv)
    ctrl = bspline.fit_ridge(u, v, y, dom, nu, nv, 1e-8, bending=B)

    # query the well-supported interior (near-boundary cells are dominated by
    # the ridge prior, as for any smoothing spline)
    uq = jnp.asarray(rng.uniform(0.3, 1.7, 50), jnp.float32)
    vq = jnp.asarray(rng.uniform(-0.7, 0.7, 50), jnp.float32)
    val = bspline.evaluate(ctrl, uq, vq, dom)[:, 0]
    np.testing.assert_allclose(val, f(uq, vq), atol=1e-2)

    d_u = bspline.evaluate(ctrl, uq, vq, dom, du=1)[:, 0]
    np.testing.assert_allclose(d_u, 1.0 + 0.2 * vq + 0.2 * uq, atol=3e-2)
    d_v = bspline.evaluate(ctrl, uq, vq, dom, dv=1)[:, 0]
    np.testing.assert_allclose(d_v, 0.3 + 0.2 * uq - 0.1 * vq, atol=3e-2)
    d_uv = bspline.evaluate(ctrl, uq, vq, dom, du=1, dv=1)[:, 0]
    np.testing.assert_allclose(d_uv, 0.2 * jnp.ones(50), atol=5e-2)
    d_uu = bspline.evaluate(ctrl, uq, vq, dom, du=2)[:, 0]
    np.testing.assert_allclose(d_uu, 0.2 * jnp.ones(50), atol=8e-2)


def test_evaluate_equals_coloc():
    dom = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    nu, nv = 7, 9
    rng = np.random.default_rng(1)
    ctrl = jnp.asarray(rng.normal(size=(nu, nv, 2)), jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, 30), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 1, 30), jnp.float32)
    for du, dv in ((0, 0), (1, 0), (0, 1), (1, 1), (2, 0)):
        ev = bspline.evaluate(ctrl, u, v, dom, du, dv)
        C = bspline.coloc_2d(u, v, dom, nu, nv, du, dv)
        ev2 = C @ ctrl.reshape(nu * nv, 2)
        np.testing.assert_allclose(ev, ev2, atol=1e-4, rtol=1e-4)


def test_bending_zero_for_linear_surface():
    dom = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    nu, nv = 13, 15
    B = bspline.bending_matrix(dom, nu, nv)
    # control points of an (affine-precision) linear surface: Greville points
    gu = np.array([np.mean([(k - 2) / (nu - 3) for k in range(j, j + 3)]) for j in range(nu)])
    gv = np.array([np.mean([(k - 2) / (nv - 3) for k in range(j, j + 3)]) for j in range(nv)])
    ctrl = (2.0 * gu[:, None] + 3.0 * gv[None, :] + 1.0).reshape(-1)
    energy = float(ctrl @ np.asarray(B) @ ctrl)
    # curved surface f = u^2 + v^2: f_uu = f_vv = 2 -> energy = 8
    ctrl2 = (gu[:, None] ** 2 + gv[None, :] ** 2).reshape(-1)
    energy2 = float(ctrl2 @ np.asarray(B) @ ctrl2)
    np.testing.assert_allclose(energy2, 8.0, rtol=0.05)
    # linear surface has zero bending; f32 storage of B leaves ~0.1% residue
    assert abs(energy) < 1e-2 * energy2


def test_fit_ridge_weighted():
    dom = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.uniform(0, 1, 200), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 1, 200), jnp.float32)
    y = (u + v)[:, None]
    y = y.at[150:].add(100.0)  # corrupted tail, masked out
    w = jnp.asarray(np.r_[np.ones(150), np.zeros(50)], jnp.float32)
    B = bspline.bending_matrix(dom, 7, 7)
    ctrl = bspline.fit_ridge(u, v, y, dom, 7, 7, 1e-6, weights=w, bending=B)
    val = bspline.evaluate(ctrl, u[:150], v[:150], dom)[:, 0]
    np.testing.assert_allclose(val, (u + v)[:150], atol=1e-2)


def test_bending_matrix_dyn_matches_host_precompute():
    """bending_matrix_dyn (jittable affine rescale of three unit-domain
    components) must reproduce the f64 host quadrature bending_matrix for
    arbitrary domains — the basis of per-keyframe bbox domains
    (DefKeyFrame.cc:94-133) inside the fused mapping step."""
    for dom in (
        [-0.4, 0.4, -0.3, 0.3],
        [0.0, 0.4, -0.3, -0.05],
        [-1.2, 1.2, -0.9, 0.9],
    ):
        for nu, nv in ((13, 15), (8, 8)):
            B_ref = np.asarray(bspline.bending_matrix(dom, nu, nv))
            B_dyn = np.asarray(
                bspline.bending_matrix_dyn(
                    jnp.asarray(dom, jnp.float32), nu, nv
                )
            )
            rel = np.abs(B_dyn - B_ref).max() / np.abs(B_ref).max()
            assert rel < 2e-5, (dom, nu, nv, rel)
