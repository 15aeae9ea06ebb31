import numpy as np
import jax
import jax.numpy as jnp

from defslam_tpu.ops import lm


def test_lm_quadratic_exact():
    # linear residual -> one LM step should land near the optimum
    A = jnp.asarray(np.random.default_rng(0).normal(size=(20, 5)), jnp.float32)
    x_true = jnp.asarray([1.0, -2.0, 0.5, 3.0, -0.7])
    b = A @ x_true

    res = lm.lm_solve(lambda x: A @ x - b, jnp.zeros(5), num_iters=5)
    np.testing.assert_allclose(res.x, x_true, atol=1e-3)
    assert float(res.cost) < 1e-6


def test_lm_rosenbrock():
    def residual(x):
        return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    res = lm.lm_solve(residual, jnp.asarray([-1.2, 1.0]), num_iters=60)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-3)


def test_lm_huber_rejects_outliers():
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.uniform(-1, 1, 40), jnp.float32)
    y = 2.0 * t + 1.0
    y = y.at[:5].add(50.0)  # gross outliers

    def residual(x):
        return x[0] * t + x[1] - y

    wfn = lambda r: lm.huber_block_weights(r, block=1, delta=0.5)
    res = lm.lm_solve(residual, jnp.zeros(2), num_iters=30, weight_fn=wfn)
    # Huber downweights (doesn't fully reject) outliers: small bias expected.
    np.testing.assert_allclose(res.x, [2.0, 1.0], atol=0.12)
    # plain least squares on the same data is wildly biased — sanity contrast
    res_ls = lm.lm_solve(residual, jnp.zeros(2), num_iters=30)
    assert abs(float(res_ls.x[1]) - 1.0) > 1.0


def test_lm_vmapped_batch():
    # thousands of independent tiny problems in one call — the NormalEstimator
    # pattern (reference solves these serially per map point)
    rng = np.random.default_rng(2)
    P = 512
    targets = jnp.asarray(rng.normal(size=(P, 2)), jnp.float32)

    def make_res(target):
        def residual(x):
            # nonlinear 2-var problem with unique optimum at `target`
            return jnp.stack(
                [
                    x[0] - target[0] + 0.3 * jnp.sin(x[1]),
                    x[1] - target[1],
                ]
            )

        return residual

    def solve_one(target):
        return lm.lm_solve(make_res(target), jnp.zeros(2), num_iters=25)

    out = jax.vmap(solve_one)(targets)
    expect_x0 = targets[:, 0] - 0.3 * jnp.sin(targets[:, 1])
    np.testing.assert_allclose(out.x[:, 1], targets[:, 1], atol=1e-3)
    np.testing.assert_allclose(out.x[:, 0], expect_x0, atol=1e-3)
    # covariance consumer: JtJ is (P, 2, 2) and positive definite
    eigs = np.linalg.eigvalsh(np.asarray(out.JtJ))
    assert (eigs > 0).all()


def test_lm_retract_manifold():
    # optimize on a circle: x = angle, retraction wraps
    def residual(theta):
        p = jnp.stack([jnp.cos(theta[0]), jnp.sin(theta[0])])
        return p - jnp.asarray([0.0, 1.0])

    res = lm.lm_solve(residual, jnp.asarray([0.3]), num_iters=20)
    np.testing.assert_allclose(float(res.x[0]), np.pi / 2, atol=1e-3)
