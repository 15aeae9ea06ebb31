"""Uniform bicubic B-spline surfaces, pure jnp.

TPU-native replacement for the reference's vendored BBS library
(``Thirdparty/BBS/bbs.{h,cc}``: basis evaluation ``bbs.cc:95-120``, point
evaluation ``EvalEigen``, colocation matrices ``colocEigen`` /
``coloc_derivEigen``, bending-energy matrix ``BendingEigen``,
``bbs_coloc.h:31-46``).  Design differences, deliberate:

- The control grids here are tiny (13x15 = 195 coefficients,
  ``bbs_MAC.h:1-6``), so instead of the reference's sparse CSR colocation
  matrices + OpenMP loops, we build **dense** colocation matrices once and
  turn every spline operation into a small matmul — exactly what the MXU
  wants, trivially batched over keyframes/warps with vmap.
- Everything is differentiable, so warp Jacobians w.r.t. control points
  (needed by the Schwarzian regularizer and NRSfM) come from the same code
  path.

Convention: a spline with ``n`` basis functions along an axis over domain
``[lo, hi]`` has ``n - 3`` uniform knot intervals of width
``h = (hi - lo) / (n - 3)``; the cubic basis window at parameter cell ``i``
covers control points ``i .. i+3``.  This matches the classic uniform cubic
B-spline (partition of unity, C2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 4x4 uniform cubic B-spline coefficient matrix: basis_j(t) = sum_k M[j,k] t^k
_M = (
    np.array(
        [
            [1, -3, 3, -1],
            [4, 0, -6, 3],
            [1, 3, 3, -3],
            [0, 0, 0, 1],
        ],
        dtype=np.float64,
    )
    / 6.0
)
# derivative operator on the polynomial coefficients:
# (M @ _D)[j, k] = (k+1) * M[j, k+1], i.e. d/dt of basis_j in monomial form
_D = np.array(
    [[0, 0, 0, 0], [1, 0, 0, 0], [0, 2, 0, 0], [0, 0, 3, 0]], dtype=np.float64
)


def _basis_matrix(order: int) -> jnp.ndarray:
    m = _M
    for _ in range(order):
        m = m @ _D
    return jnp.asarray(m, dtype=jnp.float32)


def _locate(x: jnp.ndarray, lo, hi, n: int):
    """Map coordinates to (cell index, local parameter t in [0,1])."""
    nint = n - 3
    h = (hi - lo) / nint
    s = (x - lo) / h
    i = jnp.clip(jnp.floor(s), 0, nint - 1).astype(jnp.int32)
    t = s - i.astype(x.dtype)
    return i, t, h


def basis_1d(x: jnp.ndarray, lo, hi, n: int, order: int = 0):
    """Evaluate the 4 active cubic basis functions (and derivative order).

    Returns (idx (...,), w (..., 4)): contribution of control points
    idx..idx+3, scaled by the chain-rule factor h^{-order}.
    """
    i, t, h = _locate(x, lo, hi, n)
    m = _basis_matrix(order)  # (4 basis, 4 monomial coeffs)
    # Horner evaluation (avoids a matmul that TPU would run in bf16)
    tt = t[..., None]
    w = m[:, 3] * tt
    w = (w + m[:, 2]) * tt
    w = (w + m[:, 1]) * tt
    w = w + m[:, 0]
    w = w / (h**order)
    return i, w


def coloc_1d(x: jnp.ndarray, lo, hi, n: int, order: int = 0) -> jnp.ndarray:
    """Dense 1D colocation matrix (..., n): row r = d^order/dx^order of the
    basis functions at x[r]."""
    i, w = basis_1d(x, lo, hi, n, order)
    cols = i[..., None] + jnp.arange(4)  # (..., 4)
    onehot = (cols[..., None] == jnp.arange(n)).astype(w.dtype)  # (..., 4, n)
    return jnp.einsum("...k,...kn->...n", w, onehot)


def coloc_2d(
    u: jnp.ndarray,
    v: jnp.ndarray,
    dom: jnp.ndarray,
    nu: int,
    nv: int,
    du: int = 0,
    dv: int = 0,
) -> jnp.ndarray:
    """Dense 2D colocation matrix (N, nu*nv) for mixed derivative (du, dv).

    ``dom`` = [umin, umax, vmin, vmax].  ``coloc_2d(...) @ ctrl.reshape(-1, C)``
    evaluates the surface (or its derivative) at the N query points.
    Equivalent of BBS ``colocEigen``/``coloc_derivEigen``.
    """
    cu = coloc_1d(u, dom[0], dom[1], nu, du)  # (N, nu)
    cv = coloc_1d(v, dom[2], dom[3], nv, dv)  # (N, nv)
    return (cu[:, :, None] * cv[:, None, :]).reshape(u.shape[0], nu * nv)


def evaluate(
    ctrl: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    dom: jnp.ndarray,
    du: int = 0,
    dv: int = 0,
) -> jnp.ndarray:
    """Evaluate a spline with control grid ctrl (nu, nv, C) (or (nu, nv)) at
    points (N,), with mixed derivative order (du, dv).  Equivalent of BBS
    ``EvalEigen`` (bbs.cc).  Gather-based (no dense matrix) — cheap for
    per-frame evaluation paths.
    """
    squeeze = ctrl.ndim == 2
    if squeeze:
        ctrl = ctrl[..., None]
    nu, nv, C = ctrl.shape
    iu, wu = basis_1d(u, dom[0], dom[1], nu, du)  # (N,), (N, 4)
    iv, wv = basis_1d(v, dom[2], dom[3], nv, dv)
    # gather the 4x4 control window per point
    off = jnp.arange(4)
    gu = iu[:, None] + off  # (N, 4)
    gv = iv[:, None] + off
    flat = ctrl.reshape(nu * nv, C)
    idx = gu[:, :, None] * nv + gv[:, None, :]  # (N, 4, 4)
    window = flat[idx.reshape(-1)].reshape(u.shape[0], 4, 4, C)
    out = jnp.einsum("ni,nj,nijc->nc", wu, wv, window)
    return out[..., 0] if squeeze else out


@functools.lru_cache(maxsize=64)
def _gauss_legendre(npts: int):
    x, w = np.polynomial.legendre.leggauss(npts)
    return (x + 1.0) / 2.0, w / 2.0  # remapped to [0, 1]


def bending_matrix(dom, nu: int, nv: int, n_quad: int = 3) -> jnp.ndarray:
    """Dense bending-energy matrix B (nu*nv, nu*nv):

        c^T B c = integral of (f_uu^2 + 2 f_uv^2 + f_vv^2) du dv

    over the domain, for c = ctrl.flatten().  Equivalent of BBS
    ``BendingEigen`` (bbs_coloc.h:31-46).  Computed with Gauss-Legendre
    quadrature per knot cell; exact for the piecewise-cubic integrand when
    n_quad >= 3.  Host-side numpy (precomputed once per domain shape) — the
    result is handed to device code as a constant.
    """
    dom = np.asarray(dom, dtype=np.float64)
    nint_u, nint_v = nu - 3, nv - 3
    hu = (dom[1] - dom[0]) / nint_u
    hv = (dom[3] - dom[2]) / nint_v
    q, qw = _gauss_legendre(n_quad)
    # quadrature points across all cells
    uu = (dom[0] + hu * (np.arange(nint_u)[:, None] + q[None, :])).reshape(-1)
    vv = (dom[2] + hv * (np.arange(nint_v)[:, None] + q[None, :])).reshape(-1)
    wu_q = np.tile(qw * hu, nint_u)
    wv_q = np.tile(qw * hv, nint_v)
    U, V = np.meshgrid(uu, vv, indexing="ij")
    W = np.outer(wu_q, wv_q).reshape(-1)
    # float64 throughout: the entries are O(h^-4) and the energy of smooth
    # surfaces relies on cancellation that f32 cannot represent.
    B = np.zeros((nu * nv, nu * nv), dtype=np.float64)
    for du, dv, fac in ((2, 0, 1.0), (1, 1, 2.0), (0, 2, 1.0)):
        Cu = _coloc_1d_np(U.reshape(-1), dom[0], dom[1], nu, du)
        Cv = _coloc_1d_np(V.reshape(-1), dom[2], dom[3], nv, dv)
        Cm = (Cu[:, :, None] * Cv[:, None, :]).reshape(-1, nu * nv)
        B += fac * np.einsum("q,qi,qj->ij", W, Cm, Cm)
    B = 0.5 * (B + B.T)
    return jnp.asarray(B, dtype=jnp.float32)


@functools.lru_cache(maxsize=8)
def bending_components(nu: int, nv: int, n_quad: int = 3):
    """Unit-domain bending components (B20, B11, B02), each (nu*nv, nu*nv)
    f32, with B11 carrying its cross-term factor 2.  Under the affine domain
    change [0,1]^2 -> [a,b]x[c,d] with su = b-a, sv = d-c the quadrature
    weights scale by su*sv and each derivative row by su^-du * sv^-dv, so

        B(dom) = (sv/su^3) B20 + (1/(su sv)) B11 + (su/sv^3) B02

    exactly — this makes the bending matrix a cheap jittable function of a
    TRACED domain (per-keyframe bbox domains, DefKeyFrame.cc:94-133) from
    three host-precomputed constants."""
    unit = np.asarray([0.0, 1.0, 0.0, 1.0])
    nint_u, nint_v = nu - 3, nv - 3
    hu, hv = 1.0 / nint_u, 1.0 / nint_v
    q, qw = _gauss_legendre(n_quad)
    uu = (hu * (np.arange(nint_u)[:, None] + q[None, :])).reshape(-1)
    vv = (hv * (np.arange(nint_v)[:, None] + q[None, :])).reshape(-1)
    wu_q = np.tile(qw * hu, nint_u)
    wv_q = np.tile(qw * hv, nint_v)
    U, V = np.meshgrid(uu, vv, indexing="ij")
    W = np.outer(wu_q, wv_q).reshape(-1)
    out = []
    for du, dv, fac in ((2, 0, 1.0), (1, 1, 2.0), (0, 2, 1.0)):
        Cu = _coloc_1d_np(U.reshape(-1), unit[0], unit[1], nu, du)
        Cv = _coloc_1d_np(V.reshape(-1), unit[2], unit[3], nv, dv)
        Cm = (Cu[:, :, None] * Cv[:, None, :]).reshape(-1, nu * nv)
        B = fac * np.einsum("q,qi,qj->ij", W, Cm, Cm)
        out.append(jnp.asarray(0.5 * (B + B.T), jnp.float32))
    return tuple(out)


def bending_matrix_dyn(dom: jnp.ndarray, nu: int, nv: int) -> jnp.ndarray:
    """Jittable bending matrix for a traced domain — exact scaling of the
    three unit-domain components (see :func:`bending_components`)."""
    B20, B11, B02 = bending_components(nu, nv)
    su = dom[1] - dom[0]
    sv = dom[3] - dom[2]
    return (sv / su**3) * B20 + (1.0 / (su * sv)) * B11 + (su / sv**3) * B02


def _coloc_1d_np(x: np.ndarray, lo: float, hi: float, n: int, order: int):
    """float64 numpy twin of coloc_1d, used for host-side precomputation."""
    nint = n - 3
    h = (hi - lo) / nint
    s = (x - lo) / h
    i = np.clip(np.floor(s), 0, nint - 1).astype(np.int64)
    t = s - i
    m = _M.copy()
    for _ in range(order):
        m = m @ _D
    powers = np.stack([np.ones_like(t), t, t * t, t**3], axis=-1)
    w = powers @ m.T / h**order  # (N, 4)
    C = np.zeros((len(x), n))
    np.add.at(C, (np.arange(len(x))[:, None], i[:, None] + np.arange(4)), w)
    return C


def fit_ridge(
    u: jnp.ndarray,
    v: jnp.ndarray,
    values: jnp.ndarray,
    dom: jnp.ndarray,
    nu: int,
    nv: int,
    bending_weight: float | jnp.ndarray,
    weights: jnp.ndarray | None = None,
    bending: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Closed-form bending-regularized least-squares spline fit.

    Solves min_c |W^(1/2)(A c - y)|^2 + lambda c^T B c — the same normal
    system as the reference's Warp::initialize (Schwarp.cc:99-160, LDLT
    solve).  values: (N, C); returns ctrl (nu, nv, C).
    """
    A = coloc_2d(u, v, dom, nu, nv)  # (N, K)
    K = nu * nv
    if weights is None:
        weights = jnp.ones(u.shape[0], dtype=A.dtype)
    B = bending if bending is not None else bending_matrix(dom, nu, nv)
    hp = jax.lax.Precision.HIGHEST
    AtA = jnp.einsum("n,ni,nj->ij", weights, A, A, precision=hp) + bending_weight * B
    # f32 conditioning floor: basis functions with no data support make AtA
    # near-singular; a trace-scaled identity ridge keeps the Cholesky stable
    # without visibly biasing supported coefficients.
    ridge = 1e-6 * jnp.trace(AtA) / K
    AtA = AtA + ridge * jnp.eye(K, dtype=A.dtype)
    Aty = jnp.einsum("n,ni,nc->ic", weights, A, values, precision=hp)
    ctrl = jnp.linalg.solve(AtA, Aty)
    return ctrl.reshape(nu, nv, -1)
