"""Two-view monocular initialization: batched H/F RANSAC, pure jnp.

TPU-native re-design of the reference's ``Initializer``
(``Thirdparty/ORBSLAM_2/src/Initializer.cc:44-733``).  The reference runs two
CPU threads, each looping over 200 RANSAC iterations with per-iteration
8-point DLT solves and per-point transfer-error loops.  Here every level of
that nest is one batched array op:

- all 200 homography DLTs are one (200, 16, 9) SVD,
- all 200 fundamental DLTs are one (200, 8, 9) SVD + rank-2 projection,
- scoring is a (200, N) residual matrix reduction,
- the 8 Faugeras homography motions + 4 essential motions are scored as a
  stacked 12-hypothesis cheirality check over all matches at once.

Behavior parity (thresholds cite the reference):
- model selection RH = SH/(SH+SF) > 0.40 -> homography (Initializer.cc:115)
- chi2 thresholds 5.991 (H), 3.841/5.991 (F) (Initializer.cc:333,408-409)
- reconstruction acceptance: winner must triangulate >90% of inliers,
  beat runners-up (0.7/0.75 ratios), and exceed the parallax/count minima
  (Initializer.cc:504-567,721).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST

RANSAC_ITERS = 200
CHI2_H = 5.991
CHI2_F = 3.841
CHI2_F_SCORE = 5.991
MIN_PARALLAX_DEG = 1.0
MIN_TRIANGULATED = 50
COS_PARALLAX_GOOD = 0.99998  # Initializer.cc CheckRT


class InitResult(NamedTuple):
    ok: jnp.ndarray  # () bool
    R: jnp.ndarray  # (3, 3) rotation cam1->cam2
    t: jnp.ndarray  # (3,) unit-norm translation
    xyz: jnp.ndarray  # (N, 3) triangulated points in cam1 frame
    good: jnp.ndarray  # (N,) bool triangulated + inlier
    used_h: jnp.ndarray  # () bool — model selection outcome
    n_good: jnp.ndarray  # () int32


def _normalize(xy: jnp.ndarray, mask: jnp.ndarray):
    """Similarity normalization to mean 0 / mean abs dev 1 per axis
    (Initializer::Normalize).  Returns (normalized xy, 3x3 T)."""
    w = mask.astype(xy.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(xy * w[:, None], axis=0) / n
    d = jnp.abs(xy - mean) * w[:, None]
    md = jnp.maximum(jnp.sum(d, axis=0) / n, 1e-8)
    s = 1.0 / md
    xn = (xy - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]],
        dtype=xy.dtype,
    )
    return xn, T


def _dlt_h(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Homography DLT from 8 correspondences: (8,2),(8,2) -> (3,3).
    Two rows per point (Initializer::ComputeH21)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (16, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1].reshape(3, 3)


def _dlt_f(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Fundamental-matrix DLT + rank-2 projection (Initializer::ComputeF21)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )  # (8, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Fpre = Vt[-1].reshape(3, 3)
    U, D, Vt2 = jnp.linalg.svd(Fpre)
    D = D.at[2].set(0.0)
    return (U * D[None, :]) @ Vt2


def _score_h(H21, H12, xy1, xy2, mask, sigma2=1.0):
    """Symmetric transfer error score (Initializer::CheckHomography)."""

    def transfer(H, a, b):
        x = H[0, 0] * a[:, 0] + H[0, 1] * a[:, 1] + H[0, 2]
        y = H[1, 0] * a[:, 0] + H[1, 1] * a[:, 1] + H[1, 2]
        w = H[2, 0] * a[:, 0] + H[2, 1] * a[:, 1] + H[2, 2]
        winv = 1.0 / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        return ((x * winv - b[:, 0]) ** 2 + (y * winv - b[:, 1]) ** 2) / sigma2

    chi_12 = transfer(H12, xy2, xy1)  # project 2 into 1
    chi_21 = transfer(H21, xy1, xy2)
    in1 = chi_12 < CHI2_H
    in2 = chi_21 < CHI2_H
    inlier = in1 & in2 & mask
    score = jnp.sum(
        jnp.where(mask & in1, CHI2_H - chi_12, 0.0)
        + jnp.where(mask & in2, CHI2_H - chi_21, 0.0)
    )
    return score, inlier


def _score_f(F21, xy1, xy2, mask, sigma2=1.0):
    """Epipolar-distance score (Initializer::CheckFundamental)."""

    def epi(F, a, b):
        # line l = F [a;1] in image b; distance of b to l
        la = F[0, 0] * a[:, 0] + F[0, 1] * a[:, 1] + F[0, 2]
        lb = F[1, 0] * a[:, 0] + F[1, 1] * a[:, 1] + F[1, 2]
        lc = F[2, 0] * a[:, 0] + F[2, 1] * a[:, 1] + F[2, 2]
        num = la * b[:, 0] + lb * b[:, 1] + lc
        return num * num / jnp.maximum(la * la + lb * lb, 1e-12) / sigma2

    chi_21 = epi(F21, xy1, xy2)
    chi_12 = epi(F21.T, xy2, xy1)
    in1 = chi_21 < CHI2_F
    in2 = chi_12 < CHI2_F
    inlier = in1 & in2 & mask
    score = jnp.sum(
        jnp.where(mask & in1, CHI2_F_SCORE - chi_21, 0.0)
        + jnp.where(mask & in2, CHI2_F_SCORE - chi_12, 0.0)
    )
    return score, inlier


def _triangulate(P1: jnp.ndarray, P2: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray):
    """Batched DLT triangulation: projection matrices (3,4), pixels (N,2)
    -> (N, 3).  The 4x4 SVD per point (Initializer::Triangulate) becomes a
    batched eigendecomposition of AtA (same minimizer, eigh batches well)."""
    rows = jnp.stack(
        [
            xy1[:, 0, None] * P1[2] - P1[0],
            xy1[:, 1, None] * P1[2] - P1[1],
            xy2[:, 0, None] * P2[2] - P2[0],
            xy2[:, 1, None] * P2[2] - P2[1],
        ],
        axis=1,
    )  # (N, 4, 4)
    # row normalization: same nullspace, much better f32 conditioning of AtA
    rows = rows / jnp.maximum(
        jnp.linalg.norm(rows, axis=-1, keepdims=True), 1e-12
    )
    AtA = jnp.einsum("nij,nik->njk", rows, rows, precision=_HP)
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[..., 0]  # smallest eigenvalue
    w = X[:, 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[:, :3] / w[:, None]


def _check_rt(R, t, K, xy1, xy2, mask, sigma2=1.0):
    """Count matches triangulating in front of both cameras with small
    reprojection error (Initializer::CheckRT).  Returns
    (n_good, parallax_deg, xyz, good_mask)."""
    P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = _triangulate(P1, P2, xy1, xy2)
    finite = jnp.all(jnp.isfinite(X), axis=-1)
    Xs = jnp.where(finite[:, None], X, 0.0)

    O2 = -R.T @ t
    ray1 = Xs
    ray2 = Xs - O2[None, :]
    n1 = jnp.linalg.norm(ray1, axis=-1)
    n2 = jnp.linalg.norm(ray2, axis=-1)
    cos_par = jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)

    z1 = Xs[:, 2]
    Xc2 = Xs @ R.T + t[None, :]
    z2 = Xc2[:, 2]
    ok_depth = (z1 > 0) & (z2 > 0) & finite

    def reproj_err(P, X, uv):
        h = jnp.concatenate([X, jnp.ones_like(X[:, :1])], axis=1) @ P.T
        z = jnp.where(jnp.abs(h[:, 2]) < 1e-12, 1e-12, h[:, 2])
        p = h[:, :2] / z[:, None]
        return jnp.sum((p - uv) ** 2, axis=-1)

    e1 = reproj_err(P1, Xs, xy1)
    e2 = reproj_err(P2, Xs, xy2)
    th = 4.0 * sigma2  # Initializer.cc:494 (4 sigma^2)
    good = mask & ok_depth & (e1 < th) & (e2 < th) & (cos_par < COS_PARALLAX_GOOD)
    n_good = jnp.sum(good)

    # robust parallax: the min(50, n)-th smallest cos (Initializer::CheckRT tail)
    cos_sorted = jnp.sort(jnp.where(good, cos_par, 2.0))
    k = jnp.clip(jnp.minimum(n_good, 50) - 1, 0, cos_par.shape[0] - 1)
    cos_k = jnp.clip(cos_sorted[k], -1.0, 1.0)
    parallax = jnp.where(n_good > 0, jnp.degrees(jnp.arccos(cos_k)), 0.0)
    return n_good, parallax, Xs, good


def _motions_from_e(E: jnp.ndarray):
    """Four (R, t) motions from an essential matrix (DecomposeE)."""
    U, _, Vt = jnp.linalg.svd(E)
    # keep proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    tu = U[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([tu, -tu, tu, -tu])
    return Rs, ts


def _motions_from_h(H: jnp.ndarray, K: jnp.ndarray):
    """Eight (R, t, valid) motions from a homography via the Faugeras SVD
    decomposition (Initializer::ReconstructH, citing Faugeras & Lustman 1988).
    Returns (Rs (8,3,3), ts (8,3), valid (8,))."""
    A = jnp.linalg.inv(K) @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    # degenerate if singular values are not distinct
    distinct = (d1 / jnp.maximum(d2, 1e-12) > 1.0001) & (
        d2 / jnp.maximum(d3, 1e-12) > 1.0001
    )

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    # case d' > 0
    sin_t = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sins = jnp.array([1.0, -1.0, -1.0, 1.0]) * sin_t

    def rot_p(st):
        return jnp.array(
            [[cos_t, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, cos_t]], H.dtype
        )

    Rp_p = jax.vmap(rot_p)(sins)  # (4, 3, 3)
    tp_p = (x1s[:, None] * jnp.array([1.0, 0.0, 0.0]) - x3s[:, None] * jnp.array([0.0, 0.0, 1.0])) * (d1 - d3)

    # case d' < 0
    sin_ph = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_ph = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sphs = jnp.array([1.0, -1.0, -1.0, 1.0]) * sin_ph

    def rot_n(sp):
        return jnp.array(
            [[cos_ph, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cos_ph]], H.dtype
        )

    Rp_n = jax.vmap(rot_n)(sphs)
    tp_n = (x1s[:, None] * jnp.array([1.0, 0.0, 0.0]) + x3s[:, None] * jnp.array([0.0, 0.0, 1.0])) * (d1 + d3)

    Rp = jnp.concatenate([Rp_p, Rp_n], axis=0)  # (8, 3, 3)
    tp = jnp.concatenate([tp_p, tp_n], axis=0)  # (8, 3)
    Rs = s * jnp.einsum("ij,njk,kl->nil", U, Rp, Vt, precision=_HP)
    ts = jnp.einsum("ij,nj->ni", U, tp, precision=_HP)
    tn = jnp.linalg.norm(ts, axis=-1, keepdims=True)
    ts = ts / jnp.maximum(tn, 1e-12)
    valid = jnp.broadcast_to(distinct, (8,))
    return Rs, ts, valid


def two_view_init(
    xy1: jnp.ndarray,  # (N, 2) pixel coords in frame 1
    xy2: jnp.ndarray,  # (N, 2) matched pixel coords in frame 2
    mask: jnp.ndarray,  # (N,) bool valid correspondence
    K: jnp.ndarray,  # (3, 3)
    key: jnp.ndarray,  # jax PRNG key
    sigma: float = 1.0,
) -> InitResult:
    """Full two-view reconstruction: RANSAC H & F in parallel, model
    selection, motion decomposition, cheirality-checked triangulation
    (Initializer::Initialize, Initializer.cc:44-124).  jit-safe."""
    n = xy1.shape[0]
    sigma2 = sigma * sigma
    p = mask.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    sets = jax.random.choice(key, n, shape=(RANSAC_ITERS, 8), replace=True, p=p)

    x1n, T1 = _normalize(xy1, mask)
    x2n, T2 = _normalize(xy2, mask)
    T2inv = jnp.linalg.inv(T2)

    s1 = x1n[sets]  # (I, 8, 2)
    s2 = x2n[sets]

    def h_of(a, b):
        Hn = _dlt_h(a, b)
        return T2inv @ Hn @ T1

    def f_of(a, b):
        Fn = _dlt_f(a, b)
        return T2.T @ Fn @ T1

    Hs = jax.vmap(h_of)(s1, s2)  # (I, 3, 3)
    Fs = jax.vmap(f_of)(s1, s2)
    Hinvs = jnp.linalg.inv(Hs)

    score_h, inl_h = jax.vmap(lambda H, Hi: _score_h(H, Hi, xy1, xy2, mask, sigma2))(
        Hs, Hinvs
    )
    score_f, inl_f = jax.vmap(lambda F: _score_f(F, xy1, xy2, mask, sigma2))(Fs)

    bh = jnp.argmax(score_h)
    bf = jnp.argmax(score_f)
    SH, SF = score_h[bh], score_f[bf]
    H_best, H_inl = Hs[bh], inl_h[bh]
    F_best, F_inl = Fs[bf], inl_f[bf]

    # refit on ALL inliers (masked-row DLT) — the minimal 8-point model the
    # reference keeps (and later polishes with global BA) leaves ~1 deg of
    # rotation error; one all-inlier least-squares refit is nearly free here
    def _refit_h(inl):
        u1, v1 = x1n[:, 0], x1n[:, 1]
        u2, v2 = x2n[:, 0], x2n[:, 1]
        z = jnp.zeros_like(u1)
        o = jnp.ones_like(u1)
        r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
        r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
        w = inl.astype(x1n.dtype)[:, None]
        A = jnp.concatenate([r1 * w, r2 * w], axis=0)
        _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
        return T2inv @ Vt[-1].reshape(3, 3) @ T1

    def _refit_f(inl):
        u1, v1 = x1n[:, 0], x1n[:, 1]
        u2, v2 = x2n[:, 0], x2n[:, 1]
        o = jnp.ones_like(u1)
        A = jnp.stack(
            [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
        ) * inl.astype(x1n.dtype)[:, None]
        _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
        Fpre = Vt[-1].reshape(3, 3)
        U, D, Vt2 = jnp.linalg.svd(Fpre)
        return T2.T @ ((U * D.at[2].set(0.0)[None, :]) @ Vt2) @ T1

    H_ref = _refit_h(H_inl)
    _, H_inl2 = _score_h(H_ref, jnp.linalg.inv(H_ref), xy1, xy2, mask, sigma2)
    keep_h = jnp.sum(H_inl2) >= jnp.sum(H_inl)
    H_best = jnp.where(keep_h, H_ref, H_best)
    H_inl = jnp.where(keep_h, H_inl2, H_inl)

    F_ref = _refit_f(F_inl)
    _, F_inl2 = _score_f(F_ref, xy1, xy2, mask, sigma2)
    keep_f = jnp.sum(F_inl2) >= jnp.sum(F_inl)
    F_best = jnp.where(keep_f, F_ref, F_best)
    F_inl = jnp.where(keep_f, F_inl2, F_inl)

    use_h = SH / jnp.maximum(SH + SF, 1e-12) > 0.40  # Initializer.cc:115

    # ---- stacked 12-hypothesis reconstruction (8 from H, 4 from E)
    Rs_h, ts_h, valid_h = _motions_from_h(H_best, K)
    E = K.T @ F_best @ K
    Rs_f, ts_f = _motions_from_e(E)
    Rs = jnp.concatenate([Rs_h, Rs_f], axis=0)  # (12, 3, 3)
    ts = jnp.concatenate([ts_h, ts_f], axis=0)
    from_h = jnp.concatenate([jnp.ones(8, bool), jnp.zeros(4, bool)])
    hyp_valid = jnp.concatenate([valid_h, jnp.ones(4, bool)]) & (from_h == use_h)

    inlier = jnp.where(use_h, H_inl, F_inl)
    n_inl = jnp.sum(inlier)

    ng, par, X, good = jax.vmap(
        lambda R, t: _check_rt(R, t, K, xy1, xy2, inlier, sigma2)
    )(Rs, ts)
    ng = jnp.where(hyp_valid, ng, 0)

    best = jnp.argmax(ng)
    n_best = ng[best]
    # runner-up dominance: H needs second<0.75*best (Initializer.cc:721);
    # F rejects if >1 hypothesis has >0.7*best (Initializer.cc:507-517)
    others = ng.at[best].set(0)
    second = jnp.max(others)
    dominance = jnp.where(use_h, second < 0.75 * n_best, second <= 0.7 * n_best)
    n_min = jnp.maximum(
        (0.9 * n_inl.astype(jnp.float32)).astype(jnp.int32), MIN_TRIANGULATED
    )
    count_ok = jnp.where(
        use_h,
        (n_best > MIN_TRIANGULATED) & (n_best > 0.9 * n_inl),
        n_best >= n_min,
    )
    ok = dominance & count_ok & (par[best] > MIN_PARALLAX_DEG) & (n_best > 0)

    return InitResult(
        ok=ok,
        R=Rs[best],
        t=ts[best],
        xyz=X[best],
        good=good[best],
        used_h=use_h,
        n_good=n_best,
    )


two_view_init_jit = jax.jit(two_view_init, static_argnames=("sigma",))
