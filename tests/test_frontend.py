import dataclasses

import numpy as np
import jax.numpy as jnp

from defslam_tpu.config import Config, OrbConfig
from defslam_tpu.frontend import extract_features, level_budgets
from defslam_tpu.ops import fast, matching


def _blob_image(h=120, w=160, n=40, seed=0):
    """Random soft blobs -> textured grayscale image with corners."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(n):
        y, x = rng.integers(10, h - 10), rng.integers(10, w - 10)
        sy, sx = rng.integers(3, 9, 2)
        img[y : y + sy, x : x + sx] += rng.uniform(40, 200)
    return np.clip(img, 0, 255)


def _small_cfg():
    return Config(
        orb=OrbConfig(n_features=200, n_levels=3, max_keypoints=256)
    )


def test_fast_score_square_corners():
    img = np.zeros((64, 64), np.float32)
    img[20:40, 20:40] = 200.0
    score = np.asarray(fast.nms3(fast.score_map(jnp.asarray(img))))
    ys, xs = np.nonzero(score > 20)
    assert len(ys) >= 4
    corners = np.array([[20, 20], [20, 39], [39, 20], [39, 39]])
    for cy, cx in corners:
        d = np.min(np.abs(ys - cy) + np.abs(xs - cx))
        assert d <= 2, f"corner ({cy},{cx}) missed (closest {d})"
    # no responses deep inside the flat square or the flat background
    assert score[28:32, 28:32].max() == 0
    assert score[5:10, 5:10].max() == 0


def test_fast_agrees_with_opencv():
    import cv2

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 1.2)
    img = np.clip((img - img.min()) / (img.max() - img.min()) * 255, 0, 255)
    img = np.round(img).astype(np.float32)
    score = np.asarray(fast.nms3(fast.score_map(jnp.asarray(img))))
    ours = np.stack(np.nonzero(score > 20), axis=1)  # (N, 2) as (y, x)

    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    kps = det.detect(img.astype(np.uint8), None)
    ref = np.array([[kp.pt[1], kp.pt[0]] for kp in kps])
    assert len(ref) > 10
    # most OpenCV corners should have one of ours within 2 px
    hits = 0
    for y, x in ref:
        if np.min(np.abs(ours[:, 0] - y) + np.abs(ours[:, 1] - x)) <= 2:
            hits += 1
    assert hits / len(ref) > 0.8, f"only {hits}/{len(ref)} OpenCV corners matched"


def test_level_budgets_sum():
    b = level_budgets(1200, 8, 1.2)
    assert sum(b) == 1200
    assert all(b[i] >= b[i + 1] for i in range(len(b) - 1))


def test_extract_features_shapes_and_mask():
    cfg = _small_cfg()
    img = jnp.asarray(_blob_image())
    f = extract_features(img, cfg)
    k = cfg.orb.max_keypoints
    assert f.xy.shape == (k, 2) and f.desc.shape == (k, 8)
    assert f.desc.dtype == jnp.uint32
    n_valid = int(f.valid.sum())
    assert n_valid > 30
    # valid keypoints lie inside the image
    xy = np.asarray(f.xy)[np.asarray(f.valid)]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 160).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 120).all()


def test_descriptor_matching_under_shift():
    cfg = _small_cfg()
    img = _blob_image(seed=3)
    shifted = np.roll(img, (7, 12), axis=(0, 1))
    fa = extract_features(jnp.asarray(img), cfg)
    fb = extract_features(jnp.asarray(shifted), cfg)
    d = matching.masked_hamming(fa.desc, fb.desc, fa.valid, fb.valid)
    m = matching.best_match(d, max_dist=60, nn_ratio=0.9, mutual=True)
    got = np.asarray(m.idx)
    ok = got >= 0
    assert ok.sum() >= 20, f"too few matches: {ok.sum()}"
    # matched keypoints should be displaced by ~(12, 7) in (x, y)
    xa = np.asarray(fa.xy)[ok]
    xb = np.asarray(fb.xy)[got[ok]]
    disp = xb - xa
    err = np.abs(disp - np.array([12.0, 7.0]))
    frac_good = np.mean((err < 2.0).all(axis=1))
    assert frac_good > 0.8, f"displacement consistency {frac_good}"


def test_rotation_consistency_filter():
    rng = np.random.default_rng(0)
    n = 100
    angle_a = jnp.asarray(rng.uniform(0, 2 * np.pi, n), jnp.float32)
    # consistent rotation offset for most, junk for 10
    angle_b_full = np.asarray(angle_a) + 0.5
    angle_b_full[:10] = rng.uniform(0, 2 * np.pi, 10)
    idx = jnp.arange(n, dtype=jnp.int32)
    m = matching.Matches(idx=idx, dist=jnp.zeros(n, jnp.int32))
    m2 = matching.rotation_consistency(
        angle_a, jnp.asarray(angle_b_full, jnp.float32), m
    )
    kept = np.asarray(m2.idx) >= 0
    assert kept[10:].mean() > 0.95  # consistent ones survive
    assert kept[:10].mean() < 0.6  # most junk dropped


def test_undistort_points_roundtrip():
    """undistort(distort(x)) == x for the OpenCV radial-tangential model
    (Frame::UndistortKeyPoints parity)."""
    import numpy as np
    import jax.numpy as jnp
    from defslam_tpu.geometry import camera as cam

    K = jnp.asarray([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    dist = (-0.28, 0.07, 1e-4, -2e-4, 0.0)  # Hamlyn-ish coefficients
    rng = np.random.default_rng(0)
    uv = jnp.asarray(
        np.stack([rng.uniform(20, 300, 200), rng.uniform(20, 220, 200)], 1),
        jnp.float32,
    )
    distorted = cam.distort_points(K, dist, uv)
    recovered = cam.undistort_points(K, dist, distorted)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(uv), atol=0.02)
    # zero coefficients -> exact identity
    same = cam.undistort_points(K, (0.0,) * 5, uv)
    np.testing.assert_allclose(np.asarray(same), np.asarray(uv), atol=1e-5)


def test_frontend_applies_undistortion():
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from defslam_tpu.config import CameraConfig, Config, OrbConfig
    from defslam_tpu.frontend import extract_features

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (120, 160)).astype(np.float32))
    base = Config(
        camera=CameraConfig(width=160, height=120, fx=120, fy=120, cx=80, cy=60),
        orb=OrbConfig(n_features=100, n_levels=2, max_keypoints=128),
    )
    warped_cam = dataclasses.replace(base.camera, k1=-0.2)
    f0 = extract_features(img, base)
    f1 = extract_features(img, dataclasses.replace(base, camera=warped_cam))
    xy0 = np.asarray(f0.xy)[np.asarray(f0.valid)]
    xy1 = np.asarray(f1.xy)[np.asarray(f1.valid)]
    assert xy0.shape == xy1.shape
    # same detections, shifted coordinates (away from the center for k1<0)
    d = np.linalg.norm(xy0 - xy1, axis=1)
    assert d.max() > 0.5, "undistortion had no effect"


def test_two_threshold_tile_admission():
    """select_grid_topk implements the reference's two-threshold FAST per
    tile (ORBextractor.cc:765-857): a second corner in a tile is admitted
    when it clears iniTh (strong cell) or when the whole tile is below
    iniTh and it clears minTh (the retry pass returns everything)."""
    import jax.numpy as jnp
    import numpy as np
    from defslam_tpu.ops import fast

    score = np.zeros((8, 24), np.float32)
    score[2, 2], score[5, 5] = 30.0, 25.0    # tile 0: two strong -> both
    score[2, 10], score[5, 13] = 30.0, 10.0  # tile 1: strong cell -> weak dropped
    score[2, 18], score[5, 21] = 12.0, 9.0   # tile 2: retry cell -> both
    xy, s = fast.select_grid_topk(
        jnp.asarray(score), threshold=7.0, cell=8, k=8, ini_threshold=20.0
    )
    got = {(int(x), int(y)) for (x, y), sc in
           zip(np.asarray(xy), np.asarray(s)) if sc > 0}
    assert got == {(2, 2), (5, 5), (10, 2), (18, 2), (21, 5)}, got


def test_level_quota_truncation_keeps_coarse_levels():
    """When max_keypoints < the total per-level budget, truncation preserves
    each pyramid level's proportional quota — a global response top-k would
    starve the coarse levels on a texture-dense image (VERDICT round 2)."""
    import numpy as np
    import jax.numpy as jnp
    from defslam_tpu.config import Config, OrbConfig
    from defslam_tpu import frontend

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (240, 320)).astype(np.float32))
    oc = OrbConfig(n_features=400, n_levels=3, max_keypoints=256)
    cfg = Config(orb=oc)
    feats = frontend.extract_features(img, cfg)
    budgets = frontend.level_budgets(400, 3, oc.scale_factor)
    quotas = frontend._level_quotas(budgets, 256)
    lv = np.asarray(feats.level)
    valid = np.asarray(feats.valid)
    assert valid.sum() > 200  # noise image saturates the budget
    for l, q in enumerate(quotas):
        n_l = int(((lv == l) & valid).sum())
        # every level must keep (nearly) its proportional quota
        assert n_l >= int(0.8 * q), f"level {l}: {n_l} < quota {q}"
