"""Native runtime library: build, bindings, and fallback parity."""

import os

import numpy as np
import pytest

from defslam_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "native library failed to build/load"


def test_covis_shared_matches_numpy():
    rng = np.random.default_rng(0)
    k = 300
    a = np.full(k, -1, np.int32)
    b = np.full(k, -1, np.int32)
    a[rng.choice(k, 120, replace=False)] = rng.choice(500, 120, replace=False)
    b[rng.choice(k, 150, replace=False)] = rng.choice(500, 150, replace=False)
    kp_a, kp_b, pid = native.covis_shared(a, b, 256)
    # every returned pair indexes the same point in both tables
    assert (a[kp_a] == pid).all() and (b[kp_b] == pid).all()
    expected = np.intersect1d(a[a >= 0], b[b >= 0])
    assert sorted(pid.tolist()) == sorted(expected.tolist())


def test_accumulate_obs_scatter():
    rng = np.random.default_rng(1)
    n_pairs, cap, n_points, obs_cap = 3, 16, 32, 4
    pid = rng.integers(-1, n_points, (n_pairs, cap)).astype(np.int32)
    mask = rng.random((n_pairs, cap)) > 0.3
    uv1 = rng.normal(size=(n_pairs, cap, 2)).astype(np.float32)
    warped = rng.normal(size=(n_pairs, cap, 2)).astype(np.float32)
    J12 = rng.normal(size=(n_pairs, cap, 2, 2)).astype(np.float32)
    Huu = rng.normal(size=(n_pairs, cap, 2)).astype(np.float32)
    Hvv = rng.normal(size=(n_pairs, cap, 2)).astype(np.float32)
    tables, counts = native.accumulate_obs(
        pid, mask, uv1, warped, J12, Huu, Hvv, n_points, obs_cap
    )
    # verify against a straightforward python re-implementation
    exp_counts = np.zeros(n_points, np.int32)
    for pi in range(n_pairs):
        for j in range(cap):
            p = pid[pi, j]
            if not mask[pi, j] or p < 0:
                continue
            o = exp_counts[p]
            if o >= obs_cap:
                continue
            np.testing.assert_array_equal(tables["uv1"][p, o], uv1[pi, j])
            np.testing.assert_array_equal(tables["J12"][p, o], J12[pi, j])
            assert tables["mask"][p, o]
            exp_counts[p] += 1
    np.testing.assert_array_equal(counts, exp_counts)
    assert int(tables["mask"].sum()) == int(exp_counts.sum())


def test_frame_pipeline_reads_images(tmp_path):
    import cv2

    rng = np.random.default_rng(2)
    paths = []
    imgs = []
    for i in range(6):
        img = rng.integers(0, 255, (40, 60), np.uint8)
        p = str(tmp_path / f"frame_{i:03d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
        imgs.append(img)
    fp = native.FramePipeline(paths, width=60, height=40, n_threads=2)
    seen = {}
    for idx, frame in fp:
        seen[idx] = frame
    fp.close()
    assert sorted(seen) == list(range(6))  # in order, none dropped
    for i in range(6):
        np.testing.assert_allclose(seen[i], imgs[i].astype(np.float32))


def test_frame_pipeline_rectifies(tmp_path):
    """fp_set_rectify applies the undistort-rectify maps inside the C++
    prefetch threads (the stereo CLI path, stereo_groundtruth.cc:56-94)."""
    import cv2

    rng = np.random.default_rng(5)
    img = cv2.GaussianBlur(
        rng.integers(0, 255, (40, 60)).astype(np.uint8), (0, 0), 1.0
    )
    p = str(tmp_path / "f_0.png")
    cv2.imwrite(p, img)
    # shift-by-3px map
    xs, ys = np.meshgrid(np.arange(60, dtype=np.float32),
                         np.arange(40, dtype=np.float32))
    mx, my = xs + 3.0, ys
    fp = native.FramePipeline([p], width=60, height=40, n_threads=1,
                              rectify_maps=(mx, my))
    frames = {i: f for i, f in fp}
    fp.close()
    want = cv2.remap(img.astype(np.float32), mx, my, cv2.INTER_LINEAR)
    np.testing.assert_allclose(frames[0], want, atol=1.0)
