"""Dataset loaders matching the reference's app input layouts.

Reference apps (``Apps/``):
- ``DefSLAM <vocab> <yaml> <video|camera>``          (simple_camera.cc:4-55)
- ``DefSLAMGT``: rectified stereo pairs named ``stereo_im_l_<t>.png`` /
  ``stereo_im_r_<t>.png`` with microsecond timestamps, starting at frame 200
  (stereo_groundtruth.cc:21-188, incl. cv::stereoRectify of raw pairs 56-94)
- ``DefSLAMGTCT``: a video plus per-frame depth maps stored as text files
  (simple_CT.cc:8-115, ``loadCT`` 97-115)

Host-side OpenCV is used for image IO / undistort-rectify exactly like the
reference (these never touch the device hot path).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Iterator

import numpy as np


def _imread_gray(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32)


def _timestamp_of(path: str) -> float:
    m = re.search(r"_(\d+)\.(png|jpg|tiff?)$", os.path.basename(path))
    return float(m.group(1)) / 1e6 if m else 0.0


def load_stereo_sequence(
    directory: str, start: int = 0
) -> Iterator[tuple[np.ndarray, np.ndarray, float]]:
    """Yield (left, right, timestamp) from a DefSLAMGT-layout directory.

    The reference starts at frame 200 of the Mandala sequences
    (stereo_groundtruth.cc:113); pass start=200 for parity.
    """
    lp, rp, ts = stereo_pair_paths(directory, start)
    for left, right, t in zip(lp, rp, ts):
        yield _imread_gray(left), _imread_gray(right), t


def stereo_pair_paths(directory: str, start: int = 0):
    """(left_paths, right_paths, timestamps) of a DefSLAMGT-layout
    directory — the path-level view used by the native prefetching
    FramePipeline (defslam_tpu.native)."""
    lefts = sorted(
        glob.glob(os.path.join(directory, "stereo_im_l_*.png")),
        key=_timestamp_of,
    )
    lp, rp, ts = [], [], []
    for left in lefts[start:]:
        right = left.replace("stereo_im_l_", "stereo_im_r_")
        if not os.path.exists(right):
            continue
        lp.append(left)
        rp.append(right)
        ts.append(_timestamp_of(left))
    return lp, rp, ts


def rectify_maps(cfg_yaml: dict, size: tuple[int, int] | None = None):
    """Stereo rectification maps from the reference's YAML calibration
    (stereo_groundtruth.cc:56-94).  Accepts the reference's native
    ``LEFT.K/D/R/P`` + ``RIGHT.*`` opencv-matrix keys (as parsed by
    config.load_raw_yaml) or flat ``Camera.K_l``-style lists; returns
    {"l": (map1, map2), "r": ...} for cv2.remap, or None when the file
    carries no stereo calibration (pre-rectified sequences)."""
    import cv2

    def mat(key_ref, key_flat, rows, cols):
        v = cfg_yaml.get(key_ref, cfg_yaml.get(key_flat))
        if v is None:
            return None
        return np.asarray(v, np.float64).reshape(rows, cols)

    maps = {}
    for ref_side, side in (("LEFT", "l"), ("RIGHT", "r")):
        K = mat(f"{ref_side}.K", f"Camera.K_{side}", 3, 3)
        R = mat(f"{ref_side}.R", f"Camera.R_{side}", 3, 3)
        P = mat(f"{ref_side}.P", f"Camera.P_{side}", 3, 4)
        if K is None or R is None or P is None:
            return None
        D = cfg_yaml.get(
            f"{ref_side}.D", cfg_yaml.get(f"Camera.D_{side}", [0, 0, 0, 0])
        )
        D = np.asarray(D, np.float64).reshape(-1)
        hw = size
        if hw is None:
            hw = (
                int(cfg_yaml.get(f"{ref_side}.width", 0)),
                int(cfg_yaml.get(f"{ref_side}.height", 0)),
            )
            if not all(hw):
                raise ValueError(
                    "rectify_maps needs size= or LEFT/RIGHT.width/height"
                )
        maps[side] = cv2.initUndistortRectifyMap(
            K, D, R, P[:3, :3], hw, cv2.CV_32FC1
        )
    return maps


def load_video(path_or_index) -> Iterator[tuple[np.ndarray, float]]:
    """Yield (gray frame, timestamp) from a video file or camera index
    (simple_camera.cc)."""
    import cv2

    cap = cv2.VideoCapture(path_or_index)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32)
        yield gray, i / fps
        i += 1
    cap.release()


def load_ct_sequence(
    video_path: str, depth_dir: str, pattern: str = "heartDepthMap_{}.txt"
) -> Iterator[tuple[np.ndarray, np.ndarray, float]]:
    """Yield (frame, depth_map, timestamp): video + per-frame depth text
    files (simple_CT.cc loadCT 97-115: whitespace-separated depth values)."""
    for i, (gray, t) in enumerate(load_video(video_path)):
        dp = os.path.join(depth_dir, pattern.format(i))
        if not os.path.exists(dp):
            continue
        depth = np.loadtxt(dp, dtype=np.float32)
        if depth.ndim == 1:
            depth = depth.reshape(gray.shape)
        yield gray, depth, t
