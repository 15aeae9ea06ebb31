"""ctypes bindings for the native runtime library (native/frame_pipeline.cc).

Native pieces of the host runtime (the compute path is JAX/XLA; these are the
IO/bookkeeping equivalents of the reference's C++ runtime):

- ``FramePipeline``: threaded decode+rectify+prefetch image loader (the
  reference's Apps/ loops do this inline on the tracking thread).
- ``covis_shared`` / ``accumulate_obs``: covisibility intersection and
  warp-observation scatter (SchwarpDatabase bookkeeping).

Everything degrades gracefully: if the shared library is missing (or the
auto-build fails), pure-numpy fallbacks are used — same results, slower.
Build with ``native/build.sh``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_lib", "libdefslam_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(os.path.dirname(__file__), "..", "native", "build.sh")
        try:
            subprocess.run([build], check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fp_create.restype = ctypes.c_void_p
    lib.fp_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.fp_set_rectify.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.fp_next.restype = ctypes.c_int64
    lib.fp_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.fp_destroy.argtypes = [ctypes.c_void_p]
    lib.covis_shared.restype = ctypes.c_int
    lib.accumulate_obs.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class FramePipeline:
    """Threaded prefetching image loader; iterate to get (index, frame)."""

    def __init__(
        self,
        paths: list[str],
        width: int,
        height: int,
        n_threads: int = 3,
        capacity: int = 8,
        rectify_maps: tuple[np.ndarray, np.ndarray] | None = None,
    ):
        lib = _load()
        self._lib = lib
        self.width, self.height = width, height
        self.paths = list(paths)
        if rectify_maps is not None:
            mx = np.ascontiguousarray(rectify_maps[0], np.float32)
            my = np.ascontiguousarray(rectify_maps[1], np.float32)
            assert mx.shape == (height, width)
            self._rect = (mx, my)
        else:
            self._rect = None
        if lib is None:
            self._handle = None  # python fallback (rectifies via cv2.remap)
            self._i = 0
            return
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        self._handle = lib.fp_create(arr, len(paths), width, height,
                                     n_threads, capacity)
        if self._rect is not None:
            mx, my = self._rect
            lib.fp_set_rectify(
                self._handle, mx.ctypes.data_as(ctypes.c_void_p),
                my.ctypes.data_as(ctypes.c_void_p),
            )

    def __iter__(self):
        buf = np.empty((self.height, self.width), np.float32)
        if self._handle is None:
            import cv2

            for i, p in enumerate(self.paths):
                img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
                if img is None:
                    yield i, np.zeros((self.height, self.width), np.float32)
                    continue
                img = img.astype(np.float32)
                if self._rect is not None:
                    img = cv2.remap(img, *self._rect, cv2.INTER_LINEAR)
                if img.shape != (self.height, self.width):
                    img = cv2.resize(img, (self.width, self.height))
                yield i, img
            return
        while True:
            idx = self._lib.fp_next(
                self._handle, buf.ctypes.data_as(ctypes.c_void_p)
            )
            if idx < 0:
                break
            yield int(idx), buf.copy()

    def close(self):
        if self._handle is not None:
            self._lib.fp_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def covis_shared(point_id_a: np.ndarray, point_id_b: np.ndarray, max_out: int):
    """Shared points between two kp->point tables.
    Returns (kp_a, kp_b, pid) int32 arrays (length = count)."""
    a = np.ascontiguousarray(point_id_a, np.int32)
    b = np.ascontiguousarray(point_id_b, np.int32)
    lib = _load()
    if lib is not None:
        k = len(a)
        kp_a = np.empty(max_out, np.int32)
        kp_b = np.empty(max_out, np.int32)
        pid = np.empty(max_out, np.int32)
        n = lib.covis_shared(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int(k),
            kp_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            kp_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int(max_out),
        )
        return kp_a[:n], kp_b[:n], pid[:n]
    # numpy fallback
    common, ia, ib = np.intersect1d(
        a[a >= 0], b[b >= 0], return_indices=True
    )
    kp_a = np.nonzero(a >= 0)[0][ia][:max_out]
    kp_b = np.nonzero(b >= 0)[0][ib][:max_out]
    return (
        kp_a.astype(np.int32),
        kp_b.astype(np.int32),
        common[: len(kp_a)].astype(np.int32),
    )


def accumulate_obs(
    pid: np.ndarray,  # (n_pairs, cap) int32
    mask: np.ndarray,  # (n_pairs, cap) bool
    uv1: np.ndarray,  # (n_pairs, cap, 2) f32
    warped: np.ndarray,
    J12: np.ndarray,  # (n_pairs, cap, 2, 2)
    Huu: np.ndarray,  # (n_pairs, cap, 2)
    Hvv: np.ndarray,
    n_points: int,
    obs_cap: int,
):
    """Scatter per-pair observations into per-point tables.
    Returns dict of arrays shaped (n_points, obs_cap, ...)."""
    n_pairs, cap = pid.shape
    out = dict(
        uv1=np.zeros((n_points, obs_cap, 2), np.float32),
        uv2=np.zeros((n_points, obs_cap, 2), np.float32),
        J12=np.tile(np.eye(2, dtype=np.float32), (n_points, obs_cap, 1, 1)),
        Huu=np.zeros((n_points, obs_cap, 2), np.float32),
        Hvv=np.zeros((n_points, obs_cap, 2), np.float32),
        mask=np.zeros((n_points, obs_cap), np.uint8),
    )
    counts = np.zeros(n_points, np.int32)
    lib = _load()
    c = np.ascontiguousarray
    if lib is not None:
        lib.accumulate_obs(
            ctypes.c_int(n_pairs), ctypes.c_int(cap), ctypes.c_int(obs_cap),
            c(pid, np.int32).ctypes.data_as(ctypes.c_void_p),
            c(mask, np.uint8).ctypes.data_as(ctypes.c_void_p),
            c(uv1, np.float32).ctypes.data_as(ctypes.c_void_p),
            c(warped, np.float32).ctypes.data_as(ctypes.c_void_p),
            c(J12, np.float32).ctypes.data_as(ctypes.c_void_p),
            c(Huu, np.float32).ctypes.data_as(ctypes.c_void_p),
            c(Hvv, np.float32).ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int(n_points),
            counts.ctypes.data_as(ctypes.c_void_p),
            out["uv1"].ctypes.data_as(ctypes.c_void_p),
            out["uv2"].ctypes.data_as(ctypes.c_void_p),
            out["J12"].ctypes.data_as(ctypes.c_void_p),
            out["Huu"].ctypes.data_as(ctypes.c_void_p),
            out["Hvv"].ctypes.data_as(ctypes.c_void_p),
            out["mask"].ctypes.data_as(ctypes.c_void_p),
        )
        out["mask"] = out["mask"].astype(bool)
        return out, counts
    for pi in range(n_pairs):
        for j in range(cap):
            if not mask[pi, j]:
                continue
            p = int(pid[pi, j])
            if p < 0 or p >= n_points:
                continue
            o = counts[p]
            if o >= obs_cap:
                continue
            out["uv1"][p, o] = uv1[pi, j]
            out["uv2"][p, o] = warped[pi, j]
            out["J12"][p, o] = J12[pi, j]
            out["Huu"][p, o] = Huu[pi, j]
            out["Hvv"][p, o] = Hvv[pi, j]
            out["mask"][p, o] = True
            counts[p] += 1
    out["mask"] = out["mask"].astype(bool)
    return out, counts
