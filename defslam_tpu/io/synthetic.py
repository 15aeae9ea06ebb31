"""Synthetic deforming-surface sequence generator (host-side numpy).

The reference validates end-to-end on recorded datasets (Mandala, Hamlyn —
README.md section 5) which are not redistributable; this module provides a
procedurally generated stand-in with exact ground truth for tests and
benchmarks: a textured surface z = 1 + a(t) * sin(2x) cos(y) imaged by a
pinhole camera, with per-frame GT depth maps (the CT-style ground truth of
``Apps/simple_CT.cc``) and GT camera poses.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from defslam_tpu.config import CameraConfig


@dataclass
class SyntheticSequence:
    frames: np.ndarray  # (T, H, W) float32 grayscale
    depths: np.ndarray  # (T, H, W) float32 GT depth per pixel
    poses: np.ndarray  # (T, 4, 4) world->camera GT
    amps: np.ndarray  # (T,) deformation amplitude
    camera: CameraConfig
    frames_right: np.ndarray | None = None  # (T, H, W) rectified right view


def _texture(h: int, w: int, seed: int) -> np.ndarray:
    """Multi-scale random texture: corner-rich but locally distinctive, so
    BRIEF descriptors stay matchable under the deformation's resampling
    (pure white noise decorrelates immediately)."""
    import cv2

    rng = np.random.default_rng(seed)
    t = np.zeros((h, w), np.float32)
    for sigma, amp in ((12.0, 1.0), (5.0, 0.8), (2.0, 0.5)):
        layer = rng.uniform(-1, 1, (h, w)).astype(np.float32)
        layer = cv2.GaussianBlur(layer, (0, 0), sigma)
        t += amp * layer / (np.abs(layer).max() + 1e-9)
    t -= t.min()
    return (t / t.max() * 255.0).astype(np.float32)


def surface_depth(u, v, amp):
    """Depth gamma(u, v) of the surface z = 1 + amp*sin(2x)cos(y) along the
    retina ray [u, v, 1] (fixed-point solve)."""
    g = np.ones_like(u)
    for _ in range(40):
        g = 1.0 + amp * np.sin(2.0 * g * u) * np.cos(g * v)
    return g


def make_sequence(
    n_frames: int = 30,
    height: int = 120,
    width: int = 160,
    max_amp: float = 0.10,
    seed: int = 0,
    fov_scale: float = 1.0,
    camera_motion: float = 0.0,
    baseline: float = 0.0,
    occlusion: tuple[int, int] | None = None,
) -> SyntheticSequence:
    """Render a deforming textured surface.

    camera_motion > 0 adds a lateral camera translation of that total length
    (world units) over the sequence, exposing new surface area — the trigger
    for the reference's needNewTemplate/re-templating path
    (DefLocalMapping.cc:355-404).

    baseline > 0 additionally renders a rectified right view from a camera
    displaced by that distance along +x (the DefSLAMGT stereo-pair layout,
    Apps/stereo_groundtruth.cc).

    occlusion = (first, last) blanks frames [first, last] to near-uniform
    gray (a surgical-tool sweep / full occlusion): tracking must go LOST
    and recover by relocalization when the scene reappears.
    """
    cam = CameraConfig(
        fx=200.0 * fov_scale * width / 160.0,
        fy=200.0 * fov_scale * width / 160.0,
        cx=width / 2.0,
        cy=height / 2.0,
        width=width,
        height=height,
    )
    tex_h, tex_w = 1024, 1024
    tex = _texture(tex_h, tex_w, seed)
    # texture coords: surface (x, y) in [-L, L] -> texels
    L = 1.2 if camera_motion > 0 else 0.6

    px, py = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    u = (px - cam.cx) / cam.fx
    v = (py - cam.cy) / cam.fy

    frames = np.zeros((n_frames, height, width), np.float32)
    frames_r = np.zeros_like(frames) if baseline > 0 else None
    depths = np.zeros_like(frames)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    amps = max_amp * np.sin(np.arange(n_frames) / 6.0)

    def render(cx_w, a):
        # ray: world point = (cx_w, 0, 0) + lam * (u, v, 1); intersect the
        # surface z = 1 + a sin(2x) cos(y) by fixed point on lam
        lam = np.ones_like(u)
        for _ in range(40):
            x = cx_w + lam * u
            y = lam * v
            lam = 1.0 + a * np.sin(2.0 * x) * np.cos(y)
        x, y = cx_w + lam * u, lam * v
        tx = np.clip((x + L) / (2 * L) * (tex_w - 1), 0, tex_w - 1.001)
        ty = np.clip((y + L) / (2 * L) * (tex_h - 1), 0, tex_h - 1.001)
        ix, iy = tx.astype(np.int64), ty.astype(np.int64)
        fx_, fy_ = tx - ix, ty - iy
        img = (
            tex[iy, ix] * (1 - fx_) * (1 - fy_)
            + tex[iy, ix + 1] * fx_ * (1 - fy_)
            + tex[iy + 1, ix] * (1 - fx_) * fy_
            + tex[iy + 1, ix + 1] * fx_ * fy_
        )
        return img, lam

    for t in range(n_frames):
        # camera center moves along +x in world; pure translation
        cx_w = camera_motion * t / max(n_frames - 1, 1)
        frames[t], depths[t] = render(cx_w, amps[t])
        if frames_r is not None:
            frames_r[t], _ = render(cx_w + baseline, amps[t])
        poses[t, 0, 3] = -cx_w  # world->camera: x' = x - cx_w
        if occlusion is not None and occlusion[0] <= t <= occlusion[1]:
            frames[t] = 128.0  # featureless: FAST finds nothing
            if frames_r is not None:
                frames_r[t] = 128.0
    return SyntheticSequence(
        frames=frames, depths=depths, poses=poses, amps=amps, camera=cam,
        frames_right=frames_r,
    )
