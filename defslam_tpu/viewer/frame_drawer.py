"""Annotated frame export — the offline equivalent of the reference's
``DefFrameDrawer`` (``Modules/Viewer/DefFrameDrawer.{h,cc}``: keypoint /
match overlays on the current frame) and the mesh projection the Pangolin
viewer draws (``DefMapDrawer``).

The reference renders live into a Pangolin window; a headless TPU host has
no display, so the same annotated view is written as a PNG per frame
(matplotlib Agg).  Colors follow the reference's convention: tracked map
points green, unmatched keypoints blue; the template mesh is projected with
the current pose and drawn as a wireframe."""

from __future__ import annotations

import os

import numpy as np


def draw_frame(
    img: np.ndarray,  # (H, W) grayscale
    kp_xy: np.ndarray,  # (K, 2) keypoint pixels
    kp_valid: np.ndarray,  # (K,) bool
    matched_kp: np.ndarray,  # (K,) bool — keypoint matched to a map point
    mesh_uv: np.ndarray | None,  # (M, 2) projected template nodes
    mesh_edges: np.ndarray | None,  # (E, 2) node index pairs
    state: str,
    path: str,
):
    """Render one annotated frame to `path` (PNG)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    h, w = img.shape[:2]
    fig, ax = plt.subplots(figsize=(w / 80, h / 80), dpi=80)
    ax.imshow(img, cmap="gray", vmin=0, vmax=255)
    v = np.asarray(kp_valid, bool)
    m = np.asarray(matched_kp, bool) & v
    u = v & ~m
    xy = np.asarray(kp_xy)
    ax.scatter(xy[u, 0], xy[u, 1], s=6, c="#3b6fd4", marker="o",
               linewidths=0, label=f"keypoints ({int(u.sum())})")
    ax.scatter(xy[m, 0], xy[m, 1], s=8, c="#27a327", marker="o",
               linewidths=0, label=f"tracked ({int(m.sum())})")
    if mesh_uv is not None and mesh_edges is not None:
        uv = np.asarray(mesh_uv)
        for a, b in np.asarray(mesh_edges):
            ax.plot([uv[a, 0], uv[b, 0]], [uv[a, 1], uv[b, 1]],
                    c="#d43b3b", lw=0.5, alpha=0.6)
    ax.text(6, 14, state, color="yellow", fontsize=10, weight="bold")
    ax.set_xlim(0, w)
    ax.set_ylim(h, 0)
    ax.axis("off")
    ax.legend(loc="lower right", fontsize=7, framealpha=0.6)
    fig.tight_layout(pad=0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def save_annotated(system, img, feats, matches, frame_id: int,
                   outdir: str | None = None):
    """Export the current tracked frame like DefFrameDrawer::Update: pulls
    the device arrays once (host path — only used when
    ``viewer.save_frames`` is on, never in the hot loop)."""
    import jax
    import jax.numpy as jnp

    from defslam_tpu.geometry import camera as cam
    from defslam_tpu.geometry import se3
    from defslam_tpu.template import mesh as meshmod

    outdir = outdir or os.path.join(system.cfg.output_dir, "frames")
    k_cap = feats.capacity
    kp_of_point = np.asarray(matches.kp_of_point)
    matched_kp = np.zeros(k_cap, bool)
    ok = kp_of_point >= 0
    matched_kp[np.clip(kp_of_point[ok], 0, k_cap - 1)] = True
    mesh_uv = mesh_edges = None
    if system.template is not None:
        pc = se3.transform(system.pose, system.template.nodes)
        mesh_uv = np.asarray(cam.project(system.K, pc))
        topo = meshmod.grid_topology(
            system.cfg.mesh.nodes_u, system.cfg.mesh.nodes_v
        )
        mesh_edges = topo.edges
    draw_frame(
        np.asarray(img), np.asarray(feats.xy), np.asarray(feats.valid),
        matched_kp, mesh_uv, mesh_edges, system.state.name,
        os.path.join(outdir, f"frame_{frame_id:06d}.png"),
    )
