"""Offline visualization exports.

The reference's Pangolin GL viewer (``Modules/Viewer/``: DefViewer window +
regularizer sliders, DefMapDrawer template now/at-rest/history, MeshDrawer)
is an interactive debug tool; the TPU build targets headless machines, so
visualization is offline: mesh snapshots as OBJ (template now / at rest),
trajectories in TUM format, and matplotlib renders — consumable from any
notebook (paralleling the reference's scripts/plotting.ipynb workflow).
"""

from __future__ import annotations

import os

import numpy as np

from defslam_tpu.template import mesh as meshmod


def export_mesh_obj(path: str, nodes, topo: meshmod.MeshTopology):
    """Write the template as a Wavefront OBJ (MeshDrawer equivalent)."""
    nodes = np.asarray(nodes)
    with open(path, "w") as f:
        for x, y, z in nodes:
            f.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
        for a, b, c in np.asarray(topo.faces):
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")


def export_trajectory_tum(path: str, trajectory, timestamps=None):
    """World->camera 4x4 poses -> TUM 'timestamp tx ty tz qx qy qz qw'."""
    from scipy.spatial.transform import Rotation

    with open(path, "w") as f:
        for i, item in enumerate(trajectory):
            if isinstance(item, tuple):  # System.trajectory: (ts, pose)
                ts, T = item
            else:
                ts = timestamps[i] if timestamps is not None else float(i)
                T = item
            T = np.asarray(T)
            # camera center in world = -R^T t
            R = T[:3, :3]
            t = T[:3, 3]
            c = -R.T @ t
            q = Rotation.from_matrix(R.T).as_quat()  # (x, y, z, w)
            f.write(
                f"{ts:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def snapshot(system, outdir: str, tag: str = ""):
    """Dump the current template (deformed + rest), trajectory and the
    per-keyframe template history (DefMapDrawer's 'template now / at rest /
    history' views, ``MeshDrawershist`` DefMapDrawer.h:81)."""
    os.makedirs(outdir, exist_ok=True)
    if system.template is not None:
        export_mesh_obj(
            os.path.join(outdir, f"template{tag}.obj"),
            system.template.nodes, system.topo,
        )
        export_mesh_obj(
            os.path.join(outdir, f"template_rest{tag}.obj"),
            system.template.nodes_rest, system.topo,
        )
    export_trajectory_tum(
        os.path.join(outdir, f"trajectory{tag}.txt"), system.trajectory
    )
    export_template_history(system, outdir)


def export_template_history(system, outdir: str):
    """One OBJ per recorded keyframe-time template state
    (``DefMapDrawer::MeshDrawershist`` parity: the reference keeps a mesh
    drawer per keyframe showing the template as it was at that keyframe)."""
    for frame_id, nodes in getattr(system, "template_history", []):
        export_mesh_obj(
            os.path.join(outdir, f"template_hist_{frame_id:06d}.obj"),
            nodes, system.topo,
        )


def render_png(system, path: str):
    """Matplotlib 3D render: template wireframe + map points + camera."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    if system.template is not None:
        nodes = np.asarray(system.template.nodes)
        for a, b in np.asarray(system.topo.edges):
            ax.plot(*zip(nodes[a], nodes[b]), "b-", lw=0.4)
    pts = np.asarray(system.points.xyz)
    valid = np.asarray(system.points.valid)
    ax.scatter(pts[valid, 0], pts[valid, 1], pts[valid, 2], s=1, c="r")
    ax.set_title(f"frame {system.frame_id} ({system.state.name})")
    fig.savefig(path, dpi=110)
    plt.close(fig)
