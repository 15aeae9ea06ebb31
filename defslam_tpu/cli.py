"""Command-line apps — parity with the reference executables
(``CMakeLists.txt:103-113``: DefSLAM, DefSLAMGT, DefSLAMGTCT).

    python -m defslam_tpu.cli mono   <yaml> <video|camera-index>
    python -m defslam_tpu.cli stereo <yaml> <sequence-dir> [--start 200]
    python -m defslam_tpu.cli ct     <yaml> <video> <depth-dir>
    python -m defslam_tpu.cli synth  [--frames N]          (built-in demo)

No vocabulary file argument: relocalization uses the descriptor index
directly instead of a pre-trained DBoW2 text vocabulary.
"""

from __future__ import annotations

import argparse
import sys
import time


def _enable_compile_cache():
    """Persistent XLA compile cache for the CLI apps: without it every
    process pays the full kernel-compilation cost again (tens of seconds
    for the fused keyframe chain).  bench.py already does this; deployment
    entry points must too.  Override the location with DEFSLAM_CACHE_DIR;
    set it to the empty string to disable."""
    import os

    d = os.environ.get("DEFSLAM_CACHE_DIR")
    if d == "":
        return
    if d is None:
        repo_cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        d = repo_cache if os.path.isdir(repo_cache) else os.path.join(
            os.path.expanduser("~"), ".cache", "defslam_tpu", "jax"
        )
    os.makedirs(d, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(argv=None):
    _enable_compile_cache()
    p = argparse.ArgumentParser(prog="defslam_tpu")
    # debug-workflow affordances shared by every mode — the headless
    # equivalents of the reference viewer's live regularizer sliders and
    # step-"Next" gating (DefViewer.cc:53-120, System.cc:328-333)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument(
        "--step", action="store_true",
        help="single-step mode: wait for Enter after every frame "
             "(the viewer's sequential 'Next' gating)",
    )
    common.add_argument(
        "--tune", metavar="FILE", default=None,
        help="poll FILE (YAML: reference keys like Regularizer.laplacian "
             "or dotted config paths) every frame and apply changed "
             "parameters live (the viewer's regularizer sliders; each "
             "change recompiles the affected kernels once)",
    )
    sub = p.add_subparsers(dest="mode", required=True)

    mono = sub.add_parser("mono", parents=[common],
                          help="monocular video/camera (DefSLAM app)")
    mono.add_argument("yaml")
    mono.add_argument("source")
    mono.add_argument(
        "--orbslam", action="store_true",
        help="rigid ORB-SLAM2 comparison mode on the same input plumbing "
             "(the reference's compile-time '#define ORBSLAM', set_MAC.h:24)",
    )

    st = sub.add_parser("stereo", parents=[common],
                        help="stereo GT sequence (DefSLAMGT app)")
    st.add_argument("yaml")
    st.add_argument("directory")
    st.add_argument("--start", type=int, default=200)
    st.add_argument("--baseline", type=float, default=0.1)

    ct = sub.add_parser("ct", parents=[common],
                        help="video + depth-map GT (DefSLAMGTCT app)")
    ct.add_argument("yaml")
    ct.add_argument("video")
    ct.add_argument("depth_dir")

    sy = sub.add_parser("synth", parents=[common],
                        help="synthetic demo sequence")
    sy.add_argument("--frames", type=int, default=30)
    sy.add_argument("--out", default="./out")
    sy.add_argument(
        "--gt", action="store_true",
        help="per-frame CT-GT depth evaluation (writes ErrorGTs0.txt). "
             "Evaluation reads validated state, so each frame drains the "
             "pipeline — the DefSLAMGT app behavior; without it the loop "
             "runs fully pipelined like the deployment app "
             "(simple_camera.cc:4-55)",
    )

    args = p.parse_args(argv)

    from defslam_tpu.config import Config
    from defslam_tpu.system import System

    t_start = time.perf_counter()
    if args.mode == "synth":
        from defslam_tpu.io.synthetic import make_sequence

        seq = make_sequence(n_frames=args.frames, height=240, width=320)
        cfg = Config(camera=seq.camera, output_dir=args.out, save_results=True)
        sys_ = System(cfg)
        for t in range(args.frames):
            if args.gt:
                sys_.track_monocular_ct(seq.frames[t], seq.depths[t], float(t))
            else:
                sys_.track_monocular(seq.frames[t], float(t))
            _progress(sys_, args)
    else:
        cfg = Config.from_yaml(args.yaml)
        if args.mode == "mono" and args.orbslam:
            # A/B baseline: stock rigid ORB-SLAM2 pipeline on the same
            # input plumbing (tracking -> triangulation -> local BA ->
            # culling -> loop closing), rigid/system.py
            import os

            from defslam_tpu.io.datasets import load_video
            from defslam_tpu.rigid.system import RigidSystem

            rsys = RigidSystem(cfg)
            src = int(args.source) if args.source.isdigit() else args.source
            n = 0
            for img, ts in load_video(src):
                rsys.track_monocular(img, ts)
                n += 1
                print(f"\rframe {n - 1:5d} [{rsys.state.name:>15s}]",
                      end="", flush=True)
            os.makedirs(cfg.output_dir, exist_ok=True)
            rsys.write_trajectory(
                os.path.join(cfg.output_dir, "Trajectory.txt")
            )
            dt = time.perf_counter() - t_start
            print(f"\nprocessed {n} frames in {dt:.1f}s ({n / max(dt, 1e-9):.2f} fps); "
                  f"results in {cfg.output_dir}")
            return 0
        sys_ = System(cfg)
        if args.mode == "mono":
            from defslam_tpu.io.datasets import load_video

            src = int(args.source) if args.source.isdigit() else args.source
            for img, ts in load_video(src):
                sys_.track_monocular(img, ts)
                _progress(sys_, args)
        elif args.mode == "stereo":
            from defslam_tpu import native
            from defslam_tpu.config import load_raw_yaml
            from defslam_tpu.io.datasets import (rectify_maps,
                                                 stereo_pair_paths)

            # raw pairs are rectified when the YAML carries LEFT./RIGHT.
            # stereo calibration (stereo_groundtruth.cc:56-94); otherwise
            # the sequence is assumed pre-rectified.  Decode+rectify run in
            # the native prefetcher's threads (native/frame_pipeline.cc),
            # never on the tracking thread — FramePipeline falls back to
            # in-thread OpenCV when the shared library is unavailable.
            maps = rectify_maps(
                load_raw_yaml(args.yaml),
                (cfg.camera.width, cfg.camera.height),
            )
            lp, rp, ts = stereo_pair_paths(args.directory, start=args.start)
            w, h = cfg.camera.width, cfg.camera.height
            pipe_l = native.FramePipeline(
                lp, w, h, rectify_maps=maps["l"] if maps else None
            )
            pipe_r = native.FramePipeline(
                rp, w, h, rectify_maps=maps["r"] if maps else None
            )
            for (i, left), (_, right) in zip(pipe_l, pipe_r):
                sys_.track_monocular_gt(
                    left, right, ts[i], baseline=args.baseline
                )
                _progress(sys_, args)
            pipe_l.close()
            pipe_r.close()
        elif args.mode == "ct":
            from defslam_tpu.io.datasets import load_ct_sequence

            for img, depth, ts in load_ct_sequence(args.video, args.depth_dir):
                sys_.track_monocular_ct(img, depth, ts)
                _progress(sys_, args)

    sys_.write_metrics()
    from defslam_tpu import profiling

    profiling.print_report()  # no-op unless DEFSLAM_PROFILE=1
    from defslam_tpu.viewer import export

    export.snapshot(sys_, sys_.cfg.output_dir)
    n = len(sys_._metrics)
    dt = time.perf_counter() - t_start
    print(f"\nprocessed {n} frames in {dt:.1f}s ({n / dt:.2f} fps); "
          f"results in {sys_.cfg.output_dir}")
    return 0


def _progress(sys_, args=None, every: int = 30):
    # Do NOT drain the pipeline every frame: a per-frame flush() serializes
    # the app at keyframes and forfeits the depth-2 overlap (the bench's
    # throughput).  Print the optimistic metrics row in between (match
    # counts are -1 sentinels until the deferred readback validates the
    # frame) and flush only periodically — or always in the interactive
    # --tune/--step workflows, which want exact validated state.
    interactive = args is not None and (
        getattr(args, "step", False) or getattr(args, "tune", None)
    )
    m = sys_._metrics[-1] if sys_._metrics else None
    if interactive or m is None or m["frame"] % every == 0:
        sys_.flush()
        m = sys_._metrics[-1]
    mt = f"{m['matches']:4d}" if m["matches"] >= 0 else "   ?"
    il = f"{m['inliers']:4d}" if m["inliers"] >= 0 else "   ?"
    print(
        f"\rframe {m['frame']:5d} [{m['state']:>15s}] "
        f"matches {mt} inliers {il}"
        + (" KF" if m["keyframe"] else "   ")
        + (" TEMPLATE" if m["template"] else ""),
        end="",
        flush=True,
    )
    if args is not None:
        _debug_hooks(sys_, args)


class _TuneWatcher:
    """Polls a parameter file and applies changed values to the running
    System (the DefViewer slider workflow, DefViewer.cc:53-120)."""

    def __init__(self, path: str):
        self.path = path
        self.mtime = 0.0
        self.last: dict = {}

    def poll(self, sys_):
        import os

        try:
            m = os.stat(self.path).st_mtime
        except OSError:
            return
        if m == self.mtime:
            return
        self.mtime = m
        from defslam_tpu.config import load_raw_yaml

        try:
            raw = load_raw_yaml(self.path)
        except Exception as e:  # keep tracking; report the bad file
            print(f"\n[tune] parse error in {self.path}: {e}")
            return
        # np.array_equal-safe diff: load_raw_yaml returns numpy arrays for
        # !!opencv-matrix nodes, whose `!=` is elementwise and would raise
        # "truth value of an array is ambiguous" in a bare comparison
        import numpy as _np

        def _differs(a, b):
            if isinstance(a, _np.ndarray) or isinstance(b, _np.ndarray):
                return not _np.array_equal(a, b)
            return a != b

        changed = {
            k: v for k, v in raw.items() if _differs(self.last.get(k), v)
        }
        self.last = raw
        if not changed:
            return
        try:
            sys_.apply_tuning(changed)
            print(f"\n[tune] applied {changed}")
        except KeyError as e:
            print(f"\n[tune] {e}")


def _debug_hooks(sys_, args):
    if getattr(args, "tune", None):
        w = getattr(args, "_tune_watcher", None)
        if w is None:
            w = _TuneWatcher(args.tune)
            args._tune_watcher = w
        w.poll(sys_)
    if getattr(args, "step", False):
        input("\n[step] Enter for next frame... ")


if __name__ == "__main__":
    sys.exit(main())
