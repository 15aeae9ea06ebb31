"""Multi-host smoke test: two OS processes, jax.distributed over localhost.

Exercises the DCN/coordinator path of SURVEY 5.8 that the virtual
single-process mesh cannot: ``parallel.init_distributed`` connects two
processes (4 virtual CPU devices each) through a coordinator socket, and the
observation-sharded SfT solve psums its normal-equation blocks ACROSS the
process boundary.  Both processes must agree with each other and with the
single-process solve.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)


def _free_port() -> int | None:
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        return port
    except OSError:
        return None


@pytest.mark.multihost
def test_two_process_sharded_sft(tmp_path):
    port = _free_port()
    if port is None:
        pytest.skip("localhost sockets unavailable")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "multihost_worker.py"),
             str(pid), str(port), str(tmp_path)],
            env=env, cwd=_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    r0 = np.load(tmp_path / "proc0.npz")
    r1 = np.load(tmp_path / "proc1.npz")
    # both processes computed the identical replicated solution
    np.testing.assert_array_equal(r0["T"], r1["T"])
    np.testing.assert_array_equal(r0["nodes"], r1["nodes"])

    # and it matches the single-process solve (psum order is the only
    # numerical difference)
    sys.path.insert(0, _ROOT)
    from __graft_entry__ import _toy_sft_data
    from defslam_tpu.config import Config, SfTConfig
    from defslam_tpu.template import mesh as meshmod
    from defslam_tpu.tracking import sft

    cfg = Config(sft=SfTConfig(lm_iterations=5))
    data = _toy_sft_data(n_obs=64)
    topo = meshmod.grid_topology(cfg.mesh.nodes_u, cfg.mesh.nodes_v)
    ref = sft.solve(data, topo, cfg)
    np.testing.assert_allclose(r0["T"], np.asarray(ref.T), atol=1e-4)
    np.testing.assert_allclose(r0["nodes"], np.asarray(ref.nodes), atol=5e-4)
