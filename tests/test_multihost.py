"""Multi-host distributed BA: a REAL 2-process jax.distributed run (Gloo
collectives over localhost, 4 virtual devices per process) solving the
KITTI-scale sharded problem — SURVEY §2.4's multi-host north star,
exercised end-to-end rather than only on a single-process mesh."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import runpy
runpy.run_module("orbslam2_tpu.parallel.multihost", run_name="__main__")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ba():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["SLAM_NUM_PROCESSES"] = "2"
    env["SLAM_COORDINATOR"] = f"127.0.0.1:{port}"
    procs = []
    for pid in (0, 1):
        e = dict(env, SLAM_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=e, cwd=os.getcwd(),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
    # process 0 prints the verified global result
    assert "BA over 8 devices / 2 processes" in outs[0], outs[0][-2000:]
    assert "inliers=" in outs[0]
