"""The shipped examples must keep running (subprocess, virtual mesh)."""

import os
import pathlib
import subprocess
import sys

EX = pathlib.Path(__file__).parent.parent / "examples"


def _run(script):
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, str(EX / script)],
                          capture_output=True, text=True, timeout=300,
                          env=env)


def test_sharded_deployment_example():
    p = _run("sharded_deployment.py")
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    assert "sharded deployment example OK" in p.stdout


def test_asic_datapath_example():
    p = _run("asic_datapath_sim.py")
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]


def test_wide_formats_example():
    p = _run("wide_formats_and_sharding.py")
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
