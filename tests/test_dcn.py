"""2-process DCN execution test (VERDICT round-2 item 5).

Spawns two real OS processes, each with 2 virtual CPU devices, joined by
``jax.distributed.initialize`` on a localhost coordinator (Gloo
collectives).  This actually executes ``init_distributed``
(parallel/sharding.py) and runs the dp-streaming GEMM + K-sharded psum GEMM
+ K-sharded Qreduce across the process boundary, bit-exact vs the
single-process reference — the closest DCN rehearsal possible without a
multi-host pod.
"""

import pathlib
import socket
import subprocess
import sys

import pytest

WORKER = pathlib.Path(__file__).parent / "dcn_worker.py"
ROOT = str(pathlib.Path(__file__).parent.parent)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(420)
def test_two_process_dcn():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=ROOT)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=360)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("DCN workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "distributed" in out.lower() and \
                "not supported" in out.lower():
            pytest.skip(f"multi-process CPU runtime unsupported: {out[-400:]}")
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"DCN_WORKER_OK {pid}" in out
