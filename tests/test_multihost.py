"""Multi-host (N≥2 processes) path — SURVEY §5.8, VERDICT r2 item 5.

Launches two real OS processes, each with 4 CPU devices, connected by
jax.distributed (Gloo over localhost — the DCN-boundary analogue). Each
worker solves its shard of a global scenario batch over the 2×4-device
mesh and asserts equality with locally-computed single-device solves.
This validates the exact code path (`aligator_tpu.distributed`) a v5p
multi-host deployment uses: jax.distributed.initialize → global mesh →
make_array_from_process_local_data → sharded jit."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.filterwarnings("ignore")

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_batched_solve():
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_WORKER))
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
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
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"[worker {pid}] PASS" in out, out[-3000:]
