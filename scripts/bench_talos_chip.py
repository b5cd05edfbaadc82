"""Run the talos chip benches standalone (cold-solve + warm MPC cycle),
printing the same dicts bench.py embeds in details — for iterating on
the dual-tolerance and warm-start work (VERDICT r4 items 2 & 4) without
paying for the full bench sweep. Run: python scripts/bench_talos_chip.py
"""

import json
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402  (sets the compilation cache)

if __name__ == "__main__":
    which = sys.argv[1:] or ["walk", "mpc"]
    out = {}
    if "walk" in which:
        try:
            out.update(bench.bench_talos_walk())
        except Exception as e:
            out["talos_walk"] = f"failed: {type(e).__name__}: {str(e)[:200]}"
    if "mpc" in which:
        try:
            out.update(bench.bench_talos_mpc_cycle())
        except Exception as e:
            out["talos_mpc"] = f"failed: {type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(out, indent=1))
