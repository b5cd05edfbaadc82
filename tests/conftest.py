"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Mirrors SURVEY.md §4.3 — multi-"device" behaviour (the parallel Riccati) is
validated by equivalence against the serial solver on CPU-simulated meshes;
the reference's accuracy gates (KKT residual ≤ 1e-9) require f64, which is
native on CPU and emulated on TPU (the TPU path runs f32 + refinement and
is benchmarked separately in bench.py).
"""

import os

# Must be set before jax initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU miscompilation workaround: this box's XLA:CPU build
# miscompiles solver programs at the default optimization level — two
# independent reproducers: (a) with fusion emitters ON, the merit
# directional derivative came out NaN in some compilations of the
# single-device solver (toggled by carry-buffer-size-only changes like
# record_history), stalling a trivial f64 LQR that a straight-line
# replication of the same math solves in 1 step; (b) with fusion
# emitters OFF, the SPMD-sharded batched solver stalled instead
# (dual 0.8 vs 3e-15). --xla_backend_optimization_level=0 fixes both.
# Correctness > CPU speed in CI; the TPU backend is separate and
# unaffected.
if "xla_backend_optimization_level" not in _flags:
    _flags = (_flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = _flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Some environment plugin may import jax before this conftest runs, so the
# env var alone is not enough — jax_platforms via config works as long as
# no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA-CPU compiles of the scan-heavy solver
# programs take O(10s) each; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
