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
# XLA:CPU fusion-emitter miscompilation workaround: on this box the
# fusion emitters corrupt values inside the solver while-loop (observed
# jax 0.9: the merit directional derivative came out NaN in some
# compilations — toggled by carry-buffer-size-only changes like
# record_history — so the linesearch rejected perfect Newton steps and
# ProxDDP stalled on a trivial f64 LQR; ground-truth straight-line
# replication of the same math converges in 1 step). Disabling the
# fusion emitters restores correct numerics. TPU is a different backend
# and unaffected.
if "xla_cpu_use_fusion_emitters" not in _flags:
    _flags = (_flags + " --xla_cpu_use_fusion_emitters=false").strip()
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
