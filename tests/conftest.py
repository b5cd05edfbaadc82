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
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
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
