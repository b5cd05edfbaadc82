"""Runnable OCP examples (the reference's examples/ tier)."""

import os


def _cpu_fusion_workaround() -> None:
    """XLA:CPU miscompilation workaround (see tests/conftest.py for the
    full story): the default optimization level corrupts in-loop solver
    values on this CPU stack (two independent reproducers, one with
    fusion emitters on, one with them off); optimization level 0 fixes
    both. Must be set before the backend initializes; a no-op for the
    TPU backend."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_backend_optimization_level" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_backend_optimization_level=0"
        ).strip()


def force_cpu_f64() -> None:
    """Examples are correctness demos: run them on CPU in float64 (the
    TPU f32 path is exercised by bench.py). This environment
    pre-initializes the tunneled TPU backend at interpreter startup, so
    ``JAX_PLATFORMS=cpu`` in the environment can be ignored — the config
    must be set in-process, before the first computation."""
    import jax

    _cpu_fusion_workaround()
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized; keep whatever it is
    jax.config.update("jax_enable_x64", True)
