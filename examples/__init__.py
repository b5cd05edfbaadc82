"""Runnable OCP examples (the reference's examples/ tier)."""


def force_cpu_f64() -> None:
    """Examples are correctness demos: run them on CPU in float64 (the
    TPU f32 path is exercised by bench.py). This environment
    pre-initializes the tunneled TPU backend at interpreter startup, so
    ``JAX_PLATFORMS=cpu`` in the environment can be ignored — the config
    must be set in-process, before the first computation."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized; keep whatever it is
    jax.config.update("jax_enable_x64", True)
