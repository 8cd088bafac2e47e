"""TPU device engine (Pallas kernels + grouped XLA scans)."""

import os as _os

_cache_enabled = False


def enable_compilation_cache() -> None:
    """Persist compiled TPU executables across processes.

    STRICTLY OPT-IN: activates only when PBWT_TPU_JAX_CACHE is set to an
    explicit directory.  On tunneled backends (axon) the persistent cache
    verifiably hangs result fetches (>8 min inside jax.Array.__array__ for a
    toy kernel that runs in 31 ms without it), so it must never be on by
    default.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    path = _os.environ.get("PBWT_TPU_JAX_CACHE")
    if not path:
        return
    _cache_enabled = True
    try:
        import jax

        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
