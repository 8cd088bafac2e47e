"""TPU device engine (Pallas kernels + grouped XLA scans)."""

import os as _os

_cache_enabled = False


def enable_compilation_cache() -> None:
    """Persist compiled TPU executables across processes so CLI invocations
    of the device paths don't recompile (~20-90 s) every run."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    try:
        import jax

        path = _os.environ.get(
            "PBWT_TPU_JAX_CACHE",
            _os.path.expanduser("~/.cache/pbwt-tpu-jax"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
