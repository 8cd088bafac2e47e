"""TPU device engine (Pallas kernels + grouped XLA scans)."""

import os as _os

_cache_enabled = False


def device_requested(exact: bool = True) -> bool:
    """Should algorithms route through the device engine?

    The device engine is the default on a TPU backend (this is a TPU-native
    framework); ``PBWT_TPU_DEVICE=0`` (or empty) is the escape hatch back to
    the host/C paths and any other value forces the request — e.g. to
    exercise the portable device code path on CPU in tests.

    Paths whose device outputs are only f32-close rather than byte-identical
    to the host (painting's printed matrices, the copy-model likelihood) pass
    ``exact=False``: they stay host-default everywhere and route to the
    device only on an explicit ``PBWT_TPU_DEVICE=1``, keeping the reference
    bit-parity contract intact by default.
    """
    v = _os.environ.get("PBWT_TPU_DEVICE")
    if v is not None:
        return v not in ("", "0")
    if not exact:
        return False
    return _tpu_backend_alive()


_backend_probe: "bool | None" = None


def _tpu_backend_alive() -> bool:
    """True iff the default jax backend is a responsive TPU.

    Backend creation on a tunneled TPU can hang *inside client creation*
    (unkillable from the calling thread) when the tunnel is down, so the
    first probe runs on a daemon thread with a deadline
    (PBWT_TPU_PROBE_TIMEOUT seconds, default 45): on timeout the process
    falls back to the host engine for its lifetime instead of hanging.
    """
    global _backend_probe
    if _backend_probe is None:
        import threading

        got: list = []

        def probe():
            try:
                import jax

                got.append(jax.default_backend() == "tpu")
            except Exception:
                got.append(False)

        t = threading.Thread(target=probe, daemon=True,
                             name="pbwt-tpu-backend-probe")
        t.start()
        t.join(float(_os.environ.get("PBWT_TPU_PROBE_TIMEOUT", "45")))
        if not got:
            import sys

            print("pbwt: TPU backend unresponsive (tunnel down?); "
                  "using the host engine for this process",
                  file=sys.stderr, flush=True)
        _backend_probe = bool(got and got[0])
    return _backend_probe


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
