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
    # a process pinned to the host backend can answer without importing
    # jax at all — the import alone costs ~1.2 s of bytecode compilation,
    # which dominated host-only CLI pipelines that merely ASKED whether a
    # device was present
    if _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
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
    default.  For Mosaic-free programs use :func:`xla_cache_scope` instead,
    which is safe and on by default.
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


def xla_cache_scope():
    """Context manager: persistent compile cache, STRICTLY OPT-IN
    (set PBWT_TPU_XLA_CACHE to a directory to activate).

    Measured round 5 on the tunneled axon backend, the persistent cache is
    a dead end and must stay off by default:

    - compiling UNDER an active cache is catastrophically slow: the
      standing-panel query scan compiles in 67-86 s plain, and did not
      finish within 7-14 MINUTES (idle box, three runs) with the cache
      dir set — and the entry was never even written;
    - a cache-HIT executable containing a Mosaic (Pallas) custom call
      hangs its first result fetch (>240 s for a toy that round-trips
      uncached in ~1 s);
    - only tiny pure-XLA programs round-trip usefully (0.08 s hit).

    The scope form is kept so the experiment is repeatable on saner
    backends (real local TPU runtimes serialize executables fine): it
    activates the cache for the duration, then fully RESETS the cache
    singleton on exit (jax.config.update alone leaves the initialized
    cache active process-wide, which is how Pallas programs leaked into
    it when this was briefly default-on).
    """
    import contextlib

    path = _os.environ.get("PBWT_TPU_XLA_CACHE", "")

    @contextlib.contextmanager
    def scope():
        if not path:
            yield
            return
        import jax

        prev = jax.config.jax_compilation_cache_dir
        try:
            _os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              4.0)
            yield
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)
            try:
                from jax._src import compilation_cache

                compilation_cache.reset_cache()
            except Exception:
                pass

    return scope()
