"""Decompose DeviceMatcher trajectory init time: compile vs execute vs fetch.

Stages:
  init     DeviceMatcher(Xp) constructor wall time (panel_trajectory compile
           + dispatch)
  touch    tiny-output jit depending on every trajectory array (forces full
           execution; transfers ~bytes)
  slice    probe_r4-style block: np.asarray(v[..., :1]) per array (what the
           920 s measurement used)

Usage: python scripts/probe_traj.py [M] [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    from pbwt_tpu.ops import match_jax
    from bench import bench_match_data

    Xp, _ = bench_match_data(M, N, 1)

    t0 = time.perf_counter()
    matcher = match_jax.DeviceMatcher(Xp)
    t_init = time.perf_counter() - t0
    print(f"init_s={t_init:.1f}", flush=True)

    if matcher.traj is None:
        sys.exit(f"traj not built: panel exceeds the PBWT_TPU_TRAJ_BYTES "
                 f"budget ({match_jax._traj_bytes()} bytes) at M={M}, "
                 f"N={N} — raise the budget or probe a smaller panel")
    A_all, D8, DR, U8, C = matcher.traj

    @jax.jit
    def touch(A, D, R, U, c):
        return (A[0, 0] + D[0, 0, 0].astype(jnp.int32) + R[0, 0]
                + U[0, 0, 0].astype(jnp.int32) + c[0])

    t0 = time.perf_counter()
    v = np.asarray(touch(A_all, D8, DR, U8, C))
    print(f"touch_s={time.perf_counter() - t0:.1f} v={int(v)}", flush=True)

    t0 = time.perf_counter()
    for x in (A_all, D8, DR, U8, C):
        np.asarray(x[..., :1])
    print(f"slice_s={time.perf_counter() - t0:.1f}", flush=True)


if __name__ == "__main__":
    main()
