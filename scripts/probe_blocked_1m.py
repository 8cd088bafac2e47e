"""On-chip repro for the round-3 M=1M crash: one partition_ad_step_blocked
at R=8192 (Mp=1,048,576), checked against the host partition.

Runs the risky device step in THIS process (the caller should wrap it in a
subprocess / timeout: a Mosaic fault can kill the TPU worker).  Prints one
JSON line per phase so a crash is attributable.

Usage: python scripts/probe_blocked_1m.py [R] [rb]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def emit(**kw):
    print(json.dumps(kw), flush=True)


def host_partition(a, d, w, s, kk):
    """Numpy mirror of the lax.sort fallback in ops/match_jax (stable
    partition by bit s of w; d payload = inclusive segmented running max
    seeded with max(d[0], kk+1), reset after each same-key emission)."""
    key = (w >> s) & 1
    mask0 = key == 0
    order = np.argsort(~mask0, kind="stable")
    a2, w2 = a[order], w[order]
    seed = d.astype(np.int64).copy()
    seed[0] = max(seed[0], kk + 1)
    d0, d1 = [], []
    run0 = run1 = 0
    for i in range(len(a)):
        run0 = max(run0, seed[i])
        run1 = max(run1, seed[i])
        if mask0[i]:
            d0.append(run0)
            run0 = 0
        else:
            d1.append(run1)
            run1 = 0
    d2 = np.array(d0 + d1, dtype=np.int32)
    d2[0] = kk + 2
    c = int(mask0.sum())
    u = np.cumsum(mask0) - mask0  # exclusive zero ranks
    return a2, d2, w2, u.astype(np.int32), c


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rb = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    from pbwt_tpu.ops import partition_pallas as pp

    Mp = R * 128
    rng = np.random.RandomState(0)
    a = rng.permutation(Mp).astype(np.int32)
    d = rng.randint(0, 100, Mp).astype(np.int32)
    d[0] = 1
    w = rng.randint(-(1 << 31), 1 << 31, Mp, dtype=np.int64).astype(np.int32)
    s, kk = 3, 100

    emit(phase="setup", R=R, rb=rb, Mp=Mp)
    aR = jnp.asarray(a.reshape(R, 128))
    dR = jnp.asarray(d.reshape(R, 128))
    wR = jnp.asarray(w.reshape(R, 128))
    t0 = time.perf_counter()
    out = pp.partition_ad_step_blocked(aR, dR, wR, s, kk, rb=rb)
    a2, d2, w2, u2, cnt = (np.asarray(x) for x in out)
    emit(phase="ran", s=round(time.perf_counter() - t0, 1), c=int(cnt[0]))

    ha, hd, hw, hu, hc = host_partition(a, d, w, s, kk)
    ok = (np.array_equal(a2.reshape(-1), ha)
          and np.array_equal(w2.reshape(-1), hw)
          and np.array_equal(u2.reshape(-1), hu)
          and np.array_equal(d2.reshape(-1), hd)
          and int(cnt[0]) == hc)
    emit(phase="parity", ok=bool(ok))
    if not ok:
        for name, dev, host in (("a", a2.reshape(-1), ha),
                                ("d", d2.reshape(-1), hd),
                                ("w", w2.reshape(-1), hw),
                                ("u", u2.reshape(-1), hu)):
            bad = np.nonzero(dev != host)[0]
            emit(phase="diff", plane=name, nbad=int(bad.size),
                 first=int(bad[0]) if bad.size else -1)


if __name__ == "__main__":
    main()
