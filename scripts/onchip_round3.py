"""Round-3 on-chip gate: the measurements that need the real TPU.

Stages (each emits one JSON line per result, flushed immediately, so a
tunnel death mid-run keeps everything already measured):

  qscale   DeviceMatcher q/s at Q in {256, 1024, 4096} against a standing
           M=100k, N=2048 panel (the exact bench.py / reference-baseline
           workload), with vs-reference ratios from REF_MATCH_QPS
           (scripts/match_ref_baseline.py measurements).
  m1m      matchDynamic at M=1,000,000, Q=256 through the blocked
           divergence kernel (ops/partition_pallas.partition_ad_step_blocked)
           with exact-row parity against the pack3-native C sweep
           (reference target: 5 s, README.md "probably a million").

Usage: python scripts/onchip_round3.py [qscale] [m1m]   (default: both)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def emit(**obj):
    print(json.dumps(obj), flush=True)


def canon(rows):
    rows = np.asarray(rows, np.int64)
    return rows[np.lexsort((rows[:, 3], rows[:, 2], rows[:, 1], rows[:, 0]))]


def stage_qscale(M=100_000, N=2048, Qs=(256, 1024, 4096)):
    from pbwt_tpu.ops import match_jax
    import bench as bench_mod
    from bench import bench_match_data

    Xp, Xq = bench_match_data(M, N, max(Qs))
    t0 = time.perf_counter()
    matcher = match_jax.DeviceMatcher(Xp)
    emit(stage="qscale", event="panel_up", s=round(time.perf_counter() - t0, 2))
    for Q in Qs:
        xq = Xq[:Q]
        t0 = time.perf_counter()
        rows = matcher.match(xq)                      # compile + warm-up
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows = matcher.match(xq)
        dt = time.perf_counter() - t0
        ref = bench_mod.REF_MATCH_QPS.get(Q)
        emit(stage="qscale", Q=Q, M=M, N=N, s=round(dt, 3),
             q_per_s=round(Q / dt, 1), rows=int(len(rows)),
             warm_s=round(warm, 1),
             vs_ref_binary=round(Q / dt / ref, 3) if ref else None)


def stage_m1m(M=1_000_000, N=2048, Q=256, parity=True):
    from pbwt_tpu.core import native
    from pbwt_tpu.ops import match_jax

    rng = np.random.RandomState(0)
    nf = 500
    F = (rng.random_sample((nf, N)) < rng.beta(0.2, 0.8, size=N)
         ).astype(np.uint8)
    fidx = rng.randint(nf, size=M)
    t0 = time.perf_counter()
    Xp = native.pooled_view((M, N), np.uint8, "gate:xp1m")
    for k0 in range(0, N, 256):                # founder mosaic, 30% switch
        k1 = min(k0 + 256, N)                  # per 256-site block
        if k0:
            sw = rng.random_sample(M) < 0.3
            fidx[sw] = rng.randint(nf, size=int(sw.sum()))
        Xp[:, k0:k1] = F[fidx, k0:k1]
    Xq = np.empty((Q, N), np.uint8)
    for q in range(Q):                         # panel-row mosaic queries
        pos = 0
        while pos < N:
            seg = rng.randint(50, 400)
            Xq[q, pos:pos + seg] = Xp[rng.randint(0, M), pos:pos + seg]
            pos += seg
    emit(stage="m1m", event="panel_gen", s=round(time.perf_counter() - t0, 1))

    t0 = time.perf_counter()
    matcher = match_jax.DeviceMatcher(Xp)
    emit(stage="m1m", event="panel_up", s=round(time.perf_counter() - t0, 1),
         Mp=matcher.Mp)
    t0 = time.perf_counter()
    rows = matcher.match(Xq)                   # compile + warm-up
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = matcher.match(Xq)
    dt = time.perf_counter() - t0
    emit(stage="m1m", M=M, N=N, Q=Q, s=round(dt, 2),
         q_per_s=round(Q / dt, 1), rows=int(len(rows)),
         warm_s=round(warm, 1), ref_binary_s=5.0)

    if not parity:
        return
    t0 = time.perf_counter()                   # exact rows vs the C sweep
    a = np.arange(M, dtype=np.int32)
    chunks = []
    for k0 in range(0, N, 256):
        cols = np.ascontiguousarray(Xp[:, k0:k0 + 256].T)
        yz, a = native.build_pbwt(cols, a)
        chunks.append(yz)
        a = a.copy()
    pyz = b"".join(chunks)
    aq = np.arange(Q, dtype=np.int32)
    qchunks = []
    for k0 in range(0, N, 256):
        qcols = np.ascontiguousarray(Xq[:, k0:k0 + 256].T)
        qyz, aq = native.build_pbwt(qcols, aq)
        qchunks.append(qyz)
        aq = aq.copy()
    host_rows = native.sweep_match_packed(
        pyz, M, b"".join(qchunks), Q, N,
        np.arange(M, dtype=np.int32), np.arange(Q, dtype=np.int32))
    ok = np.array_equal(canon(rows), canon(host_rows))
    emit(stage="m1m", event="parity", host_s=round(time.perf_counter() - t0, 1),
         host_rows=int(len(host_rows)), exact=bool(ok))
    if not ok:
        sys.exit(1)


def main():
    stages = sys.argv[1:] or ["qscale", "m1m"]
    if "qscale" in stages:
        stage_qscale()
    if "m1m" in stages:
        stage_m1m()


if __name__ == "__main__":
    main()
