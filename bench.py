"""Benchmark: PBWT construction + matchDynamic throughput on one chip.

Output contract: prints the primary JSON line
  {"metric": "pbwt_build_hap_sites_per_s_per_chip", "value": N,
   "unit": "hap-sites/s", "vs_baseline": N}
the moment the build metric is measured (flushed), then — if time allows —
prints ONE extended JSON line repeating the primary fields plus extras
(the second BASELINE metric: match_queries_per_s for matchDynamic against a
standing 100k-haplotype panel, the production path of pbwtMatch.c:352-443).
A consumer that takes the last JSON line gets everything; one that takes the
first valid line gets the primary metric even if a later stage stalls.

Every stage is time-boxed against a global deadline (PBWT_BENCH_DEADLINE
seconds, default 480): a stage that would not fit is skipped and recorded in
"skipped", so a flaky tunnel can cost extras but never the record.

Tunnel-death containment: the TPU attempt runs in a child process (the
tunneled backend can hang *inside client creation*, unkillable from Python
on the same thread).  If the child produces no primary metric before its
share of the deadline, the parent kills it and records an honestly-labelled
CPU-backend measurement instead ("backend": "cpu-fallback-tunnel-down") —
a degraded record beats an absent one.

argv: [M_build] [N_build] [M_match] [Q_match]
"""

import json
import os
import sys
import time

import numpy as np

BASELINE = 1.0e7  # hap-sites/s/chip target from BASELINE.md

T_START = time.perf_counter()
DEADLINE = float(os.environ.get("PBWT_BENCH_DEADLINE", "480"))
_SENTINEL = os.environ.get("PBWT_BENCH_SENTINEL", "")


def remaining():
    return DEADLINE - (time.perf_counter() - T_START)


def emit(obj):
    print(json.dumps(obj), flush=True)
    if _SENTINEL:
        try:
            with open(_SENTINEL, "a") as fh:
                fh.write(json.dumps(obj) + "\n")
        except OSError:
            pass


def build_words(M, N, Mp, seed=0):
    """Packed group words for a tiled random panel, built without ever
    materialising the (N, Mp) column matrix (the sandbox faults fresh pages
    at ~14-80 MB/s, so a 1 GB intermediate would cost more than the bench).
    Pad haplotypes are all-ones columns == all-ones words."""
    from pbwt_tpu.ops import build as dbuild

    rng = np.random.RandomState(seed)
    # per-site allele frequencies for realistic run-length structure;
    # haplotypes tile a 16k-wide random block (the partition kernel and the
    # bitonic sorts are data-independent, so tiling doesn't change the
    # measurement)
    freqs = rng.beta(0.2, 0.8, size=N).astype(np.float32)
    TILE = min(M, 1 << 14)
    X_tile = (rng.random_sample((N, TILE)).astype(np.float32)
              < freqs[:, None]).astype(np.uint8)
    W_tile = dbuild.pack_group_words(X_tile)        # (Ng, TILE) int32
    Ng = W_tile.shape[0]
    W = np.full((Ng, Mp), -1, dtype=np.int32)       # pad haps: all-ones
    for t0 in range(0, M, TILE):
        t1 = min(t0 + TILE, M)
        W[:, t0:t1] = W_tile[:, :t1 - t0]
    return W


def _backend_or_none(timeout_s=75.0):
    """Default-backend name, probed on a daemon thread with a deadline.

    A dead tunnel hangs *inside client creation* (unkillable from the
    calling thread); probing on a daemon thread lets the child exit
    promptly so the parent can record the CPU fallback within minutes
    instead of burning the whole deadline."""
    import threading

    got = []

    def probe():
        try:
            import jax

            got.append(jax.default_backend())
        except Exception:
            got.append(None)

    t = threading.Thread(target=probe, daemon=True, name="bench-probe")
    t.start()
    t.join(timeout_s)
    return got[0] if got else None


def trace(msg):
    """Stage breadcrumb: stderr so the JSON contract is untouched but a
    slow or skipped stage in a recorded run is attributable."""
    print(f"bench[{time.perf_counter() - T_START:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def tpu_main():
    backend = _backend_or_none()
    if backend is None:
        print("bench: backend unresponsive within probe deadline; exiting "
              "for parent fallback", file=sys.stderr, flush=True)
        return
    trace(f"backend {backend}")

    import jax
    import jax.numpy as jnp

    from pbwt_tpu.ops import build as dbuild

    # N large enough that the fixed per-invocation dispatch latency
    # (~60 ms through a tunneled backend) is amortized to <5% of runtime
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16   # 65536 haplotypes
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 14   # 16384 sites

    on_tpu = backend == "tpu"
    Mp = dbuild.pad_to(M, 4096 if on_tpu else 256)
    W_host = build_words(M, N, Mp)
    trace("panel words built")
    # chunked upload: one 134 MB transfer intermittently stalls the
    # tunneled backend (two hung bench runs, ONCHIP_R5.log) while ~16 MB
    # transfers go through; concatenate on device
    CH = max(1, (16 << 20) // (4 * Mp))
    parts = []
    for g0 in range(0, W_host.shape[0], CH):
        parts.append(jnp.asarray(W_host[g0:g0 + CH]))
        jax.block_until_ready(parts[-1])
        trace(f"panel chunk {g0 // CH + 1}/{-(-W_host.shape[0] // CH)} up")
    w_dev = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    jax.block_until_ready(w_dev)
    del parts
    trace(f"panel uploaded ({W_host.nbytes >> 20} MB)")
    a0 = jnp.arange(Mp, dtype=jnp.int32)

    if on_tpu:
        from pbwt_tpu.ops import partition_pallas as pp

        def run():
            out = (pp.build_scan_pallas_noa64(w_dev, a0)
                   if w_dev.shape[0] % 2 == 0 and Mp <= (1 << 19)
                   else pp.build_scan_pallas_noa(w_dev, a0))
            # force real execution: block_until_ready is unreliable on
            # tunneled backends, so fetch the final prefix array and counts
            return np.asarray(out[2]), np.asarray(out[1])
    else:
        def run():
            out = dbuild.build_scan_grouped(w_dev, a0, with_divergence=False)
            return np.asarray(out[2]), np.asarray(out[1])

    run()  # warm-up / compile
    trace("build compiled + warm")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        a_end, counts = run()
    dt = (time.perf_counter() - t0) / reps
    trace(f"build measured ({dt:.2f} s/rep)")

    hap_sites_per_s = M * N / dt
    result = {
        "metric": "pbwt_build_hap_sites_per_s_per_chip",
        "value": round(hap_sites_per_s, 1),
        "unit": "hap-sites/s",
        "vs_baseline": round(hap_sites_per_s / BASELINE, 3),
    }
    emit(result)                    # the round's primary record is now safe

    if not on_tpu:
        return

    skipped = []
    # match first: it is the round's headline head-to-head, and a tunnel
    # flake in a later stage must not take it down with the deadline
    stages = [
        ("match", 200, lambda: bench_match_dynamic(
            M=int(sys.argv[3]) if len(sys.argv) > 3 else 100_000,
            Qs=((int(sys.argv[4]),) if len(sys.argv) > 4
                else (256, 1024, 4096)))),
        ("build_ad", 60, lambda: bench_build_ad(w_dev, a0, Mp, M)),
    ]
    for name, budget, fn in stages:
        if remaining() < budget:
            skipped.append(name)
            continue
        trace(f"stage {name} starting (remaining {remaining():.0f}s)")
        try:
            result.update(fn())
        except Exception as e:          # an extra must never kill the record
            result[name + "_error"] = repr(e)[:200]
        trace(f"stage {name} done")
        result["elapsed_s"] = round(time.perf_counter() - T_START, 1)
        emit(result)                # re-emit after every stage: a tunnel
        # hang later must not take completed extras down with the child
    if skipped:
        result["skipped"] = skipped
        result["elapsed_s"] = round(time.perf_counter() - T_START, 1)
        emit(result)                # final line records the skips


def cpu_fallback():
    """Emit a degraded-but-honest record when the TPU tunnel is dead."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pbwt_tpu.ops import build as dbuild

    M, N = 1 << 13, 1 << 12      # small: the fallback must fit the tail of
    Mp = dbuild.pad_to(M, 256)   # the driver's own timeout after the child
    w_dev = jnp.asarray(build_words(M, N, Mp))
    a0 = jnp.arange(Mp, dtype=jnp.int32)

    def run():
        out = dbuild.build_scan_grouped(w_dev, a0, with_divergence=False)
        return np.asarray(out[2]), np.asarray(out[1])

    run()
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    hs = M * N / dt
    emit({
        "metric": "pbwt_build_hap_sites_per_s_per_chip",
        "value": round(hs, 1),
        "unit": "hap-sites/s",
        "vs_baseline": round(hs / BASELINE, 3),
        "backend": "cpu-fallback-tunnel-down",
        "note": f"TPU backend unreachable within deadline; single-core CPU "
                f"XLA measurement at M={M}, N={N} (see BASELINE_RUNS.md for "
                f"recorded on-chip numbers)",
    })


def main():
    if os.environ.get("PBWT_BENCH_CHILD"):
        tpu_main()
        return
    import subprocess
    import tempfile

    sentinel = tempfile.mktemp(prefix="pbwt_bench_")
    child_deadline = max(DEADLINE * 0.8, DEADLINE - 90)
    env = dict(os.environ,
               PBWT_BENCH_CHILD="1",
               PBWT_BENCH_SENTINEL=sentinel,
               PBWT_BENCH_DEADLINE=str(child_deadline))
    try:
        subprocess.run([sys.executable, os.path.abspath(__file__)]
                       + sys.argv[1:], env=env, timeout=child_deadline + 30)
    except subprocess.TimeoutExpired:
        print("bench: TPU child exceeded deadline (tunnel hang?); killed",
              file=sys.stderr, flush=True)
    got_metric = os.path.exists(sentinel) and os.path.getsize(sentinel) > 0
    if os.path.exists(sentinel):
        os.unlink(sentinel)
    if not got_metric:
        print("bench: no primary metric from TPU child; CPU fallback",
              file=sys.stderr, flush=True)
        cpu_fallback()


def bench_build_ad(w_dev, a0, Mp, M, groups=64):
    """Divergence-carrying construction chain (the panel state the matcher
    consumes: ops/partition_pallas.partition_ad_step per site)."""
    import jax
    import jax.numpy as jnp

    from pbwt_tpu.ops import partition_pallas as pp
    from pbwt_tpu.ops.build import GROUP

    R = Mp // 128
    iota = jnp.arange(Mp, dtype=jnp.int32)

    @jax.jit
    def ad_chain(W, a0):
        def sg(w_nat, a):
            _, inv = jax.lax.sort((a, iota), num_keys=1, is_stable=True)
            _, r = jax.lax.sort((inv, w_nat), num_keys=1, is_stable=True)
            return r

        def gs(carry, w_nat):
            a, d, k = carry
            w = sg(w_nat, a)

            def ss(s, st):
                a, d, w = st
                a2, d2, w2, _, _ = pp.partition_ad_step(a, d, w, s, k + s)
                return a2, d2, w2

            aR, dR, wR = jax.lax.fori_loop(
                0, GROUP, ss, (a.reshape(R, 128), d.reshape(R, 128),
                               w.reshape(R, 128)))
            return (aR.reshape(-1), dR.reshape(-1), k + GROUP), 0

        d0 = jnp.zeros(Mp, jnp.int32).at[0].set(1)
        (a, d, _), _ = jax.lax.scan(gs, (a0, d0, jnp.int32(0)), W)
        return a, d

    Wc = w_dev[:groups]
    out = ad_chain(Wc, a0)
    np.asarray(out[0][:4])                 # warm-up / compile
    t0 = time.perf_counter()
    out = ad_chain(Wc, a0)
    np.asarray(out[0][:4])
    dt = time.perf_counter() - t0
    n_sites = groups * 32
    return {"build_ad_hap_sites_per_s": round(M * n_sites / dt, 1)}


# reference binary -matchDynamic on this host, M=100k N=2048, same mosaic
# queries as bench_match_dynamic (repeatable: scripts/match_ref_baseline.py,
# measured 2026-08-17).  Its whole-panel sweep (pbwtMatch.c:363-443) amortizes
# over Q, so q/s grows with Q.
REF_MATCH_QPS = {256: 437.0, 1024: 1812.0, 4096: 5437.0}


def bench_match_data(M, N, Qmax):
    """Panel + mosaic queries for the matchDynamic benchmark.  The single
    source of truth for this workload: scripts/match_ref_baseline.py feeds
    the same arrays to the reference binary, so REF_MATCH_QPS denominators
    and the device numbers see identical data."""
    rng = np.random.RandomState(0)
    freqs = rng.beta(0.2, 0.8, size=N)
    # row-blocked generation: MT19937 draws sequentially, so this yields
    # byte-identical Xp to one (M, N) draw while never materialising the
    # (M, N) float64 intermediate (1.6 GB at the default shape — this
    # sandbox faults fresh pages at ~14-80 MB/s, so that intermediate
    # alone cost tens of seconds of the match stage's budget)
    Xp = np.empty((M, N), np.uint8)
    B = max(1, (1 << 24) // max(N, 1))
    for r0 in range(0, M, B):
        r1 = min(r0 + B, M)
        Xp[r0:r1] = rng.random_sample((r1 - r0, N)) < freqs[None, :]
    Xq = np.empty((Qmax, N), np.uint8)
    for q in range(Qmax):                 # panel-row mosaics: real matches
        pos = 0
        while pos < N:
            seg = rng.randint(50, 400)
            src = rng.randint(0, M)
            Xq[q, pos:pos + seg] = Xp[src, pos:pos + seg]
            pos += seg
    return Xp, Xq


def bench_match_dynamic(M=100_000, N=2048, Qs=(256, 1024, 4096)):
    """Standing-panel matchDynamic q/s at each Q.  The first Q is the
    BASELINE metric; later Qs run only while the deadline allows (each
    needs its own XLA compile of the query machinery)."""
    from pbwt_tpu.ops import match_jax

    Xp, Xq = bench_match_data(M, N, max(Qs))
    trace("match data built")
    matcher = match_jax.DeviceMatcher(Xp)
    trace("matcher panel up (trajectory ready)")
    out = {"match_M": M, "match_N": N}
    for i, Q in enumerate(Qs):
        # after the first Q, per-Q compiles are cheap (~10-16 s measured
        # round 5); keep a modest guard so a degraded tunnel cannot eat
        # the whole record
        if i and remaining() < 60:
            out.setdefault("match_skipped_q", []).append(Q)
            continue
        matcher.match(Xq[:Q])             # warm-up / compile
        trace(f"match Q={Q} compiled + warm")
        dt = float("inf")                 # best of 2 steady calls: the
        for _ in range(2):                # tunnel adds 50-300 ms jitter
            t0 = time.perf_counter()
            rows = matcher.match(Xq[:Q])
            dt = min(dt, time.perf_counter() - t0)
        trace(f"match Q={Q} measured ({dt:.3f} s best-of-2)")
        qps = round(Q / dt, 2)
        if i == 0:                        # primary BASELINE metric keys
            out["match_queries_per_s"] = qps
            out["match_Q"] = Q
            out["match_rows"] = len(rows)
        out[f"match_q{Q}_per_s"] = qps
        if Q in REF_MATCH_QPS:
            out[f"match_q{Q}_vs_ref_binary"] = round(
                Q / dt / REF_MATCH_QPS[Q], 3)
    out["match_vs_ref_binary"] = out.get(
        f"match_q{Qs[0]}_vs_ref_binary")
    return out


if __name__ == "__main__":
    main()
