"""Benchmark: PBWT construction throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric is haplotype-sites/s/chip for the device construction scan (the
reference's hot loop, pbwtCore.c:458-508, is O(M) per site on one CPU
thread; BASELINE.md sets the target at >=10M hap-sites/s/chip).
vs_baseline = value / 1e7.
"""

import json
import sys
import time

import numpy as np

BASELINE = 1.0e7  # hap-sites/s/chip target from BASELINE.md


def main():
    import jax
    import jax.numpy as jnp

    from pbwt_tpu.ops import build as dbuild

    # N large enough that the fixed per-invocation dispatch latency
    # (~60 ms through a tunneled backend) is amortized to <5% of runtime
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16   # 65536 haplotypes
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 14   # 16384 sites
    rng = np.random.RandomState(0)
    # allele frequencies drawn per site for realistic run-length structure
    freqs = rng.beta(0.2, 0.8, size=N)
    X_cols = (rng.random_sample((N, M)) < freqs[:, None]).astype(np.uint8)

    on_tpu = jax.default_backend() == "tpu"
    Mp = dbuild.pad_to(M, 4096 if on_tpu else 256)
    cols = np.ones((N, Mp), dtype=np.uint8)
    cols[:, :M] = X_cols
    w_dev = jnp.asarray(dbuild.pack_group_words(cols))
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

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        a_end, counts = run()
    dt = (time.perf_counter() - t0) / reps

    hap_sites_per_s = M * N / dt
    print(json.dumps({
        "metric": "pbwt_build_hap_sites_per_s_per_chip",
        "value": round(hap_sites_per_s, 1),
        "unit": "hap-sites/s",
        "vs_baseline": round(hap_sites_per_s / BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
