"""Scale check: host algorithms on a 100k-haplotype panel, O(M) memory.

Builds a synthetic mosaic panel of M haplotypes x N sites blockwise
(never materialising the full matrix), writes it as .pbwt, then runs the
streaming pack3-native paths:

  * -maxWithin    (set-maximal matching, algorithm 4)
  * -paintSparse  (the 100k-haplotype painting path; plain -paint allocates
                   four dense n_inds^2 matrices in the reference too, so
                   only the sparse variant is meaningful at this scale)

and reports wall time and peak RSS for each.  The reference claims
100k-1M haplotype scale via its one-column-at-a-time cursor model
(README.md:83-84, pbwtCore.c:527-585); this exercises the same memory
model in the new framework.

Usage: python scripts/scale_check.py [M] [N] [--paint-inds n]
"""

import resource
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def build_panel(M, N, block=2048, seed=0):
    from pbwt_tpu.core import native
    from pbwt_tpu.core.pbwt import PBWT, Site
    from pbwt_tpu.core import registry

    rng = np.random.RandomState(seed)
    nf = 500
    F = (rng.random_sample((nf, N)) < rng.beta(0.2, 0.8, size=N)
         ).astype(np.uint8)
    fidx = rng.randint(nf, size=M)
    a = np.arange(M, dtype=np.int32)
    chunks = []
    for k0 in range(0, N, block):
        k1 = min(k0 + block, N)
        # ~30% of haplotypes switch founders at each block boundary
        sw = rng.random_sample(M) < 0.3
        fidx[sw] = rng.randint(nf, size=int(sw.sum()))
        cols = F[fidx, k0:k1].T.copy()            # (b, M) site-major
        noise = rng.random_sample(cols.shape) < 0.01
        cols ^= noise.astype(np.uint8)
        yz, a = native.build_pbwt(cols, a)
        chunks.append(yz)
        a = a.copy()
    p = PBWT(M, N)
    p.yz = b"".join(chunks)
    p.aFend = a
    vid = registry.variation("A", "C")
    p.sites = [Site(x=100 + 13 * i, varD=vid) for i in range(N)]
    p.chrom = "1"
    return p


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    t0 = time.perf_counter()
    p = build_panel(M, N)
    t1 = time.perf_counter()
    print(f"panel built: M={M} N={N} yz={len(p.yz) / 1e6:.1f} MB "
          f"in {t1 - t0:.1f}s (rss {rss_gb():.2f} GB)")

    from pbwt_tpu.core import native
    a0 = np.arange(M, dtype=np.int32)

    t0 = time.perf_counter()
    rows = native.max_within_packed(p.yz, M, N, a0)
    t1 = time.perf_counter()
    print(f"maxWithin: {len(rows)} match rows in {t1 - t0:.1f}s "
          f"(rss {rss_gb():.2f} GB)")
    del rows

    from pbwt_tpu.algos import paint as hpaint
    import os
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        hpaint.paint_ancestry_matrix_sparse(p, f"{td}/sc", 100, 2, 0.0)
        t1 = time.perf_counter()
        sz = sum(os.path.getsize(f"{td}/{f}") for f in os.listdir(td))
        print(f"paintSparse: {sz / 1e6:.1f} MB gz output in {t1 - t0:.1f}s "
              f"(rss {rss_gb():.2f} GB)")


if __name__ == "__main__":
    main()
