"""Reference-binary matchDynamic baselines on bench_match.py's workload.

Builds the exact panel/query haplotypes bench_match.py uses (same RNG),
writes them as .pbwt roots, compiles the reference binary (htslib stubbed)
and times `pbwt -read panel -matchDynamic query` at each Q.  These are the
numbers bench.py's REF_MATCH_QPS table and README.md quote.

Usage: python scripts/match_ref_baseline.py [M] [N] [Q ...]
"""

import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from bench import bench_match_data  # single source of truth for the workload


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    Qs = [int(q) for q in sys.argv[3:]] or [256, 1024, 4096]

    from paint_headtohead import build_ref

    from pbwt_tpu.core.pbwt import PBWT, Site
    from pbwt_tpu.core import registry
    from pbwt_tpu.io import pbwtfile

    workdir = tempfile.mkdtemp(prefix="match_ref_")
    ref = build_ref(workdir)
    print(f"workdir {workdir}", flush=True)

    Xp, Xq = bench_match_data(M, N, max(Qs))
    vid = registry.variation("A", "C")

    def write_root(X, name):
        p = PBWT.from_haplotypes(X)
        p.chrom = "1"
        p.sites = [Site(x=100 + 13 * i, varD=vid) for i in range(N)]
        root = os.path.join(workdir, name)
        pbwtfile.write_all(p, root)
        return root

    panel = write_root(Xp, "panel")
    for Q in Qs:
        query = write_root(Xq[:Q], f"query{Q}")
        # warm the page cache, then time
        for _ in range(2):
            t0 = time.perf_counter()
            res = subprocess.run(
                [ref, "-read", panel + ".pbwt", "-matchDynamic",
                 query + ".pbwt"], stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            dt = time.perf_counter() - t0
        assert res.returncode == 0
        print(f"ref -matchDynamic M={M} N={N} Q={Q}: {dt:.3f} s = "
              f"{Q / dt:.1f} q/s", flush=True)


if __name__ == "__main__":
    main()
