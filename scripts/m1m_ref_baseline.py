"""Reference-binary matchDynamic baseline on the M=1M gate workload.

Builds the exact M=1,000,000 x N=2048 founder-mosaic panel and Q=256
mosaic queries of scripts/onchip_round3.stage_m1m (same RNG), writes both
as .pbwt files, and times `pbwt_ref -read panel -matchDynamic query`
(output to a file; the ~13 M MATCH lines are part of the workload).
This replaces the README.md:83-84-derived "~5 s" placeholder with a
measured number on this host.

Host-only (JAX never dialled).  Usage: python scripts/m1m_ref_baseline.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from host_headtohead import WORKDIR, ref_bin
    from pbwt_tpu.core import native

    M, N, Q = 1_000_000, 2048, 256
    d = os.path.join(WORKDIR, "m1m")
    os.makedirs(d, exist_ok=True)
    rb = ref_bin()

    if not os.path.exists(os.path.join(d, "query.pbwt")):
        rng = np.random.RandomState(0)
        nf = 500
        F = (rng.random_sample((nf, N)) < rng.beta(0.2, 0.8, size=N)
             ).astype(np.uint8)
        fidx = rng.randint(nf, size=M)
        t0 = time.perf_counter()
        Xp = native.pooled_view((M, N), np.uint8, "m1m:xp")
        for k0 in range(0, N, 256):
            k1 = min(k0 + 256, N)
            if k0:
                sw = rng.random_sample(M) < 0.3
                fidx[sw] = rng.randint(nf, size=int(sw.sum()))
            Xp[:, k0:k1] = F[fidx, k0:k1]
        Xq = np.empty((Q, N), np.uint8)
        for q in range(Q):
            pos = 0
            while pos < N:
                seg = rng.randint(50, 400)
                Xq[q, pos:pos + seg] = Xp[rng.randint(0, M), pos:pos + seg]
                pos += seg
        print(f"panel gen {time.perf_counter() - t0:.1f}s", flush=True)

        t0 = time.perf_counter()
        from pbwt_tpu.core.pbwt import PBWT
        from pbwt_tpu.io import pbwtfile
        for name, X in (("panel", Xp), ("query", Xq)):
            a = np.arange(X.shape[0], dtype=np.int32)
            chunks = []
            for k0 in range(0, N, 256):
                cols = np.ascontiguousarray(X[:, k0:k0 + 256].T)
                yz, a = native.build_pbwt(cols, a)
                chunks.append(yz)
                a = a.copy()
            p = PBWT(X.shape[0], N)
            p.yz = b"".join(chunks)
            p.aFend = a
            with open(os.path.join(d, name + ".pbwt"), "wb") as f:
                pbwtfile.write_pbwt(p, f)
        print(f"pbwt write {time.perf_counter() - t0:.1f}s", flush=True)

    for rep in range(2):
        t0 = time.perf_counter()
        with open(os.path.join(d, "ref.out"), "w") as out:
            r = subprocess.run([rb, "-read", "panel.pbwt", "-matchDynamic",
                                "query.pbwt"], cwd=d, stdout=out,
                               stderr=subprocess.PIPE)
        dt = time.perf_counter() - t0
        nl = sum(1 for _ in open(os.path.join(d, "ref.out")))
        print(f"ref -matchDynamic M=1M rep{rep}: {dt:.1f}s rc={r.returncode}"
              f" lines={nl} ({Q / dt:.1f} q/s)", flush=True)
        if r.returncode:
            print(r.stderr.decode()[-300:])
            sys.exit(1)


if __name__ == "__main__":
    main()
