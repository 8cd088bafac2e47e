"""On-chip validation of the Pallas device paths (run on a real TPU).

pytest forces JAX_PLATFORMS=cpu (tests/conftest.py), so the compiled Mosaic
kernels only execute here and in bench.py. Exercises:
  1. the word-only build kernel chain vs a numpy LSD-radix replay,
  2. the divergence-carrying per-site kernel vs the host engine,
  3. the kernel-driven query matcher vs the portable path (exact rows).

Exits non-zero on any mismatch.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def check_build():
    import jax.numpy as jnp
    from pbwt_tpu.ops import build as dbuild
    from pbwt_tpu.ops import partition_pallas as pp
    M, N = 8192, 512
    rng = np.random.RandomState(0)
    freqs = rng.beta(0.2, 0.8, size=N)
    X = (rng.random_sample((N, M)) < freqs[:, None]).astype(np.uint8)
    W = jnp.asarray(dbuild.pack_group_words(X))
    a0 = jnp.arange(M, dtype=jnp.int32)
    for name, fn in [("noa", pp.build_scan_pallas_noa),
                     ("noa64", pp.build_scan_pallas_noa64)]:
        yw, counts, a_end = fn(W, a0)
        ycols = pp.unpack_sitewords_host(np.asarray(yw), M)
        counts = np.asarray(counts)
        a = np.arange(M)
        for k in range(N):
            y = X[k][a]
            assert np.array_equal(ycols[k], y), f"{name} ycol mismatch @{k}"
            assert int(counts[k]) == int((y == 0).sum()), f"{name} cnt @{k}"
            a = np.concatenate([a[y == 0], a[y == 1]])
        assert np.array_equal(a, np.asarray(a_end)), f"{name} a_end"
        print(f"PASS build kernel chain [{name}] (M=8192, N=512)")


def check_ad_kernel():
    import jax.numpy as jnp
    from pbwt_tpu.core import engine
    from pbwt_tpu.ops import partition_pallas as pp
    M = 4096
    R = M // 128
    rng = np.random.RandomState(5)
    w = rng.randint(0, 2**32, size=M, dtype=np.uint32).astype(np.int32)
    a = np.arange(M, dtype=np.int32)
    d = np.zeros(M + 1, dtype=np.int32)
    d[0] = d[M] = 1
    aj = jnp.asarray(a.reshape(R, 128))
    dj = jnp.asarray(d[:M].reshape(R, 128))
    wj = jnp.asarray(w.reshape(R, 128))
    for k in range(8):
        a2, d2, w2, u, cnt = pp.partition_ad_step(aj, dj, wj, k % 32, k)
        key = ((w >> (k % 32)) & 1).astype(np.uint8)
        exp_u = np.concatenate([[0], np.cumsum(key == 0)])[:M]
        assert np.array_equal(np.asarray(u).reshape(-1), exp_u), f"u @{k}"
        a, d = engine.forwards_ad(a, d, key, k)
        order = np.concatenate([np.nonzero(key == 0)[0],
                                np.nonzero(key == 1)[0]])
        w = w[order]
        assert np.array_equal(np.asarray(a2).reshape(-1), a), f"a @{k}"
        assert np.array_equal(np.asarray(d2).reshape(-1), d[:M]), f"d @{k}"
        aj, dj, wj = a2, d2, w2
    print("PASS divergence kernel chain (M=4096, 8 sites)")


def check_ad_kernel_blocked():
    """Block-processed divergence kernel (the M > 512k panel path) ==
    monolithic kernel, compiled Mosaic vs compiled Mosaic."""
    import jax.numpy as jnp
    from pbwt_tpu.ops import partition_pallas as pp
    M = 8192 * 128 // 16          # R = 512, small enough to run quickly
    R = M // 128
    rng = np.random.RandomState(9)
    w = rng.randint(0, 2**32, size=(R, 128), dtype=np.uint32).astype(np.int32)
    a = np.arange(M, dtype=np.int32).reshape(R, 128)
    d = rng.randint(0, 30, size=(R, 128)).astype(np.int32)
    aj, dj, wj = jnp.asarray(a), jnp.asarray(d), jnp.asarray(w)
    for s, kk in [(0, 3), (17, 40)]:
        ref = pp.partition_ad_step(aj, dj, wj, s, kk)
        got = pp.partition_ad_step_blocked(aj, dj, wj, s, kk, rb=128)
        for name, r, g in zip("a d w u cnt".split(), ref, got):
            assert np.array_equal(np.asarray(r), np.asarray(g)), \
                f"blocked {name} @s={s}"
    print(f"PASS blocked divergence kernel == monolithic (R={R}, rb=128)")


def check_mxu_exactness():
    """The MXU one-hot gathers must be exact for values far above bf16's
    2^8 integer range (the TPU's default f32 matmul precision is bf16;
    Precision.HIGHEST restores exactness — this is the regression guard
    for the round-3 matcher corruption)."""
    import jax.numpy as jnp
    from pbwt_tpu.ops import match_jax as mj
    rng = np.random.RandomState(11)
    R = 64
    plane = rng.randint(0, 1 << 20, size=(R, 128)).astype(np.int32)
    idx = rng.randint(0, R * 128, size=96).astype(np.int32)
    got = np.asarray(mj._mxu_gather_plane(jnp.asarray(plane),
                                          jnp.asarray(idx)))
    assert np.array_equal(got, plane.reshape(-1)[idx]), "gather_plane inexact"
    got8 = np.asarray(mj._mxu_gather_u8planes(
        jnp.asarray(np.asarray(mj._u8_digit_planes(jnp.asarray(plane)))),
        jnp.asarray(idx)))
    assert np.array_equal(got8, plane.reshape(-1)[idx]), \
        "digit-plane gather inexact"
    start = rng.randint(-4, R * 128 - 1, size=96).astype(np.int32)
    two, l0 = mj._mxu_window_rows(
        jnp.asarray(np.asarray(mj._u8_digit_planes(jnp.asarray(plane)))),
        jnp.asarray(start))
    two, l0 = np.asarray(two), np.asarray(l0)
    flat = plane.reshape(-1)
    for j in range(mj._WW):
        li = l0 + j
        pos = start + j
        valid = (li < 256) & (pos >= 0) & (pos < R * 128)
        assert np.array_equal(two[valid, li[valid]], flat[pos[valid]]), \
            f"window_rows j={j}"
    print("PASS MXU one-hot gathers exact at 2^20 values")


def check_matcher():
    import jax
    from pbwt_tpu.ops import match_jax as mj
    rng = np.random.RandomState(7)
    M, N, Q = 4500, 200, 24
    F = (rng.random_sample((30, N)) < 0.4).astype(np.uint8)
    Xp = (F[rng.randint(30, size=M)]
          ^ (rng.random_sample((M, N)) < 0.02).astype(np.uint8))
    Xp[100] = Xp[0]
    Xq = np.empty((Q, N), np.uint8)
    for q in range(Q):
        pos = 0
        while pos < N:
            seg = rng.randint(20, 80)
            src = rng.randint(0, M)
            Xq[q, pos:pos + seg] = Xp[src, pos:pos + seg]
            pos += seg
    rows_tpu = mj._match_queries_tpu(Xp, Xq)
    orig = jax.default_backend
    jax.default_backend = lambda: "cpu"
    try:
        rows_ref = mj.match_queries_device(Xp, Xq)
    finally:
        jax.default_backend = orig
    assert np.array_equal(np.asarray(rows_tpu), np.asarray(rows_ref)), (
        f"matcher rows differ: {len(rows_tpu)} vs {len(rows_ref)}")
    print(f"PASS kernel matcher == portable ({len(rows_tpu)} rows)")


def check_match_dynamic_route():
    """CLI -matchDynamic device route == host sweep, byte-for-byte."""
    import io
    import os
    from contextlib import redirect_stdout

    from pbwt_tpu.algos import match as am
    from pbwt_tpu.core.pbwt import PBWT

    rng = np.random.RandomState(13)
    M, N, Q = 2000, 300, 32
    F = (rng.random_sample((25, N)) < 0.4).astype(np.uint8)
    Xp = (F[rng.randint(25, size=M)]
          ^ (rng.random_sample((M, N)) < 0.02).astype(np.uint8))
    Xq = np.empty((Q, N), np.uint8)
    for q in range(Q):
        pos = 0
        while pos < N:
            seg = rng.randint(20, 80)
            src = rng.randint(0, M)
            Xq[q, pos:pos + seg] = Xp[src, pos:pos + seg]
            pos += seg
    p = PBWT.from_haplotypes(Xp)
    qq = PBWT.from_haplotypes(Xq)

    def run():
        buf = io.StringIO()
        with redirect_stdout(buf):
            am.match_sequences_sweep(p, qq, am.report_match_stdout)
        return buf.getvalue()

    prev = os.environ.pop("PBWT_TPU_DEVICE", None)
    os.environ["PBWT_TPU_DEVICE"] = "0"     # unset now defaults to device
    host_out = run()
    os.environ["PBWT_TPU_DEVICE"] = "1"
    try:
        dev_out = run()
    finally:
        if prev is None:
            os.environ.pop("PBWT_TPU_DEVICE", None)
        else:
            os.environ["PBWT_TPU_DEVICE"] = prev
    assert dev_out == host_out, "matchDynamic device route stdout differs"
    print(f"PASS matchDynamic device route == host sweep "
          f"({host_out.count(chr(10))} lines)")


def check_impute_paint_routes():
    """PBWT_TPU_DEVICE=1 referenceImpute3 and paint == host outputs."""
    import os
    import tempfile

    from pbwt_tpu.algos import impute as himp
    from pbwt_tpu.algos import paint as hpaint
    from pbwt_tpu.core import registry
    from pbwt_tpu.core.pbwt import PBWT, Site

    rng = np.random.RandomState(21)
    N = 160
    F = (rng.random_sample((6, N)) < 0.4).astype(np.uint8)

    def mosaic(seed, M):
        r = np.random.RandomState(seed)
        X = np.empty((M, N), np.uint8)
        for i in range(M):
            f = r.randint(6)
            for k in range(N):
                if r.random_sample() < 0.03:
                    f = r.randint(6)
                X[i, k] = F[f, k]
        return X

    Xref = mosaic(1, 40)
    Xq = mosaic(2, 6)
    vid = registry.variation("A", "C")
    sites = [Site(x=100 + 7 * i, varD=vid) for i in range(N)]
    fidx = np.sort(rng.choice(N, N // 2, replace=False))

    def run_impute():
        p_ref = PBWT.from_haplotypes(Xref, chrom="1",
                                     sites=[s.copy() for s in sites])
        p_frame = PBWT.from_haplotypes(
            Xref[:, fidx], chrom="1", sites=[sites[i].copy() for i in fidx])
        p_old = PBWT.from_haplotypes(
            Xq[:, fidx], chrom="1", sites=[sites[i].copy() for i in fidx])
        pn = himp.reference_impute3(p_old, p_ref, p_frame)
        return (pn.haplotypes().tobytes(), pn.zDosage,
                tuple(round(s.imputeInfo, 9) for s in p_ref.sites))

    prev = os.environ.pop("PBWT_TPU_DEVICE", None)
    os.environ["PBWT_TPU_DEVICE"] = "0"     # unset now defaults to device
    host = run_impute()
    os.environ["PBWT_TPU_DEVICE"] = "1"
    try:
        dev = run_impute()
        assert dev[0] == host[0], "imputed haplotypes differ"
        assert dev[1] == host[1], "dosage bytes differ"
        assert dev[2] == host[2], "imputeInfo differs"
        print("PASS referenceImpute device route == host")

        Xp = mosaic(3, 24)
        pp_ = PBWT.from_haplotypes(Xp, chrom="1",
                                   sites=[s.copy() for s in sites])
        files = ("chunkcounts.out", "chunklengths.out",
                 "regionsquaredchunkcounts.out", "regionchunkcounts.out")
        with tempfile.TemporaryDirectory() as td:
            os.environ["PBWT_TPU_DEVICE"] = "0"
            hpaint.paint_ancestry_matrix(pp_, f"{td}/host", 5)
            os.environ["PBWT_TPU_DEVICE"] = "1"
            hpaint.paint_ancestry_matrix(pp_, f"{td}/dev", 5)
            for t in files:
                a = open(f"{td}/host.{t}").read().split()
                b = open(f"{td}/dev.{t}").read().split()
                assert len(a) == len(b), f"paint {t} shape differs"
                for x, y in zip(a, b):
                    if x == y:
                        continue
                    # device accumulation is f32: the last printed digit
                    # may differ on half-ulp ties (see PARITY.md)
                    assert abs(float(x) - float(y)) <= 2e-4, \
                        f"paint {t}: {x} vs {y}"
        print("PASS paint device route ~= host (f32 print-precision)")
    finally:
        if prev is None:
            os.environ.pop("PBWT_TPU_DEVICE", None)
        else:
            os.environ["PBWT_TPU_DEVICE"] = prev


if __name__ == "__main__":
    import jax
    if jax.default_backend() != "tpu":
        print("WARNING: no TPU backend; kernels run via interpret only")
    check_build()
    check_ad_kernel()
    check_ad_kernel_blocked()
    check_mxu_exactness()
    check_matcher()
    check_match_dynamic_route()
    check_impute_paint_routes()
    print("ALL TPU SMOKE CHECKS PASSED")
