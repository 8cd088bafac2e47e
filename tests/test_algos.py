"""Functional tests for the algorithm layer: matching properties, phasing,
painting, likelihood, genetic map, imputation."""

import io
import os
import sys

import numpy as np
import pytest

from pbwt_tpu.core import engine, registry
from pbwt_tpu.core.pbwt import PBWT, Site


def rand_haps(seed, M, N, maf=0.35):
    rng = np.random.RandomState(seed)
    return (rng.random_sample((M, N)) < maf).astype(np.uint8)


def mosaic_haps(seed, M, N, n_founders=4, switch=0.05):
    """Panel with real shared haplotype structure (Li-Stephens mosaic)."""
    rng = np.random.RandomState(seed)
    founders = (rng.random_sample((n_founders, N)) < 0.4).astype(np.uint8)
    X = np.empty((M, N), dtype=np.uint8)
    for i in range(M):
        f = rng.randint(n_founders)
        for k in range(N):
            if rng.random_sample() < switch:
                f = rng.randint(n_founders)
            X[i, k] = founders[f, k]
    return X


def brute_force_maximal_matches(X):
    """All set-maximal matches (i vs j) by definition, for cross-checking."""
    M, N = X.shape
    out = set()
    for i in range(M):
        for j in range(M):
            if i == j:
                continue
            k = 0
            while k < N:
                if X[i, k] != X[j, k]:
                    k += 1
                    continue
                s = k
                while k < N and X[i, k] == X[j, k]:
                    k += 1
                # [s, k) is a locally maximal shared segment between i and j;
                # it is set-maximal for i if no other j' contains a longer
                # match covering it - checked below
                out.add((i, j, s, k))
    # reduce to set-maximal: for i, keep (i,j,s,e) iff no (i,j2,s2,e2)
    # with s2 <= s and e2 >= e and (e2-s2) > (e-s)
    by_i = {}
    for (i, j, s, e) in out:
        by_i.setdefault(i, []).append((j, s, e))
    result = set()
    for i, lst in by_i.items():
        for (j, s, e) in lst:
            dominated = any(s2 <= s and e2 >= e and (s2, e2) != (s, e)
                            for (_, s2, e2) in lst)
            if not dominated:
                result.add((i, j, s, e))
    return result


def test_max_within_matches_are_maximal():
    from pbwt_tpu.algos import match as matchmod
    X = mosaic_haps(0, 14, 40)
    p = PBWT.from_haplotypes(X)
    got = []
    matchmod.match_maximal_within(p, lambda a, b, s, e: got.append((a, b, s, e)))
    for (a, b, s, e) in got:
        if s == e:
            continue
        matchmod.check_match_maximal(X[a], X[b], s, e, p.N)
    expect = brute_force_maximal_matches(X)
    got_set = {m for m in got if m[2] != m[3]}
    # every reported match must be in the brute-force maximal set
    assert got_set <= expect, got_set - expect
    # and every (i, *) maximal segment must be covered for some j
    expect_seg = {(i, s, e) for (i, j, s, e) in expect}
    got_seg = {(i, s, e) for (i, j, s, e) in got_set}
    assert got_seg == expect_seg


def test_sweep_matches_check_maximal():
    from pbwt_tpu.algos import match as matchmod
    Xp = mosaic_haps(1, 20, 60)
    Xq = mosaic_haps(2, 6, 60)
    p = PBWT.from_haplotypes(Xp)
    q = PBWT.from_haplotypes(Xq)
    got = []
    matchmod.match_sequences_sweep(p, q, lambda a, b, s, e: got.append((a, b, s, e)))
    assert got
    for (a, b, s, e) in got:
        if s >= e:
            continue
        assert (Xq[a, s:e] == Xp[b, s:e]).all(), (a, b, s, e)
        # maximality: cannot extend (matches ending at N can't extend forward)
        if s > 0:
            assert Xq[a, s - 1] != Xp[b, s - 1]
        if e < p.N:
            assert Xq[a, e] != Xp[b, e]


def brute_force_query_maximal(Xq, Xp):
    """All set-maximal query-vs-panel matches (j, i, s, e): locally maximal
    shared segments not contained in a longer match of the same query."""
    Q, N = Xq.shape
    out = set()
    for j in range(Q):
        segs = []
        for i in range(Xp.shape[0]):
            k = 0
            while k < N:
                if Xq[j, k] != Xp[i, k]:
                    k += 1
                    continue
                s = k
                while k < N and Xq[j, k] == Xp[i, k]:
                    k += 1
                segs.append((i, s, k))
        for (i, s, e) in segs:
            if not any(s2 <= s and e2 >= e and (s2, e2) != (s, e)
                       for (_, s2, e2) in segs):
                out.add((j, i, s, e))
    return out


def test_indexed_reports_all_set_maximal_matches():
    from pbwt_tpu.algos import match as matchmod
    Xp = mosaic_haps(3, 16, 50)
    Xq = mosaic_haps(4, 4, 50)
    p = PBWT.from_haplotypes(Xp)
    q = PBWT.from_haplotypes(Xq)
    indexed = []
    matchmod.match_sequences_indexed(p, q,
                                     lambda a, b, s, e: indexed.append((a, b, s, e)))
    expect = brute_force_query_maximal(Xq, Xp)
    assert {m for m in indexed if m[2] != m[3]} == expect


def test_naive_reports_valid_representative_matches():
    from pbwt_tpu.algos import match as matchmod
    Xp = mosaic_haps(3, 16, 50)
    Xq = mosaic_haps(4, 4, 50)
    p = PBWT.from_haplotypes(Xp)
    q = PBWT.from_haplotypes(Xq)
    naive = []
    matchmod.match_sequences_naive(p, q,
                                   lambda a, b, s, e: naive.append((a, b, s, e)))
    expect = brute_force_query_maximal(Xq, Xp)
    ends = {}
    for (j, i, s, e) in expect:
        for k in range(s, e):
            ends[(j, k)] = max(ends.get((j, k), 0), e)
    for (j, i, s, e) in naive:
        if s >= e:      # zero-length reports are dropped by reportMatch
            continue
        assert (Xq[j, s:e] == Xp[i, s:e]).all()
        # each report carries the longest available end at its start
        assert e == ends[(j, s)]


def test_phase_recovers_structure():
    from pbwt_tpu.algos import phase as phasemod
    X = mosaic_haps(5, 24, 80, n_founders=3, switch=0.02)
    p = PBWT.from_haplotypes(X)
    q = phasemod.phase(p, 2)
    assert q.M == 24 and q.N == 80
    Xq = q.haplotypes()
    # genotypes must be preserved exactly
    g0 = X[0::2].astype(int) + X[1::2].astype(int)
    g1 = Xq[0::2].astype(int) + Xq[1::2].astype(int)
    assert (g0 == g1).all()


def test_reference_phase_preserves_genotypes(tmp_path):
    from pbwt_tpu.algos import phase as phasemod
    from pbwt_tpu.io import pbwtfile
    Xref = mosaic_haps(6, 30, 60, n_founders=3, switch=0.02)
    Xq = mosaic_haps(7, 8, 60, n_founders=3, switch=0.02)
    sites = [Site(x=100 + 10 * i, varD=registry.variation("A", "C"))
             for i in range(60)]
    ref = PBWT.from_haplotypes(Xref, chrom="1", sites=[s.copy() for s in sites])
    pbwtfile.write_all(ref, str(tmp_path / "ref"))
    p = PBWT.from_haplotypes(Xq, chrom="1", sites=[s.copy() for s in sites])
    q = phasemod.reference_phase(p, str(tmp_path / "ref"))
    Xout = q.haplotypes()
    g0 = Xq[0::2].astype(int) + Xq[1::2].astype(int)
    g1 = Xout[0::2].astype(int) + Xout[1::2].astype(int)
    assert (g0 == g1).all()


def test_impute_missing(tmp_path):
    from pbwt_tpu.algos import impute
    from pbwt_tpu.core import pack3 as p3
    X = mosaic_haps(8, 20, 50, n_founders=3, switch=0.02)
    sites = [Site(x=100 + i, varD=registry.variation("A", "T")) for i in range(50)]
    p = PBWT.from_haplotypes(X, chrom="1", sites=sites)
    # mark sites 10 and 30 as missing for haplotypes 0-3
    miss = np.zeros(p.M, dtype=np.uint8)
    miss[:4] = 1
    chunks = [b"\x00"]
    offsets = np.zeros(p.N, dtype=np.int64)
    off = 1
    for k in (10, 30):
        offsets[k] = off
        c = p3.pack3(miss)
        chunks.append(c)
        off += len(c)
    p.zMissing = b"".join(chunks)
    p.missingOffset = offsets
    q = impute.impute_missing(p)
    assert q.N == p.N
    Xq = q.haplotypes()
    # non-missing entries unchanged
    assert (Xq[4:] == X[4:]).all()
    mask = np.ones(50, dtype=bool)
    mask[[10, 30]] = False
    assert (Xq[:4][:, mask] == X[:4][:, mask]).all()


def test_paint(tmp_path):
    from pbwt_tpu.algos import paint
    X = mosaic_haps(9, 12, 60)
    p = PBWT.from_haplotypes(X, sites=[Site(x=i) for i in range(60)])
    root = str(tmp_path / "pnt")
    paint.paint_ancestry_matrix(p, root, 100, 2, 0)
    for tag in ("chunkcounts.out", "chunklengths.out",
                "regionsquaredchunkcounts.out", "regionchunkcounts.out"):
        assert os.path.exists(f"{root}.{tag}")
    lines = open(f"{root}.chunkcounts.out").read().strip().split("\n")
    assert lines[0].split()[0] == "RECIPIENT"
    assert len(lines) == 7  # header + 6 individuals
    paint.paint_ancestry_matrix_sparse(p, root, 100, 2, 0)
    assert os.path.exists(f"{root}.chunkcounts.s.out.gz")


def test_likelihood_and_geneticmap(capsys):
    from pbwt_tpu.algos import likelihood, geneticmap
    X = mosaic_haps(10, 12, 40)
    p = PBWT.from_haplotypes(X, chrom="1",
                             sites=[Site(x=1000 + 97 * i) for i in range(40)])
    likelihood.fit_alpha_beta(p, 1)
    out = capsys.readouterr().out
    assert "Fit alpha" in out and "PBWT entropy per site" in out
    likelihood.log_likelihood_copy_model(p, 0.05, 0.05)
    out = capsys.readouterr().out
    assert "Fit theta" in out

    mapfile = io.StringIO(
        "Chromosome\tPosition(bp)\tRate(cM/Mb)\tMap(cM)\n"
        "chr1\t1000\t1.0\t0.0\n"
        "chr1\t3000\t2.0\t0.002\n"
        "chr1\t5000\t1.0\t0.006\n")
    geneticmap.read_genetic_map(mapfile)
    assert geneticmap.genetic_map(1000) == 0.0
    assert abs(geneticmap.genetic_map(3000) - 0.002) < 1e-9
    geneticmap.pbwt_4haps_stats(p)
    out = capsys.readouterr().out
    assert out.startswith(" rate\tvar")


def test_corrupt_and_copy_samples():
    from pbwt_tpu.algos import impute
    X = rand_haps(11, 16, 30)
    p = PBWT.from_haplotypes(X.copy())
    q = impute.corrupt_sites(p, 0.5, 0.5)
    assert q.M == 16 and q.N == 30
    p2 = PBWT.from_haplotypes(X.copy())
    q2 = impute.copy_samples(p2, 10, 5.0)
    assert q2.M == 10 and q2.N == 30


def test_reference_impute3_native_matches_fallback(monkeypatch):
    """The fused streaming C core (native.impute_vote_emit) produces the
    same pbwt bytes, dosage stream, offsets, refFreq and imputeInfo as the
    pure-numpy vote + python emit path (packed bytes compared directly,
    complementing test_native_parity.test_impute_vote_parity)."""
    from pbwt_tpu.algos import impute as impmod
    from pbwt_tpu.core import native, registry
    from pbwt_tpu.core.pbwt import Site

    rng = np.random.RandomState(5)
    Mref, Nref, T = 40, 60, 8
    Xref = mosaic_haps(5, Mref, Nref)
    Xq = mosaic_haps(6, T, Nref)
    keep = np.sort(rng.choice(Nref, size=Nref // 2, replace=False))
    vid = registry.variation("A", "C")
    sites = [Site(x=100 + 7 * i, varD=vid) for i in range(Nref)]

    def run():
        p_ref = PBWT.from_haplotypes(Xref, chrom="1",
                                     sites=[s.copy() for s in sites])
        p_frame = PBWT.from_haplotypes(
            Xref[:, keep], chrom="1",
            sites=[sites[i].copy() for i in keep])
        p_old = PBWT.from_haplotypes(
            Xq[:, keep], chrom="1",
            sites=[sites[i].copy() for i in keep])
        p_new = impmod.reference_impute3(p_old, p_ref, p_frame)
        return (p_new.yz, p_new.zDosage, p_new.dosageOffset.tolist(),
                [s.refFreq for s in p_ref.sites],
                [s.imputeInfo for s in p_ref.sites])

    a = run()
    monkeypatch.setattr(native, "get_lib", lambda: None)
    b = run()
    assert a[0] == b[0]
    assert a[1] == b[1]
    assert a[2] == b[2]
    assert np.allclose(a[3], b[3])
    assert np.allclose(np.nan_to_num(np.array(a[4], np.float64)),
                       np.nan_to_num(np.array(b[4], np.float64)))
