"""Round-5 native cores pinned against their pure-python/numpy fallbacks
on randomized panels (the crosscheck suite additionally byte-compares
each of these end-to-end against the reference binary)."""

import numpy as np
import pytest

from pbwt_tpu.core import native
from pbwt_tpu.core.pbwt import PBWT

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def panel(seed, M, N, founders=12):
    rng = np.random.RandomState(seed)
    F = (rng.random_sample((founders, N)) < 0.4).astype(np.uint8)
    return (F[rng.randint(founders, size=M)]
            ^ (rng.random_sample((M, N)) < 0.02).astype(np.uint8))


def test_device_matcher_no_match_rows():
    """Queries with zero shared alleles still produce only the k=N flush
    rows (wide-interval semantics), and an empty record buffer round-trips
    the device expansion path."""
    from pbwt_tpu.ops import match_jax
    M, N = 600, 64
    Xp = np.zeros((M, N), np.uint8)     # all-zero panel: never collapses
    Xq = np.zeros((3, N), np.uint8)
    rows = np.asarray(match_jax.DeviceMatcher(Xp).match(Xq))
    # every query matches every panel row end-to-end: flush rows only
    assert len(rows) == 3 * M
    assert (rows[:, 2] == 0).all() and (rows[:, 3] == N).all()


def test_segs_sort_equals_lexsort():
    rng = np.random.RandomState(0)
    n, T, N = 5000, 37, 400
    rows = np.stack([rng.randint(0, T, n), rng.randint(0, 200, n),
                     rng.randint(0, N, n), rng.randint(0, N, n)],
                    axis=1).astype(np.int64)
    jr, s, e, off = native.segs_sort(rows, T)
    seg = rows[np.lexsort((rows[:, 2], rows[:, 0]))]
    assert np.array_equal(jr, seg[:, 1].astype(np.int32))
    assert np.array_equal(s, seg[:, 2].astype(np.int32))
    assert np.array_equal(e, seg[:, 3].astype(np.int32))
    counts = np.bincount(rows[:, 0], minlength=T)
    assert np.array_equal(off, np.concatenate([[0], np.cumsum(counts)]))


def test_buckets_sort_start():
    rng = np.random.RandomState(1)
    T = 9
    counts = rng.randint(0, 50, T)
    off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    n = int(off[-1])
    jr = rng.randint(0, 100, n).astype(np.int32)
    s = rng.randint(0, 1000, n).astype(np.int32)
    e = rng.randint(0, 1000, n).astype(np.int32)
    want = []
    for t in range(T):
        b = slice(int(off[t]), int(off[t + 1]))
        order = np.argsort(s[b], kind="stable")
        want.append((jr[b][order], s[b][order], e[b][order]))
    assert native.buckets_sort_start(jr, s, e, off)
    for t in range(T):
        b = slice(int(off[t]), int(off[t + 1]))
        wj, ws, we = want[t]
        assert np.array_equal(jr[b], wj)
        assert np.array_equal(s[b], ws)
        assert np.array_equal(e[b], we)


def test_build_reverse_core_equals_python(monkeypatch):
    X = panel(3, 123, 77)               # odd sizes on purpose
    p1 = PBWT.from_haplotypes(X)
    p2 = PBWT.from_haplotypes(X)
    p1.build_reverse()                  # C route
    # force the python route by hiding the core
    monkeypatch.setattr(native, "build_reverse_core",
                        lambda *a, **k: None)
    p2.build_reverse()
    assert p1.zz == p2.zz
    assert np.array_equal(p1.aRend, p2.aRend)
    assert np.array_equal(p1.aRstart, p2.aRstart)


def test_phase_compare_core_equals_python(monkeypatch):
    from pbwt_tpu.algos import phase as phasemod
    Xt = panel(5, 200, 150)             # "truth"
    Xq = Xt.copy()
    rng = np.random.RandomState(6)
    # flip some pairs after random het positions to create switches
    for j in range(0, 200, 2):
        if rng.random_sample() < 0.7:
            k = rng.randint(150)
            Xq[j, k:], Xq[j + 1, k:] = Xt[j + 1, k:].copy(), Xt[j, k:].copy()
    p = PBWT.from_haplotypes(Xt)
    q = PBWT.from_haplotypes(Xq)
    logs = []
    monkeypatch.setattr(phasemod, "log", lambda msg: logs.append(msg))
    phasemod.phase_compare(p, q)              # C route
    c_msg = logs[-1]
    monkeypatch.setattr(native, "phase_compare_core",
                        lambda *a, **k: None)
    phasemod.phase_compare(p, q)              # python route
    assert logs[-1] == c_msg


def test_gtcompare_core_equals_numpy(monkeypatch):
    import io
    import sys
    from pbwt_tpu.algos import impute
    Xp = panel(7, 160, 90)
    Xq = Xp ^ (np.random.RandomState(8).random_sample((160, 90))
               < 0.05).astype(np.uint8)
    outs = []
    from pbwt_tpu.core import registry
    from pbwt_tpu.core.pbwt import Site
    for force_py in (False, True):
        if force_py:
            monkeypatch.setattr(native, "gtcompare_core",
                                lambda *a, **k: None)
        p = PBWT.from_haplotypes(Xp)
        q = PBWT.from_haplotypes(Xq)
        vd = registry.variation_dict
        p.sites = [Site(x=10 * k, varD=vd.add("A\tC")) for k in range(90)]
        q.sites = p.sites
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        try:
            impute._genotype_compare_pbwt(p, q)
        finally:
            sys.stdout = old
        outs.append(buf.getvalue())
    assert outs[0] == outs[1]
