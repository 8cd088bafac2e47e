"""Native C fast paths vs their pure-Python/numpy fallbacks.

The crosscheck suite compares against the reference binary when a C
toolchain can build it; these tests need only our own two implementations
and run everywhere."""

import numpy as np
import pytest

from pbwt_tpu.core import native, registry
from pbwt_tpu.core.pbwt import PBWT, Site


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def mosaic(seed, M, N, founders=10, err=0.01):
    rng = np.random.RandomState(seed)
    F = (rng.random_sample((founders, N)) < 0.4).astype(np.uint8)
    return (F[rng.randint(founders, size=M)]
            ^ (rng.random_sample((M, N)) < err).astype(np.uint8))


@pytest.fixture
def no_native(monkeypatch):
    """Force the numpy fallbacks within a test."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)


def _mk(X, sites=None):
    vid = registry.variation("A", "C")
    N = X.shape[1]
    s = sites or [Site(x=10 * k + 1, varD=vid) for k in range(N)]
    return PBWT.from_haplotypes(X, chrom="1", sites=[t.copy() for t in s])


def test_long_within_parity():
    from pbwt_tpu.algos import match as matchmod
    X = mosaic(1, 60, 150)
    p = _mk(X)
    assert native.get_lib() is not None
    rows_c, rows_py = [], []
    matchmod.match_long_within(p, 20, lambda *r: rows_c.append(r))
    saved = native._lib
    try:
        native._lib = None
        matchmod.match_long_within(p, 20, lambda *r: rows_py.append(r))
    finally:
        native._lib = saved
    assert rows_c == rows_py and rows_c


def test_paint_parity(tmp_path, monkeypatch):
    from pbwt_tpu.algos import paint
    X = mosaic(2, 48, 160)
    p = _mk(X)
    monkeypatch.chdir(tmp_path)
    paint.paint_ancestry_matrix(p, "c_out")
    saved = native._lib
    try:
        native._lib = None
        paint.paint_ancestry_matrix(p, "py_out")
    finally:
        native._lib = saved
    for sfx in ("chunkcounts.out", "chunklengths.out",
                "regionsquaredchunkcounts.out", "regionchunkcounts.out"):
        assert ((tmp_path / f"c_out.{sfx}").read_text()
                == (tmp_path / f"py_out.{sfx}").read_text()), sfx


def test_impute_vote_parity():
    from pbwt_tpu.algos import impute as himp
    rng = np.random.RandomState(3)
    N = 140
    Xref = mosaic(4, 40, N)
    Xq = mosaic(5, 6, N)
    frame_idx = np.sort(rng.choice(N, N // 2, replace=False))
    vid = registry.variation("A", "C")
    sites = [Site(x=100 + 7 * i, varD=vid) for i in range(N)]

    def build():
        p_ref = PBWT.from_haplotypes(Xref, chrom="1",
                                     sites=[s.copy() for s in sites])
        p_frame = PBWT.from_haplotypes(
            Xref[:, frame_idx], chrom="1",
            sites=[sites[i].copy() for i in frame_idx])
        p_old = PBWT.from_haplotypes(
            Xq[:, frame_idx], chrom="1",
            sites=[sites[i].copy() for i in frame_idx])
        return p_old, p_ref, p_frame

    p_old, p_ref, p_frame = build()
    hc = himp.reference_impute3(p_old, p_ref, p_frame)
    saved = native._lib
    try:
        native._lib = None
        p_old, p_ref, p_frame = build()
        hp = himp.reference_impute3(p_old, p_ref, p_frame)
    finally:
        native._lib = saved
    assert np.array_equal(hc.haplotypes(), hp.haplotypes())
    assert hc.zDosage == hp.zDosage


def test_phase_resolve_parity():
    from pbwt_tpu.algos import phase as ph
    X = mosaic(6, 40, 120)
    p = _mk(X)
    pc = ph.phase(p, 4)
    saved = native._lib
    try:
        native._lib = None
        p2 = _mk(X)
        pp_ = ph.phase(p2, 4)
    finally:
        native._lib = saved
    assert np.array_equal(pc.haplotypes(), pp_.haplotypes())


def test_phase_stop_max_parity():
    from pbwt_tpu.algos.phase import _prefix_stop_max, _suffix_stop_max
    lib = native.get_lib()
    assert lib is not None
    rng = np.random.RandomState(7)
    M = 257
    d = rng.randint(0, 50, size=M + 1).astype(np.int32)
    y = rng.randint(0, 2, size=M).astype(np.uint8)
    for x in (0, 1):
        bp = np.empty(M + 1, np.int64)
        bm = np.empty(M + 1, np.int64)
        lib.phase_stop_max(np.ascontiguousarray(d), y, x, M, bp, bm)
        assert np.array_equal(bp, _suffix_stop_max(d, y, x, M))
        assert np.array_equal(bm, _prefix_stop_max(d, y, x, M))


def test_long_within1_pairs_match_variant2():
    """Algorithm 3 (start-less, matchLongWithin1) reports the same
    unordered {ai, bi} pair set per end position as variant 2."""
    from pbwt_tpu.algos import match as matchmod
    X = mosaic(3, 50, 120)
    p = _mk(X)
    v1, v2 = set(), set()
    matchmod.match_long_within1(
        p, 15, lambda ai, bi, s, e: v1.add((min(ai, bi), max(ai, bi), e))
        if s != e else None)
    matchmod.match_long_within(
        p, 15, lambda ai, bi, s, e: v2.add((min(ai, bi), max(ai, bi), e))
        if s != e else None)
    assert v1 == v2 and v1


def test_max_within_bucketed_equals_row_buffer():
    """The two-pass bucketed collection (paint's memory path,
    native.max_within_bucket_count/_fill) places exactly the rows the
    (n, 4) row-buffer path collects, in the same per-recipient order."""
    from pbwt_tpu.core import native
    X = mosaic(9, 402, 177)
    p = _mk(X)
    a0 = (p.aFstart if p.aFstart is not None
          else np.arange(p.M, dtype=np.int32))
    got = native.max_within_bucketed(p.yz, p.M, p.N, a0)
    if got is None:
        import pytest
        pytest.skip("native library unavailable")
    sj, ss, se, off = got
    rows = native.max_within_packed(p.yz, p.M, p.N, a0)
    rows = rows[np.argsort(rows[:, 0], kind="stable")]
    ref_off = np.zeros(p.M + 1, np.int64)
    np.cumsum(np.bincount(rows[:, 0].astype(np.int64), minlength=p.M),
              out=ref_off[1:])
    assert np.array_equal(off, ref_off)
    assert np.array_equal(sj, rows[:, 1])
    assert np.array_equal(ss, rows[:, 2])
    assert np.array_equal(se, rows[:, 3])


def test_reference_phase4_core_parity():
    """The C lattice core (ref_phase4_core) phases identically to the
    batched-numpy lattice across panel shapes, including tie-heavy
    low-diversity panels."""
    from pbwt_tpu.algos import phase as ph

    for seed, Mref, T, N, founders in [(11, 60, 8, 90, 6),
                                       (12, 37, 6, 120, 3),
                                       (13, 100, 10, 70, 12)]:
        Xref = mosaic(seed, Mref, N, founders=founders)
        Xq = mosaic(seed + 100, T, N, founders=founders)
        p_ref = _mk(Xref)
        p_old = _mk(Xq)
        pc = ph.reference_phase4(p_old, p_ref)
        saved_lib, saved_tried = native._lib, native._tried
        try:
            native._lib = None
            native._tried = True
            p_ref2 = _mk(Xref)
            p_old2 = _mk(Xq)
            pp = ph.reference_phase4(p_old2, p_ref2)
        finally:
            native._lib, native._tried = saved_lib, saved_tried
        assert pc.yz == pp.yz, f"seed {seed}"
        assert np.array_equal(pc.haplotypes(), pp.haplotypes()), f"seed {seed}"


def test_phase_sweep_core_parity():
    """phase() through the C sweep core == the python sweep, across
    shapes including tiny panels and n_sparse > N."""
    from pbwt_tpu.algos import phase as ph

    for seed, M, N, nsp in [(21, 4, 6, 2), (22, 30, 50, 4),
                            (23, 2, 1, 8), (24, 16, 3, 5)]:
        X = mosaic(seed, M, N, founders=max(2, M // 4))
        pc = ph.phase(_mk(X), nsp)
        saved_lib, saved_tried = native._lib, native._tried
        try:
            native._lib = None
            native._tried = True
            pp = ph.phase(_mk(X), nsp)
        finally:
            native._lib, native._tried = saved_lib, saved_tried
        assert pc.yz == pp.yz, (seed, M, N, nsp)
        assert np.array_equal(pc.haplotypes(), pp.haplotypes())


def test_impute_vote_emit_no_segments():
    """Fused impute core with an empty segment set: every entry falls
    back to the frequency vote, matching the numpy path."""
    from pbwt_tpu.algos import impute as impmod

    Xref = mosaic(31, 20, 24)
    Xq = 1 - Xref[:4]                      # nothing matches
    p_ref = _mk(Xref)
    p_frame = _mk(Xref)
    p_old = _mk(Xq)
    pc = impmod.reference_impute3(p_old, p_ref, p_frame)
    saved_lib, saved_tried = native._lib, native._tried
    try:
        native._lib = None
        native._tried = True
        pp = impmod.reference_impute3(_mk(Xq), _mk(Xref), _mk(Xref))
    finally:
        native._lib, native._tried = saved_lib, saved_tried
    assert pc.yz == pp.yz
    assert pc.zDosage == pp.zDosage


def test_corrupt_cores_parity():
    """corruptSites/corruptSamples/copySamples C cores == the python
    loops drawing from an identically-seeded stream."""
    from pbwt_tpu.algos import impute as impmod
    from pbwt_tpu.core import crand

    X = mosaic(41, 14, 30)

    def run_all():
        crand.reset(1)
        a = impmod.corrupt_sites(_mk(X), 0.7, 0.5)
        b = impmod.corrupt_samples(_mk(X), 0.5, 0.5)
        c = impmod.copy_samples(_mk(X), 9, 10.0)
        return a.yz, b.yz, c.yz

    got = run_all()
    saved_lib, saved_tried = native._lib, native._tried
    try:
        native._lib = None
        native._tried = True
        want = run_all()
    finally:
        native._lib, native._tried = saved_lib, saved_tried
    assert got == want
