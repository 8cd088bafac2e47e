import numpy as np
import pytest

from pbwt_tpu.core import engine, pack3 as p3
from pbwt_tpu.core.pbwt import PBWT


def rand_haps(seed, M=24, N=40, maf=0.3):
    rng = np.random.RandomState(seed)
    return (rng.random_sample((M, N)) < maf).astype(np.uint8)


def ref_forwards_ad(a, d, y, k):
    """Direct scalar port of pbwtCursorForwardsAD for cross-checking."""
    M = len(a)
    u = v = 0
    p = q = k + 1
    an = np.empty_like(a)
    dn = np.empty(M + 1, dtype=d.dtype)
    b = np.empty_like(a)
    e = np.empty(M + 1, dtype=d.dtype)
    for i in range(M):
        if d[i] > p:
            p = d[i]
        if d[i] > q:
            q = d[i]
        if y[i] == 0:
            an[u] = a[i]
            dn[u] = p
            u += 1
            p = 0
        else:
            b[v] = a[i]
            e[v] = q
            v += 1
            q = 0
    an[u:] = b[:v]
    dn[u:M] = e[:v]
    dn[0] = k + 2
    dn[M] = k + 2
    return an, dn


@pytest.mark.parametrize("seed", range(6))
def test_forwards_ad_matches_scalar(seed):
    X = rand_haps(seed)
    M, N = X.shape
    a1 = np.arange(M, dtype=np.int32)
    d1 = np.zeros(M + 1, dtype=np.int32)
    d1[0] = d1[M] = 1
    a2, d2 = a1.copy(), d1.copy()
    for k in range(N):
        y = X[a1, k]
        a1, d1 = ref_forwards_ad(a1, d1, y, k)
        a2, d2 = engine.forwards_ad(a2, d2, y, k)
        assert (a1 == a2).all(), k
        assert (d1 == d2).all(), k


def test_backwards_inverts_forwards():
    X = rand_haps(1)
    M, N = X.shape
    a = np.arange(M, dtype=np.int32)
    history = []
    for k in range(N):
        y = X[a, k]
        history.append((a.copy(), y.copy()))
        a = engine.forwards_a(a, y)
    for k in range(N - 1, -1, -1):
        prev_a, y = history[k]
        c = int(np.count_nonzero(y == 0))
        a = engine.backwards_a(a, y, c)
        assert (a == prev_a).all()


def test_build_and_haplotypes_roundtrip():
    X = rand_haps(2, M=30, N=55)
    p = PBWT.from_haplotypes(X)
    assert (p.haplotypes() == X).all()


def test_prefix_array_is_reverse_prefix_sort():
    """a_k is the stable sort order of reversed prefixes (Durbin 2014)."""
    X = rand_haps(3, M=16, N=20)
    M, N = X.shape
    a = np.arange(M, dtype=np.int32)
    for k in range(N):
        a = engine.forwards_a(a, X[a, k])
    # sort haplotypes by reversed prefix x[k-1], x[k-2], ..., x[0]
    keys = [tuple(X[i, ::-1]) for i in range(M)]
    expect = sorted(range(M), key=lambda i: keys[i])
    assert list(a) == expect


def test_reverse_build_roundtrip():
    X = rand_haps(4, M=20, N=30)
    p = PBWT.from_haplotypes(X)
    p.build_reverse()
    # reverse pbwt decodes to the site-reversed haplotypes
    q = PBWT(p.M, p.N)
    q.yz = p.zz
    q.aFstart = p.aRstart
    Xr = q.haplotypes()
    assert (Xr == X[:, ::-1]).all()
    # aRend is the lexicographic sort order of the haplotypes (pbwt.h:45)
    lex = sorted(range(p.M), key=lambda i: tuple(X[i]))
    assert list(p.aRend) == lex


def test_cursor_map_fm_property():
    """cursor_map moves a sorted position to the next column consistent with
    following the haplotype at that position."""
    X = rand_haps(5, M=18, N=25)
    M, N = X.shape
    a = np.arange(M, dtype=np.int32)
    for k in range(N):
        y = X[a, k]
        u, c = engine.calculate_u(y)
        a_next = engine.forwards_a(a, y)
        for i in range(M):
            j = int(engine.cursor_map(u, c, int(y[i]), i))
            assert a_next[j] == a[i]
        a = a_next


def test_sub_range_and_sub_sample():
    X = rand_haps(6, M=12, N=30)
    from pbwt_tpu.core.pbwt import Site
    p = PBWT.from_haplotypes(X, sites=[Site(x=10 * i, varD=0) for i in range(30)])
    q = p.sub_range(5, 20)
    assert q.N == 15
    assert (q.haplotypes() == X[:, 5:20]).all()
    p2 = PBWT.from_haplotypes(X)
    r = p2.sub_sample_interval(2, 6)
    assert r.M == 6
    assert (r.haplotypes() == X[2:8]).all()


def test_write_natural_buffered_matches_unbuffered():
    """The buffered native chunk path (WriteCursor.write_natural ->
    native.build_pbwt_chunk) is byte-identical to per-column packing, and
    a/n/packed() reads mid-stream see flushed state."""
    X = rand_haps(11, M=37, N=300, maf=0.4)
    M, N = X.shape

    u_ref = engine.WriteCursor(M)
    u_ref._use_native = False           # force the per-column python path
    u_buf = engine.WriteCursor(M)
    u_buf._nat_cols = 64                # several flush boundaries over N=300
    for k in range(N):
        u_ref.write_natural(X[:, k])
        u_buf.write_natural(X[:, k])
        if k % 97 == 0:                 # interleaved reads must flush
            assert (u_buf.a == u_ref.a).all()
            assert u_buf.n == u_ref.n
    assert u_buf.packed() == u_ref.packed()
    assert (u_buf.a == u_ref.a).all()


def test_write_natural_buffered_copies_input():
    """Buffered columns must be copied: callers may reuse their buffer."""
    X = rand_haps(12, M=16, N=50)
    u_ref = engine.WriteCursor(16)
    u_ref._use_native = False
    u_buf = engine.WriteCursor(16)
    xbuf = np.empty(16, np.uint8)       # single reused buffer
    for k in range(50):
        xbuf[:] = X[:, k]
        u_ref.write_natural(X[:, k])
        u_buf.write_natural(xbuf)
    assert u_buf.packed() == u_ref.packed()


def test_read_macs_bytes_and_text_identical(tmp_path):
    """read_macs accepts binary or text streams with identical results."""
    from pbwt_tpu.io import textformats
    rng = np.random.RandomState(3)
    M, N = 30, 20
    X = (rng.random_sample((M, N)) < 0.4).astype(np.uint8)
    path = tmp_path / "t.macs"
    with open(path, "w") as f:
        f.write(f"COMMAND:\tmacs {M} 1000000\nSEED:\t1\n")
        for k in range(N):
            f.write(f"SITE:\t{k}\t{k / N:.6f}\t0.5\t"
                    + "".join("01"[v] for v in X[:, k]) + "\n")
    with open(path) as f:
        p_text = textformats.read_macs(f)
    with open(path, "rb") as f:
        p_bin = textformats.read_macs(f)
    assert p_text.yz == p_bin.yz
    assert (p_text.aFend == p_bin.aFend).all()
    assert [s.x for s in p_text.sites] == [s.x for s in p_bin.sites]
    assert (p_bin.haplotypes() == X).all()
