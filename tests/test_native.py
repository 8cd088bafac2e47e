"""Native C runtime vs numpy fallback parity."""

import numpy as np
import pytest

from pbwt_tpu.core import engine, native, pack3 as p3
from pbwt_tpu.core.pbwt import PBWT


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def mosaic(seed, M, N, founders=5, switch=0.05):
    rng = np.random.RandomState(seed)
    F = (rng.random_sample((founders, N)) < 0.4).astype(np.uint8)
    X = np.empty((M, N), np.uint8)
    for i in range(M):
        f = rng.randint(founders)
        for k in range(N):
            if rng.random_sample() < switch:
                f = rng.randint(founders)
            X[i, k] = F[f, k]
    return X


def test_build_parity():
    X = mosaic(0, 40, 80)
    a0 = np.arange(40, dtype=np.int32)
    yz_nat, a_nat = native.build_pbwt(np.ascontiguousarray(X.T), a0)
    # pure python path
    a = a0.copy()
    Ysort = np.empty((80, 40), np.uint8)
    for k in range(80):
        y = X[a, k]
        Ysort[k] = y
        a = engine.forwards_a(a, y)
    yz_py, _ = p3.pack_columns(Ysort)
    assert yz_nat == yz_py
    assert (a_nat == a).all()


def test_codec_parity():
    X = mosaic(1, 30, 50)
    p = PBWT.from_haplotypes(X)
    Y_py, _ = p3.unpack_all(p.yz, p.M, p.N)
    Y_nat = native.decode_cols(p.yz, p.N, p.M)
    assert (Y_py == Y_nat).all()
    enc, offs = native.encode_cols(Y_py)
    assert enc == bytes(p.yz)


def _py_max_within(p):
    """Force the numpy implementation by bypassing the native fast path."""
    import pbwt_tpu.algos.match as m
    out = []
    orig = native.max_within
    native.max_within = lambda *a, **k: None
    try:
        m.match_maximal_within(p, lambda *r: out.append(tuple(r)))
    finally:
        native.max_within = orig
    return out


def test_max_within_parity():
    X = mosaic(2, 24, 60)
    p = PBWT.from_haplotypes(X)
    rows = native.max_within(p.decoded(True), p.aFstart)
    got_native = [tuple(r) for r in rows.tolist()]
    got_py = _py_max_within(p)
    assert got_native == got_py


def test_sweep_parity():
    import pbwt_tpu.algos.match as m
    Xp = mosaic(3, 30, 70)
    Xq = mosaic(4, 6, 70)
    p = PBWT.from_haplotypes(Xp)
    q = PBWT.from_haplotypes(Xq)
    nat = []
    m.match_sequences_sweep(p, q, lambda *r: nat.append(tuple(r)))
    py = []
    orig = native.sweep_match
    native.sweep_match = lambda *a, **k: None
    try:
        m.match_sequences_sweep(p, q, lambda *r: py.append(tuple(r)))
    finally:
        native.sweep_match = orig
    assert nat == py
