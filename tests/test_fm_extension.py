"""Packed FM-extension primitives vs the cursor engine and the reference.

The expected table below was captured from a C harness calling the
reference's extendMatchForwards (pbwtCore.c:320-357) on the column
[0,0,1,1,0,1,0,0].  Note the reference maps interval bounds whose
containing run has the non-matching symbol to conservative block counts
(not standard FM ranks); intervals with no matching symbol collapse to
f' >= g'.  We reproduce that behaviour bit-exactly.
"""

import numpy as np

from pbwt_tpu.core import engine, pack3 as p3
from pbwt_tpu.core.pbwt import PBWT

REF_COLUMN = np.array([0, 0, 1, 1, 0, 1, 0, 0], np.uint8)
REF_TABLE = [
    (0, 0, 1, 0, 1),
    (0, 0, 2, 0, 2),
    (0, 0, 3, 0, 2),
    (0, 0, 4, 0, 2),
    (0, 0, 5, 0, 3),
    (0, 0, 6, 0, 3),
    (0, 0, 7, 0, 4),
    (0, 0, 8, 0, 5),
    (0, 1, 2, 1, 2),
    (0, 1, 3, 1, 2),
    (0, 1, 4, 1, 2),
    (0, 1, 5, 1, 3),
    (0, 1, 6, 1, 3),
    (0, 1, 7, 1, 4),
    (0, 1, 8, 1, 5),
    (0, 2, 3, 2, 2),
    (0, 2, 4, 2, 2),
    (0, 2, 5, 2, 3),
    (0, 2, 6, 2, 3),
    (0, 2, 7, 2, 4),
    (0, 2, 8, 2, 5),
    (0, 3, 4, 2, 2),
    (0, 3, 5, 2, 3),
    (0, 3, 6, 2, 3),
    (0, 3, 7, 2, 4),
    (0, 3, 8, 2, 5),
    (0, 4, 5, 2, 3),
    (0, 4, 6, 2, 3),
    (0, 4, 7, 2, 4),
    (0, 4, 8, 2, 5),
    (0, 5, 6, 3, 3),
    (0, 5, 7, 3, 4),
    (0, 5, 8, 3, 5),
    (0, 6, 7, 3, 4),
    (0, 6, 8, 3, 5),
    (0, 7, 8, 4, 5),
    (1, 0, 1, 7, 7),
    (1, 0, 2, 7, 5),
    (1, 0, 3, 7, 6),
    (1, 0, 4, 7, 8),
    (1, 0, 5, 7, 7),
    (1, 0, 6, 7, 10),
    (1, 0, 7, 7, 10),
    (1, 0, 8, 7, 8),
    (1, 1, 2, 7, 5),
    (1, 1, 3, 7, 6),
    (1, 1, 4, 7, 8),
    (1, 1, 5, 7, 7),
    (1, 1, 6, 7, 10),
    (1, 1, 7, 7, 10),
    (1, 1, 8, 7, 8),
    (1, 2, 3, 5, 6),
    (1, 2, 4, 5, 8),
    (1, 2, 5, 5, 7),
    (1, 2, 6, 5, 10),
    (1, 2, 7, 5, 10),
    (1, 2, 8, 5, 8),
    (1, 3, 4, 6, 8),
    (1, 3, 5, 6, 7),
    (1, 3, 6, 6, 10),
    (1, 3, 7, 6, 10),
    (1, 3, 8, 6, 8),
    (1, 4, 5, 8, 7),
    (1, 4, 6, 8, 10),
    (1, 4, 7, 8, 10),
    (1, 4, 8, 8, 8),
    (1, 5, 6, 7, 10),
    (1, 5, 7, 7, 10),
    (1, 5, 8, 7, 8),
    (1, 6, 7, 10, 10),
    (1, 6, 8, 10, 8),
    (1, 7, 8, 10, 8),
]


def test_extend_match_forwards_matches_reference_table():
    yz = p3.pack3(REF_COLUMN)
    for x, f, g, ff, gg in REF_TABLE:
        f2, g2, used = p3.extend_match_forwards(yz, 8, x, f, g)
        assert (f2, g2) == (ff, gg), (x, f, g)
        assert used == len(yz)


def test_extend_packed_forwards_matches_cursor_map():
    rng = np.random.RandomState(0)
    X = (rng.random_sample((30, 25)) < 0.4).astype(np.uint8)
    p = PBWT.from_haplotypes(X)
    Y, offs = p3.unpack_all(p.yz, p.M, p.N)
    for k in range(p.N):
        y = Y[k]
        u, c = engine.calculate_u(y)
        for f in range(p.M):
            f2, val, used = p3.extend_packed_forwards(p.yz, p.M, f,
                                                      int(offs[k]))
            assert val == y[f]
            assert f2 == int(engine.cursor_map(u, c, int(y[f]), f))
            assert used == int(offs[k + 1] - offs[k])


def test_extend_packed_backwards_inverts_forwards():
    rng = np.random.RandomState(2)
    X = (rng.random_sample((20, 15)) < 0.4).astype(np.uint8)
    p = PBWT.from_haplotypes(X)
    Y, offs = p3.unpack_all(p.yz, p.M, p.N)
    for k in range(p.N):
        y = Y[k]
        u, c = engine.calculate_u(y)
        for f in range(p.M):
            f2, val, _ = p3.extend_packed_forwards(p.yz, p.M, f, int(offs[k]))
            fb, vb, start = p3.extend_packed_backwards(p.yz, p.M, f2, c,
                                                       int(offs[k + 1]))
            assert fb == f and vb == val
            assert start == int(offs[k])
