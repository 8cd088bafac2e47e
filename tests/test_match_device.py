import numpy as np
import pytest

from pbwt_tpu.core.pbwt import PBWT


def mosaic(seed, M, N, founders=5, switch=0.04):
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


def test_segment_matcher_equals_portable():
    """DeviceMatcher's kernel-driven segment path (interpret mode on CPU)
    == the portable match_scan path: same rows, same report order.

    Exercises the production TPU machinery end-to-end: the divergence
    kernel chain, the MXU one-hot FM rank lookups, the compacted matmul
    reset path (Q > qc here) and the windowed reset."""
    from pbwt_tpu.ops import match_jax
    rng = np.random.RandomState(42)
    M, N, Q = 300, 96, 20
    Xp = mosaic(3, M, N)
    Xp[37] = Xp[5]                     # duplicate rows: wide intervals
    Xq = np.empty((Q, N), np.uint8)
    for q in range(Q):
        pos = 0
        while pos < N:
            seg = rng.randint(10, 40)
            src = rng.randint(0, M)
            Xq[q, pos:pos + seg] = Xp[src, pos:pos + seg]
            pos += seg
    rows_seg = np.asarray(match_jax.DeviceMatcher(Xp).match(Xq))
    rows_port = np.asarray(match_jax.match_queries_device(Xp, Xq))
    assert np.array_equal(rows_seg, rows_port)


@pytest.mark.parametrize("seed,M", [(0, 24), (1, 30)])  # M=30: not lane-aligned
def test_device_match_equals_indexed(seed, M):
    from pbwt_tpu.algos import match as matchmod
    from pbwt_tpu.ops import match_jax
    Xp = mosaic(seed, M, 64)
    Xq = mosaic(seed + 10, 5, 64)
    rows_dev = match_jax.match_queries_device(Xp, Xq)
    p = PBWT.from_haplotypes(Xp)
    q = PBWT.from_haplotypes(Xq)
    rows_host = []
    matchmod.match_sequences_indexed(p, q,
                                     lambda a, b, s, e: rows_host.append((a, b, s, e)))
    dev = sorted(tuple(r) for r in np.asarray(rows_dev).tolist()
                 if r[2] != r[3])
    host = sorted(r for r in rows_host if r[2] != r[3])
    assert dev == host
