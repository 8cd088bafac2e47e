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
