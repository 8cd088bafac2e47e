"""Device painting accumulation vs a direct port of the reference loop."""

import numpy as np

from pbwt_tpu.core.pbwt import PBWT
from pbwt_tpu.algos import match as matchmod


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


def host_paint_totals(max_match, M, N, map_ih):
    """Direct scalar port of the pbwtPaint.c:100-137 accumulation."""
    n_inds = int(map_ih.max()) + 1
    counts = np.zeros((M, n_inds))
    lengths = np.zeros((M, n_inds))
    for i in range(M):
        mm = max_match[i] or [(i, 0, 0)]
        m1 = 0
        m_stop = len(mm) - 1
        for k in range(1, N):
            while mm[m1][2] <= k and m1 < m_stop:
                m1 += 1
            ssum = 0.0
            m = m1
            sel = []
            while m <= m_stop and mm[m][1] < k:
                jm, sm, em = mm[m]
                if map_ih[jm] != map_ih[i]:
                    sel.append((jm, sm, em))
                    ssum += (k - sm) * (em - k)
                m += 1
            if ssum:
                for jm, sm, em in sel:
                    w = (k - sm) * (em - k) / ssum
                    lengths[i][map_ih[jm]] += w
                    counts[i][map_ih[jm]] += w / (em - sm)
    return counts, lengths


def test_device_paint_matches_reference_loop():
    from pbwt_tpu.ops.paint_jax import paint_totals_device
    X = mosaic(0, 16, 80)
    M, N = X.shape
    p = PBWT.from_haplotypes(X)
    max_match = [[] for _ in range(M)]
    matchmod.match_maximal_within(
        p, lambda ai, bi, s, e: max_match[ai].append((bi, s, e)))
    map_ih = np.arange(M) // 2
    c_host, l_host = host_paint_totals(max_match, M, N, map_ih)
    segs = np.array([(i, j, s, e) for i in range(M)
                     for (j, s, e) in max_match[i]], np.int64)
    c_dev, l_dev, seg_tot, _ = paint_totals_device(segs, M, N, map_ih,
                                                   chunk=32)
    assert np.allclose(c_dev, c_host, rtol=1e-5, atol=1e-8), \
        np.abs(c_dev - c_host).max()
    assert np.allclose(l_dev, l_host, rtol=1e-5, atol=1e-8)
    # per-segment totals regroup to the same matrices
    regroup = np.zeros_like(c_dev)
    np.add.at(regroup, (segs[:, 0], map_ih[segs[:, 1]]), seg_tot)
    assert np.allclose(regroup, c_dev, rtol=1e-6, atol=1e-9)
    # boundary prefixes: prefix at N equals the segment total; prefix
    # midway splits consistently
    pairs = np.array([(r, N) for r in range(len(segs))]
                     + [(r, N // 2) for r in range(len(segs))], np.int64)
    _, _, seg_tot2, pref = paint_totals_device(segs, M, N, map_ih,
                                               chunk=32, pairs=pairs)
    B = len(segs)
    assert np.allclose(pref[:B], seg_tot2, rtol=1e-5, atol=1e-8)
    assert (pref[B:] <= pref[:B] + 1e-6).all()
