"""Device weighted-vote imputation vs the exact host referenceImpute3."""

import numpy as np

from pbwt_tpu.core import registry
from pbwt_tpu.core.pbwt import PBWT, Site
from pbwt_tpu.algos import impute as himp
from pbwt_tpu.algos import match as matchmod


def mosaic(seed, M, N, founders=6, switch=0.03):
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


def test_device_impute_matches_host():
    from pbwt_tpu.ops.impute_jax import impute_dosages_device
    rng = np.random.RandomState(0)
    N = 120
    Xref = mosaic(1, 40, N)
    Xq = mosaic(2, 6, N)
    vid = registry.variation("A", "C")
    sites = [Site(x=100 + 7 * i, varD=vid) for i in range(N)]
    # target observes only half the sites (the frame)
    frame_idx = np.sort(rng.choice(N, N // 2, replace=False))
    p_ref = PBWT.from_haplotypes(Xref, chrom="1",
                                 sites=[s.copy() for s in sites])
    p_frame = PBWT.from_haplotypes(Xref[:, frame_idx], chrom="1",
                                   sites=[sites[i].copy() for i in frame_idx])
    p_old = PBWT.from_haplotypes(Xq[:, frame_idx], chrom="1",
                                 sites=[sites[i].copy() for i in frame_idx])

    # host path
    p_host = himp.reference_impute3(p_old, p_ref, p_frame)
    X_host = p_host.haplotypes()
    dos_host = np.empty((p_old.M, N))
    Yn = p_host.decoded(True)
    a = p_host.aFstart.copy()
    from pbwt_tpu.core import engine
    for k in range(N):
        d = himp.dosage_retrieve(p_host, Yn[k], k)
        nat = np.empty(p_old.M)
        nat[a] = d
        dos_host[:, k] = nat
        a = engine.forwards_a(a, Yn[k])

    # device path: same segments (collected the same way), dense vote
    segs = []
    max_match = himp._collect_matches(p_frame, p_old, False)
    for j, lst in enumerate(max_match):
        for (jref, s, e) in lst:
            segs.append((j, jref, s, e))
    segments = np.array(segs, np.int64)
    # frame coordinate per reference site: count of frame sites processed
    frame_set = {(sites[i].x, sites[i].varD) for i in frame_idx}
    kold = np.zeros(N, np.int32)
    ko = 0
    for k in range(N):
        if (sites[k].x, sites[k].varD) in frame_set:
            ko += 1
        kold[k] = ko
    ref_freq = Xref.mean(axis=0)
    x_dev, dos_dev, voted = impute_dosages_device(segments, p_old.M, Xref,
                                                  kold, ref_freq)
    assert (x_dev == X_host).all()
    # quantised dosages identical (float path may differ by ulps)
    assert (himp.dosage_encode(dos_dev.reshape(-1))
            == himp.dosage_encode(dos_host.reshape(-1))).all()
