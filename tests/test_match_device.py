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


def test_trajectory_matcher_equals_interleaved(monkeypatch):
    """The standing-panel trajectory path (panel tables precomputed once,
    match_scan_indexed per query batch) == the interleaved per-segment
    panel advance: same rows, same order, including reuse of one matcher
    across several query batches of different Q."""
    from pbwt_tpu.ops import match_jax
    rng = np.random.RandomState(9)
    M, N = 300, 96
    Xp = mosaic(5, M, N)
    Xp[11] = Xp[200]
    def queries(Q, seed):
        r = np.random.RandomState(seed)
        Xq = np.empty((Q, N), np.uint8)
        for q in range(Q):
            pos = 0
            while pos < N:
                seg = r.randint(10, 40)
                Xq[q, pos:pos + seg] = Xp[r.randint(0, M), pos:pos + seg]
                pos += seg
        return Xq
    m_traj = match_jax.DeviceMatcher(Xp)
    assert m_traj.traj is not None
    monkeypatch.setenv("PBWT_TPU_TRAJ_BYTES", "0")
    m_seg = match_jax.DeviceMatcher(Xp)
    assert m_seg.traj is None
    for Q, seed in [(20, 1), (7, 2), (20, 3)]:
        Xq = queries(Q, seed)
        assert np.array_equal(np.asarray(m_traj.match(Xq)),
                              np.asarray(m_seg.match(Xq)))


def test_segment_matcher_blocked_kernel(monkeypatch):
    """The block-processed divergence kernel (the M > 512k panel path)
    produces the exact same rows as the monolithic kernel path."""
    from pbwt_tpu.ops import match_jax
    rng = np.random.RandomState(7)
    M, N, Q = 300, 64, 8
    Xp = mosaic(11, M, N)
    Xq = np.empty((Q, N), np.uint8)
    for q in range(Q):
        pos = 0
        while pos < N:
            seg = rng.randint(10, 40)
            Xq[q, pos:pos + seg] = Xp[rng.randint(0, M), pos:pos + seg]
            pos += seg
    rows_mono = np.asarray(match_jax.DeviceMatcher(Xp).match(Xq))
    # force the blocked path: rmax below R=32, block floor lowered to 8
    monkeypatch.setenv("PBWT_TPU_KERNEL_RMAX", "2")
    monkeypatch.setenv("PBWT_TPU_BLOCK_RB", "8")
    match_jax.match_scan_segment.clear_cache()
    match_jax.panel_trajectory.clear_cache()
    try:
        rows_blk = np.asarray(match_jax.DeviceMatcher(Xp).match(Xq))
    finally:
        match_jax.match_scan_segment.clear_cache()
        match_jax.panel_trajectory.clear_cache()
    assert np.array_equal(rows_mono, rows_blk)


def test_from_pbwt_equals_dense():
    """DeviceMatcher.from_pbwt (pack3-streamed panel upload, O(M*chunk)
    host bytes) builds the exact same device state as the dense
    constructor: identical rows, including a ragged (non-multiple-of-
    chunk) site count and a non-identity aFstart."""
    from pbwt_tpu.ops import match_jax
    rng = np.random.RandomState(13)
    M, N, Q = 300, 100, 12            # N=100: ragged vs chunk_sites=32
    Xp = mosaic(17, M, N)
    Xq = np.empty((Q, N), np.uint8)
    for q in range(Q):
        pos = 0
        while pos < N:
            seg = rng.randint(10, 40)
            Xq[q, pos:pos + seg] = Xp[rng.randint(0, M), pos:pos + seg]
            pos += seg
    p = PBWT.from_haplotypes(Xp)
    m_stream = match_jax.DeviceMatcher.from_pbwt(p, chunk_sites=32)
    m_dense = match_jax.DeviceMatcher(Xp)
    assert np.array_equal(np.asarray(m_stream.match(Xq)),
                          np.asarray(m_dense.match(Xq)))


def test_blocked_partition_step_parity():
    """partition_ad_step_blocked == partition_ad_step on random planes,
    including skewed all-zero/all-one key columns."""
    import jax.numpy as jnp
    from pbwt_tpu.ops.partition_pallas import (partition_ad_step,
                                               partition_ad_step_blocked)
    rng = np.random.RandomState(0)
    R, Rb = 96, 32
    Mp = R * 128
    a = rng.permutation(Mp).astype(np.int32).reshape(R, 128)
    d = rng.randint(0, 50, size=(R, 128)).astype(np.int32)
    planes = [rng.randint(-2 ** 31, 2 ** 31 - 1, size=(R, 128),
                          dtype=np.int64).astype(np.int32),
              np.zeros((R, 128), np.int32),
              np.full((R, 128), -1, np.int32)]
    for w in planes:
        for s, kk in [(0, 7), (31, 0)]:
            ref = partition_ad_step(jnp.asarray(a), jnp.asarray(d),
                                    jnp.asarray(w), s, kk, interpret=True)
            got = partition_ad_step_blocked(jnp.asarray(a), jnp.asarray(d),
                                            jnp.asarray(w), s, kk, rb=Rb,
                                            interpret=True)
            for r, g in zip(ref, got):
                assert np.array_equal(np.asarray(r), np.asarray(g))


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
