import jax
import numpy as np
import pytest

from pbwt_tpu.core import engine


def rand_haps(seed, M, N, maf=0.3):
    rng = np.random.RandomState(seed)
    return (rng.random_sample((M, N)) < maf).astype(np.uint8)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_build_matches_host():
    from pbwt_tpu.parallel import sharding
    X = rand_haps(0, 48, 30)
    mesh = sharding.make_mesh(8)
    yz, a_end, counts = sharding.build_pbwt_sharded(X, mesh)
    yz_host, a_host = engine.build_from_haplotypes(X)
    assert yz == yz_host
    assert (a_end == a_host).all()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_grouped_matches_host():
    """FM natural-ownership sharded build == host engine, incl. divergence
    and a non-multiple-of-32 site count."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pbwt_tpu.parallel import sharding
    from pbwt_tpu.ops.build import pack_group_words, prepare_columns
    X = rand_haps(3, 48, 45)
    M, N = X.shape
    mesh = sharding.make_mesh(8)
    cols, Mp = prepare_columns(X, multiple=32 * 8)
    W_dev = jax.device_put(jnp.asarray(pack_group_words(cols)),
                           NamedSharding(mesh, P(None, "s")))
    sitewords, counts, a_end, d_end = sharding.build_scan_sharded_grouped(
        W_dev, mesh, n_sites=N)
    a = np.arange(M, dtype=np.int32)
    d = np.zeros(M + 1, dtype=np.int32)
    d[0] = d[M] = 1
    Ysort = np.empty((N, M), np.uint8)
    for k in range(N):
        Ysort[k] = X[a, k]
        a, d = engine.forwards_ad(a, d, X[a, k], k)
    assert (np.asarray(a_end)[:M] == a).all()
    assert (np.asarray(d_end)[:M] == d[:M]).all()
    assert (sharding.unpack_words32_host(np.asarray(sitewords[:N]), M)
            == Ysort).all()
    assert (np.asarray(counts[:N]) == (Ysort == 0).sum(axis=1)).all()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_match_records_match_single_device():
    """Query-sharded match scan == single-device match scan, exactly."""
    import jax.numpy as jnp
    from pbwt_tpu.ops import match_jax as mj
    from pbwt_tpu.ops.build import pack_group_words, GROUP
    from pbwt_tpu.parallel import sharding
    from pbwt_tpu.parallel.query_sharding import match_scan_sharded

    rng = np.random.RandomState(5)
    M, N, Q = 96, 70, 16
    Xp = rand_haps(5, M, N, 0.4)
    Xq = np.empty((Q, N), np.uint8)
    for q in range(Q):
        pos = 0
        while pos < N:
            seg = rng.randint(10, 30)
            src = rng.randint(0, M)
            Xq[q, pos:pos + seg] = Xp[src, pos:pos + seg]
            pos += seg

    cols = np.ascontiguousarray(Xp.T)
    W = jnp.asarray(pack_group_words(cols))
    Np = W.shape[0] * GROUP
    qcols = np.ones((Np, Q), np.uint8)
    qcols[:N] = Xq.T
    xp_bits = mj.bitpack_rows(Xp)
    xq_bits = mj.bitpack_rows(Xq)
    xp_words = mj.pack_row_words(xp_bits)
    xq_words = mj.pack_row_words(xq_bits)
    a0 = jnp.arange(M, dtype=jnp.int32)
    args = (W, jnp.asarray(qcols), jnp.asarray(xq_bits),
            jnp.asarray(xp_bits), jnp.asarray(xq_words),
            jnp.asarray(xp_words), a0)

    ref = mj.match_scan(*args)
    mesh = sharding.make_mesh(8)
    got = match_scan_sharded(W, jnp.asarray(qcols), jnp.asarray(xq_bits),
                             jnp.asarray(xp_bits), jnp.asarray(xq_words),
                             jnp.asarray(xp_words), a0, mesh)
    for i in (0, 1, 2, 3):
        assert (np.asarray(got[i]) == np.asarray(ref[i])).all(), i
    for i in (0, 1, 2):
        assert (np.asarray(got[4][i]) == np.asarray(ref[4][i])).all()
    assert (np.asarray(got[5]) == np.asarray(ref[5])).all()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_paint_bitwise_matches_single_device():
    """Site-sharded painting == single-device device paint, bitwise."""
    from pbwt_tpu.algos import match as matchmod
    from pbwt_tpu.core.pbwt import PBWT
    from pbwt_tpu.ops.paint_jax import paint_totals_device
    from pbwt_tpu.parallel import sharding
    from pbwt_tpu.parallel.query_sharding import paint_chunks_sharded

    X = rand_haps(7, 16, 300, 0.4)
    M, N = X.shape
    p = PBWT.from_haplotypes(X)
    mm = [[] for _ in range(M)]
    matchmod.match_maximal_within(
        p, lambda ai, bi, s, e: mm[ai].append((bi, s, e)))
    segs = np.array([(i, j, s, e) for i in range(M)
                     for (j, s, e) in mm[i]], np.int64)
    map_ih = np.arange(M) // 2
    c_ref, l_ref, _, _ = paint_totals_device(segs, M, N, map_ih, chunk=256)
    mesh = sharding.make_mesh(8)
    c_sh, l_sh = paint_chunks_sharded(segs, M, N, map_ih, mesh, chunk=256)
    assert (c_sh == c_ref).all()
    assert (l_sh == l_ref).all()
