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
    """Grouped packed-word sharded build == host engine, incl. divergence
    and a non-multiple-of-32 site count."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pbwt_tpu.parallel import sharding
    from pbwt_tpu.ops.build import (pack_group_words, prepare_columns,
                                    unpack_bits_host)
    X = rand_haps(3, 48, 45)
    M, N = X.shape
    mesh = sharding.make_mesh(8)
    cols, Mp = prepare_columns(X, multiple=64)
    W_dev = jax.device_put(jnp.asarray(pack_group_words(cols)),
                           NamedSharding(mesh, P(None, "s")))
    ybits, counts, a_end, d_end = sharding.build_scan_sharded_grouped(
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
    assert (unpack_bits_host(np.asarray(ybits[:N]), M) == Ysort).all()
    assert (np.asarray(counts[:N]) == (Ysort == 0).sum(axis=1)
            + (Mp - M) * 0).all()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_divergence_matches_host():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pbwt_tpu.parallel import sharding
    from pbwt_tpu.ops.build import prepare_columns
    X = rand_haps(1, 64, 20)
    M, N = X.shape
    mesh = sharding.make_mesh(8)
    cols, Mp = prepare_columns(X, multiple=64)
    X_dev = jax.device_put(jnp.asarray(cols), NamedSharding(mesh, P(None, "s")))
    ybits, counts, a_end, d_end = sharding.build_scan_sharded(X_dev, mesh)
    a = np.arange(M, dtype=np.int32)
    d = np.zeros(M + 1, dtype=np.int32)
    d[0] = d[M] = 1
    for k in range(N):
        a, d = engine.forwards_ad(a, d, X[a, k], k)
    assert (np.asarray(a_end)[:M] == a).all()
    assert (np.asarray(d_end)[:M] == d[:M]).all()
