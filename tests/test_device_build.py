import numpy as np
import pytest

from pbwt_tpu.core import engine
from pbwt_tpu.core.pbwt import PBWT


def rand_haps(seed, M, N, maf=0.3):
    rng = np.random.RandomState(seed)
    return (rng.random_sample((M, N)) < maf).astype(np.uint8)


@pytest.mark.parametrize("seed,M,N", [(0, 24, 40), (1, 24, 40)])
def test_device_build_matches_host(seed, M, N):
    from pbwt_tpu.ops import build as dbuild
    X = rand_haps(seed, M, N)
    yz_host, a_host = engine.build_from_haplotypes(X)
    yz_dev, a_dev, counts = dbuild.build_pbwt_device(X, multiple=8)
    assert yz_dev == yz_host
    assert (a_dev == a_host).all()
    Y = PBWT.from_haplotypes(X).decoded(True)
    assert (counts[: N] == (Y == 0).sum(axis=1)).all()


def test_device_divergence_matches_host():
    from pbwt_tpu.ops import build as dbuild
    import jax.numpy as jnp
    X = rand_haps(3, 40, 30)
    M, N = X.shape
    cols, Mp = dbuild.prepare_columns(X, multiple=8)
    ybits, counts, a_end, d_end = dbuild.build_scan(
        jnp.asarray(cols), jnp.arange(Mp, dtype=jnp.int32))
    # host reference
    a = np.arange(M, dtype=np.int32)
    d = np.zeros(M + 1, dtype=np.int32)
    d[0] = d[M] = 1
    for k in range(N):
        y = X[a, k]
        a, d = engine.forwards_ad(a, d, y, k)
    assert (np.asarray(a_end)[:M] == a).all()
    # device d has no d[M] sentinel; compare entries 0..M-1
    assert (np.asarray(d_end)[:M] == d[:M]).all()


@pytest.mark.parametrize("seed,M,N", [(5, 24, 40), (6, 16, 70), (7, 32, 32)])
def test_grouped_build_matches_ungrouped(seed, M, N):
    """Grouped packed-word build == per-site build, incl. non-multiple-of-32
    site counts and the divergence payload path."""
    from pbwt_tpu.ops import build as dbuild
    import jax.numpy as jnp
    X = rand_haps(seed, M, N)
    cols, Mp = dbuild.prepare_columns(X, multiple=8)
    a0 = jnp.arange(Mp, dtype=jnp.int32)
    ref = dbuild.build_scan(jnp.asarray(cols), a0, with_divergence=True)
    W = jnp.asarray(dbuild.pack_group_words(cols))
    got = dbuild.build_scan_grouped(W, a0, with_divergence=True, n_sites=N)
    assert (np.asarray(got[0])[:N] == np.asarray(ref[0])).all()   # ybits
    assert (np.asarray(got[1])[:N] == np.asarray(ref[1])).all()   # counts
    assert (np.asarray(got[2]) == np.asarray(ref[2])).all()       # a_end
    assert (np.asarray(got[3]) == np.asarray(ref[3])).all()       # d_end

    got_nd = dbuild.build_scan_grouped(W, a0, with_divergence=False)
    assert (np.asarray(got_nd[0])[:N] == np.asarray(ref[0])).all()
    assert (np.asarray(got_nd[2]) == np.asarray(ref[2])).all()


def test_pallas_partition_matches_reference():
    """Pallas group partition kernel (interpret mode on CPU) == the host
    LSD-radix chain: permutation, per-site packed columns, counts."""
    from pbwt_tpu.ops import partition_pallas as pp
    import jax.numpy as jnp
    M = 4096
    R = M // 128
    rng = np.random.RandomState(11)
    w0 = rng.randint(0, 2**32, size=M, dtype=np.uint32).astype(np.int32)
    a0 = np.arange(M, dtype=np.int32)
    a_o, w_o, ywords, cnts = pp.group_partition(
        jnp.asarray(w0.reshape(R, 128)), jnp.asarray(a0.reshape(R, 128)),
        interpret=True)
    ycols = pp.unpack_sitewords_host(np.asarray(ywords), M)
    a = a0.copy(); w = w0.copy()
    for s in range(32):
        k = (w >> s) & 1
        assert np.array_equal(ycols[s], k.astype(np.uint8)), f"site {s}"
        assert int(cnts[s]) == int((k == 0).sum())
        order = np.concatenate([np.nonzero(k == 0)[0], np.nonzero(k == 1)[0]])
        a, w = a[order], w[order]
    assert np.array_equal(np.asarray(a_o).reshape(-1), a)
    assert np.array_equal(np.asarray(w_o).reshape(-1), w)


def test_pallas_partition_edge_columns():
    """All-zero / all-one / alternating columns through the Pallas kernel."""
    from pbwt_tpu.ops import partition_pallas as pp
    import jax.numpy as jnp
    M = 4096
    R = M // 128
    a0 = np.arange(M, dtype=np.int32)
    for w0 in [np.zeros(M, np.int32), np.full(M, -1, np.int32),
               np.tile(np.array([0x55555555, 0], np.int32), M // 2)[:M]]:
        a_o, w_o, ywords, cnts = pp.group_partition(
            jnp.asarray(w0.reshape(R, 128)), jnp.asarray(a0.reshape(R, 128)),
            interpret=True)
        a = a0.copy(); w = w0.copy()
        for s in range(32):
            k = (w >> s) & 1
            assert int(cnts[s]) == int((k == 0).sum())
            order = np.concatenate([np.nonzero(k == 0)[0],
                                    np.nonzero(k == 1)[0]])
            a, w = a[order], w[order]
        assert np.array_equal(np.asarray(a_o).reshape(-1), a)


def test_pallas_ad_partition_matches_engine():
    """Divergence-carrying Pallas step (interpret mode) == host forwards_ad,
    including the FM rank table and zero counts."""
    from pbwt_tpu.ops import partition_pallas as pp
    import jax.numpy as jnp
    M = 4096
    R = M // 128
    rng = np.random.RandomState(5)
    w = rng.randint(0, 2**32, size=M, dtype=np.uint32).astype(np.int32)
    a = np.arange(M, dtype=np.int32)
    d = np.zeros(M + 1, dtype=np.int32)
    d[0] = d[M] = 1
    aj = jnp.asarray(a.reshape(R, 128))
    dj = jnp.asarray(d[:M].reshape(R, 128))
    wj = jnp.asarray(w.reshape(R, 128))
    for k in range(4):
        a2, d2, w2, u, cnt = pp.partition_ad_step(aj, dj, wj, k, k,
                                                  interpret=True)
        key = ((w >> k) & 1).astype(np.uint8)
        exp_u = np.concatenate([[0], np.cumsum(key == 0)])[:M]
        assert np.array_equal(np.asarray(u).reshape(-1), exp_u)
        assert int(cnt[0]) == int((key == 0).sum())
        a, d = engine.forwards_ad(a, d, key, k)
        order = np.concatenate([np.nonzero(key == 0)[0],
                                np.nonzero(key == 1)[0]])
        w = w[order]
        assert np.array_equal(np.asarray(a2).reshape(-1), a)
        assert np.array_equal(np.asarray(d2).reshape(-1), d[:M])
        aj, dj, wj = a2, d2, w2


def test_panel_words_from_bits_roundtrip():
    """Device word derivation from bit-packed rows == host pack_group_words."""
    from pbwt_tpu.ops import build as dbuild
    from pbwt_tpu.ops import match_jax as mj
    import jax.numpy as jnp
    rng = np.random.RandomState(9)
    M, N = 256, 70
    X = (rng.random_sample((M, N)) < 0.4).astype(np.uint8)
    Ng = (N + 31) // 32
    bits = mj.bitpack_rows(X)
    pad = np.zeros((M, 4 * Ng), np.uint8)
    pad[:, :bits.shape[1]] = bits
    W_dev = np.asarray(mj._panel_words_from_bits(jnp.asarray(pad)))
    # host: pad sites with ZEROS to match the device convention
    cols = np.zeros((Ng * 32, M), np.uint8)
    cols[:N] = X.T
    W_host = dbuild.pack_group_words(cols[:N])
    # pack_group_words pads with ones; rebuild zero-padded words directly
    Wz = np.zeros((Ng, M), np.uint32)
    for t in range(Ng):
        for s in range(32):
            k = 32 * t + s
            if k < N:
                Wz[t] |= X[:, k].astype(np.uint32) << np.uint32(s)
    assert np.array_equal(W_dev.astype(np.uint32), Wz)


def test_padding_rows_stay_at_end():
    from pbwt_tpu.ops import build as dbuild
    import jax.numpy as jnp
    X = rand_haps(4, 10, 25)
    cols, Mp = dbuild.prepare_columns(X, multiple=16)
    assert Mp == 16
    _, _, a_end, _ = dbuild.build_scan(jnp.asarray(cols),
                                       jnp.arange(Mp, dtype=jnp.int32))
    assert set(np.asarray(a_end)[10:].tolist()) == set(range(10, 16))
