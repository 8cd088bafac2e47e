"""Sample-sharded PBWT construction over a jax.sharding Mesh.

The reference is single-threaded (SURVEY.md section 2: no parallelism of any
kind); this module *introduces* the TPU-native scale-out path: the M
haplotypes are sharded over a mesh axis "s" and the per-site counting sort
becomes one distributed radix step:

  per site k (inside a lax.scan, inside shard_map):
    1. all_gather the k-th allele column (M bits) over ICI,
    2. each shard partitions its position-block of the prefix array locally,
    3. shard-local 0/1 counts are combined (all_gather + cumsum) into global
       bucket offsets - the "merge of shard-local counts c" collective,
    4. each shard scatters its block to global destination positions; a
       psum over one-hot contributions materialises the new prefix array.

Divergence arrays are updated with the same segmented-max scan as the
single-chip path (replicated compute; the collectives above carry the
communication-heavy part).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.build import _segmented_running_max, bitpack_column


def make_mesh(n_devices: int | None = None, axis: str = "s") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _sharded_step(a, d, col_local, k, *, axis, n_shards, Mp):
    """One distributed column update. a, d replicated (Mp,); col_local is
    this shard's slice of the allele column (Mp/n,)."""
    B = Mp // n_shards
    r = jax.lax.axis_index(axis)
    col = jax.lax.all_gather(col_local, axis, tiled=True)       # (Mp,) over ICI

    a_blk = jax.lax.dynamic_slice(a, (r * B,), (B,))
    y_blk = col[a_blk]
    mask0 = y_blk == 0
    n0_local = jnp.sum(mask0, dtype=jnp.int32)
    n1_local = B - n0_local
    n0_all = jax.lax.all_gather(n0_local, axis)                 # (n,)
    n1_all = jax.lax.all_gather(n1_local, axis)
    c = jnp.sum(n0_all)                                         # global zeros
    off0 = jnp.cumsum(n0_all) - n0_all                          # exclusive
    off1 = jnp.cumsum(n1_all) - n1_all
    rank0 = jnp.cumsum(mask0) - mask0                           # exclusive local
    rank1 = jnp.cumsum(~mask0) - (~mask0)
    pos_blk = jnp.where(mask0, off0[r] + rank0, c + off1[r] + rank1)

    # materialise the new replicated prefix array: scatter + psum
    a_contrib = jnp.zeros(Mp, a.dtype).at[pos_blk].set(a_blk)
    a_new = jax.lax.psum(a_contrib, axis)

    # divergence: needs the full sorted column; gather blocks by position
    y_full = jax.lax.all_gather(y_blk, axis, tiled=True)        # (Mp,) sorted order
    kk = jnp.asarray(k, d.dtype)
    m0 = y_full == 0
    prev0 = jnp.concatenate([jnp.zeros(1, bool), m0[:-1]])
    prev1 = jnp.concatenate([jnp.zeros(1, bool), (~m0)[:-1]])
    seed = d.at[0].max(kk + 1)
    p = _segmented_running_max(seed, prev0)
    q = _segmented_running_max(seed, prev1)
    r0 = jnp.cumsum(m0)
    idx = jnp.arange(Mp, dtype=r0.dtype)
    pos_all = jnp.where(m0, r0 - 1, c + (idx + 1 - r0) - 1)
    d_new = jnp.zeros_like(d).at[pos_all].set(jnp.where(m0, p, q))
    d_new = d_new.at[0].set(kk + 2)
    return a_new, d_new, y_blk, c


def _sharded_group_step(a_blk, w_blk, d, w_nat_local, k0, *, axis, n_shards,
                        Mp, with_divergence):
    """One 32-site packed-word group, distributed. a_blk/w_blk are this
    shard's position-block of the prefix array and its packed words (sort
    order); w_nat_local is the shard's natural-order slice of the group's
    words."""
    from ..ops.build import GROUP
    B = Mp // n_shards
    r = jax.lax.axis_index(axis)
    w_full = jax.lax.all_gather(w_nat_local, axis, tiled=True)   # (Mp,) int32
    w_blk = w_full[a_blk]                    # align words to sort order
    ybits, counts = [], []
    for s in range(GROUP):
        key = ((w_blk >> s) & 1).astype(jnp.uint8)
        mask0 = key == 0
        n0_local = jnp.sum(mask0, dtype=jnp.int32)
        n1_local = B - n0_local
        n0_all = jax.lax.all_gather(n0_local, axis)              # (n,)
        n1_all = jax.lax.all_gather(n1_local, axis)
        c = jnp.sum(n0_all)
        off0 = jnp.cumsum(n0_all) - n0_all
        off1 = jnp.cumsum(n1_all) - n1_all
        rank0 = jnp.cumsum(mask0) - mask0
        rank1 = jnp.cumsum(~mask0) - (~mask0)
        pos_blk = jnp.where(mask0, off0[r] + rank0, c + off1[r] + rank1)
        # move (a, w) payloads to their destination shards: scatter + psum
        a_new = jax.lax.psum(
            jnp.zeros(Mp, a_blk.dtype).at[pos_blk].set(a_blk), axis)
        w_new = jax.lax.psum(
            jnp.zeros(Mp, w_blk.dtype).at[pos_blk].set(w_blk), axis)
        ybits.append(bitpack_column(key))
        counts.append(c.astype(jnp.int32))
        if with_divergence:
            y_full = jax.lax.all_gather(key, axis, tiled=True)
            kk = jnp.asarray(k0 + s, d.dtype)
            m0 = y_full == 0
            prev0 = jnp.concatenate([jnp.zeros(1, bool), m0[:-1]])
            prev1 = jnp.concatenate([jnp.zeros(1, bool), (~m0)[:-1]])
            seed = d.at[0].max(kk + 1)
            p = _segmented_running_max(seed, prev0)
            q = _segmented_running_max(seed, prev1)
            r0 = jnp.cumsum(m0)
            idx = jnp.arange(Mp, dtype=r0.dtype)
            pos_all = jnp.where(m0, r0 - 1, c + (idx + 1 - r0) - 1)
            d = jnp.zeros_like(d).at[pos_all].set(jnp.where(m0, p, q))
            d = d.at[0].set(kk + 2)
        a_blk = jax.lax.dynamic_slice(a_new, (r * B,), (B,))
        w_blk = jax.lax.dynamic_slice(w_new, (r * B,), (B,))
    return a_blk, w_blk, d, jnp.stack(ybits), jnp.stack(counts)


def build_scan_sharded_grouped(W, mesh: Mesh, axis: str = "s",
                               with_divergence: bool = True,
                               n_sites: int | None = None):
    """Grouped packed-word sharded construction (the production scale-out
    path, mirroring ops/build.build_scan_grouped shard-by-shard).

    W: (Ng, Mp) int32 group words (ops/build.pack_group_words), sharded
    over the haplotype axis. Returns (ybits (Ng*32, Mp//8) position-sharded,
    counts, a_end (Mp,), d_end).
    """
    from ..ops.build import GROUP
    Ng, Mp = W.shape
    n_shards = mesh.shape[axis]
    assert Mp % (8 * n_shards) == 0 and (Mp // n_shards) % 8 == 0

    def shard_fn(Wl):            # (Ng, Mp/n) natural-order words, this shard
        B = Mp // n_shards
        r = jax.lax.axis_index(axis)
        a0 = jax.lax.dynamic_slice(jnp.arange(Mp, dtype=jnp.int32),
                                   (r * B,), (B,))
        w0 = jax.lax.pcast(jnp.zeros(B, dtype=jnp.int32), (axis,),
                           to="varying")
        d0 = jnp.zeros(Mp, dtype=jnp.int32).at[0].set(1)
        d0 = jax.lax.pcast(d0, (axis,), to="varying")

        def step(carry, w_nat_local):
            a_blk, w_blk, d, k = carry
            a_blk, w_blk, d, yb, cnts = _sharded_group_step(
                a_blk, w_blk, d, w_nat_local, k, axis=axis,
                n_shards=n_shards, Mp=Mp, with_divergence=with_divergence)
            return (a_blk, w_blk, d, k + GROUP), (yb, cnts)

        (a_blk, _, d_end, _), (ybits, counts) = jax.lax.scan(
            step, (a0, w0, d0, jnp.int32(0)), Wl)
        return (ybits.reshape(Ng * GROUP, B // 8), counts.reshape(Ng * GROUP),
                a_blk, d_end)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=P(None, axis),
                       out_specs=(P(None, axis), P(axis), P(axis), P(axis)))
    ybits, counts_all, a_end, d_end_all = fn(W)
    counts = counts_all.reshape(n_shards, Ng * GROUP)[0]
    d_end = d_end_all.reshape(n_shards, Mp)[0]
    if with_divergence and n_sites is not None and n_sites % GROUP:
        # trailing all-ones pad sites only advance the d[0] = k+2 sentinel
        d_end = jnp.asarray(d_end).at[0].set(n_sites + 1)
    return ybits, counts, a_end.reshape(Mp), d_end


def build_scan_sharded(X_cols, mesh: Mesh, axis: str = "s"):
    """Sharded construction: X_cols (N, Mp) sharded over haplotypes.

    Returns (Ybits (N, Mp//8) position-sharded, counts (N,), a_end, d_end).
    """
    N, Mp = X_cols.shape
    n_shards = mesh.shape[axis]
    assert Mp % (8 * n_shards) == 0

    def shard_fn(Xl):            # Xl: (N, Mp/n) this shard's haplotype lanes
        a0 = jnp.arange(Mp, dtype=jnp.int32)
        d0 = jnp.zeros(Mp, dtype=jnp.int32).at[0].set(1)
        # the d carry is rebuilt from all_gather'd data each step, which marks
        # it device-varying under shard_map's manual-axes tracking (the a
        # carry comes out of a psum and stays replicated)
        d0 = jax.lax.pcast(d0, (axis,), to="varying")

        def step(carry, col_local):
            a, d, k = carry
            a_new, d_new, y_blk, c = _sharded_step(
                a, d, col_local, k, axis=axis, n_shards=n_shards, Mp=Mp)
            return (a_new, d_new, k + 1), (bitpack_column(y_blk),
                                           c.astype(jnp.int32))

        (a_end, d_end, _), (ybits, counts) = jax.lax.scan(
            step, (a0, d0, jnp.int32(0)), Xl)
        return ybits, counts, a_end, d_end

    # counts/d_end are computed identically on every shard but derive from
    # all_gather'd (device-varying) values, so they are emitted per-shard
    # (out_specs P(axis)) and deduplicated on the host
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=P(None, axis),
                       out_specs=(P(None, axis), P(axis), P(), P(axis)))
    ybits, counts_all, a_end, d_end_all = fn(X_cols)
    counts = counts_all.reshape(n_shards, N)[0]
    d_end = d_end_all.reshape(n_shards, Mp)[0]
    return ybits, counts, a_end, d_end


def build_pbwt_sharded(X: np.ndarray, mesh: Mesh | None = None,
                       axis: str = "s"):
    """End-to-end sharded build from an (M, N) haplotype matrix; returns
    (yz bytes, aFend, counts) byte-identical to the host engine."""
    from ..core import pack3 as p3
    from ..ops.build import pack_group_words, prepare_columns, unpack_bits_host
    if mesh is None:
        mesh = make_mesh()
    n = mesh.shape[axis]
    M, N = X.shape
    cols, Mp = prepare_columns(X, multiple=8 * n)
    sharding = NamedSharding(mesh, P(None, axis))
    W_dev = jax.device_put(jnp.asarray(pack_group_words(cols)), sharding)
    ybits, counts, a_end, _ = build_scan_sharded_grouped(
        W_dev, mesh, axis, with_divergence=False)
    ybits, counts = ybits[:N], counts[:N]
    Ysort = unpack_bits_host(np.asarray(ybits), M)
    yz, _ = p3.pack_columns(Ysort)
    return yz, np.asarray(a_end)[:M].astype(np.int32), np.asarray(counts)
