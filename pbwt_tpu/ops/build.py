"""TPU device engine: PBWT construction as a jitted lax.scan.

The reference hot loop (pbwtCursorForwardsAD, pbwtCore.c:485-508 - an O(M)
stable two-bucket counting sort per site plus a divergence running-max) maps
onto the TPU as:

  * stable partition  = exclusive prefix-sum of the allele column + scatter
    (VPU cumsum; one gather + one scatter per site),
  * divergence update = segmented running maxima with resets after each
    emitted symbol, computed with an associative scan over (value, reset)
    pairs,
  * site recurrence   = jax.lax.scan (the k-recurrence is inherently
    sequential in a; throughput comes from the M lanes).

Outputs: per-site sorted columns (bit-packed on device to cut HBM->host
traffic 8x), per-site zero-counts (c), and the final prefix/divergence
arrays.  The host pack3 encoder turns sorted columns into the byte-exact
.pbwt stream.

Padding: M is padded to a lane multiple with all-ones haplotypes.  Ones pad
rows start at the end of the sort order and remain there under every stable
partition (zeros first; pads follow all real ones because they follow them
in the current order), so real rows' a/d/y values are unaffected and the
first M entries of every output column are the unpadded result.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pad_to(M: int, multiple: int = 256) -> int:
    return ((M + multiple - 1) // multiple) * multiple


def _segmented_running_max(vals: jnp.ndarray, resets: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max of ``vals`` that restarts after each position
    where ``resets`` is True (reset applies to the element itself: segment =
    (last_reset, i]).  Associative-scan formulation, O(M log M)."""

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.maximum(av, bv)), ar | br

    out, _ = jax.lax.associative_scan(combine, (vals, resets))
    return out


def pbwt_step(a: jnp.ndarray, d: jnp.ndarray, y: jnp.ndarray, k: jnp.ndarray):
    """One column update: returns (a_new, d_new, c).

    Mirrors pbwtCursorForwardsAD exactly on the first M (unpadded) lanes:
    a_new = stable partition of a by y; d_new[j] = running max of d over the
    segment ending at the j-th emitted 0 (resp. 1), seeded with k+1.
    Sentinels d[0] = d[M] are maintained by the caller-side convention that
    d[0] is overwritten with k+2 (here: position 0 of d_new).
    """
    M = a.shape[0]
    mask0 = y == 0
    r0 = jnp.cumsum(mask0)                       # inclusive zero-rank
    c = r0[-1]
    idx = jnp.arange(M, dtype=r0.dtype)
    pos = jnp.where(mask0, r0 - 1, c + (idx + 1 - r0) - 1)
    a_new = jnp.zeros_like(a).at[pos].set(a)

    kk = jnp.asarray(k, d.dtype)
    # p-scan: resets after each zero; q-scan: resets after each one
    prev0 = jnp.concatenate([jnp.zeros(1, bool), mask0[:-1]])
    prev1 = jnp.concatenate([jnp.zeros(1, bool), (~mask0)[:-1]])
    seed = d.at[0].max(kk + 1)                   # fold the k+1 seed into d[0]
    p = _segmented_running_max(seed, prev0)
    q = _segmented_running_max(seed, prev1)
    # re-seed segments that started after a reset but should still see k+1?
    # No: the reference seeds p=q=k+1 once at the start only; after the first
    # emission p/q reset to 0 (pbwtCore.c:489-503).
    dvals = jnp.where(mask0, p, q)
    d_new = jnp.zeros_like(d).at[pos].set(dvals)
    d_new = d_new.at[0].set(kk + 2)
    return a_new, d_new, c


def bitpack_column(y: jnp.ndarray) -> jnp.ndarray:
    """Pack a 0/1 uint8 column (len multiple of 8) into bytes, bit 7 first
    (numpy packbits order)."""
    M = y.shape[0]
    shifts = jnp.array([7, 6, 5, 4, 3, 2, 1, 0], dtype=jnp.uint8)
    return (y.reshape(M // 8, 8) << shifts).sum(axis=1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("with_divergence",))
def build_scan(X_cols: jnp.ndarray, a0: jnp.ndarray, with_divergence: bool = True):
    """Construct a PBWT over (N, Mp) site-major uint8 columns.

    Returns (Ybits, counts, a_end, d_end):
      Ybits  (N, Mp//8) uint8 - sorted-order columns, bit-packed
      counts (N,) int32       - zeros per column (c)
      a_end  (Mp,) int32      - final prefix array (aFend)
      d_end  (Mp,) int32      - final divergence array entries 0..Mp-1
                                (meaningless when with_divergence=False)

    The stable partition is a one-key stable lax.sort carrying a (and the
    divergence payload) - measured ~1.4x faster on TPU than the
    cumsum+scatter formulation, whose dynamic scatter XLA serialises.
    """
    N, Mp = X_cols.shape
    d0 = jnp.zeros(Mp, dtype=jnp.int32).at[0].set(1)

    def step(carry, col):
        a, d, k = carry
        y = jnp.take(col, a, unique_indices=True)
        mask0 = y == 0
        c = jnp.sum(mask0, dtype=jnp.int32)
        if with_divergence:
            kk = jnp.asarray(k, d.dtype)
            prev0 = jnp.concatenate([jnp.zeros(1, bool), mask0[:-1]])
            prev1 = jnp.concatenate([jnp.zeros(1, bool), (~mask0)[:-1]])
            seed = d.at[0].max(kk + 1)
            p = _segmented_running_max(seed, prev0)
            q = _segmented_running_max(seed, prev1)
            pq = jnp.where(mask0, p, q)
            _, a_new, d_new = jax.lax.sort((y, a, pq), num_keys=1,
                                           is_stable=True)
            d_new = d_new.at[0].set(kk + 2)
        else:
            _, a_new = jax.lax.sort((y, a), num_keys=1, is_stable=True)
            d_new = d
        return (a_new, d_new, k + 1), (bitpack_column(y), c)

    (a_end, d_end, _), (ybits, counts) = jax.lax.scan(
        step, (a0, d0, jnp.int32(0)), X_cols)
    return ybits, counts, a_end, d_end


GROUP = 32  # sites per packed word in the grouped build


def pack_group_words(X_cols: np.ndarray) -> np.ndarray:
    """(N, Mp) uint8 site-major columns -> (ceil(N/32), Mp) int32 words.

    Word t, row i holds sites 32t..32t+31 of haplotype i, site 32t at bit 0.
    Sites beyond N are padded with 1-bits: an all-ones column leaves the
    sort order unchanged, so trailing pad sites are harmless no-ops.
    """
    N, Mp = X_cols.shape
    Ng = (N + GROUP - 1) // GROUP
    full = (N // GROUP) * GROUP
    parts = []
    if full:
        # little-endian bit pack along the site axis: byte j of the group
        # word = sites 8j..8j+7, so the (.., 4, Mp) byte planes laid out
        # (.., Mp, 4) view directly as little-endian int32 words with site
        # 32t+s at bit s
        b = np.packbits(X_cols[:full].reshape(full // GROUP, GROUP, Mp),
                        axis=1, bitorder="little")
        parts.append(np.ascontiguousarray(b.transpose(0, 2, 1))
                     .view(np.int32).reshape(full // GROUP, Mp))
    if N > full:
        tail = np.ones((1, GROUP, Mp), dtype=np.uint8)
        tail[0, :N - full] = X_cols[full:]
        b = np.packbits(tail, axis=1, bitorder="little")
        parts.append(np.ascontiguousarray(b.transpose(0, 2, 1))
                     .view(np.int32).reshape(1, Mp))
    if not parts:
        return np.zeros((0, Mp), dtype=np.int32)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def _sort_gather(w_nat: jnp.ndarray, a: jnp.ndarray, iota: jnp.ndarray):
    """R[i] = w_nat[a[i]] for a permutation ``a`` — computed with two stable
    sorts instead of a gather (XLA's arbitrary 1-D gather on TPU is nearly
    serial: measured 1.8 ms for 64k int32, vs ~0.27 ms for the two sorts)."""
    _, inv = jax.lax.sort((a, iota), num_keys=1, is_stable=True)
    _, r = jax.lax.sort((inv, w_nat), num_keys=1, is_stable=True)
    return r


@partial(jax.jit, static_argnames=("with_divergence", "n_sites"))
def build_scan_grouped(W: jnp.ndarray, a0: jnp.ndarray,
                       with_divergence: bool = False,
                       n_sites: int | None = None):
    """Grouped-packed PBWT construction (the fast path).

    ``W`` is (Ng, Mp) int32 from :func:`pack_group_words`.  Instead of
    gathering one allele column per site through the evolving prefix array
    (the reference's y[j] = x[a[j]] permute, pbwtHtslib.c:134), 32 future
    sites ride along each haplotype as one packed word: the word array is
    aligned to the current sort order once per group (two-sort gather) and
    then carried as sort payload through the 32 per-site stable partitions,
    so the near-serial XLA gather is paid once per 32 sites.

    Returns (ybits (Ng*32, Mp//8), counts (Ng*32,), a_end, d_end).
    """
    Ng, Mp = W.shape
    iota = jnp.arange(Mp, dtype=jnp.int32)
    shifts = jnp.array([7, 6, 5, 4, 3, 2, 1, 0], dtype=jnp.uint8)
    d0 = jnp.zeros(Mp, dtype=jnp.int32).at[0].set(1)

    def group_step(carry, w_nat):
        a, d, k = carry
        w = _sort_gather(w_nat, a, iota)
        ybits, counts = [], []
        for s in range(GROUP):
            key = ((w >> s) & 1).astype(jnp.uint8)
            counts.append(Mp - jnp.sum(key, dtype=jnp.int32))
            ybits.append((key.reshape(Mp // 8, 8) << shifts)
                         .sum(axis=1).astype(jnp.uint8))
            if with_divergence:
                kk = k + s
                mask0 = key == 0
                prev0 = jnp.concatenate([jnp.zeros(1, bool), mask0[:-1]])
                prev1 = jnp.concatenate([jnp.zeros(1, bool), (~mask0)[:-1]])
                seed = d.at[0].max(kk + 1)
                p = _segmented_running_max(seed, prev0)
                q = _segmented_running_max(seed, prev1)
                pq = jnp.where(mask0, p, q)
                _, a, d, w = jax.lax.sort((key, a, pq, w), num_keys=1,
                                          is_stable=True)
                d = d.at[0].set(kk + 2)
            else:
                _, a, w = jax.lax.sort((key, a, w), num_keys=1,
                                       is_stable=True)
        return (a, d, k + GROUP), (jnp.stack(ybits), jnp.stack(counts))

    (a_end, d_end, _), (ybits, counts) = jax.lax.scan(
        group_step, (a0, d0, jnp.int32(0)), W)
    if with_divergence and n_sites is not None and n_sites % GROUP:
        # trailing all-ones pad sites only advance the d[0] = k+2 sentinel;
        # restore the value it had after the last real site
        d_end = d_end.at[0].set(n_sites + 1)
    return (ybits.reshape(Ng * GROUP, Mp // 8),
            counts.reshape(Ng * GROUP), a_end, d_end)


def prepare_columns(X: np.ndarray, multiple: int = 256) -> tuple[np.ndarray, int]:
    """(M, N) natural-order haplotypes -> (N, Mp) site-major padded columns."""
    M, N = X.shape
    Mp = pad_to(M, multiple)
    cols = np.ones((N, Mp), dtype=np.uint8)
    cols[:, :M] = X.T
    return cols, Mp


def unpack_bits_host(ybits: np.ndarray, M: int) -> np.ndarray:
    """(N, Mp//8) packed device output -> (N, M) uint8 sorted columns."""
    return np.unpackbits(np.asarray(ybits), axis=1)[:, :M]


def build_pbwt_device(X: np.ndarray, multiple: int = 256):
    """Full device-accelerated construction from an (M, N) haplotype matrix.

    Device does the O(NM) sort/divergence work; the host pack3-encodes the
    sorted columns into the byte-exact .pbwt stream.
    Returns (yz bytes, aFend int32[M], counts int32[N]).
    """
    from ..core import pack3 as p3
    M, N = X.shape
    # Pallas kernel VMEM residency caps out around Mp ~ 2M rows (the
    # word plane is Mp*4 bytes and ~a dozen stay live); beyond that the
    # XLA grouped path takes over
    use_pallas = (jax.default_backend() == "tpu" and M > 4096
                  and pad_to(M, 4096) <= (1 << 21))
    if use_pallas:
        multiple = max(multiple, 4096)
    cols, Mp = prepare_columns(X, multiple)
    a0 = jnp.arange(Mp, dtype=jnp.int32)
    W = jnp.asarray(pack_group_words(cols))
    if use_pallas:
        from . import enable_compilation_cache, partition_pallas as pp
        enable_compilation_cache()
        # the two-word kernel carries an extra plane: VMEM-bound ~512k rows
        if W.shape[0] % 2 == 0 and Mp <= (1 << 19):
            ywords, counts, a_end = pp.build_scan_pallas_noa64(W, a0)
        else:
            ywords, counts, a_end = pp.build_scan_pallas_noa(W, a0)
        Ysort = pp.unpack_sitewords_host(np.asarray(ywords[:N]), M)
        counts = counts[:N]
    else:
        ybits, counts, a_end, _ = build_scan_grouped(W, a0)
        ybits, counts = ybits[:N], counts[:N]
        Ysort = unpack_bits_host(np.asarray(ybits), M)
    yz, _ = p3.pack_columns(Ysort)
    a_end_host = np.asarray(a_end)[:M].astype(np.int32)
    return yz, a_end_host, np.asarray(counts)
