"""TPU device engine: batched set-maximal query-vs-panel matching.

Algorithm 5 of Durbin (2014) restructured TPU-first: queries become a batch
dimension over vectorised FM-interval updates inside one lax.scan over
32-site groups; the rare interval-collapse resets run as vmapped bounded
while_loops against bit-packed haplotypes held in HBM.

Panel state advances with the grouped packed-word design from ops/build:
32 future panel sites ride each haplotype as one int32 word aligned to the
sort order once per group (two-sort gather), so the near-serial per-site
XLA gather disappears; each site is then one stable 4-plane sort carrying
(a, divergence, words).

The device emits per-(site, query) collapse records (e, f, g) plus the
sorted panel columns; the host expands record intervals into haplotype ids
with one native C pass over those columns (native/pbwt_native.c
expand_records) - a stable partition replay with no gathers.

Equivalent output to matchSequencesIndexed (pbwtMatch.c:255-340) and hence
the set of all set-maximal matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .build import GROUP, _segmented_running_max, pack_group_words


def bitpack_rows(X: np.ndarray) -> np.ndarray:
    """(R, N) 0/1 -> (R, ceil(N/8)) uint8, bit 7 first."""
    return np.packbits(np.ascontiguousarray(X, np.uint8), axis=1)


def _getbit(packed: jnp.ndarray, row, col):
    """Read bit (row, col) from a row-bitpacked uint8 matrix."""
    byte = packed[row, col >> 3]
    return (byte >> (7 - (col & 7))) & 1


def pack_row_words(bits: np.ndarray) -> np.ndarray:
    """Row-bitpacked bytes (R, ceil(N/8)) -> little-endian uint32 words
    (R, ceil(N/32)) viewed as int32 (site j of a row lives in word j>>5,
    byte (j>>3)&3, bit 7-(j&7))."""
    R, nb = bits.shape
    pad = (-nb) % 4
    if pad:
        bits = np.concatenate([bits, np.zeros((R, pad), np.uint8)], axis=1)
    return np.ascontiguousarray(bits).view(np.int32)


def _last_mismatch_in_word(v):
    """Largest site index j' (0..31) within a xor word v with a set bit;
    undefined when v == 0."""
    hsb = 31 - jax.lax.clz(v)
    b = hsb >> 3                                   # highest nonzero byte
    bytev = (jax.lax.shift_right_logical(v, 8 * b)) & 0xFF
    ctz = 31 - jax.lax.clz(bytev & -bytev)
    return 8 * b + 7 - ctz


def _word_mask_below(r):
    """int32 mask of the bits of sites j' < r (r in 0..32) within a word."""
    full = (jnp.int32(1) << (8 * (r >> 3))) - 1
    part = jnp.where((r & 7) > 0,
                     (0xFF << (8 - (r & 7))) & 0xFF, 0)
    mask = full | (part << (8 * (r >> 3)))
    return jnp.where(r >= 32, jnp.int32(-1), mask)


@jax.jit
def match_scan(W: jnp.ndarray, query_cols: jnp.ndarray,
               xq_bits: jnp.ndarray, xp_bits: jnp.ndarray,
               xq_words: jnp.ndarray, xp_words: jnp.ndarray,
               a0: jnp.ndarray):
    """Scan over 32-site groups; returns per-site collapse records.

    W          (Ng, M) int32 packed panel group words (pack_group_words;
               pad sites beyond N are all-ones, which leave the panel state
               unchanged and never collapse queries padded with ones)
    query_cols (Ng*32, Q) uint8 query values per site (1 at pad sites)
    xq_bits    (Q, ceil(N/8)) query haplotypes, bit-packed
    xp_bits    (M, ceil(N/8)) panel haplotypes, bit-packed

    Returns (mask, e, f, g) all (Ng*32, Q) - collapse records holding the
    OLD interval - plus the final (e, f, g) carry for the k = N flush and
    the per-site sorted panel columns, bit-packed (Ng*32, ceil8(M)/8).
    """
    Ng, M = W.shape
    Q = query_cols.shape[1]
    M8 = ((M + 7) // 8) * 8
    iota = jnp.arange(M, dtype=jnp.int32)
    shifts = jnp.array([7, 6, 5, 4, 3, 2, 1, 0], dtype=jnp.uint8)
    qpad = jnp.zeros(M8 - M, dtype=jnp.uint8)

    def sort_gather(w_nat, a):
        _, inv = jax.lax.sort((a, iota), num_keys=1, is_stable=True)
        _, r = jax.lax.sort((inv, w_nat), num_keys=1, is_stable=True)
        return r

    def reset_one(collapsed, xq_row, e, f1, g1, d_next, a_next, k):
        """Post-collapse (e, f, g) reset (pbwtMatch.c:309-320), one query."""
        e1 = d_next[jnp.minimum(f1, M)] - 1
        xe1 = _getbit(xq_bits, xq_row,
                      jnp.clip(e1, 0, xq_bits.shape[1] * 8 - 1))
        branch_a = (f1 == M) | ((f1 > 0) & (xe1 == 0))
        fsel = jnp.where(branch_a, g1 - 1, f1)
        ref_hap = a_next[jnp.clip(fsel, 0, M - 1)]

        # backward match extension: find the largest mismatch site j < e1
        # between query and ref_hap, 32 sites per step on packed words
        # (the reference walks one site per iteration, pbwtMatch.c:300-303)
        w0 = jnp.maximum(e1 - 1, 0) >> 5
        r0 = (jnp.maximum(e1 - 1, 0) & 31) + 1

        def wcond(state):
            widx, found, _ = state
            return collapsed & (e1 > 0) & (~found) & (widx >= 0)

        def wbody(state):
            widx, found, j = state
            v = xq_words[xq_row, widx] ^ xp_words[ref_hap, widx]
            v = jnp.where(widx == w0, v & _word_mask_below(r0), v)
            hit = v != 0
            j_new = jnp.where(hit, 32 * widx + _last_mismatch_in_word(v), j)
            return widx - 1, hit, j_new

        _, found, j = jax.lax.while_loop(
            wcond, wbody, (w0, jnp.bool_(False), jnp.int32(-1)))
        e1 = jnp.where(collapsed & (e1 > 0),
                       jnp.where(found, j + 1, 0), e1)

        def down_cond(fc):
            return collapsed & branch_a & (d_next[jnp.clip(fc, 0, M)] <= e1)

        def up_cond(gc):
            return (collapsed & (~branch_a) & (gc < M)
                    & (d_next[jnp.clip(gc, 0, M)] <= e1))

        f_new = jax.lax.while_loop(down_cond, lambda fc: fc - 1, fsel)
        g_new = jnp.where(branch_a, g1,
                          jax.lax.while_loop(up_cond, lambda gc: gc + 1,
                                             f1 + 1))
        f_new = jnp.where(branch_a, f_new, f1)
        return e1, f_new, g_new

    reset_batch = jax.vmap(reset_one, in_axes=(0, 0, 0, 0, 0, None, None,
                                               None))
    qrows = jnp.arange(Q, dtype=jnp.int32)

    def group_step(carry, xs):
        a, d, e, f, g, k = carry
        w_nat, qgrp = xs                       # (M,), (GROUP, Q)
        w = sort_gather(w_nat, a)
        recs, ybits = [], []
        for s in range(GROUP):
            key = ((w >> s) & 1).astype(jnp.uint8)
            xk = qgrp[s]
            mask0 = key == 0
            r0 = jnp.cumsum(mask0.astype(jnp.int32))
            c = r0[-1]
            u = jnp.concatenate([jnp.zeros(1, jnp.int32), r0])
            f1 = jnp.where(xk != 0, c + f - u[f], u[f])
            g1 = jnp.where(xk != 0, c + g - u[g], u[g])
            collapsed = g1 <= f1
            recs.append((collapsed, e, f, g))
            ybits.append((jnp.concatenate([key, qpad]).reshape(M8 // 8, 8)
                          << shifts).sum(axis=1).astype(jnp.uint8))

            kk = jnp.asarray(k + s, d.dtype)
            prev0 = jnp.concatenate([jnp.zeros(1, bool), mask0[:-1]])
            prev1 = jnp.concatenate([jnp.zeros(1, bool), (~mask0)[:-1]])
            seed = d.at[0].max(kk + 1)
            p = _segmented_running_max(seed[:M], prev0)
            q = _segmented_running_max(seed[:M], prev1)
            payload = jnp.where(mask0, p, q)
            _, a, d_core, w = jax.lax.sort((key, a, payload, w), num_keys=1,
                                           is_stable=True)
            d = jnp.concatenate([d_core, jnp.zeros(1, d.dtype)])
            d = d.at[0].set(kk + 2).at[M].set(kk + 2)

            e_r, f_r, g_r = reset_batch(collapsed, qrows, e, f1, g1, d, a, kk)
            e = jnp.where(collapsed, e_r, e)
            f = jnp.where(collapsed, f_r, f1)
            g = jnp.where(collapsed, g_r, g1)
        mask_g, e_g, f_g, g_g = (jnp.stack([r[i] for r in recs])
                                 for i in range(4))
        return ((a, d, e, f, g, k + GROUP),
                (mask_g, e_g, f_g, g_g, jnp.stack(ybits)))

    a = a0
    d = jnp.zeros(M + 1, dtype=jnp.int32).at[0].set(1).at[M].set(1)
    e = jnp.zeros(Q, dtype=jnp.int32)
    f = jnp.zeros(Q, dtype=jnp.int32)
    g = jnp.full(Q, M, dtype=jnp.int32)
    qgrps = query_cols.reshape(Ng, GROUP, Q)
    (_, _, e_end, f_end, g_end, _), (mask, es, fs, gs, ybits) = jax.lax.scan(
        group_step, (a, d, e, f, g, jnp.int32(0)), (W, qgrps))
    flatten = lambda x: x.reshape((Ng * GROUP,) + x.shape[2:])
    return (flatten(mask), flatten(es), flatten(fs), flatten(gs),
            (e_end, f_end, g_end), flatten(ybits))


@jax.jit
def match_scan_ad(W: jnp.ndarray, query_cols: jnp.ndarray,
                  xq_bits: jnp.ndarray, xp_bits: jnp.ndarray,
                  xq_words: jnp.ndarray, xp_words: jnp.ndarray,
                  a0: jnp.ndarray):
    """match_scan with the panel advanced by the Pallas divergence kernel
    (ops/partition_pallas.partition_ad_step) instead of per-site 4-plane
    lax.sorts: one kernel call per site inside the group scan, with the
    vectorised query FM/collapse machinery in XLA between calls.

    Same inputs as match_scan except the panel may be padded with duplicate
    rows (Mp = multiple of 4096); duplicates are invisible to set-maximal
    semantics (an interval contains a duplicate iff it contains the
    original, so collapse timing and real-id reports are unchanged) and the
    caller filters padded ids. Emits per-group prefix-array snapshots for
    the threaded host expansion instead of per-site sorted columns.
    """
    from .partition_pallas import partition_ad_step
    Ng, Mp = W.shape
    Q = query_cols.shape[1]
    R = Mp // 128
    iota = jnp.arange(Mp, dtype=jnp.int32)

    def sort_gather(w_nat, a):
        _, inv = jax.lax.sort((a, iota), num_keys=1, is_stable=True)
        _, r = jax.lax.sort((inv, w_nat), num_keys=1, is_stable=True)
        return r

    def reset_one(collapsed, xq_row, e, f1, g1, d_next, a_next, k):
        e1 = d_next[jnp.minimum(f1, Mp)] - 1
        xe1 = _getbit(xq_bits, xq_row,
                      jnp.clip(e1, 0, xq_bits.shape[1] * 8 - 1))
        branch_a = (f1 == Mp) | ((f1 > 0) & (xe1 == 0))
        fsel = jnp.where(branch_a, g1 - 1, f1)
        ref_hap = a_next[jnp.clip(fsel, 0, Mp - 1)]
        w0 = jnp.maximum(e1 - 1, 0) >> 5
        r0 = (jnp.maximum(e1 - 1, 0) & 31) + 1

        def wcond(state):
            widx, found, _ = state
            return collapsed & (e1 > 0) & (~found) & (widx >= 0)

        def wbody(state):
            widx, found, j = state
            v = xq_words[xq_row, widx] ^ xp_words[ref_hap, widx]
            v = jnp.where(widx == w0, v & _word_mask_below(r0), v)
            hit = v != 0
            j_new = jnp.where(hit, 32 * widx + _last_mismatch_in_word(v), j)
            return widx - 1, hit, j_new

        _, found, j = jax.lax.while_loop(
            wcond, wbody, (w0, jnp.bool_(False), jnp.int32(-1)))
        e1 = jnp.where(collapsed & (e1 > 0),
                       jnp.where(found, j + 1, 0), e1)

        def down_cond(fc):
            return collapsed & branch_a & (d_next[jnp.clip(fc, 0, Mp)] <= e1)

        def up_cond(gc):
            return (collapsed & (~branch_a) & (gc < Mp)
                    & (d_next[jnp.clip(gc, 0, Mp)] <= e1))

        f_new = jax.lax.while_loop(down_cond, lambda fc: fc - 1, fsel)
        g_new = jnp.where(branch_a, g1,
                          jax.lax.while_loop(up_cond, lambda gc: gc + 1,
                                             f1 + 1))
        f_new = jnp.where(branch_a, f_new, f1)
        return e1, f_new, g_new

    reset_batch = jax.vmap(reset_one, in_axes=(0, 0, 0, 0, 0, None, None,
                                               None))
    qrows = jnp.arange(Q, dtype=jnp.int32)

    shifts = jnp.array([7, 6, 5, 4, 3, 2, 1, 0], dtype=jnp.uint8)

    def group_step(carry, xs):
        a, d, e, f, g, k = carry
        w_nat, qgrp = xs
        a_snap = a
        w = sort_gather(w_nat, a)
        recs, ybits = [], []
        for s in range(GROUP):
            kk = k + s
            xk = qgrp[s]
            key = (jax.lax.shift_right_logical(w, s) & 1).astype(jnp.uint8)
            ybits.append((key.reshape(Mp // 8, 8) << shifts)
                         .sum(axis=1).astype(jnp.uint8))
            a2, d2, w2, u2, cnt = partition_ad_step(
                a.reshape(R, 128), d.reshape(R, 128), w.reshape(R, 128),
                s, kk)
            c = cnt[0]
            u = u2.reshape(-1)
            uf = jnp.where(f == Mp, c, u[jnp.minimum(f, Mp - 1)])
            ug = jnp.where(g == Mp, c, u[jnp.minimum(g, Mp - 1)])
            f1 = jnp.where(xk != 0, c + f - uf, uf)
            g1 = jnp.where(xk != 0, c + g - ug, ug)
            collapsed = g1 <= f1
            recs.append((collapsed, e, f, g))
            a, w = a2.reshape(-1), w2.reshape(-1)
            d_full = jnp.concatenate([d2.reshape(-1),
                                      jnp.full(1, kk + 2, jnp.int32)])
            e_r, f_r, g_r = reset_batch(collapsed, qrows, e, f1, g1,
                                        d_full, a, kk)
            e = jnp.where(collapsed, e_r, e)
            f = jnp.where(collapsed, f_r, f1)
            g = jnp.where(collapsed, g_r, g1)
            d = d2.reshape(-1)
        mask_g, e_g, f_g, g_g = (jnp.stack([r[i] for r in recs])
                                 for i in range(4))
        return ((a, d, e, f, g, k + GROUP),
                (mask_g, e_g, f_g, g_g, a_snap, jnp.stack(ybits)))

    a = a0
    d = jnp.zeros(Mp, dtype=jnp.int32).at[0].set(1)
    e = jnp.zeros(Q, dtype=jnp.int32)
    f = jnp.zeros(Q, dtype=jnp.int32)
    g = jnp.full(Q, Mp, dtype=jnp.int32)
    qgrps = query_cols.reshape(Ng, GROUP, Q)
    (_, _, e_end, f_end, g_end, _), (mask, es, fs, gs, snaps, yb) = \
        jax.lax.scan(group_step, (a, d, e, f, g, jnp.int32(0)), (W, qgrps))
    flatten = lambda x: x.reshape((Ng * GROUP,) + x.shape[2:])
    return (flatten(mask), flatten(es), flatten(fs), flatten(gs),
            (e_end, f_end, g_end), snaps, flatten(yb))


@jax.jit
def _panel_words_from_bits(xp_bits_padded: jnp.ndarray):
    """(Mp, 4*Ng) bit-packed rows -> (Ng, Mp) int32 group words on device.

    Bytes pack sites MSB-first (numpy packbits); the group word wants site
    32t+s at bit s, so each byte is bit-reversed with three SWAR rounds.
    Pad sites beyond N are 0 bits = all-zero columns (identity partitions).
    """
    Mp, nb = xp_bits_padded.shape
    v = jax.lax.bitcast_convert_type(
        xp_bits_padded.reshape(Mp, nb // 4, 4), jnp.int32)   # (Mp, Ng)
    c = lambda x: jnp.asarray(np.int32(np.uint32(x)))
    sr = jax.lax.shift_right_logical
    v = sr(v & c(0xF0F0F0F0), 4) | ((v & c(0x0F0F0F0F)) << 4)
    v = sr(v & c(0xCCCCCCCC), 2) | ((v & c(0x33333333)) << 2)
    v = sr(v & c(0xAAAAAAAA), 1) | ((v & c(0x55555555)) << 1)
    return v.T                                               # (Ng, Mp)


def match_queries_device(Xp: np.ndarray, Xq: np.ndarray):
    """Set-maximal matches of queries Xq (Q, N) against panel Xp (M, N).

    Returns rows (q, panel_hap, start, end) in (site, query) report order -
    the same set as matchSequencesIndexed. Device does the O(N(M+Q)) state
    evolution; the host expands intervals to ids with one native C pass
    over the device-emitted sorted columns.

    On TPU the panel advances through the Pallas divergence kernel: the
    panel is padded to a multiple of 4096 with duplicates of row 0 (ids
    >= M are filtered from reports; duplicate rows cannot shadow or alter
    set-maximal structure), the group words are derived on device from the
    bit-packed rows, and the id expansion runs multithreaded from per-chunk
    prefix-array snapshots.
    """
    if jax.default_backend() == "tpu" and Xp.shape[0] > 512:
        rows = _match_queries_tpu(Xp, Xq)
        if rows is not None:
            return rows
    from ..core import engine, native
    M, N = Xp.shape
    Q = Xq.shape[0]
    # NB no haplotype padding: pad rows would join match intervals and leak
    # phantom ids into reports. Pad sites (all-ones words + all-ones query
    # values) are no-ops: f/g/e are unchanged and nothing collapses.
    cols = native.transpose_u8(np.ascontiguousarray(Xp, np.uint8))
    if cols is None:
        cols = np.ascontiguousarray(Xp.T, dtype=np.uint8)
    W = pack_group_words(cols)
    Np = W.shape[0] * GROUP
    qcols = np.ones((Np, Q), dtype=np.uint8)
    qcols[:N] = Xq.T
    xp_bits = bitpack_rows(Xp)
    xq_bits = bitpack_rows(Xq)
    a0 = jnp.arange(M, dtype=jnp.int32)
    mask, es, fs, gs, flush, ybits = match_scan(
        jnp.asarray(W), jnp.asarray(qcols), jnp.asarray(xq_bits),
        jnp.asarray(xp_bits), jnp.asarray(pack_row_words(xq_bits)),
        jnp.asarray(pack_row_words(xp_bits)), a0)
    mask = np.asarray(mask)[:N]
    es = np.asarray(es)[:N]
    fs = np.asarray(fs)[:N]
    gs = np.asarray(gs)[:N]
    ybits_h = np.ascontiguousarray(np.asarray(ybits)[:N])
    e_end, f_end, g_end = (np.asarray(x) for x in flush)

    # flatten records in (site, query) order; append the k = N flush row
    ks, qs = np.nonzero(mask)
    rec_q = np.concatenate([qs, np.arange(Q)]).astype(np.int32)
    rec_e = np.concatenate([es[ks, qs], e_end]).astype(np.int32)
    rec_f = np.concatenate([fs[ks, qs], f_end]).astype(np.int32)
    rec_g = np.concatenate([gs[ks, qs], g_end]).astype(np.int32)
    rec_k = np.concatenate([ks, np.full(Q, N)])
    rec_off = np.zeros(N + 2, dtype=np.int64)
    np.add.at(rec_off, rec_k + 1, 1)
    rec_off = np.cumsum(rec_off)
    total = int((rec_g.astype(np.int64) - rec_f).clip(min=0).sum())

    lib = native.get_lib()
    if lib is not None:
        out = np.empty((max(total, 1), 4), dtype=np.int32)
        n = lib.expand_records(ybits_h.reshape(-1), ybits_h.shape[1], M, N,
                               rec_off, rec_q, rec_e, rec_f, rec_g,
                               out.reshape(-1), total)
        assert n == total
        return [tuple(int(v) for v in row) for row in out[:total]]

    Ysort = np.unpackbits(ybits_h, axis=1)[:, :M]
    rows: list[tuple[int, int, int, int]] = []
    a = np.arange(M, dtype=np.int32)
    for k in range(N + 1):
        for r in range(int(rec_off[k]), int(rec_off[k + 1])):
            for i in range(int(rec_f[r]), int(rec_g[r])):
                rows.append((int(rec_q[r]), int(a[i]), int(rec_e[r]), k))
        if k < N:
            a = engine.forwards_a(a, Ysort[k])
    return rows


def _match_queries_tpu(Xp: np.ndarray, Xq: np.ndarray):
    """Pallas-kernel matcher path; returns None if the native lib is
    unavailable (the caller falls back to the portable path)."""
    from ..core import native
    from .build import pad_to
    lib = native.get_lib()
    if lib is None:
        return None
    M, N = Xp.shape
    Q = Xq.shape[0]
    Mp = pad_to(M, 4096)
    Ng = (N + GROUP - 1) // GROUP

    xp_bits = bitpack_rows(Xp)
    xq_bits = bitpack_rows(Xq)
    # pad rows with duplicates of row 0; pad site bytes with zeros
    nb = 4 * Ng
    xp_pad = native.pooled_view((Mp, nb), np.uint8, "match:xp_pad")
    xp_pad[:] = 0
    xp_pad[:M, :xp_bits.shape[1]] = xp_bits
    xp_pad[M:] = xp_pad[0]
    xp_words = pack_row_words(xp_pad[:, :((N + 31) // 32) * 4])
    xq_words = pack_row_words(xq_bits)

    qcols = np.zeros((Ng * GROUP, Q), dtype=np.uint8)   # pad sites: 0
    qcols[:N] = Xq.T

    W = _panel_words_from_bits(jnp.asarray(xp_pad))
    a0 = jnp.arange(Mp, dtype=jnp.int32)
    mask, es, fs, gs, flush, snaps, ybits = match_scan_ad(
        W, jnp.asarray(qcols), jnp.asarray(xq_bits), jnp.asarray(xp_pad),
        jnp.asarray(xq_words), jnp.asarray(xp_words), a0)

    import os as _os
    nchunks = min(max(_os.cpu_count() or 1, 1), 16, Ng)
    gpc = -(-Ng // nchunks)                 # groups per chunk
    nchunks = -(-Ng // gpc)
    snaps_h = np.ascontiguousarray(np.asarray(snaps[::gpc]))
    mask = np.asarray(mask)[:N]
    es = np.asarray(es)[:N]
    fs = np.asarray(fs)[:N]
    gs = np.asarray(gs)[:N]
    e_end, f_end, g_end = (np.asarray(x) for x in flush)

    ks, qs = np.nonzero(mask)
    rec_q = np.concatenate([qs, np.arange(Q)]).astype(np.int32)
    rec_e = np.concatenate([es[ks, qs], e_end]).astype(np.int32)
    rec_f = np.concatenate([fs[ks, qs], f_end]).astype(np.int32)
    rec_g = np.concatenate([gs[ks, qs], g_end]).astype(np.int32)
    rec_k = np.concatenate([ks, np.full(Q, N)])
    rec_off = np.zeros(N + 2, dtype=np.int64)
    np.add.at(rec_off, rec_k + 1, 1)
    rec_off = np.cumsum(rec_off)

    widths = (rec_g.astype(np.int64) - rec_f).clip(min=0)
    # rows per chunk: records are (site, query)-ordered, so per-chunk row
    # starts come from the record widths prefix-summed at chunk boundaries
    order = np.argsort(rec_k, kind="stable")
    w_sorted = widths[order]
    wcum = np.concatenate([[0], np.cumsum(w_sorted)])
    chunk_k0 = np.minimum(np.arange(nchunks + 1) * gpc * GROUP, N + 1)
    chunk_k0[-1] = N + 1
    rec_idx_at = rec_off[np.minimum(chunk_k0, N + 1)]
    row_start = wcum[rec_idx_at[:-1]]
    total = int(wcum[-1])

    ybits_h = np.ascontiguousarray(np.asarray(ybits)[:N])
    out = native.pooled_view((max(total, 1), 4), np.int32, "match:out")
    lib.expand_records_mt(ybits_h.reshape(-1), ybits_h.shape[1], Mp, N,
                          nchunks, chunk_k0.astype(np.int64),
                          snaps_h.reshape(-1), rec_off,
                          rec_q, rec_e, rec_f, rec_g,
                          row_start.astype(np.int64), out.reshape(-1))
    real = out[:total]
    real = real[real[:, 1] < M]
    return [tuple(int(v) for v in row) for row in real]
