"""TPU device engine: batched set-maximal query-vs-panel matching.

Algorithm 5 of Durbin (2014) restructured TPU-first: queries become a batch
dimension over vectorised FM-interval updates inside one lax.scan over
sites; the rare interval-collapse resets run as vmapped bounded while_loops
against bit-packed haplotypes held in HBM.  The device emits per-(site,
query) collapse records (e, f, g); the host expands record intervals into
haplotype ids with one streaming native pass (O(NM), ~80M hap-sites/s),
which keeps the ragged reporting off the device without re-running any
per-query work.

Equivalent output to matchSequencesIndexed (pbwtMatch.c:255-340) and hence
the set of all set-maximal matches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .build import pad_to


def bitpack_rows(X: np.ndarray) -> np.ndarray:
    """(R, N) 0/1 -> (R, ceil(N/8)) uint8, bit 7 first."""
    return np.packbits(np.ascontiguousarray(X, np.uint8), axis=1)


def _getbit(packed: jnp.ndarray, row, col):
    """Read bit (row, col) from a row-bitpacked uint8 matrix."""
    byte = packed[row, col >> 3]
    return (byte >> (7 - (col & 7))) & 1


@partial(jax.jit, static_argnames=())
def match_scan(panel_cols: jnp.ndarray, query_cols: jnp.ndarray,
               xq_bits: jnp.ndarray, xp_bits: jnp.ndarray,
               a0: jnp.ndarray):
    """Scan over sites; returns per-site collapse records.

    panel_cols (N, Mp) uint8 natural-order columns (padded with ones)
    query_cols (N, Q) uint8 query values per site (natural order)
    xq_bits    (Q, ceil(N/8)) query haplotypes, bit-packed
    xp_bits    (Mp, ceil(N/8)) panel haplotypes, bit-packed

    Outputs (all (N+1, Q)): mask (collapse at site k), e, f, g of the
    reported interval; row N holds the final flush (every query reports).
    Also returns a_end for the host id-expansion pass.
    """
    N, Mp = panel_cols.shape
    _, Q = query_cols.shape
    idxM = jnp.arange(Mp, dtype=jnp.int32)

    def reset_one(collapsed, xq_row, e, f1, g1, d_next, a_next, k):
        """Post-collapse (e, f, g) reset (pbwtMatch.c:309-320), one query."""
        e1 = d_next[jnp.minimum(f1, Mp)] - 1
        # branch selector: f1 == Mp forces branch A; f1 == 0 forces branch B;
        # otherwise x[e1] == 0 selects A (e1 < N guaranteed for interior f1)
        xe1 = _getbit(xq_bits, xq_row, jnp.clip(e1, 0, xq_bits.shape[1] * 8 - 1))
        branch_a = (f1 == Mp) | ((f1 > 0) & (xe1 == 0))
        f_a = g1 - 1
        f_b = f1
        fsel = jnp.where(branch_a, f_a, f_b)
        ref_hap = a_next[jnp.clip(fsel, 0, Mp - 1)]

        def ext_cond(state):
            e1c, _ = state
            ok = e1c > 0
            same = (_getbit(xq_bits, xq_row, jnp.maximum(e1c - 1, 0))
                    == _getbit(xp_bits, ref_hap, jnp.maximum(e1c - 1, 0)))
            return ok & same & collapsed

        def ext_body(state):
            e1c, n = state
            return e1c - 1, n + 1

        e1, _ = jax.lax.while_loop(ext_cond, ext_body, (e1, jnp.int32(0)))

        def down_cond(state):
            fc = state
            return collapsed & branch_a & (d_next[jnp.clip(fc, 0, Mp)] <= e1)

        def down_body(fc):
            return fc - 1

        def up_cond(gc):
            return collapsed & (~branch_a) & (gc < Mp) & (d_next[jnp.clip(gc, 0, Mp)] <= e1)

        def up_body(gc):
            return gc + 1

        f_new = jax.lax.while_loop(down_cond, down_body, fsel)
        g_new = jnp.where(branch_a, g1, jax.lax.while_loop(up_cond, up_body, f1 + 1))
        f_new = jnp.where(branch_a, f_new, f1)
        return e1, f_new, g_new

    reset_batch = jax.vmap(reset_one, in_axes=(0, 0, 0, 0, 0, None, None, None))

    def step(carry, xs):
        a, d, e, f, g, k = carry
        col, xk = xs
        y = col[a]
        mask0 = y == 0
        r0 = jnp.cumsum(mask0.astype(jnp.int32))
        c = r0[-1]
        u = jnp.concatenate([jnp.zeros(1, jnp.int32), r0])   # rank table, len Mp+1
        # FM updates for all queries
        f1 = jnp.where(xk != 0, c + f - u[f], u[f])
        g1 = jnp.where(xk != 0, c + g - u[g], u[g])
        collapsed = g1 <= f1
        # record the reported interval (the OLD e, f, g at this site)
        rec = (collapsed, e, f, g)

        # advance panel state via the stable-sort partition (see ops.build:
        # XLA serialises dynamic scatters on TPU, its sort is vectorised)
        kk = jnp.asarray(k, d.dtype)
        prev0 = jnp.concatenate([jnp.zeros(1, bool), mask0[:-1]])
        prev1 = jnp.concatenate([jnp.zeros(1, bool), (~mask0)[:-1]])
        from .build import _segmented_running_max
        seed = d.at[0].max(kk + 1)
        p = _segmented_running_max(seed[:Mp], prev0)
        q = _segmented_running_max(seed[:Mp], prev1)
        payload = jnp.where(mask0, p, q)
        _, a_next, d_core = jax.lax.sort((y, a, payload), num_keys=1,
                                         is_stable=True)
        d_next = jnp.concatenate([d_core, jnp.zeros(1, d.dtype)])
        d_next = d_next.at[0].set(kk + 2)
        d_next = d_next.at[Mp].set(kk + 2)

        qrows = jnp.arange(Q, dtype=jnp.int32)
        e_r, f_r, g_r = reset_batch(collapsed, qrows, e, f1, g1, d_next,
                                    a_next, kk)
        e_new = jnp.where(collapsed, e_r, e)
        f_new = jnp.where(collapsed, f_r, f1)
        g_new = jnp.where(collapsed, g_r, g1)
        return (a_next, d_next, e_new, f_new, g_new, k + 1), rec

    a = a0
    d = jnp.zeros(Mp + 1, dtype=jnp.int32).at[0].set(1).at[Mp].set(1)
    e = jnp.zeros(Q, dtype=jnp.int32)
    f = jnp.zeros(Q, dtype=jnp.int32)
    g = jnp.full(Q, Mp, dtype=jnp.int32)
    (a_end, d_end, e_end, f_end, g_end, _), (mask, es, fs, gs) = jax.lax.scan(
        step, (a, d, e, f, g, jnp.int32(0)),
        (panel_cols, query_cols))
    # final flush row: every query reports its last interval at k == N
    mask = jnp.concatenate([mask, jnp.ones((1,) + mask.shape[1:], mask.dtype)])
    es = jnp.concatenate([es, e_end[None]])
    fs = jnp.concatenate([fs, f_end[None]])
    gs = jnp.concatenate([gs, g_end[None]])
    return mask, es, fs, gs, a_end


def match_queries_device(Xp: np.ndarray, Xq: np.ndarray):
    """Set-maximal matches of queries Xq (Q, N) against panel Xp (M, N).

    Returns rows (q, panel_hap, start, end) sorted in (query, site) report
    order - the same set as matchSequencesIndexed.  Device does the
    O(N(M+Q)) state evolution; the host expands intervals to haplotype ids
    with one streaming pass.
    """
    from ..core import native, engine
    M, N = Xp.shape
    Q = Xq.shape[0]
    # NB no haplotype padding here: pad rows would join match intervals and
    # leak phantom ids into reports (unlike the build scan, where all-ones
    # pads provably stay at the end of the sort and are sliced off)
    Mp = M
    cols = np.ascontiguousarray(Xp.T, dtype=np.uint8)
    qcols = np.ascontiguousarray(Xq.T, dtype=np.uint8)
    xp_bits = bitpack_rows(Xp)
    xq_bits = bitpack_rows(Xq)
    a0 = jnp.arange(Mp, dtype=jnp.int32)
    mask, es, fs, gs, _ = match_scan(jnp.asarray(cols), jnp.asarray(qcols),
                                     jnp.asarray(xq_bits), jnp.asarray(xp_bits),
                                     a0)
    mask = np.asarray(mask)
    es = np.asarray(es)
    fs = np.asarray(fs)
    gs = np.asarray(gs)

    # host pass: walk the panel once, expanding intervals into ids at each
    # site with a collapse record
    rows: list[tuple[int, int, int, int]] = []
    a = np.arange(Mp, dtype=np.int32)
    sites_with = [np.flatnonzero(mask[k]) for k in range(N + 1)]
    lib = native.get_lib()
    for k in range(N + 1):
        qs = sites_with[k]
        for qj in qs:
            e0, f0, g0 = int(es[k, qj]), int(fs[k, qj]), int(gs[k, qj])
            for i in range(f0, g0):
                rows.append((int(qj), int(a[i]), e0, k))
        if k < N:
            y = cols[k][a]
            if lib is not None:
                scratch = np.empty(Mp, np.int32)
                lib.fwd_a(a, np.ascontiguousarray(y), scratch, Mp)
            else:
                a = engine.forwards_a(a, y)
    return rows
