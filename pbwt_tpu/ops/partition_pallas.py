"""Pallas TPU kernel: grouped PBWT column updates as stable partitions.

The reference hot loop (pbwtCursorForwardsA, pbwtCore.c:458-470) is an O(M)
stable two-bucket counting sort per site.  ``lax.sort`` implements it as a
bitonic network (O(M log^2 M) cross-lane stages, ~100 us/site at M=64k);
this kernel does the partition in O(M log M) VPU work with no sort and no
gather, processing a whole 32-site group per ``pallas_call``:

  * per-site key  = bit s of the packed group word (ops/build.py packs 32
    future sites per haplotype into one int32 carried in sort order),
  * within-row stable compaction of the zero/one classes by log-shift
    rounds (elements move by their remaining-shift bits, LSB first),
  * per-row rotation to the class's global lane offset (7 masked rolls),
  * vertical placement by OR-merging rows shifted to their destination
    row (zeros always move up since zoff_b <= 128b; ones always move
    down since c + ooff_b >= 128b).

Correctness of the log-shift moves rests on an injectivity lemma: for
monotone unit-step shift sequences processed LSB-first, elements can only
collide mid-flight if they share the same final destination, in which case
OR-merging is exact (their lanes are disjoint).

Emission: site s's sorted column is the key plane before partitioning; it
is packed 32 rows per int32 word (word[q, l] bit r' = key[32q + r', l])
with 5 roll-OR rounds and unpacked on the host by `unpack_sitewords_host`.

Measured on one v5e chip at M=65536: ~52 us/site end-to-end (with the
XLA-side two-sort word gather), vs ~108 us/site for the lax.sort grouped
path and ~640 us/site for gather+sort -- 1.27e9 hap-sites/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128          # TPU lane count; rows of the (R, 128) layout
GROUP = 32       # sites per packed word / per pallas_call


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _lane_cumsum_inclusive(x):
    """Prefix sum along lanes (7 log-shift rounds)."""
    li = _lane_iota(x.shape)
    for t in range(7):
        sh = 1 << t
        x = x + jnp.where(li >= sh, pltpu.roll(x, sh, axis=1), 0)
    return x


def _row_cumsum_exclusive(x):
    """Exclusive prefix sum over rows of a row-constant plane."""
    R = x.shape[0]
    ri = _row_iota(x.shape)
    y = x
    t = 0
    while (1 << t) < R:
        sh = 1 << t
        y = y + jnp.where(ri >= sh, pltpu.roll(y, sh, axis=0), 0)
        t += 1
    e = pltpu.roll(y, 1, axis=0)
    return jnp.where(ri >= 1, e, 0)


def _bcast_row_total(x):
    """Row-constant inclusive-cumsum plane -> plane filled with the grand
    total (log-max replication; Mosaic lacks 2-D broadcasts)."""
    R = x.shape[0]
    ri = _row_iota(x.shape)
    tot = pltpu.roll(x, 1, axis=0)
    y = jnp.where(ri == 0, tot, 0)
    t = 0
    while (1 << t) < R:
        y = jnp.maximum(y, pltpu.roll(y, 1 << t, axis=0))
        t += 1
    return y


def _compact_left(planes, rem):
    """Stable left-compaction within each row: lane j moves left by rem[j]
    (monotone non-decreasing per row; rem < 0 marks invalid lanes)."""
    for t in range(7):
        bit = 1 << t
        cand = [pltpu.roll(p, L - bit, axis=1) for p in planes]
        cand_rem = pltpu.roll(rem, L - bit, axis=1)
        li = _lane_iota(rem.shape)
        take = (li < (L - bit)) & (cand_rem >= 0) & ((cand_rem & bit) != 0)
        moved = (rem >= 0) & ((rem & bit) != 0)
        planes = [jnp.where(take, c, p) for c, p in zip(cand, planes)]
        rem = jnp.where(take, cand_rem - bit, jnp.where(moved, -1, rem))
    return planes


def _rotate_rows_right(planes, amounts):
    """Rotate each row right by its own amount (0..127, row-constant)."""
    for t in range(7):
        bit = 1 << t
        sel = (amounts & bit) != 0
        planes = [jnp.where(sel, pltpu.roll(p, bit, axis=1), p)
                  for p in planes]
    return planes


def _or_shift_up(planes, delta):
    """Move row b UP by delta[b] rows (monotone non-decreasing, unit steps),
    OR-merging rows that share a destination. Invalid lanes must be 0."""
    R = planes[0].shape[0]
    nb = max(1, (R - 1).bit_length())
    for t in range(nb):
        bit = 1 << t
        sh = R - bit
        cands = [pltpu.roll(p, sh, axis=0) for p in planes]
        cand_d = pltpu.roll(delta, sh, axis=0)
        ri = _row_iota(delta.shape)
        take = (ri < (R - bit)) & ((cand_d & bit) != 0)
        moved = (delta & bit) != 0
        planes = [jnp.where(moved, 0, p) | jnp.where(take, c, 0)
                  for c, p in zip(cands, planes)]
        delta = jnp.where(moved, 0, delta) | jnp.where(take, cand_d - bit, 0)
    return planes


def _or_shift_down(planes, delta):
    """Mirror of _or_shift_up: move rows DOWN (delta monotone non-increasing,
    unit steps)."""
    R = planes[0].shape[0]
    nb = max(1, (R - 1).bit_length())
    for t in range(nb):
        bit = 1 << t
        cands = [pltpu.roll(p, bit, axis=0) for p in planes]
        cand_d = pltpu.roll(delta, bit, axis=0)
        ri = _row_iota(delta.shape)
        take = (ri >= bit) & ((cand_d & bit) != 0)
        moved = (delta & bit) != 0
        planes = [jnp.where(moved, 0, p) | jnp.where(take, c, 0)
                  for c, p in zip(cands, planes)]
        delta = jnp.where(moved, 0, delta) | jnp.where(take, cand_d - bit, 0)
    return planes


def _rank_consts(R):
    """Constant matrices for the MXU rank computation (hoisted per group).
    All counts fit exactly in f32 (values <= M < 2^24)."""
    lt_lanes = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) <=
                jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
                ).astype(jnp.float32)
    lstrict = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) <
               jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
               ).astype(jnp.float32)
    ones_rr = jnp.ones((R, R), jnp.float32)
    return lt_lanes, lstrict, ones_rr


def _partition_planes(planes, key, consts):
    """One stable partition of a list of planes by the binary key plane.
    Returns (new_planes, cfull) with cfull = zero count replicated
    everywhere.

    Ranks and prefix offsets ride the MXU: inclusive lane rank = key @
    upper-triangular ones, row offsets = strict-lower-triangular @ row
    sums, grand total = ones @ row sums."""
    lt_lanes, lstrict, ones_rr = consts
    li = _lane_iota(key.shape)
    ri = _row_iota(key.shape)
    kf = key.astype(jnp.float32)
    onr_f = jax.lax.dot_general(kf, lt_lanes, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    onr = onr_f.astype(jnp.int32)                 # inclusive one rank
    zr = (li + 1) - onr                           # inclusive zero rank
    cb_col = 128.0 - onr_f[:, L - 1:L]            # (R,1) zeros per row
    ob_col = onr_f[:, L - 1:L]
    rhs = jnp.concatenate([cb_col, ob_col], axis=1)
    offs = jax.lax.dot_general(lstrict, rhs, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    tot = jax.lax.dot_general(ones_rr, cb_col, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    zoff = jnp.broadcast_to(offs[:, 0:1], key.shape).astype(jnp.int32)
    ooff = jnp.broadcast_to(offs[:, 1:2], key.shape).astype(jnp.int32)
    cfull = jnp.broadcast_to(tot, key.shape).astype(jnp.int32)
    cb = jnp.broadcast_to(cb_col, key.shape).astype(jnp.int32)
    ob = jnp.broadcast_to(ob_col, key.shape).astype(jnp.int32)

    def place(valid, rank_incl, nvals, gstart, up):
        rem = jnp.where(valid, li + 1 - rank_incl, -1)
        cp = _compact_left(planes, rem)
        start = gstart % L
        cp = _rotate_rows_right(cp, start)
        in_seg = ((li - start) % L) < nvals
        m1 = in_seg & (li >= start)
        m2 = in_seg & (li < start)
        dest = gstart // L
        if up:
            # zeros: m2(R-1) can be nonempty (the zero region may end with a
            # wrapped segment below the last row boundary), so the wrapped
            # part keeps its own shift pass.
            dA = ri - dest
            dB = jnp.maximum(ri - dest - 1, 0)
            o1 = _or_shift_up([jnp.where(m1, c, 0) for c in cp], dA)
            o2 = _or_shift_up([jnp.where(m2, c, 0) for c in cp], dB)
            return [x | y for x, y in zip(o1, o2)]
        # ones: m2(R-1) is provably empty (the last row's one segment starts
        # at gstart >= 128(R-1) and ends at M, so it never wraps) and a
        # nonempty m2(b) forces dest_{b+1} = dest_b + 1 with complementary
        # lanes, so the wrapped part folds one row down into the m1 plane
        # and both ride a single shift pass.
        vs = [jnp.where(m1, c, 0)
              | jnp.where(ri >= 1, pltpu.roll(jnp.where(m2, c, 0), 1,
                                              axis=0), 0)
              for c in cp]
        return _or_shift_down(vs, dest - ri)

    zs = place(key == 0, zr, cb, zoff, True)
    os_ = place(key == 1, onr, ob, cfull + ooff, False)
    return [x | y for x, y in zip(zs, os_)], cfull


def _partition_once(a, w, key, consts):
    """Stable partition of the (a, w) planes (compat wrapper)."""
    (a2, w2), cfull = _partition_planes([a, w], key, consts)
    return a2, w2, cfull


def _make_group_kernel(R):
    Rw = R // GROUP

    def kernel(w_ref, a_ref, a_out, w_out, y_out, cnt_out):
        consts = _rank_consts(R)

        def site_step(s, carry):
            a, w = carry
            key = jax.lax.shift_right_logical(w, s) & 1
            # pack site's sorted column: word[q, l] bit r' = key[32q+r', l]
            x = key
            for sh in (1, 2, 4, 8, 16):
                x = x | (pltpu.roll(x, R - sh, axis=0) << sh)
            for q in range(Rw):
                y_out[pl.ds(s, 1), q, :] = x[GROUP * q:GROUP * q + 1, :]
            a, w, cfull = _partition_once(a, w, key, consts)
            cnt_out[s] = cfull[0, 0]
            return a, w

        a, w = jax.lax.fori_loop(0, GROUP, site_step, (a_ref[:], w_ref[:]))
        a_out[:] = a
        w_out[:] = w

    return kernel


def _seg_running_max(vals, resets):
    """Inclusive running max over the row-major linear order that restarts
    at each position where ``resets`` is True (segment = [reset, next)).
    Two-level: within-row log-shift segmented scan, then a row-level
    segmented combine carried in."""
    R = vals.shape[0]
    li = _lane_iota(vals.shape)
    ri = _row_iota(vals.shape)
    V, F = vals, resets.astype(jnp.int32)   # flags as i32 (Mosaic rolls)
    for t in range(7):
        sh = 1 << t
        Vs = pltpu.roll(V, sh, axis=1)
        Fs = pltpu.roll(F, sh, axis=1)
        ok = li >= sh
        V = jnp.where(ok & (F == 0), jnp.maximum(V, Vs), V)
        F = F | jnp.where(ok, Fs, 0)
    # row summaries (broadcast along lanes): end-of-row value and any-reset
    Vin = jnp.broadcast_to(V[:, L - 1:L], V.shape)
    Fin = jnp.broadcast_to(F[:, L - 1:L], F.shape)
    # exclusive row-level segmented scan of (Vend, Fany)
    t = 0
    while (1 << t) < R:
        sh = 1 << t
        Vs = pltpu.roll(Vin, sh, axis=0)
        Fs = pltpu.roll(Fin, sh, axis=0)
        ok = ri >= sh
        Vin = jnp.where(ok & (Fin == 0), jnp.maximum(Vin, Vs), Vin)
        Fin = Fin | jnp.where(ok, Fs, 0)
        t += 1
    Vin = pltpu.roll(Vin, 1, axis=0)   # exclusive: carry from previous rows
    Vin = jnp.where(ri >= 1, Vin, jnp.zeros_like(Vin))
    return jnp.where(F != 0, V, jnp.maximum(V, Vin))


def _make_ad_kernel(R):
    """Per-site kernel for cursors that need the divergence array:
    one stable partition of (a, d, w) by bit s of w, plus the reference's
    divergence update (pbwtCursorForwardsAD, pbwtCore.c:485-508) and the
    global exclusive zero-rank table for FM-style rank lookups."""

    def kernel(a_ref, d_ref, w_ref, s_ref, a_out, d_out, w_out, u_out,
               cnt_out):
        lt_lanes = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) <=
                    jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
                    ).astype(jnp.float32)
        a, d, w = a_ref[:], d_ref[:], w_ref[:]
        s = s_ref[0]
        kk = s_ref[1]
        key = jax.lax.shift_right_logical(w, s) & 1
        li = _lane_iota(key.shape)
        ri = _row_iota(key.shape)
        # divergence payload: p/q segmented maxima seeded with k+1 at pos 0
        seed = jnp.where((ri == 0) & (li == 0), jnp.maximum(d, kk + 1), d)
        prev0 = pltpu.roll(1 - key, 1, axis=1)
        prev0 = jnp.where(li == 0, pltpu.roll(prev0, 1, axis=0), prev0)
        prev0 = jnp.where((ri == 0) & (li == 0), 0, prev0)
        prev1 = pltpu.roll(key, 1, axis=1)
        prev1 = jnp.where(li == 0, pltpu.roll(prev1, 1, axis=0), prev1)
        prev1 = jnp.where((ri == 0) & (li == 0), 0, prev1)
        p = _seg_running_max(seed, prev0)
        q = _seg_running_max(seed, prev1)
        pq = jnp.where(key == 0, p, q)

        # (R,R) matmul row scans would need O(R^2) VMEM; at matcher sizes
        # (R up to ~1k) log-shift scans on row-constant planes fit easily
        kf = key.astype(jnp.float32)
        onr_f = jax.lax.dot_general(kf, lt_lanes, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        onr = onr_f.astype(jnp.int32)
        zr = (li + 1) - onr
        cb = jnp.broadcast_to(128 - onr[:, L - 1:L], key.shape)
        ob = jnp.broadcast_to(onr[:, L - 1:L], key.shape)
        zoff = _row_cumsum_exclusive(cb)
        ooff = _row_cumsum_exclusive(ob)
        cfull = _bcast_row_total(zoff + cb)
        cnt_out[0] = cfull[0, 0]
        # global exclusive zero rank (the FM rank table u[])
        u_out[:] = zoff + zr - (1 - key)

        def place(valid, rank_incl, nvals, gstart, up):
            rem = jnp.where(valid, li + 1 - rank_incl, -1)
            ca, cd, cw = _compact_left([a, pq, w], rem)
            start = gstart % L
            ca, cd, cw = _rotate_rows_right([ca, cd, cw], start)
            in_seg = ((li - start) % L) < nvals
            m1 = in_seg & (li >= start)
            m2 = in_seg & (li < start)
            dest = gstart // L
            if up:
                dA = ri - dest
                dB = jnp.maximum(ri - dest - 1, 0)
                o1 = _or_shift_up([jnp.where(m1, ca, 0), jnp.where(m1, cd, 0),
                                   jnp.where(m1, cw, 0)], dA)
                o2 = _or_shift_up([jnp.where(m2, ca, 0), jnp.where(m2, cd, 0),
                                   jnp.where(m2, cw, 0)], dB)
                return [x | y for x, y in zip(o1, o2)]
            va = jnp.where(m1, ca, 0)
            vd = jnp.where(m1, cd, 0)
            vw = jnp.where(m1, cw, 0)
            va2, vd2, vw2 = (jnp.where(m2, x, 0) for x in (ca, cd, cw))
            va = va | jnp.where(ri >= 1, pltpu.roll(va2, 1, axis=0), 0)
            vd = vd | jnp.where(ri >= 1, pltpu.roll(vd2, 1, axis=0), 0)
            vw = vw | jnp.where(ri >= 1, pltpu.roll(vw2, 1, axis=0), 0)
            return _or_shift_down([va, vd, vw], dest - ri)

        za, zd, zw = place(key == 0, zr, cb, zoff, True)
        oa, od, ow = place(key == 1, onr, ob, cfull + ooff, False)
        d_new = zd | od
        d_new = jnp.where((ri == 0) & (li == 0), kk + 2, d_new)
        a_out[:] = za | oa
        d_out[:] = d_new
        w_out[:] = zw | ow

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def partition_ad_step(a, d, w, s, kk, interpret=False):
    """One divergence-carrying partition step on (R, 128) planes.

    a, d, w: (R, 128) int32 in current sort order (R a multiple of 32);
    s: bit index of the site within w; kk: global site index.
    Returns (a', d', w', u (R, 128) global exclusive zero ranks, count).
    """
    R = a.shape[0]
    sk = jnp.stack([jnp.asarray(s, jnp.int32), jnp.asarray(kk, jnp.int32)])
    return pl.pallas_call(
        _make_ad_kernel(R),
        out_shape=(jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a, d, w, sk)


def _running_or_incl(F):
    """Inclusive running OR of an int 0/1 plane over the row-major linear
    order (two-level: lane log-shift rounds + row-level carry)."""
    R = F.shape[0]
    li = _lane_iota(F.shape)
    ri = _row_iota(F.shape)
    for t in range(7):
        sh = 1 << t
        F = F | jnp.where(li >= sh, pltpu.roll(F, sh, axis=1), 0)
    Fin = jnp.broadcast_to(F[:, L - 1:L], F.shape)
    t = 0
    while (1 << t) < R:
        sh = 1 << t
        Fin = Fin | jnp.where(ri >= sh, pltpu.roll(Fin, sh, axis=0), 0)
        t += 1
    Fex = pltpu.roll(Fin, 1, axis=0)
    Fex = jnp.where(ri >= 1, Fex, 0)
    return F | Fex


def _make_ad_kernel_blocked(R, Rb):
    """Divergence-carrying per-site partition for R beyond the monolithic
    kernel's VMEM reach (R > ~4096 on v5e).

    Same math as _make_ad_kernel, restructured so every intermediate is
    (Rb, 128) instead of (R, 128): rows are processed in R/Rb blocks with
    scalar cross-block carries (zero counts, segmented-max state, boundary
    key), and each block's zero/one classes are placed into (R+Rb+8, 128)
    VMEM accumulator planes with dynamic-offset read-OR-write windows.
    Mosaic executes the unrolled block loop sequentially, so the
    overlapping boundary-row writes are race-free.
    """
    B = R // Rb
    SR = R + Rb + 8

    def kernel(a_ref, d_ref, w_ref, s_ref, a_out, d_out, w_out, u_out,
               cnt_out, acc_a, acc_d, acc_w):
        lt_lanes = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) <=
                    jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
                    ).astype(jnp.float32)
        s = s_ref[0]
        kk = s_ref[1]
        li = _lane_iota((Rb, L))
        ri = _row_iota((Rb, L))

        zero_blk = jnp.zeros((Rb, L), jnp.int32)
        for b in range(SR // Rb):
            acc_a[b * Rb:(b + 1) * Rb, :] = zero_blk
            acc_d[b * Rb:(b + 1) * Rb, :] = zero_blk
            acc_w[b * Rb:(b + 1) * Rb, :] = zero_blk
        rem_rows = SR - (SR // Rb) * Rb
        if rem_rows:
            acc_a[SR - rem_rows:SR, :] = zero_blk[:rem_rows]
            acc_d[SR - rem_rows:SR, :] = zero_blk[:rem_rows]
            acc_w[SR - rem_rows:SR, :] = zero_blk[:rem_rows]

        def ranks(key):
            """Per-row inclusive one-rank + row class counts + in-block
            exclusive row offsets (all row-constant planes)."""
            kf = key.astype(jnp.float32)
            onr = jax.lax.dot_general(
                kf, lt_lanes, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            zr = (li + 1) - onr
            ob = jnp.broadcast_to(onr[:, L - 1:L], key.shape)
            cb = L - ob
            zoffl = _row_cumsum_exclusive(cb)
            ooffl = _row_cumsum_exclusive(ob)
            return onr, zr, cb, ob, zoffl, ooffl

        # pass 1: zeros per block (scalar carries for global offsets)
        zc = []
        for b in range(B):
            key = jax.lax.shift_right_logical(
                w_ref[b * Rb:(b + 1) * Rb, :], s) & 1
            _, _, cb, _, zoffl, _ = ranks(key)
            zc.append((zoffl + cb)[Rb - 1, 0])
        Z = [jnp.int32(0)]
        for b in range(B):
            Z.append(Z[-1] + zc[b])
        C = Z[B]
        cnt_out[0] = C

        # pass 2: per-block divergence payload, ranks, u, and placement
        carry_p = jnp.int32(0)
        carry_q = jnp.int32(0)
        carry_k = jnp.int32(0)
        for b in range(B):
            a_b = a_ref[b * Rb:(b + 1) * Rb, :]
            d_b = d_ref[b * Rb:(b + 1) * Rb, :]
            w_b = w_ref[b * Rb:(b + 1) * Rb, :]
            key = jax.lax.shift_right_logical(w_b, s) & 1
            first = (ri == 0) & (li == 0)
            if b == 0:
                seed = jnp.where(first, jnp.maximum(d_b, kk + 1), d_b)
            else:
                seed = d_b

            def boundary_flags(base, carry_is):
                f = pltpu.roll(base, 1, axis=1)
                f = jnp.where(li == 0, pltpu.roll(f, 1, axis=0), f)
                if b == 0:
                    return jnp.where(first, 0, f)
                return jnp.where(first, carry_is, f)

            prev0 = boundary_flags(1 - key, (carry_k == 0).astype(jnp.int32))
            prev1 = boundary_flags(key, (carry_k == 1).astype(jnp.int32))
            p = _seg_running_max(seed, prev0)
            q = _seg_running_max(seed, prev1)
            if b > 0:
                seen0 = _running_or_incl(prev0)
                seen1 = _running_or_incl(prev1)
                p = jnp.where(seen0 != 0, p, jnp.maximum(p, carry_p))
                q = jnp.where(seen1 != 0, q, jnp.maximum(q, carry_q))
            carry_p = p[Rb - 1, L - 1]
            carry_q = q[Rb - 1, L - 1]
            carry_k = key[Rb - 1, L - 1]
            pq = jnp.where(key == 0, p, q)

            onr, zr, cb, ob, zoffl, ooffl = ranks(key)
            u_out[b * Rb:(b + 1) * Rb, :] = Z[b] + zoffl + zr - (1 - key)

            def place_blk(valid, rank_incl, nvals, goff, offl, total):
                """Place this block's class into the accumulators.

                goff: scalar global start of the class segment for this
                block; offl: row-constant in-block exclusive offsets;
                total: scalar class count in this block.  Returns the
                (Rb, 128) placed planes, the window base row, the folded
                last-row spill planes, and its row."""
                WB = goff // L
                rel = (goff % L) + offl            # row-constant, < 256*Rb
                startl = rel % L
                ldr = rel // L                      # local dest row per row
                rem = jnp.where(valid, li + 1 - rank_incl, -1)
                ca, cd, cw = _compact_left([a_b, pq, w_b], rem)
                ca, cd, cw = _rotate_rows_right([ca, cd, cw], startl)
                in_seg = ((li - startl) % L) < nvals
                m1 = in_seg & (li >= startl)
                m2 = in_seg & (li < startl)
                # m2 (lane-wrapped) parts belong one row below their m1
                # row: fold them down one row (the ones-case trick of
                # _make_ad_kernel.place); source row Rb-1's fold-down
                # leaves the plane and is written as its own 1-row window
                planes = []
                spills = []
                for x in (ca, cd, cw):
                    x1 = jnp.where(m1, x, 0)
                    x2 = jnp.where(m2, x, 0)
                    planes.append(
                        x1 | jnp.where(ri >= 1, pltpu.roll(x2, 1, axis=0), 0))
                    spills.append(x2[Rb - 1:Rb, :])
                delta = ri - ldr
                placed = _or_shift_up(planes, delta)
                # spill destination: continue the same dest-row formula at
                # padded row Rb
                dlast = ((goff % L) + total) // L
                return placed, WB, spills, WB + dlast

            def write_window(placed, WB, spills, srow):
                cur_a = acc_a[pl.ds(WB, Rb), :]
                cur_d = acc_d[pl.ds(WB, Rb), :]
                cur_w = acc_w[pl.ds(WB, Rb), :]
                acc_a[pl.ds(WB, Rb), :] = cur_a | placed[0]
                acc_d[pl.ds(WB, Rb), :] = cur_d | placed[1]
                acc_w[pl.ds(WB, Rb), :] = cur_w | placed[2]
                sa = acc_a[pl.ds(srow, 1), :]
                sd = acc_d[pl.ds(srow, 1), :]
                sw = acc_w[pl.ds(srow, 1), :]
                acc_a[pl.ds(srow, 1), :] = sa | spills[0]
                acc_d[pl.ds(srow, 1), :] = sd | spills[1]
                acc_w[pl.ds(srow, 1), :] = sw | spills[2]

            O_b = jnp.int32(b * Rb * L) - Z[b]
            write_window(*place_blk(key == 0, zr, cb, Z[b], zoffl, zc[b]))
            write_window(*place_blk(key == 1, onr, ob, C + O_b, ooffl,
                                    jnp.int32(Rb * L) - zc[b]))

        ri_f = _row_iota((Rb, L))
        li_f = _lane_iota((Rb, L))
        for b in range(B):
            a_out[b * Rb:(b + 1) * Rb, :] = acc_a[b * Rb:(b + 1) * Rb, :]
            dv = acc_d[b * Rb:(b + 1) * Rb, :]
            if b == 0:
                dv = jnp.where((ri_f == 0) & (li_f == 0), kk + 2, dv)
            d_out[b * Rb:(b + 1) * Rb, :] = dv
            w_out[b * Rb:(b + 1) * Rb, :] = acc_w[b * Rb:(b + 1) * Rb, :]

    return kernel


def blocked_rb(R: int) -> int:
    """Block row count for partition_ad_step_blocked: the largest
    power-of-two divisor of R capped at 1024 (env PBWT_TPU_BLOCK_RB).
    Returns 0 when R's divisor structure makes blocking unprofitable
    (tiny blocks = huge unrolled loops); lowering the env cap also lowers
    that floor so tests can force the blocked path on small planes."""
    import os

    cap = int(os.environ.get("PBWT_TPU_BLOCK_RB", "1024"))
    rb = min(R & -R, cap)            # largest power-of-2 divisor, capped
    return rb if rb >= min(256, cap) else 0


@functools.partial(jax.jit, static_argnames=("rb", "interpret"))
def partition_ad_step_blocked(a, d, w, s, kk, rb=None, interpret=False):
    """partition_ad_step for large R: block-processed per-site kernel.

    Identical outputs to partition_ad_step; VMEM intermediates are
    (rb, 128)-sized so R is bounded by plane storage (7 R-sized planes +
    block temporaries) rather than by full-plane log-shift liveness.
    """
    R = a.shape[0]
    if rb is None:
        rb = blocked_rb(R)
    assert R % rb == 0, (R, rb)
    sk = jnp.stack([jnp.asarray(s, jnp.int32), jnp.asarray(kk, jnp.int32)])
    return pl.pallas_call(
        _make_ad_kernel_blocked(R, rb),
        out_shape=(jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((R + rb + 8, L), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(a, d, w, sk)


def _make_group_kernel_noa(R):
    """Group kernel without the prefix-array plane: the caller advances
    `a` with one stable XLA sort per group keyed by the unsigned packed
    word (the LSD-radix identity: 32 bit-partitions == one stable sort by
    the word value), so the kernel only moves the word plane."""
    Rw = R // GROUP

    def kernel(w_ref, w_out, y_out, cnt_out):
        consts = _rank_consts(R)

        def site_step(s, w):
            key = jax.lax.shift_right_logical(w, s) & 1
            x = key
            for sh in (1, 2, 4, 8, 16):
                x = x | (pltpu.roll(x, R - sh, axis=0) << sh)
            for q in range(Rw):
                y_out[pl.ds(s, 1), q, :] = x[GROUP * q:GROUP * q + 1, :]
            (w,), cfull = _partition_planes([w], key, consts)
            cnt_out[s] = cfull[0, 0]
            return w

        w = jax.lax.fori_loop(0, GROUP, site_step, w_ref[:])
        w_out[:] = w

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def group_partition_noa(w, interpret=False):
    """Partition 32 sites of the word plane only; see _make_group_kernel_noa.
    Returns (w', sitewords (32, R//32, 128) int32, counts (32,))."""
    R = w.shape[0]
    return pl.pallas_call(
        _make_group_kernel_noa(R),
        out_shape=(jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((GROUP, R // GROUP, L), jnp.int32),
                   jax.ShapeDtypeStruct((GROUP,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def build_scan_pallas_noa(W: jnp.ndarray, a0: jnp.ndarray, interpret=False):
    """build_scan_pallas variant with the word-only kernel; `a` advances
    via one stable u32-key sort per group in XLA."""
    Ng, Mp = W.shape
    R = Mp // L
    iota = jnp.arange(Mp, dtype=jnp.int32)

    def sort_gather(w_nat, a):
        _, inv = jax.lax.sort((a, iota), num_keys=1, is_stable=True)
        _, r = jax.lax.sort((inv, w_nat), num_keys=1, is_stable=True)
        return r

    def group_step(a, w_nat):
        w = sort_gather(w_nat, a)
        _, ywords, cnts = group_partition_noa(w.reshape(R, L),
                                              interpret=interpret)
        wkey = jax.lax.bitcast_convert_type(w, jnp.uint32)
        _, a_n = jax.lax.sort((wkey, a), num_keys=1, is_stable=True)
        return a_n, (ywords, cnts)

    a_end, (ywords, counts) = jax.lax.scan(group_step, a0, W)
    return (ywords.reshape(Ng * GROUP, R // GROUP, L),
            counts.reshape(Ng * GROUP), a_end)


def _make_group_kernel_noa2(R):
    """Two-word variant: partitions by bits of w0 while carrying w1 along
    (used for the first half of a 64-site group; the second half runs the
    single-word kernel on w1)."""
    Rw = R // GROUP

    def kernel(w0_ref, w1_ref, w0_out, w1_out, y_out, cnt_out):
        consts = _rank_consts(R)

        def site_step(s, carry):
            w0, w1 = carry
            key = jax.lax.shift_right_logical(w0, s) & 1
            x = key
            for sh in (1, 2, 4, 8, 16):
                x = x | (pltpu.roll(x, R - sh, axis=0) << sh)
            for q in range(Rw):
                y_out[pl.ds(s, 1), q, :] = x[GROUP * q:GROUP * q + 1, :]
            (w0, w1), cfull = _partition_planes([w0, w1], key, consts)
            cnt_out[s] = cfull[0, 0]
            return w0, w1

        w0, w1 = jax.lax.fori_loop(0, GROUP, site_step,
                                   (w0_ref[:], w1_ref[:]))
        w0_out[:] = w0
        w1_out[:] = w1

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def group_partition_noa2(w0, w1, interpret=False):
    R = w0.shape[0]
    return pl.pallas_call(
        _make_group_kernel_noa2(R),
        out_shape=(jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((GROUP, R // GROUP, L), jnp.int32),
                   jax.ShapeDtypeStruct((GROUP,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w0, w1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def build_scan_pallas_noa64(W: jnp.ndarray, a0: jnp.ndarray,
                            interpret=False):
    """64-site-group variant: both group words are aligned with one
    two-payload sort-gather and `a` advances with one stable two-key sort
    per 64 sites (LSD-radix identity over both words), halving the
    XLA-side sort overhead per site. Requires an even word count."""
    Ng, Mp = W.shape
    assert Ng % 2 == 0
    R = Mp // L
    iota = jnp.arange(Mp, dtype=jnp.int32)
    Wp = W.reshape(Ng // 2, 2, Mp)

    def group_step(a, w_nat2):
        _, inv = jax.lax.sort((a, iota), num_keys=1, is_stable=True)
        _, w0, w1 = jax.lax.sort((inv, w_nat2[0], w_nat2[1]), num_keys=1,
                                 is_stable=True)
        _, w1b, yw0, c0 = group_partition_noa2(
            w0.reshape(R, L), w1.reshape(R, L), interpret=interpret)
        _, yw1, c1 = group_partition_noa(w1b, interpret=interpret)
        k1 = jax.lax.bitcast_convert_type(w1, jnp.uint32)
        k0 = jax.lax.bitcast_convert_type(w0, jnp.uint32)
        _, _, a_n = jax.lax.sort((k1, k0, a), num_keys=2, is_stable=True)
        return a_n, (jnp.concatenate([yw0, yw1]),
                     jnp.concatenate([c0, c1]))

    a_end, (ywords, counts) = jax.lax.scan(group_step, a0, Wp)
    return (ywords.reshape(Ng * GROUP, R // GROUP, L),
            counts.reshape(Ng * GROUP), a_end)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def group_partition(w, a, interpret=False):
    """Partition 32 sites (bits of ``w``) in one kernel call.

    w, a: (R, 128) int32, R a multiple of 32, in current sort order.
    Returns (a', w', sitewords (32, R//32, 128) int32, counts (32,)).
    """
    R = w.shape[0]
    return pl.pallas_call(
        _make_group_kernel(R),
        out_shape=(jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((R, L), jnp.int32),
                   jax.ShapeDtypeStruct((GROUP, R // GROUP, L), jnp.int32),
                   jax.ShapeDtypeStruct((GROUP,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(w, a)


@functools.partial(jax.jit, static_argnames=("interpret",))
def build_scan_pallas(W: jnp.ndarray, a0: jnp.ndarray, interpret=False):
    """Grouped PBWT construction with the Pallas partition kernel.

    W: (Ng, Mp) int32 packed group words (ops/build.pack_group_words);
    Mp must be a multiple of 4096 (R = Mp/128 a multiple of 32).
    Returns (sitewords (Ng*32, Mp//4096, 128) int32, counts, a_end).
    """
    Ng, Mp = W.shape
    R = Mp // L
    iota = jnp.arange(Mp, dtype=jnp.int32)

    def sort_gather(w_nat, a):
        _, inv = jax.lax.sort((a, iota), num_keys=1, is_stable=True)
        _, r = jax.lax.sort((inv, w_nat), num_keys=1, is_stable=True)
        return r

    def group_step(a, w_nat):
        w = sort_gather(w_nat, a)
        a_n, _, ywords, cnts = group_partition(
            w.reshape(R, L), a.reshape(R, L), interpret=interpret)
        return a_n.reshape(-1), (ywords, cnts)

    a_end, (ywords, counts) = jax.lax.scan(group_step, a0, W)
    return (ywords.reshape(Ng * GROUP, R // GROUP, L),
            counts.reshape(Ng * GROUP), a_end)


def unpack_sitewords_host(ywords: np.ndarray, M: int) -> np.ndarray:
    """(N, Rw, 128) int32 site words -> (N, M) uint8 sorted columns.

    Element i = r*128 + l of site s is bit (r % 32) of ywords[s, r//32, l].
    """
    N = ywords.shape[0]
    u = np.asarray(ywords).view(np.uint32)
    bits = (u[:, :, None, :] >> np.arange(32, dtype=np.uint32)[None, None, :, None]) & 1
    return bits.reshape(N, -1)[:, :M].astype(np.uint8)
