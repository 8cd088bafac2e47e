"""TPU device engine: ChromoPainter co-ancestry accumulation.

paintAncestryMatrix's hot loop (pbwtPaint.c:112-137) is, per recipient
haplotype and per site, a normalised (k-start)*(end-k) weighted vote over
covering match segments.  On device this is the same dense pass as
imputation (ops/impute_jax.py): per site-chunk, weights are closed-form
elementwise over the (segment, site) grid, the per-recipient normaliser is
a cumsum difference over the segment axis, and each segment's total
chunkcount / chunklength contributions reduce over the chunk axis.  The
region bookkeeping (chunksperregion boundaries) stays on the host where it
is a cheap per-segment walk.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("chunk",))
def _paint_chunk(seg_off, seg_s, seg_e, seg_self, seg_first, seg_last, k0,
                 chunk: int, N: int):
    """Per-segment chunkcount and chunklength contributions for sites
    [k0, k0+chunk).  seg_self masks self-matches (same individual) out of
    both the normaliser and the contributions.

    Segments are in the reference's report order (ascending end).  The
    reference scan stops at the first live segment whose start >= k
    (pbwtPaint.c:126: ``m->start < k`` over end-sorted segments), so a
    segment participates iff the running max of starts over live
    (end > k) predecessors within its recipient is < k - a segmented
    running max over the segment axis.

    Returns (counts, lengths): (nseg,) float32 totals over the chunk.
    """
    k = (k0 + jnp.arange(chunk, dtype=jnp.int32))[None, :].astype(jnp.float32)
    valid = (k >= 1) & (k < N)                   # reference loops k = 1..N-1
    s = seg_s[:, None].astype(jnp.float32)
    e = seg_e[:, None].astype(jnp.float32)

    live_start = jnp.where(e > k, s, -jnp.inf)   # (nseg, chunk)

    def combine(x, y):
        xv, xr = x
        yv, yr = y
        return jnp.where(yr, yv, jnp.maximum(xv, yv)), xr | yr

    resets = seg_first[:, None] & jnp.ones_like(valid)
    run_max, _ = jax.lax.associative_scan(combine, (live_start, resets),
                                          axis=0)
    included = run_max < k
    raw_w = (k - s) * (e - k)
    live = (s < k) & (e > k) & included
    # tail case: when every segment of a recipient has expired, the
    # reference's window pointer rests on the LAST segment and still adds
    # its (now negative) weight (pbwtPaint.c:114 m1 < mStop bound)
    tail = seg_last[:, None] & (e <= k) & (s < k)
    w = jnp.where((live | tail) & valid & ~seg_self[:, None], raw_w, 0.0)
    csum = jnp.concatenate(
        [jnp.zeros((1, chunk), jnp.float32), jnp.cumsum(w, axis=0)])
    ssum = csum[seg_off[1:]] - csum[seg_off[:-1]]        # (T, chunk)
    # normalised weight per (segment, site): w / sum_of_recipient
    rec_sum = jnp.repeat(ssum, jnp.diff(seg_off), axis=0,
                         total_repeat_length=w.shape[0])
    wn = jnp.where(rec_sum != 0, w / rec_sum, 0.0)
    lengths = jnp.sum(wn, axis=1)
    inv_len = 1.0 / jnp.maximum((e - s)[:, 0], 1.0)
    counts = lengths * inv_len
    return counts, lengths


def paint_totals_device(segments: np.ndarray, n_recipients: int, N: int,
                        map_ih: np.ndarray, chunk: int = 1024):
    """Total chunkcounts/chunklengths per (recipient hap, donor individual).

    segments: (nseg, 4) rows (recipient hap i, donor hap j, start, end).
    Returns (counts, lengths): (n_recipients_haps, n_inds) float64 matrices
    equal to the reference's per-site accumulation up to float ordering.
    """
    nseg = len(segments)
    # preserve the report order (ascending end) within each recipient - the
    # reference's scan-stop rule depends on it
    order = np.argsort(segments[:, 0], kind="stable")
    segs = segments[order]
    T = n_recipients
    cnt = np.bincount(segs[:, 0], minlength=T)
    off = np.zeros(T + 1, np.int32)
    np.cumsum(cnt, out=off[1:])
    seg_self = map_ih[segs[:, 0]] == map_ih[segs[:, 1]]
    first = np.zeros(nseg, bool)
    first[off[:-1][cnt > 0]] = True
    last = np.zeros(nseg, bool)
    last[off[1:][cnt > 0] - 1] = True
    seg_off = jnp.asarray(off)
    s_d = jnp.asarray(segs[:, 2].astype(np.int32))
    e_d = jnp.asarray(segs[:, 3].astype(np.int32))
    self_d = jnp.asarray(seg_self)
    first_d = jnp.asarray(first)
    last_d = jnp.asarray(last)

    tot_counts = np.zeros(nseg, np.float64)
    tot_lengths = np.zeros(nseg, np.float64)
    for k0 in range(0, N, chunk):
        c, l = _paint_chunk(seg_off, s_d, e_d, self_d, first_d, last_d,
                            k0, chunk, N)
        tot_counts += np.asarray(c, np.float64)
        tot_lengths += np.asarray(l, np.float64)

    n_inds = int(map_ih.max()) + 1
    counts = np.zeros((T, n_inds))
    lengths = np.zeros((T, n_inds))
    np.add.at(counts, (segs[:, 0], map_ih[segs[:, 1]]), tot_counts)
    np.add.at(lengths, (segs[:, 0], map_ih[segs[:, 1]]), tot_lengths)
    return counts, lengths
