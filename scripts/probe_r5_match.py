"""Round-5 cost decomposition of one DeviceMatcher.match() call.

Splits the steady-state per-call time at each Q into: host input prep
(bitpack + pooled fills), device upload, the scan itself (fenced), the
flush+record fetches, and the host id expansion (record indices + device
gather + final filter).  The sum approximates match(); the deltas say
what to optimise next.

Usage: python scripts/probe_r5_match.py [M] [N] [Q ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def t():
    return time.perf_counter()


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    Qs = [int(q) for q in sys.argv[3:]] or [256, 1024, 4096]

    from bench import bench_match_data
    from pbwt_tpu.core import native
    from pbwt_tpu.ops import match_jax as mj

    Xp, Xq = bench_match_data(M, N, max(Qs))
    t0 = t()
    matcher = mj.DeviceMatcher(Xp)
    print(f"panel_up {t() - t0:.1f}s traj={matcher.traj is not None}",
          flush=True)
    assert matcher.traj is not None
    A_all, D8, DR, U8, C = matcher.traj
    Mp, Ns, nw = matcher.Mp, U8.shape[0], matcher.nw

    for Q in Qs:
        xq = Xq[:Q]
        matcher.match(xq)                  # compile + warm
        matcher.match(xq)
        t_all0 = t()
        rows = matcher.match(xq)
        t_all = t() - t_all0

        # --- decomposition ---
        t0 = t()
        xq_bits = mj.bitpack_rows(xq)
        xq_words_np = native.pooled_view((Q, nw), np.int32, "p:xqw")
        xq_words_np[:] = 0
        w = mj.pack_row_words(xq_bits)
        xq_words_np[:, :min(w.shape[1], nw)] = w[:, :nw]
        qcols = native.pooled_view((Ns, Q), np.uint8, "p:qcols")
        qcols[:N] = xq.T
        qcols[N:] = 0
        t_prep = t() - t0

        t0 = t()
        qcols_d = jnp.asarray(qcols)
        xqw_d = jnp.asarray(xq_words_np)
        jax.block_until_ready((qcols_d, xqw_d))
        t_up = t() - t0

        t0 = t()
        (e, f, g), recbuf, nrec_d = mj.match_scan_indexed(
            U8, D8, DR, A_all, C, qcols_d, xqw_d, matcher.xp_words,
            jnp.zeros(Q, jnp.int32), jnp.zeros(Q, jnp.int32),
            jnp.full(Q, Mp, jnp.int32), cap=mj._REC_CAP)
        jax.block_until_ready((e, nrec_d))
        t_scan = t() - t0

        t0 = t()
        packed = np.asarray(mj._pack_flush(e, f, g, nrec_d))
        nrec = int(packed[0])
        t_flush = t() - t0

        t0 = t()
        npad = min(mj._pow2_pad(max(nrec, 1)), mj._REC_CAP)
        rec = np.asarray(recbuf[:npad])
        t_recfetch = t() - t0

        t0 = t()
        si, se, sf, sg = (rec[:nrec, i] for i in range(4))
        rec_idx, rec_meta = matcher._record_indices(si, se, sf, sg, 0, Q,
                                                    Mp)
        e_h, f_h, g_h = packed[1:].reshape(3, Q)
        fl_idx, fl_meta = matcher._flush_indices(e_h, f_h, g_h, N, Q)
        t_hostexp = t() - t0

        n1, n2 = len(rec_idx), len(fl_idx)
        t0 = t()
        p1 = mj._pow2_pad(max(n1, 1))
        p2 = mj._pow2_pad(max(n2, 1)) if n2 else 1
        i1 = np.zeros(p1, np.int32)
        i1[:n1] = rec_idx
        i2 = np.zeros(p2, np.int32)
        i2[:n2] = fl_idx + Ns * Mp
        ids = np.asarray(mj._gather_two(A_all, jnp.asarray(i1), A_all,
                                        jnp.asarray(i2)))
        t_gather = t() - t0

        print(f"Q={Q}: match()={t_all:.3f}s | prep={t_prep * 1e3:.0f}ms "
              f"upload={t_up * 1e3:.0f}ms scan={t_scan * 1e3:.0f}ms "
              f"flush={t_flush * 1e3:.0f}ms recfetch={t_recfetch * 1e3:.0f}ms"
              f" hostexp={t_hostexp * 1e3:.0f}ms gather={t_gather * 1e3:.0f}"
              f"ms | nrec={nrec} rows={len(rows)} n1={n1}", flush=True)


if __name__ == "__main__":
    main()
