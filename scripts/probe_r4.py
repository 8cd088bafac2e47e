"""Round-4 on-chip cost decomposition of the standing-panel matcher.

Splits the Q=4096 slowdown and the 600-s first-call compile into parts:

  traj      DeviceMatcher init with an explicit block on the trajectory
            arrays (compile + execute time of panel_trajectory)
  compile   first match() per Q (match_scan_indexed + packer compile)
  floor     variant scan with resets disabled: FM rank step + records only
  nofall    variant scan with the while_loop fallbacks pruned: windowed
            resets only (timing probe; rows may differ)
  pack      _pack_segment_results / _compact_records alone at each Q
  rowgather K x 8-word contiguous row gather vs element gather

Usage: python scripts/probe_r4.py [stage...]   (default: all)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def emit(**obj):
    print(json.dumps(obj), flush=True)


def block(x):
    jax.tree_util.tree_map(lambda v: np.asarray(v[..., :1]), x)


def main():
    stages = sys.argv[1:] or ["traj", "floor", "nofall", "pack", "rowgather",
                              "full"]
    from pbwt_tpu.ops import match_jax
    from bench import bench_match_data

    M, N = 100_000, 2048
    Qs = (256, 1024, 4096)
    Xp, Xq = bench_match_data(M, N, max(Qs))

    t0 = time.perf_counter()
    matcher = match_jax.DeviceMatcher(Xp)
    t_init = time.perf_counter() - t0
    A_all, D, DR, U, C = matcher.traj
    t0 = time.perf_counter()
    block((A_all, D, DR, U, C))
    emit(stage="traj", init_s=round(t_init, 1),
         traj_block_s=round(time.perf_counter() - t0, 1))

    Mp, Ns, nw = matcher.Mp, U.shape[0], matcher.nw
    xpf = matcher.xp_words.reshape(-1)

    def qinputs(Q):
        xq = Xq[:Q]
        xq_bits = match_jax.bitpack_rows(xq)
        xq_words_np = np.zeros((Q, nw), np.int32)
        w = match_jax.pack_row_words(xq_bits)
        xq_words_np[:, :min(w.shape[1], nw)] = w[:, :nw]
        qcols = np.zeros((Ns, Q), dtype=np.uint8)
        qcols[:N] = xq.T
        return jnp.asarray(qcols), jnp.asarray(xq_words_np)

    def variant_scan(reset_mode):
        """reset_mode: 'off' (floor) or 'nofall' (windowed resets only)."""

        @jax.jit
        def run(U, D, A_all, C, qcols, xq_words, e, f, g):
            Q = qcols.shape[1]
            xqf = xq_words.reshape(-1)
            qrows = jnp.arange(Q, dtype=jnp.int32)
            kks = jnp.arange(Ns, dtype=jnp.int32)

            def site_step(carry, xs):
                e, f, g = carry
                u8, c, xk, kk = xs
                fg = jnp.concatenate([f, g])
                ufg = jnp.where(
                    fg == Mp, c,
                    match_jax._mxu_gather_u8planes(u8,
                                                   jnp.minimum(fg, Mp - 1)))
                fg1 = jnp.where(jnp.concatenate([xk, xk]) != 0,
                                c + fg - ufg, ufg)
                f1, g1 = fg1[:Q], fg1[Q:]
                collapsed = g1 <= f1
                rec = (collapsed, e, f, g)
                if reset_mode == "off":
                    # keep intervals live without a reset: reopen to full
                    f2 = jnp.where(collapsed, 0, f1)
                    g2 = jnp.where(collapsed, Mp, g1)
                    e2 = jnp.where(collapsed, kk + 1, e)
                    return (e2, f2, g2), rec

                def do_reset(op):
                    collapsed, e, f1, g1, kk, qrows = op
                    dflat = jax.lax.dynamic_slice_in_dim(D, kk, 1)[0]
                    aflat = jax.lax.dynamic_slice_in_dim(A_all, kk + 1, 1)[0]
                    d8 = match_jax._u8_digit_planes(dflat.reshape(-1, 128))
                    a8 = match_jax._u8_digit_planes(aflat.reshape(-1, 128))
                    return match_jax._reset_windowed(
                        (collapsed, e, f1, g1, dflat, d8, a8, kk, qrows),
                        xqf, xpf, nw, Mp)

                e, f, g = jax.lax.cond(
                    jnp.any(collapsed), do_reset,
                    lambda op: (op[1], op[2], op[3]),
                    (collapsed, e, f1, g1, kk, qrows))
                return (e, f, g), rec

            return jax.lax.scan(site_step, (e, f, g), (U, C, qcols, kks))

        return run

    import pbwt_tpu.ops.match_jax as mj

    for Q in Qs:
        qcols, xq_words = qinputs(Q)
        e0 = jnp.zeros(Q, jnp.int32)
        f0 = jnp.zeros(Q, jnp.int32)
        g0 = jnp.full(Q, Mp, jnp.int32)

        if "floor" in stages:
            run = variant_scan("off")
            t0 = time.perf_counter()
            out = run(U, D, A_all, C, qcols, xq_words, e0, f0, g0)
            block(out)
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = run(U, D, A_all, C, qcols, xq_words, e0, f0, g0)
            block(out)
            dt = time.perf_counter() - t0
            emit(stage="floor", Q=Q, compile_s=round(comp, 1),
                 s=round(dt, 3), us_per_site=round(dt / Ns * 1e6, 1))

        if "nofall" in stages:
            run = variant_scan("nofall")
            t0 = time.perf_counter()
            out = run(U, D, A_all, C, qcols, xq_words, e0, f0, g0)
            block(out)
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = run(U, D, A_all, C, qcols, xq_words, e0, f0, g0)
            block(out)
            dt = time.perf_counter() - t0
            emit(stage="withreset", Q=Q, compile_s=round(comp, 1),
                 s=round(dt, 3), us_per_site=round(dt / Ns * 1e6, 1))

        if "bigwin" in stages:
            # bigger windows -> fewer while_loop fallbacks; variant_scan
            # re-traces _reset_windowed so the patched globals take effect
            wb0 = mj._WB
            mj._WB = 16
            try:
                run = variant_scan("nofall2")
                t0 = time.perf_counter()
                out = run(U, D, A_all, C, qcols, xq_words, e0, f0, g0)
                block(out)
                comp = time.perf_counter() - t0
                t0 = time.perf_counter()
                out = run(U, D, A_all, C, qcols, xq_words, e0, f0, g0)
                block(out)
                dt = time.perf_counter() - t0
                emit(stage="bigwin", Q=Q, compile_s=round(comp, 1),
                     s=round(dt, 3), us_per_site=round(dt / Ns * 1e6, 1))
            finally:
                mj._WB = wb0

        if "pack" in stages:
            # synthetic records: pack cost is value-independent, so this
            # avoids compiling the production scan just to time the packer
            rng = np.random.RandomState(1)
            mask = jnp.asarray(rng.random_sample((Ns, Q)) < 0.01)
            es = jnp.asarray(rng.randint(0, N, (Ns, Q)).astype(np.int32))
            fs = jnp.asarray(rng.randint(0, Mp, (Ns, Q)).astype(np.int32))
            gs = fs + 1
            e, f, g = e0, f0, g0
            khead = min(4096, Ns * Q)  # the old _REC_HEAD default
            t0 = time.perf_counter()
            p = match_jax._pack_segment_results(mask, es, fs, gs, e, f, g,
                                                k=khead)
            np.asarray(p)
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            p = match_jax._pack_segment_results(mask, es, fs, gs, e, f, g,
                                                k=khead)
            np.asarray(p)
            dt = time.perf_counter() - t0
            emit(stage="pack", Q=Q, compile_s=round(comp, 1), s=round(dt, 3))

        if "full" in stages:
            xq = Xq[:Q]
            t0 = time.perf_counter()
            rows = matcher.match(xq)
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = matcher.match(xq)
            dt = time.perf_counter() - t0
            emit(stage="full", Q=Q, compile_s=round(comp, 1), s=round(dt, 3),
                 q_per_s=round(Q / dt, 1), rows=int(len(rows)))

    if "rowgather" in stages:
        rng = np.random.RandomState(0)
        tab = jnp.asarray(rng.randint(0, 1 << 20, (1 << 21,)).astype(np.int32))
        tab8 = tab.reshape(-1, 8)

        g1 = jax.jit(lambda t, i: t[i])
        g8 = jax.jit(lambda t, i: t[i])
        for K in (128, 1024, 8192):
            i1 = jnp.asarray(rng.randint(0, tab.shape[0], K).astype(np.int32))
            i8 = jnp.asarray(
                rng.randint(0, tab8.shape[0], K).astype(np.int32))
            block(g1(tab, i1)); block(g8(tab8, i8))
            t0 = time.perf_counter()
            for _ in range(20):
                block(g1(tab, i1))
            d1 = (time.perf_counter() - t0) / 20
            t0 = time.perf_counter()
            for _ in range(20):
                block(g8(tab8, i8))
            d8 = (time.perf_counter() - t0) / 20
            emit(stage="rowgather", K=K,
                 elem_us=round(d1 * 1e6, 1),
                 row8_us=round(d8 * 1e6, 1),
                 row8_ns_per_elem=round(d8 / (K * 8) * 1e9, 1))


if __name__ == "__main__":
    main()
