"""On-chip cost decomposition of the device matcher (round-3 tuning).

Times, at matcher shapes (Mp=102400, R=800, Q in {256,1024,4096}):
  1. plain XLA gather of 2Q elements from an Mp table (the FM rank lookup)
  2. two-stage one-hot MXU gather of the same (rows via f32 matmul, lanes
     via masked reduce)
  3. panel-only ad-kernel chain (the site-rate floor)
  4. full match segment at each Q (current production path)

Usage: python scripts/profile_match.py [stage...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x)[..., :1], out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x)[..., :1], out)
    return (time.perf_counter() - t0) / reps


def onehot_gather(table_plane, idx):
    """table_plane (R, 128) f32-safe int32; idx (K,) -> (K,) values.

    Row select = one-hot (K, R) @ plane (R, 128) on the MXU; lane select =
    masked row-sum. Exact for values < 2^24.
    """
    R = table_plane.shape[0]
    r = idx >> 7
    l = idx & 127
    oh = (r[:, None] == jnp.arange(R, dtype=jnp.int32)[None, :]).astype(
        jnp.float32)
    rows = jax.lax.dot_general(oh, table_plane.astype(jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    lane_mask = (l[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :])
    return jnp.sum(jnp.where(lane_mask, rows, 0), axis=1).astype(jnp.int32)


def main():
    stages = sys.argv[1:] or ["gather", "onehot", "panel", "full"]
    Mp = 102400
    R = Mp // 128
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randint(0, Mp, Mp).astype(np.int32))
    plane = table.reshape(R, 128)

    if "gather" in stages:
        g = jax.jit(lambda t, i: t[i])
        for K in (512, 2048, 8192):
            idx = jnp.asarray(rng.randint(0, Mp, K).astype(np.int32))
            dt = timeit(g, table, idx)
            print(f"gather     K={K:5d}: {dt*1e6:8.1f} us "
                  f"({dt/K*1e9:6.1f} ns/elem)")

    if "onehot" in stages:
        oh = jax.jit(onehot_gather)
        for K in (512, 2048, 8192):
            idx = jnp.asarray(rng.randint(0, Mp, K).astype(np.int32))
            ref = np.asarray(table)[np.asarray(idx)]
            got = np.asarray(oh(plane, idx))
            assert (got == ref).all(), "onehot gather mismatch"
            dt = timeit(oh, plane, idx)
            print(f"onehot     K={K:5d}: {dt*1e6:8.1f} us "
                  f"({dt/K*1e9:6.1f} ns/elem)")

    if "panel" in stages:
        from pbwt_tpu.ops.partition_pallas import partition_ad_step
        from pbwt_tpu.ops.build import GROUP

        Ng = 64
        W = jnp.asarray(rng.randint(-2**31, 2**31, (Ng, Mp), np.int64)
                        .astype(np.int32))
        iota = jnp.arange(Mp, dtype=jnp.int32)

        @jax.jit
        def panel_chain(W, a0):
            def sg(w_nat, a):
                _, inv = jax.lax.sort((a, iota), num_keys=1, is_stable=True)
                _, r = jax.lax.sort((inv, w_nat), num_keys=1, is_stable=True)
                return r

            def group_step(carry, w_nat):
                a, d, k = carry
                w = sg(w_nat, a)

                def site_step(st, s):
                    aR, dR, wR = st
                    a2, d2, w2, u2, cnt = partition_ad_step(aR, dR, wR, s,
                                                            k + s)
                    return (a2, d2, w2), aR.reshape(-1)

                (aR, dR, _), snaps = jax.lax.scan(
                    site_step,
                    (a.reshape(R, 128), d.reshape(R, 128), w.reshape(R, 128)),
                    jnp.arange(GROUP, dtype=jnp.int32))
                return (aR.reshape(-1), dR.reshape(-1), k + GROUP), snaps

            (a, d, _), snaps = jax.lax.scan(
                group_step, (a0, jnp.zeros(Mp, jnp.int32).at[0].set(1),
                             jnp.int32(0)), W)
            return a, snaps

        a0 = jnp.arange(Mp, dtype=jnp.int32)
        dt = timeit(panel_chain, W, a0, reps=3)
        n_sites = Ng * GROUP
        print(f"panel-only chain: {dt:7.3f} s  ({dt/n_sites*1e6:6.1f} us/site)")

    if "full" in stages:
        from pbwt_tpu.ops import match_jax
        M, N = 100_000, 2048
        freqs = rng.beta(0.2, 0.8, size=N)
        Xp = (rng.random_sample((M, N)) < freqs[None, :]).astype(np.uint8)
        matcher = match_jax.DeviceMatcher(Xp)
        for Q in (256, 1024, 4096):
            Xq = np.empty((Q, N), np.uint8)
            for q in range(Q):
                pos = 0
                while pos < N:
                    seg = rng.randint(50, 400)
                    Xq[q, pos:pos + seg] = Xp[rng.randint(0, M),
                                              pos:pos + seg]
                    pos += seg
            matcher.match(Xq)
            t0 = time.perf_counter()
            rows = matcher.match(Xq)
            dt = time.perf_counter() - t0
            print(f"full match Q={Q:5d}: {dt:7.3f} s  {Q/dt:8.1f} q/s "
                  f"({dt/N*1e6:6.1f} us/site, rows={len(rows)})")


if __name__ == "__main__":
    main()
