"""Microbench: one-hot digit-plane gather — bf16 base-256 (current) vs
int8 base-128 (candidate) — at the production matcher shapes.

The FM rank lookup is the matcher's per-site floor: a (2Q, R) one-hot
matmul against (R, 3*128) digit planes.  v5e executes s8xs8->s32 on the
MXU at 2x bf16 throughput and the one-hot materialises at half the
bytes, so base-128 int8 digits (values 0..127, exactly representable)
could halve the floor.  This probe measures both at Q in {256, 4096},
R=800 (Mp=102400), checks exactness, and prints us/call.

Usage: python scripts/probe_int8_gather.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bf16_gather(planes_u8, idx):
    """Current production path (match_jax._mxu_gather_u8planes)."""
    K = idx.shape[0]
    R = planes_u8.shape[0]
    r = idx >> 7
    l = idx & 127
    oh = (r[:, None] == jax.lax.broadcasted_iota(jnp.int32, (K, R), 1)
          ).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(oh, planes_u8.astype(jnp.bfloat16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    li = jax.lax.broadcasted_iota(jnp.int32, (K, 384), 1)
    sel = (li & 127) == l[:, None]
    w = (jnp.int32(1) << (8 * (li >> 7))).astype(jnp.float32)
    return jnp.sum(jnp.where(sel, rows * w, 0.0), axis=1).astype(jnp.int32)


def i8_gather(planes_i8, idx):
    """Candidate: base-128 digits as int8, s8 x s8 -> s32 MXU matmul."""
    K = idx.shape[0]
    R = planes_i8.shape[0]
    r = idx >> 7
    l = idx & 127
    oh = (r[:, None] == jax.lax.broadcasted_iota(jnp.int32, (K, R), 1)
          ).astype(jnp.int8)
    rows = jax.lax.dot_general(oh, planes_i8,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)  # (K, 384)
    li = jax.lax.broadcasted_iota(jnp.int32, (K, 384), 1)
    sel = (li & 127) == l[:, None]
    w = jnp.int32(1) << (7 * (li >> 7))
    return jnp.sum(jnp.where(sel, rows * w, 0), axis=1)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    R = 800
    Mp = R * 128
    rng = np.random.RandomState(0)
    vals = rng.randint(0, 1 << 21, size=Mp).astype(np.int32)
    p256 = np.stack([(vals & 0xFF), (vals >> 8) & 0xFF,
                     (vals >> 16) & 0xFF], 0).astype(np.uint8)
    p256 = np.concatenate([p.reshape(R, 128) for p in p256], 1)
    p128 = np.stack([(vals & 0x7F), (vals >> 7) & 0x7F,
                     (vals >> 14) & 0x7F], 0).astype(np.int8)
    p128 = np.concatenate([p.reshape(R, 128) for p in p128], 1)
    d256 = jnp.asarray(p256)
    d128 = jnp.asarray(p128)

    for Q in (256, 4096):
        K = 2 * Q
        idx = jnp.asarray(rng.randint(0, Mp, size=K).astype(np.int32))
        f_bf = jax.jit(bf16_gather)
        f_i8 = jax.jit(i8_gather)
        got_bf = np.asarray(f_bf(d256, idx))
        got_i8 = np.asarray(f_i8(d128, idx))
        want = vals[np.asarray(idx)]
        print(f"Q={Q}: bf16 exact={np.array_equal(got_bf, want)} "
              f"i8 exact={np.array_equal(got_i8, want)}", flush=True)
        for name, fn, tab in (("bf16/256", f_bf, d256),
                              ("i8/128", f_i8, d128)):
            np.asarray(fn(tab, idx))
            t0 = time.perf_counter()
            for _ in range(reps):
                r_ = fn(tab, idx)
            jax.block_until_ready(r_)
            dt = (time.perf_counter() - t0) / reps
            print(f"  {name:9s} {1e6 * dt:8.1f} us/call", flush=True)


if __name__ == "__main__":
    main()
