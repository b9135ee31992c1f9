"""Time the FULL NonLocalBlock fwd+bwd at the training shape, and compare
max-pool backward formulations.

tools/probe_attention.py showed the attention core is ~4.4 ms fwd+bwd, so
the round-2 "~54 ms per D pass" ablation charge must sit in the rest of the
block.  Prime suspect: `_max_pool_2x`'s take_along_axis, whose first-order
backward is a scatter-add (TPUs serialize scatters).  The one-hot variant
(`sum(pw * onehot(argmax))`) has a broadcast-multiply backward -- no
scatter -- and stays linear for clean grad-of-grad.

Usage: python tools/probe_nonlocal.py [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / iters * 1000


def pool_gather(x):
    b, h, w, c = x.shape
    pw = x.reshape(b, h // 2, 2, w // 2, 2, c)
    pw = pw.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, c, 4)
    idx = jnp.argmax(pw, axis=-1)
    return jnp.take_along_axis(pw, idx[..., None], axis=-1)[..., 0]


def pool_onehot(x):
    b, h, w, c = x.shape
    pw = x.reshape(b, h // 2, 2, w // 2, 2, c)
    pw = pw.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, c, 4)
    idx = jnp.argmax(pw, axis=-1)
    mask = jax.nn.one_hot(idx, 4, dtype=pw.dtype)
    return jnp.sum(pw * mask, axis=-1)


def pool_reduce_window(x):
    import flax.linen as nn
    return nn.max_pool(x, (2, 2), (2, 2))


POOLS = {"gather": pool_gather, "onehot": pool_onehot,
         "reduce_window": pool_reduce_window}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--pools", default="gather,onehot,reduce_window",
                    help="comma list; the gather variant HANGS on a "
                    "degraded runtime (2026-08-17) - skip it with "
                    "--pools onehot,reduce_window")
    args = ap.parse_args()
    b = args.batch
    dt = jnp.bfloat16

    x = jax.random.normal(jax.random.key(0), (b, 64, 64, 384), dt)
    print(f"backend={jax.default_backend()}  pool input {x.shape} {dt}",
          flush=True)

    ref = None
    for name in args.pools.split(","):
        fn = POOLS[name]
        fwd = jax.jit(fn)
        fb = jax.jit(jax.grad(lambda x, fn=fn: jnp.sum(fn(x) ** 2)))
        out = fwd(x)
        if ref is None:
            ref = out
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        t_f = timed(fwd, x, iters=args.iters)
        t_fb = timed(fb, x, iters=args.iters)
        print(f"pool {name:14s} fwd {t_f:7.2f} ms   grad {t_fb:7.2f} ms"
              f"   max|d|={err:.3e}", flush=True)

    # Full NonLocalBlock fwd + bwd (params + input grads), cin=256 -> co=384
    from multi_stylegan_tpu.nn.attention import NonLocalBlock
    blk = NonLocalBlock(384, dtype=dt)
    xin = jax.random.normal(jax.random.key(1), (b, 64, 64, 256), dt)
    params = blk.init(jax.random.key(2), xin)

    def loss(params, xin):
        return jnp.sum(blk.apply(params, xin) ** 2)

    fwd = jax.jit(lambda p, x: blk.apply(p, x))
    fb = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t_f = timed(fwd, params, xin, iters=args.iters)
    t_fb = timed(fb, params, xin, iters=args.iters)
    print(f"NonLocalBlock  fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms",
          flush=True)

    # And under remat (how it actually runs in the D encoder by default)
    import flax.linen as nn
    rblk = nn.remat(NonLocalBlock)(384, dtype=dt)

    def rloss(params, xin):
        return jnp.sum(rblk.apply(params, xin) ** 2)

    rfb = jax.jit(jax.grad(rloss, argnums=(0, 1)))
    t_rfb = timed(rfb, params, xin, iters=args.iters)
    print(f"NonLocalBlock  remat fwd+bwd {t_rfb:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
