"""Microbenchmark the NonLocal attention core at the training shape.

The round-2 ablation charged ~54 ms of a 284 ms D fwd+bwd to the two
NonLocal blocks (both at 64x64, co=384), yet the attention math is ~64
GFLOP fwd+bwd -- ~0.3 ms at v5e roofline.  This probe times isolated
formulations of the attention core (theta/phi/g given) fwd and fwd+bwd to
find which formulation XLA schedules well, before touching the model.

Shapes (flagship 256px, batch 16): theta [16,4096,48], phi [16,1024,48],
g [16,1024,192], logits [16,4096,1024] f32.

Usage: python tools/probe_attention.py [--batch 16] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        _ = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # host fetch is the only reliable barrier on this runtime (CLAUDE.md)
    _ = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1000


def attn_einsum(theta, phi, g):
    """Current model formulation (nn/attention.py)."""
    logits = jnp.einsum("bnc,bmc->bnm", theta, phi,
                        preferred_element_type=jnp.float32)
    beta = jax.nn.softmax(logits, axis=-1).astype(theta.dtype)
    return jnp.einsum("bnm,bmc->bnc", beta, g,
                      preferred_element_type=jnp.float32).astype(theta.dtype)


def attn_bf16_softmax(theta, phi, g):
    logits = jnp.einsum("bnc,bmc->bnm", theta, phi)
    beta = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", beta, g,
                      preferred_element_type=jnp.float32).astype(theta.dtype)


def attn_chunked(theta, phi, g, chunk=512):
    """lax.scan over query chunks, softmax recomputed per chunk in backward
    (jax.checkpoint on the body): no [B,N,M] residual in HBM."""
    b, n, c = theta.shape

    @jax.checkpoint
    def body(_, th_c):
        logits = jnp.einsum("bnc,bmc->bnm", th_c, phi,
                            preferred_element_type=jnp.float32)
        beta = jax.nn.softmax(logits, axis=-1).astype(th_c.dtype)
        out = jnp.einsum("bnm,bmc->bnc", beta, g,
                         preferred_element_type=jnp.float32)
        return None, out.astype(th_c.dtype)

    th = jnp.moveaxis(theta.reshape(b, n // chunk, chunk, c), 1, 0)
    _, outs = jax.lax.scan(body, None, th)
    return jnp.moveaxis(outs, 0, 1).reshape(b, n, -1)


def attn_flat2d(theta, phi, g):
    """Same math, but the softmax runs on a flattened [B*N, M] 2-D array.
    PERF.md charges the attention-backward time to an XLA-chosen layout
    that strides the 3-D softmax reduction; a 2-D (sublane-major, lane=M)
    reshape is the friendliest layout the VPU can get."""
    b, n, _ = theta.shape
    m = phi.shape[1]
    logits = jnp.einsum("bnc,bmc->bnm", theta, phi,
                        preferred_element_type=jnp.float32)
    beta = jax.nn.softmax(logits.reshape(b * n, m), axis=-1)
    beta = beta.reshape(b, n, m).astype(theta.dtype)
    return jnp.einsum("bnm,bmc->bnc", beta, g,
                      preferred_element_type=jnp.float32).astype(theta.dtype)


def attn_f32_all(theta, phi, g):
    logits = jnp.einsum("bnc,bmc->bnm", theta.astype(jnp.float32),
                        phi.astype(jnp.float32))
    beta = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", beta, g.astype(jnp.float32)
                      ).astype(theta.dtype)


VARIANTS = {
    "einsum_f32sm": attn_einsum,
    "bf16_softmax": attn_bf16_softmax,
    "chunked512": lambda t, p, g: attn_chunked(t, p, g, 512),
    "chunked1024": lambda t, p, g: attn_chunked(t, p, g, 1024),
    "flat2d": attn_flat2d,
    "f32_all": attn_f32_all,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (the axon TPU plugin ignores "
                         "JAX_PLATFORMS; use --platform cpu for local runs)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    dt = jnp.dtype(args.dtype)
    b, n, m, ct, cg = args.batch, 4096, 1024, 48, 192
    k = jax.random.key(0)
    theta = jax.random.normal(jax.random.key(1), (b, n, ct), dt)
    phi = jax.random.normal(jax.random.key(2), (b, m, ct), dt)
    g = jax.random.normal(jax.random.key(3), (b, m, cg), dt)
    print(f"backend={jax.default_backend()} shapes: theta{theta.shape} "
          f"phi{phi.shape} g{g.shape} dtype={dt}", flush=True)

    ref = None
    for name, fn in VARIANTS.items():
        fwd = jax.jit(fn)

        def loss(t, p, gg, fn=fn):
            return jnp.sum(fn(t, p, gg) ** 2)

        fb = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        try:
            out = fwd(theta, phi, g)
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            t_f = timed(fwd, theta, phi, g, iters=args.iters)
            t_fb = timed(lambda *a: fb(*a)[1], theta, phi, g,
                         iters=args.iters)
            print(f"{name:14s} fwd {t_f:8.2f} ms   fwd+bwd {t_fb:8.2f} ms"
                  f"   max|d|={err:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001 - probe records all failures
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
