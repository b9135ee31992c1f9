"""Fusion-isolation ablation (VERDICT round-2 item 2).

PERF.md's trace-backed diagnosis: XLA folds ~20 elementwise epilogues
(leaky-relu mask recompute, equalized-LR scale casts, residual /sqrt(2))
into the conv backprop-filter fusions of the D/G backward, and those
composite fusions run at 0.2-0.4 bandwidth utilization.  This tool measures
the levers that keep the elementwise chains OUT of those fusions:

  impl=xla      round-2 baseline (plain expression, XLA fuses freely)
  impl=barrier  optimization_barrier on the activation input: its transpose
                separates the activation backward from the conv backward
  impl=pallas   the Pallas fused-act kernel in the hot path (opaque to XLA)

For each impl it times (host-fetch barriers, the only reliable barrier on
axon):
  * d_param_grad - gradient of a both-heads D loss w.r.t. d_params (the
    226 ms program in PERF.md "The wall")
  * g_param_grad - generator loss gradient w.r.t. g_params
  * main_step    - the full fused main step at the flagship config

Usage:
    python tools/fusion_ablation.py [--dtype bfloat16] [--batch 16]
                                    [--impls xla,barrier,pallas] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--impls", default="xla,barrier")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip_main", action="store_true",
                    help="only the param-grad probes (fast iteration)")
    ap.add_argument("--tiny", action="store_true",
                    help="32px debug config (tool smoke tests)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
    )
    from multi_stylegan_tpu.ops import fused_act
    from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step

    if args.tiny:
        from multi_stylegan_tpu.models.config import (
            tiny_discriminator_config,
            tiny_generator_config,
        )

        gcfg = tiny_generator_config(compute_dtype=args.dtype, remat=False)
        dcfg = tiny_discriminator_config(compute_dtype=args.dtype, remat=False)
    else:
        gcfg = GeneratorConfig(compute_dtype=args.dtype, remat=False)
        dcfg = DiscriminatorConfig(no_rfp=True, compute_dtype=args.dtype,
                                   remat=False)
    generator, discriminator = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=args.batch, compute_dtype=args.dtype)
    state = create_train_state(jax.random.key(0), generator, discriminator, cfg)
    data = jax.random.uniform(jax.random.key(1),
                              (args.batch, 2, 3, *gcfg.resolution))
    z = jax.random.normal(jax.random.key(2), (args.batch,
                                              gcfg.latent_dimensions))
    flags = StepFlags.off()

    def touch(tree):
        return sum(jnp.sum(l.astype(jnp.float32).ravel()[:1])
                   for l in jax.tree.leaves(tree))

    def make_probes():
        """FRESH function objects per impl: jax.jit caches on the underlying
        callable, so re-jitting the same closure after set_default_impl
        would silently reuse the previous impl's executable (observed: the
        'barrier' run hit the 'xla' cache and measured nothing)."""

        def d_param_grad(d_params, data):
            def loss(p):
                s_out, p_out = discriminator.apply({"params": p}, data)
                # both heads, like the NS loss path (loss.py:124-128)
                return jnp.sum(jax.nn.softplus(s_out)) + jnp.sum(
                    jax.nn.softplus(p_out))
            return touch(jax.grad(loss)(d_params))

        def g_param_grad(g_params, d_params, z):
            def loss(p):
                img = generator.apply(
                    {"params": p, "noises": state.g_noises}, z,
                    randomize_noise=False)
                s_out, p_out = discriminator.apply({"params": d_params}, img)
                return jnp.sum(jax.nn.softplus(-s_out)) + jnp.sum(
                    jax.nn.softplus(-p_out))
            return touch(jax.grad(loss)(g_params))

        return d_param_grad, g_param_grad

    def bench(fn, a):
        t0 = time.perf_counter()
        r = fn(*a)
        float(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(*a)
        float(r)
        return (time.perf_counter() - t0) / args.iters * 1e3, compile_s

    from multi_stylegan_tpu.ops import conv_grad

    results = {}
    for impl in args.impls.split(","):
        # 'mmgrad' selects the explicit-matmul conv filter gradient
        # (ops/conv_grad.py) with the plain XLA fused-act; other names select
        # the fused_act impl with the XLA conv path.
        if impl == "mmgrad":
            fused_act.set_default_impl("xla")
            conv_grad.set_conv_impl("mmgrad")
        else:
            fused_act.set_default_impl(impl)
            conv_grad.set_conv_impl("xla")
        d_param_grad, g_param_grad = make_probes()
        row = {}
        try:
            row["d_param_grad_ms"], row["d_compile_s"] = bench(
                jax.jit(d_param_grad), (state.d_params, data))
            row["g_param_grad_ms"], row["g_compile_s"] = bench(
                jax.jit(g_param_grad), (state.g_params, state.d_params, z))
            if not args.skip_main:
                step = make_train_step(generator, discriminator, cfg,
                                       top_k_start_iteration=10**6,
                                       top_k_final_iteration=10**6 + 1)

                def main_only(state, data):
                    s, m = step.main_step(state, data, flags)
                    return (m["loss_generator"] + 1e-30 * touch(s.g_params)
                            + 1e-30 * touch(s.d_params))

                row["main_step_ms"], row["main_compile_s"] = bench(
                    jax.jit(main_only), (state, data))
                row["seqs_per_sec"] = round(
                    args.batch / row["main_step_ms"] * 1e3, 2)
        except Exception as exc:
            row["error"] = f"{type(exc).__name__}: {str(exc)[:200]}"
        results[impl] = {k: (round(v, 1) if isinstance(v, float) else v)
                         for k, v in row.items()}
        print(json.dumps({impl: results[impl]}), flush=True)
    fused_act.set_default_impl("xla")
    conv_grad.set_conv_impl("xla")
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "dtype": args.dtype, "batch": args.batch,
                      "results": results}))


if __name__ == "__main__":
    main()
