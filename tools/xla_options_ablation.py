"""XLA compiler-options ablation on the conv-backward fusion wall.

PERF.md "The wall": the D/G parameter-gradient (backprop-filter) composite
fusions run at 0.2-0.4 bandwidth utilization and epilogue isolation does
not move them (optimization_barrier result, round 2).  The remaining
framework-controllable lever is the compiler itself: per-program
``compiled = jit(f).lower(...).compile(compiler_options=...)``.  The one
public knob with a plausible mechanism is ``xla_tpu_scoped_vmem_limit_kib``
- a larger VMEM scratch budget lets the fusion emitter pick deeper tiles
for the strided batch-reduction reads of backprop-filter.

For each options-variant this measures (host-fetch barriers):
  * d_param_grad - both-heads D loss grad w.r.t. d_params
  * g_param_grad - generator NS loss grad w.r.t. g_params
  * main_step    - full fused main step (unless --skip_main)

Unknown/rejected options are recorded per-variant, never fatal.

Usage:
    python tools/xla_options_ablation.py [--variants ...] [--iters 8]
        --variants "base=;v32=xla_tpu_scoped_vmem_limit_kib:32768"
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_VARIANTS = (
    "base=;"
    "vmem32=xla_tpu_scoped_vmem_limit_kib:32768;"
    "vmem64=xla_tpu_scoped_vmem_limit_kib:65536;"
    "vmem128=xla_tpu_scoped_vmem_limit_kib:131072"
)


def parse_variants(spec: str):
    out = []
    for part in spec.split(";"):
        if not part:
            continue
        name, _, opts = part.partition("=")
        d = {}
        if opts:
            for kv in opts.split(","):
                k, _, v = kv.partition(":")
                d[k] = v
        out.append((name, d))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--variants", default=DEFAULT_VARIANTS)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip_main", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # NOTE: no persistent cache here - compiler_options change the program,
    # and polluting /root/.jax_cache with non-default-option executables
    # would not help (keys differ) while still growing the cache.

    from multi_stylegan_tpu.models import Discriminator, Generator
    from multi_stylegan_tpu.models.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        TrainingConfig,
    )
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
    z = jax.random.normal(jax.random.key(2),
                          (args.batch, gcfg.latent_dimensions))
    flags = StepFlags.off()

    def touch(tree):
        return sum(jnp.sum(l.astype(jnp.float32).ravel()[:1])
                   for l in jax.tree.leaves(tree))

    def d_param_grad(d_params, data):
        def loss(p):
            s_out, p_out = discriminator.apply({"params": p}, data)
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

    step = make_train_step(generator, discriminator, cfg,
                           top_k_start_iteration=10**6,
                           top_k_final_iteration=10**6 + 1)

    def main_only(state, data):
        s, m = step.main_step(state, data, flags)
        return (m["loss_generator"] + 1e-30 * touch(s.g_params)
                + 1e-30 * touch(s.d_params))

    def bench(fn, a, opts):
        t0 = time.perf_counter()
        compiled = jax.jit(fn).lower(*a).compile(
            compiler_options=opts or None)
        compile_s = time.perf_counter() - t0
        r = compiled(*a)
        float(r)  # warm + barrier
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = compiled(*a)
        float(r)
        return (time.perf_counter() - t0) / args.iters * 1e3, compile_s

    results = {}
    for name, opts in parse_variants(args.variants):
        row = {"options": opts}
        try:
            row["d_param_grad_ms"], row["d_compile_s"] = bench(
                d_param_grad, (state.d_params, data), opts)
            row["g_param_grad_ms"], row["g_compile_s"] = bench(
                g_param_grad, (state.g_params, state.d_params, z), opts)
            if not args.skip_main:
                row["main_step_ms"], row["main_compile_s"] = bench(
                    main_only, (state, data), opts)
                row["seqs_per_sec"] = round(
                    args.batch / row["main_step_ms"] * 1e3, 2)
        except Exception as exc:
            row["error"] = f"{type(exc).__name__}: {str(exc)[:300]}"
        results[name] = {k: (round(v, 1) if isinstance(v, float) else v)
                         for k, v in row.items()}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "dtype": args.dtype, "batch": args.batch,
                      "results": results}))


if __name__ == "__main__":
    main()
