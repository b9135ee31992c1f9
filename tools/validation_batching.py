"""Measure validation-pass batching (VERDICT round-4 item 7).

VALIDATION.json put the protocol-scale pass (5,000 real + 5,000 fake,
flagship 256px) at 49.7 min on one chip; the collection loops dispatched
one jitted feature program PER DOMAIN per batch with a host fetch between
each.  This tool A/B-measures, on the real chip at a reduced sample count:

  per_domain      - the original loop (one dispatch + fetch per domain)
  domain_batched  - one fused program per batch covering all domains
                    (eval/metrics.py ``domain_batched``)
  batched_b48     - domain_batched at twice the eval batch

for FID / FVD (real+fake collects) and IS (fake), with the generator
sampling time measured separately, and extrapolates each mode to the
5,000-sample protocol.  Writes a JSON report; the verdict goes to PERF.md
("Validation-pass batching") and the winning mode becomes the
``_MetricBase`` default.

Usage:
    python tools/validation_batching.py [--samples 720] [--batch 24]
                                        [--out VALBATCH.json] [--tiny]
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
    ap.add_argument("--samples", type=int, default=720)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--out", default="VALBATCH.json")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform != "cpu":
        # the persistent cache is for the TPU path; XLA:CPU AOT
        # entries can hard-abort on machine-feature mismatch
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.jax_cache")

    from multi_stylegan_tpu.data import BatchLoader, SyntheticTLFMDataset
    from multi_stylegan_tpu.eval import FID, FVD, IS
    from multi_stylegan_tpu.models import Generator
    from multi_stylegan_tpu.models.config import (
        GeneratorConfig,
        tiny_generator_config,
    )

    gcfg = (tiny_generator_config() if args.tiny
            else GeneratorConfig(compute_dtype="bfloat16"))
    generator = Generator(gcfg)
    k = jax.random.key(0)
    z0 = jnp.zeros((args.batch, gcfg.latent_dimensions))
    g_vars = generator.init(
        {"params": k, "mixing": k, "noise": k}, z0, None)

    sample_jit = jax.jit(lambda v, z, km, kn: generator.apply(
        v, z, None, rngs={"mixing": km, "noise": kn}))

    def generator_apply(z, z2, rng):
        km, kn = jax.random.split(rng)
        return sample_jit(g_vars, z, km, kn)

    dataset = SyntheticTLFMDataset(
        n_samples=args.samples, resolution=gcfg.resolution)

    def loader(batch):
        return BatchLoader(dataset, batch_size=batch, seed=0, num_workers=1)

    report = {"config": {"samples": args.samples, "batch": args.batch,
                         "resolution": list(gcfg.resolution)},
              "device": jax.devices()[0].device_kind,
              "modes": {}, "protocol_minutes": {}}

    # time one full sampling sweep once (identical across modes; the
    # collect timings below therefore isolate the feature-extraction side)
    t0 = time.perf_counter()
    rng = jax.random.key(9)
    n = 0
    while n < args.samples:
        rng, kz, kg = jax.random.split(rng, 3)
        z = jax.random.normal(kz, (args.batch, gcfg.latent_dimensions))
        out = generator_apply(z, None, kg)
        n += args.batch
    float(jnp.sum(out[-1]))  # host fetch barrier (CLAUDE.md)
    report["sampling_sweep_s"] = round(time.perf_counter() - t0, 1)

    common = dict(data_samples=args.samples,
                  latent_dimensions=gcfg.latent_dimensions,
                  allow_random_weights=True)

    def run_mode(name, batch, batched):
        mode = {}
        fid = FID(batch_size=batch, domain_batched=batched, **common)
        fvd = FVD(batch_size=batch, domain_batched=batched, **common)
        is_ = IS(batch_size=batch, domain_batched=batched, **common)
        for metric, label, kw in ((fid, "FID", dict(dataset=loader(batch))),
                                  (fvd, "FVD", dict(dataset=loader(batch))),
                                  (is_, "IS", dict())):
            t0 = time.perf_counter()
            scores = metric(generator_apply=generator_apply, **kw)
            mode[label] = {"wall_s": round(time.perf_counter() - t0, 1),
                           "scores": [round(float(s), 3) for s in scores]}
        total = sum(v["wall_s"] for v in mode.values())
        mode["total_s"] = round(total, 1)
        report["modes"][name] = mode
        # protocol extrapolation: collects scale linearly in samples
        report["protocol_minutes"][name] = round(
            total * (5000 / args.samples) / 60, 1)
        print(json.dumps({name: mode}), flush=True)

    run_mode("per_domain", args.batch, batched=False)
    run_mode("domain_batched", args.batch, batched=True)
    run_mode("batched_b48", args.batch * 2, batched=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["protocol_minutes"]))


if __name__ == "__main__":
    main()
