"""Micro-benchmark: upfirdn2d XLA depthwise-conv vs Pallas stencil on the
model's real call-site shapes (generator blur / upsample chains at the
flagship 256x256 config).

Usage:
    python tools/bench_upfirdn.py [--impl xla,pallas] [--dtype bfloat16]
                                  [--batch 16] [--grad] [--platform cpu]

Prints one line per (site, impl): ms/call and effective GB/s (bytes moved =
input + output at the given dtype; the FIR taps are negligible).  VERDICT.md
round-1 item 3: decide the package default (`set_default_impl`) from these
numbers, on hardware.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Generator call sites at the 256x256 flagship config (models/generator.py):
#   - StyledConv upsampling stages: post-transposed-conv blur, up=1, k4,
#     pad (2, 1), on the UPSAMPLED feature map (H = 2*stage input), C=512.
#   - ToRGB skip upsample: up=2, k4, pad (2, 1), C=3 per tower.
#   - Discriminator encoder blur: up=1, k4, pad (2, 2) after stride-2 conv.
# Times both towers x both call kinds across stages.
def sites(batch: int):
    out = []
    for h in (8, 16, 32, 64, 128, 256):
        out.append((f"g_blur_{h}", (batch, h, w_of(h), 512), 1, (2, 1)))
    for h in (4, 8, 16, 32, 64, 128):
        out.append((f"g_skip_up_{h}", (batch, h, w_of(h), 3), 2, (2, 1)))
    for h, c in ((128, 128), (64, 256), (32, 384), (16, 768)):
        out.append((f"d_blur_{h}", (batch, h, w_of(h), c), 1, (2, 2)))
    return out


def w_of(h: int) -> int:
    return h


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="xla,pallas")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--grad", action="store_true",
                    help="benchmark value+grad instead of forward only")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from multi_stylegan_tpu.ops.blur import make_blur_kernel
    from multi_stylegan_tpu.ops.upfirdn2d import upfirdn2d

    dtype = jnp.dtype(args.dtype)
    kernel = make_blur_kernel((1, 3, 3, 1))
    dev = jax.devices()[0]
    print(f"# device={dev.device_kind} dtype={args.dtype} batch={args.batch} "
          f"mode={'grad' if args.grad else 'fwd'}")

    for impl in args.impl.split(","):
        total_ms = 0.0
        for name, shape, up, pad in sites(args.batch):
            x = jax.random.normal(jax.random.key(0), shape, dtype)

            if args.grad:
                def f(x, impl=impl, up=up, pad=pad):
                    return jnp.sum(
                        upfirdn2d(x, kernel, up=up, down=1, pad=pad,
                                  impl=impl) ** 2)
                fn = jax.jit(jax.grad(f))
                barrier = lambda r: float(r.ravel()[0])
            else:
                def f(x, impl=impl, up=up, pad=pad):
                    return upfirdn2d(x, kernel, up=up, down=1, pad=pad,
                                     impl=impl)
                fn = jax.jit(f)
                barrier = lambda r: float(r.ravel()[0])

            try:
                r = fn(x)
                barrier(r)  # host fetch: the only reliable barrier on axon
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    r = fn(x)
                barrier(r)
                dt = (time.perf_counter() - t0) / args.iters
            except Exception as exc:
                print(f"{impl:7s} {name:16s} FAILED "
                      f"{type(exc).__name__}: {str(exc)[:120]}")
                continue

            b, h, w, c = shape
            ho, wo = h * up, w * up  # pad chosen so out size == in*up
            nbytes = (b * h * w * c + b * ho * wo * c) * dtype.itemsize
            if args.grad:
                nbytes *= 3  # fwd + bwd re-read + grad write (rough)
            total_ms += dt * 1e3
            print(f"{impl:7s} {name:16s} {dt * 1e3:8.3f} ms "
                  f"{nbytes / dt / 1e9:8.1f} GB/s")
        print(f"{impl:7s} {'TOTAL':16s} {total_ms:8.3f} ms")


if __name__ == "__main__":
    main()
