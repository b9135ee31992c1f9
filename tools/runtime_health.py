"""Probe the health of the (shared, degradable) TPU runtime.

The axon-tunneled worker accumulates damage over a session: killed clients
leak HBM, the remote compile helper starts refusing big programs, and
previously-measured programs run slower (round 2: 1230 -> ~1600 ms/step;
round 3 start: 1760 ms for the same b16 program).  This probe records the
observable state so bench numbers can be interpreted:

  * device memory_stats (bytes_in_use / limit) as the worker reports them
  * peak-checkable bf16 matmul time (8k^3: ~2.8 ms at v5e peak 197 TF/s)
  * an HBM allocation ladder (largest single array that allocates cleanly)

Prints ONE JSON line.  Safe to run while nothing else holds the chip.

Usage: python tools/runtime_health.py [--alloc_probe]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--alloc_probe", action="store_true",
                    help="also binary-search the largest allocatable array "
                         "(touches multi-GB of HBM; skip while training)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    out = {"device": dev.device_kind, "backend": jax.default_backend()}
    try:
        ms = dev.memory_stats() or {}
        out["memory_stats"] = {
            k: ms[k] for k in ("bytes_in_use", "bytes_limit",
                               "peak_bytes_in_use", "largest_free_block_bytes")
            if k in ms
        }
    except Exception as exc:  # not all backends implement it
        out["memory_stats_error"] = f"{type(exc).__name__}: {str(exc)[:100]}"

    # bf16 matmul roofline check: 2 * 8192^3 FLOP = 1.1 TF; v5e peak 197
    # TF/s bf16 -> ~5.6 ms ideal.  A healthy runtime lands within ~15% of
    # that; large regressions mean the worker itself is degraded (not XLA).
    # The 32 matmuls are chained inside ONE program (lax.fori_loop): timing
    # separate dispatches over the axon tunnel adds ~ms of RPC latency per
    # call and understates throughput by ~2x.
    n, iters = 8192, 32
    x = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        return jax.lax.fori_loop(0, iters, lambda _, y: (y @ b) * 1e-4, a)

    y = chain(x, x)
    float(y[0, 0].astype(jnp.float32))  # host fetch = only reliable barrier
    t0 = time.perf_counter()
    y = chain(y, x)
    float(y[0, 0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    out["matmul_8k_ms"] = round(dt * 1e3, 2)
    out["matmul_tflops"] = round(2 * n**3 / dt / 1e12, 1)

    if args.alloc_probe:
        lo, hi = 0.0, 14.0  # GiB, binary search on single-array allocation
        for _ in range(6):
            mid = (lo + hi) / 2
            m = int(mid * (1 << 30) / 4)
            try:
                a = jnp.zeros((m,), jnp.float32)
                float(a[-1])  # errors surface at the fetch on this runtime
                del a
                lo = mid
            except Exception:
                hi = mid
        out["largest_alloc_gib"] = round(lo, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
