"""Compile-robust wrappers for the heavyweight training programs.

The fused path-length program (f32 second-order synthesis + optimizer
update, donated) is the largest XLA program in the suite and the first
casualty when the remote TPU compile helper degrades over a long session
(CLAUDE.md gotchas).  The same math split at the gradient boundary
(train/steps.py: path_length_grads / path_length_apply, bit-identical -
tests/test_train_step.py) compiles as two much smaller programs.  When even
those fail, the wrapper excludes the update and notifies the caller, which
decides policy (the Trainer warns and continues; bench.py charges a
measured proxy cost and annotates its output).

Fallback triggers on COMPILE failures only: the programs donate their input
state, so an execution-time failure (e.g. RESOURCE_EXHAUSTED) invalidates
the caller's buffers and silently reusing them in a fallback tier would
crash later with a confusing donated-buffer error (advisor round-2).  The
tiers therefore compile explicitly via ``lower().compile()`` inside the
guarded region and execute the compiled programs outside it - execution
errors propagate to the caller.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_robust_path_length(
    fused_jit: Callable,
    grads_jit: Callable,
    apply_jit: Callable,
    on_excluded: Optional[Callable[[], None]] = None,
    chunked_jits: tuple = (),
):
    """``state -> (state, penalty, path_length)`` with tiered fallbacks:
    fused program, then grads/apply split, then each ``chunked_jits`` entry
    (scan-over-sub-batches grads, steps.py path_length_grads_chunked - peak
    memory divided by the chunk count, so it compiles on a degraded helper
    that rejects the monolithic grads program), then exclusion (zeros
    returned, ``on_excluded`` fired once).  The jitted callables must be
    ``jax.jit`` objects (``.lower`` is used for the explicit compile).

    Extras exposed on the returned callable:

    * ``mode['m']`` - active tier (``'fused'`` / ``'split'`` / ``'excluded'``,
      ``None`` before the first call);
    * ``prepare(state, start_tier=None)`` - compile the tiers without
      executing anything (``state`` may be abstract, e.g. ``jax.eval_shape``
      output) - used to prewarm the persistent compilation cache.
      ``start_tier`` (a tier name) skips the ladder entries ABOVE it: on the
      degrading remote compile helper a failed compile attempt burns minutes
      and is never cached, so a caller that already knows (e.g. from a
      prewarm run on the same runtime) that the fused/grads programs are
      rejected starts directly at the tier that works.  The ladder still
      walks DOWN from there if the hinted tier fails too;
    * ``flops()`` - XLA cost-analysis fp-ops of the active tier's programs
      per invocation, or ``None`` when excluded/unprepared (bench MFU
      accounting must know whether path-length is included).
    """
    mode = {"m": None}
    exe = {}

    def prepare(state, start_tier=None) -> str:
        """Compile (tiered, no execution); idempotent."""
        if mode["m"] is not None:
            return mode["m"]
        grads_ladder = (("split", grads_jit),) + tuple(
            (f"chunked{i + 2}", cj) for i, cj in enumerate(chunked_jits)
        )
        names = ("fused",) + tuple(n for n, _ in grads_ladder)
        start = names.index(start_tier) if start_tier in names else 0
        if start == 0:
            try:
                exe["fused"] = fused_jit.lower(state).compile()
                mode["m"] = "fused"
                return mode["m"]
            except Exception:
                pass
        for name, g_jit in grads_ladder[max(0, start - 1):]:
            try:
                exe["grads"] = g_jit.lower(state).compile()
                # abstract grads/new_mean for the apply lowering (no execution)
                out_shapes = jax.eval_shape(g_jit, state)
                exe["apply"] = apply_jit.lower(
                    state, out_shapes[0], out_shapes[3]
                ).compile()
                mode["m"] = name
                return mode["m"]
            except Exception:
                continue
        mode["m"] = "excluded"
        if on_excluded is not None:
            on_excluded()
        return mode["m"]

    def pl_call(state):
        if mode["m"] is None:
            prepare(state)
        if mode["m"] == "fused":
            return exe["fused"](state)
        if mode["m"] != "excluded":  # split or chunkedN
            grads, penalty, pl_len, new_mean = exe["grads"](state)
            state = exe["apply"](state, grads, new_mean)
            return state, penalty, pl_len
        return state, jnp.asarray(0.0), jnp.asarray(0.0)

    def flops() -> Optional[float]:
        def cost(compiled) -> float:
            analysis = compiled.cost_analysis()
            if isinstance(analysis, (list, tuple)):
                analysis = analysis[0]
            return float(analysis.get("flops", 0.0))

        try:
            if mode["m"] == "fused":
                return cost(exe["fused"])
            if mode["m"] not in (None, "excluded"):  # split or chunkedN
                return cost(exe["grads"]) + cost(exe["apply"])
        except Exception:
            return None
        return None

    pl_call.mode = mode
    pl_call.prepare = prepare
    pl_call.flops = flops
    pl_call.jits = (fused_jit, grads_jit, apply_jit)  # for cache prewarming
    pl_call.chunked_jits = tuple(chunked_jits)
    return pl_call
