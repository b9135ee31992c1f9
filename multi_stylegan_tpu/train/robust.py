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

Fallback triggers on COMPILE failures, plus — for the non-donating grads
programs only — on a RESOURCE_EXHAUSTED at execution: compile success does
not imply the program fits next to the resident training programs' device
reservations (at batch 24 the 4-chunk grads program compiles but OOMs on
the chip, round-5 soak), and since the grads tiers do NOT donate their
input state, the state is still valid after the failed execution and the
ladder can walk down to a deeper chunking and retry.  The donating
programs (fused PL, apply) keep the strict compile-only policy: an
execution failure there invalidates the caller's buffers and silently
reusing them in a fallback tier would crash later with a confusing
donated-buffer error (advisor round-2).  Tiers compile explicitly via
``lower().compile()`` inside the guarded region; grads execution is
barriered by a scalar host fetch (the only reliable barrier on this
runtime) so an async device OOM surfaces at the demotion point.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def pl_chunk_tiers(pl_batch: int) -> tuple:
    """Chunk counts for the tiered path-length grads ladder at a given
    second-order batch: the proven small tiers (2, 4) plus the deeper
    half-batch and full-batch (sub-batch 1) chunkings, filtered to
    divisors.  The deep tiers exist for EXECUTION headroom, not compile
    size: at batch 24 the 4-chunk grads program compiles but OOMs on the
    chip next to the split-main programs' reservations (round-5 soak),
    while sub-batch-1 scanning runs in a fraction of the memory."""
    cand = {2, 4, pl_batch // 2, pl_batch}
    return tuple(sorted(n for n in cand
                        if 2 <= n <= pl_batch and pl_batch % n == 0))


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
    rest = []  # grads-ladder entries BELOW the active tier (for demotion)
    # Excluded-path zeros, allocated ONCE while the device is healthy: after
    # an execution OOM the allocator can be left wedged enough that even a
    # fresh scalar allocation raises (round-5 soak: jnp.asarray(0.0) itself
    # RESOURCE_EXHAUSTED'd on the excluded return).
    zeros = {}

    def _grads_ladder():
        return (("split", grads_jit),) + tuple(
            (f"chunked{i + 2}", cj) for i, cj in enumerate(chunked_jits)
        )

    def _compile_grads_tier(state, name, g_jit) -> bool:
        try:
            exe["grads"] = g_jit.lower(state).compile()
            # abstract grads/new_mean for the apply lowering (no execution)
            out_shapes = jax.eval_shape(g_jit, state)
            exe["apply"] = apply_jit.lower(
                state, out_shapes[0], out_shapes[3]
            ).compile()
            mode["m"] = name
            return True
        except Exception:
            return False

    def prepare(state, start_tier=None) -> str:
        """Compile (tiered, no execution); idempotent."""
        if mode["m"] is not None:
            return mode["m"]
        grads_ladder = _grads_ladder()
        names = ("fused",) + tuple(n for n, _ in grads_ladder)
        start = names.index(start_tier) if start_tier in names else 0
        if start == 0:
            try:
                exe["fused"] = fused_jit.lower(state).compile()
                mode["m"] = "fused"
                # a fused-tier EXECUTION failure is unrecoverable (the
                # program donates state), so no demotion ladder is kept
                return mode["m"]
            except Exception:
                pass
        ladder = grads_ladder[max(0, start - 1):]
        for k, (name, g_jit) in enumerate(ladder):
            if _compile_grads_tier(state, name, g_jit):
                rest[:] = list(ladder[k + 1:])
                return mode["m"]
        mode["m"] = "excluded"
        if on_excluded is not None:
            on_excluded()
        return mode["m"]

    def _demote(state) -> bool:
        """Compile the next deeper grads tier, or exclude."""
        while rest:
            name, g_jit = rest.pop(0)
            if _compile_grads_tier(state, name, g_jit):
                return True
        mode["m"] = "excluded"
        if on_excluded is not None:
            on_excluded()
        return False

    proven = set()  # grads tiers that executed once (skip the barrier after)

    def pl_call(state):
        if mode["m"] is None:
            prepare(state)
        if "z" not in zeros:
            try:
                zeros["z"] = jnp.zeros(())
            except Exception:
                pass
        if mode["m"] == "fused":
            return exe["fused"](state)
        while mode["m"] != "excluded":  # split or chunkedN
            grads, penalty, pl_len, new_mean = exe["grads"](state)
            if mode["m"] not in proven:
                try:
                    # Host fetch = the only real execution barrier on this
                    # runtime (CLAUDE.md): an async device OOM in the grads
                    # program surfaces HERE, while ``state`` is still intact
                    # (the grads program does not donate), so walking down
                    # to a deeper chunked tier and retrying is safe.
                    # Compile failures alone are not enough to pick the
                    # tier: at batch 24 the 4-chunk program compiles but
                    # OOMs at execution (round-5 soak).  Once a tier has
                    # executed, the barrier is skipped - steady-state calls
                    # stay fully asynchronous.
                    float(penalty)
                except Exception as exc:
                    if "RESOURCE_EXHAUSTED" not in str(exc):
                        raise
                    del grads, new_mean
                    if not _demote(state):
                        break
                    continue
                proven.add(mode["m"])
            state = exe["apply"](state, grads, new_mean)
            return state, penalty, pl_len
        z = zeros.get("z")
        if z is None:
            z = jnp.asarray(0.0)
        return state, z, z

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
