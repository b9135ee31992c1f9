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
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def make_robust_path_length(
    fused_jit: Callable,
    grads_jit: Callable,
    apply_jit: Callable,
    on_excluded: Optional[Callable[[], None]] = None,
):
    """``state -> (state, penalty, path_length)`` with tiered fallbacks:
    fused program, then grads/apply split, then exclusion (zeros returned,
    ``on_excluded`` fired once).  ``pl_call.mode['m']`` exposes the active
    tier ('fused' / 'split_ok' / 'excluded') for callers that need it."""
    mode = {"m": None}

    def pl_call(state):
        if mode["m"] is None:
            try:
                out = fused_jit(state)
                mode["m"] = "fused"
                return out
            except Exception:
                mode["m"] = "split"  # compile failure: state not consumed
        if mode["m"] == "split":
            try:
                grads, pen, pl_len, new_mean = grads_jit(state)
                state = apply_jit(state, grads, new_mean)
                mode["m"] = "split_ok"
                return state, pen, pl_len
            except Exception:
                mode["m"] = "excluded"
                if on_excluded is not None:
                    on_excluded()
        if mode["m"] == "excluded":
            return state, jnp.asarray(0.0), jnp.asarray(0.0)
        if mode["m"] == "split_ok":
            grads, pen, pl_len, new_mean = grads_jit(state)
            state = apply_jit(state, grads, new_mean)
            return state, pen, pl_len
        return fused_jit(state)

    pl_call.mode = mode
    pl_call.lower = None  # no single lowering (cost analysis skips it)
    return pl_call
