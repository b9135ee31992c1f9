"""Hot-path regression guards (structural, trace-only — no compile).

Round-3 measured rule (PERF.md "The wall", round-3 postscript): a gather or
scatter over an image/feature-map-sized operand serializes on TPU — the
NonLocal max-pool's ``take_along_axis`` cost 110 ms fwd + 110 ms bwd at
[16,64,64,384] vs 1.8/2.7 ms as a one-hot masked sum, and the ADA warp's
scatter adjoint cost 347.8 ms vs 34.3 ms as dense interpolation matmuls.
These tests pin the fix structurally: the traced training step must contain
NO scatter at any size, and every large gather must be one of the two
expected benign forms:

- the ADA bilinear-warp tap gather, shape ``[B', H*W, domains*T]`` (its
  forward is gather-based by measurement — the matmul forward loses in
  context; see PERF.md "ADA warp adjoint"), or
- the wrong-order augmentation's time-axis permutation over a rank-5 image
  batch (gathers along T=3 — trivially small axis).

A reintroduced feature-map gather (e.g. max-pool via take_along_axis, with
trailing dim = channels >> 6) or any scatter fails loudly here instead of
silently costing 100+ ms/step on hardware.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from multi_stylegan_tpu.models import Discriminator, Generator
from multi_stylegan_tpu.models.config import (
    TrainingConfig,
    tiny_discriminator_config,
    tiny_generator_config,
)
from multi_stylegan_tpu.train import StepFlags, create_train_state, make_train_step


def _walk(jxp, visit):
    for eqn in jxp.eqns:
        visit(eqn)
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                _walk(v.jaxpr, visit)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if hasattr(x, "jaxpr"):
                        _walk(x.jaxpr, visit)


def _traced_programs(batch_size=8, res=32):
    gcfg, dcfg = tiny_generator_config(), tiny_discriminator_config()
    g, d = Generator(gcfg), Discriminator(dcfg)
    cfg = TrainingConfig(batch_size=batch_size)
    state = jax.eval_shape(
        lambda: create_train_state(jax.random.key(0), g, d, cfg))
    step = make_train_step(g, d, cfg)
    batch = jax.ShapeDtypeStruct((batch_size, 2, 3, res, res), jnp.float32)
    return {
        "main_step": jax.make_jaxpr(step.main_step)(
            state, batch, StepFlags.off()),
        # second-order programs: a custom-VJP hole would surface here as
        # the transposed warp gather, i.e. an image-scale scatter
        "r1_update": jax.make_jaxpr(step.r1_update)(state, batch),
        "path_length": jax.make_jaxpr(step.path_length_update)(state),
    }


def _trace_main_step(batch_size=8, res=32):
    return _traced_programs(batch_size, res)["main_step"]


def test_no_scatter_and_only_benign_gathers_in_all_programs():
    res = 32
    programs = _traced_programs(res=res)
    hw = res * res
    big = hw * 8 // 4  # anything >= quarter image-scale is "hot"
    offenders = []

    def visit(eqn):
        name = eqn.primitive.name
        sz = max((math.prod(v.aval.shape or (1,))
                  for v in list(eqn.invars) + list(eqn.outvars)), default=1)
        if name.startswith("scatter") and sz >= big:
            offenders.append((prog[0], name, eqn.invars[0].aval.shape))
            return
        if name == "gather" and sz >= big:
            shape = eqn.invars[0].aval.shape
            warp_tap = len(shape) == 3 and shape[1] == hw and shape[2] == 6
            time_perm = len(shape) == 5 and shape[2] == 3
            if not (warp_tap or time_perm):
                offenders.append((prog[0], name, shape))

    prog = [None]
    for prog_name, jaxpr in programs.items():
        prog[0] = prog_name
        _walk(jaxpr.jaxpr, visit)
    assert not offenders, (
        "hot-path gather/scatter reintroduced (PERF.md round-3 rule: "
        f"re-express as masked reduction or MXU matmul): {offenders}")


def test_warp_tap_gather_count_is_pinned():
    """The only big gathers are the ADA warp's 4 bilinear taps; their count
    is a pure function of the number of warp call sites traced into the
    step (both lax.cond branches count).  A count increase means a new
    resampling pass entered the hot path — update the pin only with a
    step-level measurement (PERF.md)."""
    jaxpr = _trace_main_step(res=32)
    hw = 32 * 32
    n = [0]

    def visit(eqn):
        if eqn.primitive.name == "gather":
            shape = eqn.invars[0].aval.shape
            if len(shape) == 3 and shape[1] == hw and shape[2] == 6:
                n[0] += 1

    _walk(jaxpr.jaxpr, visit)
    assert n[0] % 4 == 0, f"warp gathers not in 4-tap groups: {n[0]}"
    assert n[0] <= 32, (
        f"{n[0]} warp-tap gathers traced (= {n[0] // 4} warp applications); "
        "was 32 (8 applications: D-real, D-fake, G-fake ADA calls + "
        "cut-mix/wrong-order cond branches).  New resampling in the hot "
        "path - measure before accepting.")
