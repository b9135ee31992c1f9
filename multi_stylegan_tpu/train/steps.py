"""Fused, jit-compiled GAN training steps.

The reference's per-batch hot loop (reference multi_stylegan/
model_wrapper.py:245-451, anatomy in SURVEY.md §3.1) runs up to six separate
optimizer steps with host-side branching and `.item()` syncs.  Here the whole
batch - D step, lazy R1, cut-mix augmentation + consistency, G step with
top-k, lazy path-length, EMA, ADA control - compiles into ONE XLA program:

* lazy (every-16) regularizers and the cut-mix branch are `lax.cond`s on
  traced flags, so there is exactly one compilation;
* dynamic batch games (the reference concatenates 1/4 batch of time-permuted
  reals to the fakes, model_wrapper.py:272-277) become fixed-shape side
  batches with masked loss denominators - numerically identical;
* all randomness derives from the state's PRNG key folded with the step
  counter: bitwise reproducible, resumable.

Sub-steps are also exposed individually for testing.
"""

from __future__ import annotations

import math

from typing import Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from multi_stylegan_tpu.models.config import TrainingConfig
from multi_stylegan_tpu.models.discriminator import Discriminator
from multi_stylegan_tpu.models.generator import Generator
from multi_stylegan_tpu.train import losses
from multi_stylegan_tpu.train.ada import augment_sequences, calc_r, update_ada_state
from multi_stylegan_tpu.train.ema import ema_update
from multi_stylegan_tpu.train.noise import get_noise, random_permutation
from multi_stylegan_tpu.train.state import (
    TrainState,
    make_discriminator_optimizer,
    make_generator_optimizer,
)


@flax.struct.dataclass
class StepFlags:
    """Per-step traced control (host computes these from the epoch schedule,
    model_wrapper.py:272, 290-291, 331-332).  ``do_ema`` is used by the
    split-mode main step: on path-length steps the EMA is applied after the
    PL update instead (the reference EMAs once per batch, after ALL updates,
    model_wrapper.py:446)."""

    wrong_order: jax.Array  # bool: append time-permuted reals to fakes
    trap_weight: jax.Array  # bool: apply the trap weights map to pixel losses
    do_cut_mix: jax.Array  # bool: run the cut-mix aug + consistency updates
    do_ema: jax.Array = flax.struct.field(default_factory=lambda: jnp.asarray(True))

    @classmethod
    def off(cls) -> "StepFlags":
        f = jnp.asarray(False)
        return cls(wrong_order=f, trap_weight=f, do_cut_mix=f)


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over a concat-equivalent set: sum(x*m) / sum(m) with m
    broadcasting over x's trailing dims."""
    count = jnp.sum(mask) * (x.size / mask.size)
    return jnp.sum(x * mask) / count


def make_train_step(
    generator: Generator,
    discriminator: Discriminator,
    cfg: TrainingConfig,
    *,
    top_k_start_iteration: int = 0,
    top_k_final_iteration: int = 1,
    trap_weights_map: Optional[jax.Array] = None,
) -> Callable[[TrainState, jax.Array, StepFlags], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the fused train step. top_k iterations follow
    model_wrapper.py:116-125 (fractions of total steps; resume collapses to
    start=0/final=1)."""

    g_opt = make_generator_optimizer(cfg)
    d_opt = make_discriminator_optimizer(cfg)
    gcfg = generator.config

    # The second-order regularizers (R1, path-length) run through f32 model
    # variants regardless of compute_dtype: their grad-of-grad overflows in
    # bfloat16 (observed: finite penalty, non-finite parameter grads), and
    # they fire only every `lazy_*` steps so the f32 cost is amortized away.
    # Param trees are dtype-independent, so the same params apply.
    import dataclasses as _dc

    generator32 = type(generator)(
        _dc.replace(generator.config, compute_dtype="float32", remat=True)
    )
    discriminator32 = type(discriminator)(
        _dc.replace(discriminator.config, compute_dtype="float32", remat=True)
    )

    # ------------------------------------------------------------- applies

    def d_raw(d_params, images):
        return discriminator.apply({"params": d_params}, images)

    def d_raw32(d_params, images):
        return discriminator32.apply({"params": d_params}, images)

    def d_ada(d_params, images, rng, p):
        return d_raw(d_params, augment_sequences(
            rng, images, p, sequential_warps=cfg.ada_sequential_warps))

    def mapping(g_vars, z):
        return generator.apply(g_vars, z, method=Generator.map_latent)

    def build_wplus(g_vars, rng, batch):
        kz, kmix = jax.random.split(rng)
        z1, z2, use_mix = get_noise(kz, batch, gcfg.latent_dimensions, cfg.p_mixed_noise)
        w1 = mapping(g_vars, z1)
        w2 = mapping(g_vars, z2)
        inject = jax.random.randint(kmix, (), 1, gcfg.n_latents - 1)
        inject = jnp.where(use_mix, inject, gcfg.n_latents)
        slots = jnp.arange(gcfg.n_latents)[None, :, None]
        return jnp.where(slots < inject, w1[:, None, :], w2[:, None, :])

    def synthesize(g_vars, wplus, noise_list):
        return generator.apply(g_vars, wplus, noise_list, method=Generator.synthesize)

    def synthesize32(g_vars, wplus, noise_list):
        return generator32.apply(g_vars, wplus, noise_list, method=Generator.synthesize)

    def sample_fakes(g_vars, rng, batch):
        k_w, k_n = jax.random.split(rng)
        wplus = build_wplus(g_vars, k_w, batch)
        noise_list = generator.random_noise(batch, k_n)
        return synthesize(g_vars, wplus, noise_list)

    def pixel_loss_weighted(raw_elem: jax.Array, trap_on: jax.Array) -> jax.Array:
        """mean(raw) or mean(raw * trap_map) under the traced flag
        (model_wrapper.py:287-291)."""
        plain = jnp.mean(raw_elem)
        if trap_weights_map is None:
            return plain
        w = trap_weights_map.reshape(1, 1, 1, *trap_weights_map.shape[-2:])
        return jnp.where(trap_on, jnp.mean(raw_elem * w), plain)

    # -------------------------------------------------------------- D step

    def d_step(state: TrainState, real: jax.Array, flags: StepFlags, rng):
        b = real.shape[0]
        n_wrong = max(1, int(cfg.batch_factor_wrong_order * b))
        k_fake, k_perm, k_ar, k_af, k_aw = jax.random.split(rng, 5)
        fakes = lax.stop_gradient(
            sample_fakes({"params": state.g_params, "noises": state.g_noises},
                         k_fake, b)
        )
        perm = random_permutation(k_perm, real.shape[2])
        wrong = jnp.take(real[:n_wrong], perm, axis=2)

        def loss_fn(d_params):
            pr_s, pr_p = d_ada(d_params, real, k_ar, state.ada.p)
            pf_s, pf_p = d_ada(d_params, fakes, k_af, state.ada.p)
            pw_s, pw_p = lax.cond(
                flags.wrong_order,
                lambda: d_ada(d_params, wrong, k_aw, state.ada.p),
                lambda: (jnp.zeros((n_wrong, 1)), jnp.zeros_like(pr_p[:n_wrong])),
            )
            won = flags.wrong_order.astype(jnp.float32)
            # fake-side losses over the concat-equivalent batch (B + flag*n_wrong)
            mask = jnp.concatenate([jnp.ones((b,)), won * jnp.ones((n_wrong,))])
            all_s = jnp.concatenate([pf_s, pw_s], axis=0)
            all_p = jnp.concatenate([pf_p, pw_p], axis=0)
            loss_real = jnp.mean(jax.nn.softplus(-pr_s))
            loss_fake = _masked_mean(jax.nn.softplus(all_s), mask[:, None])
            loss_real_px = pixel_loss_weighted(jax.nn.softplus(-pr_p), flags.trap_weight)
            if trap_weights_map is None:
                loss_fake_px = _masked_mean(
                    jax.nn.softplus(all_p), mask[:, None, None, None, None]
                )
            else:
                w = trap_weights_map.reshape(1, 1, 1, *trap_weights_map.shape[-2:])
                sp = jax.nn.softplus(all_p)
                loss_fake_px = jnp.where(
                    flags.trap_weight,
                    _masked_mean(sp * w, mask[:, None, None, None, None]),
                    _masked_mean(sp, mask[:, None, None, None, None]),
                )
            total = loss_real + loss_fake + loss_real_px + loss_fake_px
            # ADA overfitting heuristic on the (concat-equivalent) fake batch
            # (ada.py:43-52, 75-78), masked like the losses.
            r_s = jnp.sum(jnp.sign(all_s[:, 0]) * mask) / jnp.sum(mask)
            pp_means = jnp.mean(all_p, axis=(-1, -2)).reshape(all_p.shape[0], -1)
            r_p = jnp.sum(jnp.sign(pp_means) * mask[:, None]) / jnp.sum(mask)
            aux = dict(
                loss_discriminator_real=loss_real,
                loss_discriminator_fake=loss_fake,
                loss_discriminator_real_pixel_wise=loss_real_px,
                loss_discriminator_fake_pixel_wise=loss_fake_px,
                _r=lax.stop_gradient(0.5 * r_s + 0.5 * r_p),
                _real_pp=lax.stop_gradient(pr_p),
                _fake_pp=lax.stop_gradient(pf_p),
            )
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
        updates, d_opt_state = d_opt.update(grads, state.d_opt_state, state.d_params)
        d_params = jax.tree.map(lambda p, u: p + u, state.d_params, updates)

        ada = update_ada_state(
            state.ada, aux["_r"],
            r_target=cfg.ada_r_target, p_step=cfg.ada_p_step,
            r_update=cfg.ada_r_update, p_max=cfg.ada_p_max,
        ) if cfg.ada else state.ada

        state = state.replace(d_params=d_params, d_opt_state=d_opt_state, ada=ada)
        metrics = {k: v for k, v in aux.items() if not k.startswith("_")}
        return state, fakes, aux["_real_pp"], aux["_fake_pp"], metrics

    # ------------------------------------------------------------- R1 step

    def r1_step(state: TrainState, real: jax.Array):
        def loss_fn(d_params):
            # f32 discriminator: the R1 grad-of-grad overflows in bf16
            pen = losses.r1_penalty(lambda x: d_raw32(d_params, x), real)
            # predictions re-used by the cut-mix consistency target when R1
            # ran this step (model_wrapper.py:314 overwrites them).
            _, pr_p = d_raw32(d_params, real)
            return cfg.w_discriminator_regularization_r1 * pen, (pen, lax.stop_gradient(pr_p))

        (_, (pen, pr_p)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
        updates, d_opt_state = d_opt.update(grads, state.d_opt_state, state.d_params)
        d_params = jax.tree.map(lambda p, u: p + u, state.d_params, updates)
        return state.replace(d_params=d_params, d_opt_state=d_opt_state), pen, pr_p

    # --------------------------------------------------------- cutmix step

    def cut_mix_step(state: TrainState, real, fakes, real_pp, fake_pp, rng):
        from multi_stylegan_tpu.models.discriminator import (
            generate_cut_mix_augmentation_data,
            generate_cut_mix_transformation_data,
        )

        k1, k2 = jax.random.split(rng)
        mixed, target = generate_cut_mix_augmentation_data(k1, real, fakes)

        def loss_aug(d_params):
            _, pp = d_raw(d_params, mixed)
            lr_, lf_ = losses.non_saturating_discriminator_loss_cut_mix(pp, target)
            return cfg.w_discriminator_regularization * (lr_ + lf_), lr_ + lf_

        (_, l_aug), grads = jax.value_and_grad(loss_aug, has_aux=True)(state.d_params)
        updates, d_opt_state = d_opt.update(grads, state.d_opt_state, state.d_params)
        d_params = jax.tree.map(lambda p, u: p + u, state.d_params, updates)
        state = state.replace(d_params=d_params, d_opt_state=d_opt_state)

        mixed2, target2 = generate_cut_mix_transformation_data(
            k2, real, fakes, real_pp, fake_pp
        )

        def loss_reg(d_params):
            _, pp = d_raw(d_params, mixed2)
            l = jnp.mean(jnp.square(pp - target2))
            return cfg.w_discriminator_regularization * l, l

        (_, l_reg), grads = jax.value_and_grad(loss_reg, has_aux=True)(state.d_params)
        updates, d_opt_state = d_opt.update(grads, state.d_opt_state, state.d_params)
        d_params = jax.tree.map(lambda p, u: p + u, state.d_params, updates)
        state = state.replace(d_params=d_params, d_opt_state=d_opt_state)
        return state, l_aug, l_reg

    # -------------------------------------------------------------- G step

    def g_step(state: TrainState, b: int, flags: StepFlags, rng):
        k_fake, k_aug = jax.random.split(rng)
        if top_k_final_iteration > top_k_start_iteration:
            v = losses.top_k_v(state.step, top_k_start_iteration, top_k_final_iteration)
        else:
            v = jnp.asarray(1.0)

        def loss_fn(g_params):
            fakes = sample_fakes({"params": g_params, "noises": state.g_noises},
                                 k_fake, b)
            pf_s, pf_p = d_ada(state.d_params, fakes, k_aug, state.ada.p)
            mask, k = losses.top_k_mask(pf_s, v)
            loss_scalar = jnp.sum(jax.nn.softplus(-pf_s) * mask) / k
            mask_b = mask.reshape(b, 1, 1, 1, 1)
            per_elem = pf_p.size // b
            raw_px = jax.nn.softplus(-pf_p) * mask_b
            if trap_weights_map is None:
                loss_px = jnp.sum(raw_px) / (k * per_elem)
            else:
                w = trap_weights_map.reshape(1, 1, 1, *trap_weights_map.shape[-2:])
                loss_px = jnp.where(
                    flags.trap_weight,
                    jnp.sum(raw_px * w) / (k * per_elem),
                    jnp.sum(raw_px) / (k * per_elem),
                )
            aux = dict(
                loss_generator=loss_scalar,
                loss_generator_pixel_wise=loss_px,
                _pf_s=lax.stop_gradient(pf_s),
                _pf_p=lax.stop_gradient(pf_p),
            )
            return loss_scalar + loss_px, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.g_params)
        updates, g_opt_state = g_opt.update(grads, state.g_opt_state, state.g_params)
        g_params = jax.tree.map(lambda p, u: p + u, state.g_params, updates)

        # the G-step fake forward also feeds the ADA heuristic (the reference
        # wrapper updates r on every is_real=False call, ada.py:75-78)
        r = calc_r(aux["_pf_s"], aux["_pf_p"])
        ada = update_ada_state(
            state.ada, r,
            r_target=cfg.ada_r_target, p_step=cfg.ada_p_step,
            r_update=cfg.ada_r_update, p_max=cfg.ada_p_max,
        ) if cfg.ada else state.ada

        state = state.replace(g_params=g_params, g_opt_state=g_opt_state, ada=ada)
        metrics = {k: v for k, v in aux.items() if not k.startswith("_")}
        metrics["top_k_v"] = v
        return state, metrics

    # ------------------------------------------------------ path-length step

    def path_length_step(state: TrainState, b: int, rng):
        bs = max(1, int(cfg.batch_size_shrink_path_length_regularization * b))
        k_w, k_n, k_pl = jax.random.split(rng, 3)
        noise_list = generator.random_noise(bs, k_n)

        def loss_fn(g_params):
            # f32 synthesis for the path-length grad-of-grad (see note above)
            g_vars = {"params": g_params, "noises": state.g_noises}
            wplus = build_wplus(g_vars, k_w, bs)
            synth = lambda wp: synthesize32(g_vars, wp, noise_list)
            grads_pl = losses.path_length_grads(synth, wplus, k_pl)
            pen, pl, new_mean = losses.path_length_penalty(
                grads_pl, state.mean_path_length, cfg.path_length_decay
            )
            return cfg.w_generator_regularization * pen, (pen, pl, new_mean)

        (_, (pen, pl, new_mean)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params
        )
        updates, g_opt_state = g_opt.update(grads, state.g_opt_state, state.g_params)
        g_params = jax.tree.map(lambda p, u: p + u, state.g_params, updates)
        # running-mean guard: a non-finite observation must not poison the
        # carried state (the param update is guarded in the optimizer chain)
        new_mean = jnp.where(jnp.isfinite(new_mean), new_mean, state.mean_path_length)
        return (
            state.replace(
                g_params=g_params, g_opt_state=g_opt_state, mean_path_length=new_mean
            ),
            pen,
            pl,
        )

    # ----------------------------------------------------------- fused step

    def train_step(state: TrainState, real: jax.Array, flags: StepFlags):
        b = real.shape[0]
        step = state.step + 1  # 1-based, like the reference progress counter
        state = state.replace(step=step)
        base = jax.random.fold_in(state.rng, step)
        k_d, k_cm, k_g, k_pl = jax.random.split(base, 4)

        state, fakes, real_pp, fake_pp, m_d = d_step(state, real, flags, k_d)

        lazy_d = (step % cfg.lazy_discriminator_regularization) == 0
        state, r1_pen, r1_pp = lax.cond(
            lazy_d,
            lambda s: r1_step(s, real),
            lambda s: (s, jnp.asarray(0.0), jnp.zeros_like(real_pp)),
            state,
        )
        # if R1 ran, its (un-augmented) predictions feed the cut-mix target
        real_pp = jnp.where(lazy_d, r1_pp, real_pp)

        state, l_cm_aug, l_cm_reg = lax.cond(
            flags.do_cut_mix,
            lambda s: cut_mix_step(s, real, fakes, real_pp, fake_pp, k_cm),
            lambda s: (s, jnp.asarray(0.0), jnp.asarray(0.0)),
            state,
        )

        state, m_g = g_step(state, b, flags, k_g)

        lazy_g = (step % cfg.lazy_generator_regularization) == 0
        state, pl_pen, pl_len = lax.cond(
            lazy_g,
            lambda s: path_length_step(s, b, k_pl),
            lambda s: (s, jnp.asarray(0.0), jnp.asarray(0.0)),
            state,
        )

        state = state.replace(
            g_ema_params=ema_update(state.g_ema_params, state.g_params, cfg.ema_decay)
        )

        metrics = dict(m_d)
        metrics.update(m_g)
        metrics.update(
            loss_discriminator_regularization=r1_pen,
            loss_cut_mix_augmentation=l_cm_aug,
            loss_cut_mix_regularization=l_cm_reg,
            loss_path_length_regularization=pl_pen,
            path_length=pl_len,
            ada_p=state.ada.p,
            ada_r=state.ada.last_r,
        )
        return state, metrics

    # ---------------------------------------------------------- split mode
    #
    # At the full 256^2 config the single fused program (which must reserve
    # memory for the f32 second-order branches) exceeds compile/HBM limits.
    # Split mode compiles three independent programs - the per-batch main
    # step (D + cut-mix + G + EMA) and the two lazy regularizer updates -
    # with the HOST applying the every-16 schedule, exactly the reference's
    # own structure (model_wrapper.py:307, 418).  Divergence: the reference
    # runs R1 between the D and G updates and reuses its predictions for the
    # cut-mix target; split mode runs both regularizers after the main step
    # (a 1-in-16-step ordering difference on parameter state).

    def main_step(state: TrainState, real: jax.Array, flags: StepFlags):
        b = real.shape[0]
        step = state.step + 1
        state = state.replace(step=step)
        base = jax.random.fold_in(state.rng, step)
        k_d, k_cm, k_g, _ = jax.random.split(base, 4)

        state, fakes, real_pp, fake_pp, m_d = d_step(state, real, flags, k_d)
        state, l_cm_aug, l_cm_reg = lax.cond(
            flags.do_cut_mix,
            lambda s: cut_mix_step(s, real, fakes, real_pp, fake_pp, k_cm),
            lambda s: (s, jnp.asarray(0.0), jnp.asarray(0.0)),
            state,
        )
        state, m_g = g_step(state, b, flags, k_g)
        # EMA here unless the host will run the path-length update (which
        # EMAs after its own parameter change, matching the reference's
        # once-per-batch EMA after all updates, model_wrapper.py:446)
        ema = ema_update(state.g_ema_params, state.g_params, cfg.ema_decay)
        state = state.replace(
            g_ema_params=jax.tree.map(
                lambda e_new, e_old: jnp.where(flags.do_ema, e_new, e_old),
                ema, state.g_ema_params,
            )
        )
        metrics = dict(m_d)
        metrics.update(m_g)
        metrics.update(
            loss_cut_mix_augmentation=l_cm_aug,
            loss_cut_mix_regularization=l_cm_reg,
            ada_p=state.ada.p,
            ada_r=state.ada.last_r,
        )
        return state, metrics

    # Split-main tier (compile robustness at large batch): the fused
    # main_step is the biggest always-on program, and the remote compile
    # helper rejects it first as batch grows (b>16 observed 2026-08-17).
    # The same math split at the D/G boundary compiles as two roughly
    # half-size programs; composition main_step_g(main_step_d(...)) is
    # BIT-IDENTICAL to main_step (same key derivation re-derived from the
    # already-bumped state.step; tested in tests/test_train_step.py).

    def main_step_d(state: TrainState, real: jax.Array, flags: StepFlags):
        step = state.step + 1
        state = state.replace(step=step)
        base = jax.random.fold_in(state.rng, step)
        k_d, k_cm, _, _ = jax.random.split(base, 4)
        state, fakes, real_pp, fake_pp, m_d = d_step(state, real, flags, k_d)
        state, l_cm_aug, l_cm_reg = lax.cond(
            flags.do_cut_mix,
            lambda s: cut_mix_step(s, real, fakes, real_pp, fake_pp, k_cm),
            lambda s: (s, jnp.asarray(0.0), jnp.asarray(0.0)),
            state,
        )
        metrics = dict(m_d)
        metrics.update(
            loss_cut_mix_augmentation=l_cm_aug,
            loss_cut_mix_regularization=l_cm_reg,
        )
        return state, metrics

    def main_step_g(state: TrainState, batch_size: int, flags: StepFlags):
        # state.step was bumped by main_step_d - re-derive the same keys
        base = jax.random.fold_in(state.rng, state.step)
        _, _, k_g, _ = jax.random.split(base, 4)
        state, m_g = g_step(state, batch_size, flags, k_g)
        ema = ema_update(state.g_ema_params, state.g_params, cfg.ema_decay)
        state = state.replace(
            g_ema_params=jax.tree.map(
                lambda e_new, e_old: jnp.where(flags.do_ema, e_new, e_old),
                ema, state.g_ema_params,
            )
        )
        metrics = dict(m_g)
        metrics.update(ada_p=state.ada.p, ada_r=state.ada.last_r)
        return state, metrics

    def r1_update(state: TrainState, real: jax.Array):
        state, pen, _ = r1_step(state, real)
        return state, pen

    def path_length_update(state: TrainState):
        k_pl = jax.random.fold_in(jax.random.fold_in(state.rng, state.step), 17)
        state, pen, pl = path_length_step(state, cfg.batch_size, k_pl)
        state = state.replace(
            g_ema_params=ema_update(state.g_ema_params, state.g_params, cfg.ema_decay)
        )
        return state, pen, pl

    # Compile-robustness fallback: the single path-length program (f32
    # second-order synthesis + optimizer update, donated) is the largest
    # program in the suite and the first casualty when the remote TPU
    # compile helper degrades over a long session (CLAUDE.md gotchas).  The
    # same math split at the gradient boundary compiles as two much smaller
    # programs: grads (no state update, nothing donated) + apply (elementwise
    # optimizer/EMA update).  Bit-identical result to path_length_update.

    def path_length_grads(state: TrainState):
        bs = max(1, int(cfg.batch_size_shrink_path_length_regularization
                        * cfg.batch_size))
        base = jax.random.fold_in(jax.random.fold_in(state.rng, state.step), 17)
        k_w, k_n, k_pl = jax.random.split(base, 3)
        noise_list = generator.random_noise(bs, k_n)

        def loss_fn(g_params):
            g_vars = {"params": g_params, "noises": state.g_noises}
            wplus = build_wplus(g_vars, k_w, bs)
            synth = lambda wp: synthesize32(g_vars, wp, noise_list)
            grads_pl = losses.path_length_grads(synth, wplus, k_pl)
            pen, pl, new_mean = losses.path_length_penalty(
                grads_pl, state.mean_path_length, cfg.path_length_decay
            )
            return cfg.w_generator_regularization * pen, (pen, pl, new_mean)

        (_, (pen, pl, new_mean)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.g_params)
        return grads, pen, pl, new_mean

    def path_length_apply(state: TrainState, grads, new_mean):
        updates, g_opt_state = g_opt.update(grads, state.g_opt_state, state.g_params)
        g_params = jax.tree.map(lambda p, u: p + u, state.g_params, updates)
        new_mean = jnp.where(jnp.isfinite(new_mean), new_mean, state.mean_path_length)
        state = state.replace(
            g_params=g_params, g_opt_state=g_opt_state, mean_path_length=new_mean
        )
        return state.replace(
            g_ema_params=ema_update(state.g_ema_params, state.g_params, cfg.ema_decay)
        )

    def path_length_grads_chunked(n_chunks: int):
        """Tier-3 compile fallback: ``path_length_grads`` with the f32
        grad-of-grad synthesis ``lax.scan``'ed over ``n_chunks`` sub-batches.

        The remote compile helper's failures are shape/memory-dependent (the
        b16 main program compiles while b18's does not), so halving the
        second-order synthesis batch makes the largest program in the suite
        compilable again at the same op count.  The math is the full-batch
        math: per-sample path lengths couple across the batch only through
        the scalar mean pl = (1/bs)*sum_i pl_i, hence

            d(w*pen)/dtheta = w * 2*(1-decay)^2 * (pl - a) * (1/bs) sum_i d pl_i/dtheta

        and the per-sample terms can be accumulated chunk by chunk.  All
        random draws (w+, per-layer noise, the path-length probe y) use the
        full-batch keys and are sliced per chunk, so the sample set is
        byte-identical to ``path_length_grads``; results differ only by fp
        reassociation of the sums (tested ~1e-5 on CPU).
        """

        def grads_chunked(state: TrainState):
            bs = max(1, int(cfg.batch_size_shrink_path_length_regularization
                            * cfg.batch_size))
            if bs % n_chunks != 0:
                raise ValueError(f"bs={bs} not divisible by {n_chunks} chunks")
            cbs = bs // n_chunks
            base = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step), 17)
            k_w, k_n, k_pl = jax.random.split(base, 3)
            g_vars = {"params": state.g_params, "noises": state.g_noises}
            noise_list = generator.random_noise(bs, k_n)
            # path-length probe noise: same draw as losses.path_length_grads
            img_shape = jax.eval_shape(
                lambda wp: synthesize32(g_vars, wp, noise_list),
                jax.eval_shape(lambda: build_wplus(g_vars, k_w, bs))).shape
            t, h, w = img_shape[2], img_shape[3], img_shape[4]
            y_full = jax.random.normal(k_pl, img_shape) / math.sqrt(t * h * w)

            def chunked(a):
                return a.reshape(n_chunks, cbs, *a.shape[1:])

            xs = (jax.tree.map(chunked, noise_list), chunked(y_full),
                  jnp.arange(n_chunks))

            def pl_sum_of(g_params, noise_c, y_c, i):
                gv = {"params": g_params, "noises": state.g_noises}
                wp_c = jax.lax.dynamic_slice_in_dim(
                    build_wplus(gv, k_w, bs), i * cbs, cbs, axis=0)

                def dotted(wp):
                    return jnp.sum(synthesize32(gv, wp, noise_c) * y_c)

                gw = jax.grad(dotted)(wp_c)
                # per-sample path lengths, summed (mean taken after the scan)
                return jnp.sum(jnp.sqrt(
                    jnp.mean(jnp.sum(jnp.square(gw), axis=2), axis=1) + 1e-8))

            def body(carry, x):
                acc, s = carry
                noise_c, y_c, i = x
                s_c, g_c = jax.value_and_grad(pl_sum_of)(
                    state.g_params, noise_c, y_c, i)
                return (jax.tree.map(jnp.add, acc, g_c), s + s_c), None

            zeros = jax.tree.map(jnp.zeros_like, state.g_params)
            (acc, s), _ = jax.lax.scan(body, (zeros, jnp.asarray(0.0)), xs)

            pl = s / bs
            a = jax.lax.stop_gradient(state.mean_path_length)
            new_mean = a + cfg.path_length_decay * (pl - a)
            pen = jnp.square(pl - new_mean)
            scale = (cfg.w_generator_regularization * 2.0
                     * (1.0 - cfg.path_length_decay) * (pl - new_mean) / bs)
            grads = jax.tree.map(lambda g: scale * g, acc)
            return grads, pen, pl, jax.lax.stop_gradient(new_mean)

        grads_chunked.__name__ = f"path_length_grads_chunk{n_chunks}"
        return grads_chunked

    # expose sub-steps for unit tests and split-mode drivers
    train_step.d_step = d_step
    train_step.g_step = g_step
    train_step.r1_step = r1_step
    train_step.cut_mix_step = cut_mix_step
    train_step.path_length_step = path_length_step
    train_step.sample_fakes = sample_fakes
    train_step.build_wplus = build_wplus
    train_step.main_step = main_step
    train_step.main_step_d = main_step_d
    train_step.main_step_g = main_step_g
    train_step.r1_update = r1_update
    train_step.path_length_update = path_length_update
    train_step.path_length_grads = path_length_grads
    train_step.path_length_apply = path_length_apply
    train_step.path_length_grads_chunked = path_length_grads_chunked
    # second-order batch (reference: batch_size_shrink, model_wrapper.py) -
    # the robust-PL ladder derives its chunk tiers from this
    train_step.path_length_batch = max(
        1, int(cfg.batch_size_shrink_path_length_regularization
               * cfg.batch_size))
    return train_step
