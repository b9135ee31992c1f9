"""Training state pytree + optimizer construction.

The reference scatters training state across host objects: two torch
optimizers, an EMA copy, ADA's python floats, the path-length running mean
and a progress-bar step counter (reference multi_stylegan/model_wrapper.py,
adaptive_discriminator_augmentation.py:36-39, loss.py:369).  Here everything
lives in one device-resident pytree so the whole step - both optimizers, EMA,
ADA control, schedules - compiles into a single XLA program, and a checkpoint
of this pytree captures ALL of it (fixing the reference's resume gaps:
SURVEY.md §5 "epoch counter is not checkpointed; ADA p/r state is not saved").

Optimizers are optax: global-norm clip 5.0 feeding Adam(0.0, 0.999)
(train_multi_stylegan.py:53-57, model_wrapper.py:296-298), with the style
mapping net in its own Adam group at lr/100 (generator.get_parameters,
multi_stylegan_generator.py:97-112).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from multi_stylegan_tpu.models.config import (
    DiscriminatorConfig,
    GeneratorConfig,
    TrainingConfig,
)
from multi_stylegan_tpu.models.discriminator import Discriminator
from multi_stylegan_tpu.models.generator import Generator
from multi_stylegan_tpu.train.ada import AdaState


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # 1-based global batch counter
    rng: jax.Array
    g_params: Any
    g_noises: Any  # fixed-noise buffer collection
    g_ema_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    ada: AdaState
    mean_path_length: jax.Array


def generator_label_tree(params) -> Any:
    """'style' for the mapping net (trained at lr/100), 'main' otherwise."""
    return {
        k: jax.tree.map(lambda _: "style" if k == "style_mapping" else "main", v)
        for k, v in params.items()
    }


def _finite_guard(
    cfg: TrainingConfig, opt: optax.GradientTransformation
) -> optax.GradientTransformation:
    """Skip (not apply) any update containing non-finite values.

    GAN second-order regularizers can transiently produce inf/NaN gradients
    when the discriminator saturates (observed on hardware: the round-2
    300-step stability run poisoned every parameter from one bad R1 update
    at the flagship bf16 config; the reference has no guard and would
    corrupt the same way).  ``optax.apply_if_finite`` zeroes the update and
    keeps inner optimizer state untouched for up to
    ``max_consecutive_nonfinite`` consecutive bad steps - identical
    arithmetic on every finite step."""
    if not cfg.skip_nonfinite_updates:
        return opt
    return optax.apply_if_finite(opt, cfg.max_consecutive_nonfinite)


def make_generator_optimizer(cfg: TrainingConfig) -> optax.GradientTransformation:
    adam = lambda lr: optax.adam(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2)
    return _finite_guard(cfg, optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.multi_transform(
            {
                "main": adam(cfg.lr_generator),
                "style": adam(cfg.lr_generator * cfg.lr_style_factor),
            },
            generator_label_tree,
        ),
    ))


def make_discriminator_optimizer(
    cfg: TrainingConfig, lr_schedule=None
) -> optax.GradientTransformation:
    """``lr_schedule``: optional optax schedule (step -> lr), the TPU-native
    form of the reference's optional discriminator lr scheduler
    (model_wrapper.py:40, 193-195; default None there too)."""
    lr = lr_schedule if lr_schedule is not None else cfg.lr_discriminator
    return _finite_guard(cfg, optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adam(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2),
    ))


def _graft_moments(target, source) -> Any:
    """Replace every array leaf of ``target`` (an optax mu/nu tree, possibly
    containing optax.MaskedNode placeholders under multi_transform) with the
    array at the same dict path in ``source``.  MaskedNodes flatten to no
    leaves, so each masked Adam group picks up exactly its own subset."""

    def pick(path, leaf):
        node = source
        for p in path:
            node = node[p.key]
        arr = jnp.asarray(node, dtype=leaf.dtype)
        if arr.shape != leaf.shape:
            raise ValueError(
                f"converted moment at {jax.tree_util.keystr(path)} has shape "
                f"{arr.shape}, optimizer expects {leaf.shape}")
        return arr

    return jax.tree_util.tree_map_with_path(pick, target)


def install_adam_moments(opt_state, mu, nu, count: int):
    """Graft converted torch Adam moments (io/torch_convert.py::
    convert_adam_state) into an optax optimizer state.

    The reference restores both Adam state_dicts on --load_checkpoint
    (train_multi_stylegan.py:80-81); this is the optax side of that resume
    path.  Works on any state produced by make_generator_optimizer /
    make_discriminator_optimizer: every ScaleByAdamState found in the state
    pytree (under apply_if_finite / chain / multi_transform wrappers) gets
    its mu/nu leaves replaced and its count set — optax bias-corrects with
    the same ``count`` semantics as torch's per-param ``step``, so the next
    update continues the torch trajectory exactly."""

    def fix(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                count=jnp.asarray(count, node.count.dtype),
                mu=_graft_moments(node.mu, mu),
                nu=_graft_moments(node.nu, nu),
            )
        return node

    return jax.tree.map(
        fix, opt_state,
        is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
    )


def extract_adam_moments(opt_state) -> dict:
    """Inverse of install_adam_moments: collect {"mu", "nu", "count"} trees
    from every ScaleByAdamState in an optax state (under apply_if_finite /
    chain / multi_transform wrappers).  multi_transform's masked groups hold
    arrays only at their own leaves (MaskedNode elsewhere), so overlaying
    all groups reassembles the full param-shaped tree — the torch-format
    source for io.torch_convert.export_adam_state."""
    mu: dict = {}
    nu: dict = {}
    counts = [0]

    def overlay(dst, src_state):
        for path, leaf in jax.tree_util.tree_leaves_with_path(src_state):
            node = dst
            for p in path[:-1]:
                node = node.setdefault(p.key, {})
            node[path[-1].key] = leaf

    def visit(node):
        if isinstance(node, optax.ScaleByAdamState):
            counts.append(int(node.count))
            overlay(mu, node.mu)
            overlay(nu, node.nu)
        return node

    jax.tree.map(visit, opt_state,
                 is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))
    return {"mu": mu, "nu": nu, "count": max(counts)}


def create_train_state(
    rng: jax.Array,
    generator: Generator,
    discriminator: Discriminator,
    train_cfg: TrainingConfig,
) -> TrainState:
    gcfg: GeneratorConfig = generator.config
    dcfg: DiscriminatorConfig = discriminator.config
    k_g, k_d, k_run = jax.random.split(rng, 3)
    z = jnp.zeros((1, gcfg.latent_dimensions))
    g_vars = generator.init(
        {"params": k_g, "noise": k_g, "mixing": k_g}, z, randomize_noise=False
    )
    t = dcfg.sequence_length
    c = dcfg.input_channels // t
    h, w = gcfg.resolution
    d_vars = discriminator.init(k_d, jnp.zeros((2, c, t, h, w)))
    g_opt = make_generator_optimizer(train_cfg)
    d_opt = make_discriminator_optimizer(train_cfg)
    # commit every leaf to a device array (un-jitted flax init can yield
    # numpy-backed scalars, which break sharding-aware checkpoint restore)
    g_vars = jax.tree.map(jnp.asarray, g_vars)
    d_vars = jax.tree.map(jnp.asarray, d_vars)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        rng=k_run,
        g_params=g_vars["params"],
        g_noises=g_vars["noises"],
        g_ema_params=jax.tree.map(jnp.copy, g_vars["params"]),
        d_params=d_vars["params"],
        g_opt_state=g_opt.init(g_vars["params"]),
        d_opt_state=d_opt.init(d_vars["params"]),
        ada=AdaState.create(train_cfg.ada_p_init),
        mean_path_length=jnp.asarray(0.0, jnp.float32),
    )
