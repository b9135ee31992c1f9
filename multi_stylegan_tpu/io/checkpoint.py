"""Orbax checkpointing of the full training state.

The reference checkpoints a 6-key torch dict every 5 epochs
(reference multi_stylegan/model_wrapper.py:181-192, README.md:104-111) but
loses the epoch counter, ADA p/r and the schedule state on resume
(SURVEY.md §5).  Here the checkpoint IS the :class:`TrainState` pytree -
step counter, both optimizer states, EMA, ADA controller, path-length mean -
so resume is bitwise exact.  Host-side schedule draws (the cut-mix coin) are
a pure function of (seed, step) (train/loop.py:schedule_coin), so the
schedule is reproduced exactly too without any host RNG state in the
checkpoint.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def _to_abstract(leaf):
    """ShapeDtypeStruct from any array-ish leaf (fresh flax inits can hold
    numpy-backed scalars without a .sharding).  Already-abstract leaves
    (e.g. from ``jax.eval_shape``) pass through."""
    import jax.numpy as jnp

    if isinstance(leaf, jax.ShapeDtypeStruct):
        return leaf
    if not hasattr(leaf, "sharding"):
        leaf = jnp.asarray(leaf)
    return ocp.utils.to_shape_dtype_struct(leaf)


def abstract_template(pytree: Any) -> Any:
    """Abstract (ShapeDtypeStruct) mirror of a pytree, preserving shardings.

    Restoring over a template of live arrays keeps those arrays alive while
    orbax materializes the restored copy - at the flagship 256px config that
    second full TrainState OOMs the chip (round-2 stability run).  Callers
    should take the abstract template, DROP their live-state reference, then
    restore (see Trainer.restore_latest)."""
    return jax.tree.map(_to_abstract, pytree)


_STRUCTURE_MISMATCH_HINT = (
    "Checkpoint and template tree structures differ. If the checkpoint "
    "predates the non-finite update guards, its optimizer states are NOT "
    "wrapped in optax.apply_if_finite: rebuild the restore target with "
    "TrainingConfig(skip_nonfinite_updates=False) (and re-save to migrate). "
    "The reverse mismatch means the checkpoint WAS saved with the guards: "
    "restore with skip_nonfinite_updates=True."
)


def _raise_with_structure_hint(exc: Exception) -> None:
    msg = str(exc)
    if ("structure" in msg.lower() or "apply_if_finite" in msg
            or "ApplyIfFinite" in msg):
        raise type(exc)(f"{msg}\n\n{_STRUCTURE_MISMATCH_HINT}") from exc
    raise


def save_checkpoint(path: str, pytree: Any) -> None:
    """Save any pytree (e.g. a TrainState) to ``path`` (a directory)."""
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_abs(path), pytree, force=True)


def load_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree.  ``template`` (a matching pytree of arrays or
    ShapeDtypeStructs) restores exact structure/dtypes/shardings; without it
    orbax restores as raw arrays in saved structure."""
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            target = jax.tree.map(_to_abstract, template)
            try:
                return ckptr.restore(_abs(path), target)
            except Exception as exc:
                _raise_with_structure_hint(exc)
        return ckptr.restore(_abs(path))


class CheckpointManager:
    """Rolling checkpoint manager: ``checkpoint_<step>`` directories under a
    root, mirroring the reference's ``checkpoint_{epoch}.pt`` naming."""

    def __init__(self, root: str, max_to_keep: int = 5) -> None:
        self.root = _abs(root)
        os.makedirs(self.root, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.root,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        target = jax.tree.map(_to_abstract, state_template)
        try:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        except Exception as exc:
            _raise_with_structure_hint(exc)

    def close(self):
        self._mgr.close()
