"""Checkpoint manager — Orbax-backed, with the reference's save policy.

Parity with reference ``models/base_model.py:13-26`` + SURVEY.md §5.4:
  - rolling keep-N checkpoints keyed by iteration;
  - permanent "long saves" every ``--long-save-frequency`` saves into a
    separate directory (``base_model.py:24-25``);
  - restore latest with **variable-prefix remapping**
    (``--saved-variable-prefix``/``--new-variable-prefix``,
    ``base_model.py:16-18``) so pretrain encoders load into end-task states;
  - deliberate improvements (SURVEY §5.4): optimizer state AND the negative
    queue are checkpointed (the reference refills the queue on every resume).
"""

import os
from typing import Any, Optional, Sequence

import jax
import orbax.checkpoint as ocp

def _rename_tree(tree: Any, saved_prefixes: Sequence[str], new_prefixes: Sequence[str]):
    """Strip any of ``saved_prefixes`` from top-level key paths and prepend the
    matching ``new_prefixes`` entry (reference prefix-remap semantics)."""
    if not any(saved_prefixes) and not any(new_prefixes):
        return tree
    if not isinstance(tree, dict):
        return tree
    out = {}
    for key, val in tree.items():
        new_key = key
        for sp, np_ in zip(saved_prefixes, new_prefixes):
            if sp and key.startswith(sp):
                new_key = (np_ or "") + key[len(sp) :]
                break
        out[new_key] = val
    return out

class CheckpointManager:
    """Rolling + long-save checkpoints for arbitrary state pytrees."""

    def __init__(
        self,
        checkpoint_dir: str,
        long_save_checkpoint_dir: Optional[str] = None,
        max_to_keep: int = 5,
        long_save_frequency: int = 25,
    ):
        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        self.long_dir = (
            os.path.abspath(long_save_checkpoint_dir) if long_save_checkpoint_dir else None
        )
        self.long_save_frequency = long_save_frequency
        self._save_count = 0
        self.manager = ocp.CheckpointManager(
            self.checkpoint_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self.long_manager = (
            ocp.CheckpointManager(
                self.long_dir,
                options=ocp.CheckpointManagerOptions(max_to_keep=None, create=True),
            )
            if self.long_dir
            else None
        )

    def save(self, step: int, state: Any, force_long: bool = False):
        """Rolling save; every ``long_save_frequency``-th call also writes a
        permanent copy (reference base_model.py:21-26 'long save').

        The write is async: solvers pass host-side numpy (``jax.device_get``
        copies, no aliasing with donated device buffers), so orbax's
        background serialization+disk write overlaps the next train steps.
        We drain any still-in-flight previous write first; ``close()`` (and
        orbax's ``manager.close()``) waits for the final one."""
        self.manager.wait_until_finished()
        if self.long_manager:
            self.long_manager.wait_until_finished()
        self.manager.save(int(step), args=ocp.args.StandardSave(state))
        self._save_count += 1
        if self.long_manager and (
            force_long or self._save_count % self.long_save_frequency == 0
        ):
            self.long_manager.save(int(step), args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore_raw(self, step: Optional[int] = None):
        """Restore as a plain nested dict without an abstract-state template
        (structure-agnostic consumers: export tools, inspection)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        return self.manager.restore(step)

    def restore(
        self,
        abstract_state: Any,
        step: Optional[int] = None,
        saved_variable_prefix: Sequence[str] = ("",),
        new_variable_prefix: Sequence[str] = ("",),
    ):
        """Restore ``step`` (default latest); returns None if no checkpoint.

        ``abstract_state`` may be a concrete state (its shapes/shardings are
        used). Prefix remapping applies to the top level of ``params``-like
        dict subtrees when requested.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        remap = any(saved_variable_prefix) or any(new_variable_prefix)
        if not remap:
            return self.manager.restore(step, args=ocp.args.StandardRestore(abstract_state))
        raw = self.manager.restore(step)
        raw = jax.tree_util.tree_map(
            lambda x: x, raw
        )  # plain nested dict
        if isinstance(raw, dict):
            for key in ("params", "key_params", "batch_stats", "key_batch_stats"):
                if key in raw and isinstance(raw[key], dict):
                    raw[key] = _rename_tree(raw[key], saved_variable_prefix, new_variable_prefix)
        return raw

    def close(self):
        self.manager.close()
        if self.long_manager:
            self.long_manager.close()
