"""Checkpoint/resume via Orbax — the TPU-native replacement for the
reference's three mechanisms (SURVEY.md §5): stage-1 whole state dicts
per epoch (`latent_wm_pretrain.py:246-249`), accelerate save_state with
total-limit pruning (`ppft_train.py:699-748,1079-1103`), and cross-stage
artifact handoff.  Public artifacts (LoRA safetensors, mapper) are written
through core/io.py in the reference's key layouts.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper: save(step, pytree) / restore latest or specific step."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                            create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=opts)

    def save(self, step: int, tree: Any, force: bool = False) -> None:
        """Async save: orbax copies device->host synchronously inside
        save() (so the caller may immediately donate/overwrite the
        arrays in the next train step) and writes to disk in the
        background — checkpoint I/O overlaps training instead of
        stalling it.  Blocks only if the PREVIOUS save is still
        writing (accelerate's save_state, by contrast, is fully
        synchronous — ppft_train.py:1079-1103)."""
        self._mgr.wait_until_finished()
        self._mgr.save(step, args=ocp.args.StandardSave(tree), force=force)

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        self._mgr.wait_until_finished()
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_pytree(path: str, tree: Any) -> None:
    """One-shot pytree save (stage artifact handoff)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_pytree(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), template)
    ckptr.close()
    return out
