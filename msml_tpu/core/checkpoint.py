"""Orbax checkpointing of the full train state.

Improves on the reference's crash-unsafe per-epoch `backbone.pth`
(`utils/utils_callbacks.py:100-116`, `train.py:121-128`): we persist params,
batch stats, optimizer momentum, the PartialFC shard (the reference's
`rank:{r}_softmax_weight.pt`, `headers/partial_fc.py:38-59`), the step counter
and epoch — so resume is exact, not whole-epoch-granular. The weight folder
keeps the reference's self-describing contract: `config.yaml` is copied next
to the checkpoints (`train.py:71-72`) and evaluation loads it from there
(`eval/qeval_mxnet.py:515-517`).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(output_dir: str, max_to_keep: int = 3,
             async_save: bool = False) -> ocp.CheckpointManager:
    path = os.path.abspath(os.path.join(output_dir, "ckpt"))
    return ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True,
            enable_async_checkpointing=async_save))


class CheckpointWriter:
    """Long-lived checkpoint manager for the train loop.

    Two improvements over calling `save_checkpoint` per save:
      * one manager for the whole run (no per-save directory rescan);
      * optional ASYNC saves (orbax AsyncCheckpointer, the TPU-pod
        standard): the device->host snapshot happens inline, serialization
        and fsync run in a background thread so training overlaps the
        write. `close()` (and every next `save`) waits for the previous
        write, so at most one save is in flight and the final checkpoint
        is always durable before exit.
    """

    def __init__(self, output_dir: str, max_to_keep: int = 3,
                 async_save: bool = True):
        self._mngr = _manager(output_dir, max_to_keep, async_save=async_save)

    def save(self, state: Any, step: int) -> bool:
        """Returns True if a save was started (False: step already saved)."""
        if step in self._mngr.all_steps():
            return False
        self._mngr.save(step, args=ocp.args.StandardSave({"state": state}))
        return True

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()


def save_checkpoint(output_dir: str, state: Any, step: int) -> None:
    """The payload is exactly {'state': state} so it structurally matches the
    restore template; derive epoch etc. from state.step.

    Saving the same step twice is a no-op rather than an orbax
    StepAlreadyExistsError — a periodic `--ckpt-every` save can land on
    the same step as the epoch-end (or --steps early-exit) save."""
    mngr = _manager(output_dir)
    if step in mngr.all_steps():
        mngr.close()
        return
    mngr.save(step, args=ocp.args.StandardSave({"state": state}))
    mngr.wait_until_finished()
    mngr.close()


def latest_step(output_dir: str) -> Optional[int]:
    path = os.path.abspath(os.path.join(output_dir, "ckpt"))
    if not os.path.isdir(path):
        return None
    mngr = ocp.CheckpointManager(path)
    step = mngr.latest_step()
    mngr.close()
    return step


def restore_checkpoint(output_dir: str, state_template: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the (possibly sharded) template's structure/shardings."""
    mngr = _manager(output_dir)
    if step is None:
        step = mngr.latest_step()
    if step is None:
        mngr.close()
        return None
    restored = mngr.restore(
        step, args=ocp.args.StandardRestore({"state": state_template}))
    mngr.close()
    return restored["state"]
