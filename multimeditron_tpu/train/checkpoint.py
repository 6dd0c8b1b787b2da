"""Orbax checkpointing: save/restore {params, opt_state, step}.

Replaces the reference's HF-Trainer + DeepSpeed checkpoint path
(``save_strategy: steps``/``save_steps`` in ``config_alignment.yaml:47-48``,
ZeRO-3 16-bit gather ``deepspeed.json:19``): Orbax writes each shard from
its owning host, no gather needed, and restore re-shards to the live mesh.
HF-format export/import for interop lives in ``models/hf_export.py``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, params: Dict[str, Any], opt_state: Any = None) -> None:
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self,
        step: Optional[int] = None,
        templates: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        """Restore a checkpoint. ``templates`` (abstract arrays or live
        pytrees with shardings) re-shard the restore onto the current mesh."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {self.directory}")
        if templates is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, templates)
            return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return self._mgr.restore(step)

    def close(self):
        self._mgr.close()
