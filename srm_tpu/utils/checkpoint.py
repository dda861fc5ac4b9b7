"""Checkpoint / resume via Orbax.

The reference has **no** durable checkpointing (SURVEY §5.4): best weights
live in RAM (training.py:441-445, 833-866) and only a history pickle is
written. This module is the new first-class capability: async Orbax
checkpoints of the full training state (params + optimizer states + step +
history), with resume and best-k retention.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax

log = logging.getLogger(__name__)


class CheckpointManager:
    """Thin wrapper over orbax.checkpoint for the SRM training state."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_epochs: int = 1):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               save_interval_steps=save_interval_epochs)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, params: Dict[str, Any], opt_state: Dict[str, Any],
             history: Optional[Dict] = None, force: bool = False) -> bool:
        state = {"params": params, "opt_state": opt_state}
        args = self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(state),
            **({"history": self._ocp.args.JsonSave(_jsonable_history(history))}
               if history is not None else {}),
        )
        saved = self.manager.save(step, args=args, force=force)
        if saved:
            log.info("Saved checkpoint at step %d to %s", step, self.directory)
        return saved

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None):
        """Restore (params, opt_state, history, step); step=None → latest."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        kwargs = {}
        if template is not None:
            kwargs["state"] = self._ocp.args.StandardRestore(template)
        else:
            kwargs["state"] = self._ocp.args.StandardRestore()
        restored = self.manager.restore(step, args=self._ocp.args.Composite(**kwargs))
        state = restored["state"]
        history = restored.get("history") if hasattr(restored, "get") else None
        return state["params"], state["opt_state"], history, step

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait_until_finished(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.close()


def _jsonable_history(history: Dict) -> Dict:
    def conv(v):
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [conv(x) for x in v]
        try:
            return float(v)
        except (TypeError, ValueError):
            return v
    return conv(history)
