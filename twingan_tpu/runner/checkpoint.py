"""Checkpoint save/restore (Orbax) + config snapshots.

Replaces the reference's TF1 Saver periodic checkpoints
(slim.learning.train save_interval_secs, model_inheritor.py:74-76,1125) and
the flags.txt reproducibility snapshot (:307,1029-1030). States are stored as
pure nested dicts (flax.serialization.to_state_dict) so cross-stage
migration can operate on path/shape intersections without caring about the
dataclass shell.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Optional

import jax
import flax.serialization
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^ckpt-(\d+)$")


class CheckpointManager:
    """Step-keyed pytree checkpoints under one train dir."""

    def __init__(self, train_dir: str):
        self.train_dir = os.path.abspath(train_dir)
        os.makedirs(self.train_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.train_dir, f"ckpt-{step}")

    def all_steps(self) -> list[int]:
        steps = []
        if not os.path.isdir(self.train_dir):
            return steps
        for name in os.listdir(self.train_dir):
            m = _STEP_RE.match(name)
            if m and os.path.isdir(os.path.join(self.train_dir, name)):
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, state: Any, keep: int = 3) -> str:
        """Save `state` (any pytree / flax struct) at `step`; prunes old
        checkpoints beyond `keep`."""
        path = self._path(step)
        state_dict = flax.serialization.to_state_dict(state)
        state_dict = jax.device_get(state_dict)
        self._ckptr.save(path, state_dict, force=True)
        # Multi-host: orbax's save coordinates across processes itself
        # (primary-host writes + internal barrier); pruning is host-side
        # filesystem work that only one process should do. keep<=0 keeps
        # everything. The just-written step is never pruned even when it
        # sorts below existing checkpoints (re-running a stage with a
        # lower max_steps into an existing dir).
        if jax.process_index() == 0 and keep > 0:
            prunable = [s for s in self.all_steps() if s != step]
            for old in prunable[: -(keep - 1)] if keep > 1 else prunable:
                import shutil

                shutil.rmtree(self._path(old), ignore_errors=True)
        return path

    def restore_dict(self, step: Optional[int] = None) -> Optional[dict]:
        """Raw nested state dict, or None if no checkpoint exists."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        return self._ckptr.restore(self._path(step))

    def restore(self, template_state: Any, step: Optional[int] = None) -> Optional[Any]:
        """Restore into a freshly-initialized template (same-stage resume).

        Tolerant of schema evolution: leaves are matched by path+shape
        (missing new fields keep their template init; vanished old fields are
        dropped), so adding optional state fields never orphans checkpoints.
        """
        raw = self.restore_dict(step)
        if raw is None:
            return None
        from twingan_tpu.runner.migrate import migrate_state_dict

        template = flax.serialization.to_state_dict(template_state)
        merged, report = migrate_state_dict(template, raw, reset_paths=())
        # A same-stage resume that carries nothing is a config/checkpoint
        # mismatch, not a resume — silently returning fresh params (while
        # the step counter still carries) would train garbage labeled
        # 'resumed' and prune the good checkpoints.
        has_params = any(k == "params" for k in template)
        carried_params = [p for p in report.get("carried", ())
                          if p.startswith("params")]
        if has_params and not carried_params:
            raise ValueError(
                f"checkpoint in {self.train_dir} matches no parameter of the "
                "current model (config changed between runs?); refusing a "
                f"silent fresh start. Report: { {k: len(v) for k, v in report.items()} }")
        if report.get("shape_mismatch"):
            print(f"[checkpoint] WARNING: {len(report['shape_mismatch'])} "
                  f"leaves shape-mismatched on restore and keep fresh init: "
                  f"{report['shape_mismatch'][:5]}...")
        return flax.serialization.from_state_dict(template_state, merged)


def save_config_snapshot(train_dir: str, config: Any, name: str = "config.json") -> str:
    """flags.txt-equivalent: dump the full nested config as JSON."""

    def to_jsonable(obj):
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            return {f.name: to_jsonable(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
        if isinstance(obj, (list, tuple)):
            return [to_jsonable(x) for x in obj]
        if isinstance(obj, dict):
            return {str(k): to_jsonable(v) for k, v in obj.items()}
        return obj

    os.makedirs(train_dir, exist_ok=True)
    path = os.path.join(train_dir, name)
    with open(path, "w") as f:
        json.dump(to_jsonable(config), f, indent=2, default=str)
    return path
