"""Config (de)serialization: rebuild typed configs from config.json
snapshots. The inverse of runner.checkpoint.save_config_snapshot — what the
inference/eval/serving stacks use to reconstruct the exact trained model
(the reference bakes this into the frozen graph instead)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.train.gan_trainer import GanTrainerConfig
from twingan_tpu.train.losses import GanLossConfig
from twingan_tpu.train.optimizers import OptimizerConfig
from twingan_tpu.train.twingan_trainer import TwinGANConfig


def _build(cls, data: dict) -> Any:
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in data.items():
        if k not in fields:
            continue
        if k == "model":
            v = _build(PGGANConfig, v)
        elif k == "loss":
            v = _build(GanLossConfig, v)
        elif k == "opt":
            v = _build(OptimizerConfig, v)
        kwargs[k] = v
    return cls(**kwargs)


def trainer_config_from_dict(data: dict) -> TwinGANConfig | GanTrainerConfig:
    cls = TwinGANConfig if "l_cyc_weight" in data else GanTrainerConfig
    return _build(cls, data)


def load_stage_config(stage_dir: str):
    """Reads a stage dir's config.json -> (run_dict, trainer_config)."""
    with open(os.path.join(stage_dir, "config.json")) as f:
        data = json.load(f)
    trainer = trainer_config_from_dict(data["trainer"])
    return data.get("run", {}), trainer


def find_latest_stage_dir(train_dir: str) -> str:
    """Picks the most advanced stage dir (largest resolution, stable over
    growing), mirroring the runner's fallback-to-prior-checkpoint logic
    (reference pggan_runner.py:125-133)."""
    from twingan_tpu.runner.checkpoint import CheckpointManager

    candidates = []
    for name in os.listdir(train_dir):
        full = os.path.join(train_dir, name)
        if not os.path.isdir(full) or CheckpointManager(full).latest_step() is None:
            continue
        if name.isdigit():
            candidates.append((int(name), 1, full))
        elif "to" in name:
            try:
                res = int(name.split("to")[1])
            except ValueError:
                continue
            candidates.append((res, 0, full))
    if not candidates:
        raise FileNotFoundError(f"no stage checkpoints under {train_dir}")
    return sorted(candidates)[-1][2]
