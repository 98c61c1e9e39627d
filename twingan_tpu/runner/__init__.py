"""Stage orchestration: progressive-growth runner, checkpointing, migration.

Reference parity map:
- checkpoint.py  <- TF1 Saver + slim warm-start (model_inheritor.py:576-644),
                    flags.txt snapshot (:307,1029)
- migrate.py     <- cross-stage restore with shape growth via
                    ignore_missing_vars (pggan_runner.py:136-146)
- stage_runner.py <- pggan_runner.py stage loop, batch-size schedules,
                    skip-if-complete, per-stage train dirs
"""

from twingan_tpu.runner.checkpoint import CheckpointManager, save_config_snapshot
from twingan_tpu.runner.migrate import migrate_state_dict
from twingan_tpu.runner.stage_runner import StageRunner, RunConfig, stage_plan
