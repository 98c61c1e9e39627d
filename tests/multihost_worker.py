"""Subprocess worker for tests/test_multihost.py — NOT a pytest module.

One process of an N-process multi-host run (gloo collectives over localhost
standing in for DCN, 2 virtual CPU devices per process). Runs one TwinGAN
data-parallel training round over the GLOBAL mesh through the production
helpers (initialize_from_env / create_mesh / replicate / shard_batch) and
prints the metrics as JSON for the parent to compare against the
single-process run. Mirrors the reference's PS/worker multi-replica intent
(/root/reference/model/model_inheritor.py:82-107) in SPMD form.

Usage: multihost_worker.py <process_id> <num_processes> <port> [train_dir] [mode]

mode "round" (default): one jitted TwinGAN round + a single-stage runner.
mode "plan": a multi-stage progressive plan (4 -> 8_growing -> 8) through
the production StageRunner — used by the mid-stage kill+resume test, the
failure mode a real pod run hits (reference recovery semantics,
pggan_runner.py:112-146: tf.Supervisor restores the latest checkpoint and
continues the schedule).
(JAX_* env vars are NOT used so the harness env can't interfere.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def build_round(global_batch: int, n_critic: int):
    """Deterministic config + batches shared by worker and parent."""
    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig
    from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer

    cfg = TwinGANConfig(
        model=PGGANConfig(
            resolution=8, max_channels=8, norm_type="instance_norm",
            num_domains=2,
        ),
        loss=GanLossConfig(architecture="gan"),
        opt=OptimizerConfig(learning_rate=1e-3),
        batch_size=global_batch,
        use_unet=True,
        max_steps=10,
    )
    trainer = TwinGANTrainer(cfg)
    batches = [
        {
            "source": np.random.RandomState(2 * i)
            .rand(global_batch, 8, 8, 3).astype(np.float32),
            "target": np.random.RandomState(2 * i + 1)
            .rand(global_batch, 8, 8, 3).astype(np.float32),
        }
        for i in range(n_critic)
    ]
    return trainer, batches


def run_plan(train_dir):
    """Multi-stage progressive plan over the global mesh (kill+resume test).

    Cadence is tuned so the parent can kill both processes strictly inside
    the 8_growing stage: save every 2 steps, one round per scan + per-step
    logging (host syncs) so stepping is slow relative to the parent's poll.
    """
    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.runner.stage_runner import RunConfig, StageRunner
    from twingan_tpu.train.optimizers import OptimizerConfig
    from twingan_tpu.train.twingan_trainer import TwinGANConfig

    run_cfg = RunConfig(
        program="twingan",
        train_dir=train_dir,
        start_hw=4, max_hw=8,
        # per-device batch 2 x 4 global devices = global batch 8 -> 40 steps
        # per stage.
        num_images_per_resolution=320,
        batch_schedule={4: 2, 8: 2},
        use_synthetic_data=True,
        trainer=TwinGANConfig(
            model=PGGANConfig(resolution=4, max_channels=8, num_domains=2),
            opt=OptimizerConfig(learning_rate=1e-3),
        ),
        log_every_n_steps=1, save_every_n_steps=2,
        log_image_every_n_iter=0,
        rounds_per_scan=1,
        num_devices=jax.device_count(),
    )
    summary = StageRunner(run_cfg).run()
    print("RUNNER " + json.dumps(summary), flush=True)


def main():
    # Config mutations live HERE, not at module import time: the parent
    # test imports build_round from this module, and flipping the cpu
    # collectives implementation inside the already-initialized test
    # process must not happen as an import side effect.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    from twingan_tpu.parallel import initialize_from_env

    assert initialize_from_env(
        coordinator_address=f"127.0.0.1:{port}", num_processes=n_proc,
        process_id=pid,
    )
    from twingan_tpu.parallel import create_mesh, replicate, shard_batch

    mesh = create_mesh()  # all GLOBAL devices
    assert len(mesh.devices.ravel()) == n_proc * jax.local_device_count()
    if len(sys.argv) > 5 and sys.argv[5] == "plan":
        run_plan(sys.argv[4])
        return
    trainer, batches = build_round(
        global_batch=2 * n_proc * jax.local_device_count(), n_critic=2
    )
    state = replicate(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    sharded = [shard_batch(b, mesh) for b in batches]
    state, metrics = trainer.round_step(state, sharded, jax.random.PRNGKey(1))
    out = {k: float(v) for k, v in metrics.items()}
    out["step"] = int(state.step)
    print("METRICS " + json.dumps(out), flush=True)

    # Production path: a synthetic-data StageRunner stage over the SAME
    # global mesh (num_devices = all 4 global devices; only process 0
    # writes checkpoints/summaries).
    import tempfile

    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.runner.stage_runner import RunConfig, StageRunner
    from twingan_tpu.train.optimizers import OptimizerConfig
    from twingan_tpu.train.twingan_trainer import TwinGANConfig

    train_dir = sys.argv[4] if len(sys.argv) > 4 else tempfile.mkdtemp()
    run_cfg = RunConfig(
        program="twingan",
        train_dir=train_dir,
        start_hw=4, max_hw=4,
        num_images_per_resolution=2 * 4 * jax.device_count() * 3,
        batch_schedule={4: 2 * 4},  # per-device
        use_synthetic_data=True,
        trainer=TwinGANConfig(
            model=PGGANConfig(resolution=4, max_channels=8, num_domains=2),
            opt=OptimizerConfig(learning_rate=1e-3),
        ),
        log_every_n_steps=1, save_every_n_steps=100,
        log_image_every_n_iter=0,
        num_devices=jax.device_count(),
    )
    summary = StageRunner(run_cfg).run()
    print("RUNNER " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
