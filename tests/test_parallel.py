"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md section 4b)."""

import numpy as np

import jax
import jax.numpy as jnp

from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.parallel import create_mesh, replicate, shard_batch
from twingan_tpu.train.gan_trainer import GanTrainer, GanTrainerConfig
from twingan_tpu.train.optimizers import OptimizerConfig


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_data_parallel_round_step():
    mesh = create_mesh()
    cfg = GanTrainerConfig(
        model=PGGANConfig(resolution=8, max_channels=16),
        batch_size=16,
        opt=OptimizerConfig(learning_rate=1e-3),
    )
    trainer = GanTrainer(cfg)
    state = replicate(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    batch = shard_batch(
        {"target": np.random.RandomState(0).rand(16, 8, 8, 3).astype(np.float32)}, mesh
    )
    batch2 = shard_batch(
        {"target": np.random.RandomState(1).rand(16, 8, 8, 3).astype(np.float32)}, mesh
    )
    state, metrics = trainer.round_step(state, [batch, batch2], jax.random.PRNGKey(1))
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # Params stay replicated after the update (single copy semantics).
    leaf = jax.tree_util.tree_leaves(state.params["generator"])[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_equals_single_device():
    """The SPMD step must compute the same update as one device (global-view
    semantics make DP a pure implementation detail)."""
    cfg = GanTrainerConfig(
        model=PGGANConfig(resolution=8, max_channels=16, norm_type="instance_norm"),
        batch_size=8,
        opt=OptimizerConfig(learning_rate=1e-3),
        loss=__import__("twingan_tpu.train.losses", fromlist=["GanLossConfig"]).GanLossConfig(
            architecture="hinge"
        ),
    )
    trainer = GanTrainer(cfg)
    batch_np = {"target": np.random.RandomState(0).rand(8, 8, 8, 3).astype(np.float32)}

    state1 = trainer.init_state(jax.random.PRNGKey(0))
    s1, m1 = trainer.g_step(state1, {"target": jnp.asarray(batch_np["target"])}, jax.random.PRNGKey(1))

    mesh = create_mesh()
    state8 = replicate(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    s8, m8 = trainer.g_step(state8, shard_batch(batch_np, mesh), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["generator_loss"]), float(m8["generator_loss"]), rtol=1e-4)
    a = jax.tree_util.tree_leaves(s1.params["generator"])
    b = jax.tree_util.tree_leaves(s8.params["generator"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


class TestMultiHost:
    def test_single_process_noop(self, monkeypatch):
        from twingan_tpu.parallel import initialize_from_env, local_batch_slice

        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        assert initialize_from_env() is False
        assert local_batch_slice(32) == slice(0, 32)

    def test_env_parsing_requests_init(self, monkeypatch):
        """With a coordinator configured the helper must attempt distributed
        init (intercepted — no real cluster here)."""
        import jax
        from twingan_tpu.parallel import initialize_from_env

        calls = {}
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: calls.update(kw),
        )
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        assert initialize_from_env() is True
        assert calls == {
            "coordinator_address": "10.0.0.1:1234",
            "num_processes": 4,
            "process_id": 2,
        }
