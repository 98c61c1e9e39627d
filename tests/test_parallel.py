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


class TestContextParallelAttention:
    """attention_context_parallel wires ops.sharded_attention_core into
    SelfAttention via the current-mesh registry (VERDICT round-2 item 7):
    the context-parallel variant must be reachable from a config and match
    the local einsum path exactly."""

    def _generator(self, cp: bool):
        from twingan_tpu.models.pggan import Generator

        cfg = PGGANConfig(
            resolution=16, max_channels=16, norm_type="instance_norm",
            do_self_attention=True, self_attention_hw=8,
            attention_context_parallel=cp,
        )
        return Generator(cfg)

    def test_matches_local_path(self):
        from twingan_tpu.parallel import current_mesh, set_current_mesh

        mesh = create_mesh()
        code = jnp.asarray(
            np.random.RandomState(0).rand(8, 4, 4, 16).astype(np.float32))
        local_gen = self._generator(cp=False)
        variables = local_gen.init(jax.random.PRNGKey(0), code)
        ref, _ = local_gen.apply(variables, code)

        prev = current_mesh()
        set_current_mesh(mesh)
        try:
            cp_gen = self._generator(cp=True)
            out, _ = cp_gen.apply(variables, code)
        finally:
            set_current_mesh(prev)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_gradients_match_local_path(self):
        from twingan_tpu.parallel import current_mesh, set_current_mesh

        mesh = create_mesh()
        code = jnp.asarray(
            np.random.RandomState(1).rand(8, 4, 4, 16).astype(np.float32))
        local_gen = self._generator(cp=False)
        variables = local_gen.init(jax.random.PRNGKey(0), code)

        def loss(params, gen):
            img, _ = gen.apply({"params": params}, code)
            return jnp.sum(img.astype(jnp.float32) ** 2)

        g_ref = jax.grad(loss)(variables["params"], local_gen)
        prev = current_mesh()
        set_current_mesh(mesh)
        try:
            g_cp = jax.grad(loss)(variables["params"], self._generator(cp=True))
        finally:
            set_current_mesh(prev)
        # fp32 reassociation in the all_gather transpose (verified: exact in
        # higher-precision accumulation) shows up as ~3e-4 of the GLOBAL
        # gradient scale; per-leaf relative comparison misleads on leaves
        # whose sums cancel to near zero (norm betas).
        ref_leaves = jax.tree_util.tree_flatten_with_path(g_ref)[0]
        cp_leaves = jax.tree_util.tree_flatten_with_path(g_cp)[0]
        gscale = max(float(np.max(np.abs(l))) for _, l in ref_leaves)
        for (ku, lu), (kf, lf) in zip(ref_leaves, cp_leaves):
            np.testing.assert_allclose(
                np.asarray(lu), np.asarray(lf), rtol=1e-2, atol=2e-3 * gscale,
                err_msg=jax.tree_util.keystr(ku))

    def test_size1_mesh_degenerates_to_local(self):
        # Single-chip production entry (the 512 stretch run enables the cp
        # flag on one real chip): a REGISTERED mesh of size 1 must take the
        # local path and match it exactly (VERDICT r3 item 8).
        from twingan_tpu.parallel import current_mesh, set_current_mesh

        mesh = create_mesh(jax.devices()[:1])
        code = jnp.asarray(
            np.random.RandomState(3).rand(4, 4, 4, 16).astype(np.float32))
        gen_local = self._generator(cp=False)
        variables = gen_local.init(jax.random.PRNGKey(0), code)
        ref, _ = gen_local.apply(variables, code)
        prev = current_mesh()
        set_current_mesh(mesh)
        try:
            out, _ = self._generator(cp=True).apply(variables, code)
        finally:
            set_current_mesh(prev)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_no_mesh_falls_back_to_local(self):
        # cp flag with no registered mesh: local path, no error.
        code = jnp.asarray(
            np.random.RandomState(2).rand(2, 4, 4, 16).astype(np.float32))
        gen = self._generator(cp=True)
        variables = gen.init(jax.random.PRNGKey(0), code)
        out, _ = gen.apply(variables, code)
        assert np.isfinite(np.asarray(out)).all()

    def test_jitted_train_step_with_cp(self):
        """The cp path must compose with the jitted sharded train step (the
        512px stretch-config usage: StageRunner sets the mesh, batches are
        data-sharded, shard_map reshards N inside)."""
        from twingan_tpu.parallel import set_current_mesh, current_mesh
        from twingan_tpu.train.losses import GanLossConfig

        mesh = create_mesh()
        prev = current_mesh()
        set_current_mesh(mesh)
        try:
            cfg = GanTrainerConfig(
                model=PGGANConfig(
                    resolution=16, max_channels=16, norm_type="instance_norm",
                    do_self_attention=True, self_attention_hw=8,
                    attention_context_parallel=True,
                ),
                batch_size=8,
                opt=OptimizerConfig(learning_rate=1e-3),
                loss=GanLossConfig(architecture="hinge"),
            )
            trainer = GanTrainer(cfg)
            state = replicate(trainer.init_state(jax.random.PRNGKey(0)), mesh)
            batch = shard_batch(
                {"target": np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32)},
                mesh,
            )
            state, metrics = trainer.g_step(state, batch, jax.random.PRNGKey(1))
            assert np.isfinite(float(metrics["generator_loss"]))
        finally:
            set_current_mesh(prev)
