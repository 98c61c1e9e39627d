"""Gradient-checkpointing (remat) parity tests.

TwinGANConfig.remat / GanTrainerConfig.remat wrap every per-pass module
apply in jax.checkpoint (train/state.py apply_model). Rematerialization is
semantics-preserving — one training round with remat on must produce the
same losses and parameters as with it off; only peak memory changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.train.gan_trainer import GanTrainer, GanTrainerConfig
from twingan_tpu.train.losses import GanLossConfig
from twingan_tpu.train.optimizers import OptimizerConfig
from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer


def _tree_close(a, b, atol):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


@pytest.mark.parametrize("growing", [False, True])
def test_twingan_round_step_remat_parity(growing):
    base = dict(
        model=PGGANConfig(
            resolution=8, is_growing=growing, max_channels=16,
            norm_type="instance_norm", equalized_lr=True, do_pixel_norm=True,
            num_domains=2,
        ),
        loss=GanLossConfig(architecture="dragan"),
        opt=OptimizerConfig(learning_rate=1e-3),
        batch_size=4,
        use_unet=True,
        l_cyc_weight=5.0,
        max_steps=100,
    )
    rng = np.random.RandomState(0)
    batches = [
        {
            "source": jnp.asarray(rng.rand(4, 8, 8, 3), jnp.float32),
            "target": jnp.asarray(rng.rand(4, 8, 8, 3), jnp.float32),
        }
        for _ in range(2)
    ]
    results = {}
    for remat in (False, True):
        trainer = TwinGANTrainer(TwinGANConfig(remat=remat, **base))
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, metrics = trainer.round_step(state, batches, jax.random.PRNGKey(1))
        results[remat] = (state, metrics)
    m0, m1 = results[False][1], results[True][1]
    for k in m0:
        np.testing.assert_allclose(
            float(m0[k]), float(m1[k]), atol=1e-4, err_msg=k
        )
    _tree_close(results[False][0].params, results[True][0].params, atol=1e-5)


def test_gan_trainer_remat_parity():
    base = dict(
        model=PGGANConfig(
            resolution=8, max_channels=16, norm_type="batch_norm",
            equalized_lr=True, do_pixel_norm=True,
        ),
        loss=GanLossConfig(architecture="wgan_gp"),
        opt=OptimizerConfig(learning_rate=1e-3),
        batch_size=4,
        max_steps=100,
    )
    rng = np.random.RandomState(1)
    batches = [
        {"target": jnp.asarray(rng.rand(4, 8, 8, 3), jnp.float32)}
        for _ in range(2)
    ]
    results = {}
    for remat in (False, True):
        trainer = GanTrainer(GanTrainerConfig(remat=remat, **base))
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, metrics = trainer.round_step(state, batches, jax.random.PRNGKey(1))
        results[remat] = (state, metrics)
    m0, m1 = results[False][1], results[True][1]
    for k in m0:
        np.testing.assert_allclose(
            float(m0[k]), float(m1[k]), atol=1e-4, err_msg=k
        )
    _tree_close(results[False][0].params, results[True][0].params, atol=1e-5)
