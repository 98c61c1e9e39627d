"""Structural parity goldens against SURVEY.md facts about the reference.

These tests pin the *numbers* the reference's architecture implies
(channel schedules per stage, layer counts, noise dims) so a refactor that
silently changes the network shape fails loudly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.models.pggan import Discriminator, Encoder, Generator, noise_shape


class TestChannelScheduleGoldens:
    def test_generator_256px_channel_flow(self):
        """SURVEY.md section 3.5: stages 0..6 at max 256 give channels
        256,256,256,128,64,32,16; noise dim = channels(stage 1) = 256."""
        cfg = PGGANConfig(resolution=256, max_channels=256)
        assert noise_shape(cfg, 1) == (1, 1, 1, 256)
        gen = Generator(cfg)
        variables = jax.eval_shape(
            lambda: gen.init(jax.random.PRNGKey(0), jnp.zeros(noise_shape(cfg, 1)))
        )
        params = variables["params"]
        expected = {4: 256, 8: 256, 16: 256, 32: 128, 64: 64, 128: 32, 256: 16}
        for hw, ch in expected.items():
            kernel = params[f"block_{hw}_conv1"]["conv"]["kernel"]
            assert kernel.shape[-1] == ch, (hw, kernel.shape)
        # to_rgb exists only at the output resolution in a stable stage.
        assert "to_rgb_256" in params and "to_rgb_128" not in params

    def test_growing_adds_prev_to_rgb(self):
        cfg = PGGANConfig(resolution=256, max_channels=256, is_growing=True)
        gen = Generator(cfg)
        variables = jax.eval_shape(
            lambda: gen.init(jax.random.PRNGKey(0), jnp.zeros(noise_shape(cfg, 1)), alpha=0.5)
        )
        assert "to_rgb_128" in variables["params"]

    def test_discriminator_mirror_and_heads(self):
        cfg = PGGANConfig(resolution=64, max_channels=256)
        dis = Discriminator(cfg)
        variables = jax.eval_shape(
            lambda: dis.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        )
        params = variables["params"]
        # minibatch-stddev adds one input channel to the first before_fc conv.
        k = params["before_fc_conv0"]["conv"]["kernel"]
        assert k.shape[2] == 256 + 1
        # k4 VALID second conv and FC(1) head.
        assert params["before_fc_conv1"]["conv"]["kernel"].shape[:2] == (4, 4)
        assert params["prediction"]["kernel"].shape[1] == 1

    def test_encoder_always_reaches_4x4_with_max_channels(self):
        for res in (8, 32, 128):
            cfg = PGGANConfig(resolution=res, max_channels=256)
            enc = Encoder(cfg)
            out = jax.eval_shape(
                lambda cfg=cfg, enc=enc: enc.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3))
                )
            )
            # Presence check via apply shape:
            code, _ = jax.eval_shape(
                lambda v, cfg=cfg, enc=enc: enc.apply(v, jnp.zeros((1, res, res, 3))),
                out,
            )
            assert code.shape == (1, 4, 4, 256), res

    def test_twingan_batch_schedule_steps(self):
        """SURVEY section 6: 300k images per stage at the recommended batch
        sizes gives the per-stage step counts the reference trains for."""
        from twingan_tpu.runner.stage_runner import (
            RunConfig,
            StageRunner,
            TWINGAN_BATCH_SCHEDULE,
        )

        runner = StageRunner(RunConfig(program="twingan", num_devices=1))
        assert runner.steps_for_stage(4) == 300000 // 8
        assert runner.steps_for_stage(256) == 300000 // 3
        assert TWINGAN_BATCH_SCHEDULE == {4: 8, 8: 8, 16: 8, 32: 8, 64: 8, 128: 4, 256: 3, 512: 2}


def test_min_channels_floor():
    cfg = PGGANConfig(resolution=256, max_channels=256, min_channels=64)
    assert cfg.channels(6) == 64  # floored (was 16)
    assert cfg.channels(0) == 256  # unchanged
    assert PGGANConfig(resolution=256, max_channels=256).channels(6) == 16
