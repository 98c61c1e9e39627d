"""Compile-time scaling analysis for the data-parallel training step.

The repo's multi-chip claim (bench.py's `vs_baseline` divides the 8-chip
north-star by 8) is necessarily extrapolated — this host has one real chip.
This tool makes the extrapolation checkable instead of asserted: it compiles
the PRODUCTION TwinGAN round step (the same `replicate` + `shard_batch` +
`round_step` path the runner and `dryrun_multichip` use) on virtual CPU
meshes of size 1/2/4/8 and extracts, from XLA's own compiled artifacts:

- per-device FLOPs per round (cost analysis of the SPMD module) — under
  weak scaling (fixed per-device batch) this must stay ~constant as the
  mesh grows, i.e. GSPMD really partitions the batch instead of
  replicating work;
- cross-device all-reduce traffic per round (summed operand bytes of the
  `all-reduce` ops in the optimized HLO) — this must be ~the gradient
  size per optimizer update, independent of mesh size;
- a predicted communication time on v5e ICI from the ring all-reduce cost
  model (2·bytes/axis-bandwidth, "How to Scale Your Model" recipe), set
  against the measured single-chip step time, giving a principled upper
  bound on the scaling loss rather than a guess.

Reference counterpart: the TF1 deployment layer replicated the graph per
GPU and summed gradients on a parameter server
(/root/reference/deployment/model_deploy.py:186-239); its scaling story was
equally unmeasured (no multi-GPU benchmark is published). Here the claim is
reduced to (a) compiler-verified work partitioning + (b) a stated-assumption
comm model, both printed for the record.

    JAX_PLATFORMS=cpu python tools/scaling_analysis.py [--res 64] [--batch 8]

(self-forces the 8-device virtual CPU mesh via subprocess re-exec when run
under the session's single-chip axon platform, like dryrun_multichip).
"""

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# v5e ICI: 4 links/chip in a 2D torus, ~45 GB/s per direction per link →
# ~9e10 B/s bidirectional per torus axis. Ring all-reduce over one axis
# moves 2·(N-1)/N ≈ 2 bytes per byte of payload through each chip's links.
V5E_ICI_AXIS_BW = 9e10


def _self_force_cpu(n_devices: int) -> bool:
    """Re-exec under the virtual CPU mesh if this process can't provide it.

    The session's axon plugin ignores the JAX_PLATFORMS env var, so the
    child must call jax.config.update('jax_platforms', 'cpu') BEFORE any
    jax use (same contract as __graft_entry__._reexec_dryrun); the
    _TWINGAN_SCALING_CHILD guard makes a misconfigured child fail loudly
    instead of re-execing forever.
    """
    import jax

    devs = jax.devices()
    if len(devs) >= n_devices and devs[0].platform == "cpu":
        return False
    if os.environ.get("_TWINGAN_SCALING_CHILD"):
        raise RuntimeError(
            f"child still sees {len(devs)} {devs[0].platform} devices; "
            "refusing to re-exec again")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["_TWINGAN_SCALING_CHILD"] = "1"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import sys, runpy; import jax; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = [{os.path.abspath(__file__)!r}] + {sys.argv[1:]!r}; "
        f"runpy.run_path({os.path.abspath(__file__)!r}, run_name='__main__')"
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True)
    return True


def allreduce_bytes(hlo_text: str) -> int:
    """Sums output-shape bytes of all-reduce ops in optimized HLO text.

    XLA groups many gradient tensors into single tuple-shaped all-reduces
    (`= (f32[..], bf16[..], ...) all-reduce(...)`), so the shape part is
    scanned for every dtype[dims] element, not just a scalar shape.
    """
    sizes = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4, "u32": 4,
             "pred": 1, "s8": 1, "u8": 1}
    total = 0
    for m in re.finditer(
            r"=\s*([^=]*?)\s+all-reduce(?:-start)?\(", hlo_text):
        for sm in re.finditer(r"(\w+)\[([\d,]*)\]", m.group(1)):
            dtype, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * sizes.get(dtype, 4)
    return total


def analyze(n_devices: int, res: int, per_device_batch: int,
            max_channels: int = 256) -> dict:
    import jax

    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.parallel import create_mesh, replicate, shard_batch
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig
    from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer

    devices = jax.devices()[:n_devices]
    mesh = create_mesh(devices)
    batch = per_device_batch * n_devices  # weak scaling: fixed work per chip
    cfg = TwinGANConfig(
        model=PGGANConfig(resolution=res, max_channels=max_channels,
                          num_domains=2,
                          equalized_lr=True, norm_type="instance_norm",
                          dtype="bfloat16"),
        loss=GanLossConfig(architecture="dragan"),
        opt=OptimizerConfig(learning_rate=1e-4),
        batch_size=batch,
        use_unet=True,
    )
    trainer = TwinGANTrainer(cfg)
    state = replicate(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    batches = [
        shard_batch(
            {k: np.zeros((batch, res, res, 3), np.float32)
             for k in ("source", "target")}, mesh)
        for _ in range(cfg.n_critic)
    ]
    # round_step dispatches per-phase jits; lower the full round via a
    # wrapper so one compiled module covers D-steps + G-step + updates.
    def full_round(state, batches, key):
        state, metrics = trainer.round_step(state, batches, key)
        return state, metrics

    compiled = (
        jax.jit(full_round)
        .lower(state, batches, jax.random.PRNGKey(1))
        .compile()
    )
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    comm = allreduce_bytes(compiled.as_text())
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(state.params))
    return {
        "mesh": n_devices,
        "global_batch": batch,
        "per_device_flops_per_round_g": round(flops / 1e9, 2),
        "allreduce_bytes_per_round_mb": round(comm / 1e6, 2),
        "param_bytes_mb": round(n_params * 4 / 1e6, 2),
        "predicted_ici_comm_ms": round(2.0 * comm / V5E_ICI_AXIS_BW * 1e3, 3),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--batch", type=int, default=8, help="per-device batch")
    p.add_argument("--meshes", default="1,2,4,8")
    args = p.parse_args(argv)
    meshes = [int(m) for m in args.meshes.split(",")]
    if _self_force_cpu(max(meshes)):
        return
    rows = [analyze(n, args.res, args.batch) for n in meshes]
    base = rows[0]["per_device_flops_per_round_g"]
    for r in rows:
        # Weak-scaling check: per-device work flat vs the 1-device module.
        r["per_device_flops_vs_1dev"] = round(
            r["per_device_flops_per_round_g"] / base, 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
