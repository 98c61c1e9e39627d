"""Multi-host (DCN) execution test: two OS processes x two virtual CPU
devices each, gloo collectives over localhost, one global 4-device mesh.

This executes the multi-process branch of twingan_tpu.parallel for real —
jax.distributed init, make_array_from_process_local_data batch assembly,
cross-process gradient all-reduce inside the jitted TwinGAN round — and
asserts both workers agree with each other AND with the single-process
4-device run of the identical round (the reference's multi-replica
SyncReplicasOptimizer semantics, model_inheritor.py:1081-1089: synchronous
aggregation must be equivalent to one big batch).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def _run_workers(n_proc: int, port: int, train_dir: str):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # The worker forces the cpu platform itself; scrub harness JAX vars that
    # would fight the subprocess config.
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(n_proc), str(port), train_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(n_proc)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        res = {}
        for tag in ("METRICS", "RUNNER"):
            line = [l for l in out.splitlines() if l.startswith(tag + " ")]
            assert line, f"no {tag} line:\n{out}\n{err}"
            res[tag] = json.loads(line[0][len(tag) + 1:])
        results.append(res)
    return results


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_round_matches_single_process(tmp_path):
    ra, rb = _run_workers(n_proc=2, port=_free_port(), train_dir=str(tmp_path / "mh"))
    a, b = ra["METRICS"], rb["METRICS"]
    assert a["step"] == b["step"] == 1
    for k in a:
        assert np.isfinite(a[k])
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, err_msg=k)

    # Production StageRunner ran cross-process: both processes agree on the
    # stage summary and process 0 wrote the checkpoint.
    assert ra["RUNNER"]["4"]["steps"] == rb["RUNNER"]["4"]["steps"] == 3
    assert any((tmp_path / "mh" / "4").glob("ckpt-*"))

    # Single-process 4-device reference on the harness's virtual CPU mesh.
    sys.path.insert(0, os.path.dirname(WORKER))
    from multihost_worker import build_round

    from twingan_tpu.parallel import create_mesh, replicate, shard_batch

    mesh = create_mesh(jax.devices()[:4])
    trainer, batches = build_round(global_batch=8, n_critic=2)
    state = replicate(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    sharded = [shard_batch(x, mesh) for x in batches]
    state, metrics = trainer.round_step(state, sharded, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        np.testing.assert_allclose(
            a[k], float(v), rtol=1e-4, atol=1e-5,
            err_msg=f"{k}: multi-process vs single-process",
        )
