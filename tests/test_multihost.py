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


def _spawn_workers(n_proc: int, port: int, train_dir: str, mode: str = "round"):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # The worker forces the cpu platform itself; scrub harness JAX vars that
    # would fight the subprocess config.
    env.pop("JAX_NUM_CPU_DEVICES", None)
    return [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(n_proc), str(port),
             train_dir, mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(n_proc)
    ]


def _collect(procs, tags):
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        res = {"_stdout": out}
        for tag in tags:
            line = [l for l in out.splitlines() if l.startswith(tag + " ")]
            assert line, f"no {tag} line:\n{out}\n{err}"
            res[tag] = json.loads(line[0][len(tag) + 1:])
        results.append(res)
    return results


def _run_workers(n_proc: int, port: int, train_dir: str):
    return _collect(_spawn_workers(n_proc, port, train_dir),
                    tags=("METRICS", "RUNNER"))


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


def test_two_process_mid_stage_kill_and_resume(tmp_path):
    """SIGKILL both workers inside the 4to8 growing stage, relaunch, and the
    progressive plan completes: stage 4 skip-if-complete, 4to8 resumed
    from the orbax checkpoint mid-stage in BOTH processes, 8 warm-started
    across the growth boundary (reference recovery semantics: tf.Supervisor
    restore-and-continue, pggan_runner.py:112-146)."""
    import re
    import time

    def _finalized(stage_dir):
        # Only FINALIZED orbax checkpoints (`ckpt-<step>`); an in-flight
        # write's tmp dir also starts with `ckpt-` and must not trigger the
        # kill (CheckpointManager._STEP_RE semantics).
        if not os.path.isdir(stage_dir):
            return []
        return [n for n in os.listdir(stage_dir)
                if re.fullmatch(r"ckpt-\d+", n)]

    train_dir = str(tmp_path / "mh_plan")
    procs = _spawn_workers(2, _free_port(), train_dir, mode="plan")
    try:
        # Kill strictly mid-stage: after the first 4to8 (growing) checkpoint
        # lands (step 2 of 40) and before the stage completes (~seconds of
        # per-step host-synced stepping away).
        gdir = os.path.join(train_dir, "4to8")
        deadline = time.time() + 420
        while time.time() < deadline:
            if _finalized(gdir):
                break
            if any(p.poll() is not None for p in procs):
                break
            time.sleep(0.005)
        assert _finalized(gdir), (
            "no mid-stage checkpoint appeared before the deadline/worker exit"
        )
    finally:
        for p in procs:
            p.kill()
        for p in procs:
            p.wait()

    assert _finalized(os.path.join(train_dir, "4")), (
        "stage 4 should have completed before the kill")

    # Relaunch on a fresh port with the same train_dir: must resume, not
    # restart, and both processes must agree on the whole plan summary.
    results = _collect(_spawn_workers(2, _free_port(), train_dir, mode="plan"),
                       tags=("RUNNER",))
    for r in results:
        s = r["RUNNER"]
        assert s["4"] == {"skipped": True, "step": 40}
        assert s["4to8"]["steps"] == 40
        assert s["8"]["steps"] == 40
        assert "resumed at step" in r["_stdout"], (
            "4to8 must restore the mid-stage checkpoint, not restart:\n"
            + r["_stdout"]
        )
    assert results[0]["RUNNER"]["4to8"]["steps"] == \
        results[1]["RUNNER"]["4to8"]["steps"]
