"""Progressive-growth stage runner.

Reference parity: /root/reference/pggan_runner.py.
- stage plan: resolutions start_hw..max_hw doubling, (growing, stabilize)
  per resolution (:90-104); per-stage train dirs '4', '4to8', '8', ...
  (:106-109);
- per-resolution batch-size schedules (:52-57) and steps per stage =
  num_images_per_resolution / batch (:96);
- skip-if-complete by checkpoint step (:112-122); warm start each stage from
  the previous stage's checkpoint (:136-146) — here a pytree migration with
  an explicit report;
- flags snapshot per stage dir (model_inheritor.py:307).

The TF1 graph rebuild per stage becomes: new static config -> new trainer ->
re-jit (cheap, <= 8 stages); state crosses stages as data.

Observability beyond the reference (SURVEY.md section 5.1): per-round
steps/sec logging and optional jax.profiler traces per stage.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from twingan_tpu.data.datasets import get_dataset
from twingan_tpu.data.pipeline import (
    DevicePrefetcher,
    DeviceResidentSampler,
    SyntheticSource,
    TFRecordSource,
    UnpairedSource,
)
from twingan_tpu.data.preprocess import (
    PreprocessConfig,
    augment_batch,
    postprocess_image,
)
from twingan_tpu.data.tfrecord import list_shards
from twingan_tpu.runner.checkpoint import CheckpointManager, save_config_snapshot
from twingan_tpu.runner.migrate import migrate_state_dict
from twingan_tpu.train.gan_trainer import GanTrainer, GanTrainerConfig
from twingan_tpu.train.twingan_trainer import TwinGANTrainer, TwinGANConfig
from twingan_tpu.utils.image_io import save_image_grid, stack_comparison
from twingan_tpu.utils.summary import SummaryWriter

import flax.serialization
import flax.traverse_util

# Reference batch-size schedules (pggan_runner.py:52-57).
PGGAN_BATCH_SCHEDULE = {4: 16, 8: 16, 16: 16, 32: 16, 64: 12, 128: 12, 256: 12, 512: 6}
TWINGAN_BATCH_SCHEDULE = {4: 8, 8: 8, 16: 8, 32: 8, 64: 8, 128: 4, 256: 3, 512: 2}


def stage_plan(start_hw: int, max_hw: int) -> list[tuple[int, bool]]:
    """[(resolution, is_growing)] — growing first at each new resolution,
    no growing stage at start_hw."""
    plan = []
    res = start_hw
    while res <= max_hw:
        if res != start_hw:
            plan.append((res, True))
        plan.append((res, False))
        res *= 2
    return plan


def stage_dir_name(res: int, growing: bool) -> str:
    return f"{res // 2}to{res}" if growing else str(res)


@dataclasses.dataclass(frozen=True)
class RunConfig:
    program: str = "twingan"                 # twingan | image_generation
    train_dir: str = "/tmp/twingan_tpu_train"
    start_hw: int = 4
    max_hw: int = 64
    num_images_per_resolution: int = 300000
    # Optional res -> images override (both stages of that resolution).
    # The reference trains every stage on the same num_images_per_resolution
    # (pggan_runner.py:44-47); this lets long runs spend the budget where it
    # matters (e.g. 300k at the top resolution, less below).
    num_images_schedule: Optional[dict] = None
    batch_schedule: Optional[dict] = None    # res -> batch size override
    # Dataset (source domain / single dataset).
    dataset_name: str = "image_only"
    dataset_dir: str = ""
    dataset_split: str = "train"
    # Target domain dataset for unpaired programs.
    target_dataset_name: str = "image_only"
    target_dataset_dir: str = ""
    use_synthetic_data: bool = False
    # Label vocabulary for text-tag datasets (anime_faces / danbooru) —
    # one label per line, index = line number (reference labels.txt files,
    # datasets/dataset_utils.py:113-162). Required for conditional training
    # on those datasets; class-id/attribute datasets don't need it.
    vocab_file: str = ""
    resize_mode: str = "PAD"
    color_space: str = "rgb"
    do_random_cropping: bool = False
    # 0-255-minus-RGB-means scale instead of [0,1] (vgg19 convention,
    # reference subtract_mean flag, model_inheritor.py:243).
    subtract_mean: bool = False
    # Trainer template; resolution/growing/batch/max_steps set per stage.
    trainer: Any = None
    # Cadences.
    log_every_n_steps: int = 10
    save_every_n_steps: int = 2000
    log_image_every_n_iter: int = 2000
    # Rows per sample grid / interpolation steps per mosaic (reference
    # log_image_n_per_hw, image_generation.py:131).
    log_image_n_per_hw: int = 8
    # Optional npy of fixed source images shown in every sample grid,
    # resolved relative to dataset_dir when not absolute (reference
    # custom_sources_np_path + get_fixed_sources, twingan.py:39-41,582-590:
    # uint8 npy -> resize to the stage resolution -> /255).
    custom_sources_np_path: str = ""
    # Run the in-training SWD eval every N steps, writing the
    # per-resolution table to <stage>/swd_in_training_<step>.txt plus
    # swd_real/swd_fake scalars (reference eval_every_n_iter_in_training,
    # image_generation.py:139,763-765; twingan.py:679-680). Uses the fixed
    # eval batch as the sample sets (bounded, unlike the reference's
    # 8192-image protocol — the axon client pins every host->device
    # payload, CLAUDE.md), so the scores are a relative convergence signal
    # at the same cadence semantics.
    eval_every_n_iter_in_training: int = 0
    # Parameter histogram + zero-fraction summaries (reference variable
    # histograms, model_inheritor.py:1057-1058). Off by default: each dump
    # fetches the full param tree over the ~50 MB/s tunnel.
    log_histograms_every_n_iter: int = 0
    keep_checkpoints: int = 3
    profile_stage_steps: int = 0             # capture a trace of N rounds per stage
    # On-device lax.scan loop: compile this many rounds into one dispatch
    # (1 = host loop). Big win at small resolutions where dispatch dominates.
    rounds_per_scan: int = 1
    # Warm start the FIRST stage from an external checkpoint dir (reference
    # checkpoint_path flag), with optional scope exclusion.
    checkpoint_path: str = ""
    checkpoint_exclude_scopes: tuple = ()
    # Failure detection: on a non-finite loss, restore the last checkpoint
    # and continue (up to this many times per stage; 0 disables). The
    # reference's only recovery is checkpoint restart on process death
    # (SURVEY.md section 5.3); this catches in-process divergence too.
    max_nan_recoveries: int = 3
    # Data parallelism: mesh size (0 = all local devices). The batch
    # schedule is PER DEVICE (the reference's batch_size flag is per clone,
    # model_deploy.py:186-239); global batch = schedule[res] * num_devices.
    # With >1 device the trainer state is replicated, batches are sharded on
    # the batch axis, and bn_num_groups defaults to the mesh size (per-clone
    # BN statistics parity, reference libs/batch_norm.py moments per GPU).
    num_devices: int = 0
    seed: int = 0
    # Execute at most this many INCOMPLETE stages per run() call (0 = all).
    # Lets a driving process re-exec between stages for host-memory isolation
    # (the axon TPU client pins every host->device payload for process
    # lifetime, ~transfer-size leaked per put); run() returns a summary with
    # "_incomplete": True when stages remain.
    max_stages_per_run: int = 0
    # Mid-stage host-leak bound (0 = off): after staging this many GB of
    # batch payloads in one process, checkpoint and return with
    # "_incomplete": True so the driving wrapper can re-exec and resume the
    # SAME stage. Per-stage isolation alone is not enough at the top
    # resolutions: a 300k-image 256px stage stages ~235 GB of uint8 batches,
    # far past host RAM once the axon client pins every payload.
    max_transfer_gb_per_run: float = 0.0
    # Device-resident datasets (0 = off): when the real-data sources
    # materialize under this many GB (uint8, post host-resize), upload them
    # to HBM once and draw every batch as an on-device gather
    # (DeviceResidentSampler) — steady-state training then transfers only
    # int32 sample indices. Through the ~50 MB/s axon tunnel the per-round
    # image transfer is the 256px+ end-to-end bottleneck, and zero
    # streaming also sidesteps the client's per-payload host leak (no
    # max_transfer_gb_per_run re-execs). Falls back to streaming for
    # multi-host runs, random host-resize modes, ragged/oversized datasets.
    device_resident_gb: float = 4.0
    # With checkpoint_path: treat the plan's FIRST stage as already trained
    # by that external checkpoint instead of warm-starting and retraining
    # it — the next stage growth-migrates from checkpoint_path directly.
    # The stretch-run entry point (reference 256->512 continuation,
    # pggan_runner.py:52-56): a finished 256 run feeds a 256->512 plan
    # without paying a redundant 256 re-stabilize. checkpoint_exclude_scopes
    # does not apply on this path (the skipped stage is used as-is).
    skip_start_stage: bool = False
    # Pipelined failure detection: defer the per-chunk NaN probe by one
    # scan chunk and track the step counter host-side, so the host never
    # blocks on the device between dispatches (the synchronous probe +
    # int(state.step) cost one full tunnel round-trip per chunk — ~5-15%
    # of wall at 256px chunk sizes). The probe is force-flushed before any
    # state snapshot (checkpoint save / sample grid / in-training eval /
    # histograms / stage end), so no non-finite state is ever persisted;
    # detection itself happens one chunk later, the same loss-based blind
    # spot the synchronous probe already has.
    async_probe: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class _NullWriter:
    """Summary sink for non-coordinator processes in multi-host runs."""

    def scalars(self, step, values):  # noqa: D401 - interface parity
        pass

    def images(self, step, tag, images):
        pass

    def close(self):
        pass


class StageRunner:
    def __init__(self, cfg: RunConfig):
        if cfg.trainer is None:
            trainer = TwinGANConfig() if cfg.program == "twingan" else GanTrainerConfig()
            cfg = cfg.replace(trainer=trainer)
        self.cfg = cfg
        self.metrics_log: list = []
        # Data-parallel mesh over the local devices (reference: deployment
        # lives inside the trainer main loop, model_inheritor.py:1041 ->
        # model_deploy.create_clones). mesh is None on a single device so
        # the single-chip path is byte-identical to before.
        n_dev = cfg.num_devices or len(jax.devices())
        if n_dev > len(jax.devices()):
            raise ValueError(
                f"num_devices={n_dev} but only {len(jax.devices())} available"
            )
        self.n_devices = n_dev
        if n_dev > 1:
            from twingan_tpu.parallel import create_mesh, set_current_mesh

            self.mesh = create_mesh(jax.devices()[:n_dev])
            # Model-internal parallel paths (context-parallel self-attention)
            # resolve the mesh through this registry.
            set_current_mesh(self.mesh)
            from jax.sharding import NamedSharding, PartitionSpec

            # P('data') shards axis 0 at any rank (images and embeddings).
            self.batch_sharding = NamedSharding(self.mesh, PartitionSpec("data"))
        else:
            self.mesh = None
            self.batch_sharding = None

    # ------------------------------------------------------------------ #
    @property
    def is_coordinator(self) -> bool:
        """Multi-host: only process 0 writes checkpoints/summaries/samples
        (every process computes identical replicated state, so one writer
        suffices; concurrent writers would race on the same files)."""
        return jax.process_index() == 0

    def _barrier(self, name: str) -> None:
        """Cross-process sync point so readers never see in-flight writes."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)

    def _save(self, cm: CheckpointManager, step: int, state) -> None:
        # ALL processes call save — orbax coordinates internally (primary
        # host writes, sync_global_processes barrier); guarding to one
        # process would deadlock its cross-process sync.
        cm.save(step, state, keep=self.cfg.keep_checkpoints)

    def batch_size(self, res: int) -> int:
        """GLOBAL batch: per-device schedule entry x mesh size."""
        sched = self.cfg.batch_schedule or (
            TWINGAN_BATCH_SCHEDULE if self.cfg.program == "twingan" else PGGAN_BATCH_SCHEDULE
        )
        return (sched.get(res) or sched[max(sched)]) * self.n_devices

    def steps_for_stage(self, res: int) -> int:
        images = self.cfg.num_images_per_resolution
        if self.cfg.num_images_schedule:
            images = self.cfg.num_images_schedule.get(res, images)
        return max(1, images // self.batch_size(res))

    def _build_trainer(self, res: int, growing: bool, steps: int):
        batch = self.batch_size(res)
        model = self.cfg.trainer.model.replace(resolution=res, is_growing=growing)
        if self.n_devices > 1 and model.bn_num_groups == 0:
            # Per-device BN statistics parity with the reference's per-clone
            # moments (libs/batch_norm.py:396-470 runs per GPU clone).
            model = model.replace(bn_num_groups=self.n_devices)
        tcfg = self.cfg.trainer.replace(
            model=model,
            batch_size=batch,
            max_steps=steps,
            grow_start_step=0,
        )
        if self.cfg.program == "twingan":
            return TwinGANTrainer(tcfg), tcfg
        return GanTrainer(tcfg), tcfg

    def _replicate(self, state):
        """Replicate trainer state across the mesh (no-op on one device)."""
        if self.mesh is None:
            return state
        from twingan_tpu.parallel import replicate

        return replicate(state, self.mesh)

    def _preprocess_cfg(self, res: int) -> PreprocessConfig:
        return PreprocessConfig(
            output_hw=res,
            resize_mode=self.cfg.resize_mode,
            color_space=self.cfg.color_space,
            do_random_cropping=self.cfg.do_random_cropping,
            subtract_mean=self.cfg.subtract_mean,
            is_training=True,
        )

    def _build_sources(self, res: int, batch: int):
        """The real-data TFRecordSource pair ((a, b); b is None for
        single-dataset programs)."""
        cfg = self.cfg
        needs_pair = cfg.program == "twingan"
        pp = self._preprocess_cfg(res)
        # Thread the trainer's label space into the dataset spec so real-data
        # conditional training emits one-hots of the right width (reference
        # num_classes_override / label files, dataset_factory.py:61-91).
        num_classes = int(getattr(cfg.trainer, "num_classes", 0) or 0)
        a = TFRecordSource(
            # Single-dataset generation: images are the real-data
            # distribution ('target'), so the generator input stays noise —
            # the reference's --dataset_use_target=True generation setup
            # (datasets/image_only.py:86). Paired/two-domain programs keep
            # source semantics.
            get_dataset(cfg.dataset_name, num_classes=num_classes,
                        vocab_file=cfg.vocab_file or None,
                        use_target=not needs_pair),
            list_shards(cfg.dataset_dir, cfg.dataset_split),
            pp, batch, seed=cfg.seed, yield_uint8=True,
        )
        b = None
        if needs_pair:
            b = TFRecordSource(
                get_dataset(cfg.target_dataset_name, use_target=False),
                list_shards(cfg.target_dataset_dir or cfg.dataset_dir, cfg.dataset_split),
                pp, batch, seed=cfg.seed + 1, yield_uint8=True,
            )
        return a, b

    def _build_resident(self, res: int, batch: int):
        """DeviceResidentSampler over the stage's datasets, or None when
        the resident path does not apply (budget off, synthetic data,
        multi-host, random host resize, ragged/oversized/undecodable
        datasets) — callers fall back to the streaming path."""
        cfg = self.cfg
        if (
            not cfg.device_resident_gb
            or cfg.use_synthetic_data
            or not cfg.dataset_dir
            or jax.process_count() > 1
        ):
            return None
        budget = int(cfg.device_resident_gb * (1 << 30))
        a, b = self._build_sources(res, batch)
        arrs_a = a.materialize(budget)
        if arrs_a is None:
            return None
        img_a = next((k for k in ("source", "target", "image") if k in arrs_a), None)
        if img_a is None:
            return None
        if b is not None:
            used = sum(v.nbytes for v in arrs_a.values())
            arrs_b = b.materialize(max(budget - used, 1))
            if arrs_b is None:
                return None
            img_b = next((k for k in ("source", "target", "image") if k in arrs_b), None)
            if img_b is None:
                return None
            # UnpairedSource key mapping (a_* -> source side, b_* -> target).
            domains = [
                (arrs_a, {"source": img_a, "source_embedding": "embedding",
                          "conditional_labels": "conditional_labels"}, cfg.seed),
                (arrs_b, {"target": img_b, "target_embedding": "embedding"},
                 cfg.seed + 1),
            ]
        else:
            domains = [
                (arrs_a, {"target": img_a,
                          "conditional_labels": "conditional_labels"}, cfg.seed)
            ]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            spec = NamedSharding(self.mesh, PartitionSpec(None, None, "data"))
        else:
            spec = None
        try:
            sampler = DeviceResidentSampler(domains, batch, sharding=spec)
        except ValueError:
            return None
        print(
            f"[data {res}px] device-resident: "
            f"{sampler.resident_bytes / 1e6:.1f} MB uploaded once; "
            "steady-state transfers are int32 indices only"
        )
        return sampler

    def _build_data(
        self, res: int, batch: int, to_device: bool = True
    ) -> tuple[Iterator, Callable]:
        """Returns (iterator over batches, close_fn). With to_device=False
        the prefetcher yields host arrays and the caller stages them in bulk
        (one large transfer per scan chunk)."""
        cfg = self.cfg
        needs_pair = cfg.program == "twingan"
        if cfg.use_synthetic_data or not cfg.dataset_dir:
            keys = ("source", "target") if needs_pair else ("target",)
            num_classes = 0
            if getattr(cfg.trainer, "use_conditional_labels", False):
                keys = keys + ("conditional_labels",)
                num_classes = cfg.trainer.num_classes
            src = SyntheticSource(batch, self._preprocess_cfg(res).host_hw,
                                  seed=cfg.seed, keys=keys, num_classes=num_classes)
            return iter(src), lambda: None
        a, b = self._build_sources(res, batch)
        if needs_pair:
            pf = DevicePrefetcher(
                UnpairedSource(a, b), depth=2, sharding=self.batch_sharding,
                to_device=to_device,
                # Only what the trainer consumes: UnpairedSource's a_*/b_*
                # duplicates of the image tensors would otherwise double the
                # host->device bytes through the tunnel (and the axon
                # client's per-payload leak) on every real-data run.
                keys=("source", "target", "source_embedding",
                      "target_embedding", "conditional_labels"),
            )
            return iter(pf), pf.close
        def to_target(it):
            for item in it:
                item = dict(item)
                if item.get("target") is None and item.get("source") is not None:
                    item["target"] = item["source"]
                yield item
        pf = DevicePrefetcher(to_target(iter(a)), depth=2,
                              sharding=self.batch_sharding, to_device=to_device)
        return iter(pf), pf.close

    # ------------------------------------------------------------------ #
    def run(self) -> Dict[str, Any]:
        cfg = self.cfg
        os.makedirs(cfg.train_dir, exist_ok=True)
        plan = stage_plan(cfg.start_hw, cfg.max_hw)
        prev_stage_dir: Optional[str] = None
        summary = {}
        executed = 0
        for i, (res, growing) in enumerate(plan):
            if i == 0 and cfg.skip_start_stage and cfg.checkpoint_path:
                # Stretch-run entry: the external checkpoint IS the plan's
                # first stage (e.g. a finished 256 stabilize feeding a
                # 256->512 run) — don't retrain it, warm-start the next
                # stage from it directly (growth migration adds the new
                # blocks / SA / spectral params there).
                print(f"[stage {stage_dir_name(res, growing)}] supplied by "
                      f"--checkpoint_path {cfg.checkpoint_path}; skipping")
                prev_stage_dir = cfg.checkpoint_path
                summary[stage_dir_name(res, growing)] = {
                    "skipped": True, "external": cfg.checkpoint_path}
                continue
            stage_dir = os.path.join(cfg.train_dir, stage_dir_name(res, growing))
            steps = self.steps_for_stage(res)
            cm = CheckpointManager(stage_dir)
            latest = cm.latest_step()
            if latest is not None and latest >= steps:
                print(f"[stage {stage_dir_name(res, growing)}] complete at step {latest}; skipping")
                prev_stage_dir = stage_dir
                summary[stage_dir_name(res, growing)] = {"skipped": True, "step": latest}
                continue
            if cfg.max_stages_per_run and executed >= cfg.max_stages_per_run:
                summary["_incomplete"] = True
                return summary
            info = self._run_stage(res, growing, steps, stage_dir, prev_stage_dir, cm)
            summary[stage_dir_name(res, growing)] = info
            if info.get("partial"):
                # Mid-stage host-leak pause: the wrapper re-execs and the
                # stage resumes from the checkpoint just written.
                summary["_incomplete"] = True
                return summary
            prev_stage_dir = stage_dir
            executed += 1
        return summary

    def _run_stage(
        self,
        res: int,
        growing: bool,
        steps: int,
        stage_dir: str,
        prev_stage_dir: Optional[str],
        cm: CheckpointManager,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        trainer, tcfg = self._build_trainer(res, growing, steps)
        if self.is_coordinator:
            save_config_snapshot(stage_dir, {"run": cfg.replace(trainer=None), "trainer": tcfg})
        state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
        if self.mesh is not None:
            print(f"[stage {stage_dir_name(res, growing)}] data-parallel mesh "
                  f"over {self.n_devices} devices, global batch {tcfg.batch_size}")

        start_step = 0
        latest = cm.latest_step()
        if latest is not None:
            state = cm.restore(state, latest)
            start_step = int(state.step)
            print(f"[stage {stage_dir_name(res, growing)}] resumed at step {start_step}")
        elif prev_stage_dir is not None or cfg.checkpoint_path:
            prev_cm = CheckpointManager(prev_stage_dir or cfg.checkpoint_path)
            raw = prev_cm.restore_dict()
            if raw is not None:
                template = flax.serialization.to_state_dict(state)
                migrated, report = migrate_state_dict(
                    template, raw,
                    exclude_scopes=tuple(cfg.checkpoint_exclude_scopes)
                    if prev_stage_dir is None else (),
                )
                state = flax.serialization.from_state_dict(state, migrated)
                print(
                    f"[stage {stage_dir_name(res, growing)}] warm start from "
                    f"{prev_stage_dir or cfg.checkpoint_path}: {len(report['carried'])} carried, "
                    f"{len(report['fresh'])} fresh, "
                    f"{len(report['shape_mismatch'])} shape-mismatched"
                )

        state = self._replicate(state)
        writer = (SummaryWriter(os.path.join(stage_dir, "logs"))
                  if self.is_coordinator else _NullWriter())
        resident = self._build_resident(res, trainer.cfg.batch_size)
        if resident is not None:
            data_iter, close_data = None, (lambda: None)
        else:
            data_iter, close_data = self._build_data(
                res, trainer.cfg.batch_size, to_device=cfg.rounds_per_scan <= 1
            )
        pp = self._preprocess_cfg(res)
        aug_key = jax.random.PRNGKey(cfg.seed + 13)
        rng = jax.random.PRNGKey(cfg.seed + 17)
        n_critic = trainer.cfg.n_critic
        tag = stage_dir_name(res, growing)

        def put(x):
            if self.batch_sharding is not None:
                from twingan_tpu.parallel import put_with_sharding

                if not (isinstance(x, jax.Array) and x.sharding == self.batch_sharding):
                    x = put_with_sharding(x, self.batch_sharding)
                return x
            return jnp.asarray(x)

        # First augmented batch of the stage, held fixed for sample grids
        # (reference fixed-source dumps, twingan.py:581-680).
        fixed_batch: Dict[str, np.ndarray] = {}

        # Host->device payload bytes staged by THIS process (the axon client
        # pins each payload for process lifetime; see max_transfer_gb_per_run).
        staged = {"bytes": 0}

        def next_batches():
            nonlocal aug_key
            if resident is not None:
                raws = resident.sample_batches(n_critic)
                staged["bytes"] += resident.last_index_bytes
            else:
                raws = [next(data_iter) for _ in range(n_critic)]
            batches = []
            for raw in raws:
                batch = {}
                for key in ("source", "target"):
                    if key in raw:
                        aug_key, sub = jax.random.split(aug_key)
                        if resident is None:
                            staged["bytes"] += np.asarray(raw[key]).nbytes
                        batch[key] = augment_batch(sub, put(raw[key]), pp)
                for key in ("source_embedding", "target_embedding", "conditional_labels"):
                    if key in raw:
                        if resident is None:
                            staged["bytes"] += np.asarray(raw[key]).nbytes
                        batch[key] = put(raw[key])
                batches.append(batch)
            # (multi-host: shards are not host-fetchable; grids are a
            # single-controller observability feature, skip them there)
            if not fixed_batch and (cfg.log_image_every_n_iter or cfg.eval_every_n_iter_in_training) and jax.process_count() == 1:
                fixed_batch.update(
                    {k: np.asarray(v, np.float32) for k, v in batches[0].items()}
                )
            return batches

        def scan_chunk(state, n_rounds):
            """n_rounds rounds in one on-device lax.scan dispatch.

            All n_rounds * n_critic host batches are stacked in numpy and
            staged with ONE transfer + ONE augment dispatch per image key
            (per-batch puts/augments through the tunnel dominated real-data
            wall-clock at small resolutions)."""
            nonlocal aug_key
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                spec = NamedSharding(self.mesh, PartitionSpec(None, None, "data"))
            else:
                spec = None
            if resident is not None:
                # Device-resident path: [R, n_critic, B, ...] gathered on
                # device from the HBM dataset; only int32 indices staged.
                stacked_raw = resident.sample_chunk(n_rounds, n_critic)
                staged["bytes"] += resident.last_index_bytes
            else:
                raw = [[next(data_iter) for _ in range(n_critic)] for _ in range(n_rounds)]
                keys = set(raw[0][0])
                for rnd in raw:
                    for b_ in rnd:
                        keys &= set(b_)
                stacked_raw = {}
                for k in sorted(keys):
                    arr = np.stack(
                        [np.stack([np.asarray(raw[r][c][k]) for c in range(n_critic)])
                         for r in range(n_rounds)]
                    )  # [R, n_critic, B, ...]
                    staged["bytes"] += arr.nbytes
                    if spec is not None:
                        if jax.process_count() > 1:
                            # Batch axis is dim 2 here; every process holds
                            # the global stack, so the replicated leading
                            # dims make the whole local shard derivable —
                            # but local_batch_slice targets dim 0, so slice
                            # dim 2 explicitly.
                            from twingan_tpu.parallel.multihost import local_batch_slice

                            x = jax.make_array_from_process_local_data(
                                spec, arr[:, :, local_batch_slice(arr.shape[2])]
                            )
                        else:
                            x = jax.device_put(arr, spec)
                    else:
                        x = jnp.asarray(arr)
                    stacked_raw[k] = x
            stacked = {}
            # sorted: the aug_key split order must not depend on set/dict
            # iteration order (keeps resident and streaming runs on the
            # same augmentation stream — tested bit-equal).
            for k in sorted(stacked_raw):
                x = stacked_raw[k]
                if k in ("source", "target"):
                    aug_key, sub = jax.random.split(aug_key)
                    flat = x.reshape((-1,) + x.shape[3:])
                    flat = augment_batch(sub, flat, pp)
                    x = flat.reshape(x.shape[:3] + flat.shape[1:])
                    if spec is not None:
                        x = jax.device_put(x, spec)
                stacked[k] = x
            if not fixed_batch and (cfg.log_image_every_n_iter or cfg.eval_every_n_iter_in_training) and jax.process_count() == 1:
                fixed_batch.update(
                    {k: np.asarray(v[0, 0], np.float32) for k, v in stacked.items()}
                )
            state, metrics = trainer.scan_rounds(state, stacked, rng)
            return state, {k: v[-1] for k, v in metrics.items()}

        t_start = time.time()
        last_log = t_start
        self._last_log_step = start_step
        self._nan_recoveries = 0
        profiled = False
        profiling_active = False
        cadence_idx: dict = {}  # per-cadence last-fired index (see due())
        paused = False
        pending_probe = None  # async_probe: deferred (step, metrics) check

        def nonfinite(m) -> bool:
            """Host sync on a chunk's loss scalars."""
            probe = float(m.get("generator_loss", 0.0)) + float(
                m.get("discriminator_loss", 0.0)
            )
            return not np.isfinite(probe)

        def recover_from_nan(at_step: int):
            """Failure detection: restore the last checkpoint and continue
            (raises once the recovery budget is exhausted)."""
            nan_recoveries = getattr(self, "_nan_recoveries", 0) + 1
            self._nan_recoveries = nan_recoveries
            if nan_recoveries > cfg.max_nan_recoveries:
                raise FloatingPointError(
                    f"[stage {tag}] non-finite loss at step {at_step}; "
                    f"recovery budget exhausted"
                )
            self._barrier(f"nan_recovery_{tag}_{nan_recoveries}")
            fresh = trainer.init_state(jax.random.PRNGKey(cfg.seed + nan_recoveries))
            restored = cm.restore(fresh)
            st = self._replicate(restored if restored is not None else fresh)
            stp = int(st.step)
            print(f"[stage {tag}] non-finite loss; restored checkpoint "
                  f"at step {stp} (recovery {nan_recoveries}/{cfg.max_nan_recoveries})")
            return st, stp
        try:
            step = start_step
            while step < steps:
                if (
                    cfg.profile_stage_steps
                    and not profiled
                    and not profiling_active
                    and step >= start_step + 2  # skip compile
                ):
                    jax.profiler.start_trace(os.path.join(stage_dir, "profile"))
                    profiling_active = True
                if cfg.rounds_per_scan > 1:
                    n = min(cfg.rounds_per_scan, steps - step)
                    if n == cfg.rounds_per_scan:
                        state, metrics = scan_chunk(state, n)
                        step += n
                    else:
                        state, metrics = trainer.round_step(state, next_batches(), rng)
                        step += 1
                else:
                    state, metrics = trainer.round_step(state, next_batches(), rng)
                    step += 1
                if profiling_active and step >= start_step + 2 + cfg.profile_stage_steps:
                    jax.profiler.stop_trace()
                    profiling_active = False
                    profiled = True
                if cfg.async_probe:
                    # Host-side step counter + one-chunk-deferred probe:
                    # the device queue never drains between dispatches.
                    cur = step
                    to_check, pending_probe = pending_probe, (cur, metrics)
                else:
                    cur = int(state.step)
                    to_check = (cur, metrics)
                # Failure detection: non-finite loss -> restore + continue.
                if (
                    to_check is not None
                    and cfg.max_nan_recoveries > 0
                    and nonfinite(to_check[1])
                ):
                    state, step = recover_from_nan(to_check[0])
                    pending_probe = None
                    continue
                # Cadences fire when cur crosses a multiple of the period
                # (cadence-index crossing), not on cur % N == 0: scan
                # advances `cur` in rounds_per_scan strides, so an exact-
                # multiple check is silently never hit when the stride does
                # not divide the cadence (e.g. resuming from a non-multiple
                # step) — a missed save cadence would leave a whole stage
                # uncheckpointed.
                def due(every: int, attr: str) -> bool:
                    if not every:
                        return False
                    idx = cur // every
                    if idx > cadence_idx.get(attr, start_step // every):
                        cadence_idx[attr] = idx
                        return True
                    return False

                def would_fire(every: int, attr: str) -> bool:
                    """Non-mutating due() — peeks without consuming."""
                    return bool(every) and (cur // every) > cadence_idx.get(
                        attr, start_step // every)

                if cfg.async_probe and pending_probe is not None and (
                    cur >= steps
                    or would_fire(cfg.save_every_n_steps, "save")
                    or would_fire(cfg.log_image_every_n_iter, "image")
                    or would_fire(cfg.eval_every_n_iter_in_training, "swd_train")
                    or would_fire(cfg.log_histograms_every_n_iter, "hist")
                ):
                    # Force the deferred probe before anything snapshots
                    # `state` — a non-finite state must never be persisted.
                    chk_step, chk_m = pending_probe
                    pending_probe = None
                    if cfg.max_nan_recoveries > 0 and nonfinite(chk_m):
                        state, step = recover_from_nan(chk_step)
                        continue

                if due(cfg.log_every_n_steps, "log") or cur >= steps:
                    g = float(metrics.get("generator_loss", np.nan))
                    d = float(metrics.get("discriminator_loss", np.nan))
                    now = time.time()
                    rate = (cur - getattr(self, "_last_log_step", start_step)) / max(
                        now - last_log, 1e-9
                    )
                    self._last_log_step = cur
                    last_log = now
                    rec = {"stage": tag, "step": cur, "g_loss": g, "d_loss": d,
                           "rounds_per_sec": round(rate, 3)}
                    self.metrics_log.append(rec)
                    writer.scalars(cur, {k: v for k, v in metrics.items()
                                         if np.ndim(v) == 0})
                    writer.scalars(cur, {"rounds_per_sec": rate})
                    print(f"[stage {tag}] step {cur}/{steps} "
                          f"g={g:.4f} d={d:.4f} {rate:.2f} rounds/s")
                if due(cfg.save_every_n_steps, "save"):
                    self._save(cm, cur, state)
                if due(cfg.log_image_every_n_iter, "image") and self.is_coordinator:
                    self._dump_samples(trainer, state, stage_dir, cur, fixed_batch)
                if due(cfg.eval_every_n_iter_in_training, "swd_train") and self.is_coordinator:
                    self._in_training_swd(trainer, state, stage_dir, cur, fixed_batch, writer)
                if due(cfg.log_histograms_every_n_iter, "hist") and self.is_coordinator:
                    flat = flax.traverse_util.flatten_dict(
                        flax.serialization.to_state_dict(state.params), sep="/"
                    )
                    writer.histograms(
                        cur, {k: jax.device_get(v) for k, v in flat.items()}
                    )
                if (
                    cfg.max_transfer_gb_per_run
                    and staged["bytes"] >= cfg.max_transfer_gb_per_run * 1e9
                    and cur < steps
                ):
                    paused = True
                    print(f"[stage {tag}] pausing at step {cur} after staging "
                          f"{staged['bytes'] / 1e9:.1f} GB (host-leak bound); "
                          f"re-exec to resume")
                    break
            if (
                pending_probe is not None
                and cfg.max_nan_recoveries > 0
                and nonfinite(pending_probe[1])
            ):
                # Pause/break exit with an unchecked chunk: roll back
                # rather than persist a non-finite state below.
                state, step = recover_from_nan(pending_probe[0])
            self._save(cm, int(state.step), state)
            self._barrier(f"stage_end_{tag}")
        finally:
            if profiling_active:
                # Stage ended (or failed) before profile_stage_steps
                # elapsed; a leaked active trace would crash the next
                # stage's start_trace.
                jax.profiler.stop_trace()
            close_data()
            writer.close()
        wall = time.time() - t_start
        done = int(state.step) - start_step
        info = {
            "steps": int(state.step),
            "wall_time_sec": round(wall, 1),
            "rounds_per_sec": round(done / max(wall, 1e-9), 3),
        }
        if paused:
            info["partial"] = True
        return info

    # ------------------------------------------------------------------ #
    def _display(self, x) -> np.ndarray:
        """Training-space batch -> [0,1] RGB display space (the danbooru
        postprocess inverse: undoes color_space and subtract_mean — without
        it, --subtract_mean grids would clip to garbage and SWD scores
        would live on the 0-255 scale)."""
        return np.asarray(postprocess_image(
            jnp.asarray(np.asarray(x), jnp.float32),
            self.cfg.color_space, subtract_mean=self.cfg.subtract_mean,
        ))

    def _in_training_swd(
        self, trainer, state, stage_dir: str, step: int, fixed_batch, writer
    ) -> None:
        """In-training SWD at the reference cadence (image_generation.py:
        763-765, twingan.py:679-680: every eval_every_n_iter_in_training
        steps run _calc_swd and persist the per-resolution table). Sample
        sets are the fixed eval batch (reals) vs the model's current
        generations — bounded by design, see RunConfig."""
        try:
            from twingan_tpu.evals.metrics import swd_eval

            fixed_batch = fixed_batch or {}
            real = fixed_batch.get("target")
            if real is None:
                if jax.process_count() > 1 and not getattr(
                    self, "_warned_swd_multihost", False
                ):
                    # fixed_batch capture is single-process-only (it is a
                    # coordinator observability feature); say so once
                    # instead of silently producing no tables.
                    print("[in-training swd skipped on multi-host: run "
                          "evals.run_eval against checkpoints instead]")
                    self._warned_swd_multihost = True
                return
            real = np.asarray(real, np.float32)
            if real.shape[1] < 16:
                return  # reference: 'Not doing swd on small images.'
            if isinstance(trainer, TwinGANTrainer):
                src = fixed_batch.get("source")
                if src is None:
                    return
                fake = np.asarray(
                    trainer.translate(
                        state, jnp.asarray(np.asarray(src), jnp.float32), "s2t"
                    ).astype(jnp.float32)
                )
            elif getattr(trainer, "is_pggan", True):
                src = fixed_batch.get("source")
                if src is not None:
                    inp = jnp.asarray(np.asarray(src), jnp.float32)
                else:
                    from twingan_tpu.models.pggan import noise_shape

                    rng = np.random.RandomState(9)
                    inp = jnp.asarray(
                        rng.standard_normal(
                            noise_shape(trainer.cfg.model, len(real))
                        ).astype(np.float32)
                    )
                labels = fixed_batch.get("conditional_labels")
                if labels is not None:
                    labels = jnp.asarray(np.asarray(labels)[: inp.shape[0]])
                fake = np.asarray(
                    trainer.sample(state, inp, labels=labels).astype(jnp.float32)
                )
            else:
                rng = np.random.RandomState(9)
                dim = getattr(trainer.cfg, "dcgan_latent_dim", 64)
                z = jnp.asarray(rng.standard_normal((len(real), dim)).astype(np.float32))
                fake = np.asarray(trainer.sample(state, z).astype(jnp.float32))
            out = os.path.join(stage_dir, f"swd_in_training_{step}.txt")
            # Display space so scores are [0,1]-scale comparable across
            # color_space / subtract_mean configs.
            table = swd_eval(
                jax.random.PRNGKey(step),
                [self._display(real)], [self._display(fake)],
                num_images=min(len(real), len(fake)), save_path=out,
            )
            if table:
                vals = list(table.values())
                writer.scalars(step, {
                    "swd_real": float(np.mean([v[0] for v in vals])),
                    "swd_fake": float(np.mean([v[1] for v in vals])),
                })
        except Exception as e:  # eval must never kill training
            print(f"[in-training swd failed: {e}]")

    def _fixed_custom_sources(self, res: int, n: int):
        """Load + cache the custom_sources_np_path npy at this stage's
        resolution (reference get_fixed_sources, twingan.py:582-590: load,
        resize each image to train_image_size, /255)."""
        path = self.cfg.custom_sources_np_path
        if not path:
            return None
        if not os.path.isabs(path):
            path = os.path.join(self.cfg.dataset_dir, path)
        cache_key = (path, res)
        if getattr(self, "_custom_sources_cache", None) and \
                self._custom_sources_cache[0] == cache_key:
            return self._custom_sources_cache[1][:n]
        try:
            arr = np.load(path)
        except Exception as e:
            print(f"[custom sources unavailable ({e}); using data batch]")
            return None
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 2:
            arr = arr[None, ..., None]           # single grayscale image
        elif arr.ndim == 3:
            # (H, W, C) single image vs (N, H, W) grayscale batch.
            arr = arr[None] if arr.shape[-1] in (1, 3, 4) else arr[..., None]
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        elif arr.shape[-1] == 4:
            arr = arr[..., :3]                   # drop alpha
        if arr.shape[1:3] != (res, res):
            # Square resize regardless of aspect (reference scipy.misc
            # imresize to (hw, hw), twingan.py:586).
            arr = np.asarray(jax.image.resize(
                jnp.asarray(arr), (arr.shape[0], res, res, arr.shape[-1]),
                "bilinear",
            ))
        self._custom_sources_cache = (cache_key, arr)
        return arr[:n]

    def _dump_samples(
        self, trainer, state, stage_dir: str, step: int, fixed_batch=None
    ) -> None:
        """Periodic sample grids from FIXED REAL sources plus style/noise
        interpolation mosaics (reference do_extra_train_step:
        twingan.py:581-680, image_generation.py:716-765). The same batch is
        reused every dump so a grid sequence shows training progress."""
        try:
            out_dir = os.path.join(stage_dir, "generated_samples")
            fixed_batch = fixed_batch or {}
            n_show = max(2, self.cfg.log_image_n_per_hw)
            if isinstance(trainer, TwinGANTrainer):
                res = trainer.cfg.model.resolution
                src = fixed_batch.get("source")
                tgt = fixed_batch.get("target")
                if src is None:  # no data yet (shouldn't happen) — noise
                    rng = np.random.RandomState(31415)
                    src = rng.rand(n_show, res, res, 3).astype(np.float32)
                    tgt = rng.rand(n_show, res, res, 3).astype(np.float32)
                src = jnp.asarray(np.asarray(src)[:n_show], jnp.float32)
                tgt = jnp.asarray(np.asarray(tgt)[:n_show], jnp.float32)
                t_prime = np.asarray(trainer.translate(state, src, "s2t").astype(jnp.float32))
                s_prime = np.asarray(trainer.translate(state, tgt, "t2s").astype(jnp.float32))
                save_image_grid(
                    os.path.join(out_dir, f"{step}_source_t_prime.png"),
                    self._display(stack_comparison([np.asarray(src), t_prime])),
                )
                save_image_grid(
                    os.path.join(out_dir, f"{step}_target_s_prime.png"),
                    self._display(stack_comparison([np.asarray(tgt), s_prime])),
                )
                if trainer.cfg.use_style_embedding:
                    # Style interpolation: one fixed source, style lerped
                    # between two fixed N(0,1) embeddings across columns
                    # (reference get_fixed_rand_style_embed, seed 31415).
                    rng = np.random.RandomState(31415)
                    dim = trainer.cfg.style_embed_size
                    a = rng.standard_normal(dim).astype(np.float32)
                    b_ = rng.standard_normal(dim).astype(np.float32)
                    ts = np.linspace(0.0, 1.0, n_show, dtype=np.float32)[:, None]
                    styles = jnp.asarray(a[None] * ts + b_[None] * (1 - ts))
                    one_src = jnp.broadcast_to(src[:1], (n_show,) + src.shape[1:])
                    rolled = np.asarray(
                        trainer.translate(state, one_src, "s2t", style=styles)
                        .astype(jnp.float32)
                    )
                    save_image_grid(
                        os.path.join(out_dir, f"{step}_custom_t_style_roll.png"),
                        self._display(stack_comparison([np.asarray(one_src), rolled])),
                    )
                custom = self._fixed_custom_sources(res, n_show)
                if custom is not None:
                    # Fixed user-supplied sources translated every dump
                    # (reference custom_sources branch, twingan.py:636-640:
                    # writes %d_sources_ph.png + %d_custom_t_style_rand.png).
                    # The npy is [0,1] RGB; the model consumes training
                    # space — run the eval-mode preprocess tail first.
                    pp_eval = dataclasses.replace(
                        self._preprocess_cfg(res), is_training=False)
                    csrc = augment_batch(
                        jax.random.PRNGKey(0),
                        jnp.asarray(custom, jnp.float32), pp_eval)
                    cout = np.asarray(
                        trainer.translate(state, csrc, "s2t").astype(jnp.float32)
                    )
                    save_image_grid(
                        os.path.join(out_dir, f"{step}_sources_ph.png"),
                        np.asarray(custom),
                    )
                    save_image_grid(
                        os.path.join(out_dir, f"{step}_custom_t_style_rand.png"),
                        self._display(cout),
                    )
            elif getattr(trainer, "is_pggan", True):
                from twingan_tpu.models.pggan import noise_shape

                src = fixed_batch.get("source")
                if src is not None:
                    # Conditional/paired generation: fixed source -> output
                    # -> real target rows (reference 'sources' branch).
                    src = jnp.asarray(np.asarray(src)[:n_show], jnp.float32)
                    labels = fixed_batch.get("conditional_labels")
                    if labels is not None:
                        labels = jnp.asarray(np.asarray(labels)[: src.shape[0]])
                    out = np.asarray(trainer.sample(
                        state, src, labels=labels,
                    ).astype(jnp.float32))
                    rows = [np.asarray(src), out]
                    if fixed_batch.get("target") is not None:
                        rows.append(np.asarray(fixed_batch["target"])[:n_show])
                    k = min(len(r) for r in rows)
                    save_image_grid(
                        os.path.join(out_dir, f"{step}.png"),
                        self._display(stack_comparison([r[:k] for r in rows])),
                    )
                else:
                    # Noise interpolation (reference seed 314, lerp z2 -> z1).
                    rng = np.random.RandomState(314)
                    shape = noise_shape(trainer.cfg.model, 1)
                    z1 = rng.standard_normal(shape).astype(np.float32)
                    z2 = rng.standard_normal(shape).astype(np.float32)
                    ts = np.linspace(0.0, 1.0, n_show, dtype=np.float32).reshape(-1, 1, 1, 1)
                    z = jnp.asarray(z1 * ts + z2 * (1 - ts))
                    labels = fixed_batch.get("conditional_labels")
                    if labels is not None:
                        labels = jnp.asarray(np.asarray(labels)[:1].repeat(n_show, 0))
                    img = np.asarray(trainer.sample(state, z, labels=labels).astype(jnp.float32))
                    rows = [img]
                    if fixed_batch.get("target") is not None:
                        rows.append(np.asarray(fixed_batch["target"])[:n_show])
                    k = min(len(r) for r in rows)
                    save_image_grid(
                        os.path.join(out_dir, f"{step}.png"),
                        self._display(stack_comparison([r[:k] for r in rows])),
                    )
            else:
                # DCGAN (or any flat-latent network): noise interpolation
                # between two fixed latents, same protocol as pggan.
                rng = np.random.RandomState(314)
                dim = getattr(trainer.cfg, "dcgan_latent_dim", 64)
                z1 = rng.standard_normal((1, dim)).astype(np.float32)
                z2 = rng.standard_normal((1, dim)).astype(np.float32)
                ts = np.linspace(0.0, 1.0, n_show, dtype=np.float32)[:, None]
                z = jnp.asarray(z1 * ts + z2 * (1 - ts))
                img = np.asarray(trainer.sample(state, z).astype(jnp.float32))
                rows = [img]
                if fixed_batch.get("target") is not None:
                    rows.append(np.asarray(fixed_batch["target"])[:n_show])
                k = min(len(r) for r in rows)
                save_image_grid(
                    os.path.join(out_dir, f"{step}.png"),
                    self._display(stack_comparison([r[:k] for r in rows])),
                )
        except Exception as e:  # sample dumps must never kill training
            print(f"[sample dump failed: {e}]")
