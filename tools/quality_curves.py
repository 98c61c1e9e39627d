"""Convergence run with quality curves (VERDICT round 1 item 3).

Trains progressive TwinGAN on the two-domain demo set (filled discs ->
ring outlines; geometry must change, not just palette) and evaluates every
saved checkpoint of every stage with:

- MS-SSIM / L1 against the PAIRED ground-truth target (the generator never
  sees pairs — the domains are constructed from shared geometry, so a true
  target exists for held-out sources),
- FID (random-feature InceptionV3, relative metric) translated-vs-target,
- SWD x1e3 at the stage resolution (>= 16px, reference protocol).

Writes <out>/quality_curves.md (metric-vs-step table), quality_curves.json,
and a final gallery PNG. This makes the BASELINE '>=10x steps/sec at equal
MS-SSIM/FID' claim falsifiable: the curves + wall-clock are published in
docs/PERFORMANCE.md.

    python tools/quality_curves.py --work /tmp/qc --images 24000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def eval_checkpoint(trainer, state, sources_dev, targets_true_dev,
                    targets_pool_dev, feats, real_stats):
    """Metrics for one checkpoint, device-resident end-to-end: the eval
    sets are uploaded ONCE per stage by the caller and every metric
    consumes device arrays, so per-checkpoint traffic is the restored
    params plus scalars/feature vectors (previously each checkpoint
    re-staged ~500 MB of fp32 images through the ~50 MB/s tunnel — hours
    of pure transfer over a full run's checkpoint list)."""
    import jax.numpy as jnp
    import jax

    from twingan_tpu import ops
    from twingan_tpu.evals.metrics import (
        activation_statistics, frechet_distance,
    )

    out = trainer.translate(state, sources_dev, "s2t").astype(jnp.float32)
    res = out.shape[1]
    m = {"l1_vs_truth": float(jnp.mean(jnp.abs(out - targets_true_dev)))}
    mu_f, sig_f = activation_statistics(feats, [out])
    m["fid"] = frechet_distance(real_stats[0], real_stats[1], mu_f, sig_f)
    # MS-SSIM needs >=176px for the 5-level protocol; use the
    # SSIM-equivalent reduced-level form at small res.
    levels = 5
    if res < 176:
        levels = 1
        r = res
        while r >= 32 and levels < 5:
            r //= 2
            levels += 1
    m["msssim_vs_truth"] = float(
        ops.msssim(out, targets_true_dev, max_val=1.0, levels=levels)
    )
    if res >= 16:
        # Reference SWD table (fake column averaged), computed on device.
        if res >= 512:
            # The one-jit SWD graph at 512px fails the axon terminal's AOT
            # compile helper (HTTP 500, observed on the round-5 VM; the
            # same graph compiled on the round-4 VM) — the per-level
            # chunked path compiles fine and is sampling-equivalent
            # (ops/swd.py, verified on chip).
            from twingan_tpu.ops.swd import sliced_wasserstein_distance_chunked

            scores = np.asarray(sliced_wasserstein_distance_chunked(
                jax.random.PRNGKey(0), np.asarray(targets_pool_dev[: len(out)]),
                np.asarray(out), chunk=64,
            )) * 1e3
        else:
            scores = np.asarray(
                ops.sliced_wasserstein_distance(
                    jax.random.PRNGKey(0), targets_pool_dev[: len(out)], out
                )
            ) * 1e3
        m["swd_avg_x1e3"] = float(np.mean(scores[:, 1]))
    return m


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", default="/tmp/quality_curves")
    p.add_argument("--start_hw", type=int, default=4)
    p.add_argument("--max_hw", type=int, default=64)
    p.add_argument("--images", type=int, default=24000,
                   help="images per growth stage")
    p.add_argument("--images_top", type=int, default=0,
                   help="images override for the max_hw stages (0 = same as "
                   "--images; e.g. the reference's 300k at the headline "
                   "resolution with a lighter budget below)")
    p.add_argument("--n", type=int, default=600, help="dataset size per domain")
    p.add_argument("--eval_n", type=int, default=128, help="held-out eval pairs")
    p.add_argument("--pool_n", type=int, default=256,
                   help="real-pool size for FID stats / SWD reference (each "
                   "eval process uploads pool_n images at the stage "
                   "resolution — at 512px fp32 that is 3 MB/image through "
                   "a ~50 MB/s tunnel; cap it for stretch-resolution runs)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--save_every", type=int, default=750)
    p.add_argument("--rounds_per_scan", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--loss", default="gan",
                   choices=["gan", "dragan", "wgan", "wgan_gp", "hinge"])
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--d_lr", type=float, default=0.0,
                   help="discriminator learning rate (0 = config default "
                   "4e-4, the SAGAN TTUR direction). At native 256px the "
                   "default D:G = 2:1 ratio D-collapsed the growing stage "
                   "(d-loss pinned ~0, g 40-90, curves in docs/native256 "
                   "history); 1e-4 rebalances at zero compute cost")
    p.add_argument("--l_cyc", type=float, default=5.0)
    p.add_argument("--batch_top", type=int, default=0,
                   help="batch-size override for the max_hw stages only "
                   "(0 = use --batch everywhere; reference hw_to_batch_size "
                   "semantics, pggan_runner.py:52-56)")
    p.add_argument("--remat", type=int, default=0,
                   help="per-pass gradient checkpointing in the G/D steps "
                   "(frees top-resolution activation memory for the larger "
                   "--batch_top; see docs/PERFORMANCE.md remat table)")
    p.add_argument("--self_attention_hw", type=int, default=0,
                   help="insert SAGAN self-attention at this resolution "
                   "(0 = off; exercises ops/attention in real training — on "
                   "TPU the Pallas flash kernel auto-selects at hw >= 64)")
    p.add_argument("--attention_cp", type=int, default=0,
                   help="enable attention_context_parallel in the model "
                   "config (512px stretch recipe; on a single chip the "
                   "registered size-1 mesh degenerates to the local flash "
                   "path — tested equal)")
    p.add_argument("--spectral_norm", type=int, default=0,
                   help="spectral norm on every conv/fc in G AND D (the "
                   "reference's 512px stretch config, "
                   "image_generation.py:65-67,120-124)")
    p.add_argument("--fid_classifier", default="",
                   help="ClassifierTrainer checkpoint dir (see tools/"
                   "train_fid_classifier.py): score FID/IS in a TRAINED "
                   "feature space instead of the random-feature InceptionV3 "
                   "(closes the relative-FID caveat for synthetic domains)")
    p.add_argument("--checkpoint_path", default="",
                   help="warm-start the FIRST stage from this checkpoint "
                   "dir (growth-migrates; e.g. resume a 4->256 run's 256 "
                   "stage into a 256->512 stretch run)")
    p.add_argument("--isolate_stages", type=int, default=1,
                   help="run each training stage in its own subprocess (the "
                   "axon TPU client leaks every host->device payload for "
                   "process lifetime; per-stage re-exec bounds host RSS)")
    p.add_argument("--max_transfer_gb", type=float, default=0,
                   help="mid-stage re-exec after staging this many GB of "
                   "batches in one process (requires --isolate_stages; a "
                   "300k-image 256px stage stages ~235 GB — far past host "
                   "RAM under the axon per-payload leak)")
    p.add_argument("--device_resident_gb", type=float, default=4.0,
                   help="upload datasets under this many GB to HBM once and "
                   "draw batches as on-device gathers (steady-state "
                   "training transfers only int32 indices — the per-round "
                   "image transfer through the ~50 MB/s axon tunnel is the "
                   "256px+ end-to-end bottleneck). 0 = host streaming")
    p.add_argument("--async_probe", type=int, default=1,
                   help="pipelined failure detection: defer the per-chunk "
                   "NaN probe by one chunk so the host never blocks on the "
                   "device between dispatches (force-flushed before any "
                   "checkpoint/sample snapshot). 0 = synchronous probe")
    p.add_argument("--skip_start_stage", type=int, default=0,
                   help="with --checkpoint_path: the plan's first stage IS "
                   "the external checkpoint — don't retrain it, grow the "
                   "next stage from it directly (256->512 stretch entry)")
    p.add_argument("--eval_min_hw", type=int, default=0,
                   help="skip the metric pass for stages below this "
                   "resolution (each stage eval pays a fresh translate "
                   "compile through the tunnel; low-res trajectories are "
                   "usually already published from earlier runs)")
    p.add_argument("--eval_only", action="store_true",
                   help="skip training: evaluate whatever checkpoints exist "
                   "under --work and write curves + gallery (salvages "
                   "partial/interrupted runs)")
    p.add_argument("--incremental", action="store_true",
                   help="merge with an existing <work>/quality_curves.json: "
                   "skip (stage, step) rows already evaluated, append only "
                   "new ones (per-stage banking re-runs stay cheap)")
    p.add_argument("--bank_dir", default="",
                   help="after EACH stage completes (requires "
                   "--isolate_stages), run an incremental eval in a fresh "
                   "process and copy curves/gallery/stage-rates into this "
                   "directory, then `git add + commit` it — so a VM reset "
                   "can never erase a finished stage's evidence "
                   "(VERDICT r3 item 1)")
    p.add_argument("--train_log", default="",
                   help="with --bank_dir: capture worker stdout to this file "
                   "and bank a tools/stage_rates.py table from it")
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. cpu for smoke tests; the "
                   "JAX_PLATFORMS env var alone is ignored under axon)")
    p.add_argument("--_worker", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if args.isolate_stages and not args._worker and not args.eval_only:
        import subprocess

        def bank():
            if not args.bank_dir:
                return
            # Fresh process per eval: bounds the axon per-payload leak and
            # pays exactly one translate compile (the newly finished stage).
            ev = [sys.executable, os.path.abspath(__file__), *base,
                  "--_worker", "--eval_only", "--incremental"]
            log_f = open(args.train_log, "ab") if args.train_log else None
            ev_rc = subprocess.run(
                ev, stdout=log_f, stderr=subprocess.STDOUT).returncode
            if log_f:
                log_f.close()
            if ev_rc != 0:
                # A crashed eval (OOM, wedged tunnel) leaves stale files in
                # --work; copying them would present pre-crash artifacts as
                # this stage's evidence (advisor round-4 finding).
                print(f"[bank] eval subprocess rc={ev_rc}; skipping bank",
                      flush=True)
                return
            os.makedirs(args.bank_dir, exist_ok=True)
            import glob
            import shutil

            for f in (["quality_curves.json", "quality_curves.md",
                       "quality_gallery_meta.json"] +
                      [os.path.basename(g) for g in
                       glob.glob(os.path.join(args.work, "quality_gallery*.png"))]):
                src = os.path.join(args.work, f)
                if os.path.exists(src):
                    shutil.copy2(src, os.path.join(args.bank_dir, f))
            if args.train_log and os.path.exists(args.train_log):
                sched = ",".join(
                    [f"default={args.batch}"] +
                    ([f"{args.max_hw}={args.batch_top}"] if args.batch_top else []))
                with open(os.path.join(args.bank_dir, "stage_rates.md"), "w") as f:
                    subprocess.run(
                        [sys.executable,
                         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "stage_rates.py"),
                         args.train_log, "--batch_schedule", sched],
                        stdout=f, stderr=subprocess.STDOUT)
            # Bank the latest checkpoint of the top-resolution stages too
            # (~tens of MB): the 256->512 stretch warm start must survive a
            # VM reset, and work dirs have evaporated before (VERDICT r3).
            train_dir = os.path.join(args.work, "train")
            for stage in (f"{args.max_hw // 2}to{args.max_hw}",
                          str(args.max_hw)):
                sdir = os.path.join(train_dir, stage)
                if not os.path.isdir(sdir):
                    continue
                cks = sorted((d for d in os.listdir(sdir)
                              if d.startswith("ckpt-")),
                             key=lambda d: int(d.split("-")[1]))
                if cks:
                    subprocess.run(
                        ["tar", "-C", sdir, "-czf",
                         os.path.join(args.bank_dir, f"ckpt_{stage}.tar.gz"),
                         cks[-1]])
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            subprocess.run(["git", "-C", repo, "add", args.bank_dir])
            # Pathspec-scoped commit: a bare `git commit` would sweep any
            # unrelated staged changes into the automated banking commit
            # (advisor round-4 finding).
            subprocess.run(["git", "-C", repo, "commit", "-q", "-m",
                            f"bank quality-run artifacts: {args.bank_dir}",
                            "--", args.bank_dir],
                           stdout=subprocess.DEVNULL)

        base = list(argv if argv is not None else sys.argv[1:])
        while True:
            log_f = open(args.train_log, "ab") if args.train_log else None
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *base, "--_worker"],
                stdout=log_f, stderr=subprocess.STDOUT if log_f else None,
            ).returncode
            if log_f:
                log_f.close()
            if rc in (0, 3):
                bank()
            if rc == 0:
                return
            if rc != 3:  # 3 = "one stage done, more remain"
                raise SystemExit(rc)

    t_wall = time.time()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    dom = os.path.join(args.work, "domains")
    if not os.path.exists(os.path.join(dom, "rec_a")):
        import make_demo_domains

        # Train set + held-out eval tail (same generator, disjoint indices).
        make_demo_domains.main([
            "--out", dom, "--n", str(args.n + args.eval_n),
            "--hw", str(args.max_hw), "--seed", str(args.seed),
        ])

    from PIL import Image

    def load(dom_name, lo, hi, hw):
        imgs = []
        for i in range(lo, hi):
            im = Image.open(f"{dom}/{dom_name}/{i}.png").resize((hw, hw), Image.BILINEAR)
            imgs.append(np.asarray(im, np.float32) / 255.0)
        return np.stack(imgs)

    import jax

    from twingan_tpu.evals.metrics import inception_pool_features_fn
    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.runner.checkpoint import CheckpointManager
    from twingan_tpu.runner.stage_runner import (
        RunConfig, StageRunner, stage_dir_name, stage_plan,
    )
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig
    from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer

    # The round-1 learning-smoke recipe (docs/PERFORMANCE.md): instance norm
    # + plain gan loss + UNet skips + strong cycle weight.
    trainer_cfg = TwinGANConfig(
        model=PGGANConfig(
            resolution=args.start_hw, max_channels=128,
            norm_type="instance_norm", equalized_lr=True, do_pixel_norm=True,
            num_domains=2, dtype="bfloat16",
            do_self_attention=args.self_attention_hw > 0,
            self_attention_hw=args.self_attention_hw or 64,
            attention_context_parallel=bool(args.attention_cp),
            spectral_norm=bool(args.spectral_norm),
            spectral_norm_in_non_discriminator=bool(args.spectral_norm),
        ),
        loss=GanLossConfig(architecture=args.loss),
        opt=OptimizerConfig(learning_rate=args.lr),
        batch_size=args.batch,
        use_unet=True,
        l_cyc_weight=args.l_cyc,
        l_content_weight=0.1,
        remat=bool(args.remat),
    )
    if args.d_lr:
        trainer_cfg = trainer_cfg.replace(
            discriminator_learning_rate=args.d_lr)
    batch_schedule = {r: args.batch for r in (4, 8, 16, 32, 64, 128, 256, 512)}
    if args.batch_top:
        batch_schedule[args.max_hw] = args.batch_top
    run_cfg = RunConfig(
        program="twingan",
        train_dir=os.path.join(args.work, "train"),
        start_hw=args.start_hw,
        max_hw=args.max_hw,
        num_images_per_resolution=args.images,
        num_images_schedule=(
            {args.max_hw: args.images_top} if args.images_top else None),
        batch_schedule=batch_schedule,
        dataset_dir=os.path.join(dom, "rec_a"),
        target_dataset_dir=os.path.join(dom, "rec_b"),
        trainer=trainer_cfg,
        log_every_n_steps=200,
        save_every_n_steps=args.save_every,
        log_image_every_n_iter=0,
        keep_checkpoints=100,
        rounds_per_scan=args.rounds_per_scan,
        num_devices=1,
        seed=args.seed,
        checkpoint_path=args.checkpoint_path,
        max_stages_per_run=1 if args.isolate_stages else 0,
        max_transfer_gb_per_run=args.max_transfer_gb if args.isolate_stages else 0,
        device_resident_gb=args.device_resident_gb,
        skip_start_stage=bool(args.skip_start_stage),
        async_probe=bool(args.async_probe),
    )
    # Cumulative training wall-clock across isolated per-stage subprocesses;
    # a FRESH run (no train dir yet) must not inherit a previous run's total.
    wall_path = os.path.join(args.work, "train_wall.json")
    if args.eval_only:
        summary = {}
        train_wall = 0.0
        if os.path.exists(wall_path):
            with open(wall_path) as f:
                train_wall = json.load(f)["train_wall_sec"]
    else:
        if not os.path.isdir(run_cfg.train_dir) and os.path.exists(wall_path):
            os.remove(wall_path)
        runner = StageRunner(run_cfg)
        summary = runner.run()
        prior = 0.0
        if os.path.exists(wall_path):
            with open(wall_path) as f:
                prior = json.load(f)["train_wall_sec"]
        train_wall = prior + (time.time() - t_wall)
        with open(wall_path, "w") as f:
            json.dump({"train_wall_sec": train_wall}, f)
        if summary.pop("_incomplete", False):
            print("stage complete, more remain:", json.dumps(summary))
            raise SystemExit(3)
        print("training complete:", json.dumps(summary))

    # ---------------- metric-vs-step curves over every checkpoint ---------
    if args.fid_classifier:
        from twingan_tpu.evals.metrics import classifier_features_fn

        feats = classifier_features_fn(args.fid_classifier)
    else:
        feats = inception_pool_features_fn(image_hw=max(args.max_hw, 75), seed=0)
    curves_path = os.path.join(args.work, "quality_curves.json")
    rows = []
    done = set()
    n_new = 0
    if args.incremental and os.path.exists(curves_path):
        with open(curves_path) as f:
            prior = json.load(f)
        rows = list(prior.get("rows", []))
        done = {(r["stage"], r["step"]) for r in rows}
        if not summary:
            summary = prior.get("summary", {})
    for res, growing in stage_plan(args.start_hw, args.max_hw):
        if res < args.eval_min_hw:
            continue
        stage = stage_dir_name(res, growing)
        stage_dir = os.path.join(run_cfg.train_dir, stage)
        cm = CheckpointManager(stage_dir)
        steps = [s for s in cm.all_steps() if (stage, s) not in done]
        if not steps:
            continue
        t_stage_eval = time.time()
        tcfg = trainer_cfg.replace(
            model=trainer_cfg.model.replace(resolution=res, is_growing=growing),
            max_steps=max(1, args.images // args.batch),
        )
        trainer = TwinGANTrainer(tcfg)
        import jax.numpy as jnp

        from twingan_tpu.evals.metrics import activation_statistics

        # One upload per stage; every checkpoint below reuses these device
        # arrays (and the real-set feature statistics never change).
        sources_dev = jnp.asarray(load("a", args.n, args.n + args.eval_n, res))
        targets_true_dev = jnp.asarray(
            load("b", args.n, args.n + args.eval_n, res))
        targets_pool_dev = jnp.asarray(load("b", 0, min(args.n, args.pool_n), res))
        real_stats = activation_statistics(feats, [targets_pool_dev])
        for step in steps:
            state = cm.restore(trainer.init_state(jax.random.PRNGKey(0)), step)
            m = eval_checkpoint(trainer, state, sources_dev, targets_true_dev,
                                targets_pool_dev, feats, real_stats)
            rows.append({"stage": stage, "step": step, **m})
            n_new += 1
            print(f"[{stage} @ {step}] " + " ".join(
                f"{k}={v:.4f}" for k, v in m.items()))
        print(f"[{stage}] eval wall {time.time() - t_stage_eval:.1f}s "
              f"({len(steps)} checkpoints)")

    # Deterministic curve order even when incremental appends interleave
    # stages (advisor round-4 finding): growing (XtoY) precedes stabilize
    # (Y) at the same resolution, steps ascend within a stage.
    def row_key(r):
        s = r["stage"]
        res = int(s.split("to")[-1])
        return (res, 0 if "to" in s else 1, r["step"])

    rows.sort(key=row_key)
    with open(os.path.join(args.work, "quality_curves.json"), "w") as f:
        json.dump({"rows": rows, "train_wall_sec": train_wall,
                   "summary": summary,
                   "eval_pools": {"pool_n": min(args.n, args.pool_n),
                                  "eval_n": args.eval_n,
                                  "fid_features": ("trained"
                                                   if args.fid_classifier
                                                   else "random")}},
                  f, indent=1)

    fid_label = "FID (trained-feat)" if args.fid_classifier else "FID (rand-feat)"
    md = [f"| stage | step | L1 vs truth | MS-SSIM vs truth | {fid_label} | SWD avg x1e3 |",
          "|---|---|---|---|---|---|"]
    for r in rows:
        md.append(
            f"| {r['stage']} | {r['step']} | {r['l1_vs_truth']:.4f} | "
            f"{r['msssim_vs_truth']:.4f} | {r['fid']:.4f} | "
            f"{r.get('swd_avg_x1e3', float('nan')):.2f} |")
    md_path = os.path.join(args.work, "quality_curves.md")
    with open(md_path, "w") as f:
        f.write("\n".join(md) + f"\n\ntrain wall-clock: {train_wall:.0f}s\n")
    print("written:", md_path)

    # ---------------- final gallery: input / translated / ground truth ----
    import jax.numpy as jnp

    from twingan_tpu.utils.image_io import save_image_grid

    # Gallery from the highest stage that actually has checkpoints (an
    # interrupted run should still produce its best gallery, not crash).
    if args.incremental and n_new == 0:
        # Per-stage banking below --eval_min_hw: nothing new was evaluated,
        # so don't pay a fresh translate compile (tunnel: minutes) for an
        # unchanged gallery.
        print("incremental: no new rows; skipping gallery")
        return
    res = growing = None
    for r, g in stage_plan(args.start_hw, args.max_hw):
        if r < args.eval_min_hw:
            continue
        if CheckpointManager(
            os.path.join(run_cfg.train_dir, stage_dir_name(r, g))
        ).all_steps():
            res, growing = r, g
    if res is None:
        print("no checkpoints found; skipping gallery")
        return
    tcfg = trainer_cfg.replace(
        model=trainer_cfg.model.replace(resolution=res, is_growing=growing))
    trainer = TwinGANTrainer(tcfg)
    cm = CheckpointManager(
        os.path.join(run_cfg.train_dir, stage_dir_name(res, growing)))
    # GAN checkpoints oscillate; the last one is not reliably the best
    # (observed: a collapsed final ckpt after a healthy stage). Show the
    # best-by-L1 checkpoint of the stage and record which one it was.
    gal_step = None
    stage_rows = [r for r in rows
                  if r["stage"] == stage_dir_name(res, growing)]
    if stage_rows:
        gal_step = min(stage_rows, key=lambda r: r["l1_vs_truth"])["step"]
    state = cm.restore(trainer.init_state(jax.random.PRNGKey(0)), gal_step)
    with open(os.path.join(args.work, "quality_gallery_meta.json"), "w") as f:
        json.dump({"stage": stage_dir_name(res, growing), "step": gal_step,
                   "criterion": "min l1_vs_truth (None = latest ckpt)"}, f)
    n_gal = min(8, args.eval_n)
    sources = load("a", args.n, args.n + n_gal, res)
    truth = load("b", args.n, args.n + n_gal, res)
    out = np.asarray(trainer.translate(state, jnp.asarray(sources), "s2t").astype(jnp.float32))
    grid = np.concatenate([
        np.concatenate(list(sources), axis=1),
        np.concatenate(list(out), axis=1),
        np.concatenate(list(truth), axis=1),
    ], axis=0)
    gallery = os.path.join(args.work, "quality_gallery.png")
    save_image_grid(gallery, grid[None])
    # Per-stage copy too, so banked artifacts show the progression (and a
    # later, worse stage can never silently overwrite the best gallery).
    save_image_grid(os.path.join(
        args.work, f"quality_gallery_{stage_dir_name(res, growing)}.png"),
        grid[None])
    print("written:", gallery)


if __name__ == "__main__":
    main()
