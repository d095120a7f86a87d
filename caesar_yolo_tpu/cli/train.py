"""Training entry point (the reference's run_train macro, TPU-native).

Reference macros/run_train.py:11-45 builds yolov8l from scratch and
delegates everything to ultralytics `model.train` with DDP over 4 GPUs.
Here the explicit trainer runs data-parallel over ALL visible TPU chips
with the same published hyper-parameters and the reference's
augmentation config (degrees=180, flips=0.5, scale=0.89).

    python -m caesar_yolo_tpu.cli.train --data=dataset.yaml \
        --model=yolov8l --epochs=300 --batch=16 --imgsz=640
"""

from __future__ import annotations

import argparse
import sys

from caesar_yolo_tpu import logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="caesar-yolo-tpu training")
    p.add_argument("--data", required=True,
                   help="dataset.yaml or train image directory")
    p.add_argument("--model", default="yolov8l")
    p.add_argument("--num_classes", type=int, default=5)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--lr0", type=float, default=0.01)
    p.add_argument("--lrf", type=float, default=0.01)
    p.add_argument("--weights", default="",
                   help="initial weights (.npz) for fine-tuning")
    p.add_argument("--resume", default="",
                   help="resume an interrupted run from a checkpoint "
                        "directory written by this trainer (restores "
                        "params, EMA, optimizer momentum, and the "
                        "LR-schedule position; the reference's "
                        "ultralytics resume=True analog, "
                        "macros/run_train.py:23).  Pass a specific "
                        "step_N/last/best path or the --checkpoint_dir "
                        "to pick the latest")
    p.add_argument("--checkpoint_dir", default="runs/train")
    p.add_argument("--checkpoint_every", type=int, default=10)
    p.add_argument("--max_gt", type=int, default=64)
    p.add_argument("--degrees", type=float, default=180.0)
    p.add_argument("--scale", type=float, default=0.89)
    p.add_argument("--flipud", type=float, default=0.5)
    p.add_argument("--fliplr", type=float, default=0.5)
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize layer activations in backward "
                        "(train l/x scales at full batch on one chip)")
    p.add_argument("--fp32", action="store_true",
                   help="train in float32 (default is bf16 mixed "
                        "precision, the ultralytics-AMP analog)")
    p.add_argument("--seed", type=int, default=0)
    # training-time validation (the reference gets per-epoch val metrics
    # from ultralytics; reference macros/run_train.py:20-45)
    p.add_argument("--val_data", default="",
                   help="val images: a directory, a filelist txt, or "
                        "empty to use the dataset.yaml 'val' split")
    p.add_argument("--val_every", type=int, default=10,
                   help="validate every N epochs (0 = only at the end)")
    p.add_argument("--val_score_thr", type=float, default=0.25)
    p.add_argument("--val_iou_match", type=float, default=0.6)
    p.add_argument("--val_max_images", type=int, default=200)
    p.add_argument("--gate_metric", choices=["f1", "fitness"],
                   default="f1",
                   help="best-checkpoint criterion: 'f1' = source F1 "
                        "(the reference's published metric) or "
                        "'fitness' = 0.1*mAP50 + 0.9*mAP50-95 (the "
                        "criterion ultralytics' trainer uses for "
                        "best.pt)")
    return p.parse_args(argv)


def resolve_resume_checkpoint(path: str) -> str:
    """Resolve --resume to a concrete checkpoint directory.  Accepts a
    checkpoint itself (a directory orbax wrote: has a params/ entry) or
    a --checkpoint_dir containing step_N/last/best, picking whichever
    candidate holds the HIGHEST optimizer step (never 'best' — it is
    the val-gated snapshot, not the latest optimizer state).  An old
    completed run's 'last' must not shadow a newer interrupted run's
    step_N, so candidates are ranked by the step recorded in the
    `<ckpt>.step` sidecar; a legacy 'last' without a sidecar falls back
    to reading the step stored inside the checkpoint."""
    import os
    import re as _re

    def is_ckpt(p):
        return (os.path.exists(os.path.join(p, "_CHECKPOINT_METADATA"))
                or os.path.exists(os.path.join(p, "_METADATA")))

    def ckpt_step(p):
        try:
            with open(p + ".step") as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            pass
        try:  # legacy checkpoint without sidecar: read the stored step
            from caesar_yolo_tpu.train import Trainer
            return int(Trainer.load_checkpoint(p).get("step", 0))
        except Exception:
            return 0

    if is_ckpt(path):
        return path
    candidates = []  # (step, tiebreak, path) — 'last' wins ties
    if os.path.isdir(path):
        last = os.path.join(path, "last")
        if is_ckpt(last):
            candidates.append((ckpt_step(last), 1, last))
        for name in os.listdir(path):
            m = _re.fullmatch(r"step_(\d+)", name)
            p = os.path.join(path, name)
            if m and is_ckpt(p):
                candidates.append((ckpt_step(p) or int(m.group(1)), 0, p))
    if candidates:
        return max(candidates)[2]
    raise FileNotFoundError(
        f"--resume={path}: no checkpoint found (expected an orbax "
        f"checkpoint directory or one containing last/step_N)")


def list_val_images(args) -> list[str] | None:
    """Resolve the validation image list from --val_data or the
    dataset.yaml val split; None when no validation source exists."""
    import os

    from caesar_yolo_tpu.evaluation.evaluate import read_filelist
    from caesar_yolo_tpu.train.dataset import list_images, parse_dataset_yaml
    if args.val_data:
        if os.path.isdir(args.val_data):
            return list_images(args.val_data) or None
        return read_filelist(args.val_data) or None
    if args.data.endswith((".yaml", ".yml")):
        spec = parse_dataset_yaml(args.data)
        if "val" in spec:
            root = spec.get("path", os.path.dirname(args.data))
            rel = spec["val"]
            d = rel if os.path.isabs(rel) else os.path.join(root, rel)
            if os.path.isdir(d):
                return list_images(d) or None
    return None


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax
    import numpy as np
    from caesar_yolo_tpu.cli.run import enable_compilation_cache
    enable_compilation_cache()
    from caesar_yolo_tpu.models.convert import load_params
    from caesar_yolo_tpu.models.yolo import build_model, init_params
    from caesar_yolo_tpu.parallel.mesh import make_mesh
    from caesar_yolo_tpu.train import TrainConfig, Trainer
    from caesar_yolo_tpu.train.augment import augment_batch
    from caesar_yolo_tpu.train.dataset import DetectionDataset

    model = build_model(args.model, num_classes=args.num_classes)
    if args.weights:
        params, _ = load_params(args.weights)
        logger.info("Fine-tuning from %s", args.weights)
    else:
        params = init_params(model, seed=args.seed)

    n_dev = len(jax.devices())
    batch = max(args.batch, n_dev)
    batch = ((batch + n_dev - 1) // n_dev) * n_dev
    # single-process: ship NATIVE-resolution batches and letterbox on
    # device (23-70x fewer H2D bytes for small cutouts at imgsz=640);
    # multi-host keeps host letterboxing — the global batch assembles
    # from fixed-shape HOST shards in train_step
    device_lb = jax.process_count() == 1
    dataset = DetectionDataset(args.data, img_size=args.imgsz,
                               batch_size=batch, max_gt=args.max_gt,
                               seed=args.seed, device_letterbox=device_lb)
    cfg = TrainConfig(epochs=args.epochs, batch_size=batch,
                      img_size=args.imgsz, lr0=args.lr0, lrf=args.lrf,
                      max_gt=args.max_gt, remat=args.remat,
                      compute_dtype="float32" if args.fp32 else "bfloat16")
    mesh = make_mesh() if n_dev > 1 else None
    trainer = Trainer(model, params, cfg, mesh=mesh,
                      steps_per_epoch=max(len(dataset), 1))
    logger.info("Training %s on %d device(s), %d batches/epoch",
                args.model, n_dev, len(dataset))

    start_epoch = 0
    if args.resume:
        ckpt = resolve_resume_checkpoint(args.resume)
        step = trainer.restore(ckpt)
        start_epoch = min(step // max(len(dataset), 1), args.epochs)
        logger.info("Resuming at epoch %d/%d (step %d)",
                    start_epoch, args.epochs, step)

    import jax.numpy as jnp
    from caesar_yolo_tpu.detect.letterbox import letterbox_batch

    @jax.jit
    def prep_pixels(imgs):
        """Device-side 1->3 channel repeat + letterbox to imgsz (same
        geometry the loader's box math used)."""
        t = jnp.asarray(imgs, jnp.float32)
        if t.shape[-1] == 1:
            t = jnp.repeat(t, 3, axis=-1)
        if t.shape[1] != args.imgsz or t.shape[2] != args.imgsz:
            t = letterbox_batch(t, args.imgsz)
        return t

    def augmented(epoch):
        # Key the sample order AND the augmentation stream off
        # (seed, epoch) — not a running key from PRNGKey(seed) — so a
        # resumed epoch N draws exactly what an uninterrupted run drew
        # (otherwise resume replays epoch 0's shuffle + augmentations).
        dataset.set_epoch(epoch)
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch)
        for imgs, labels, boxes, masks in dataset:
            if device_lb:
                imgs = prep_pixels(imgs)
            if args.no_augment:
                yield imgs, labels, boxes, masks
                continue
            key, sub = jax.random.split(key)
            aimgs, aboxes, amasks = augment_batch(
                sub, imgs, boxes, masks, degrees=args.degrees,
                scale=args.scale, flipud=args.flipud, fliplr=args.fliplr)
            if jax.process_count() > 1:
                # multi-host: train_step assembles global arrays from
                # HOST shards (make_array_from_process_local_data), so
                # materialize the augmented shard on host here
                yield (np.asarray(aimgs), labels, np.asarray(aboxes),
                       np.asarray(amasks))
            else:
                # single-process: keep the augmented batch ON DEVICE —
                # np.asarray here round-tripped ~157 MB/step (78 MB
                # augmented images D2H + the same back H2D inside
                # train_step) through the host for nothing; on the
                # tunneled relay that was a >10x training slowdown
                # (found by scripts/drill_train_resume.py at 640px)
                yield aimgs, labels, aboxes, amasks

    # training-time validation: C/R/F1 on the val split with EMA params
    # after precise-BN calibration; the best-F1 epoch is checkpointed as
    # "best" (the reference's best.pt / last.pt convention)
    val_paths = list_val_images(args)
    val_detector = None
    if val_paths:
        from caesar_yolo_tpu.detect.batch import BatchedDetector
        val_detector = BatchedDetector(
            model, params, img_size=args.imgsz,
            score_thr=args.val_score_thr, batch_size=min(batch, 32))
        logger.info("Validating on %d images every %d epoch(s)",
                    len(val_paths), max(args.val_every, 1))
    # On --resume the checkpoint carries the best metric seen before the
    # interruption (restored by trainer.restore), so the first post-resume
    # validation can't silently overwrite a better 'best' snapshot.
    best_metric = trainer.best_metric

    def run_validation(epoch, calibrate=True):
        nonlocal best_metric
        import itertools

        from caesar_yolo_tpu.evaluation import evaluate_dataset
        if calibrate:
            trainer.calibrate_bn(
                (prep_pixels(imgs) if device_lb else imgs)
                for imgs, *_ in itertools.islice(iter(dataset), 8))
        val_detector.engine.update_params(
            jax.device_get(trainer.state.ema_params))
        report = evaluate_dataset(
            model, None, val_paths, detector=val_detector,
            score_thr=args.val_score_thr, iou_thr=args.val_iou_match,
            max_images=args.val_max_images,
            class_names=dataset.class_names or
            model.CLASS_NAMES)
        f1 = report.f1.get("source", 0.0)
        if f1 is None or not np.isfinite(f1):
            f1 = 0.0  # no predictions yet -> define F1 as 0
        fitness = 0.0
        if report.map is not None and np.isfinite(report.map.map50):
            # ultralytics' best.pt criterion (DetMetrics.fitness)
            fitness = 0.1 * report.map.map50 + 0.9 * report.map.map50_95
        logger.info("epoch %d val F1(source)=%.4f fitness=%.4f\n%s",
                    epoch, f1, fitness, report.summary())
        metric = fitness if args.gate_metric == "fitness" else f1
        if metric > best_metric:
            best_metric = metric
            trainer.best_metric = metric  # persisted into every ckpt
            trainer.save_checkpoint(args.checkpoint_dir, step=epoch,
                                    name="best")
        return metric

    for epoch in range(start_epoch, args.epochs):
        trainer.fit(augmented(epoch), epochs=1,
                    checkpoint_dir=None)
        if args.checkpoint_dir and args.checkpoint_every \
                and (epoch + 1) % args.checkpoint_every == 0:
            trainer.save_checkpoint(args.checkpoint_dir, step=epoch + 1)
        if (val_detector is not None and args.val_every
                and (epoch + 1) % args.val_every == 0
                and epoch + 1 < args.epochs):
            run_validation(epoch + 1)
    # precise-BN over a FULL augmented epoch, then the final validation
    # REUSES those stats (calibrate=False — an 8-batch recalibration here
    # would clobber the precise pass right before the 'last' checkpoint)
    trainer.calibrate_bn(
        imgs for imgs, *_ in augmented(args.epochs))
    if val_detector is not None:
        run_validation(args.epochs, calibrate=False)
    trainer.save_checkpoint(args.checkpoint_dir, step=args.epochs,
                            name="last")
    return 0


if __name__ == "__main__":
    sys.exit(main())
