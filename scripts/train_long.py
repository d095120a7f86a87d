"""Long-run augmented training: the full reference recipe for >=10k
steps, with the C/R/F1 trajectory recorded and the best-F1 checkpoint
gated.

The reference trains 300 epochs with rotation-heavy augmentation
(reference macros/run_train.py:20-45, imgaug Affine rotate(-180..180) +
flips + scale 0.5..1.8) delegating schedule/EMA/checkpoints to
ultralytics.  This harness proves the SAME recipe is stable over a long
run on this framework: device-synthesized tiles -> device-side
augmentation (rot90+shear resampler, train/augment.py) -> bf16 train
step (TAL/CIoU/DFL + SGD momentum + warmup-cosine LR + EMA), validation
every VAL_EVERY steps with precise-BN calibration on EMA weights,
best-F1 orbax checkpoint (the best.pt/last.pt convention), trajectory
appended to train_long_trajectory.jsonl.

Usage: python scripts/train_long.py [steps=10000] [imgsz=96]
                                    [val_every=1000] [ckpt_dir]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_synth_demo import make_tile_fn  # noqa: E402  (same dir)


def main():
    import jax
    import jax.numpy as jnp
    from caesar_yolo_tpu.detect import Predictor, merge_detections
    from caesar_yolo_tpu.evaluation.metrics import compute_metrics
    from caesar_yolo_tpu.models.yolo import build_model, init_params
    from caesar_yolo_tpu.train import TrainConfig, Trainer
    from caesar_yolo_tpu.train.augment import augment_batch

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    val_every = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else os.path.abspath(
        "train_long_ckpt")
    batch = 16
    traj_path = "train_long_trajectory.jsonl"

    model = build_model("yolov8n", num_classes=5)
    params = init_params(model, seed=0)
    cfg = TrainConfig(epochs=1, batch_size=batch, img_size=size,
                      lr0=0.01, lrf=0.05, warmup_epochs=0.02, max_gt=3)
    trainer = Trainer(model, params, cfg, steps_per_epoch=steps)
    make = make_tile_fn(size)
    names = ["spurious", "compact", "extended", "extended-multisland",
             "flagged"]

    val_pred = None

    def run_val(step):
        nonlocal val_pred
        ckey = jax.random.PRNGKey(4242)
        cal = []
        for _ in range(8):
            ckey, sub = jax.random.split(ckey)
            cal.append(make(sub, batch)[0])
        trainer.calibrate_bn(cal)
        ema = jax.device_get(trainer.state.ema_params)
        if val_pred is None:
            val_pred = Predictor(model, ema, img_size=size, score_thr=0.25,
                                 iou_thr=0.5, compute_dtype=jnp.float32)
        else:
            val_pred.update_params(ema)
        vimgs, vlabels, vboxes, vmask = (
            np.asarray(v) for v in make(jax.random.PRNGKey(777), 64))
        gl, pl_ = [], []
        for i in range(len(vimgs)):
            gl.append({"bboxes": vboxes[i][vmask[i]],
                       "labels": ["compact"] * int(vmask[i].sum())})
            b, s, c = val_pred.predict_image(vimgs[i])
            b, s, c = merge_detections(b, s, c)
            pl_.append({"bboxes": b, "labels": [names[int(k)] for k in c],
                        "scores": s})
        rep = compute_metrics(gl, pl_, iou_thr=0.5)
        cc = rep.completeness["compact"].ratio
        rr = rep.reliability["compact"].ratio
        f1 = rep.f1.get("compact", 0.0) or 0.0
        if not np.isfinite(f1):
            f1 = 0.0
        return float(cc), float(rr), float(f1)

    # one jitted program: synthesize -> augment -> step (the BENCH_AUG=1
    # pipeline)
    labels_const = jnp.ones((batch, 3), jnp.int32)

    def one_step(key):
        key, k1, k2 = jax.random.split(key, 3)
        imgs, _labels, boxes, mask = make(k1, batch)
        ai, ab, am = augment_batch(k2, imgs, boxes, mask)
        loss, parts = trainer.train_step(ai, labels_const, ab, am)
        return key, loss, parts

    best_f1, best_step = -1.0, -1
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    traj = open(traj_path, "a")
    for step in range(steps):
        key, loss, parts = one_step(key)
        if step % 250 == 0 or step == steps - 1:
            print(f"step {step}: loss={float(loss):.3f} "
                  f"box={float(parts['box']):.3f} "
                  f"cls={float(parts['cls']):.3f} "
                  f"dfl={float(parts['dfl']):.3f} "
                  f"({batch * (step + 1) / (time.time() - t0):.0f} imgs/s)",
                  flush=True)
        if (step + 1) % val_every == 0 or step + 1 == steps:
            c, r, f1 = run_val(step + 1)
            rec = {"step": step + 1, "loss": float(loss),
                   "completeness": round(c, 4), "reliability": round(r, 4),
                   "f1": round(f1, 4),
                   "imgs_per_s": round(batch * (step + 1)
                                       / (time.time() - t0), 1)}
            traj.write(json.dumps(rec) + "\n")
            traj.flush()
            print("VAL", json.dumps(rec), flush=True)
            if f1 > best_f1:
                best_f1, best_step = f1, step + 1
                trainer.save_checkpoint(ckpt_dir, step=step + 1,
                                        name="best")
    trainer.save_checkpoint(ckpt_dir, step=steps, name="last")
    traj.close()
    dt = time.time() - t0
    print(f"RESULT steps={steps} time={dt:.0f}s "
          f"imgs_per_s={batch * steps / dt:.0f} "
          f"best_f1={best_f1:.3f}@{best_step} ckpt={ckpt_dir}")
    return 0 if best_f1 > 0.8 else 1


if __name__ == "__main__":
    sys.exit(main())
