"""Five-class quality benchmark: train yolov8n@640 from scratch on the
synthetic 5-morphology task and publish the per-class C/R/F1 table.

This is the offline analog of the reference's headline quality artifact
(reference README.md:190-207: per-class F1 over compact / extended /
extended-multisland / spurious / flagged, trained 300 epochs at
imgsz=640 on 132px cutouts, macros/run_train.py) — the real Riggi+2023
dataset is unavailable here, so ground truth comes from
utils/synth5.py's exactly-known morphology renderer instead.

It is also the first end-to-end exercise of the class-dependent
detection machinery on a TRAINED multi-class model: class-aware NMS
offsets, the same-class soft-merge rule (detect/merge.py vs reference
inference.py:650-658), and the real/spurious/flagged counting rules
(evaluation/metrics.py vs make_prediction.py:328-547).

Pipeline (all device-side, one jitted program per step):
  synthesize 132px 5-class cutouts -> bilinear resize to imgsz (the
  reference letterboxes its 132px cutouts up to 640 the same way) ->
  full augmentation recipe (rot 180 / flip 0.5 / scale 0.89) -> bf16
  train step (TAL/CIoU/DFL + SGD momentum + warmup-cosine + EMA).

Validation every ``val_every`` steps (precise-BN on EMA weights,
Predictor at imgsz on raw 132px cutouts, merge, per-class metrics);
best checkpoint gated on macro-F1 over the five classes.  Final
held-out evaluation (n_eval images) writes QUALITY_r05.json.

Usage: python scripts/train_quality5.py [steps=12000] [imgsz=640]
           [val_every=1000] [out=QUALITY_r05.json] [ckpt_dir]
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 16
MAX_SRC = 4
NATIVE = 132
EVAL_SCORE_THR = 0.25
EVAL_IOU_MATCH = 0.6  # reference make_prediction.py iou_thr


def main():
    import jax
    import jax.numpy as jnp
    from caesar_yolo_tpu.detect import Predictor, merge_detections
    from caesar_yolo_tpu.evaluation.metrics import (compute_map,
                                                    compute_metrics)
    from caesar_yolo_tpu.models.yolo import build_model, init_params
    from caesar_yolo_tpu.train import TrainConfig, Trainer
    from caesar_yolo_tpu.train.augment import augment_batch
    from caesar_yolo_tpu.utils.synth5 import (CLASS_NAMES,
                                              make_multiclass_tile_fn)

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    imgsz = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    val_every = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    out_path = sys.argv[4] if len(sys.argv) > 4 else "QUALITY_r05.json"
    ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else os.path.abspath(
        "train_quality5_ckpt")
    n_eval = int(os.environ.get("QUALITY5_NEVAL", "512"))
    traj_path = os.path.splitext(out_path)[0] + "_trajectory.jsonl"

    model = build_model("yolov8n", num_classes=5)
    params = init_params(model, seed=0)
    cfg = TrainConfig(epochs=1, batch_size=BATCH, img_size=imgsz,
                      lr0=0.01, lrf=0.05, warmup_epochs=0.02,
                      max_gt=MAX_SRC)
    trainer = Trainer(model, params, cfg, steps_per_epoch=steps)
    make132 = make_multiclass_tile_fn(NATIVE, max_src=MAX_SRC)
    scale = imgsz / float(NATIVE)

    @partial(jax.jit, static_argnames=("batch",))
    def make_train_inputs(key, batch):
        """132px synth -> resize to imgsz -> reference augmentation."""
        k1, k2 = jax.random.split(key)
        imgs, labels, boxes, mask = make132(k1, batch)
        imgs = jax.image.resize(imgs, (batch, imgsz, imgsz, 3),
                                "bilinear")
        boxes = boxes * scale
        ai, ab, am = augment_batch(k2, imgs, boxes, mask)
        return ai, labels, ab, am

    @partial(jax.jit, static_argnames=("batch",))
    def make_cal_inputs(key, batch):
        imgs = make132(key, batch)[0]
        return jax.image.resize(imgs, (batch, imgsz, imgsz, 3),
                                "bilinear")

    # held-out eval stream: a key range the training stream (fold 0..steps
    # of seed 0) never draws
    def eval_batches(n_imgs, seed0=10_000_000):
        done = 0
        while done < n_imgs:
            b = min(64, n_imgs - done)
            out = make132(jax.random.PRNGKey(seed0 + done), b)
            yield tuple(np.asarray(v) for v in out)
            done += b

    val_pred = None

    def evaluate(n_imgs, score_thr=EVAL_SCORE_THR, seed0=10_000_000):
        nonlocal val_pred
        cal = [make_cal_inputs(jax.random.PRNGKey(4242 + i), BATCH)
               for i in range(8)]
        trainer.calibrate_bn(cal)
        ema = jax.device_get(trainer.state.ema_params)
        if val_pred is None:
            val_pred = Predictor(model, ema, img_size=imgsz,
                                 score_thr=score_thr, iou_thr=0.5,
                                 compute_dtype=jnp.bfloat16)
        else:
            val_pred.update_params(ema)
        gl, pl = [], []
        for imgs, labels, boxes, mask in eval_batches(n_imgs, seed0=seed0):
            # batched prediction (one device program per 64-cutout batch;
            # per-image predict_image would pay the host relay per image)
            bb, ss, cc, vv, _nd = (np.asarray(v) for v in
                                   val_pred.predict_batch(imgs))
            for i in range(len(imgs)):
                sel = mask[i]
                gl.append({"bboxes": boxes[i][sel],
                           "labels": [CLASS_NAMES[int(k)]
                                      for k in labels[i][sel]]})
                v = vv[i]
                b, s, c = merge_detections(bb[i][v], ss[i][v], cc[i][v])
                pl.append({"bboxes": b, "scores": s,
                           "labels": [CLASS_NAMES[int(k)] for k in c]})
        rep = compute_metrics(gl, pl, iou_thr=EVAL_IOU_MATCH)
        return rep, gl, pl

    def class_table(rep):
        table = {}
        for name in CLASS_NAMES:
            c = rep.completeness.get(name)
            r = rep.reliability.get(name)
            f = rep.f1.get(name)
            table[name] = {
                "C": round(c.ratio, 4) if c and c.n else None,
                "R": round(r.ratio, 4) if r and r.n else None,
                "F1": round(f, 4) if f is not None and np.isfinite(f)
                      else None,
                "n_gt": c.n if c else 0,
            }
        src = rep.completeness.get("source")
        table["source_cumulative"] = {
            "C": round(src.ratio, 4) if src and src.n else None,
            "R": round(rep.reliability["source"].ratio, 4)
                 if rep.reliability.get("source") else None,
            "F1": round(rep.f1.get("source", float("nan")), 4)
                  if np.isfinite(rep.f1.get("source", float("nan")))
                  else None,
            "n_gt": src.n if src else 0,
        }
        return table

    def macro_f1(table):
        vals = [v["F1"] for k, v in table.items()
                if k in CLASS_NAMES and v["F1"] is not None]
        return float(np.mean(vals)) if vals else 0.0

    best_f1, best_step = -1.0, -1
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    traj = open(traj_path, "a")
    for step in range(steps):
        key, sub = jax.random.split(key)
        ai, labels, ab, am = make_train_inputs(sub, BATCH)
        loss, parts = trainer.train_step(ai, labels, ab, am)
        if step % 250 == 0 or step == steps - 1:
            print(f"step {step}: loss={float(loss):.3f} "
                  f"box={float(parts['box']):.3f} "
                  f"cls={float(parts['cls']):.3f} "
                  f"dfl={float(parts['dfl']):.3f} "
                  f"({BATCH * (step + 1) / (time.time() - t0):.0f} imgs/s)",
                  flush=True)
        if (step + 1) % val_every == 0 or step + 1 == steps:
            # val stream disjoint from the final held-out eval stream
            # (checkpoint gating must not select on the test set)
            rep, _, _ = evaluate(128, seed0=20_000_000)
            table = class_table(rep)
            mf1 = macro_f1(table)
            rec = {"step": step + 1, "loss": float(loss),
                   "macro_f1": round(mf1, 4), "classes": table,
                   "imgs_per_s": round(BATCH * (step + 1)
                                       / (time.time() - t0), 1)}
            traj.write(json.dumps(rec) + "\n")
            traj.flush()
            print("VAL", json.dumps(rec), flush=True)
            if mf1 > best_f1:
                best_f1, best_step = mf1, step + 1
                trainer.save_checkpoint(ckpt_dir, step=step + 1,
                                        name="best")
    trainer.save_checkpoint(ckpt_dir, step=steps, name="last")
    traj.close()
    train_time = time.time() - t0

    # restore the gated best for the final held-out evaluation (the
    # best.pt convention, reference macros/run_train.py)
    if best_step > 0 and best_step != steps:
        trainer.restore(os.path.join(ckpt_dir, "best"))
    rep, gl, pl = evaluate(n_eval)
    table = class_table(rep)
    mrep = compute_map(gl, pl)
    result = {
        "task": "synthetic 5-class radio morphologies "
                "(utils/synth5.py; offline analog of the Riggi+2023 "
                "dataset, reference README.md:190-207)",
        "model": "yolov8n", "imgsz": imgsz, "native_cutout": NATIVE,
        "steps": steps, "batch": BATCH,
        "recipe": "rot180/flip0.5/scale0.89 device augmentation, bf16 "
                  "step, SGD momentum warmup-cosine, EMA, precise-BN",
        "score_thr": EVAL_SCORE_THR, "iou_match": EVAL_IOU_MATCH,
        "n_eval_images": n_eval,
        "per_class": table,
        "macro_f1": round(macro_f1(table), 4),
        "map50": round(float(mrep.map50), 4),
        "map50_95": round(float(mrep.map50_95), 4),
        "best_val_step": best_step,
        "train_time_s": round(train_time, 1),
        "train_imgs_per_s": round(BATCH * steps / train_time, 1),
        "backend": jax.devices()[0].platform,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print("QUALITY", json.dumps(result), flush=True)
    ok = (macro_f1(table) > 0.5
          and all(table[n]["F1"] is not None and table[n]["F1"] > 0.2
                  for n in CLASS_NAMES))
    print(f"RESULT macro_f1={macro_f1(table):.3f} best@{best_step} "
          f"{'PASS' if ok else 'BELOW-GATE'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
