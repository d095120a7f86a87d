"""Remat memory/throughput probe: the reference's flagship training
recipe (yolov8l @640 batch 16, reference macros/run_train.py:11,20-45)
on ONE chip, with and without per-layer rematerialization.

For each variant, prints XLA's compiled memory analysis (temp allocation
= live activation footprint) and the measured step rate.  Usage:

    python scripts/probe_remat.py [model] [imgsz] [batch]

Env: PROBE_REMAT_ONLY=1 skips the plain variant (for when it OOMs).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from caesar_yolo_tpu.models.yolo import build_model, init_params  # noqa: E402
from caesar_yolo_tpu.train import TrainConfig, Trainer  # noqa: E402


def probe(model_name: str, img_size: int, batch: int, remat: bool,
          iters: int = 10):
    model = build_model(model_name, num_classes=5)
    params = init_params(model, seed=0)
    cfg = TrainConfig(epochs=1, batch_size=batch, img_size=img_size,
                      max_gt=4, warmup_epochs=0.0, remat=remat)
    trainer = Trainer(model, params, cfg, steps_per_epoch=iters)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, img_size, img_size, 3),
                                  dtype=np.float32))
    labels = jnp.ones((batch, 4), jnp.int32)
    c = img_size / 2.0
    gt = jnp.tile(jnp.asarray([[c - 40, c - 40, c + 40, c + 40],
                               [60.0, 60.0, 140.0, 140.0],
                               [0.0, 0.0, 0.0, 0.0],
                               [0.0, 0.0, 0.0, 0.0]], jnp.float32),
                  (batch, 1, 1))
    mask = jnp.tile(jnp.asarray([True, True, False, False]), (batch, 1))

    tag = f"{model_name}@{img_size} B={batch} remat={remat}"
    lowered = trainer._step_fn.lower(trainer.state, imgs, labels, gt, mask)
    compiled = lowered.compile()
    try:
        ma = compiled.memory_analysis()
        print(f"[{tag}] temp={ma.temp_size_in_bytes / 2**30:.2f} GiB "
              f"args={ma.argument_size_in_bytes / 2**30:.2f} GiB "
              f"out={ma.output_size_in_bytes / 2**30:.2f} GiB "
              f"gen={getattr(ma, 'generated_code_size_in_bytes', 0) / 2**20:.1f} MiB")
    except Exception as e:  # noqa: BLE001 - backend-dependent API
        print(f"[{tag}] memory_analysis unavailable: {e}")

    # run through the trainer so state updates in place
    loss, _ = trainer.train_step(imgs, labels, gt, mask)
    _ = float(np.asarray(loss))
    t0 = time.perf_counter()
    for _i in range(iters):
        loss, _ = trainer.train_step(imgs, labels, gt, mask)
    _ = float(np.asarray(loss))
    dt = time.perf_counter() - t0
    print(f"[{tag}] {batch * iters / dt:.1f} imgs/s "
          f"({dt / iters * 1e3:.1f} ms/step), loss={float(loss):.3f}")


if __name__ == "__main__":
    model_name = sys.argv[1] if len(sys.argv) > 1 else "yolov8l"
    img_size = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    print("devices:", jax.devices())
    probe(model_name, img_size, batch, remat=True)
    if os.environ.get("PROBE_REMAT_ONLY") != "1":
        probe(model_name, img_size, batch, remat=False)
