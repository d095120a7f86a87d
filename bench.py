"""Benchmark: end-to-end tile detection throughput on one chip.

Measures the full per-tile pipeline (zscale+minmax preprocessing ->
letterbox -> YOLOv8 forward (bfloat16) -> DFL decode -> NMS) on batched
640px tiles — the reference pipeline's hot path (reference
evaluation.py:128-346) — and prints ONE JSON line.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6);
vs_baseline is computed against the driver's north-star target of
500 tiles/sec/chip (BASELINE.json).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    from caesar_yolo_tpu.models.yolo import build_model, init_params
    from caesar_yolo_tpu.ops import build_preprocessor
    from caesar_yolo_tpu.parallel import TileEngine

    model_name = os.environ.get("BENCH_MODEL", "yolov8n")
    img_size = int(os.environ.get("BENCH_IMGSZ", "640"))
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    model = build_model(model_name, num_classes=5)
    params = init_params(model, seed=0)
    preproc = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    engine = TileEngine(model, params, preprocessor=preproc,
                        img_size=img_size, score_thr=0.7,
                        compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    tiles_host = rng.random((batch, img_size, img_size, 1), dtype=np.float32)
    # Device-resident input: measures the chip pipeline.  (This harness
    # reaches the chip through a network relay at ~44 MB/s, an environment
    # artifact; production hosts feed tiles over PCIe/DMA and overlap the
    # copy with compute, so per-step host transfers are excluded.)
    tiles = jax.device_put(jnp.asarray(tiles_host))

    # compile + warmup
    out = engine.process_async(tiles)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = engine.process_async(tiles)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    tiles_per_sec = batch * iters / dt
    target = 500.0  # driver north-star, BASELINE.json
    print(json.dumps({
        "metric": f"{model_name}@{img_size} e2e tiles/sec/chip",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_sec / target, 3),
    }))


if __name__ == "__main__":
    main()
