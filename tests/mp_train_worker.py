"""Standalone worker for the 2-process TRAINING distribution test (NOT a
pytest module — launched via subprocess by test_multiprocess.py).

The DDP analog of the reference's torch distributed training delegation
(reference macros/run_train.py:27): N jax.distributed CPU processes form
one global mesh, each feeds its LOCAL batch shard to Trainer.train_step,
and XLA's psum averages the gradients.  The worker writes per-rank
losses + parameter digests so the test can assert (a) both ranks hold
identical replicated state and (b) the 2-process run matches the
single-process run on the same global batch.

Usage: python mp_train_worker.py PID NPROC PORT WORKDIR NSTEPS
(NPROC=1 runs the single-process reference on a 2-device local mesh, so
per-device shards and collective schedules are identical by design.)
"""

import hashlib
import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, workdir, nsteps = sys.argv[3], sys.argv[4], int(sys.argv[5])

    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from caesar_yolo_tpu.models.yolo import build_model, init_params
    from caesar_yolo_tpu.parallel.mesh import make_mesh
    from caesar_yolo_tpu.train import TrainConfig, Trainer

    assert len(jax.devices()) == 2  # global mesh size fixed at 2

    model = build_model("yolov8n", num_classes=5)
    params = init_params(model, seed=0)
    cfg = TrainConfig(epochs=1, batch_size=4, img_size=64, max_gt=2,
                      warmup_epochs=0.0, compute_dtype="float32")
    trainer = Trainer(model, params, cfg, mesh=make_mesh(),
                      steps_per_epoch=nsteps)

    # deterministic GLOBAL batch, identical in every process
    rng = np.random.default_rng(0)
    imgs = rng.random((4, 64, 64, 3)).astype(np.float32)
    labels = np.ones((4, 2), np.int32)
    gt = np.tile(np.asarray([[10.0, 10.0, 40.0, 40.0],
                             [20.0, 30.0, 50.0, 60.0]], np.float32),
                 (4, 1, 1))
    mask = np.ones((4, 2), bool)

    # each process feeds its local shard (the full batch when nproc=1)
    lo, hi = (0, 4) if nproc == 1 else (pid * 2, pid * 2 + 2)
    losses = []
    for _ in range(nsteps):
        loss, _parts = trainer.train_step(
            imgs[lo:hi], labels[lo:hi], gt[lo:hi], mask[lo:hi])
        losses.append(float(np.asarray(jax.device_get(loss))))

    def digest(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        h = hashlib.sha256()
        sums = []
        for lf in leaves:
            arr = np.asarray(jax.device_get(lf))
            h.update(arr.tobytes())
            sums.append(float(np.float64(arr).sum()))
        return h.hexdigest(), sums

    phash, psums = digest(trainer.state.params)
    ehash, esums = digest(trainer.state.ema_params)
    out = {"pid": pid, "losses": losses, "params_hash": phash,
           "ema_hash": ehash, "param_sums": psums, "ema_sums": esums,
           "step": int(np.asarray(jax.device_get(trainer.state.step)))}
    with open(os.path.join(workdir, f"train_rank{pid}_n{nproc}.json"),
              "w") as f:
        json.dump(out, f, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
