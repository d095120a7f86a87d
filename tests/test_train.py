"""Training tests: CIoU/DFL math, task-aligned assigner, loss descent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caesar_yolo_tpu.models.yolo import build_model, init_params
from caesar_yolo_tpu.train import (
    TrainConfig,
    Trainer,
    bbox2dist,
    ciou,
    detection_loss,
    dfl_loss,
    task_aligned_assigner,
)


def test_ciou_identity_and_disjoint():
    b = jnp.asarray([10.0, 10.0, 50.0, 50.0])
    assert float(ciou(b, b)) == pytest.approx(1.0, abs=1e-5)
    far = jnp.asarray([100.0, 100.0, 140.0, 140.0])
    v = float(ciou(b, far))
    assert v < 0  # no overlap: IoU 0 minus center-distance penalty


def test_ciou_monotone_in_overlap():
    base = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    near = jnp.asarray([2.0, 2.0, 12.0, 12.0])
    far = jnp.asarray([6.0, 6.0, 16.0, 16.0])
    assert float(ciou(base, near)) > float(ciou(base, far))


def test_dfl_loss_minimized_at_target():
    # logits peaked exactly at integer target bins -> small loss
    target = jnp.asarray([[3.0, 5.0, 2.0, 7.0]])
    logits = jax.nn.one_hot(target.astype(jnp.int32), 16) * 20.0
    sharp = float(dfl_loss(logits, target).mean())
    flat = float(dfl_loss(jnp.zeros_like(logits), target).mean())
    assert sharp < 0.01 < flat


def test_bbox2dist_clamped():
    anchors = jnp.asarray([[8.0, 8.0]])
    bbox = jnp.asarray([[-100.0, -100.0, 100.0, 100.0]])
    d = np.asarray(bbox2dist(bbox, anchors))
    assert d.max() <= 15.0 and d.min() >= 0.0


def test_assigner_assigns_to_containing_gt():
    """Anchors inside a gt with a confident matching prediction are
    foreground; anchors far away are background."""
    A, NC, M = 16, 5, 2
    anchors = jnp.stack(jnp.meshgrid(
        jnp.arange(4) * 8.0 + 4, jnp.arange(4) * 8.0 + 4), -1).reshape(-1, 2)
    gt_bboxes = jnp.asarray([[[0.0, 0.0, 16.0, 16.0],
                              [0.0, 0.0, 0.0, 0.0]]])
    gt_labels = jnp.asarray([[2, 0]], jnp.int32)
    mask_gt = jnp.asarray([[True, False]])
    # predictions: every anchor predicts a box equal to the gt, class 2 hot
    pd_bboxes = jnp.broadcast_to(gt_bboxes[:, 0], (1, A, 4))
    pd_scores = jnp.full((1, A, NC), 0.01).at[:, :, 2].set(0.9)
    tl, tb, ts, fg = task_aligned_assigner(
        pd_scores, pd_bboxes, anchors, gt_labels, gt_bboxes, mask_gt)
    fg = np.asarray(fg[0])
    inside = np.asarray((anchors[:, 0] < 16) & (anchors[:, 1] < 16))
    assert (fg == inside).all()
    # assigned anchors carry the gt label and box
    assert (np.asarray(tl[0])[fg] == 2).all()
    np.testing.assert_allclose(np.asarray(tb[0])[fg],
                               [[0, 0, 16, 16]] * fg.sum())
    # target scores only on the gt class
    ts = np.asarray(ts[0])
    assert (ts[fg][:, 2] > 0).all()
    assert ts[:, [0, 1, 3, 4]].sum() == 0
    assert ts[~fg].sum() == 0


def test_assigner_no_gt_all_background():
    anchors = jnp.asarray([[4.0, 4.0], [12.0, 4.0]])
    pd_scores = jnp.full((1, 2, 5), 0.5)
    pd_bboxes = jnp.asarray([[[0, 0, 8, 8], [8, 0, 16, 8]]], jnp.float32)
    gt_bboxes = jnp.zeros((1, 3, 4))
    gt_labels = jnp.zeros((1, 3), jnp.int32)
    mask_gt = jnp.zeros((1, 3), bool)
    _, _, ts, fg = task_aligned_assigner(
        pd_scores, pd_bboxes, anchors, gt_labels, gt_bboxes, mask_gt)
    assert not np.asarray(fg).any()
    assert float(ts.sum()) == 0.0


@pytest.fixture(scope="module")
def tiny_setup():
    model = build_model("yolov8n", num_classes=5)
    params = init_params(model, seed=0)
    rng = np.random.default_rng(0)
    images = rng.random((2, 64, 64, 3), dtype=np.float32)
    gt_labels = np.asarray([[1, 2], [3, 0]], np.int32)
    gt_bboxes = np.asarray([[[8, 8, 40, 40], [20, 30, 60, 62]],
                            [[5, 5, 30, 25], [0, 0, 0, 0]]], np.float32)
    mask_gt = np.asarray([[True, True], [True, False]])
    return model, params, images, gt_labels, gt_bboxes, mask_gt


def test_detection_loss_finite_and_positive(tiny_setup):
    model, params, images, gl, gb, mg = tiny_setup
    raw = model(params, jnp.asarray(images))
    total, parts = detection_loss(raw, gl, gb, mg, img_size=64)
    assert np.isfinite(float(total)) and float(total) > 0
    for v in parts.values():
        assert np.isfinite(float(v))


def test_loss_gradients_finite(tiny_setup):
    model, params, images, gl, gb, mg = tiny_setup

    def f(p):
        raw = model(p, jnp.asarray(images))
        return detection_loss(raw, gl, gb, mg, img_size=64)[0]

    grads = jax.grad(f)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some gradient signal flows to the stem
    assert float(jnp.abs(grads["stem"]["w"]).max()) > 0


def test_loss_direct_optimization(tiny_setup):
    """Optimizing the RAW head tensors directly must drive the loss way
    down — the ground-truth property of the loss function itself (the
    trainer's early-step loss legitimately rises while TAL assignments
    activate, so end-to-end descent is not a stable unit test)."""
    model, params, images, gl, gb, mg = tiny_setup
    raw0 = model(params, jnp.asarray(images))
    raw0 = jax.tree_util.tree_map(jnp.asarray, raw0)

    def f(raw):
        return detection_loss(raw, gl, gb, mg, img_size=64)[0]

    import optax
    opt = optax.adam(0.1)
    opt_state = opt.init(raw0)

    @jax.jit
    def step(raw, opt_state):
        g = jax.grad(f)(raw)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(raw, updates), opt_state

    loss0 = float(f(raw0))
    raw = raw0
    for _ in range(100):
        raw, opt_state = step(raw, opt_state)
    loss1 = float(f(raw))
    assert loss1 < 0.5 * loss0


def test_trainer_step_updates_state(tiny_setup):
    model, params, images, gl, gb, mg = tiny_setup
    cfg = TrainConfig(epochs=1, batch_size=2, img_size=64, lr0=1e-3,
                      warmup_epochs=0.0)
    trainer = Trainer(model, params, cfg, steps_per_epoch=4)
    for _ in range(3):
        loss, parts = trainer.train_step(images, gl, gb, mg)
        assert np.isfinite(float(loss))
    assert int(trainer.state.step) == 3
    # params moved away from init; EMA trails them (ramped decay keeps it
    # very close to params at small step counts, so <=, not <)
    d_params = float(jnp.abs(trainer.state.params["stem"]["w"]
                             - params["stem"]["w"]).max())
    d_ema = float(jnp.abs(trainer.state.ema_params["stem"]["w"]
                          - params["stem"]["w"]).max())
    assert d_params > 0 and np.isfinite(d_ema) and d_ema <= d_params


def test_remat_forward_and_grads_match(tiny_setup):
    """Rematerialized training must be a pure memory/FLOP trade: the
    forward outputs and every gradient leaf match the plain formulation
    exactly (jax.checkpoint recomputes the same deterministic ops)."""
    model, params, images, gl, gb, mg = tiny_setup
    x = jnp.asarray(images)

    raw_plain = model(params, x)
    raw_remat = model(params, x, remat=True)
    for (b0, c0), (b1, c1) in zip(raw_plain, raw_remat):
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))

    from caesar_yolo_tpu.models import layers

    def f(p, remat):
        with layers.train_mode():
            raw = model(p, x, remat=remat)
        return detection_loss(raw, gl, gb, mg, img_size=64)[0]

    # under jit the two programs fuse differently (checkpoint is a
    # fusion boundary), so f32 reassociation drifts at the ulp scale —
    # the un-jitted forward comparison above is the bit-exactness check
    l0, g0 = jax.jit(jax.value_and_grad(lambda p: f(p, False)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(lambda p: f(p, True)))(params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-4)
    for leaf0, leaf1 in zip(jax.tree_util.tree_leaves(g0),
                            jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(leaf0), np.asarray(leaf1),
                                   rtol=1e-3, atol=1e-4)


def test_trainer_step_remat(tiny_setup):
    """The trainer wires cfg.remat through to the model: steps run and
    produce finite losses identical in kind to the plain path."""
    model, params, images, gl, gb, mg = tiny_setup
    cfg = TrainConfig(epochs=1, batch_size=2, img_size=64, lr0=1e-3,
                      warmup_epochs=0.0, remat=True,
                      compute_dtype="float32")
    trainer = Trainer(model, params, cfg, steps_per_epoch=4)
    loss, _ = trainer.train_step(images, gl, gb, mg)
    assert np.isfinite(float(loss))
    cfg0 = TrainConfig(epochs=1, batch_size=2, img_size=64, lr0=1e-3,
                       warmup_epochs=0.0, remat=False,
                       compute_dtype="float32")
    trainer0 = Trainer(model, params, cfg0, steps_per_epoch=4)
    loss0, _ = trainer0.train_step(images, gl, gb, mg)
    assert float(loss) == pytest.approx(float(loss0), rel=1e-4)


def test_trainer_checkpoint_roundtrip(tmp_path, tiny_setup):
    model, params, images, gl, gb, mg = tiny_setup
    cfg = TrainConfig(epochs=1, batch_size=2, img_size=64)
    trainer = Trainer(model, params, cfg, steps_per_epoch=1)
    trainer.train_step(images, gl, gb, mg)
    trainer.save_checkpoint(str(tmp_path), name="ck")
    restored = Trainer.load_checkpoint(str(tmp_path / "ck"))
    assert restored["step"] == 1
    orig = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    back = jax.tree_util.tree_leaves(restored["params"])
    assert all(np.allclose(a, b) for a, b in zip(orig, back))


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(jax.device_get(a))
    lb = jax.tree_util.tree_leaves(jax.device_get(b))
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(la, lb))


def test_trainer_resume_is_bit_exact(tmp_path, tiny_setup):
    """Interrupt-at-step-2 + restore must replay the exact uninterrupted
    trajectory: params, EMA, optimizer momentum, and the LR/momentum
    schedule position all come back (the ultralytics resume=True analog,
    reference macros/run_train.py:23).  Warmup epochs > 0 so the schedule
    position actually matters."""
    model, params, images, gl, gb, mg = tiny_setup
    cfg = TrainConfig(epochs=2, batch_size=2, img_size=64, lr0=1e-3,
                      warmup_epochs=1.0)

    straight = Trainer(model, params, cfg, steps_per_epoch=2)
    for _ in range(4):
        straight.train_step(images, gl, gb, mg)

    interrupted = Trainer(model, params, cfg, steps_per_epoch=2)
    for _ in range(2):
        interrupted.train_step(images, gl, gb, mg)
    interrupted.save_checkpoint(str(tmp_path), name="last")

    resumed = Trainer(model, params, cfg, steps_per_epoch=2)
    step = resumed.restore(str(tmp_path / "last"))
    assert step == 2
    # optimizer state restored exactly — momentum trace is the part a
    # params-only reload loses
    assert _tree_equal(resumed.state.opt_state, interrupted.state.opt_state)
    for _ in range(2):
        resumed.train_step(images, gl, gb, mg)
    assert int(resumed.state.step) == 4
    assert _tree_equal(resumed.state.params, straight.state.params)
    assert _tree_equal(resumed.state.ema_params, straight.state.ema_params)
    assert _tree_equal(resumed.state.opt_state, straight.state.opt_state)


def test_resume_checkpoint_resolution(tmp_path, tiny_setup):
    from caesar_yolo_tpu.cli.train import resolve_resume_checkpoint
    model, params, images, gl, gb, mg = tiny_setup
    cfg = TrainConfig(epochs=1, batch_size=2, img_size=64)
    trainer = Trainer(model, params, cfg, steps_per_epoch=1)
    trainer.train_step(images, gl, gb, mg)
    trainer.save_checkpoint(str(tmp_path), step=1)
    trainer.save_checkpoint(str(tmp_path), step=3)
    # no 'last' yet (interrupted run): highest step_N wins
    assert resolve_resume_checkpoint(str(tmp_path)).endswith("step_3")
    trainer.save_checkpoint(str(tmp_path), name="last")
    assert resolve_resume_checkpoint(str(tmp_path)).endswith("last")
    # a concrete checkpoint path passes through
    p = str(tmp_path / "step_1")
    assert resolve_resume_checkpoint(p) == p
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        resolve_resume_checkpoint(str(tmp_path / "nowhere"))


def test_resume_pre_optstate_checkpoint_warns_and_loads(tmp_path,
                                                        tiny_setup):
    """Checkpoints from before opt_state was saved still resume (fresh
    momentum), instead of failing the restore."""
    import orbax.checkpoint as ocp
    model, params, images, gl, gb, mg = tiny_setup
    cfg = TrainConfig(epochs=1, batch_size=2, img_size=64)
    trainer = Trainer(model, params, cfg, steps_per_epoch=1)
    trainer.train_step(images, gl, gb, mg)
    legacy = {"params": jax.device_get(trainer.state.params),
              "ema_params": jax.device_get(trainer.state.ema_params),
              "step": 5}
    ck = ocp.StandardCheckpointer()
    ck.save(str(tmp_path / "old"), legacy, force=True)
    ck.wait_until_finished()
    fresh = Trainer(model, params, cfg, steps_per_epoch=1)
    assert fresh.restore(str(tmp_path / "old")) == 5
    assert int(fresh.state.step) == 5
    assert _tree_equal(fresh.state.params, trainer.state.params)

def test_resume_prefers_newest_step_over_stale_last(tmp_path, tiny_setup):
    """A completed old run's 'last' must not shadow a newer interrupted
    run's step_N checkpoint: candidates are ranked by the optimizer step
    recorded in the .step sidecar (ADVICE r3: stale-'last' resume)."""
    from caesar_yolo_tpu.cli.train import resolve_resume_checkpoint
    model, params, images, gl, gb, mg = tiny_setup
    cfg = TrainConfig(epochs=1, batch_size=2, img_size=64)
    trainer = Trainer(model, params, cfg, steps_per_epoch=1)
    trainer.train_step(images, gl, gb, mg)
    trainer.save_checkpoint(str(tmp_path), name="last")     # opt step 1
    trainer.train_step(images, gl, gb, mg)
    trainer.train_step(images, gl, gb, mg)
    trainer.save_checkpoint(str(tmp_path), step=5)          # opt step 3
    assert resolve_resume_checkpoint(str(tmp_path)).endswith("step_5")
    # equal steps tie-break to 'last' (the completed-run convention)
    trainer.save_checkpoint(str(tmp_path), name="last")     # opt step 3
    assert resolve_resume_checkpoint(str(tmp_path)).endswith("last")


def test_best_metric_roundtrips_through_checkpoint(tmp_path, tiny_setup):
    """--resume restores the pre-interruption best validation metric so
    the first post-resume validation cannot overwrite a better 'best'
    snapshot (ADVICE r3 medium; ultralytics restores best_fitness)."""
    model, params, images, gl, gb, mg = tiny_setup
    cfg = TrainConfig(epochs=1, batch_size=2, img_size=64)
    trainer = Trainer(model, params, cfg, steps_per_epoch=1)
    trainer.train_step(images, gl, gb, mg)
    trainer.best_metric = 0.875
    trainer.save_checkpoint(str(tmp_path), name="last")
    fresh = Trainer(model, params, cfg, steps_per_epoch=1)
    assert fresh.best_metric == -1.0
    fresh.restore(str(tmp_path / "last"))
    assert fresh.best_metric == 0.875


def test_dataset_set_epoch_resumable_order(tmp_path):
    """Sample order is a pure function of (seed, epoch): a resumed run
    at epoch N sees the order the uninterrupted run saw, and different
    epochs see different orders (ADVICE r3: resume replayed epoch 0)."""
    from tests.test_aux import _make_dataset
    from caesar_yolo_tpu.train.dataset import DetectionDataset
    _make_dataset(tmp_path / "data")
    ds_a = DetectionDataset(str(tmp_path / "data/images"), img_size=64,
                            batch_size=2, max_gt=4, seed=0)
    ds_b = DetectionDataset(str(tmp_path / "data/images"), img_size=64,
                            batch_size=2, max_gt=4, seed=0)
    # ds_a burns epochs 0..4 first (the uninterrupted run); ds_b jumps
    # straight to epoch 5 (the resumed run)
    for e in range(5):
        ds_a.set_epoch(e)
        list(ds_a)
    ds_a.set_epoch(5)
    ds_b.set_epoch(5)
    a5 = [i for i, *_ in ds_a]
    b5 = [i for i, *_ in ds_b]
    assert all(np.array_equal(x, y) for x, y in zip(a5, b5))
    ds_b.set_epoch(6)
    b6 = [i for i, *_ in ds_b]
    assert not all(np.array_equal(x, y) for x, y in zip(a5, b6))
