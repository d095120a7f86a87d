"""Training loop: optax SGD + pjit data parallelism + orbax checkpoints.

Replaces the reference's delegation to ultralytics `model.train`
(reference macros/run_train.py:20-45, 4-GPU DDP) with an explicit JAX
train step: the batch axis is sharded over a 1D device mesh
(NamedSharding), parameters are replicated, and XLA inserts the gradient
all-reduce over ICI — the TPU-native equivalent of DDP.

Hyper-parameters follow the published ultralytics SGD recipe the
reference trains with: lr0=0.01 with linear decay to lr0*lrf,
momentum=0.937 (nesterov), weight_decay=5e-4 applied to conv/linear
weights only, 3 warmup epochs, EMA of parameters with ramped decay.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from caesar_yolo_tpu import logger
from caesar_yolo_tpu.models import layers
from caesar_yolo_tpu.models.yolo import YOLO
from caesar_yolo_tpu.parallel.mesh import batch_sharding, replicated_sharding
from caesar_yolo_tpu.train.loss import detection_loss


@dataclass(frozen=True)
class TrainConfig:
    """Training hyper-parameters (published defaults; epochs/batch/imgsz
    from the reference run, macros/run_train.py:20-45)."""
    epochs: int = 300
    batch_size: int = 16
    img_size: int = 640
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    grad_clip_norm: float = 10.0
    max_gt: int = 64
    # Mixed precision (the ultralytics recipe trains under AMP): model
    # compute in bf16 on the MXU, master params/grads/optimizer state and
    # all loss math in f32.  "float32" opts out (CPU tests, debugging).
    compute_dtype: str = "bfloat16"
    # Rematerialization: per-layer jax.checkpoint on the forward pass —
    # block-internal activations are recomputed in backward instead of
    # held in HBM.  Enables the reference's flagship recipe (yolov8l
    # @640 batch 16, macros/run_train.py:11,20-45) on a single chip at
    # the cost of one extra forward's FLOPs.
    remat: bool = False


def _is_decayed(path) -> bool:
    """Weight decay applies to conv/linear weights only (not BN/bias)."""
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    return keys[-1] == "w"


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """SGD(momentum, nesterov) + linear LR decay + warmup + selective
    weight decay."""
    total_steps = max(cfg.epochs * steps_per_epoch, 1)
    warmup_steps = max(int(cfg.warmup_epochs * steps_per_epoch), 1)

    def lr_fn(step):
        frac = jnp.clip(step / total_steps, 0.0, 1.0)
        base = cfg.lr0 * ((1.0 - frac) * (1.0 - cfg.lrf) + cfg.lrf)
        warm = cfg.lr0 * jnp.clip(step / warmup_steps, 0.0, 1.0)
        return jnp.where(step < warmup_steps, warm, base)

    def mom_fn(step):
        # momentum warmup (published recipe: 0.8 -> 0.937 over the
        # warmup epochs, alongside the LR ramp above)
        ramp = jnp.clip(step / warmup_steps, 0.0, 1.0)
        return (cfg.warmup_momentum
                + (cfg.momentum - cfg.warmup_momentum) * ramp)

    def wd_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _is_decayed(path), params)

    tx = optax.chain(
        # the published trainer clips at global-norm 10 before stepping
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask),
        # optax.sgd decomposed so momentum can be scheduled: sgd =
        # trace(momentum) then scale by -lr
        optax.inject_hyperparams(optax.trace)(decay=mom_fn, nesterov=True),
        optax.scale_by_learning_rate(lr_fn),
    )
    return tx, lr_fn


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["params", "opt_state", "ema_params", "step"],
    meta_fields=[])


class Trainer:
    """Data-parallel detection trainer over a device mesh."""

    def __init__(self, model: YOLO, params, cfg: TrainConfig, *,
                 mesh=None, steps_per_epoch: int = 100):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.tx, self.lr_fn = make_optimizer(cfg, steps_per_epoch)
        state = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            ema_params=params,
            step=jnp.zeros((), jnp.int32),
        )
        if mesh is not None:
            rsh = replicated_sharding(mesh)
            state = TrainState(
                params=jax.device_put(state.params, rsh),
                opt_state=jax.device_put(state.opt_state, rsh),
                ema_params=jax.device_put(state.ema_params, rsh),
                step=jax.device_put(state.step, rsh))
        self.state = state
        # Best validation metric seen so far; persisted in checkpoints so
        # a --resume run never lets a worse epoch overwrite 'best' (the
        # ultralytics resume path restores best_fitness the same way).
        self.best_metric = -1.0
        self._step_fn = self._build_step()

    def _build_step(self):
        cfg = self.cfg
        model = self.model

        compute_dtype = jnp.dtype(cfg.compute_dtype)

        def loss_fn(params, images, gt_labels, gt_bboxes, mask_gt):
            with layers.train_mode():
                raw = model(params, images.astype(compute_dtype),
                            remat=cfg.remat)
            total, parts = detection_loss(
                raw, gt_labels, gt_bboxes, mask_gt, img_size=cfg.img_size,
                box_gain=cfg.box_gain, cls_gain=cfg.cls_gain,
                dfl_gain=cfg.dfl_gain)
            return total, parts

        def step_fn(state: TrainState, images, gt_labels, gt_bboxes,
                    mask_gt):
            (loss, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, images, gt_labels,
                                       gt_bboxes, mask_gt)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            step = state.step + 1
            # EMA with ramped decay (d = decay * (1 - exp(-step/tau)))
            d = cfg.ema_decay * (1.0 - jnp.exp(-step / cfg.ema_tau))
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d),
                state.ema_params, params)
            new_state = TrainState(params, opt_state, ema, step)
            return new_state, loss, parts

        if self.mesh is not None:
            bsh = batch_sharding(self.mesh)
            rsh = replicated_sharding(self.mesh)
            return jax.jit(
                step_fn,
                in_shardings=(rsh, bsh, bsh, bsh, bsh),
                out_shardings=(rsh, rsh, rsh))
        return jax.jit(step_fn)

    def train_step(self, images, gt_labels, gt_bboxes, mask_gt):
        """One optimizer step.  images [B, S, S, C] float32 in [0,1];
        gt_labels [B, M] int32; gt_bboxes [B, M, 4] xyxy px;
        mask_gt [B, M] bool.  B must divide by the mesh size.

        Multi-process (jax.distributed + a global mesh): each process
        passes its LOCAL batch shard; the shards are assembled into
        global arrays over the mesh (the DDP delegation analog,
        reference macros/run_train.py:27 — gradients are averaged by
        XLA's psum instead of torch DDP buckets)."""
        if self.mesh is not None and jax.process_count() > 1:
            # assemble shards straight from the HOST arrays — routing
            # through jnp.asarray first would round-trip the whole
            # batch host->device->host->device every step
            bsh = batch_sharding(self.mesh)
            batch = tuple(
                jax.make_array_from_process_local_data(bsh, np.asarray(a))
                for a in (images, gt_labels, gt_bboxes, mask_gt))
        else:
            batch = (jnp.asarray(images), jnp.asarray(gt_labels),
                     jnp.asarray(gt_bboxes), jnp.asarray(mask_gt))
        self.state, loss, parts = self._step_fn(self.state, *batch)
        return loss, parts

    def fit(self, dataset, *, epochs=None, log_every: int = 50,
            checkpoint_dir: str | None = None, checkpoint_every: int = 0):
        """Run the loop over an iterable of
        (images, gt_labels, gt_bboxes, mask_gt) host batches per epoch."""
        epochs = epochs or self.cfg.epochs
        for epoch in range(epochs):
            losses = []
            for i, batch in enumerate(dataset):
                loss, parts = self.train_step(*batch)
                # keep the device scalar: float() here would block the
                # host on every step and kill load/compute overlap
                losses.append(loss)
                if log_every and i % log_every == 0:
                    logger.info(
                        "epoch %d step %d loss=%.4f box=%.3f cls=%.3f "
                        "dfl=%.3f", epoch, i, float(loss),
                        float(parts["box"]), float(parts["cls"]),
                        float(parts["dfl"]))
            logger.info(
                "epoch %d mean loss %.4f", epoch,
                float(np.mean([float(l) for l in losses]))
                if losses else float("nan"))
            if checkpoint_dir and checkpoint_every and \
                    (epoch + 1) % checkpoint_every == 0:
                self.save_checkpoint(checkpoint_dir, step=epoch + 1)
        if checkpoint_dir:
            self.save_checkpoint(checkpoint_dir, step=epochs, name="last")

    # -- BatchNorm calibration -------------------------------------------------

    def calibrate_bn(self, batches) -> None:
        """Re-estimate BatchNorm running statistics ("precise BN").

        Training normalizes with per-batch statistics (torch semantics);
        instead of threading running-average state through the jitted
        step, run `batches` (iterable of image arrays) through the model
        in train mode, average the collected per-layer batch stats, and
        write them into params AND ema_params.  Call once after training,
        before inference/checkpointing.
        """
        model = self.model

        def _walk_paths(node, path, out):
            if isinstance(node, dict):
                if {"gamma", "beta", "mean", "var"} <= set(node):
                    out[path] = node
                for k, v in node.items():
                    _walk_paths(v, f"{path}/{k}", out)
            elif isinstance(node, list):
                for i, v in enumerate(node):
                    _walk_paths(v, f"{path}/{i}", out)

        @jax.jit
        def collect(params, images):
            stats: dict = {}
            with layers.train_mode(stats):
                model(params, images)
            by_id = {}
            _walk_paths(params, "", by_id)
            return {path: stats[id(bn)] for path, bn in by_id.items()
                    if id(bn) in stats}

        sums: dict = {}
        n = 0
        for images in batches:
            out = jax.device_get(collect(self.state.params,
                                         jnp.asarray(images)))
            for path, (mean, var) in out.items():
                if path in sums:
                    sums[path][0] += mean
                    sums[path][1] += var
                else:
                    sums[path] = [np.asarray(mean, np.float64),
                                  np.asarray(var, np.float64)]
            n += 1
        if n == 0:
            return
        for params in (self.state.params, self.state.ema_params):
            by_path: dict = {}
            _walk_paths(params, "", by_path)
            for path, (mean, var) in sums.items():
                bn = by_path[path]
                bn["mean"] = jnp.asarray(mean / n, jnp.float32)
                bn["var"] = jnp.asarray(var / n, jnp.float32)
        logger.info("Calibrated BatchNorm stats over %d batches (%d layers)",
                    n, len(sums))

    # -- checkpointing (orbax) ------------------------------------------------

    def save_checkpoint(self, directory: str, step: int = 0,
                        name: str | None = None):
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(directory, name or f"step_{step}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {
            "params": jax.device_get(self.state.params),
            "ema_params": jax.device_get(self.state.ema_params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(self.state.step),
            "best_metric": float(self.best_metric),
        }, force=True)
        ckptr.wait_until_finished()
        # Sidecar with the optimizer step, written NEXT to the orbax dir
        # (not inside it) so resume resolution can rank 'last' vs step_N
        # checkpoints without a full restore.
        try:
            with open(path + ".step", "w") as f:
                f.write(f"{int(self.state.step)}\n")
        except OSError:
            pass
        logger.info("Saved checkpoint %s", path)

    @staticmethod
    def load_checkpoint(directory_or_path: str):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(directory_or_path))

    def restore(self, directory_or_path: str) -> int:
        """Resume training from a save_checkpoint directory: params, EMA,
        optimizer state (momentum trace + schedule counters), and the step
        counter — the LR/momentum schedules key off state.step, so the
        schedule position resumes exactly (the reference's ultralytics
        resume=True analog, macros/run_train.py:23).  Checkpoints written
        before opt_state was saved resume with fresh momentum and a
        warning.  Returns the restored step."""
        import orbax.checkpoint as ocp
        path = os.path.abspath(directory_or_path)
        ckptr = ocp.StandardCheckpointer()
        plain = ckptr.restore(path)
        has_opt = "opt_state" in plain
        best_metric = float(plain.get("best_metric", -1.0))
        template = {
            "params": self.state.params,
            "ema_params": self.state.ema_params,
            "step": 0,
        }
        if "best_metric" in plain:
            template["best_metric"] = 0.0
        if has_opt:
            # second restore against the live-state template so orbax
            # reconstructs the exact optax namedtuple structure (a plain
            # restore returns generic dicts whose flatten order need not
            # match the namedtuple field order)
            template["opt_state"] = self.state.opt_state
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                               jnp.result_type(x)),
                template)
            plain = ckptr.restore(path, abstract)
        else:
            logger.warning(
                "Checkpoint %s has no optimizer state (pre-resume format); "
                "resuming with fresh momentum", path)
        state = TrainState(
            params=plain["params"],
            opt_state=plain["opt_state"] if has_opt
            else self.tx.init(plain["params"]),
            ema_params=plain.get("ema_params", plain["params"]),
            step=jnp.asarray(int(plain["step"]), jnp.int32),
        )
        if self.mesh is not None:
            rsh = replicated_sharding(self.mesh)
            state = TrainState(
                params=jax.device_put(state.params, rsh),
                opt_state=jax.device_put(state.opt_state, rsh),
                ema_params=jax.device_put(state.ema_params, rsh),
                step=jax.device_put(state.step, rsh))
        self.state = state
        self.best_metric = best_metric
        logger.info("Resumed from %s at step %d (best_metric=%.4f)",
                    path, int(plain["step"]), best_metric)
        return int(plain["step"])
