"""The batched tile-detection engine: ONE jitted XLA program per tile
shape covering preprocess -> letterbox -> YOLO forward -> decode -> NMS,
sharded over the device mesh.

This replaces the reference's per-tile chain of numpy preprocessing +
torch dispatch + ultralytics NMS (reference inference.py:173-275 ->
evaluation.py:128-346): tiles are batched to keep the MXU fed, the
preprocessing stages fuse into the same program (no host round-trip),
and the batch axis is sharded over all chips via NamedSharding (data
parallelism over tiles, the reference's core strategy — SURVEY §2.3).

Per-tile validity (`tile_ok`) reproduces the reference's no-prediction
paths in-graph: preprocessing validity flags plus the degenerate
channel guard (min==max), vectorized over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from caesar_yolo_tpu.detect.letterbox import letterbox_batch, unletterbox_boxes
from caesar_yolo_tpu.detect.nms import DEFAULT_PRE_NMS, nms_batch
from caesar_yolo_tpu.detect.predictor import _fuse_head
from caesar_yolo_tpu.models.layers import fuse_tree
from caesar_yolo_tpu.models.yolo import YOLO, decode_dfl
from caesar_yolo_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
)


def make_tile_step(model: YOLO, *, preprocessor=None, img_size: int = 640,
                   score_thr: float = 0.25, iou_thr: float = 0.5,
                   max_det: int = 300, pre_nms: int = DEFAULT_PRE_NMS,
                   compute_dtype=jnp.bfloat16):
    """The per-tile detection step shared by TileEngine and the serving
    export (deploy.build_serving_step): step(params, tiles[B, H, W, C])
    -> (boxes in tile coords, scores, cls, valid, tile_ok, n_dropped).

    Gray tiles replicate to the model's channel count BEFORE
    preprocessing (reference evaluation.py:146-154); batch preprocessing
    goes through Pipeline.apply_batch — pure-XLA stages fuse into the
    program (measured faster than the hand-fused whole-chain Pallas
    kernel, see ops/transforms.py Pipeline), while stages with native
    Pallas batch kernels (hist-eq/CLAHE/sigma-clip) take them (their
    vmapped XLA histograms hang real TPUs); the degenerate-channel
    guard reproduces reference evaluation.py:168-176 (fixed to index
    channels).
    """
    nchan = model.in_channels
    S = img_size

    def prep_batch(tiles):
        x = tiles.astype(jnp.float32)
        if x.shape[-1] == 1 and nchan > 1:
            x = jnp.repeat(x, nchan, axis=-1)
        if preprocessor is not None:
            # apply_batch, NOT vmap(apply): stages with a native batch
            # implementation (hist-eq/CLAHE/sigma-clip Pallas kernels)
            # must take it — the vmapped XLA lowering of their
            # histograms is the formulation that hangs real TPUs
            # (ops/pallas_histeq.py)
            imgs, ok = preprocessor.apply_batch(x)
        else:
            imgs, ok = x, jnp.ones((x.shape[0],), bool)
        if imgs.shape[-1] == 1 and nchan > 1:
            imgs = jnp.repeat(imgs, nchan, axis=-1)
        cmin = jnp.min(imgs, axis=(1, 2))
        cmax = jnp.max(imgs, axis=(1, 2))
        ok = ok & jnp.all(cmax > cmin, axis=-1)
        return imgs, ok

    def step(params, tiles):
        h, w = tiles.shape[1], tiles.shape[2]
        imgs, tile_ok = prep_batch(tiles)
        x = letterbox_batch(imgs, S).astype(compute_dtype)
        raw = model(params, x)
        boxes, scores = decode_dfl(raw, S)
        bsel, ssel, csel, vsel, ndrop = nms_batch(
            boxes, scores, conf_thr=score_thr, iou_thr=iou_thr,
            max_det=max_det, pre_nms=pre_nms)
        bsel = unletterbox_boxes(bsel, h, w, S)
        vsel = vsel & tile_ok[:, None]
        return bsel, ssel, csel, vsel, tile_ok, ndrop

    return step


def fuse_model_params(model: YOLO, params):
    """Fold BatchNorm into conv weights across the whole model."""
    layer_map = {spec.name: spec.module for spec in model.layers}
    out = {}
    for name, sub in params.items():
        out[name] = (_fuse_head(model.head, sub) if name == "head"
                     else fuse_tree(layer_map[name], sub))
    return out


class TileEngine:
    """Compiled, mesh-sharded batch detector for fixed-size tiles.

    process(tiles[B, H, W, C]) -> host numpy
      (boxes[B, MAXDET, 4] xyxy in TILE coords, scores[B, MAXDET],
       class_ids[B, MAXDET], valid[B, MAXDET], tile_ok[B], n_dropped[B]).
    n_dropped counts above-threshold candidates truncated by the pre_nms
    window (callers must log nonzero counts — no silent caps).

    B must be a multiple of the mesh size (callers pad; see SFinder).
    """

    def __init__(self, model: YOLO, params, *, preprocessor=None,
                 mesh=None, img_size: int = 640, score_thr: float = 0.7,
                 iou_thr: float = 0.5, max_det: int = 300,
                 pre_nms: int = DEFAULT_PRE_NMS, compute_dtype=jnp.bfloat16,
                 fuse: bool = True, relay_dtype: str = "float32"):
        # relay_dtype="bfloat16" halves host->device bytes: tiles are
        # shipped as bf16 (full f32 exponent range — radio-map Jy/beam
        # scales survive — 8-bit mantissa) and upcast to f32 on device
        # before preprocessing.  Opt-in: pixel rounding (~0.4% relative)
        # can move stats-derived stretch thresholds slightly, so the
        # default stays exact f32.  Wins only where the host link is the
        # bound (this env's ~44 MB/s tunnel; slow NFS->PCIe hosts).
        import ml_dtypes
        self.relay_np_dtype = (
            np.dtype(ml_dtypes.bfloat16)
            if str(relay_dtype) in ("bfloat16", "bf16")
            else np.dtype(relay_dtype))
        self.model = model
        self.preprocessor = preprocessor
        self.mesh = mesh
        self.img_size = img_size
        self.score_thr = score_thr
        self.iou_thr = iou_thr
        self.max_det = max_det
        self.pre_nms = pre_nms
        self.compute_dtype = compute_dtype
        self._fuse = fuse
        self.params = None
        self.update_params(params)
        self._compiled = {}

    def update_params(self, params):
        """Swap in new weights (same treatment as at construction) without
        recompiling — the compiled programs take params as an argument.
        Used by training-time validation to evaluate evolving EMA params
        through one compiled engine."""
        if self._fuse:
            params = fuse_model_params(self.model, params)
        if self.mesh is not None:
            params = jax.device_put(params, replicated_sharding(self.mesh))
        else:
            params = jax.device_put(params)
        self.params = params

    def _build(self, shape):
        step = make_tile_step(
            self.model, preprocessor=self.preprocessor,
            img_size=self.img_size, score_thr=self.score_thr,
            iou_thr=self.iou_thr, max_det=self.max_det,
            pre_nms=self.pre_nms, compute_dtype=self.compute_dtype)

        if self.mesh is not None:
            bsh = batch_sharding(self.mesh)
            rsh = replicated_sharding(self.mesh)
            return jax.jit(step, in_shardings=(rsh, bsh),
                           out_shardings=(bsh, bsh, bsh, bsh, bsh, bsh))
        return jax.jit(step)

    def put_tiles(self, tiles: np.ndarray):
        """Stage a host tile batch on device (H2D put, batch-sharded
        over the mesh).  Feeding threads call this so the put of batch
        N+1 overlaps the device computing batch N AND the main thread's
        drain work — the H2D mirror of prefetch_to_host (the D2H side);
        see sfinder.py's streaming/banded loops."""
        if tiles.dtype != self.relay_np_dtype:
            tiles = tiles.astype(self.relay_np_dtype)
        if self.mesh is not None:
            return jax.device_put(tiles, batch_sharding(self.mesh))
        return jax.device_put(tiles)

    def process_async(self, tiles):
        """Dispatch without blocking; returns device arrays (lets the host
        read the next tile batch while this one computes).  Accepts a
        host array or an already-staged device array (put_tiles)."""
        if (isinstance(tiles, np.ndarray)
                and tiles.dtype != self.relay_np_dtype):
            tiles = tiles.astype(self.relay_np_dtype)
        tiles = jnp.asarray(tiles)
        key = (tuple(tiles.shape), str(tiles.dtype))
        if key not in self._compiled:
            self._compiled[key] = self._build(tuple(tiles.shape))
        return self._compiled[key](self.params, tiles)

    def process(self, tiles):
        # one batched device_get: the relay is latency-bound per pull,
        # so six sequential np.asarray calls cost ~4.4x one get
        return tuple(jax.device_get(self.process_async(tiles)))


    # -- device-resident mosaic tiling ---------------------------------------

    def put_mosaic(self, mosaic: np.ndarray):
        """Ship the full mosaic [H, W] to HBM ONCE (in the relay dtype).

        Device-resident tiling: tile windows are then extracted in-graph
        (process_mosaic_async) instead of shipped per tile, so each
        mosaic pixel crosses the host->device link exactly once — an
        overlapping grid (tile step < 1) ships 2-4x fewer bytes than the
        per-window path, and the disk read collapses to one sequential
        pass (the reference re-reads every window including its halo
        from disk, inference.py:190-195)."""
        if mosaic.dtype != self.relay_np_dtype:
            mosaic = mosaic.astype(self.relay_np_dtype)
        if self.mesh is not None:
            return jax.device_put(mosaic, replicated_sharding(self.mesh))
        return jax.device_put(mosaic)

    def preprocess_mosaic(self, mosaic_dev):
        """Run the preprocessing pipeline ONCE over the whole
        device-resident mosaic (global statistics context) and return
        the preprocessed f32 mosaic plus its validity flag.

        TPU-native capability the reference cannot afford: its per-tile
        numpy preprocessing means tile statistics (zscale/minmax/bkg)
        come from each tile's own pixels (reference evaluation.py:157-161
        applied per window) — a bright source in one tile shifts that
        tile's stretch.  With the mosaic already in HBM, whole-mosaic
        statistics cost one extra fused pass; tiles sliced from the
        result see exactly the pixel values a serial whole-image run
        sees."""
        if self.preprocessor is None:
            return mosaic_dev, True
        key = ("preproc_mosaic", tuple(mosaic_dev.shape),
               str(mosaic_dev.dtype))
        if key not in self._compiled:
            pipe = self.preprocessor

            def prep(mosaic):
                out, ok = pipe.apply_batch(
                    mosaic.astype(jnp.float32)[None, :, :, None])
                return out[0, :, :, 0], ok[0]

            if self.mesh is not None:
                rsh = replicated_sharding(self.mesh)
                self._compiled[key] = jax.jit(
                    prep, in_shardings=rsh, out_shardings=(rsh, rsh))
            else:
                self._compiled[key] = jax.jit(prep)
        out, ok = self._compiled[key](mosaic_dev)
        return out, bool(np.asarray(ok))

    def _build_mosaic(self, tile_shape, preprocessed=False):
        h, w = tile_shape
        step = make_tile_step(
            self.model,
            preprocessor=None if preprocessed else self.preprocessor,
            img_size=self.img_size, score_thr=self.score_thr,
            iou_thr=self.iou_thr, max_det=self.max_det,
            pre_nms=self.pre_nms, compute_dtype=self.compute_dtype)
        bsh = batch_sharding(self.mesh) if self.mesh is not None else None

        def mstep(params, mosaic, origins):
            # static-size dynamic_slice per tile via lax.map (sequential
            # HBM copies — NOT a vmapped slice, whose gather lowering is
            # catastrophically slow on TPU; cf. train/augment.py note 8)
            def extract(o):
                return jax.lax.dynamic_slice(mosaic, (o[0], o[1]), (h, w))

            tiles = jax.lax.map(extract, origins)[..., None]
            if bsh is not None:
                # extraction runs replicated (cheap copies); pin the
                # batch sharding here so the conv work is data-parallel
                tiles = jax.lax.with_sharding_constraint(tiles, bsh)
            return step(params, tiles)

        if self.mesh is not None:
            rsh = replicated_sharding(self.mesh)
            return jax.jit(mstep, in_shardings=(rsh, rsh, rsh),
                           out_shardings=(bsh,) * 6)
        return jax.jit(mstep)

    def process_mosaic_async(self, mosaic_dev, origins: np.ndarray,
                             tile_shape: tuple[int, int],
                             preprocessed: bool = False):
        """Detect a batch of tiles sliced from the device-resident mosaic.

        origins[B, 2] int32 (ymin, xmin) in mosaic-array coordinates; all
        B windows share tile_shape=(h, w).  Same outputs as process().
        preprocessed=True means the mosaic already went through
        preprocess_mosaic (global statistics context), so the per-tile
        pipeline is skipped — only the degenerate-channel guard runs."""
        origins = jnp.asarray(np.asarray(origins, np.int32))
        # one jitted program per tile shape; jit itself retraces per
        # mosaic/band shape and batch size
        key = ("mosaic", tile_shape, str(mosaic_dev.dtype), preprocessed)
        if key not in self._compiled:
            self._compiled[key] = self._build_mosaic(tile_shape,
                                                     preprocessed)
        return self._compiled[key](self.params, mosaic_dev, origins)


def prefetch_to_host(outs) -> None:
    """Start asynchronous D2H copies for a dispatched batch's outputs.

    Call right after enqueueing an async batch into a pending pipeline:
    the transfer is scheduled to start as soon as the device finishes the
    batch, so it overlaps the NEXT batch's compute and host work instead
    of being paid inside the later blocking device_get (the relay's
    ~22 ms-latency pulls then mostly find the data already on host)."""
    for o in jax.tree_util.tree_leaves(outs):
        try:
            o.copy_to_host_async()
        except (AttributeError, RuntimeError):  # sharded across procs /
            return                              # backend without support
