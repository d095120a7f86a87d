"""Post-training int8 quantization (PTQ) for inference.

TPU v5e MXUs run s8 x s8 -> s32 at roughly double the bf16 rate, and
int8 activations halve the HBM traffic that bounds the small-model
pipeline — so quantized inference attacks both regimes (measured: see
STATUS.md).  The reference has no quantization story (it serves f32/f16
torch models; README "Run" section).

Scheme (standard symmetric PTQ):
  - weights: per-output-channel scale ws[cout] = max|w|/127 over
    (kh, kw, cin), folded AFTER BatchNorm fusion so the int8 weights
    absorb the BN transform exactly;
  - activations: per-tensor static input scale per conv, calibrated as
    max|x|/127 over user-supplied sample batches (layers.quant_calibrate
    records ranges during eager forwards);
  - compute: xq = clip(round(x/xs)) -> s8 conv s8 -> s32 -> f32 * (ws*xs)
    + bias -> SiLU, all epilogue math fused by XLA (layers.Conv "wq"
    branch);
  - kept in float: depthwise/grouped convs (lane-starved, no MXU win),
    the detect head's final 1x1 Conv2dRaw projections (box/cls logits
    are precision-sensitive), and any conv never seen in calibration.

Usage:
    qparams = quantize_model(model, params, sample_inputs)   # fuses BN too
    engine = TileEngine(model, qparams, fuse=False, ...)     # or Predictor

`sample_inputs` are MODEL inputs (letterboxed [B, S, S, C] arrays in the
compute convention) — use `calibration_inputs_from_tiles` to build them
from raw tiles with the same preprocessing the engine applies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from caesar_yolo_tpu.models.layers import Conv, quant_calibrate
from caesar_yolo_tpu.models.yolo import YOLO


def _quantize_conv(conv: Conv, fused: dict, amax: float) -> dict:
    """Fused {w, b} -> {wq, ws, xs, b}; exact dequant contract tested in
    tests/test_quant.py."""
    w = jnp.asarray(fused["w"], jnp.float32)
    ws = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    ws = jnp.where(ws > 0, ws, 1.0)
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    return {"wq": wq, "ws": ws, "xs": jnp.float32(max(amax, 1e-12) / 127.0),
            "b": fused["b"]}


def _quantizable(conv) -> bool:
    return isinstance(conv, Conv) and conv.groups == 1


def quantize_tree(layer, fused_params, ranges: dict):
    """Mirror of layers.fuse_tree over already-fused params: replace each
    calibrated dense Conv's weights with the int8 form."""
    if isinstance(layer, Conv):
        amax = ranges.get(id(layer), 0.0)
        if _quantizable(layer) and amax > 0.0:
            return _quantize_conv(layer, fused_params, amax)
        return fused_params
    if isinstance(fused_params, dict):
        # block lists ("m") recurse through the list branch below
        return {name: (quantize_tree(getattr(layer, name, None), sub,
                                     ranges)
                       if getattr(layer, name, None) is not None else sub)
                for name, sub in fused_params.items()}
    if isinstance(fused_params, list) and hasattr(layer, "__iter__"):
        return [quantize_tree(bl, p, ranges)
                for bl, p in zip(layer, fused_params)]
    return fused_params


def _quantize_head(head, fused_head, ranges):
    out = {"box": [], "cls": []}
    for branch, modules_per_level in (("box", head.box_branches),
                                      ("cls", head.cls_branches)):
        for level_params, modules in zip(fused_head[branch],
                                         modules_per_level):
            out[branch].append([quantize_tree(m, p, ranges)
                                for m, p in zip(modules, level_params)])
    return out


def calibrate_ranges(model: YOLO, fused_params, sample_inputs) -> dict:
    """Eager forwards over sample model inputs; returns
    {id(conv_module): max|input|}."""
    with quant_calibrate() as ranges:
        for xx in sample_inputs:
            model(fused_params, jnp.asarray(xx))
    return ranges


def quantize_model(model: YOLO, params, sample_inputs, *,
                   fused: bool = False):
    """BN-fuse (unless `fused`), calibrate on `sample_inputs` (iterable
    of model-input batches), and return int8-quantized inference params.
    Pass to TileEngine/Predictor with fuse=False."""
    if not fused:
        from caesar_yolo_tpu.parallel.engine import fuse_model_params
        params = fuse_model_params(model, params)
    ranges = calibrate_ranges(model, params, sample_inputs)
    layer_map = {spec.name: spec.module for spec in model.layers}
    out = {}
    for name, sub in params.items():
        if name == "head":
            out[name] = _quantize_head(model.head, sub, ranges)
        else:
            out[name] = quantize_tree(layer_map[name], sub, ranges)
    return out


def calibration_inputs_from_tiles(tiles, *, preprocessor=None,
                                  img_size: int = 640, nchan: int = 3,
                                  compute_dtype=jnp.bfloat16):
    """Build model calibration inputs from raw tiles [B, H, W, C] with
    the SAME preparation the TileEngine applies (prep + letterbox +
    compute dtype), so activation ranges match serving."""
    from caesar_yolo_tpu.detect.letterbox import letterbox_batch

    x = jnp.asarray(tiles).astype(jnp.float32)
    if x.shape[-1] == 1 and nchan > 1:
        x = jnp.repeat(x, nchan, axis=-1)
    if preprocessor is not None:
        # apply_batch routes hist-eq-class stages through their Pallas
        # batch kernels (the vmapped XLA histogram hangs real TPUs) and
        # matches the TileEngine's serving-path preprocessing exactly
        x, _ = preprocessor.apply_batch(x)
    if x.shape[-1] == 1 and nchan > 1:
        x = jnp.repeat(x, nchan, axis=-1)
    return [letterbox_batch(x, img_size).astype(compute_dtype)]
