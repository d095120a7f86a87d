"""Ultralytics .pt checkpoint -> JAX pytree weight converter (offline).

The reference loads `.pt` weights straight into ultralytics
(reference scripts/run.py:347, README.md:190-207 lists the published
checkpoints).  This converter maps those checkpoints onto the layer
graph in models/yolo.py WITHOUT requiring the ultralytics package: the
checkpoint pickle references ultralytics classes, so unpickling uses a
"ghost module" shim that fabricates missing classes as bare nn.Module
subclasses — enough to traverse `state_dict()` — with torch (CPU) used
only inside this offline tool, never on the TPU serving path.

Key layout facts the mapping relies on (verified against the published
architecture yamls):
  - `model.model` is a flat Sequential whose indices equal the yaml row
    numbers — the same order models/yolo.py builds its layer list in.
  - torch conv weights are OIHW; JAX kernels here are HWIO.
  - Detect head: cv2 = box branch (Conv, Conv, Conv2d), cv3 = cls branch
    (legacy v8: Conv, Conv, Conv2d; v11: (DWConv+Conv)x2, Conv2d);
    dfl.conv.weight is the fixed arange kernel (dropped — decode uses an
    einsum expectation instead).

Output format: a plain dict-of-arrays .npz plus a JSON manifest of the
model name/classes, loadable without torch via `load_params`.
"""

from __future__ import annotations

import json
import os
import pickle
import re

import numpy as np

from caesar_yolo_tpu import logger
from caesar_yolo_tpu.models import yolo as yolo_mod
from caesar_yolo_tpu.models.layers import (
    C2PSA,
    C2f,
    C3,
    C3k2,
    Concat,
    Conv,
    SPPF,
    Upsample,
)


# ---------------------------------------------------------------------------
# Checkpoint loading without ultralytics
# ---------------------------------------------------------------------------

def load_torch_state_dict(pt_path: str) -> dict[str, np.ndarray]:
    """Extract {key: float32 ndarray} from an ultralytics .pt checkpoint.

    Uses torch.load with a ghost-module unpickler so the pickled
    ultralytics class references resolve to fabricated nn.Module
    subclasses; we then walk `state_dict()` of the contained model.
    """
    import torch

    class GhostUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                cls = type(name, (torch.nn.Module,), {"__module__": module})
                return cls

    class GhostPickleModule:
        Unpickler = GhostUnpickler

        @staticmethod
        def load(f, **kw):
            return GhostUnpickler(f).load()

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False,
                      pickle_module=GhostPickleModule)
    if isinstance(ckpt, dict):
        model = ckpt.get("ema") or ckpt.get("model") or ckpt
    else:
        model = ckpt
    if hasattr(model, "state_dict"):
        sd = model.state_dict()
    elif isinstance(model, dict):
        sd = model  # already a flat state_dict
    else:
        raise ValueError(f"cannot find a model/state_dict in {pt_path}")
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).cpu().numpy()
    return out


# ---------------------------------------------------------------------------
# Key mapping
# ---------------------------------------------------------------------------

def _t_conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


class _Mapper:
    def __init__(self, sd: dict[str, np.ndarray]):
        self.sd = sd
        self.used: set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"missing checkpoint key: {key}")
        self.used.add(key)
        return self.sd[key]

    def conv_block(self, p: str) -> dict:
        return {
            "w": _t_conv(self.take(f"{p}.conv.weight")),
            "bn": {
                "gamma": self.take(f"{p}.bn.weight"),
                "beta": self.take(f"{p}.bn.bias"),
                "mean": self.take(f"{p}.bn.running_mean"),
                "var": self.take(f"{p}.bn.running_var"),
            },
        }

    def conv_raw(self, p: str) -> dict:
        return {"w": _t_conv(self.take(f"{p}.weight")),
                "b": self.take(f"{p}.bias")}

    def bottleneck(self, p: str) -> dict:
        return {"cv1": self.conv_block(f"{p}.cv1"),
                "cv2": self.conv_block(f"{p}.cv2")}

    def c2f(self, module: C2f, p: str) -> dict:
        return {"cv1": self.conv_block(f"{p}.cv1"),
                "cv2": self.conv_block(f"{p}.cv2"),
                "m": [self.bottleneck(f"{p}.m.{j}")
                      for j in range(len(module.m))]}

    def c3(self, module: C3, p: str) -> dict:
        return {"cv1": self.conv_block(f"{p}.cv1"),
                "cv2": self.conv_block(f"{p}.cv2"),
                "cv3": self.conv_block(f"{p}.cv3"),
                "m": [self.bottleneck(f"{p}.m.{j}")
                      for j in range(len(module.m))]}

    def c3k2(self, module: C3k2, p: str) -> dict:
        out = {"cv1": self.conv_block(f"{p}.cv1"),
               "cv2": self.conv_block(f"{p}.cv2"), "m": []}
        for j, sub in enumerate(module.m):
            if isinstance(sub, C3):
                out["m"].append(self.c3(sub, f"{p}.m.{j}"))
            else:
                out["m"].append(self.bottleneck(f"{p}.m.{j}"))
        return out

    def sppf(self, p: str) -> dict:
        return {"cv1": self.conv_block(f"{p}.cv1"),
                "cv2": self.conv_block(f"{p}.cv2")}

    def attention(self, p: str) -> dict:
        return {"qkv": self.conv_block(f"{p}.qkv"),
                "proj": self.conv_block(f"{p}.proj"),
                "pe": self.conv_block(f"{p}.pe")}

    def psablock(self, p: str) -> dict:
        return {"attn": self.attention(f"{p}.attn"),
                "ffn1": self.conv_block(f"{p}.ffn.0"),
                "ffn2": self.conv_block(f"{p}.ffn.1")}

    def c2psa(self, module: C2PSA, p: str) -> dict:
        return {"cv1": self.conv_block(f"{p}.cv1"),
                "cv2": self.conv_block(f"{p}.cv2"),
                "m": [self.psablock(f"{p}.m.{j}")
                      for j in range(len(module.m))]}

    def detect_head(self, head, p: str) -> dict:
        out = {"box": [], "cls": []}
        for lvl in range(len(head.chs)):
            out["box"].append([
                self.conv_block(f"{p}.cv2.{lvl}.0"),
                self.conv_block(f"{p}.cv2.{lvl}.1"),
                self.conv_raw(f"{p}.cv2.{lvl}.2")])
            if head.legacy:
                out["cls"].append([
                    self.conv_block(f"{p}.cv3.{lvl}.0"),
                    self.conv_block(f"{p}.cv3.{lvl}.1"),
                    self.conv_raw(f"{p}.cv3.{lvl}.2")])
            else:
                out["cls"].append([
                    self.conv_block(f"{p}.cv3.{lvl}.0.0"),
                    self.conv_block(f"{p}.cv3.{lvl}.0.1"),
                    self.conv_block(f"{p}.cv3.{lvl}.1.0"),
                    self.conv_block(f"{p}.cv3.{lvl}.1.1"),
                    self.conv_raw(f"{p}.cv3.{lvl}.2")])
        return out


def convert_state_dict(sd: dict[str, np.ndarray],
                       model: "yolo_mod.YOLO") -> dict:
    """Map a flat ultralytics state_dict onto the model's params pytree."""
    m = _Mapper(sd)
    params = {}
    for i, spec in enumerate(model.layers):
        p = f"model.{i}"
        mod = spec.module
        if isinstance(mod, Conv):
            params[spec.name] = m.conv_block(p)
        elif isinstance(mod, C3k2):
            params[spec.name] = m.c3k2(mod, p)
        elif isinstance(mod, C2f):
            params[spec.name] = m.c2f(mod, p)
        elif isinstance(mod, SPPF):
            params[spec.name] = m.sppf(p)
        elif isinstance(mod, C2PSA):
            params[spec.name] = m.c2psa(mod, p)
        elif isinstance(mod, (Upsample, Concat)):
            continue
        else:
            raise TypeError(f"unmapped module type {type(mod)} at layer {i}")
    params["head"] = m.detect_head(model.head, f"model.{len(model.layers)}")

    unused = [k for k in sd if k not in m.used
              and not k.endswith("num_batches_tracked")
              and ".dfl." not in k]
    if unused:
        logger.warning("Converter: %d unused checkpoint keys (first: %s)",
                       len(unused), unused[:5])
    return _to_f32(params)


def _to_f32(tree):
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_f32(v) for v in tree]
    return np.asarray(tree, np.float32)


# ---------------------------------------------------------------------------
# npz round-trip (torch-free load path)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], tree


def _unflatten(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def infer_num_classes(sd: dict, default: int = 5) -> int:
    """Class count from the last cls-branch conv bias length (the one
    head shape that encodes nc in an ultralytics state dict)."""
    nc_keys = [k for k in sd if ".cv3." in k and k.endswith("2.bias")]
    return int(sd[sorted(nc_keys)[0]].shape[0]) if nc_keys else default


def save_params(params, path: str, meta: dict | None = None) -> str:
    """Save a params pytree as .npz (+ __meta__ JSON entry).  Returns
    the actual path written (np.savez appends .npz when absent — a
    caller reloading the un-suffixed name would FileNotFoundError)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    flat = dict(_flatten(params))
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **flat)
    return path


def load_params(path: str):
    """Load (params, meta) from a converted .npz."""
    data = np.load(path)
    flat = {}
    meta = {}
    for k in data.files:
        if k == "__meta__":
            meta = json.loads(bytes(data[k].tobytes()).decode())
        else:
            flat[k] = data[k]
    return _unflatten(flat), meta


def _infer_model_name(stem: str) -> str:
    """Exact stem if it IS a valid architecture name, else the first
    embedded ``yolov8<s>`` / ``yolo11<s>`` token in the stem, else the
    stem unchanged (build_model then raises its clean ValueError).  The
    fullmatch (not a startswith check) matters: 'yolo11best' starts
    with a valid prefix but is NOT a valid name — the embedded-token
    fallback must still apply to it."""
    if re.fullmatch(r"yolo(?:v8|v11|11)[nsmlx]?", stem):
        return stem
    m = re.search(r"yolo(?:v8|v11|11)[nsmlx]", stem)
    return m.group(0) if m else stem


def convert_checkpoint(pt_path: str, out_path: str | None = None,
                       model_name: str | None = None,
                       num_classes: int | None = None):
    """Full conversion: .pt -> (model, params) (+ .npz when out_path set).

    model_name defaults to the checkpoint filename stem (the reference's
    convention, README.md:190-207); stems that merely CONTAIN an
    architecture name (``weights-yolov8l.pt``, ``yolo11n_best.pt``) are
    matched by substring so the documented one-liner works on real
    checkpoint filenames."""
    name = model_name or _infer_model_name(
        os.path.splitext(os.path.basename(pt_path))[0])
    sd = load_torch_state_dict(pt_path)
    if num_classes is None:
        num_classes = infer_num_classes(sd)
    model = yolo_mod.build_model(name, num_classes=num_classes)
    params = convert_state_dict(sd, model)
    if out_path:
        written = save_params(params, out_path,
                              meta={"model": name,
                                    "num_classes": num_classes})
        logger.info("Saved converted weights to %s", written)
    return model, params
