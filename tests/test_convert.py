"""Weight-converter tests: torch parity of the Conv block, state-dict key
mapping, npz round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caesar_yolo_tpu.models.convert import (
    convert_state_dict,
    load_params,
    load_torch_state_dict,
    save_params,
)
from caesar_yolo_tpu.models.layers import Conv
from caesar_yolo_tpu.models.yolo import build_model, init_params

torch = pytest.importorskip("torch")


def test_conv_block_matches_torch():
    """NHWC/HWIO Conv+BN+SiLU must bit-match torch's NCHW Conv2d+BN+SiLU
    for odd kernels and stride 2 (the letterbox grid depends on it)."""
    torch.manual_seed(0)
    for k, s in [(3, 1), (3, 2), (1, 1), (5, 2)]:
        tconv = torch.nn.Conv2d(4, 8, k, s, padding=k // 2, bias=False)
        tbn = torch.nn.BatchNorm2d(8, eps=1e-3).eval()
        with torch.no_grad():
            tbn.weight.copy_(torch.rand(8) + 0.5)
            tbn.bias.copy_(torch.rand(8))
            tbn.running_mean.copy_(torch.rand(8))
            tbn.running_var.copy_(torch.rand(8) + 0.5)
        x = torch.rand(2, 4, 16, 16)
        with torch.no_grad():
            ref = torch.nn.functional.silu(tbn(tconv(x))).numpy()

        block = Conv(4, 8, k, s)
        params = {
            "w": jnp.asarray(tconv.weight.detach().numpy()
                             .transpose(2, 3, 1, 0)),
            "bn": {"gamma": jnp.asarray(tbn.weight.detach().numpy()),
                   "beta": jnp.asarray(tbn.bias.detach().numpy()),
                   "mean": jnp.asarray(tbn.running_mean.numpy()),
                   "var": jnp.asarray(tbn.running_var.numpy())},
        }
        out = block(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                                   ref, rtol=1e-4, atol=1e-5, err_msg=f"k={k} s={s}")


def _fake_state_dict(model):
    """Synthesize an ultralytics-keyed state dict with the right shapes by
    reversing the converter's layout rules on randomly-initialized params."""
    params = init_params(model, seed=1)
    sd = {}

    def put_conv(prefix, p):
        sd[f"{prefix}.conv.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[f"{prefix}.bn.weight"] = np.asarray(p["bn"]["gamma"])
        sd[f"{prefix}.bn.bias"] = np.asarray(p["bn"]["beta"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(p["bn"]["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(p["bn"]["var"])

    def put_raw(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def walk(p, prefix, module=None):
        if "w" in p and "bn" in p:
            put_conv(prefix, p)
            return
        if "w" in p and "b" in p:
            put_raw(prefix, p)
            return
        for key, sub in p.items():
            if key == "m":
                for j, s in enumerate(sub):
                    walk(s, f"{prefix}.m.{j}")
            elif key in ("ffn1", "ffn2"):
                walk(sub, f"{prefix}.ffn.{0 if key == 'ffn1' else 1}")
            else:
                walk(sub, f"{prefix}.{key}")

    for i, spec in enumerate(model.layers):
        if spec.name in params:
            walk(params[spec.name], f"model.{i}")
    head_p = params["head"]
    hi = len(model.layers)
    for lvl in range(3):
        box = head_p["box"][lvl]
        put_conv(f"model.{hi}.cv2.{lvl}.0", box[0])
        put_conv(f"model.{hi}.cv2.{lvl}.1", box[1])
        put_raw(f"model.{hi}.cv2.{lvl}.2", box[2])
        cls = head_p["cls"][lvl]
        if model.head.legacy:
            put_conv(f"model.{hi}.cv3.{lvl}.0", cls[0])
            put_conv(f"model.{hi}.cv3.{lvl}.1", cls[1])
            put_raw(f"model.{hi}.cv3.{lvl}.2", cls[2])
        else:
            put_conv(f"model.{hi}.cv3.{lvl}.0.0", cls[0])
            put_conv(f"model.{hi}.cv3.{lvl}.0.1", cls[1])
            put_conv(f"model.{hi}.cv3.{lvl}.1.0", cls[2])
            put_conv(f"model.{hi}.cv3.{lvl}.1.1", cls[3])
            put_raw(f"model.{hi}.cv3.{lvl}.2", cls[4])
    return params, sd


@pytest.mark.parametrize("name", ["yolov8n", "yolo11n"])
def test_convert_state_dict_roundtrip(name):
    """convert(reverse(params)) == params, for both head variants."""
    model = build_model(name, num_classes=5)
    params, sd = _fake_state_dict(model)
    converted = convert_state_dict(sd, model)
    orig = jax.tree_util.tree_leaves(params)
    conv = jax.tree_util.tree_leaves(converted)
    assert len(orig) == len(conv)
    for a, b in zip(orig, conv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_convert_missing_key_raises():
    model = build_model("yolov8n", num_classes=5)
    _, sd = _fake_state_dict(model)
    del sd["model.0.conv.weight"]
    with pytest.raises(KeyError):
        convert_state_dict(sd, model)


def test_npz_roundtrip(tmp_path):
    model = build_model("yolov8n", num_classes=5)
    params = init_params(model, seed=0)
    path = str(tmp_path / "w.npz")
    save_params(jax.device_get(params), path,
                meta={"model": "yolov8n", "num_classes": 5})
    loaded, meta = load_params(path)
    assert meta == {"model": "yolov8n", "num_classes": 5}
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), y)
    # loaded params drive the model
    raw = model(loaded, jnp.zeros((1, 64, 64, 3)))
    assert raw[0][0].shape == (1, 8, 8, 64)


def test_load_torch_plain_state_dict(tmp_path):
    """A plain state_dict .pt (no ultralytics objects) loads too."""
    sd = {"model.0.conv.weight": torch.rand(16, 3, 3, 3)}
    p = str(tmp_path / "sd.pt")
    torch.save(sd, p)
    out = load_torch_state_dict(p)
    assert out["model.0.conv.weight"].shape == (16, 3, 3, 3)
    assert out["model.0.conv.weight"].dtype == np.float32


class _FakeDetectionModel:
    """Defined lazily in test_ghost_unpickler (needs torch)."""


def test_ghost_unpickler_loads_unknown_classes(tmp_path):
    """Published .pt checkpoints pickle ultralytics CLASS REFERENCES;
    the converter must load them without ultralytics installed.  Save a
    checkpoint whose class lives in a module that disappears before
    load: the ghost unpickler must fabricate it and still walk
    state_dict()."""
    import sys
    import types

    import torch

    class FakeDetectionModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch.nn.Sequential(
                torch.nn.Conv2d(3, 8, 1), torch.nn.BatchNorm2d(8))

    FakeDetectionModel.__module__ = "fake_ultralytics.nn.tasks"
    FakeDetectionModel.__qualname__ = "FakeDetectionModel"
    chain = ("fake_ultralytics", "fake_ultralytics.nn",
             "fake_ultralytics.nn.tasks")
    parent = None
    for name in chain:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        if parent is not None:
            setattr(parent, name.rsplit(".", 1)[1], mod)
        parent = mod
    parent.FakeDetectionModel = FakeDetectionModel
    try:
        m = FakeDetectionModel().eval()
        with torch.no_grad():
            m.model[0].weight.fill_(0.5)
        p = str(tmp_path / "ghost.pt")
        torch.save({"model": m, "epoch": 7}, p)
    finally:
        for name in chain:
            del sys.modules[name]

    out = load_torch_state_dict(p)
    assert "model.0.weight" in out and "model.1.running_mean" in out
    np.testing.assert_allclose(out["model.0.weight"], 0.5)


def test_ghost_unpickler_prefers_ema(tmp_path):
    """ultralytics checkpoints carry both 'model' and 'ema'; the
    converter must take the EMA weights (the published convention)."""
    import torch

    ma = torch.nn.Sequential(torch.nn.Conv2d(1, 2, 1))
    mb = torch.nn.Sequential(torch.nn.Conv2d(1, 2, 1))
    with torch.no_grad():
        ma[0].weight.fill_(1.0)
        mb[0].weight.fill_(2.0)
    p = str(tmp_path / "ema.pt")
    torch.save({"model": ma, "ema": mb}, p)
    out = load_torch_state_dict(p)
    np.testing.assert_allclose(out["0.weight"], 2.0)


def test_convert_cli_roundtrip(tmp_path):
    """python -m caesar_yolo_tpu.cli.convert w.pt -> w.npz that loads
    back into an equivalent model."""
    torch = pytest.importorskip("torch")
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import ultra_ref as U
    from caesar_yolo_tpu.cli.convert import main
    from caesar_yolo_tpu.models.convert import load_params

    tm = U.build_torch_twin("yolov8n", seed=21)
    pt = tmp_path / "yolov8n.pt"
    torch.save(tm.state_dict(), str(pt))
    assert main([str(pt)]) == 0
    params, meta = load_params(str(tmp_path / "yolov8n.npz"))
    assert meta["model"] == "yolov8n" and meta["num_classes"] == 5
    assert "stem" in params
    # explicit out path + missing input error path
    assert main([str(pt), str(tmp_path / "w2.npz")]) == 0
    assert (tmp_path / "w2.npz").exists()
    assert main([str(tmp_path / "nope.pt")]) == 1


def test_convert_cli_infers_name_from_stem_substring(tmp_path):
    """The documented MIGRATION.md one-liner uses a real-world filename
    (weights-yolov8n.pt) whose stem only CONTAINS the architecture name;
    inference must find the embedded token instead of failing to parse
    the full stem."""
    torch = pytest.importorskip("torch")
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import ultra_ref as U
    from caesar_yolo_tpu.cli.convert import main
    from caesar_yolo_tpu.models.convert import load_params

    tm = U.build_torch_twin("yolov8n", seed=22)
    pt = tmp_path / "weights-yolov8n.pt"
    torch.save(tm.state_dict(), str(pt))
    out = tmp_path / "out.npz"
    assert main([str(pt), str(out)]) == 0
    _, meta = load_params(str(out))
    assert meta["model"] == "yolov8n"


def test_convert_cli_corrupt_pt_exits_cleanly(tmp_path):
    """A truncated/corrupt .pt (UnpicklingError — outside the obvious
    OSError/ValueError/KeyError set) must take the clean logger+exit-1
    path, not dump a raw traceback."""
    from caesar_yolo_tpu.cli.convert import main
    bad = tmp_path / "corrupt.pt"
    bad.write_bytes(b"PK\x03\x04 this is not a checkpoint")
    assert main([str(bad)]) == 1


def test_infer_model_name_rules():
    """Exact names pass through; stems merely CONTAINING a token match
    by substring — including stems that START with a valid prefix but
    are not valid names ('yolo11best' must not be trusted just because
    of its prefix)."""
    from caesar_yolo_tpu.models.convert import _infer_model_name
    assert _infer_model_name("yolov8l") == "yolov8l"
    assert _infer_model_name("yolo11x") == "yolo11x"
    assert _infer_model_name("weights-yolov8l") == "yolov8l"
    assert _infer_model_name("yolov8_yolo11l") == "yolo11l"
    assert _infer_model_name("yolov11m_final") == "yolov11m"
    # no valid token anywhere: pass through for build_model's error
    assert _infer_model_name("yolo11best") == "yolo11best"


def test_build_model_bad_scale_clean_error():
    """A prefix-valid name with an unknown scale letter must raise the
    documented ValueError, not a KeyError deep in graph building."""
    from caesar_yolo_tpu.models.yolo import build_model
    with pytest.raises(ValueError, match="scale"):
        build_model("yolo11best")
    with pytest.raises(ValueError, match="cannot parse"):
        build_model("resnet50")
