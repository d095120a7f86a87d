"""Model graph tests: shapes, decode geometry, BN fusion parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caesar_yolo_tpu.models.yolo import (
    REG_MAX,
    YOLO,
    anchor_points,
    build_model,
    count_params,
    decode_dfl,
    init_params,
)


@pytest.fixture(scope="module")
def v8n():
    m = build_model("yolov8n", num_classes=5)
    return m, init_params(m, seed=0)


def test_build_names():
    assert build_model("yolov8n").version == "v8"
    assert build_model("yolo11l").scale == "l"
    assert build_model("yolov11s").version == "v11"
    with pytest.raises(ValueError):
        build_model("resnet50")


def test_param_counts_match_published():
    """Weights must convert 1:1 from the published checkpoints, so trainable
    param counts (excluding BN running stats, which torch doesn't count)
    must match ultralytics' published numbers minus the 16-element fixed
    DFL conv (a non-learnable arange buffer there; an einsum here)."""
    published = {"yolov8n": 3_157_200 - 16, "yolo11n": 2_624_080 - 16}
    for name, expect in published.items():
        m = build_model(name, num_classes=80)
        p = init_params(m)
        total = count_params(p)
        bn_buffers = sum(
            int(np.prod(leaf.shape))
            for path, leaf in jax.tree_util.tree_leaves_with_path(p)
            if any(getattr(k, "key", None) in ("mean", "var") for k in path))
        assert total - bn_buffers == expect, name


def test_forward_shapes(v8n):
    m, p = v8n
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    raw = m(p, x)
    assert len(raw) == 3
    for (box, cls), stride in zip(raw, (8, 16, 32)):
        assert box.shape == (2, 64 // stride, 64 // stride, 4 * REG_MAX)
        assert cls.shape == (2, 64 // stride, 64 // stride, 5)


def test_decode_anchor_geometry():
    pts, strides = anchor_points(64)
    assert pts.shape == (64 + 16 + 4, 2)
    # first P3 anchor center is (0.5, 0.5) grid units
    np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
    assert float(strides[0, 0]) == 8 and float(strides[-1, 0]) == 32


def test_decode_zero_logits_centered_boxes(v8n):
    """Zero DFL logits -> expected distance = mean(0..15) = 7.5 cells."""
    b = 1
    raw = []
    for stride in (8, 16, 32):
        n = 64 // stride
        raw.append((jnp.zeros((b, n, n, 4 * REG_MAX)),
                    jnp.zeros((b, n, n, 5))))
    boxes, scores = decode_dfl(tuple(raw), 64)
    np.testing.assert_allclose(np.asarray(boxes[0, 0]),
                               [(0.5 - 7.5) * 8, (0.5 - 7.5) * 8,
                                (0.5 + 7.5) * 8, (0.5 + 7.5) * 8], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), 0.5, rtol=1e-6)


def test_bn_fusion_parity(v8n):
    """Folded-BN inference params produce the same outputs."""
    from caesar_yolo_tpu.detect.predictor import _fuse_head
    from caesar_yolo_tpu.models.layers import fuse_tree
    m, p = v8n
    # make BN stats non-trivial
    key = jax.random.PRNGKey(1)
    p = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(
            jax.random.fold_in(key, hash(x.shape) % 2**30), x.shape), p)
    p = jax.tree_util.tree_map(jnp.abs, p)  # keep var positive
    x = jax.random.uniform(key, (1, 64, 64, 3))
    y_ref = m(p, x)

    fused = {}
    layer_map = {s.name: s.module for s in m.layers}
    for name, sub in p.items():
        fused[name] = (_fuse_head(m.head, sub) if name == "head"
                       else fuse_tree(layer_map[name], sub))
    y_fused = m(fused, x)
    for (b1, c1), (b2, c2) in zip(y_ref, y_fused):
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=2e-2, atol=2e-4)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   rtol=2e-2, atol=2e-4)


def test_v11_forward():
    m = build_model("yolo11n", num_classes=5)
    p = init_params(m)
    raw = m(p, jnp.zeros((1, 64, 64, 3)))
    assert raw[0][0].shape == (1, 8, 8, 64)
    assert raw[2][1].shape == (1, 2, 2, 5)
