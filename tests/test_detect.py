"""Detection-path tests: NMS properties, letterbox, merge, Analyzer e2e."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from caesar_yolo_tpu.detect import (
    Analyzer,
    AnalyzerOutputs,
    Predictor,
    letterbox,
    letterbox_geometry,
    merge_detections,
    nms_single,
    unletterbox_boxes,
)
from caesar_yolo_tpu.models.yolo import build_model, init_params


def _scores(n, pairs):
    s = np.zeros((n, 5), np.float32)
    for i, (c, v) in enumerate(pairs):
        s[i, c] = v
    return jnp.asarray(s)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]],
                        jnp.float32)
    scores = _scores(3, [(1, 0.9), (1, 0.8), (2, 0.7)])
    b, s, c, v, _ = nms_single(boxes, scores, conf_thr=0.25, iou_thr=0.5,
                               max_det=8, pre_nms=3)
    v = np.asarray(v)
    assert v.sum() == 2
    np.testing.assert_allclose(np.asarray(s)[v], [0.9, 0.7])
    np.testing.assert_array_equal(np.asarray(c)[v], [1, 2])


def test_nms_class_aware():
    """Same geometry, different classes -> both kept (agnostic=False)."""
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = _scores(2, [(1, 0.9), (2, 0.8)])
    _, _, _, v, _ = nms_single(boxes, scores, conf_thr=0.25, iou_thr=0.5,
                               max_det=8, pre_nms=2)
    assert np.asarray(v).sum() == 2
    _, _, _, v, _ = nms_single(boxes, scores, conf_thr=0.25, iou_thr=0.5,
                               max_det=8, pre_nms=2, class_agnostic=True)
    assert np.asarray(v).sum() == 1


def test_nms_conf_threshold_and_maxdet():
    boxes = jnp.asarray([[i * 20, 0, i * 20 + 10, 10] for i in range(6)],
                        jnp.float32)
    scores = _scores(6, [(0, 0.9), (1, 0.8), (2, 0.7), (3, 0.6), (4, 0.5),
                         (0, 0.1)])
    b, s, c, v, _ = nms_single(boxes, scores, conf_thr=0.45, iou_thr=0.5,
                               max_det=3, pre_nms=6)
    v = np.asarray(v)
    assert v.sum() == 3  # 5 pass conf, capped at 3
    np.testing.assert_allclose(np.asarray(s)[v], [0.9, 0.8, 0.7])


def test_nms_scores_descending_and_padded():
    boxes = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    scores = _scores(1, [(3, 0.6)])
    b, s, c, v, _ = nms_single(boxes, scores, conf_thr=0.25, iou_thr=0.5,
                               max_det=4, pre_nms=1)
    assert np.asarray(v).tolist() == [True, False, False, False]
    assert np.asarray(s)[1:].tolist() == [0.0, 0.0, 0.0]


def test_letterbox_geometry_and_roundtrip():
    r, nh, nw, top, left = letterbox_geometry(100, 132, 160)
    assert (nh, nw) == (round(100 * r), 160)
    out = letterbox(jnp.ones((100, 132, 3)), 160)
    assert out.shape == (160, 160, 3)
    # pad rows hold the gray value
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], 114 / 255, rtol=1e-6)

    bb = jnp.asarray([[10.0, 20.0, 50.0, 60.0]])
    fwd = bb * r + jnp.asarray([left, top, left, top], jnp.float32)
    back = unletterbox_boxes(fwd, 100, 132, 160)
    np.testing.assert_allclose(np.asarray(back), np.asarray(bb), atol=1e-4)


def test_unletterbox_clips():
    out = unletterbox_boxes(jnp.asarray([[-50.0, -50.0, 500.0, 500.0]]),
                            100, 132, 160)
    np.testing.assert_allclose(np.asarray(out)[0], [0, 0, 132, 100])


def test_merge_soft_same_class():
    b, s, c = merge_detections(
        np.array([[0, 0, 10, 10], [2, 2, 10, 10], [40, 40, 50, 50]]),
        np.array([0.5, 0.9, 0.8]), np.array([1, 1, 2]))
    assert len(s) == 2
    np.testing.assert_allclose(s, [0.9, 0.8])


def test_merge_hard_cross_class():
    # IoU 0.64 across classes: below hard 0.8 -> kept separate
    b, s, c = merge_detections(
        np.array([[0, 0, 10, 10], [2, 2, 10, 10]]),
        np.array([0.5, 0.9]), np.array([1, 2]))
    assert len(s) == 2
    # IoU 0.81 crosses the hard threshold -> merged, best score wins
    b, s, c = merge_detections(
        np.array([[0, 0, 10, 10], [1, 1, 10, 10]]),
        np.array([0.5, 0.9]), np.array([1, 2]))
    assert len(s) == 1 and s[0] == 0.9 and c[0] == 2


def test_merge_transitive_chain():
    """A-B and B-C overlap (A-C don't): one component, one survivor."""
    b, s, c = merge_detections(
        np.array([[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]]),
        np.array([0.7, 0.6, 0.9]), np.array([1, 1, 1]))
    assert len(s) == 1 and s[0] == 0.9


def test_merge_empty():
    b, s, c = merge_detections(np.zeros((0, 4)), np.zeros(0), np.zeros(0))
    assert len(s) == 0


@pytest.fixture(scope="module")
def tiny_predictor():
    m = build_model("yolov8n", num_classes=5)
    p = init_params(m, seed=0)
    return Predictor(m, p, img_size=64, score_thr=1e-4,
                     compute_dtype=jnp.float32)


def test_predictor_boxes_in_image(tiny_predictor):
    rng = np.random.default_rng(0)
    img = rng.random((50, 60, 3), dtype=np.float32)
    boxes, scores, cls = tiny_predictor.predict_image(img)
    if len(boxes):
        assert (boxes[:, 0] >= 0).all() and (boxes[:, 1] >= 0).all()
        assert (boxes[:, 2] <= 60).all() and (boxes[:, 3] <= 50).all()
    assert (scores > 1e-4).all()


def test_analyzer_end_to_end(tmp_path, tiny_predictor, galaxy_fits_path):
    from caesar_yolo_tpu.ops import build_preprocessor
    from caesar_yolo_tpu.utils import read_fits
    data, header, wcs = read_fits(galaxy_fits_path)
    pp = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    out = AnalyzerOutputs(
        outfile_json=str(tmp_path / "cat.json"),
        outfile_ds9=str(tmp_path / "cat.reg"))
    an = Analyzer(tiny_predictor, preprocessor=pp, outputs=out)
    rc = an.predict(data, image_id="galaxy0001")
    assert rc == 0
    cat = json.loads((tmp_path / "cat.json").read_text())
    assert cat["image_id"] == "galaxy0001"
    for obj in cat["objs"]:
        assert set(obj) == {"name", "x1", "x2", "y1", "y2", "class_id",
                            "class_name", "score", "edge"}
    reg = (tmp_path / "cat.reg").read_text()
    assert reg.startswith("# Region file format: DS9")
    assert "image\n" in reg


def test_analyzer_degenerate_image(tiny_predictor):
    an = Analyzer(tiny_predictor, outputs=AnalyzerOutputs(
        write_json=False, write_ds9=False))
    assert an.predict(np.zeros((64, 64), np.float32), "flat") == -1
    assert len(an.detections) == 0


def test_nms_batch_raw_matches_composed(rng):
    """The fused logit-space path (nms_batch_raw) must reproduce
    decode_dfl -> nms_batch exactly: sigmoid/argmax monotonicity makes
    selection order identical, and the window-gathered DFL softmax is
    the same per-anchor reduction."""
    import jax
    from caesar_yolo_tpu.detect.nms import nms_batch, nms_batch_raw
    from caesar_yolo_tpu.models.yolo import REG_MAX, decode_dfl

    S, NC, B = 64, 5, 3
    raw = []
    for stride in (8, 16, 32):
        n = S // stride
        box = rng.normal(0, 2, (B, n, n, 4 * REG_MAX)).astype(np.float32)
        cls = rng.normal(-2, 2.5, (B, n, n, NC)).astype(np.float32)
        raw.append((jnp.asarray(box), jnp.asarray(cls)))
    raw = tuple(raw)

    for conf_thr, pre_nms, agn in [(0.25, 32, False), (0.5, 16, True),
                                   (0.7, 8, False)]:
        boxes, scores = decode_dfl(raw, S)
        ref = nms_batch(boxes, scores, conf_thr=conf_thr, iou_thr=0.5,
                        max_det=20, pre_nms=pre_nms, class_agnostic=agn)
        got = nms_batch_raw(raw, S, conf_thr=conf_thr, iou_thr=0.5,
                            max_det=20, pre_nms=pre_nms, class_agnostic=agn)
        for name, r, g in zip(("boxes", "scores", "cls", "valid", "ndrop"),
                              ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                          err_msg=f"{name} @conf={conf_thr}")


def test_nms_batch_raw_bf16_head(rng):
    """bf16 raw head outputs (the engine's compute dtype) decode through
    the fused path identically to the composed f32-cast path."""
    from caesar_yolo_tpu.detect.nms import nms_batch, nms_batch_raw
    from caesar_yolo_tpu.models.yolo import REG_MAX, decode_dfl

    S, NC, B = 32, 5, 2
    raw = []
    for stride in (8, 16, 32):
        n = S // stride
        box = jnp.asarray(
            rng.normal(0, 2, (B, n, n, 4 * REG_MAX))).astype(jnp.bfloat16)
        cls = jnp.asarray(
            rng.normal(0, 3, (B, n, n, NC))).astype(jnp.bfloat16)
        raw.append((box, cls))
    raw = tuple(raw)
    boxes, scores = decode_dfl(raw, S)
    ref = nms_batch(boxes, scores, conf_thr=0.3, iou_thr=0.5, max_det=10,
                    pre_nms=16)
    got = nms_batch_raw(raw, S, conf_thr=0.3, iou_thr=0.5, max_det=10,
                        pre_nms=16)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
