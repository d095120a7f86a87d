"""Completeness/reliability/F1 metric tests (reference counting rules)."""

import numpy as np

from caesar_yolo_tpu.evaluation import (
    compute_completeness,
    compute_metrics,
    compute_reliability,
    read_yolo_labels,
)


def _img(gt_boxes, gt_labels, pred_boxes, pred_labels, scores=None):
    gt = {"bboxes": np.asarray(gt_boxes, float).reshape(-1, 4),
          "labels": list(gt_labels)}
    pred = {"bboxes": np.asarray(pred_boxes, float).reshape(-1, 4),
            "labels": list(pred_labels),
            "scores": scores or [0.9] * len(pred_labels)}
    return gt, pred


def test_completeness_perfect_match():
    gt, pred = _img([[0, 0, 10, 10]], ["compact"],
                    [[0, 0, 10, 10]], ["compact"])
    c = compute_completeness([gt], [pred])
    assert c["source"].n == 1 and c["source"].n_matched == 1
    assert c["compact"].ratio == 1.0


def test_completeness_cross_class_source_match_counts():
    """A compact gt matched best by an 'extended' prediction still counts
    as detected (real-source label rule, make_prediction.py:396-398)."""
    gt, pred = _img([[0, 0, 10, 10]], ["compact"],
                    [[0, 0, 10, 10]], ["extended"])
    c = compute_completeness([gt], [pred])
    assert c["source"].n_matched == 1
    assert c["compact"].n_matched == 1


def test_completeness_spurious_needs_same_label():
    gt, pred = _img([[0, 0, 10, 10]], ["spurious"],
                    [[0, 0, 10, 10]], ["compact"])
    c = compute_completeness([gt], [pred])
    assert c["spurious"].n == 1 and c["spurious"].n_matched == 0


def test_completeness_iou_threshold():
    gt, pred = _img([[0, 0, 10, 10]], ["compact"],
                    [[5, 5, 15, 15]], ["compact"])  # IoU ~0.19 < 0.6
    c = compute_completeness([gt], [pred])
    assert c["source"].n_matched == 0


def test_reliability_false_positive():
    gt, pred = _img([[0, 0, 10, 10]], ["compact"],
                    [[0, 0, 10, 10], [50, 50, 60, 60]],
                    ["compact", "extended"])
    r = compute_reliability([gt], [pred])
    assert r["source"].n == 2 and r["source"].n_matched == 1
    assert r["extended"].ratio == 0.0


def test_f1_formula():
    gt, pred = _img([[0, 0, 10, 10], [20, 20, 30, 30]],
                    ["compact", "compact"],
                    [[0, 0, 10, 10]], ["compact"])
    rep = compute_metrics([gt], [pred])
    c, r = 0.5, 1.0
    assert rep.f1["source"] == 2 * c * r / (c + r)
    assert "C=" in rep.summary() and "F1=" in rep.summary()


def test_read_yolo_labels(tmp_path):
    p = tmp_path / "img.txt"
    p.write_text("1 0.5 0.5 0.2 0.4\n2 0.25 0.25 0.1 0.1\n")
    out = read_yolo_labels(str(p), 100, 200,
                           ["spurious", "compact", "extended"])
    np.testing.assert_allclose(out["bboxes"][0], [40, 60, 60, 140])
    assert out["labels"] == ["compact", "extended"]
    # missing file -> empty
    out = read_yolo_labels(str(tmp_path / "nope.txt"), 10, 10, [])
    assert len(out["labels"]) == 0


def test_evaluate_dataset_end_to_end(tmp_path):
    """Full evaluate_dataset drive: filelist + labels -> batched engine ->
    metrics report.  Mixed image shapes must trigger exactly one compile
    per distinct shape (the compile-once contract for dataset evals)."""
    import jax.numpy as jnp
    from caesar_yolo_tpu.detect.batch import BatchedDetector
    from caesar_yolo_tpu.evaluation import evaluate_dataset
    from caesar_yolo_tpu.models.yolo import build_model, init_params
    from caesar_yolo_tpu.utils.fits import write_fits

    rng = np.random.default_rng(0)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    paths = []
    for i in range(7):
        p = tmp_path / "images" / f"im{i}.fits"
        size = 48 if i < 5 else 56  # two shape buckets
        write_fits(rng.random((size, size), np.float32), str(p))
        (tmp_path / "labels" / f"im{i}.txt").write_text(
            "1 0.5 0.5 0.3 0.3\n")
        paths.append(str(p))
    (tmp_path / "filelist.txt").write_text("\n".join(paths))

    m = build_model("yolov8n", num_classes=5)
    params = init_params(m, 0)
    det = BatchedDetector(m, params, img_size=64, score_thr=1e-4,
                          batch_size=4, compute_dtype=jnp.float32)
    report = evaluate_dataset(m, params, str(tmp_path / "filelist.txt"),
                              label_dir=str(tmp_path / "labels"),
                              detector=det)
    assert report.completeness["compact"].n == 7
    assert "source" in report.f1
    # 5x48px + 2x56px images, batch 4 -> exactly 2 compiled programs
    assert len(det.engine._compiled) == 2


def test_batched_detector_matches_predictor(tmp_path):
    """Batched path == per-image Predictor path, detection for
    detection (same compiled ops, different batching)."""
    import jax.numpy as jnp
    from caesar_yolo_tpu.detect import Predictor
    from caesar_yolo_tpu.detect.batch import BatchedDetector
    from caesar_yolo_tpu.models.yolo import build_model, init_params

    rng = np.random.default_rng(3)
    imgs = {f"k{i}": rng.random((48, 48, 1), dtype=np.float32)
            for i in range(5)}
    m = build_model("yolov8n", num_classes=5)
    params = init_params(m, 0)
    det = BatchedDetector(m, params, img_size=64, score_thr=1e-3,
                          batch_size=2, compute_dtype=jnp.float32)
    out = det.detect_many(list(imgs), lambda k: imgs[k])
    pred = Predictor(m, params, img_size=64, score_thr=1e-3,
                     compute_dtype=jnp.float32)
    for k, img in imgs.items():
        boxes, scores, cls, ok = out[k]
        rb, rs, rc = pred.predict_image(np.repeat(img, 3, axis=-1))
        assert ok
        np.testing.assert_allclose(boxes, rb, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(scores, rs, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(cls, rc)


def test_match_detail_and_figure(tmp_path):
    """Per-image match detail + metrics figure artifacts (the reference
    macro's per-image outputs, make_prediction.py:328-547)."""
    from caesar_yolo_tpu.evaluation.metrics import (
        compute_metrics,
        per_image_match_detail,
        save_report_figure,
    )
    gt, pred = _img([[0, 0, 10, 10], [50, 50, 60, 60]],
                    ["compact", "extended"],
                    [[1, 0, 10, 10]], ["compact"], scores=[0.8])
    detail = per_image_match_detail(["imgA"], [gt], [pred])
    d = detail[0]
    assert d["image"] == "imgA" and d["n_gt"] == 2 and d["n_pred"] == 1
    assert d["gt"][0]["detected"] and d["gt"][0]["pred_label"] == "compact"
    assert not d["gt"][1]["detected"]
    assert d["pred"][0]["matched"] and d["pred"][0]["gt_index"] == 0
    assert d["pred"][0]["score"] == 0.8
    fig = tmp_path / "metrics.png"
    save_report_figure(compute_metrics([gt], [pred], 0.6), str(fig))
    assert fig.stat().st_size > 1000


def test_batched_detector_heterogeneous_shapes_bounded():
    """More distinct shapes than fit in the residency window: partial
    buckets are flushed (bounded memory), every image still detected."""
    import jax.numpy as jnp
    from caesar_yolo_tpu.detect.batch import BatchedDetector
    from caesar_yolo_tpu.models.yolo import build_model, init_params

    rng = np.random.default_rng(7)
    imgs = {f"k{i}": rng.random((40 + 2 * i, 40 + 2 * i, 1),
                                dtype=np.float32) for i in range(7)}
    m = build_model("yolov8n", num_classes=5)
    det = BatchedDetector(m, init_params(m, 0), img_size=64,
                          score_thr=1e-3, batch_size=2,
                          compute_dtype=jnp.float32)
    out = det.detect_many(list(imgs), lambda k: imgs[k])
    assert len(out) == 7
    assert all(v is not None and v[3] for v in out.values())


# ---- mAP (COCO-style AP over IoU 0.50:0.95, ultralytics semantics) ----

from caesar_yolo_tpu.evaluation import compute_map  # noqa: E402


def test_map_perfect_detections():
    gt, pred = _img([[0, 0, 10, 10], [20, 20, 40, 40]],
                    ["compact", "extended"],
                    [[0, 0, 10, 10], [20, 20, 40, 40]],
                    ["compact", "extended"], scores=[0.9, 0.8])
    m = compute_map([gt], [pred])
    assert m.map50 == 1.0 and m.map75 == 1.0 and m.map50_95 == 1.0
    assert m.per_class_ap["compact"] == 1.0


def test_map_wrong_class_never_matches():
    gt, pred = _img([[0, 0, 10, 10]], ["compact"],
                    [[0, 0, 10, 10]], ["extended"], scores=[0.9])
    m = compute_map([gt], [pred])
    assert m.map50 == 0.0 and m.map50_95 == 0.0


def test_map_localization_quality_graded_by_threshold():
    # pred overlaps gt with IoU ~0.667: TP at thresholds .50/.55/.60/.65,
    # FP at .70+, so AP50=1 and mAP50-95 = 4/10
    gt, pred = _img([[0, 0, 10, 30]], ["compact"],
                    [[0, 5, 10, 25]], ["compact"], scores=[0.9])
    m = compute_map([gt], [pred])
    assert m.map50 == 1.0
    assert m.map75 == 0.0
    assert abs(m.map50_95 - 0.4) < 1e-9


def test_map_false_positive_after_tp_halves_late_precision():
    # one gt, two preds: high-conf TP then low-conf FP.  The PR curve is
    # (r=1, p=1) then (r=1, p=0.5): recall is already saturated when the
    # FP arrives, so AP50 stays near 1 (the shared recall point dips the
    # last interpolation segment -- exact ultralytics behavior)
    gt, pred = _img([[0, 0, 10, 10]], ["compact"],
                    [[0, 0, 10, 10], [50, 50, 60, 60]],
                    ["compact", "compact"], scores=[0.9, 0.3])
    m = compute_map([gt], [pred])
    assert 0.99 <= m.per_class_ap50["compact"] < 1.0


def test_map_confidence_ordering_matters():
    # same boxes, but the FP outranks the TP: precision at recall 0.5+
    # is capped at 1/2 -> AP50 ~ 0.5 (101-pt interp includes r=0 env)
    gt, pred = _img([[0, 0, 10, 10]], ["compact"],
                    [[50, 50, 60, 60], [0, 0, 10, 10]],
                    ["compact", "compact"], scores=[0.9, 0.3])
    m = compute_map([gt], [pred])
    assert 0.45 <= m.per_class_ap50["compact"] <= 0.55


def test_map_duplicate_detections_one_tp():
    # two predictions on the same gt: greedy matching marks exactly one
    # TP per threshold; the duplicate is a FP
    gt, pred = _img([[0, 0, 10, 10]], ["compact"],
                    [[0, 0, 10, 10], [0, 0, 10, 10]],
                    ["compact", "compact"], scores=[0.9, 0.8])
    m = compute_map([gt], [pred])
    # the duplicate FP shares the TP's recall point, so the very end of
    # the interpolated curve dips (exact ultralytics behavior): near-1
    assert 0.99 <= m.per_class_ap50["compact"] < 1.0
    from caesar_yolo_tpu.evaluation.metrics import match_predictions
    tp = match_predictions(pred["bboxes"], pred["labels"],
                           gt["bboxes"], gt["labels"],
                           np.asarray([0.5]))
    assert tp.sum() == 1


def test_map_gt_class_without_predictions_scores_zero():
    gt, pred = _img([[0, 0, 10, 10], [20, 20, 30, 30]],
                    ["compact", "extended"],
                    [[0, 0, 10, 10]], ["compact"], scores=[0.9])
    m = compute_map([gt], [pred])
    assert m.per_class_ap["extended"] == 0.0
    assert m.map50 == 0.5  # mean over the two gt classes


def test_map_empty_inputs():
    m = compute_map([], [])
    assert np.isnan(m.map50)
    gt, pred = _img([], [], [], [])
    m = compute_map([gt], [pred])
    assert np.isnan(m.map50)


def test_pr_curve_figure(tmp_path):
    from caesar_yolo_tpu.evaluation.metrics import save_pr_figure
    gt, pred = _img([[0, 0, 10, 10], [20, 20, 30, 30]],
                    ["compact", "extended"],
                    [[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]],
                    ["compact", "extended", "compact"],
                    scores=[0.9, 0.8, 0.3])
    m = compute_map([gt], [pred])
    assert set(m.pr_curves) == {"compact", "extended"}
    rec, prec, conf = m.pr_curves["compact"]
    assert rec.tolist() == [1.0, 1.0] and prec.tolist() == [1.0, 0.5]
    assert conf.tolist() == [0.9, 0.3]
    fig = tmp_path / "pr.png"
    save_pr_figure(m, str(fig))
    assert fig.stat().st_size > 1000


def test_map_exact_threshold_iou_is_tp():
    """A prediction whose IoU is EXACTLY a nominal threshold (0.75 here)
    must count as TP at that threshold: the default grid must come from
    linspace, since arange's accumulated float steps land ulps above
    nominal and flip the >= comparison (ultralytics uses linspace)."""
    # IoU(gt, pred) = 300/400 = 0.75 exactly (representable in float64)
    gt, pred = _img([[0, 0, 10, 40]], ["compact"],
                    [[0, 10, 10, 40]], ["compact"], scores=[0.9])
    m = compute_map([gt], [pred])
    assert m.map75 == 1.0
    # TP at .50/.55/.60/.65/.70/.75 -> 6 of 10 thresholds
    assert abs(m.map50_95 - 0.6) < 1e-9


def test_best_thresholds_maximize_pr_f1():
    """best_thresholds picks the confidence cut maximizing PR-F1: with
    TPs at 0.9/0.3 and an FP at 0.8 over 2 gt boxes, keeping everything
    (thr=0.3: P=2/3, R=1, F1=0.8) beats the high-precision cut
    (thr=0.9: P=1, R=0.5, F1=2/3)."""
    gt, pred = _img([[0, 0, 10, 10], [20, 20, 30, 30]],
                    ["compact", "compact"],
                    [[0, 0, 10, 10], [50, 50, 60, 60], [20, 20, 30, 30]],
                    ["compact", "compact", "compact"],
                    scores=[0.9, 0.8, 0.3])
    m = compute_map([gt], [pred])
    thr, f1, prec, rec = m.best_thresholds()["compact"]
    assert thr == 0.3 and abs(f1 - 0.8) < 1e-9
    assert abs(prec - 2 / 3) < 1e-9 and rec == 1.0
