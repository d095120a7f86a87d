"""One-command real-weights parity kit.

    python scripts/verify_pt_parity.py <weights.pt> <image.fits> \
        [--model yolov8n] [--img_size 640] [--score_thr S] [--iou_thr I]

Converts the checkpoint, runs BOTH pipelines on the same preprocessed
image — the torch oracle with published-ultralytics semantics
(tests/ultra_ref.ultra_pipeline: letterbox, channel flip, /255, forward,
30000-candidate NMS, scale_boxes — the black box behind the reference's
`model(image, ...)` call, reference evaluation.py:181-193) and this
package's JAX pipeline (detect.Predictor) — and reports the parity
verdict: every detection must have a partner with IoU >= 0.99, same
class, score within 1e-3.  Exit code 0 = PASS.

No real `.pt` checkpoint ships in this environment, so the verdict the
BASELINE claims (IoU >= 0.99 vs released ultralytics weights) is one
invocation away the day one exists; tests/test_deploy.py exercises this
script end to end on a random-weight twin checkpoint.

Without --score_thr, thresholds are auto-picked in stable score/IoU
gaps (random-weight twins have meaningless calibration); for real
trained weights pass the reference's operating point explicitly
(e.g. --score_thr 0.7, reference scripts/run.py:60).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def load_image(fits_path: str) -> np.ndarray:
    """Reference default preprocessing (zscale + minmax), 3-channel."""
    from caesar_yolo_tpu.ops import build_preprocessor
    from caesar_yolo_tpu.utils.fits import read_fits

    data = read_fits(fits_path)[0]
    if data is None:
        raise SystemExit(f"cannot read {fits_path}")
    img = np.repeat(np.asarray(data, np.float32)[:, :, None], 3, axis=-1)
    out, valid = build_preprocessor(zscale_stretch=True,
                                    normalize_minmax=True)(img)
    if not bool(valid):
        raise SystemExit(f"{fits_path}: preprocessing flagged invalid")
    return np.asarray(out, np.float32)


def match_catalogs(j_out, t_out, iou_min=0.99, score_tol=1e-3):
    """Greedy 1:1 matching under the parity rule; returns (ok, detail)."""
    from caesar_yolo_tpu.utils.boxes import iou_matrix_np

    jb, js, jc = j_out
    tb, ts, tc = t_out
    detail = {"n_jax": int(len(js)), "n_torch": int(len(ts)),
              "pairs": []}
    if len(js) != len(ts):
        return False, detail
    used = np.zeros(len(ts), bool)
    ok = True
    for i in range(len(js)):
        if not len(ts):
            break
        iou = iou_matrix_np(np.asarray(jb[i:i + 1], np.float64),
                            np.asarray(tb, np.float64))[0]
        cand = ((iou >= iou_min) & (np.asarray(tc) == jc[i])
                & (np.abs(np.asarray(ts) - js[i]) <= score_tol) & ~used)
        if cand.any():
            j = int(np.argmax(cand))
            used[j] = True
            detail["pairs"].append(
                {"jax": i, "torch": j, "iou": float(iou[j]),
                 "dscore": float(abs(ts[j] - js[i]))})
        else:
            ok = False
            detail["pairs"].append(
                {"jax": i, "torch": None, "best_iou": float(iou.max())
                 if len(iou) else 0.0, "score": float(js[i])})
    return ok, detail


def verify(pt_path: str, fits_path: str, *, model_name: str | None = None,
           img_size: int = 640, score_thr: float | None = None,
           iou_thr: float | None = None, min_det: int = 1) -> dict:
    import jax.numpy as jnp
    import torch

    import ultra_ref as U
    from caesar_yolo_tpu.detect.predictor import Predictor
    from caesar_yolo_tpu.models.convert import (convert_state_dict,
                                                infer_num_classes,
                                                load_torch_state_dict)
    from caesar_yolo_tpu.models.yolo import build_model
    from test_pipeline_parity import (n_anchors, pick_iou_threshold,
                                      pick_threshold)

    name = model_name or os.path.splitext(os.path.basename(pt_path))[0]
    sd = load_torch_state_dict(pt_path)
    nc = infer_num_classes(sd)

    # torch oracle: the published-yaml twin graph loaded with the REAL
    # checkpoint weights (twin state-dict keys are ultralytics keys —
    # the converter consumes the same layout).  Real checkpoints carry
    # a frozen dfl.conv.weight (the fixed 0..15 expectation filter) the
    # twins compute implicitly — ignore it, as the converter does.
    tm = U.build_torch_twin(name, nc=nc)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    bad = [k for k in list(missing) + list(unexpected)
           if "num_batches_tracked" not in k and ".dfl." not in k]
    if bad:
        raise SystemExit(f"checkpoint/graph key mismatch: {bad[:8]}")
    tm.eval()

    jm = build_model(name, num_classes=nc)
    params = convert_state_dict(sd, jm)

    img = load_image(fits_path)

    # one oracle forward serves both the auto-threshold pick and the
    # catalog (ultra_pipeline's stages, inlined once)
    h, w = img.shape[:2]
    lb, r, top, left = U.ultra_letterbox(img, img_size)
    t = torch.from_numpy(np.ascontiguousarray(
        lb[:, :, ::-1].transpose(2, 0, 1)))[None] / 255.0
    with torch.no_grad():
        raw = tm(t)
    boxes_all, scores_all = U.ultra_decode(raw)
    if score_thr is None:
        score_thr = pick_threshold(scores_all)
    if iou_thr is None:
        iou_thr = pick_iou_threshold(boxes_all, scores_all, score_thr)
    tb, ts, tc = U.ultra_nms(boxes_all, scores_all, score_thr, iou_thr)
    t_out = (U.ultra_scale_boxes(tb, r, top, left, h, w), ts, tc)

    # candidate window: everything the oracle considers, capped at its
    # own MAX_NMS cut (a bigger window would rank candidates the oracle
    # discarded; a floor-divided one could drop candidates it keeps)
    pred = Predictor(jm, params, img_size=img_size, score_thr=score_thr,
                     iou_thr=iou_thr,
                     pre_nms=min(n_anchors(img_size), U.MAX_NMS),
                     compute_dtype=jnp.float32, input_scale=1 / 255.0,
                     channel_flip=True)
    j_out = pred.predict_image(img)

    ok, detail = match_catalogs(j_out, t_out)
    verdict = {"verdict": "PASS" if ok and detail["n_torch"] >= min_det
               else "FAIL",
               "model": name, "num_classes": nc,
               "img": os.path.basename(fits_path),
               "img_size": img_size,
               "score_thr": round(float(score_thr), 6),
               "iou_thr": round(float(iou_thr), 6), **detail}
    if detail["n_torch"] < min_det:
        verdict["note"] = (f"oracle produced {detail['n_torch']} < "
                           f"{min_det} detections — lower --score_thr")
    return verdict


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("weights")
    ap.add_argument("image")
    ap.add_argument("--model", default=None,
                    help="model name (default: weights filename stem)")
    ap.add_argument("--img_size", type=int, default=640)
    ap.add_argument("--score_thr", type=float, default=None)
    ap.add_argument("--iou_thr", type=float, default=None)
    ap.add_argument("--min_det", type=int, default=1)
    args = ap.parse_args(argv)
    verdict = verify(args.weights, args.image, model_name=args.model,
                     img_size=args.img_size, score_thr=args.score_thr,
                     iou_thr=args.iou_thr, min_det=args.min_det)
    print(json.dumps(verdict))
    return 0 if verdict["verdict"] == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
