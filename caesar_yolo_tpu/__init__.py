"""caesar-yolo-tpu: TPU-native radio source detection framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
SKA-INAF/caesar-yolo (reference: /root/reference): astronomical FITS
mosaics -> fused jit preprocessing -> YOLOv8/YOLO11 detector -> on-device
decode + NMS -> graph overlap merge -> cross-tile stitching -> JSON/DS9
catalogs.  Large mosaics are tiled and the tile batches are sharded over a
TPU device mesh (replacing the reference's MPI round-robin farming,
reference inference.py:992-1162).

Package layout (bottom-up):
  utils/       FITS I/O, box math, union-find, tile grids  (ref utils.py, graph.py)
  ops/         preprocessing transforms as pure jnp fns    (ref preprocessing.py)
  models/      YOLOv8 / YOLO11 in functional JAX + converter
  detect/      letterbox, decode, fixed-shape NMS, merge, stitch (ref evaluation.py, inference.py)
  parallel/    device mesh, shard_map tile-batch sharding  (ref inference.py MPI path)
  outputs/     JSON catalog + DS9 region writers           (ref evaluation.py:418-548)
  train/       TAL assigner, CIoU/DFL loss, optax loop     (ref macros/run_train.py)
  evaluation/  completeness / reliability / F1 harness     (ref macros/make_prediction.py)
  cli/         run.py-compatible command line              (ref scripts/run.py)
"""

import logging
import sys

__version__ = "0.1.0"

# Package-wide logger, same format/level policy as the reference
# (__init__.py:10-17): "%(asctime)s %(levelname)s %(message)s", INFO.
logger = logging.getLogger("caesar_yolo_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stdout)
    _h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    logger.propagate = False
