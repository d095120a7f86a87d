"""Shared export-portability switch.

While FORCE is True (deploy.export_detector's portable_suppression
context), every component that normally lowers a Pallas/Mosaic kernel
on TPU traces its platform-neutral XLA formulation instead, so
jax.export artifacts never bake in kernels that cannot lower for the
other requested platforms.  Consumers: detect/nms.py (suppression
fixpoint) and ops/transforms.py (native batch preprocessing stages —
hist-eq/CLAHE/sigma-clip).
"""

FORCE = False
