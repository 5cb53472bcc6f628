"""semanticlidarunc_tpu — TPU-native uncertainty-aware LiDAR semantic segmentation.

A from-scratch JAX / XLA / Pallas / pjit framework with the capabilities of the
PyTorch reference `kav-institute/SemanticLiDARUnc` (see SURVEY.md):

- spherical range-image projection of point clouds, on-device (ops.projection)
- conv FPN encoder-decoder segmentation models (models.fpn), SalsaNext baseline
- Dirichlet evidential uncertainty + MC-dropout + temperature scaling (prob.*)
- the full Dirichlet loss zoo with an adaptive GradNorm balancer (losses.*)
- streaming calibration metrics: mIoU / ECE / AUROC / AURC (metrics.*)
- jitted train/eval loops, orbax checkpoints, data-parallel pjit (train.*, parallel.*)

Design notes vs the reference (all citations are into /root/reference):

* The reference is pure Python/PyTorch, single GPU, no tests. This framework is
  functional JAX: params pytrees + pure apply fns, explicit state threading, and
  everything on the hot path compiled under `jax.jit`.
* Arrays are NHWC (TPU-native), not NCHW.
* MC-dropout is a vmapped stochastic forward (and for FPN models only the
  post-dropout decoder is resampled), not T sequential full forwards
  (reference: src/utils/mc_dropout.py:114-119).
* Streaming metrics use fixed-shape on-device sufficient statistics instead of
  host-side reservoir sampling (reference: src/metrics/ece.py:93-111).
"""

__version__ = "0.1.0"
