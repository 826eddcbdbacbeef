"""u2seg_tpu: TPU-native unsupervised universal image segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of U2Seg
(reference: /root/reference — a Detectron2 fork). Everything model-side is
static-shape, functional, and pjit-shardable; host-side runtime (data loading,
COCO eval) has native C++ accelerated paths.

Layout:
  structures/   fixed-size array "structures": boxes, masks, instance pytrees
  ops/          TPU kernels & numerics: ROIAlign, NMS, mask paste, norms, losses
  models/       Flax modules: ResNet, FPN, RPN, ROI heads, sem-seg, PanopticFPN
  data/         COCO loading, transforms, bucketing loader, dataset catalogs
  engine/       trainer, hooks, events, checkpointing, predictor
  evaluation/   COCO AP / mIoU / PQ + U2Seg cluster-matching protocol
  parallel/     mesh & sharding helpers (data parallelism over ICI)
  pseudo/       pseudo-label pipeline: DINO features, kNN/k-means, USL
"""

__version__ = "0.1.0"
