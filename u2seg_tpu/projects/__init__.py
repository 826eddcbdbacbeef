"""Project plugins.

Counterpart of ``detectron2/projects/__init__.py:13`` (namespace path hook
for the projects/ gallery). Here projects are ordinary subpackages that
register their meta-archs/heads into the same registries:

  pointrend      point-sampled mask refinement (PointRend)
  deeplab        DeepLabV3(+) semantic heads + ASPP
  panoptic_deeplab  box-free panoptic (center+offset) heads
  tridentnet     multi-branch dilated trident blocks
  pointsup       point-supervised instance segmentation (PointSup)
  rethinking_bn  head-BN experiment variants (Rethinking-BatchNorm)
  tensormask     dense sliding-window mask prediction (TensorMask)
"""
