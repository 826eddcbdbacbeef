"""Project plugins.

Counterpart of ``detectron2/projects/__init__.py:13`` (namespace path hook
for the projects/ gallery). Here projects are ordinary subpackages that
register their meta-archs/heads into the same registries:

  pointrend      point-sampled mask refinement (PointRend)
  deeplab        DeepLabV3(+) semantic heads + ASPP
  panoptic_deeplab  box-free panoptic (center+offset) heads
"""
