from u2seg_tpu.structures import boxes, masks
from u2seg_tpu.structures.instances import Detections, GtInstances, pad_to

__all__ = ["boxes", "masks", "Detections", "GtInstances", "pad_to"]
