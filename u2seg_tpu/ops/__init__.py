from u2seg_tpu.ops import losses, mask_paste, nms, norms, roi_align

__all__ = ["losses", "mask_paste", "nms", "norms", "roi_align"]
