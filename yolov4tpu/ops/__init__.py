from .nms import combined_nms, nms, pairwise_iou_corners  # noqa: F401
