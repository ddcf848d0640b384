from vehicle_counting_tpu.ops.boxes import (
    xyxy_to_tlwh,
    tlwh_to_xyxy,
    xyxy_to_cxcywh,
    cxcywh_to_xyxy,
    tlwh_to_xyah,
    xyah_to_tlwh,
    clip_boxes,
    iou_matrix,
    sort_overlap_matrix,
)
from vehicle_counting_tpu.ops.letterbox import letterbox_params, letterbox, restore_boxes
from vehicle_counting_tpu.ops.nms import greedy_suppress, batched_nms, sort_nms_mask
from vehicle_counting_tpu.ops.crops import gather_crops, crop_boxes_to_bounds, CROP_SIZE
