from vehicle_counting_tpu.models.yolo import (
    YoloConfig,
    init_yolov5,
    yolov5_forward,
    decode_predictions,
    VARIANTS,
)
from vehicle_counting_tpu.models.detector import (
    Detector,
    detect_step,
    COCO_VEHICLE_MAPPING,
    VEHICLE_CLASS_NAMES,
)
