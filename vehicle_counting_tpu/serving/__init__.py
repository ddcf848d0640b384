"""AOT serving: export the fused device steps as deployable artifacts.

See artifact.py for the format; cli.py for the `python -m
vehicle_counting_tpu.serving.cli` export/smoke commands. The reference has
no serving story at all (every process re-imports torch and re-traces —
/root/reference/networks/yolo.py:58); this is the TPU-native replacement:
trace + lower once, serve from serialized StableHLO.
"""

from vehicle_counting_tpu.serving.artifact import (  # noqa: F401
    FORMAT_VERSION,
    ServingArtifact,
    export_detect_step,
    export_framedp_step,
    export_multicam_step,
    export_pipeline_step,
    load_weights_bundle,
    save_artifact,
    save_weights_bundle,
    serving_frames_shape,
)

__all__ = [
    "FORMAT_VERSION",
    "ServingArtifact",
    "export_detect_step",
    "export_framedp_step",
    "export_multicam_step",
    "export_pipeline_step",
    "load_weights_bundle",
    "save_artifact",
    "save_weights_bundle",
    "serving_frames_shape",
]
