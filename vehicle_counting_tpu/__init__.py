"""TPU-native vehicle counting framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
kaylode/vehicle-counting (reference: /root/reference): YOLOv5 vehicle
detection -> per-class DeepSORT tracking -> ROI-polygon filtering ->
direction assignment -> per-direction/per-class counts (CSV + MP4).

Everything between video decode and CSV writing runs as fixed-shape,
jit-compiled JAX on TPU; multi-camera scale-out shards whole pipelines
over a `jax.sharding.Mesh`.

Public surface mirrors the reference (run.py / modules / utilities.counting):

    from vehicle_counting_tpu import Config, CountingPipeline
"""

from vehicle_counting_tpu.version import __version__
from vehicle_counting_tpu.configs import Config, config_from_dict

__all__ = [
    "__version__",
    "Config",
    "config_from_dict",
]


def __getattr__(name):
    # Lazy imports so that `import vehicle_counting_tpu` stays cheap and
    # does not pull in jax/cv2 for config-only users.
    if name == "CountingPipeline":
        from vehicle_counting_tpu.pipeline import CountingPipeline

        return CountingPipeline
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
