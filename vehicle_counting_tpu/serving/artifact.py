"""AOT serving artifacts: the fused device steps as versioned StableHLO.

The deployment unit of the reference is "a Python process that re-imports
torch, re-downloads/unpickles the checkpoint, and re-traces the model"
(/root/reference/networks/yolo.py:14-17,58 — torch.hub load + AutoShape
per process). TPU-native serving wants the opposite: trace + lower ONCE,
then ship a self-describing directory a serving host can load and execute
with no model-construction Python, no retracing, and no dependency on the
exact source revision that built it. `jax.export` gives exactly that
(serialized StableHLO with a versioned calling convention; the Mosaic
`tpu_custom_call` target used by the Pallas cascade/crop kernels is on
jax.export's guaranteed-stable list, so TPU exports carry the hand-written
kernels too).

Artifact layout (one directory):

    manifest.json        format/package/jax versions, per-function entries
                         (file, sha256, platforms, avals, device count),
                         the full static config (geometry, thresholds,
                         DeepSortParams/TrackerParams/YoloConfig fields),
                         and which kernel paths were traced in
    pipeline_step.bin    serialized Exported: detect + embed + track for a
                         frame batch (pipeline/step.py::pipeline_batch_step)
    detect_step.bin      serialized Exported: detect-only (BASELINE config 1)
    weights.npz          optional: yolo/reid params + reid stats bundled as
                         a path-encoded flat tree (self-contained artifact)

Exported calling conventions (positional, pytrees of arrays only — all
static config is baked at export time):

    pipeline_step(yolo_params, reid_params, reid_stats, states, frames,
                  frame_valid, class_lut) -> (new_states, det, track_outs)
    detect_step(yolo_params, yuv) -> det

`states` is the stacked per-class TrackerState NamedTuple
(`ServingArtifact.init_states()` rebuilds a zero state from the manifest);
`det` is the plain dict of boxes/scores/classes/valid in SOURCE pixels.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vehicle_counting_tpu.version import __version__

MANIFEST_NAME = "manifest.json"
WEIGHTS_NAME = "weights.npz"
FORMAT_VERSION = 1

_PYTREES_REGISTERED = False


def _register_pytrees() -> None:
    """Register NamedTuple serializations crossing the export boundary.

    Idempotent; must run before both export() and deserialize() so the
    treedefs in the serialized calling convention round-trip.
    """
    global _PYTREES_REGISTERED
    if _PYTREES_REGISTERED:
        return
    from jax import export as jexport

    from vehicle_counting_tpu.tracking.tracker import TrackerOutputs, TrackerState

    jexport.register_namedtuple_serialization(
        TrackerState, serialized_name="vct.tracking.TrackerState"
    )
    jexport.register_namedtuple_serialization(
        TrackerOutputs, serialized_name="vct.tracking.TrackerOutputs"
    )
    _PYTREES_REGISTERED = True


# ---------------------------------------------------------------------------
# path-encoded flat-tree <-> npz (weights bundling without pickle)
# ---------------------------------------------------------------------------


def _encode_paths(tree) -> Tuple[Dict[str, np.ndarray], List[List[list]]]:
    """Flatten a dict/list pytree of arrays to npz-able arrays + JSON paths."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays: Dict[str, np.ndarray] = {}
    paths: List[List[list]] = []
    for i, (path, leaf) in enumerate(flat):
        arrays[f"a{i}"] = np.asarray(leaf)
        enc = []
        for k in path:
            if isinstance(k, jax.tree_util.DictKey):
                if not isinstance(k.key, str):
                    raise TypeError(f"non-str dict key in params tree: {k.key!r}")
                enc.append(["d", k.key])
            elif isinstance(k, jax.tree_util.SequenceKey):
                enc.append(["s", k.idx])
            else:
                raise TypeError(f"unsupported pytree node on path: {k!r}")
        paths.append(enc)
    return arrays, paths


def _decode_paths(paths: List[List[list]], leaves: List[np.ndarray]):
    """Rebuild the nested dict/list tree from encoded paths (exact inverse
    of _encode_paths for trees made of dicts, lists, and array leaves)."""
    if len(paths) == 1 and not paths[0]:
        return leaves[0]
    kind = paths[0][0][0]
    assert all(p and p[0][0] == kind for p in paths), "ragged tree paths"
    groups: Dict[Any, Tuple[list, list]] = {}
    for p, leaf in zip(paths, leaves):
        sub = groups.setdefault(p[0][1], ([], []))
        sub[0].append(p[1:])
        sub[1].append(leaf)
    if kind == "d":
        return {k: _decode_paths(*g) for k, g in groups.items()}
    idxs = sorted(groups)
    assert idxs == list(range(len(idxs))), f"sequence holes: {idxs}"
    return [_decode_paths(*groups[i]) for i in idxs]


def save_weights_bundle(path: str, trees: Dict[str, Any]) -> None:
    """Bundle named param trees ({'yolo': ..., 'reid': ..., 'reid_stats': ...})
    into one npz + a JSON structure key (no pickle anywhere)."""
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {}
    for name, tree in trees.items():
        arrs, paths = _encode_paths(tree)
        base = len(arrays)
        for i in range(len(paths)):
            arrays[f"a{base + i}"] = arrs[f"a{i}"]
        meta[name] = {"first": base, "count": len(paths), "paths": paths}
    arrays["__structure__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    ).copy()
    np.savez(path, **arrays)


def load_weights_bundle(path: str) -> Dict[str, Any]:
    """Inverse of save_weights_bundle."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__structure__"]).decode("utf-8"))
        out = {}
        for name, m in meta.items():
            leaves = [z[f"a{m['first'] + i}"] for i in range(m["count"])]
            out[name] = _decode_paths(m["paths"], leaves)
    return out


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------


def _shape_structs(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not hasattr(x, "dtype")
        else jax.ShapeDtypeStruct(np.shape(x), x.dtype),
        tree,
    )


def serving_frames_shape(
    frames_format: str,
    batch: int,
    src_hw: Tuple[int, int],
    image_size: Tuple[int, int],
    content_only: bool = True,
) -> Tuple[int, ...]:
    """The [B, ...] uint8 frames shape a serving host must upload, matching
    pipeline/__init__.py's producer for each frames_format."""
    from vehicle_counting_tpu.ops.letterbox import content_rows, content_upload_exact

    dh, dw = image_size
    if frames_format == "raw_rgb":
        return (batch, src_hw[0], src_hw[1], 3)
    if frames_format == "letterboxed_rgb":
        return (batch, dh, dw, 3)
    if frames_format == "letterboxed_yuv420":
        if content_only and content_upload_exact(src_hw, image_size):
            _, ch = content_rows(src_hw, image_size)
            return (batch, ch * 3 // 2, dw)
        return (batch, dh * 3 // 2, dw)
    raise ValueError(f"unknown frames_format: {frames_format}")


def _kernel_modes(hp=None) -> Dict[str, str]:
    """Which Pallas paths the current backend would trace into the export."""
    from vehicle_counting_tpu.tracking import deepsort as ds
    from vehicle_counting_tpu.tracking import tracker as tr

    modes = {"crops": ds._crops_kernel_mode()}
    if hp is not None:
        try:
            modes["cascade"] = tr._cascade_kernel_mode(hp.tracker)
        except Exception:
            pass
    return modes


def export_pipeline_step(
    yolo_params,
    reid_params,
    reid_stats,
    *,
    ycfg,
    hp,
    batch: int,
    image_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    dtype=jnp.bfloat16,
    frames_format: str = "letterboxed_yuv420",
    content_only: bool = True,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the fused detect+embed+track batch step. Returns Exported."""
    from jax import export as jexport

    from vehicle_counting_tpu.pipeline.step import pipeline_batch_step
    from vehicle_counting_tpu.tracking.deepsort import init_states

    _register_pytrees()

    def fn(yp, rp, rs, st, fr, fv, lut):
        return pipeline_batch_step(
            yp, rp, rs, st, fr, fv, lut,
            ycfg=ycfg, hp=hp, image_size=image_size, src_hw=src_hw,
            conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
            dtype=dtype, frames_format=frames_format,
        )

    frames_shape = serving_frames_shape(
        frames_format, batch, src_hw, image_size, content_only
    )
    states_sds = jax.eval_shape(lambda: init_states(hp))
    args = (
        _shape_structs(yolo_params),
        _shape_structs(reid_params),
        _shape_structs(reid_stats),
        states_sds,
        jax.ShapeDtypeStruct(frames_shape, jnp.uint8),
        jax.ShapeDtypeStruct((batch,), jnp.bool_),
        jax.ShapeDtypeStruct((ycfg.num_classes,), jnp.int32),
    )
    kw = {} if platforms is None else {"platforms": list(platforms)}
    return jexport.export(jax.jit(fn), **kw)(*args)


def export_detect_step(
    yolo_params,
    *,
    ycfg,
    batch: int,
    image_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    dtype=jnp.bfloat16,
    content_only: bool = True,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the detect-only step (I420 upload path). Returns Exported."""
    from jax import export as jexport

    from vehicle_counting_tpu.ops.letterbox import content_upload_exact
    from vehicle_counting_tpu.pipeline.step import detect_only_step

    _register_pytrees()
    content = content_only and content_upload_exact(src_hw, image_size)

    def fn(yp, yuv):
        return detect_only_step(
            yp, yuv,
            ycfg=ycfg, image_size=image_size, src_hw=src_hw,
            conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
            dtype=dtype, content_only=content,
        )

    frames_shape = serving_frames_shape(
        "letterboxed_yuv420", batch, src_hw, image_size, content
    )
    args = (
        _shape_structs(yolo_params),
        jax.ShapeDtypeStruct(frames_shape, jnp.uint8),
    )
    kw = {} if platforms is None else {"platforms": list(platforms)}
    return jexport.export(jax.jit(fn), **kw)(*args)


def export_multicam_step(
    yolo_params,
    reid_params,
    reid_stats,
    *,
    ycfg,
    hp,
    n_cameras: int,
    batch: int,
    image_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    devices: Optional[Sequence[Any]] = None,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    dtype=jnp.bfloat16,
    frames_format: str = "letterboxed_yuv420",
    content_only: bool = True,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the camera-sharded multi-chip step (parallel/cameras.py).

    Calling convention (note class_lut comes FOURTH here, matching
    make_multicam_step's jit):

        multicam_step(yolo_params, reid_params, reid_stats, class_lut,
                      states, frames, frame_valid) -> (new_states, track_outs)

    states leaves are [n_cameras, C, ...] (stacked per-camera TrackerState),
    frames [n_cameras, batch, ...], frame_valid [n_cameras, batch] — all
    sharded over the mesh 'cam' axis; params replicated. The artifact records
    nr_devices; the serving host must load it on a mesh of that many chips.
    """
    from jax import export as jexport
    from jax.sharding import Mesh

    from vehicle_counting_tpu.parallel.cameras import make_multicam_step
    from vehicle_counting_tpu.tracking.deepsort import init_states

    _register_pytrees()
    devs = list(devices) if devices is not None else list(jax.devices())
    if n_cameras % len(devs):
        raise ValueError(f"n_cameras={n_cameras} not divisible by {len(devs)} devices")
    mesh = Mesh(np.array(devs), ("cam",))
    step = make_multicam_step(
        mesh, ycfg=ycfg, hp=hp, image_size=image_size, src_hw=src_hw,
        conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
        dtype=dtype, frames_format=frames_format,
    )
    frames_shape = (n_cameras,) + serving_frames_shape(
        frames_format, batch, src_hw, image_size, content_only
    )
    states_one = jax.eval_shape(lambda: init_states(hp))
    states_sds = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct((n_cameras,) + s.shape, s.dtype), states_one
    )
    args = (
        _shape_structs(yolo_params),
        _shape_structs(reid_params),
        _shape_structs(reid_stats),
        jax.ShapeDtypeStruct((ycfg.num_classes,), jnp.int32),
        states_sds,
        jax.ShapeDtypeStruct(frames_shape, jnp.uint8),
        jax.ShapeDtypeStruct((n_cameras, batch), jnp.bool_),
    )
    kw = {} if platforms is None else {"platforms": list(platforms)}
    return jexport.export(step, **kw)(*args)


def export_framedp_step(
    yolo_params,
    reid_params,
    reid_stats,
    *,
    ycfg,
    hp,
    batch: int,
    image_size: Tuple[int, int],
    src_hw: Tuple[int, int],
    devices: Optional[Sequence[Any]] = None,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    dtype=jnp.bfloat16,
    frames_format: str = "letterboxed_yuv420",
    content_only: bool = True,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the frame-parallel single-camera step (parallel/frames.py).

    Calling convention (same as make_framedp_step's jit):

        framedp_step(yolo_params, reid_params, reid_stats, class_lut,
                     states, frames, frame_valid)
            -> (new_states, det, track_outs)

    frames [batch, ...] / frame_valid [batch] shard over the mesh 'frame'
    axis; params and tracker states are replicated. The artifact records
    nr_devices; batch must be divisible by it.
    """
    from jax import export as jexport
    from jax.sharding import Mesh

    from vehicle_counting_tpu.parallel.frames import make_framedp_step
    from vehicle_counting_tpu.tracking.deepsort import init_states

    _register_pytrees()
    devs = list(devices) if devices is not None else list(jax.devices())
    if batch % len(devs):
        raise ValueError(f"batch={batch} not divisible by {len(devs)} devices")
    mesh = Mesh(np.array(devs), ("frame",))
    step = make_framedp_step(
        mesh, ycfg=ycfg, hp=hp, image_size=image_size, src_hw=src_hw,
        conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
        dtype=dtype, frames_format=frames_format,
    )
    frames_shape = serving_frames_shape(
        frames_format, batch, src_hw, image_size, content_only
    )
    states_one = jax.eval_shape(lambda: init_states(hp))
    states_sds = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), states_one
    )
    args = (
        _shape_structs(yolo_params),
        _shape_structs(reid_params),
        _shape_structs(reid_stats),
        jax.ShapeDtypeStruct((ycfg.num_classes,), jnp.int32),
        states_sds,
        jax.ShapeDtypeStruct(frames_shape, jnp.uint8),
        jax.ShapeDtypeStruct((batch,), jnp.bool_),
    )
    kw = {} if platforms is None else {"platforms": list(platforms)}
    return jexport.export(step.jitted, **kw)(*args)


# ---------------------------------------------------------------------------
# artifact save / load
# ---------------------------------------------------------------------------


def _hp_to_json(hp) -> Dict[str, Any]:
    import dataclasses

    d = hp._asdict()
    d["tracker"] = dataclasses.asdict(hp.tracker)
    return d


def _hp_from_json(d: Dict[str, Any]):
    from vehicle_counting_tpu.tracking.deepsort import DeepSortParams
    from vehicle_counting_tpu.tracking.tracker import TrackerParams

    d = dict(d)
    d["tracker"] = TrackerParams(**d["tracker"])
    return DeepSortParams(**d)


def _ycfg_to_json(ycfg) -> Dict[str, Any]:
    return {
        "variant": ycfg.variant,
        "num_classes": ycfg.num_classes,
        "anchors": np.asarray(ycfg.anchors).tolist(),
        "strides": list(ycfg.strides),
    }


def _ycfg_from_json(d: Dict[str, Any]):
    from vehicle_counting_tpu.models.yolo import YoloConfig

    return YoloConfig(
        variant=d["variant"],
        num_classes=d["num_classes"],
        anchors=tuple(tuple(tuple(a) for a in lvl) for lvl in d["anchors"]),
        strides=tuple(d["strides"]),
    )


def save_artifact(
    path: str,
    *,
    exported: Dict[str, Any],
    ycfg,
    hp=None,
    config: Optional[Dict[str, Any]] = None,
    class_lut: Optional[np.ndarray] = None,
    weights: Optional[Dict[str, Any]] = None,
) -> str:
    """Write the artifact directory. `exported` maps function name ->
    jax.export.Exported; `config` carries geometry/threshold metadata;
    `weights` (optional) bundles param trees for a self-contained artifact."""
    os.makedirs(path, exist_ok=True)
    functions: Dict[str, Any] = {}
    for name, exp in exported.items():
        data = exp.serialize()
        fname = f"{name}.bin"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(data)
        functions[name] = {
            "file": fname,
            "sha256": hashlib.sha256(data).hexdigest(),
            "platforms": list(exp.platforms),
            "calling_convention_version": exp.calling_convention_version,
            "nr_devices": exp.nr_devices,
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals],
        }
    manifest: Dict[str, Any] = {
        "format_version": FORMAT_VERSION,
        "package_version": __version__,
        "jax_version": jax.__version__,
        "export_backend": jax.default_backend(),
        "kernel_modes": _kernel_modes(hp),
        "functions": functions,
        "ycfg": _ycfg_to_json(ycfg),
        "config": dict(config or {}),
    }
    if hp is not None:
        manifest["hp"] = _hp_to_json(hp)
    if class_lut is not None:
        manifest["class_lut"] = np.asarray(class_lut).astype(int).tolist()
    if weights is not None:
        save_weights_bundle(os.path.join(path, WEIGHTS_NAME), weights)
        manifest["weights_file"] = WEIGHTS_NAME
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return path


class ServingArtifact:
    """A loaded artifact: deserialized Exported functions + config."""

    def __init__(self, path: str, manifest: Dict[str, Any], exported: Dict[str, Any]):
        self.path = path
        self.manifest = manifest
        self._exported = exported

    @classmethod
    def load(cls, path: str) -> "ServingArtifact":
        from jax import export as jexport

        _register_pytrees()
        with open(os.path.join(path, MANIFEST_NAME)) as f:
            manifest = json.load(f)
        if manifest["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest['format_version']} is newer than "
                f"this package supports ({FORMAT_VERSION})"
            )
        exported = {}
        for name, entry in manifest["functions"].items():
            with open(os.path.join(path, entry["file"]), "rb") as f:
                data = f.read()
            digest = hashlib.sha256(data).hexdigest()
            if digest != entry["sha256"]:
                raise ValueError(f"{entry['file']}: sha256 mismatch (corrupt artifact)")
            exported[name] = jexport.deserialize(data)
        return cls(path, manifest, exported)

    @property
    def function_names(self):
        return sorted(self._exported)

    @property
    def ycfg(self):
        return _ycfg_from_json(self.manifest["ycfg"])

    @property
    def hp(self):
        if "hp" not in self.manifest:
            raise ValueError("artifact has no tracker config (detect-only export)")
        return _hp_from_json(self.manifest["hp"])

    def init_states(self):
        """Fresh stacked per-class TrackerState matching the exported shapes."""
        from vehicle_counting_tpu.tracking.deepsort import init_states

        return init_states(self.hp)

    def class_lut(self) -> jax.Array:
        if "class_lut" not in self.manifest:
            raise ValueError("artifact bundles no class_lut")
        return jnp.asarray(self.manifest["class_lut"], jnp.int32)

    def load_weights(self) -> Dict[str, Any]:
        """{'yolo': ..., 'reid': ..., 'reid_stats': ...} if bundled."""
        if "weights_file" not in self.manifest:
            raise ValueError("artifact bundles no weights")
        return load_weights_bundle(os.path.join(self.path, self.manifest["weights_file"]))

    def call(self, name: str, *args):
        return self._exported[name].call(*args)

    def jitted(self, name: str):
        """The exported function wrapped in ONE persistent jax.jit.

        `Exported.call` re-traces the deserialized program on every
        invocation (measured ~seconds per call); serving loops must reuse
        a single jit wrapper so repeat calls hit the C++ fast path. The
        wrapper is cached per function name.
        """
        cache = self.__dict__.setdefault("_jitted", {})
        if name not in cache:
            import jax

            cache[name] = jax.jit(self._exported[name].call)
        return cache[name]

    def pipeline_step(self, yolo_params, reid_params, reid_stats, states,
                      frames, frame_valid, class_lut):
        return self.call("pipeline_step", yolo_params, reid_params, reid_stats,
                         states, frames, frame_valid, class_lut)

    def detect_step(self, yolo_params, yuv):
        return self.call("detect_step", yolo_params, yuv)

    def bound_pipeline_step(self):
        """Self-contained closure over bundled weights + class_lut:
        step(states, frames, frame_valid) -> (new_states, det, track_outs).
        Uses the persistent jit wrapper so chained serving calls don't
        re-trace the deserialized program each time."""
        w = self.load_weights()
        lut = self.class_lut()
        fn = self.jitted("pipeline_step")

        def step(states, frames, frame_valid):
            return fn(
                w["yolo"], w["reid"], w["reid_stats"], states, frames,
                frame_valid, lut,
            )

        return step
