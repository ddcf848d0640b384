"""Device info string (reference: utilities/cuda.py:14-19, TPU-native)."""

from __future__ import annotations


def get_devices_info() -> str:
    import jax

    devices = jax.devices()
    lines = [f"Backend: {jax.default_backend()} ({len(devices)} device(s))"]
    for d in devices:
        kind = getattr(d, "device_kind", "?")
        lines.append(f"  [{d.id}] {kind} process={d.process_index}")
    return "\n".join(lines)
