"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test run so
multi-chip sharding logic is testable without TPU hardware (SURVEY.md §4).
"""

import os

# Force CPU: the ambient env pins JAX_PLATFORMS=axon (the real TPU tunnel)
# and sitecustomize force-registers the axon PJRT plugin whenever
# PALLAS_AXON_POOL_IPS is set — clear both BEFORE any jax import so tests
# run on a virtual multi-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

# The production default VCT_SCAN_UNROLL=2 (a measured TPU win,
# pipeline/step.py) roughly doubles every frame-scan COMPILE on the CPU
# backend — it pushed the full suite from ~25 to >50 min. Unrolling is
# semantics-exact (pure lax.scan restructuring), so tests pin unroll=1 for
# compile speed; override with VCT_SCAN_UNROLL in the env to test 2.
os.environ.setdefault("VCT_SCAN_UNROLL", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# sitecustomize registers the axon TPU plugin at interpreter startup (before
# conftest) and pins jax_platforms; backends init lazily, so overriding the
# config here still wins as long as no array op ran yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1702)


# XLA:CPU's compiler segfaults (inside backend_compile_and_load) once a
# single process has accumulated a few thousand compiled executables —
# reproduced deterministically at ~test 210 of the full suite on the
# 1-core round-5 box, in whichever compile-heavy test sits there
# (cascade integration, then pallas_crops after that test was lightened).
# Dropping the jit caches periodically releases the loaded executables and
# keeps the process under the threshold; shared-program recompiles across
# module boundaries cost far less than the suite's own per-module compiles.
_TESTS_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True)
def _bound_xla_cpu_compile_aging():
    yield
    _TESTS_SINCE_CLEAR[0] += 1
    if _TESTS_SINCE_CLEAR[0] >= 50:
        _TESTS_SINCE_CLEAR[0] = 0
        jax.clear_caches()


# Tests measured > ~10 s on the 8-device CPU mesh (regenerate with
# `pytest --durations=40`): auto-marked `slow` so `-m "not slow"` gives a
# < 5 min inner loop. Parametrized entries mark every param id. The FULL
# suite stays the pre-commit bar for tracker/kernel/pipeline changes.
_SLOW = {
    ("test_multihost.py", "test_two_process_camera_fleet"),
    ("test_pallas_cascade.py", "test_tracker_fused_cascade_integration"),
    ("test_pallas_cascade.py", "test_fused_cascade_many_random"),
    ("test_pallas_cascade.py", "test_fused_cascade_batched_classes"),
    ("test_graft_entry.py", "test_dryrun_multichip_self_bootstraps_ambient_env"),
    ("test_multicam_pipeline.py", "test_multicam_pipeline_runs"),
    ("test_multicam_pipeline.py", "test_multicam_matches_serial_csv"),
    ("test_multicam_pipeline.py", "test_multicam_ragged_lengths_match_serial"),
    ("test_multicam_pipeline.py", "test_multicam_per_camera_params_match_serial"),
    ("test_multicam_pipeline.py", "test_run_cli_multicam"),
    ("test_multicam_pipeline.py", "test_multicam_per_camera_fault_isolation"),
    ("test_multicam_pipeline.py", "test_multicam_mixed_geometry_groups"),
    ("test_framedp.py", "test_framedp_matches_chained_small_batches"),
    ("test_framedp.py", "test_frame_parallel_pipeline_csv_matches_serial"),
    ("test_framedp.py", "test_frame_parallel_detect_only_csv"),
    ("test_pipeline_e2e.py", "test_pipeline_end_to_end"),
    ("test_serving.py", "test_pipeline_step_export_matches_live"),
    ("test_serving.py", "test_multicam_export_roundtrip"),
    ("test_serving.py", "test_cli_export_and_smoke"),
    ("test_pipeline_e2e.py", "test_profile_flag_writes_trace"),
    ("test_pipeline_e2e.py", "test_observability_stage_timer_and_debug"),
    ("test_reference_parity.py", "test_crowded_frame_full_facade_matches_reference"),
    ("test_feat_dtype.py", "test_bf16_storage_matches_f32_decisions"),
    ("test_yuv420.py", "test_pipeline_step_accepts_content_upload"),
    ("test_golden_csv.py", "test_chain_is_deterministic"),
    ("test_exact_topk.py", "test_headwise_tail_small_pre_nms_topk"),
    ("test_reid_train.py", "test_dp_sharded_train_step_matches_single"),
    ("test_reid_train.py", "test_train_step_reduces_loss"),
    ("test_reid_train.py", "test_fit_best_checkpoint"),
    ("test_yolo_variants.py", "test_variant_forward_shapes"),
    ("test_convert.py", "test_detector_facade_smoke"),
    ("test_detect_tail.py", "test_fused_tail_through_forward"),
    ("test_detect_tail.py", "test_fused_tail_bitwise_equal"),
    ("test_detect_tail.py", "test_fused_tail_high_threshold_empty"),
    ("test_multicam.py", "test_multicam_sharded_step"),
    ("test_pallas_crops.py", "test_tier_boundary_heights"),
    ("test_pallas_crops.py", "test_kernel_matches_xla_random"),
    ("test_pallas_crops.py", "test_kernel_matches_xla_edge_cases"),
    ("test_pallas_crops.py", "test_embed_path_kernel_vs_xla"),
    ("test_pallas_cascade_cp.py", "test_class_parallel_matches_grid_kernel"),
    ("test_deepsort_facade.py", "test_deepsort_frame_end_to_end"),
    ("test_embed_crowded.py", "test_all_valid_dets_embedded_beyond_chunk"),
    ("test_embed_crowded.py", "test_batch_embed_matches_per_frame"),
    ("test_embed_crowded.py", "test_crop_transform_applied_in_batch"),
    ("test_yolo.py", "test_bf16_close_to_f32"),
    ("test_pallas_assignment.py", "test_solve_uniform_matches_cond_form"),
    ("test_reid.py", "test_init_shapes_and_train_stats"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.fspath.basename
        name = getattr(item, "originalname", None) or item.name
        if (fname, name) in _SLOW:
            item.add_marker(pytest.mark.slow)
