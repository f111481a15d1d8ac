"""Test harness config: run JAX on 8 virtual CPU devices.

Multi-chip sharding is tested without a TPU pod by forcing the host platform
and splitting it into 8 fake devices (SURVEY §4 distributed-test strategy).
Must run before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Golden-parity tests import the tf.keras reference implementation, which is
# keras-2 era code: route tf.keras to the legacy tf_keras package, and turn
# off oneDNN's reordered accumulation so TF-CPU vs XLA-CPU comparisons
# measure semantics rather than summation order.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# NOTE: XLA:CPU hard-aborts the process when replicas reach a collective
# more than 40 s apart, and no flag accepted by this jaxlib stretches that
# timer.  On a 1-core host the N virtual replicas time-slice the core, so
# the mesh tests instead keep per-replica work small (32px inputs, shallow
# csp_repeats) to stay inside the rendezvous window — see the docstrings in
# tests/test_train.py.

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# In this environment a TPU PJRT plugin may claim the backend even when
# JAX_PLATFORMS=cpu is exported (plugin discovery precedes env handling), and
# jax 0.9 ignores --xla_force_host_platform_device_count.  The config API
# wins in both cases; it must run before the first backend use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the 110-conv graph is expensive to compile on
# one CPU core; cache hits make repeat test runs fast.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# --- Test tiers -----------------------------------------------------------
# The full suite costs ~60 min on a 1-core host (the 110-conv graph compiles
# dominate).  These tests each measured >=25s there (durations snapshot,
# round 4); marking them `heavy` leaves a <10-minute inner-loop tier:
#     python -m pytest tests/ -q -m "not slow and not heavy"
# The FULL suite (no -m filter; slow golden parity included) remains the gate
# for commits that touch the train step, mesh paths, or serving export.
# One central set (not 30 scattered decorators) so the tier is auditable
# and editable in one place.
_HEAVY = {
    "test_accum_padded_tail_trains_instead_of_dropping",
    "test_api_quantize_roundtrip",
    "test_bn_stats_gradient_flag",
    "test_bn_train_updates_moving_stats",
    "test_chunked_step_nonaligned_batch",
    "test_cosine_callback_drives_optimizer",
    "test_dp_mesh_equivalence",
    "test_dp_train_mode_gradient_equivalence",
    "test_encode_on_device_multiscale_matches_host_per_size",
    "test_encode_on_device_step_matches_host",
    "test_eval_map_callback_during_fit",
    "test_export_custom_thresholds",
    "test_export_load_round_trip",
    "test_export_multiplatform_xla",
    "test_export_quantized_model",
    "test_forward_shapes_and_grid_derivation",
    "test_grad_accum_ragged_batch_pads_everywhere",
    "test_grad_accum_step",
    "test_masked_step_matches_trimmed",
    "test_mesh_accum_masked_weights_local_counts",
    "test_mesh_grad_accum_step",
    "test_mesh_masked_step_weights_by_valid_count",
    "test_mesh_step_uint8_matches_float",
    "test_mesh_step_with_encode_on_device",
    "test_overfit_tiny_synthetic",
    "test_predict_batch_ragged_pads_to_aligned",
    "test_quantize_composes_with_distribute",
    "test_shard_map_train_step",
    "test_spatial_sharded_inference_matches_single",
    "test_train_step_bfloat16",
    "test_train_step_handles_multiple_sizes",
    "test_train_step_pallas_wgrad_matches_default",
    "test_train_step_runs_and_updates",
    "test_train_step_sat",
    "test_trainer_checkpoint_resume",
    "test_trainer_fit_smoke",
    "test_trainer_fit_uint8_wire",
    "test_twophase_heterogeneous_matches_fused",
    "test_two_process_distributed_step",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _HEAVY:
            item.add_marker(pytest.mark.heavy)


@pytest.fixture()
def rng():
    # Function-scoped: every test gets a fresh deterministic stream, so test
    # outcomes can't depend on which tests ran earlier in the session.
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def tiny_classes(tmp_path_factory):
    """A 3-class class-name file (mirrors bccd_classes.txt structure)."""
    p = tmp_path_factory.mktemp("classes") / "classes.txt"
    p.write_text("WBC\nPlatelets\nRBC\n")
    return str(p)
