"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; sharding correctness is validated on
host-platform virtual devices instead. Set PIENERF_TEST_TPU=1 to run the
suite against the real chip.

Note: the f64 GMLS/assembly precompute runs in numpy, so tests do not enable
jax_enable_x64 — the jitted per-step code is float32 exactly as on TPU.
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

import jax  # noqa: E402

if not os.environ.get("PIENERF_TEST_TPU"):
    # The hosted TPU plugin ignores the JAX_PLATFORMS env var; the config
    # knob is authoritative.
    jax.config.update("jax_platforms", "cpu")


# --- fast tier (`pytest -m fast`): sub-2-minute signal -----------------------
#
# The full non-slow suite takes ~13 min cold on one CPU (round-3 review
# weakness #6). Every test NOT marked `slow` and NOT in the measured
# >=3s-per-test list below is auto-marked `fast`; the curated exclusions are
# frame-level end-to-end tests whose subsystems all also have sub-3s unit
# coverage. Durations measured with `pytest -m "not slow" --durations=60`
# (2026-08-18, this image). Keep new heavy tests out of the tier by adding
# them here (or marking them slow).

_FAST_EXCLUDE = {
    # Re-measured 2026-08-19 (this image, sequential): these seven were the
    # long tail of a 12-minute `-m fast` run (358s + 57 + 56 + 39 + 36 + 31
    # + 29). Each subsystem keeps sub-3s unit coverage in the tier.
    "test_training.py::test_end_to_end_training_fits_scene",
    # Round-5 demotions to keep `-m fast` under its 2-minute bar: the 49k-IP
    # chunk oracle (22s) and the GUI bridge (20s) move to the full tier;
    # both subsystems keep fast coverage (test_solver rest/trajectory tests,
    # test_viewer logic tests). In exchange the trained-field golden gains a
    # 96x96 twin IN the tier (ADVICE r4) so fidelity regressions trip by
    # default.
    "test_solver.py::test_chunk_split_cells_match_float64_oracle",
    "test_trainer_features.py::test_test_gui_bridge",
    "test_raymarch.py::test_mark_untrained",
    "test_deformed.py::test_translated_object_renders_translated",
    "test_viewer.py::test_train_viewer_runs_and_accumulates",
    "test_viewer.py::test_sim_viewer_http_roundtrip",
    "test_cut_mode.py::test_cut_mode_rest_pose_consistent",
    "test_trainer_features.py::test_ema_decay_matches_reference_epoch_cadence",
    "test_trainer_features.py::test_precision_tail_switches_to_f32",
    "test_trainer_features.py::test_checkpoint_guards_refuse_non_finite_state",
    "test_trained_golden.py::test_trained_field_golden",
    # Round-5 gating/cut-split losslessness: interpret-mode Pallas compiles
    # dominate (~20s each on CPU); the XLA gating arm stays in the tier, the
    # fused/exact gating arms and the cut-split partition contract run in the
    # full tier (`pytest tests/` — the tier CI runs nightly and bench rounds
    # run before shipping render changes).
    "test_tile_kernel.py::test_candidate_gated_tile_activity_is_lossless_fused_exact",
    "test_tile_kernel.py::test_cut_split_matches_single_pass",
    "test_wide_student.py::test_wide_student_checkpoint_arch_adoption",
    "test_wide_student.py::test_fused_frame_wide_matches_xla_path",
    "test_clip_guidance.py::test_guidance_wrapper_api",
    "test_sharding.py::test_sharded_train_step_matches_single",
    "test_sharding.py::test_sharded_sim_step_matches_single",
    "test_sharding.py::test_sharded_render_matches_single",
    "test_cascade.py::test_cut_bounds_interactive_end_to_end",
    "test_cascade.py::test_cascade2_golden_frame",
    "test_cascade.py::test_cascade2_outer_region_gated_by_level1_bits",
    "test_cascade.py::test_dt_gamma_render_end_to_end",
    "test_patch_lpips.py::test_patch_training_step_runs",
    "test_patch_lpips.py::test_lpips_pipeline_properties",
    "test_patch_lpips.py::test_evaluate_writes_artifacts",
    "test_patch_lpips.py::test_lpips_weight_file_roundtrip",
    "test_tile_kernel.py::test_reach_halo_beats_legacy_one_bin_halo_vs_exact",
    "test_tile_kernel.py::test_fused_tightened_frame_matches_untightened",
    "test_tile_kernel.py::test_block_tiles_batching_is_exact",
    "test_tile_kernel.py::test_paired_mlp_co_scheduling_matches_unpaired",
    "test_tile_kernel.py::test_fused_vs_exact_bending_found_samples",
    "test_tile_kernel.py::test_capacity_overflow_is_counted_not_silent",
    "test_tile_kernel.py::test_tile_overflow_counted",
    "test_tile_kernel.py::test_prep_candidates_tighten_margin",
    "test_tile_kernel.py::test_fused_translation_equivariance",
    "test_tile_kernel.py::test_fused_static_matches_xla_path",
    "test_tile_kernel.py::test_prep_candidates_sorted_and_binned",
    "test_trainer_features.py::test_mesh_export_from_trainer",
    "test_trainer_features.py::test_scan_nan_tripwire_falls_back_to_eager",
    "test_trainer_features.py::test_eager_train_fallback_matches_interface",
    "test_trainer_features.py::test_error_map_training",
    "test_trainer_features.py::test_host_resident_dataset_training",
    "test_distill.py::test_distill_step_and_agreement_run",
    "test_deformed.py::test_rest_pose_deformed_matches_static",
    "test_deformed.py::test_deformed_full_image_helper",
    "test_sharded_render.py::test_sharded_frame_matches_single",
    "test_pipeline.py::test_frame_step_rest_matches_static",
    "test_pipeline.py::test_frame_step_force_deforms_image",
    "test_interactive.py::test_exact_oracle_matches_xla_path_on_dense_cloud",
    "test_interactive.py::test_fast_pack_matches_general_single_newton",
    "test_interactive.py::test_interactive_translation_equivariance",
    "test_interactive.py::test_beam_bend_identity_and_translation",
    "test_interactive.py::test_interactive_frame_runs_and_is_sane",
    "test_cut_mode.py::test_cut_mode_renders_static_outside",
    "test_goldens.py::test_golden_frames",
    "test_models.py::test_native_checkpoint_roundtrip",
    "test_models.py::test_network_background",
    "test_models.py::test_torch_ngp_roundtrip",
    "test_models.py::test_network_bf16_compute_close_to_f32",
    "test_models.py::test_hash_encode_full_scale_runs_and_differentiates",
    "test_models.py::test_hash_encode_interpolates_continuously",
    "test_models.py::test_network_shapes_and_ranges",
    "test_models.py::test_hash_encode_input_gradients",
    "test_models.py::test_hash_encode_oob_is_zero",
    "test_fast_render.py::test_fast_render_matches_analytic_sphere",
    "test_fast_render.py::test_fast_render_gradients_flow",
    "test_clip_guidance.py::test_clip_train_step_descends",
    "test_clip_guidance.py::test_clip_loss_is_negative_cosine_and_differentiable",
    "test_clip_guidance.py::test_image_tower_matches_transformers",
    "test_raymarch.py::test_march_and_composite_analytic_sphere",
    "test_raymarch.py::test_occupancy_update_marks_sphere",
    "test_solver.py::test_bf16_b_trajectory_matches_f32",
    "test_bending.py::test_bend_points_identity_map_is_identity",
    "test_renderer.py::test_render_image_tiles_evenly_and_unevenly",
    "test_renderer.py::test_render_rays_gradients_flow",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if "slow" in item.keywords:
            continue
        base = getattr(item, "originalname", None) or item.name
        nid = f"{os.path.basename(str(item.fspath))}::{base}"
        if nid in _FAST_EXCLUDE:
            continue
        item.add_marker(pytest.mark.fast)
