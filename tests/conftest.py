"""Test config: force CPU backend with 8 virtual devices (multi-chip
sharding tests run on a virtual mesh, mirroring SURVEY.md §4's plan).

NOTE: this environment preimports jax via sitecustomize with
JAX_PLATFORMS=axon (the real-TPU tunnel).  Env vars are read at jax
import time, so the only reliable override is jax.config.update.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize)
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

# ---------------------------------------------------------------------------
# test tiers: `pytest -m "not slow"` is the fast iteration tier (<3 min);
# the full suite stays the merge gate.  Curated from --durations data
# (compile-heavy tests dominate; re-curate when adding heavy tests).
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    'test_grad_checkpointing_same_grads',
    'test_sharded_attention_beam_identical',
    'test_sharded_rescoring_identical',
    'test_efficient_conformer_via_registry',
    'test_dummy_rows_keep_loss_finite_and_scaled',
    'test_paraformer_loss',
    'test_train_then_recognize',
    'test_recognize_paraformer_pipelined_branch',
    'test_train_profile_dir_writes_trace',
    'test_dryrun_multichip_8dev',
    'test_quantized_runner_matches_fp',
    'test_encoder_grad_flows',
    'test_firered_loss_and_attention_decode',
    'test_ctl_model_loss',
    'test_attention_search_and_rescoring',
    'test_lora_ga_reinit',
    'test_lora_injection_and_masking',
    'test_joint_loss_parity',
    'test_attention_rescoring_winner_parity',
    'test_attention_beam_search_parity',
    'test_whisper_loss_parity',
    'test_whisper_encoder_parity',
    'test_whisper_attention_pipelined_matches_sequential',
    'test_sensevoice_loss',
    'test_relpos_flash_matches_reference',
    'test_entry_compiles_small',
    'test_bestrq_loss',
    'test_flash_backward_bias_grad',
    'test_train_on_device_frontend',
    'test_export_full_symbolic_dims',
    'test_moe_expert_parallel_sharding',
    'test_exported_asr_decoder_streaming',
    'test_squeezeformer_forward',
    'test_efficient_conformer_forward',
    'test_cli_transcribe_and_align',
    'test_wav2vec2_loss',
    'test_train_step_reduces_loss',
    'test_asr_decoder_streaming',
    'test_relpos_attention_module_flash_dispatch',
    'test_predictor_step_matches_forward',
    'test_transducer_beam_matches_exhaustive',
    'test_rnnt_loss_grad_finite',
    'test_squeezeformer_train_mode',
    'test_lfmmi_loss_trains',
    'test_hlg_onebest_and_rescore',
    'test_export_chunk_roundtrip',
    'test_label_checker',
    'test_transducer_loss',
    'test_mixed_precision_bf16_step',
    'test_flash_backward_matches_xla',
    'test_embedding_api_on_trained_model',
    'test_asr_model_train_mode_with_dropout_and_bn',
    'test_whisper_decoder_parity',
    'test_zero2_optimizer_state_sharding',
    'test_ebranchformer_streaming_matches_full',
    'test_websocket_roundtrip',
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split('[')[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
