"""Test configuration: force an 8-virtual-device CPU mesh.

The environment may pre-register a TPU PJRT plugin at interpreter start
(before conftest runs), so simply setting JAX_PLATFORMS here is not
enough — we update the jax config and clear any already-initialized
backends. This replaces the reference's nonexistent distributed-test
story (SURVEY.md §4): every multi-chip sharding test runs against 8
virtual CPU devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends  # noqa: E402
except ImportError:  # pragma: no cover - older jax
    from jax._src.api import clear_backends  # noqa: E402
clear_backends()
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# `slow` marking (VERDICT r3 next-#7): the full suite measured 40:42 on
# this 1-CPU box (/tmp/pytest_durations.log, 2026-08-20) — far past the
# documented 10-minute budget, and suites that slow stop getting run.
# The heavyweights below (multi-process runs, recipe shells, CLI e2e
# drives, grad-equivalence checks that train real steps) are marked
# `slow` here centrally and DESELECTED BY DEFAULT via pyproject's
# addopts = -m "not slow".  Run everything with `pytest tests/ -m ''`,
# or only the heavy set with `-m slow`.  The fast default keeps every
# numerics oracle, decode algorithm, codec golden and sharding-rule
# test; the slow set re-checks the same code through process/CLI/e2e
# surfaces.
# ---------------------------------------------------------------------------

SLOW_FILES = {
    "test_train_cli_accum.py",   # 367 s: CLI accum-equivalence drive
    "test_multihost.py",         # 173 s: 2 real jax.distributed procs
    "test_recipe_shell.py",      # 316 s: executes all 4 recipe run.sh
    "test_pipeline.py",          # 209 s: GPipe grad-equivalence
    "test_train_lm_spmd.py",     # 72 s: LM CLI over the mesh
    "test_overfit.py",           # 46 s: 60-step overfit run
    "test_bpe_e2e.py",           # 35 s: BPE train->encode->decode e2e
    "test_integration.py",       # 70 s+: train->ckpt->decode->WER e2e
    "test_decode_multidevice.py",  # 60 s: dp-fanout decode equality
}

SLOW_TESTS = {
    "test_moe_sharded_ep_matches_unsharded",       # 72 s
    "test_moe_train_step_collects_aux_and_learns",  # 36 s
    "test_sharded_train_step_dp_tp",               # 71 s
    "test_grad_accumulation_matches_big_batch",    # 55 s
    "test_attention_beam_matches_oracle",          # 49 s
    "test_gradients_flow",                         # 45 s
    "test_stream_recognize_cli_slots",             # 39 s
    "test_cmvn_full_loop",                         # 32 s
    "test_recognize_cli_timestamp_file",           # 30 s
    "test_train_loss_decreases",                   # 28 s
    "test_feat_manifest_end_to_end",               # 27 s
    "test_ar_lm_loss_and_grads",                   # 24 s
    "test_nonfinite_grad_skipped",                 # 24 s
    "test_concurrent_sessions_match_direct",       # 24 s
}


def pytest_collection_modifyitems(config, items):
    seen_files, seen_tests = set(), set()
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[")[0]
        if fname in SLOW_FILES or base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
            seen_files.add(fname)
            seen_tests.add(base)
    # On full-collection runs (no path/node filtering), every SLOW_*
    # entry must have matched — a renamed or removed test otherwise
    # silently rejoins the fast suite / leaves a dead entry (ADVICE r4).
    full = all(not a.endswith(".py") and "::" not in a for a in config.args)
    if full and items:
        stale = (SLOW_FILES - seen_files) | (SLOW_TESTS - seen_tests)
        assert not stale, (
            f"stale SLOW_FILES/SLOW_TESTS entries (renamed test?): {stale}")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
