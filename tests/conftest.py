"""Test environment: run everything on CPU with 8 virtual devices so sharding
tests exercise a real mesh without TPU hardware (SURVEY.md §4 test strategy).

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin registers itself at interpreter startup and
# ignores JAX_PLATFORMS; these config knobs reliably force the 8-device CPU
# mesh the sharding tests need.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# persistent compile cache: repeated test runs hit the disk cache. The
# XLA:CPU AOT entries are host-ISA-specific, so the dir is partitioned by
# a CPU-feature fingerprint (utils/cache.py) — entries written on a
# previous host would otherwise all fail to load and force cold compiles.
from sp_gan_tpu.utils.cache import _host_cpu_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SPGAN_JAX_CACHE")
    or f"/root/repo/.jax_cache/cpu-{_host_cpu_fingerprint()}",
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Fast gate (VERDICT r3 next-round #4): the suite's wall time is dominated by
# XLA:CPU compiles of the fused G+D train-step program — one ~20-70s compile
# per distinct config, ~25 min cold for the full suite. Tests matching the
# node-id substrings below are marked `slow`; the quick gate
#
#     pytest -m "not slow" -q      (~4 min cold, ~2 min warm cache)
#     pytest -q                    (full, ~25-30 min cold)
#
# keeps one representative per subsystem (single train step, 8-device DP
# step, trainer epoch loop, a point-sharded EMD) so it still exercises every
# layer end-to-end. Timings recorded in README.md.
# ---------------------------------------------------------------------------
_SLOW_NODES = [
    # point-sharded train step: full fused-step shard_map compiles (~400s)
    "test_points_sharding.py::TestPointShardedTrainStep",
    "test_points_sharding.py::TestShardedWganGp",
    "test_points_sharding.py::TestPointShardedEmdProtocol",
    "test_points_sharding.py::TestPointShardedEmd::test_matches_unsharded",
    "test_bn_semantics.py::TestShardedExecution",
    # trainer variants beyond the representative epoch loop
    "test_trainer.py::TestTrainer::test_chunked_stepping_covers_all_steps",
    "test_trainer.py::TestTrainer::test_augment_path",
    "test_trainer.py::TestInLoopEval",
    "test_trainer.py::TestWarmStart",
    # fused-step objective/feature variants (one compile each)
    "test_train_step.py::TestSingleStep::test_wgan_gp_step",
    "test_train_step.py::TestSingleStep::test_other_objectives",
    "test_train_step.py::TestSingleStep::test_ema_tracks",
    "test_train_step.py::TestNanGuard",
    "test_train_step.py::TestCheckpoint::test_from_checkpoint_ema",
    "test_train_step.py::TestDataParallel::test_sharded_matches_single_device",
    "test_fused_train_generator.py::TestFusedTrainGenerator::test_grads_match",
    "test_models.py::TestTemplateBatchConst",
    "test_models.py::TestPoolCommute",
    "test_cutmix.py::TestCutMix::test_mix_wired_step",
    "test_losses.py::TestPenalties::test_wgan_gp_emd_pairing_in_train_step",
    "test_torch_parity.py::TestFullNParity",
    "test_approx_knn.py::TestGeneratorIntegration::test_train_step_grads_flow",
    "test_pointnet.py::TestPointConv",
    "test_pointnet.py::TestPointTransformer",
]


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy-compile test excluded from the quick gate "
        "(pytest -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(s in item.nodeid for s in _SLOW_NODES):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
