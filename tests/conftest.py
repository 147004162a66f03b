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
    f"/root/repo/.jax_cache/cpu-{_host_cpu_fingerprint()}",
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
