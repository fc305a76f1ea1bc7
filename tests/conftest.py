"""Test config: force an 8-device virtual CPU mesh so sharding tests run
anywhere (SURVEY.md §4 — the reference has no tests; multi-chip behavior is
validated on host devices via XLA's host-platform device-count flag).

Note: this environment pre-imports jax at interpreter startup (sitecustomize),
so plain env-var exports are too late — we must go through jax.config, which
takes effect as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat suite runs skip recompiles. The dir
# is host-fingerprinted like every other entrypoint's (utils/backend) so a
# stale XLA:CPU AOT blob from another toolchain/machine state is never
# blind-loaded (cpu_aot_loader feature-mismatch warnings / SIGILL risk).
from tpu3dlm.utils.backend import host_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/tpu3dlm_jax_cache_tests/" + host_fingerprint(),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
