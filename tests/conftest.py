"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (driver benches separately on the real chip)."""
import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the session may point at a
# TPU backend); tests exercise sharding on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# the axon sitecustomize hard-sets jax_platforms via jax.config at interpreter
# start; the env var alone does not win — override through the config too
_FORCE_CPU_CONFIG = True
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

if _FORCE_CPU_CONFIG:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.device_count() >= 8, (
    f"expected the 8-device virtual CPU mesh, got {jax.devices()}")


@pytest.fixture(autouse=True, scope="module")
def _free_compiled_programs_between_modules():
    """Release compiled XLA:CPU executables after each test module.

    A full-suite run accumulates hundreds of JIT-compiled programs in one
    process; past ~200 tests the resident LLVM-JITed code is large enough
    that compiling this repo's biggest CPU programs (the RANSAC/LM
    while-loops in test_parity_ransac) segfaults inside XLA:CPU — observed
    twice at the identical test, while the same module standalone passes.
    Dropping the jit caches between modules keeps resident code bounded;
    within-module caching (where reuse actually happens) is unaffected."""
    yield
    jax.clear_caches()
    gc.collect()
