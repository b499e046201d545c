"""Test harness: run on a virtual 8-device CPU mesh.

jax is pre-imported by the environment's sitecustomize with a TPU platform
selected, so the platform must be overridden through jax.config (env vars are
read too late).  XLA_FLAGS is still honoured because CPU client creation
happens lazily at first device use.
"""
import os

import pytest

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache for the suite.  History: round 4 first gave
# the suite its own cache dir (.jax_cache_cpu8, segregated from the chip
# jobs' .jax_cache after a cross-platform corrupt-entry abort), then hit
# two more fatal cache failures on 2026-08-21: a SIGABRT in
# put_executable_and_time when two pytest processes raced the dir, and a
# DETERMINISTIC SIGSEGV in get_executable_and_time re-loading an entry the
# same suite run had just written (XLA:CPU serialized-executable reload is
# not trustworthy on this host — the multichip dryrun disables the cache
# for the same reason, __graft_entry__.py).  A fully cold "not slow" suite
# costs ~12 min on an idle core (the round-3 judge's fresh-checkout run),
# which is cheaper than any debugging session the cache has caused.
try:
    jax.config.update("jax_enable_compilation_cache", False)
except AttributeError:  # older jax without the flag: set no cache dir
    pass
# Belief-covariance math is validated at high precision on CPU; the TPU path
# uses float32 with HIGHEST matmul precision set in library code.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap in-process compiled-executable accumulation.

    Every jitted program holds several JIT code mappings; a full suite run
    grows the process toward vm.max_map_count (~500 maps/test observed
    2026-08-21) and dies with a deterministic SIGSEGV inside
    backend_compile_and_load once the limit is hit (~test #130 on a
    65530-map host).  Dropping compiled executables between modules keeps
    the count bounded; cross-module jit reuse is rare, so the recompile
    cost is small.
    """
    yield
    import jax

    jax.clear_caches()
