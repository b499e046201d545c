"""Test harness: run on a virtual 8-device CPU mesh.

jax is pre-imported by the environment's sitecustomize with a TPU platform
selected, so the platform must be overridden through jax.config (env vars are
read too late).  XLA_FLAGS is still honoured because CPU client creation
happens lazily at first device use.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the host has a single CPU and cold test-suite
# compiles dominate wall time; cached, reruns drop from hours to minutes.
# The suite gets its OWN cache dir (not the chip jobs' .jax_cache): a
# concurrent writer once left a corrupt entry whose read ABORTED the whole
# test process (2026-08-20, get_executable_and_time -> Fatal Python error),
# and segregating by platform keeps one backend's artifacts out of the
# other's keyspace entirely.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu8"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# NOTE: one pytest process at a time — two suites (or a suite + an ad-hoc
# pytest) racing on this cache dir have corrupted entries twice (observed
# 2026-08-21: SIGABRT in put_executable_and_time during the race, then
# SIGSEGV in get_executable_and_time reading the torn entry on the next
# run).  If a run dies inside compilation_cache.py, purge .jax_cache_cpu8.
# Belief-covariance math is validated at high precision on CPU; the TPU path
# uses float32 with HIGHEST matmul precision set in library code.
jax.config.update("jax_default_matmul_precision", "highest")
