"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the real TPU path is exercised by bench.py and
__graft_entry__.py).

Note: the environment may pre-set JAX_PLATFORMS (e.g. to a TPU tunnel), so we
overwrite rather than setdefault — TPU matmuls default to bfloat16 and would
break the float32 numerical-parity tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process subprocess tests (minutes each)")

# Persistent compilation cache: repeated test runs skip XLA recompiles.
# OPT-IN ONLY (SAT_TEST_COMPILE_CACHE=1): the cache-write path
# (put_executable_and_time) segfaulted two full-suite runs in round 3 when
# min_entry_size_bytes=0 forced every executable to disk, killing the run at
# ~84 %.  Default is therefore no persistent cache — a slower but reliable
# gate.  When opted in, keep the default min-entry threshold instead of
# forcing zero so tiny executables (the crash trigger) stay out of the cache.
if os.environ.get("SAT_TEST_COMPILE_CACHE", "") == "1":
    _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
