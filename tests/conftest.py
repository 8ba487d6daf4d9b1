"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the real TPU path is exercised by bench.py and
__graft_entry__.py).

Note: the environment may pre-set JAX_PLATFORMS (e.g. to a TPU tunnel), so we
overwrite rather than setdefault — TPU matmuls default to bfloat16 and would
break the float32 numerical-parity tests.
"""

import os
import resource

# XLA:CPU's LLVM codegen recurses deeply on the big unrolled-scan train
# programs; with the default 8 MiB main-thread stack this intermittently
# segfaults inside backend_compile_and_load (observed killing full-suite
# runs in rounds 3-4 — the round-3 "cache write" diagnosis was the same
# crash surfacing in a different compile-pipeline frame).  Raise the stack
# limit to the hard limit before JAX initializes.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and _soft != _hard:
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process subprocess tests (minutes each)")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_code():
    """Drop JAX's executable caches after every test module.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process; past a threshold the NEXT large compile segfaults inside
    LLVM codegen (backend_compile_and_load) — reproducibly at the same
    suite position, while the same test passes in a fresh process.
    Bounding the live compiled-code footprint keeps the one-process suite
    run stable; the cost is re-tracing a handful of cross-module shared
    programs."""
    yield
    jax.clear_caches()

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
