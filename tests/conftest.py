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

# persistent compilation cache: repeated test runs skip XLA recompiles
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
