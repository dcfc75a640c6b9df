"""Test config: force a virtual 8-device CPU mesh before JAX import.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count), mirroring how the driver
dry-runs the multichip path.
"""

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
# hard override (not setdefault): the host may preset JAX_PLATFORMS=axon
# (tunneled TPU) — the test suite always runs on the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"


def pytest_configure(config):
    # belt-and-braces: if a plugin imported jax before this conftest, the
    # env var was read too early — force the platform on the live config
    # (works as long as the backend hasn't initialized yet)
    import jax

    jax.config.update("jax_platforms", "cpu")
    config.addinivalue_line(
        "markers",
        "slow: long end-to-end tests; fast gate = pytest -m 'not slow'")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
