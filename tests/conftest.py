import os
import sys

# tests run on CPU with a virtual 8-device mesh so sharding tests work
# anywhere; bench.py (not under pytest) uses the real TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

# the environment may import jax at interpreter start (sitecustomize) before
# this file runs, in which case only the config API can still switch platform
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_TEST_DIR = "/root/reference/test"


@pytest.fixture
def ref_test_dir():
    if not os.path.isdir(REFERENCE_TEST_DIR):
        pytest.skip("reference test fixtures not available")
    return REFERENCE_TEST_DIR


@pytest.fixture(autouse=True)
def fresh_registry():
    from pbwt_tpu.core import registry
    registry.init()
    yield
