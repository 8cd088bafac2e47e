import os
import sys

# tests run on CPU with a virtual 8-device mesh so sharding tests work
# anywhere; bench.py (not under pytest) uses the real TPU.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

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
