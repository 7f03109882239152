import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; bench.py runs on the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
# The axon TPU plugin ignores JAX_PLATFORMS; subprocess tests (CLI
# invocations) need the repo's own override, which coverm_tpu honours
# through the jax config knob (ops/depth.py) — without it they run on
# the real TPU over the tunnel and take minutes.
os.environ["COVERM_TPU_PLATFORM"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config knob
# still wins, so force CPU before any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/tests/data"


def reference_fixture(name: str) -> str:
    path = os.path.join(REFERENCE_DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not available")
    return path


@pytest.fixture
def ref_data():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference test data not mounted")
    return reference_fixture
