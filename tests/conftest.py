import os
import sys

# Device tests run on a virtual 8-device CPU mesh; the bench/CLI pick up real
# TPUs outside the test suite. Hard-set (not setdefault): the machine image
# exports JAX_PLATFORMS=axon globally.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; pin the
# platform through the config API so tests never compile through the slow
# remote-TPU tunnel.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import shutil

import pytest

FIXTURES = "/root/reference/tests"


@pytest.fixture()
def fixture_dir(tmp_path):
    """Copy the reference test fixtures into a writable directory."""
    for name in os.listdir(FIXTURES):
        if name.endswith((".fa", ".bam", ".bai", ".fq")):
            shutil.copy(os.path.join(FIXTURES, name), tmp_path / name)
    return tmp_path
