import os

# Virtual 8-device CPU mesh for sharding tests.  Must OVERRIDE the ambient
# JAX_PLATFORMS (the dev box pins it to the tunneled TPU, which has exactly
# one chip).  A pytest plugin may have imported jax already, so set the
# config directly too — it takes effect as long as no backend has been
# initialized yet.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture
def tmp_table(tmp_path):
    """A Flags pointing at a temp db dir (per-test isolation, mirroring the
    reference's per-test table names, helpers_test.go:36)."""
    from sybil_tpu.config import Flags
    return Flags(dir=str(tmp_path / "db"), table="t")
