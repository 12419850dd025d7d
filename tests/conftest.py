import os

# Virtual 8-device CPU mesh for sharding tests; must be set before jax import.
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pytest


@pytest.fixture
def tmp_table(tmp_path):
    """A Flags pointing at a temp db dir (per-test isolation, mirroring the
    reference's per-test table names, helpers_test.go:36)."""
    from sybil_tpu.config import Flags
    return Flags(dir=str(tmp_path / "db"), table="t")
