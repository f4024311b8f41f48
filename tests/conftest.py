"""Test configuration: run JAX on a virtual 8-device CPU mesh by default.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the driver separately dry-runs the
multi-chip path and benches on real TPU hardware.

Set RS2K_TPU_TESTS=1 to run on the real TPU chip instead (enables the
`-m tpu` suite, tests/test_tpu.py: Mosaic-lowered kernels vs the oracle —
the bridge between interpret-mode exactness and on-chip exactness).
"""

import os

ON_TPU = os.environ.get("RS2K_TPU_TESTS") == "1"
if not ON_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import sys
from pathlib import Path

import numpy as np
import pytest

# The environment's sitecustomize force-registers the axon TPU plugin and
# sets jax_platforms="axon,cpu"; an explicit config update is required to
# actually run tests on the virtual CPU mesh.
import jax

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="needs RS2K_TPU_TESTS=1 and a real TPU chip"
    )
    for item in items:
        if "tpu" in item.keywords and not ON_TPU:
            item.add_marker(skip_tpu)

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

FIXTURE = Path(__file__).parent / "data" / "ecoli.genome.100k.fa"


@pytest.fixture(scope="session")
def ecoli_seq() -> str:
    """The reference's golden fixture: E. coli NZ_CP027599.1, 99,925 bp,
    single record on line 2 of the file (reference tests/main.rs:15-16)."""
    return FIXTURE.read_text().split("\n")[1]


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x5E12)
