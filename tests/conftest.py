"""Test harness config: force JAX onto a virtual 8-device CPU mesh so that
sharding/collective tests run without TPU hardware (see SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# keep the half-open quarantine re-probe inert during tests: a lingering
# re-probe daemon from one test must not flip DEVICE_UNHEALTHY mid-test
os.environ.setdefault("PANGRAPH_TPU_REPROBE", "3600")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def test_graph_path():
    return REFERENCE_DATA / "test_graph.json"


@pytest.fixture(scope="session")
def plasmids_fasta_path():
    return REFERENCE_DATA / "russian_doll_plasmids.fa.gz"
