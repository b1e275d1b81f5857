"""Test harness config: run everything on a simulated 8-device CPU mesh.

Set platform env vars BEFORE jax is imported anywhere (the SURVEY §4
Vagrant-analogue: multi-device behavior without a pod).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import pytest

import jax

# Some environments install a PJRT plugin whose sitecustomize forces
# jax_platforms to its own backend, ignoring the env var — override it in
# process so tests really run on the 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: recompiles of the scan kernels dominate test
# wall-clock otherwise.
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_DIR = pathlib.Path(os.environ.get("REFERENCE_DIR", "/root/reference"))


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    if not REFERENCE_DIR.exists():
        pytest.skip("reference fixture directory not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def strings_path(reference_dir):
    return reference_dir / "strings.txt"
