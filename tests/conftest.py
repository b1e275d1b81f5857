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

# Tunnel guard (round-3 verdict observed one cold suite start blocked >20min
# in poll() on a localhost tunnel socket before any test output).  Nothing in
# this repo touches a device at import time (api/ops call jax.default_backend
# only at runtime, after the forced-cpu config above), so fail LOUDLY here if
# a backend somehow initialized before or despite the override, instead of
# hanging deep inside the first test's dispatch.
from jax._src import xla_bridge as _xb  # noqa: E402

assert not _xb._backends, (
    "a JAX backend initialized before conftest forced jax_platforms=cpu: "
    f"{list(_xb._backends)} — something at import time touched a device"
)
assert jax.default_backend() == "cpu", (
    f"conftest forced jax_platforms=cpu but got {jax.default_backend()!r}: "
    "the sitecustomize PJRT plugin overrode the in-process config"
)

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
