"""Test configuration: run everything on a virtual 8-device CPU mesh so the
suite exercises the multi-chip sharding paths without TPU hardware.  Must
set the env vars before jax is first imported anywhere."""

import os

# NOTE: the environment ships JAX_PLATFORMS=axon globally (the TPU tunnel
# plugin); force-override it — a setdefault would silently leave tests
# running on the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

# Persistent compilation cache: this box has a single CPU core and XLA CPU
# compiles of the traversal kernels take tens of seconds.  (The env-var
# spelling is not honored by this jax build; config.update is.)
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/tpurt/jaxcache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def scenes_dir():
    return "/root/reference/scenes"
