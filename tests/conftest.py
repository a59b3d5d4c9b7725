"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The JAX analogue of a fake distributed backend (SURVEY.md §4): pmap/pjit code
paths compile and execute on N host-platform devices, so every sharding test
runs without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment's sitecustomize force-registers the remote 'axon' TPU
# platform regardless of JAX_PLATFORMS; override it post-import so tests run
# on local virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-executable caches after every test module.

    One long pytest process accumulates hundreds of XLA:CPU executables;
    past a threshold the NEXT compile segfaults inside
    ``backend_compile_and_load`` (the same environment bug the multichip
    dryrun dodges via subprocess isolation — see scripts and dev notes).
    Clearing between modules keeps the per-process compile population
    bounded; jitted functions simply retrace on next use."""
    yield
    import jax
    jax.clear_caches()
