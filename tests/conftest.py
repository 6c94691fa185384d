"""Test configuration: force the CPU backend with 8 virtual devices so
pjit/sharding paths run without TPU hardware (SURVEY.md §4c).

This container presets JAX_PLATFORMS=axon and a sitecustomize that
registers the axon (tunneled TPU) PJRT plugin at interpreter boot; host
transfers through the tunnel cost ~25s each, which would make the test
suite unusable.  `jax.config.update` after import reliably re-selects the
CPU backend (backends initialise lazily, at first use — which is later
than conftest import)."""

import os

# NB: the axon-env re-exec guard lives in the ROOT conftest.py (it must run
# before pytest activates fd capture); by the time this file loads the env
# is already CPU-safe under the default invocation.

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()

# NO persistent compilation cache for the CPU suite — measured round 3:
# a fresh dedicated cache dir still produced "Compile machine features ...
# doesn't match the machine type for execution ... could lead to SIGILL"
# AOT-load errors on the very next run (this box's compiles route through
# the axon relay whose recorded machine features differ from the host).
# Slow-tier speed comes from session-scoped fixtures instead.


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly @pytest.mark.slow is part of the fast core,
    so `pytest -m fast` runs the quick math/shape/sampler tests (<60s) and
    `pytest -m slow` the integration tier."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process compiler state: a single-process run of the WHOLE
    suite accumulates ~300 compiled CPU executables and XLA's CPU
    compiler then segfaults deterministically (round 5: twice at the
    same late test, solo and contended).  Clearing jit caches at module
    boundaries keeps the compiler healthy; per-module compile reuse is
    unaffected (session-scoped fixtures hold arrays, not executables)."""
    yield
    jax.clear_caches()
