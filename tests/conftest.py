import os

# XLA:CPU compiles of the big scan programs recurse deeply; the default
# 8MB stack intermittently segfaults xdist workers ("node down: Not
# properly terminated" on tests that pass alone).  Raise it BEFORE the
# backend spawns its compile threads (pthread stacks snapshot the rlimit
# at creation).
import resource

try:
    _hard = resource.getrlimit(resource.RLIMIT_STACK)[1]
    resource.setrlimit(resource.RLIMIT_STACK, (256 << 20, _hard))
except (ValueError, OSError):
    pass

# The LLVM JIT mmaps a code section per compiled computation; the big
# XLA:CPU programs exhaust the default vm.max_map_count=65530 mid-run
# ("LLVM ERROR: Unable to allocate section memory!" -> abort, the r5
# diagnosis of the recurring test-process crashes).  Raise it when
# we can (container root); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < (1 << 20):
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write(str(1 << 20))
except (OSError, ValueError):
    pass

# Multi-chip tests run on a virtual 8-device CPU mesh.
#
# The container pins JAX_PLATFORMS=axon (one tunneled TPU chip) and its
# sitecustomize imports jax at interpreter startup, so env vars set here are
# too late — but the backend only initializes on first use, so
# jax.config.update still wins.  XLA_FLAGS is read at backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---- test tiers -----------------------------------------------------------
# Device-program tests (big XLA:CPU compiles, minutes each cold) are marked
# `device` by filename so `pytest -m "not device"` is the fast conformance
# tier; see pyproject.toml [tool.pytest.ini_options] markers.
_DEVICE_PREFIXES = (
    "test_device_",
    "test_dedup",
    "test_dense_trainer",
    "test_parallel_encode",
    "test_distributed_",
    "test_merge_",
    "test_layout_pallas",
    "test_route",
    "test_runtime",
    "test_unigram_trainer",
    "test_unigram_packed",
    "test_unigram_dedup",
    "test_wordpiece_dedup",
    "test_c_api",
    "test_fallback_stats",
)


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        name = item.fspath.basename
        if any(name.startswith(p) for p in _DEVICE_PREFIXES):
            item.add_marker(_pytest.mark.device)
