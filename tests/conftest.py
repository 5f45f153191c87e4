"""Test config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and forces ``jax_platforms=axon,cpu`` via jax.config, so
plain env vars are not enough — we must update the config after importing
jax (before any backend is initialized).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend()
)
assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Persistent compilation cache: ON, tests-local dir.  AOT loads mmap every
# loaded executable (same growth as fresh compiles) and the loader warns
# about "+prefer-no-scatter/+prefer-no-gather" pseudo-features (cosmetic),
# but the map-count guard below bounds the growth either way, and skipping
# LLVM recompiles of ~200 tests' programs is the difference between a
# ~55-minute and a ~15-minute suite on this 1-core box.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Map-count guard: every XLA:CPU executable holds LLVM-JIT'd code in its
# own anonymous mmaps.  This suite compiles ~200 tests' worth of programs
# in ONE process; measured map growth reached vm.max_map_count (65530)
# at which point the next mmap fails inside compilation/cache-load and
# the process dies with SIGSEGV (observed thrice, last /proc/<pid>/maps
# sample 64820 lines immediately before rc=139).  Dropping the compiled-
# executable caches between test modules unmaps the dead executables and
# keeps the count bounded; cross-module recompiles of shared jitted fns
# (warp etc.) are the cheap price.


_MAPS_CLEAR_THRESHOLD = 40_000   # vm.max_map_count is 65_530; per-module
                                 # growth is a few thousand maps, so this
                                 # leaves ample headroom while letting most
                                 # modules keep their warm caches


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:        # no procfs: cannot measure, always clear
        return 1 << 30


@pytest.fixture(autouse=True)
def _bound_jit_executable_maps():
    yield
    # Clear ONLY when the map count actually approaches the ceiling —
    # unconditional per-module clearing kept the suite safe but quintupled
    # its wall time (every shared jitted fn recompiled every module).
    # The check is PER TEST (a few ms to read /proc/self/maps): with the
    # persistent AOT cache enabled, loads add mmaps at ~170/s, so one
    # module can sprint from 40k to the 65,530 ceiling between module
    # boundaries (observed as a mid-test Abort in LLVM).  Re-warming after
    # a clear is cheap — executables reload from the on-disk cache.
    if _map_count() > _MAPS_CLEAR_THRESHOLD:
        import gc

        jax.clear_caches()
        gc.collect()   # executables sit in ref cycles; force the unmap now
