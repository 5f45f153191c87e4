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


# Persistent compilation cache: XLA-CPU takes minutes to compile the 3-D
# registration graphs; cache them across test processes/runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
except Exception:
    pass
