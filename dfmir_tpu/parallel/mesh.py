"""Device meshes and shardings.

The reference's only parallelism is single-process torch DataParallel
(/root/reference/models/base_model.py:103-107).  The TPU-native equivalent is
SPMD over a ``jax.sharding.Mesh``: batch sharded over a ``data`` axis,
parameters replicated, gradients all-reduced by XLA over ICI.  For large 3-D
volumes a ``spatial`` axis shards the leading spatial dim (XLA inserts halo
exchanges for the convolutions).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    use = np.asarray(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(use, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, ndims: int = 2, shard_spatial: bool = False):
    """Sharding for (B, *spatial, C) image batches."""
    spec = ["data"] + [None] * (ndims + 1)
    if shard_spatial:
        spec[1] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, arrays, ndims: int = 2, shard_spatial: bool = False):
    sh = batch_sharding(mesh, ndims, shard_spatial)
    return jax.tree.map(lambda x: jax.device_put(x, sh), arrays)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
