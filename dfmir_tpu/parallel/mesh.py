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
    """Replicate every leaf over the mesh, with NO buffer aliasing back to
    the input: ``jax.device_put`` reuses the source buffer as the shard
    that already sits on the right device, which becomes a footgun once
    either copy is passed to a donating step (``train_step`` donates its
    state — donating the replicated state would silently delete the
    original's buffer, and vice versa).  A jitted identity with an output
    sharding constraint always materializes fresh buffers."""
    sh = replicated(mesh)
    return jax.jit(lambda t: t,
                   out_shardings=jax.tree.map(lambda _: sh, tree))(tree)
