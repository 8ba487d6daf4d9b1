"""Device mesh and sharding helpers.

The reference's only distribution strategy is single-host multi-GPU data
parallelism via ``tf.contrib.distribute.MirroredStrategy``
(reference: train.py:67,73,108).  The TPU-native replacement is SPMD over a
``jax.sharding.Mesh``: the batch dimension is sharded over the ``data`` axis,
parameters are replicated, and XLA inserts the gradient all-reduce (psum over
ICI) automatically from the sharding annotations.  This also extends the
reference to multi-host pods: see ``parallel/multihost.py`` for
``jax.distributed.initialize`` wiring, per-host input sharding, and
global-batch assembly (tested with two real jax.distributed processes in
tests/test_multihost.py).

The model (<50M params) fits on one chip, so no tensor/pipeline parallelism
is needed (SURVEY.md §2.4); the mesh is 1-D unless ``hp.mesh_shape`` says
otherwise.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(mesh_shape: Sequence[int] = (),
                axis_names: Sequence[str] = ("data",),
                devices=None) -> Mesh:
    """Build a mesh; default: 1-D 'data' axis over all devices."""
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = (len(devices),)
        axis_names = tuple(axis_names[:1])
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch pytree with the leading dim sharded over ``axis``.
    Scalars/None pass through replicated."""
    bsh = batch_sharding(mesh, axis)
    rep = replicated_sharding(mesh)

    def place(x):
        if x is None:
            return None
        x = jax.numpy.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, rep)
        return jax.device_put(x, bsh)

    return jax.tree_util.tree_map(place, batch)
