"""Device-mesh utilities for SPMD scale-out.

The DCD workload is an actor-learner fused program whose natural parallel
axis is the env batch (SURVEY.md §2.9): envs, rollouts and PPO minibatches
shard over a 'dp' mesh axis; model params and PLR buffers are replicated
(models are <1M params; the buffer is read-mostly).  XLA inserts psum /
all-gather collectives over ICI for the gradient reduction and the global
minibatch permutations.

TP/PP/SP/EP axes are not needed for parity with the reference (no large
matmuls, no attention; SURVEY.md §5.7) — the mesh is built with named axes so
additional axes can be introduced without restructuring.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = 'dp') -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = 'dp'):
    """Place every leaf with a leading batch axis on the mesh, sharded on
    that axis; scalars/replicated leaves get full replication."""
    n = mesh.devices.size

    def put(x):
        if hasattr(x, 'ndim') and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
