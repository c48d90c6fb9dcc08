"""Tensor-parallel param shardings over the mesh ``tensor`` axis.

The reference's only parallelism is data parallel (SURVEY.md §2.5); the
VMG bottleneck stages are 448 channels wide, so the rebuild reserves a
second mesh axis and shards the wide weight matrices over it.  The
TPU-native mechanism is sharding annotations, not hand-written
collectives: parameters whose output-channel dim divides the ``tensor``
axis size get a ``P(..., 'tensor')`` sharding, XLA/GSPMD propagates the
layouts through the forward/backward and inserts the (all-gather /
reduce-scatter) collectives over ICI.

This is layout-only: numerics are identical to the replicated run (the
dryrun asserts it), so golden parity is untouched.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_shardings(mesh: Mesh, params, min_channels: int = 224):
    """Build a sharding tree for a param pytree.

    Kernels (>=2D float leaves) whose LAST dim (out features/channels) is
    >= min_channels and divisible by the tensor-axis size shard that dim
    over ``tensor``; 1D biases/scales matching the same condition shard
    too (they add with the sharded activations); everything else
    replicates.  With tensor axis == 1 this degenerates to all-replicated.
    """
    tp = mesh.shape.get("tensor", 1)
    repl = NamedSharding(mesh, P())

    def rule(x):
        if tp <= 1 or not hasattr(x, "shape") or x.ndim == 0:
            return repl
        last = x.shape[-1]
        if last >= min_channels and last % tp == 0:
            spec = (None,) * (x.ndim - 1) + ("tensor",)
            return NamedSharding(mesh, P(*spec))
        return repl

    return jax.tree.map(rule, params)


def shard_params(mesh: Mesh, params, min_channels: int = 224):
    """Place params per :func:`param_shardings`."""
    shardings = param_shardings(mesh, params, min_channels)
    return jax.tree.map(jax.device_put, params, shardings)


def state_shardings(mesh: Mesh, state, min_channels: int = 224):
    """Sharding tree for a whole TrainState: the per-leaf rule of
    :func:`param_shardings` also covers the AdamW m/v slots (they mirror
    the param shapes); scalars replicate."""
    return param_shardings(mesh, state, min_channels)


def shard_state(mesh: Mesh, state, min_channels: int = 224):
    shardings = state_shardings(mesh, state, min_channels)
    return jax.tree.map(jax.device_put, state, shardings)
