"""Device mesh + sharding rules.

TPU-native replacement for the reference's NCCL data parallelism
(``tools/train.py:23-31`` init_process_group + DDP wrap): build a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``tensor``
axis for future bottleneck sharding), shard the batch over ``data``,
replicate parameters, and let pjit/XLA emit the ICI psum for gradients.

Multi-host: ``jax.distributed.initialize()`` before mesh creation; each
process feeds its local batch shard (``process_local_batch_slice``
replaces DistIterSampler rank sharding, ``data/data_sampler.py:88-99``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Tuple[int, int] = (0, 1), devices=None) -> Mesh:
    """Create a (data, tensor) mesh.  shape=(0, 1) -> all devices on data."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    d, t = shape
    if d in (0, -1):
        d = n // max(t, 1)
    arr = np.asarray(devices).reshape(d, t)
    return Mesh(arr, axis_names=("data", "tensor"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict with leading batch dim onto the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_train_step(step_fn, mesh: Mesh, state_shardings=None):
    """Wrap a train step with explicit shardings: batch sharded on
    ``data``; state replicated by default, or sharded per
    ``state_shardings`` (e.g. tensor-parallel weights from
    ``vmg_tpu.parallel.tp.state_shardings``).  XLA emits the gradient
    all-reduce (and any TP all-gathers) over ICI from the layouts."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    st = repl if state_shardings is None else state_shardings
    return jax.jit(
        step_fn,
        in_shardings=(st, {"LRs": data, "HRs": data}, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,),
    )


def process_local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(local_batch, offset) for this host -- dataset sharding by process."""
    n = jax.process_count()
    i = jax.process_index()
    local = global_batch // n
    return local, i * local
