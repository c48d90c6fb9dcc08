"""Sequence-parallel (T-sharded) inference.

The reference handles long clips purely by host-side sliding windows
(``Tester.test_clips``); the only cross-device sequence dependency in VMG
is the trajectory recurrence carry (SURVEY.md §5).  The TPU-native way to
span a clip across chips is, again, sharding annotations: place the clip's
T axis on the ``data`` mesh axis and jit the forward with those layouts --
GSPMD partitions the frame-parallel work (input proj, TAB stacks, recon
head, SPyNet pairs) by frames and inserts the collectives
(collective-permute for window shifts / scan slices, all-gathers where an
op genuinely needs the whole sequence).

One chip then stores only its frame shard of the heavy per-frame
activations; the recurrence itself stays sequential in T (it is in the
math), with the per-step slice arriving over ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_seq_sharded_forward(model, mesh: Mesh, frames_mirror: bool = False):
    """Jitted (params, x) -> y with x/y (B, T, H, W, C) sharded over T on
    the mesh ``data`` axis and params replicated."""
    repl = NamedSharding(mesh, P())
    tsh = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        lambda p, v: model.apply(p, v, frames_mirror=frames_mirror),
        in_shardings=(repl, tsh),
        out_shardings=tsh,
    )


def shard_clip_over_time(mesh: Mesh, x):
    """Place a (B, T, ...) clip with T sharded over ``data``."""
    return jax.device_put(x, NamedSharding(mesh, P(None, "data")))
