"""RetNet-style retention decay matrices used by VMG.

Two places in the reference use exponential position decay:

1. The MorphFC axis mixers scale the (Ch, Ch) axis-FC weight elementwise by
   a decay matrix built in ``Enhanced_MorphFCs_decay.form_decay``
   (reference ``models/function.py:684-733``).  The roll/stack dance there
   reduces to a closed form: entry (a, b) is the mean over per-"head" decay
   rates gamma_q of  gamma_q ** (|a//S - b//S| + 1)  where S is the channel
   segment length -- a Toeplitz decay over spatial chunk distance.

   NOTE (parity-critical design decision): the reference *mutates the stored
   weight in place* every forward (``function.py:766-781``), compounding the
   decay across steps.  We functionalize it: the effective weight is
   ``w * gamma`` computed at use time, applied exactly once per forward.

2. LTAM windowed attention biases keyframe logits by a per-head temporal
   decay: key slot j out of t keyframes (0 = oldest) is scaled by
   ``decay_v ** (t - j)`` before the learned relative-position term
   (reference ``models/trajectory.py:534-547``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _morphfc_decay_np(chunk: int, seg: int) -> np.ndarray:
    # decay rates: gamma_q = 1 - 2^-(5 + chunk-1-q), q = 0..chunk-1
    gammas = 1.0 - 2.0 ** (-5.0 - np.arange(chunk - 1, -1, -1, dtype=np.float64))
    pos = np.arange(chunk * seg) // seg
    dist = np.abs(pos[:, None] - pos[None, :])  # (Ch, Ch)
    g = np.mean(gammas[:, None, None] ** (dist[None] + 1), axis=0)
    return g.astype(np.float32)


def morphfc_decay_matrix(chunk: int, seg: int) -> jnp.ndarray:
    """(chunk*seg, chunk*seg) decay matrix for a MorphFC axis weight."""
    return jnp.asarray(_morphfc_decay_np(chunk, seg))


@functools.lru_cache(maxsize=None)
def _ltam_decay_np(heads: int, t: int) -> np.ndarray:
    # decay_v[h] = 1 - 2^-(5 + heads-1-h); slot j (oldest first) gets
    # decay_v ** (t - j).
    decay_v = 1.0 - 2.0 ** (-5.0 - np.arange(heads - 1, -1, -1, dtype=np.float64))
    expo = t - np.arange(t)
    return (decay_v[:, None] ** expo[None, :]).astype(np.float32)


def ltam_temporal_decay(heads: int, t: int) -> jnp.ndarray:
    """(heads, t) temporal decay for LTAM keyframe slots, oldest first."""
    return jnp.asarray(_ltam_decay_np(heads, t))
