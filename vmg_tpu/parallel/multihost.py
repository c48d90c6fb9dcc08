"""Multi-host helpers (replaces the reference's eval-result collection via
tmpdir pickle / dist.all_gather, ``mmedit/apis/test.py:128-228``, and the
torchrun process bootstrap)."""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax


def initialize_distributed(**kwargs):
    """Multi-host bootstrap: call once per process before device use."""
    jax.distributed.initialize(**kwargs)


def all_gather_host_values(values: Sequence[float]) -> np.ndarray:
    """Gather per-host metric vectors onto every host (replaces
    collect_results_cpu).  values: this host's metric list."""
    from jax.experimental import multihost_utils

    arr = np.asarray(values, np.float32)
    out = multihost_utils.process_allgather(arr)
    return np.asarray(out)


def broadcast_from_host0(tree: Any) -> Any:
    """Make host 0's pytree authoritative on every process (e.g. after a
    host-side checkpoint load)."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def assert_same_across_hosts(x: Any, name: str = "value"):
    from jax.experimental import multihost_utils

    multihost_utils.assert_equal(x, f"{name} differs across hosts")
