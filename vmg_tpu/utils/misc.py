"""Misc host utilities (reference ``utils/misc.py``)."""

from __future__ import annotations

import os
import random
import time

import numpy as np
import jax


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def mkdir_and_rename(path: str):
    """Archive an existing experiment dir with a timestamp suffix, then
    create fresh (reference utils/misc.py:30-36)."""
    if os.path.exists(path):
        new_name = path + "_archived_" + time.strftime("%Y%m%d-%H%M%S")
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def count_params(params) -> int:
    return sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
