"""Mixed precision policy: bf16 compute, fp32 master params and flow.

TPU bf16 needs no loss scaling (unlike the reference's CUDA AMP +
GradScaler, ``tools/Trainer.py:115,132-143``).  The policy is the standard
cast-on-use pattern: master params stay fp32 in the optimizer; the forward
sees a bf16-cast copy (the cast's VJP upcasts gradients back to fp32).

The SPyNet subtree stays fp32 -- flow fields feed gather coordinates where
bf16 rounding visibly moves samples (SURVEY.md §2.5 AMP note).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

FP32_SUBTREES: Sequence[str] = ("spynet",)


def cast_params_for_compute(params, dtype=jnp.bfloat16,
                            keep_fp32: Sequence[str] = FP32_SUBTREES):
    """Cast float params to ``dtype`` except subtrees rooted at keep_fp32."""
    if dtype == jnp.float32:
        return params

    def cast(path, x):
        keys = [str(getattr(k, "key", k)) for k in path]
        if any(k in keep_fp32 for k in keys):
            return x
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(cast, params)
