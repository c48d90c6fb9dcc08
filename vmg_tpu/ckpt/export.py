"""Model export for serving (replaces the reference's ONNX wrappers,
``mmedit/core/export/wrappers.py``): on TPU the portable serving artifact
is StableHLO via jax.export (loadable from C++/PJRT or TF)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def export_stablehlo(model, params, input_shape: Tuple[int, ...],
                     path: str | None = None) -> bytes:
    """Serialize model.apply(params, x) for the given input shape.

    Returns the serialized bytes; also writes them to ``path`` if given.
    Reload with ``jax.export.deserialize(blob).call(x)``.
    """
    from jax import export as jexport

    fn = lambda x: model.apply(params, x)  # params baked in as constants
    spec = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    exported = jexport.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_stablehlo(blob_or_path):
    from jax import export as jexport

    if isinstance(blob_or_path, str):
        with open(blob_or_path, "rb") as f:
            blob_or_path = f.read()
    return jexport.deserialize(blob_or_path)
