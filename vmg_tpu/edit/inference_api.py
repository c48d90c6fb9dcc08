"""High-level inference API (reference
``mmedit/apis/restoration_video_inference.py``): load a config + weights,
then super-resolve a frame folder or array in one call."""

from __future__ import annotations

from typing import Optional, Union

import numpy as np


def init_model(config_path: str, checkpoint: Optional[str] = None,
               dtype=None):
    """Build the model + params from a config and optional checkpoint
    (.pth torch / orbax dir / None for random)."""
    import jax
    import jax.numpy as jnp
    from vmg_tpu.configs import load_config
    from vmg_tpu.models import create_model
    from vmg_tpu.train.precision import cast_params_for_compute

    cfg = load_config(config_path, is_train=False)
    dtype = dtype or jnp.bfloat16
    model = create_model(cfg.network, is_train=False, dtype=dtype)

    if checkpoint and checkpoint.endswith((".pth", ".pt")):
        import torch
        from vmg_tpu.ckpt.torch_convert import (
            convert_torch_state_dict, normalize_torch_checkpoint,
        )

        ckpt = torch.load(checkpoint, map_location="cpu")
        sd = normalize_torch_checkpoint(ckpt, cfg.eval.checkpoint_from)
        params = jax.tree.map(jnp.asarray, convert_torch_state_dict(sd))
    elif checkpoint:
        from vmg_tpu.ckpt import restore_checkpoint

        params = restore_checkpoint(checkpoint, None)
        if "params" not in params:
            params = {"params": params}
    else:
        params = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
        )
    params = cast_params_for_compute(params, dtype)
    return cfg, model, params


def restoration_video_inference(model, params, frames: Union[str, np.ndarray],
                                window_size: int = 0,
                                max_seq_len: Optional[int] = None) -> np.ndarray:
    """Super-resolve a clip.

    frames: (T, H, W, 3) uint8/float RGB array, or a directory of frames.
    window_size > 0: sliding-window inference (one output frame per
    window); 0: recurrent whole-clip (optionally chunked by max_seq_len) --
    the two modes of the reference API.
    """
    import jax
    import jax.numpy as jnp

    if isinstance(frames, str):
        from vmg_tpu.eval.eval_utils import read_seq_images

        frames = read_seq_images(frames)
    x = frames.astype(np.float32)
    if x.max() > 1.5:
        x = x / 255.0

    fwd = jax.jit(lambda p, v: model.apply(p, v))
    T = x.shape[0]
    if window_size > 0:
        outs = []
        half = window_size // 2
        pad = np.concatenate([x[half:0:-1], x, x[-2: -half - 2: -1]], axis=0)
        for i in range(T):
            clip = pad[i : i + window_size][None]
            out = np.asarray(fwd(params, jnp.asarray(clip)))[0]
            outs.append(out[window_size // 2])
        return np.stack(outs, 0)
    if max_seq_len and T > max_seq_len:
        outs = [
            np.asarray(fwd(params, jnp.asarray(x[i : i + max_seq_len][None])))[0]
            for i in range(0, T, max_seq_len)
        ]
        return np.concatenate(outs, axis=0)
    return np.asarray(fwd(params, jnp.asarray(x[None])))[0]
