"""Modulated deformable convolution (DCNv2) for TPU.

Matches ``torchvision.ops.deform_conv2d`` with a mask (the reference's
flow-guided alignment path, ``models/function.py:1029-1100``):

  * ``offset``: (N, 2*G*K, H, W), channel 2j = dy, 2j+1 = dx, taps ordered
    group-major then (kh, kw) row-major
  * ``mask``:   (N, G*K, H, W), multiplies each sampled tap
  * bilinear sampling with zero padding outside the image

TPU decomposition: K grid-sample gathers (one per static kernel tap, with
the deform-group folded into the batch axis) followed by a single
(K*Cin -> Cout) matmul that XLA runs on the MXU.  This keeps all the FLOPs
in one big GEMM instead of the CUDA kernel's scattered accumulation.

Inputs/outputs are channels-last; offsets/masks are passed channels-last
as well: offset (N, H, W, G, K, 2) with last dim (dy, dx), mask
(N, H, W, G, K).
"""

from __future__ import annotations

import jax.numpy as jnp

from vmg_tpu.ops.warp import grid_sample


def modulated_deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    kernel_size: int = 3,
    padding: int = 1,
) -> jnp.ndarray:
    """Deformable conv, stride 1, dilation 1.

    Args:
      x: (N, H, W, Cin)
      offset: (N, H, W, G, K, 2), (dy, dx) per deform group / tap
      mask: (N, H, W, G, K), sigmoid-activated modulation
      weight: (K, Cin, Cout) -- tap-major flattened kernel (tap = kh*ks+kw)
      bias: (Cout,) or None
    Returns: (N, H, W, Cout)
    """
    N, H, W, Cin = x.shape
    K = kernel_size * kernel_size
    G = offset.shape[3]
    Cg = Cin // G

    # fold deform groups into batch for the gathers
    xg = x.reshape(N, H, W, G, Cg).transpose(0, 3, 1, 2, 4).reshape(N * G, H, W, Cg)

    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )

    sampled = []
    for kh in range(kernel_size):
        for kw in range(kernel_size):
            k = kh * kernel_size + kw
            dy = offset[..., k, 0]  # (N, H, W, G)
            dx = offset[..., k, 1]
            py = gy[None, :, :, None] + (kh - padding) + dy.astype(jnp.float32)
            px = gx[None, :, :, None] + (kw - padding) + dx.astype(jnp.float32)
            ny = 2.0 * py / max(H - 1, 1) - 1.0
            nx = 2.0 * px / max(W - 1, 1) - 1.0
            grid = jnp.stack([nx, ny], axis=-1)  # (N, H, W, G, 2)
            grid = grid.transpose(0, 3, 1, 2, 4).reshape(N * G, H, W, 2)
            v = grid_sample(xg, grid, mode="bilinear", padding_mode="zeros")
            v = v.reshape(N, G, H, W, Cg)
            m = mask[..., k].transpose(0, 3, 1, 2)  # (N, G, H, W)
            sampled.append(v * m[..., None])

    # (N, H, W, K, G, Cg) -> (N, H, W, K*Cin), tap-major to match weight
    s = jnp.stack(sampled, axis=1)  # (N, K, G, H, W, Cg)
    s = s.transpose(0, 3, 4, 1, 2, 5).reshape(N, H, W, K * Cin)
    w = weight.reshape(K * Cin, -1)
    out = jnp.einsum("nhwk,kc->nhwc", s, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
