"""VMG-TPU: a TPU-native video super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the VMG
reference ("VMG: Rethinking U-Net architecture for Video Super-Resolution",
PyTorch).  The compute path is pure JAX (jit/pjit/shard_map/Pallas); the
runtime around it (data loading, checkpointing, CLIs) is host-side Python
with native components where it pays off.

Layout:
  vmg_tpu.ops       -- numerics substrate: flow_warp/grid_sample, resizers,
                       pixel shuffle, window partition, deformable conv,
                       retention-decay matrices (Pallas kernels for hot ops)
  vmg_tpu.models    -- flax modules: SPyNet, TAB/MorphFC mixers, trajectory
                       scan + LTAM, 3D window attention, the VMG U-Net
  vmg_tpu.data      -- host loader: clip samplers, augmentation, device feed
  vmg_tpu.train     -- losses, LR schedules, optimizer groups, train step
  vmg_tpu.eval      -- metrics (PSNR/SSIM [+Y]), tiled/sliding inference
  vmg_tpu.parallel  -- mesh construction, sharding rules, multihost helpers
  vmg_tpu.ckpt      -- orbax checkpointing + torch checkpoint converters
  vmg_tpu.utils     -- config system, logging, meters
"""

__version__ = "0.1.0"
