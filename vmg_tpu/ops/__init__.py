from vmg_tpu.ops.warp import grid_sample, flow_warp
from vmg_tpu.ops.resize import (
    resize_bilinear,
    upsample_trilinear_frames,
    avg_pool2d,
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
    imresize_matlab,
)
from vmg_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from vmg_tpu.ops.decay import morphfc_decay_matrix, ltam_temporal_decay
from vmg_tpu.ops.window import window_partition_3d, window_reverse_3d, compute_shift_mask_3d
from vmg_tpu.ops.deform import modulated_deform_conv2d
