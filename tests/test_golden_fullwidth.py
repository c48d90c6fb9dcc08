"""Full-width torch-vs-jax golden: stage-0 geometry at TRUE width.

The full-model golden suite runs at reduced dims (C=32); the fused
layouts and kernels are width-specialized (block-diagonal 8x(C)
contractions, 2x2 parity masks, 28-deep FFN groups), so this test pins
one reduced-DEPTH model at the real stage-0 width: C=112, chunks 8x8,
heads 4, ffn_cnn with mlp_ratio 6 / n_groups 4 (C/g = 28), and a
15-resblock trajectory tail -- the exact per-channel geometry of
FULL_PRESET stage 0/6 (reference configs/VMG-eval-REDS4.yml network
section; modules models/function.py:596-1217, models/trajectory.py).

Weight transfer goes through convert_torch_state_dict (the shipped
converter), so this also exercises the checkpoint path at full width.
CPU fp32; marked slow.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

from ref_stubs import import_reference_models  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vmg_tpu.configs.config import VMGNetworkConfig  # noqa: E402
from vmg_tpu.models import create_model  # noqa: E402
from vmg_tpu.ckpt.torch_convert import convert_torch_state_dict  # noqa: E402


@pytest.mark.slow
def test_fullwidth_stage0_geometry_golden():
    ref_vmg = import_reference_models()
    torch.manual_seed(0)
    common = dict(
        embed_dim=[112, 112, 112], depths=[1, 1, 1], num_heads=[4, 4, 4],
        num_frames=4, window_sizes=[(2, 8, 8), (2, 8, 8), (2, 8, 8)],
        mlp_ratio=6, n_groups=4,
    )
    ref = ref_vmg.VMG(
        **common,
        mdsc=False, if_concat=False, spynet_pretrained="stub",
        image_size=[64, 64], is_train=False,
        traj_win=[4, None], traj_keyframes_n=[2, None], traj_heads=[4, None],
        temporal_type=[False, None], temporal_empty=True,
        traj_res_n=[15, 0, 15], spatial_type=[False, False],
        flow_smooth=True, smooth_region_range=4,
        retention_decay=True, non_linear=True,
        gating=True, symm=True, symm_act=torch.nn.Tanh,
        relu_scale=True, relu_scale_norm=False,
        ffn_type="ffn_cnn", mixer_type=["mlps", "mlps"], mixer_n=[None, None],
        r_scaling=0.1, chunk_ratios=[1 / 8, 1 / 8],
        traj_mode="wins", twins=[2, 2], traj_scale=True, traj_refine=None,
        m_scaling=1.0, if_local_fuse=True, channel_mixer="rcab",
    )
    ref.eval()

    cfg = VMGNetworkConfig(
        embed_dim=(112, 112, 112), depths=(1, 1, 1), num_heads=(4, 4, 4),
        num_frames=4, window_sizes=((2, 8, 8), (2, 8, 8), (2, 8, 8)),
        mlp_ratio=6.0, n_groups=4,
        traj_win=(4, None), traj_keyframes_n=(2, None), traj_heads=(4, None),
        temporal_type=(False, None), temporal_empty=True,
        traj_res_n=(15, 0, 15), spatial_type=(False, False),
        use_mdsc=False, flow_smooth=True, smooth_region_range=4,
        ret_decay=True, non_linear=True, gating=True,
        if_symm=True, symm_act="tanh", relu_scale=True, relu_scale_norm=False,
        ffn_type="ffn_cnn", mixer_type=("mlps", "mlps"), mixer_n=(None, None),
        r_scaling=0.1, chunk_ratios=(0.125, 0.125), traj_mode="wins",
        twins=(2, 2), traj_scale=True, if_local_fuse=True,
        channel_mixer="rcab", image_size=(64, 64),
    )
    mine = create_model(cfg, is_train=False)

    # export BEFORE forward: the reference mutates MorphFC weights in
    # place during forward (function.py:766-781)
    sd = {k: v.clone() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray,
                          convert_torch_state_dict(sd, strict=True))

    rng = np.random.default_rng(5)
    x = rng.random((1, 4, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    want = np.transpose(want, (0, 1, 3, 4, 2))

    got = np.asarray(mine.apply(params, jnp.asarray(x)))
    diff = float(np.abs(got - want).max())
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
    print(f"full-width stage-0 golden max abs diff: {diff:.2e}")
