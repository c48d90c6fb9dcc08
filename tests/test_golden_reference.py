"""GOLDEN PARITY: run the actual reference model (torch CPU, stubbed deps),
convert its weights, and compare outputs of the vmg_tpu model end-to-end.

This is the parity North Star from SURVEY.md §4/§7: same weights, same
input, outputs must agree to fp32 tolerance through the full network
(SPyNet flows, MorphFC-decay TABs, trajectory recurrence + LTAM, U-Net
skips, recon head).
"""

import sys
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference-torch golden runs
import torch

sys.path.insert(0, os.path.dirname(__file__))
from ref_stubs import import_reference_models  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vmg_tpu.configs.config import VMGNetworkConfig  # noqa: E402
from vmg_tpu.models import create_model  # noqa: E402
from vmg_tpu.ckpt.torch_convert import convert_torch_state_dict  # noqa: E402


def _build_pair(ref_vmg, *, temporal_empty=True, temporal_type=(False, None),
                channel_mixer="rcab", ffn_type="ffn_cnn", non_linear=True,
                ret_decay=True, gating=True, use_mdsc=False,
                if_local_fuse=True, seed=0, is_train=False,
                drop_path_rate=0.0):
    torch.manual_seed(seed)
    common = dict(
        embed_dim=[32, 32, 32], depths=[2, 2, 2], num_heads=[2, 4, 2],
        num_frames=4, window_sizes=[(2, 4, 4), (2, 4, 4), (2, 4, 4)],
        mlp_ratio=2, n_groups=1,
    )
    ref = ref_vmg.VMG(
        **common,
        mdsc=use_mdsc, if_concat=False,
        spynet_pretrained="stub",
        image_size=[32, 32], is_train=False,
        traj_win=[4, None], traj_keyframes_n=[2, None], traj_heads=[2, None],
        temporal_type=list(temporal_type), temporal_empty=temporal_empty,
        traj_res_n=[2, 0, 2], spatial_type=[False, False],
        flow_smooth=True, smooth_region_range=4,
        retention_decay=ret_decay, non_linear=non_linear,
        gating=gating, symm=True, symm_act="tanh",
        relu_scale=True, relu_scale_norm=False,
        ffn_type=ffn_type, mixer_type=["mlps", "mlps"], mixer_n=[None, None],
        r_scaling=0.1, chunk_ratios=[1 / 4, 1 / 4],
        traj_mode="wins", twins=[2, 2], traj_scale=True, traj_refine=None,
        m_scaling=1.0, if_local_fuse=if_local_fuse,
        channel_mixer=channel_mixer,
    )
    ref.eval()

    cfg = VMGNetworkConfig(
        embed_dim=(32, 32, 32), depths=(2, 2, 2), num_heads=(2, 4, 2),
        num_frames=4, window_sizes=((2, 4, 4), (2, 4, 4), (2, 4, 4)),
        mlp_ratio=2.0, n_groups=1,
        traj_win=(4, None), traj_keyframes_n=(2, None), traj_heads=(2, None),
        temporal_type=tuple(temporal_type), temporal_empty=temporal_empty,
        traj_res_n=(2, 0, 2), spatial_type=(False, False),
        use_mdsc=use_mdsc, flow_smooth=True, smooth_region_range=4,
        ret_decay=ret_decay, non_linear=non_linear, gating=gating,
        if_symm=True, symm_act="tanh", relu_scale=True, relu_scale_norm=False,
        ffn_type=ffn_type, mixer_type=("mlps", "mlps"), mixer_n=(None, None),
        r_scaling=0.1, chunk_ratios=(0.25, 0.25), traj_mode="wins",
        twins=(2, 2), traj_scale=True, if_local_fuse=if_local_fuse,
        channel_mixer=channel_mixer, image_size=(32, 32),
        drop_path_rate=drop_path_rate,
    )
    mine = create_model(cfg, is_train=is_train)
    if is_train:
        ref.train()
    return ref, mine


def _compare(ref, mine, seed=1, atol=2e-4):
    # export weights BEFORE any forward: the reference mutates MorphFC
    # weights in place during forward (function.py:766-781)
    sd = {k: v.clone() for k, v in ref.state_dict().items()}
    params = convert_torch_state_dict(sd, strict=True)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(seed)
    x = rng.random((1, 4, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    want = np.transpose(want, (0, 1, 3, 4, 2))

    got = np.asarray(mine.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)
    return float(np.abs(got - want).max())


@pytest.fixture(scope="module")
def ref_vmg():
    return import_reference_models()


def test_golden_default_config(ref_vmg):
    """The shipped few-levels recipe: MorphFC-decay + rcab + ffn_cnn +
    trajectory tails + local fuse."""
    ref, mine = _build_pair(ref_vmg)
    diff = _compare(ref, mine)
    print(f"max abs diff (default): {diff:.2e}")


def test_golden_vanilla_mixer_no_decay(ref_vmg):
    """ret_decay=False -> Enhanced_MorphFCs (no gating/scale path)."""
    ref, mine = _build_pair(ref_vmg, ret_decay=False, channel_mixer="vanilla",
                            gating=False)
    _compare(ref, mine)


def test_golden_vanilla_ffn_and_linear_cmixer(ref_vmg):
    ref, mine = _build_pair(ref_vmg, ffn_type="vanilla",
                            channel_mixer="vanilla")
    _compare(ref, mine)


def test_golden_swin3d_tail(ref_vmg):
    """temporal_empty=False + temporal_type None -> 3D window attention."""
    ref, mine = _build_pair(ref_vmg, temporal_empty=False,
                            temporal_type=(None, None))
    _compare(ref, mine)


def test_golden_dcn_alignment_tail(ref_vmg):
    """temporal_type True -> flow-guided deformable alignment (DCN)."""
    ref, mine = _build_pair(ref_vmg, temporal_type=(True, None))
    _compare(ref, mine, atol=5e-4)


def test_golden_full_seven_stage_mdsc(ref_vmg):
    """7-stage U-Net with mdsc shortcuts, trajectory at stage 0/6."""
    torch.manual_seed(3)
    common = dict(
        embed_dim=[16, 32, 32, 64, 32, 32, 16],
        depths=[1, 1, 1, 1, 1, 1, 1],
        num_heads=[2, 2, 2, 4, 2, 2, 2],
        num_frames=4,
        window_sizes=[(2, 4, 4)] * 7,
        mlp_ratio=2, n_groups=1,
    )
    ref = ref_vmg.VMG(
        **common, mdsc=True, if_concat=False, spynet_pretrained="stub",
        image_size=[64, 64], is_train=False,
        traj_win=[4, None, None, None], traj_keyframes_n=[2, None, None, None],
        traj_heads=[2, None, None, None],
        temporal_type=[False, None, None, None], temporal_empty=True,
        traj_res_n=[2, 0, 0, 0, 0, 0, 2],
        spatial_type=[False, False, False, False],
        flow_smooth=True, smooth_region_range=4, retention_decay=True,
        non_linear=True, gating=True, symm=True, symm_act="tanh",
        relu_scale=True, relu_scale_norm=False, ffn_type="ffn_cnn",
        mixer_type=["mlps"] * 4, mixer_n=[None] * 4, r_scaling=0.1,
        chunk_ratios=[1 / 8, 1 / 4, 3 / 16, 1 / 8], traj_mode="wins",
        twins=[2, 2], traj_scale=True, traj_refine=None, m_scaling=1.0,
        if_local_fuse=True, channel_mixer="rcab",
    )
    ref.eval()
    cfg = VMGNetworkConfig(
        embed_dim=(16, 32, 32, 64, 32, 32, 16), depths=(1,) * 7,
        num_heads=(2, 2, 2, 4, 2, 2, 2), num_frames=4,
        window_sizes=((2, 4, 4),) * 7, mlp_ratio=2.0, n_groups=1,
        traj_win=(4, None, None, None),
        traj_keyframes_n=(2, None, None, None),
        traj_heads=(2, None, None, None),
        temporal_type=(False, None, None, None), temporal_empty=True,
        traj_res_n=(2, 0, 0, 0, 0, 0, 2), deform_groups=(4, 8, 8, 16),
        max_res_scale=(1, 2, 2, 4), spatial_type=(False,) * 4,
        use_mdsc=True, mixer_type=("mlps",) * 4, mixer_n=(None,) * 4,
        r_scaling=0.1, chunk_ratios=(0.125, 0.25, 0.1875, 0.125),
        if_local_fuse=True, channel_mixer="rcab", image_size=(64, 64),
    )
    mine = create_model(cfg, is_train=False)
    _compare(ref, mine)


def test_golden_traj_win_partition(ref_vmg):
    """traj_win < T temporal partitioning (reference trajectory.py:278-298
    windows_partition/windows_merge, constructor flag if_win_par): module-
    level golden vs the reference Trajectory_multi_head run with
    if_win_par=True, traj_win=4 over a T=8 clip."""
    import models.trajectory as ref_traj
    from vmg_tpu.models.trajectory import TrajectoryMultiHead

    torch.manual_seed(5)
    C, T, H, W, tw = 8, 8, 16, 16, 4
    ref = ref_traj.Trajectory_multi_head(
        embed_dim=C, mode="wins", num_blocks=2, frame_stride=2,
        traj_win=tw, head=2, en_field=False, head_scale=True,
        feature_refine=None, r_scaling=0.1, twins=[2, 2],
        if_win_par=True, ltam=True,
    )
    ref.eval()
    sd = {f"encoder_layers.0.traj_mixing.{k}": v.clone()
          for k, v in ref.state_dict().items()}
    tree = convert_torch_state_dict(sd, strict=True)
    traj_params = {"params": tree["params"]["encoder_layers0"]["traj_mixing"]}
    traj_params = jax.tree.map(jnp.asarray, traj_params)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, T, H, W, C)).astype(np.float32)
    ff = (rng.standard_normal((1, T - 1, H, W, 2)) * 1.5).astype(np.float32)
    fb = (rng.standard_normal((1, T - 1, H, W, 2)) * 1.5).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x).permute(0, 1, 4, 2, 3),
            torch.from_numpy(ff).permute(0, 1, 4, 2, 3),
            torch.from_numpy(fb).permute(0, 1, 4, 2, 3),
        ).numpy()
    want = np.transpose(want, (0, 1, 3, 4, 2))

    mod = TrajectoryMultiHead(
        embed_dim=C, num_blocks=2, keyframe_stride=2, head=2, mode="wins",
        head_scale=True, r_scaling=0.1, twins=(2, 2), ltam=True, traj_win=tw,
    )
    got = np.asarray(mod.apply(traj_params, jnp.asarray(x), jnp.asarray(ff),
                               jnp.asarray(fb)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-4)

    # traj_win == T must be a no-op partition (the shipped-config case)
    mod_full = TrajectoryMultiHead(
        embed_dim=C, num_blocks=2, keyframe_stride=2, head=2, mode="wins",
        head_scale=True, r_scaling=0.1, twins=(2, 2), ltam=True, traj_win=T,
    )
    out_full = mod_full.apply(traj_params, jnp.asarray(x), jnp.asarray(ff),
                              jnp.asarray(fb))
    assert np.isfinite(np.asarray(out_full)).all()


def _decoder_layer_pair(ref_vmg, *, if_unfold, depth=2, C=8, heads=2,
                        window=(2, 4, 4), seed=17):
    """Reference swin_3d.DecoderLayer vs vmg_tpu DecoderLayer, converted."""
    import models.swin_3d as ref_swin
    from vmg_tpu.models.swin3d import DecoderLayer

    torch.manual_seed(seed)
    ref = ref_swin.DecoderLayer(
        dim=C, input_resolution=heads, depth=depth, num_heads=heads,
        window_size=list(window), shift_size=None, mlp_ratio=2.0,
        qkv_bias=True, is_train=True, if_unfold=if_unfold,
    )
    ref.eval()
    sd = {f"encoder_layers.0.traj_mixing.{k}": v.clone()
          for k, v in ref.state_dict().items()}
    tree = convert_torch_state_dict(sd, strict=True)
    params = jax.tree.map(
        jnp.asarray, {"params": tree["params"]["encoder_layers0"]["traj_mixing"]}
    )
    mine = DecoderLayer(dim=C, depth=depth, num_heads=heads,
                        window_size=window, mlp_ratio=2.0, qkv_bias=True,
                        if_unfold=if_unfold)
    return ref, mine, params


def test_golden_swin3d_unfold_kv(ref_vmg):
    """attention_oo hard selection + unfold-KV branch (reference
    swin_3d.py:254-301,729-756, constructor flag if_unfold): golden vs the
    reference DecoderLayer built with if_unfold=True."""
    ref, mine, params = _decoder_layer_pair(ref_vmg, if_unfold=True)
    rng = np.random.default_rng(23)
    D, H, W, C = 4, 8, 8, 8
    x = rng.standard_normal((1, D, H, W, C)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(mine.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_golden_swin3d_flow_alignment(ref_vmg):
    """flow-aligned residual (reference swin_3d.py:758-770,830-831):
    golden vs the reference DecoderLayer called with flows."""
    ref, mine, params = _decoder_layer_pair(ref_vmg, if_unfold=False, seed=19)
    rng = np.random.default_rng(29)
    D, H, W, C = 4, 8, 8, 8
    x = rng.standard_normal((1, D, H, W, C)).astype(np.float32)
    ff = (rng.standard_normal((1, D // 2, H, W, 2)) * 1.5).astype(np.float32)
    fb = (rng.standard_normal((1, D // 2, H, W, 2)) * 1.5).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x).permute(0, 1, 4, 2, 3),
            flow_f=torch.from_numpy(ff).permute(0, 1, 4, 2, 3),
            flow_b=torch.from_numpy(fb).permute(0, 1, 4, 2, 3),
        ).numpy()
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(mine.apply(params, jnp.asarray(x),
                                flow_f=jnp.asarray(ff), flow_b=jnp.asarray(fb)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_golden_en_field_max_mode(ref_vmg):
    """en_field multi-scale keyframe buffers (reference trajectory.py
    :367-379 s2/s3 construction + forward_max:651-667 fusion), mode='max'
    -- module-level golden vs Trajectory_multi_head(en_field=True)."""
    import models.trajectory as ref_traj
    from vmg_tpu.models.trajectory import TrajectoryMultiHead

    torch.manual_seed(21)
    C, T, H, W = 8, 6, 16, 16
    ref = ref_traj.Trajectory_multi_head(
        embed_dim=C, mode="max", num_blocks=2, stride=4, frame_stride=2,
        traj_win=T, head=2, en_field=True, head_scale=False,
        feature_refine=None, r_scaling=0.1, twins=[2, 2], ltam=True,
    )
    ref.eval()
    sd = {f"encoder_layers.0.traj_mixing.{k}": v.clone()
          for k, v in ref.state_dict().items()}
    tree = convert_torch_state_dict(sd, strict=True)
    params = jax.tree.map(
        jnp.asarray, {"params": tree["params"]["encoder_layers0"]["traj_mixing"]}
    )

    rng = np.random.default_rng(31)
    x = rng.standard_normal((1, T, H, W, C)).astype(np.float32)
    ff = (rng.standard_normal((1, T - 1, H, W, 2)) * 1.5).astype(np.float32)
    fb = (rng.standard_normal((1, T - 1, H, W, 2)) * 1.5).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x).permute(0, 1, 4, 2, 3),
            torch.from_numpy(ff).permute(0, 1, 4, 2, 3),
            torch.from_numpy(fb).permute(0, 1, 4, 2, 3),
        ).numpy()
    want = np.transpose(want, (0, 1, 3, 4, 2))

    mod = TrajectoryMultiHead(
        embed_dim=C, num_blocks=2, keyframe_stride=2, head=2, mode="max",
        head_scale=False, r_scaling=0.1, twins=(2, 2), ltam=True,
        en_field=True, field_stride=4,
    )
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(ff),
                               jnp.asarray(fb)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # 'wins' + en_field is a latent crash in the reference; we raise clearly
    bad = TrajectoryMultiHead(embed_dim=C, num_blocks=1, keyframe_stride=2,
                              head=2, mode="wins", ltam=True, en_field=True)
    with pytest.raises(NotImplementedError):
        bad.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(ff),
                 jnp.asarray(fb))


def test_golden_mirrored_sequence(ref_vmg):
    """The reference detects mirrored clips dynamically
    (vmg.py:426-432) and reuses flipped forward flow; vmg_tpu takes the
    static frames_mirror flag. Outputs must match on a mirrored clip."""
    ref, mine = _build_pair(ref_vmg)
    sd = {k: v.clone() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(sd, strict=True))

    rng = np.random.default_rng(7)
    half = rng.random((1, 2, 64, 64, 3)).astype(np.float32)
    x = np.concatenate([half, half[:, ::-1]], axis=1)  # mirrored T=4
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(mine.apply(params, jnp.asarray(x), frames_mirror=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_golden_mirrored_training_batch(ref_vmg):
    """TRAIN-mode mirror parity: with use_mirrors data the train step passes
    frames_mirror=True statically; outputs must match the reference's
    dynamic per-batch detection (vmg.py:426-432) with the model in train
    mode (droppath 0 so train == deterministic numerics)."""
    import dataclasses

    torch.manual_seed(9)
    common = dict(
        embed_dim=[32, 32, 32], depths=[2, 2, 2], num_heads=[2, 4, 2],
        num_frames=4, window_sizes=[(2, 4, 4), (2, 4, 4), (2, 4, 4)],
        mlp_ratio=2, n_groups=1,
    )
    ref = ref_vmg.VMG(
        **common, mdsc=False, if_concat=False, spynet_pretrained="stub",
        image_size=[32, 32], is_train=True, drop_path_rate=0.0,
        traj_win=[4, None], traj_keyframes_n=[2, None], traj_heads=[2, None],
        temporal_type=[False, None], temporal_empty=True,
        traj_res_n=[2, 0, 2], spatial_type=[False, False],
        flow_smooth=True, smooth_region_range=4, retention_decay=True,
        non_linear=True, gating=True, symm=True, symm_act="tanh",
        relu_scale=True, relu_scale_norm=False, ffn_type="ffn_cnn",
        mixer_type=["mlps", "mlps"], mixer_n=[None, None], r_scaling=0.1,
        chunk_ratios=[1 / 4, 1 / 4], traj_mode="wins", twins=[2, 2],
        traj_scale=True, traj_refine=None, m_scaling=1.0,
        if_local_fuse=True, channel_mixer="rcab",
    )
    ref.train()
    sd = {k: v.clone() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(sd, strict=True))

    from vmg_tpu.configs import TINY_TEST_PRESET
    cfg = dataclasses.replace(TINY_TEST_PRESET, drop_path_rate=0.0,
                              remat=False)
    mine = create_model(cfg, is_train=True)

    rng = np.random.default_rng(13)
    half = rng.random((1, 2, 64, 64, 3)).astype(np.float32)
    x = np.concatenate([half, half[:, ::-1]], axis=1)  # use_mirrors batch
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    assert ref.frames_mirror  # the reference detected the mirror
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(mine.apply(
        params, jnp.asarray(x), frames_mirror=True, deterministic=False,
        rngs={"droppath": jax.random.key(0)},
    ))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
