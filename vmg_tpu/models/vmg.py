"""The VMG video-SR U-Net in JAX/flax (reference ``models/vmg.py:176-637``).

Layout is channels-last (B, T, H, W, C) end-to-end.  Data-dependent Python
control flow from the reference (mirror detection, dynamic buffer growth)
is replaced by static flags and fixed-size scans so one XLA compilation
covers a (T, H, W) shape.

Stage tails by ``temporal_type[i]`` (reference ``models/function.py:1341``):
  False -> trajectory-attention recurrence (TrajectoryMultiHead)
  None  -> Identity when ``temporal_empty`` else 3D window attention
  True  -> flow-guided deformable alignment (DCN)
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vmg_tpu.configs.config import VMGNetworkConfig
from vmg_tpu.models.blocks import (
    TAB,
    leaky_relu,
    torch_conv_kernel_init,
    trunc_normal_init,
)
from vmg_tpu.models.norms import TorchLayerNorm
from vmg_tpu.models.spynet import SPyNet
from vmg_tpu.models.trajectory import TrajectoryMultiHead, ResidualBlocksWithInputConv
from vmg_tpu.models.swin3d import DecoderLayer
from vmg_tpu.ops.warp import flow_warp
from vmg_tpu.ops.resize import (
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
    upsample_trilinear_frames,
)
from vmg_tpu.ops.pixel_shuffle import pixel_shuffle
from vmg_tpu.ops.deform import modulated_deform_conv2d


class InputProj(nn.Module):
    """Per-frame 3x3 conv + LeakyReLU(0.01) (reference layers.py:674)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        y = x.reshape(B * T, H, W, C)
        y = nn.Conv(self.embed_dim, (3, 3), padding=1,
                    kernel_init=torch_conv_kernel_init(), name="proj")(y)
        y = leaky_relu(y, 0.01)
        return y.reshape(B, T, H, W, self.embed_dim)


class UpdownkeepSampling(nn.Module):
    """Space-to-depth / depth-to-space + LN + Linear resampler
    (reference layers.py:761-798).  Channel order inside the 2x2
    neighborhood is (neiw, neih, c), matching the reference rearrange."""

    dim_in: int
    dim_out: int
    mode: str  # 'down' | 'up' | 'keep'

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        # the projection runs in fp32 regardless of the compute dtype: the
        # bf16 backward of this layer produced a NaN bias gradient on v5e
        # (a reduction pathology), and these linears are a tiny cost
        dense = nn.Dense(self.dim_out, kernel_init=trunc_normal_init(),
                         dtype=jnp.float32, name="linear")
        if self.mode == "down":
            h, w = H // 2, W // 2
            y = x.reshape(B, T, h, 2, w, 2, C)  # (.., h, neih, w, neiw, C)
            y = y.transpose(0, 1, 2, 4, 5, 3, 6).reshape(B, T, h, w, 4 * C)
            y = TorchLayerNorm(4 * self.dim_in, name="norm")(y)
            y = dense(y)
        elif self.mode == "up":
            c4 = C // 4
            y = x.reshape(B, T, H, W, 2, 2, c4)  # (.., neiw, neih, c4)
            y = y.transpose(0, 1, 2, 5, 3, 4, 6).reshape(B, T, 2 * H, 2 * W, c4)
            y = TorchLayerNorm(self.dim_in // 4, name="norm")(y)
            y = dense(y)
        elif self.mode == "keep":
            y = TorchLayerNorm(self.dim_in, name="norm")(x)
            y = dense(y)
        else:
            raise ValueError(self.mode)
        return y.astype(x.dtype)


class DCNv2PackFlowGuided(nn.Module):
    """Flow-guided modulated deformable alignment
    (reference function.py:1029-1100; pa_frames=2 path)."""

    dim: int
    deformable_groups: int
    max_residue_magnitude: float = 10.0

    @nn.compact
    def __call__(self, x, x_warped, x_current, flow):
        """All of x/x_warped/x_current: (N,H,W,C); flow: (N,H,W,2) (x,y)."""
        N, H, W, C = x.shape
        G = self.deformable_groups
        feat = jnp.concatenate([x_warped, x_current, flow], axis=-1)
        y = feat
        for i in range(3):
            y = nn.Conv(self.dim, (3, 3), padding=1,
                        kernel_init=torch_conv_kernel_init(),
                        name=f"conv_offset{i}")(y)
            y = leaky_relu(y, 0.1)
        out = nn.Conv(3 * 9 * G, (3, 3), padding=1,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="conv_offset3")(y)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1)
        )  # (N,H,W,18G) channel c = (g*9+k)*2 + j, j: 0=dy 1=dx
        flow_yx = jnp.stack([flow[..., 1], flow[..., 0]], axis=-1)  # (dy, dx)
        offset = offset.reshape(N, H, W, G, 9, 2) + flow_yx[:, :, :, None, None, :]
        mask = jax.nn.sigmoid(mask).reshape(N, H, W, G, 9)

        weight = self.param(
            "weight", torch_conv_kernel_init(), (3, 3, C, C)
        ).reshape(9, C, C)
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return modulated_deform_conv2d(x, offset, mask, weight, bias)


class MlpEncoderStage(nn.Module):
    """One U-Net stage: TAB stack + optional local fuse + temporal tail
    (reference ``models/function.py:1267-1543`` Mlp_encoder)."""

    cfg: VMGNetworkConfig
    layer_idx: int  # 0..num_layers-1 (enc then dec)
    drop_path: Tuple[float, ...] = ()

    @nn.compact
    def __call__(self, x, flow_forward=None, flow_backward=None,
                 deterministic: bool = True):
        cfg = self.cfg
        B, T, H, W, C = x.shape
        li = self.layer_idx
        n_enc = cfg.num_enc_layers

        def sp(lst):
            # reference per-stage list indexing: encoder i -> lst[i],
            # decoder j -> lst[-j-2] (models/vmg.py:283-366); equals the
            # encoder mirror when len(lst) == num_enc_layers
            if li < n_enc:
                return lst[li]
            return lst[-(li - n_enc) - 2]

        enc_i = li if li < n_enc else (2 * n_enc - 2 - li)
        chunk_h = max(1, int(cfg.image_size[0] * sp(cfg.chunk_ratios)))
        chunk_w = max(1, int(cfg.image_size[1] * sp(cfg.chunk_ratios)))

        if cfg.flow_smooth and flow_forward is not None:
            flow_forward = _flow_smoothing(flow_forward, cfg.smooth_region_range)
            flow_backward = _flow_smoothing(flow_backward, cfg.smooth_region_range)

        shortcut = x
        pol = (getattr(jax.checkpoint_policies, cfg.remat_policy)
               if cfg.remat_policy else None)
        # prevent_cse=True (the jax default) is LOAD-BEARING for memory:
        # with False, jax.checkpoint's internal optimization_barriers are
        # dropped and XLA hoists every TAB's backward recompute together
        # -- ~50 coexisting (..., 672) GELU-chain buffers, the 11.9 GB
        # temp cliff of rounds 3-4.  True ties each recompute to its
        # backward position: temp 11.57 -> 6.12 GB measured (round-5
        # buffer forensics, docs/PERF.md).
        tab_cls = (nn.remat(TAB, prevent_cse=True, static_argnums=(2,),
                            policy=pol)
                   if (cfg.remat and not deterministic) else TAB)
        for b in range(cfg.depths[li]):
            x = tab_cls(
                dim=C,
                chunk_h=chunk_h,
                chunk_w=chunk_w,
                mlp_ratio=cfg.mlp_ratio,
                n_groups=cfg.n_groups,
                qkv_bias=cfg.qkv_bias,
                drop_path=self.drop_path[b] if b < len(self.drop_path) else 0.0,
                if_decay=cfg.ret_decay,
                non_linear=cfg.non_linear,
                gating=cfg.gating,
                symm=cfg.if_symm,
                symm_act=cfg.symm_act,
                relu_scale=cfg.relu_scale,
                relu_scale_norm=cfg.relu_scale_norm,
                ffn_type=cfg.ffn_type,
                mixer_type=sp(cfg.mixer_type),
                mixer_n=sp(cfg.mixer_n),
                mixer_scaling=cfg.m_scaling,
                channel_mixer=cfg.channel_mixer,
                morph_fused=cfg.morph_fused,
                name=f"mlp_blocks{b}",
            )(x, deterministic)
            if cfg.stage_barrier and not deterministic:
                x = jax.lax.optimization_barrier(x)

        if cfg.if_local_fuse:
            y = x.reshape(B * T, H, W, C)
            y = nn.Conv(C, (3, 3), padding=1,
                        kernel_init=torch_conv_kernel_init(), name="local_cnn")(y)
            x = shortcut + y.reshape(B, T, H, W, C)

        aligned = sp(cfg.temporal_type)
        if aligned is True:
            x = self._dcn_alignment(x, flow_forward, flow_backward, enc_i)
        elif aligned is None:
            if not cfg.temporal_empty:
                x = DecoderLayer(
                    dim=C,
                    depth=2,
                    num_heads=cfg.num_heads[li],
                    window_size=tuple(cfg.window_sizes[li]),
                    mlp_ratio=cfg.mlp_ratio,
                    qkv_bias=cfg.qkv_bias,
                    name="traj_mixing",
                )(x, deterministic)
            # else: identity
        else:  # False -> trajectory attention
            x = TrajectoryMultiHead(
                embed_dim=C,
                num_blocks=cfg.traj_res_n[li],
                keyframe_stride=sp(cfg.traj_keyframes_n) or 3,
                head=sp(cfg.traj_heads) or 4,
                mode=cfg.traj_mode,
                head_scale=cfg.traj_scale,
                r_scaling=cfg.r_scaling,
                twins=tuple(cfg.twins),
                ltam=cfg.ltam,
                traj_win=sp(cfg.traj_win),
                remat=cfg.remat and not deterministic,
                remat_policy=cfg.remat_policy,
                # 'auto' resolves to the fused Pallas LTAM attention on
                # TPU (forward AND backward -- the kernel carries a
                # custom VJP, ops/ltam_attention) and to the XLA windows
                # form elsewhere
                win_impl="auto",
                # in-scan resblock impl: 'xla' everywhere.  The fused
                # conv-chain Pallas resblock (ops/conv_chain) was
                # MEASURED SLOWER inside the scan (197.8 -> 244.0 ms on
                # the standalone trajectory: 15 per-block pad copies +
                # custom-call boundaries outweigh the W-major-carry conv
                # penalty), as were input/output layout-pin barriers
                # (no effect / 659 ms) -- docs/PERF.md round 5.
                # VMG_TRAJCONV_KERNEL=pallas|barrier re-enables for A/B.
                conv_impl=(os.environ.get("VMG_TRAJCONV_KERNEL", "xla")
                           if deterministic else "xla"),
                name="traj_mixing",
            )(x, flow_forward, flow_backward)
        return x

    def _dcn_alignment(self, x, flow_forward, flow_backward, enc_i):
        """Parallel 2-frame flow-guided DCN warping
        (reference function.py:1391-1409)."""
        cfg = self.cfg
        B, T, H, W, C = x.shape
        # deform_groups/max_res_scale use the reference's raw-list indexing:
        # encoder stage i -> list[i], decoder stage j -> list[-j-2]
        # (models/vmg.py:301-302,348-349) -- NOT the encoder-mirror index
        # (differs when the config list length != num_enc_layers, as in the
        # few-levels configs where it has num_layers entries)
        li = self.layer_idx
        n_enc = cfg.num_enc_layers
        if li < n_enc:
            dg = cfg.deform_groups[li]
            mrs = cfg.max_res_scale[li]
        else:
            j = li - n_enc
            dg = cfg.deform_groups[-j - 2]
            mrs = cfg.max_res_scale[-j - 2]
        pa_deform = DCNv2PackFlowGuided(
            dim=C,
            deformable_groups=dg,
            max_residue_magnitude=10.0 / mrs,
            name="pa_deform",
        )
        # backward: align frame i -> i-1 for i in 1..T-1
        x_i = x[:, 1:].reshape(B * (T - 1), H, W, C)
        fl_b = flow_backward.reshape(B * (T - 1), H, W, 2)
        warped_b = flow_warp(x_i, fl_b, "bilinear", "zeros")
        cur_b = x[:, :-1].reshape(B * (T - 1), H, W, C)
        al_b = pa_deform(x_i, warped_b, cur_b, fl_b).reshape(B, T - 1, H, W, C)
        x_backward = jnp.concatenate(
            [al_b, jnp.zeros((B, 1, H, W, C), x.dtype)], axis=1
        )
        # forward: align frame i -> i+1 for i in 0..T-2
        x_i = x[:, :-1].reshape(B * (T - 1), H, W, C)
        fl_f = flow_forward.reshape(B * (T - 1), H, W, 2)
        warped_f = flow_warp(x_i, fl_f, "bilinear", "zeros")
        cur_f = x[:, 1:].reshape(B * (T - 1), H, W, C)
        al_f = pa_deform(x_i, warped_f, cur_f, fl_f).reshape(B, T - 1, H, W, C)
        x_forward = jnp.concatenate(
            [jnp.zeros((B, 1, H, W, C), x.dtype), al_f], axis=1
        )
        fused = jnp.concatenate([x, x_backward, x_forward], axis=-1)
        li = self.layer_idx
        out = ResidualBlocksWithInputConv(
            C, cfg.traj_res_n[li], name="pa_fuse"
        )(fused.reshape(B * T, H, W, 3 * C))
        return out.reshape(B, T, H, W, C)


class _ConvPixelShuffle(nn.Module):
    """3x3 conv + PixelShuffle(2) with the channel reorder folded into the
    kernel (ops.pixel_shuffle.conv_pixel_shuffle).  Parameter layout is
    identical to ``nn.Conv(features)`` so checkpoint paths are unchanged."""

    features: int  # conv output channels (C * r^2)
    r: int = 2

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", torch_conv_kernel_init(),
                            (3, 3, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from vmg_tpu.ops.pixel_shuffle import conv_pixel_shuffle

        return conv_pixel_shuffle(x, kernel, bias, self.r)


def _flow_smoothing(flow, region_range: int):
    """Region-average then nearest-upsample the flow field
    (reference function.py:1466-1478).  flow: (B, T, H, W, 2)."""
    B, T, H, W, C2 = flow.shape
    r = region_range
    hf = -(-H // r) * r
    wf = -(-W // r) * r
    f = flow.reshape(B * T, H, W, C2)
    f = jnp.pad(f, ((0, 0), (0, hf - H), (0, wf - W), (0, 0)), mode="reflect")
    f = adaptive_avg_pool2d(f, hf // r, wf // r)
    f = jnp.repeat(jnp.repeat(f, r, axis=1), r, axis=2)[:, :H, :W]
    return f.reshape(B, T, H, W, C2)


class VMG(nn.Module):
    """U-Net over frames with trajectory/window temporal mixing and a
    PixelShuffle x4 reconstruction head (reference models/vmg.py:176)."""

    cfg: VMGNetworkConfig
    is_train: bool = True
    dtype: Any = jnp.float32  # feature-path compute dtype (bf16 policy:
    # cast params with vmg_tpu.train.precision and pass dtype=bf16; flow
    # stays fp32 either way)

    @nn.compact
    def __call__(self, x, *, frames_mirror: bool = False,
                 deterministic: Optional[bool] = None):
        """x: (B, T, H, W, 3) RGB in [0, 1] -> (B, T, 4H, 4W, 3).

        ``frames_mirror``: static flag declaring the clip is a mirrored
        even-length sequence, in which case the backward flow reuses the
        flipped forward flow (reference vmg.py:426-432,455-464 does this
        check dynamically on data; here the eval harness sets it when it
        constructs mirrored inputs).
        """
        cfg = self.cfg
        if deterministic is None:
            deterministic = not self.is_train
        B, T, H, W, _ = x.shape
        assert H >= 64 and W >= 64, "height and width must be at least 64"

        upsample_x = upsample_trilinear_frames(x, 4)

        scale = cfg.scale_factor
        Hp = -(-H // scale) * scale
        Wp = -(-W // scale) * scale
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W), (0, 0)),
                     mode="edge")

        if cfg.spynet is not None:
            flows_f, flows_b = self._compute_flows(xp, frames_mirror)
        else:
            flows_f = [None] * cfg.num_enc_layers
            flows_b = [None] * cfg.num_enc_layers

        feat = InputProj(cfg.embed_dim[0], name="input_proj")(
            xp.astype(self.dtype)
        )

        # stochastic-depth schedule (reference vmg.py:234-241)
        n_enc = cfg.num_enc_layers
        enc_depths = cfg.depths[:n_enc]
        dec_depths = cfg.depths[n_enc:]
        if self.is_train:
            enc_dpr = list(np.linspace(0, cfg.drop_path_rate, sum(enc_depths)))
            dec_dpr = list(np.linspace(0, cfg.drop_path_rate, sum(dec_depths)))[::-1]
        else:
            enc_dpr = [0.0] * sum(enc_depths)
            dec_dpr = [0.0] * sum(dec_depths)

        def stage(idx: int, inp, fl_f, fl_b):
            if idx < n_enc:
                dpr = tuple(enc_dpr[sum(enc_depths[:idx]): sum(enc_depths[: idx + 1])])
                name = f"encoder_layers{idx}"
            else:
                j = idx - n_enc
                dpr = tuple(dec_dpr[sum(dec_depths[:j]): sum(dec_depths[: j + 1])])
                name = f"decoder_layers{j}"
            return MlpEncoderStage(cfg, idx, dpr, name=name)(
                inp, fl_f, fl_b, deterministic
            )

        if cfg.num_layers > 3:
            y = self._forward_multi(feat, flows_f, flows_b, stage)
        else:
            y = self._forward_few(feat, flows_f, flows_b, stage)

        if cfg.if_local_fuse:
            Bf, Tf, Hf, Wf, Cf = y.shape
            z = nn.Conv(Cf, (3, 3), padding=1,
                        kernel_init=torch_conv_kernel_init(), name="local_cnn")(
                y.reshape(Bf * Tf, Hf, Wf, Cf)
            )
            y = feat + z.reshape(Bf, Tf, Hf, Wf, Cf)

        y = y[:, :, :H, :W, :]
        Bf, Tf, Hf, Wf, Cf = y.shape
        out = y.reshape(Bf * Tf, Hf, Wf, Cf)

        for i in range(cfg.back_RBs):
            res = nn.Conv(Cf, (3, 3), padding=1,
                          kernel_init=torch_conv_kernel_init(0.1),
                          name=f"recon_trunk{i}_conv1")(out)
            res = jax.nn.relu(res)
            res = nn.Conv(Cf, (3, 3), padding=1,
                          kernel_init=torch_conv_kernel_init(0.1),
                          name=f"recon_trunk{i}_conv2")(res)
            out = out + res

        # sub-pixel convs with the shuffle's channel reorder folded into
        # the kernels (coarse-granularity data movement; see
        # ops.pixel_shuffle.conv_pixel_shuffle).  Param names/layouts match
        # nn.Conv so torch checkpoints convert unchanged.
        out = _ConvPixelShuffle(Cf * 4, name="upconv1")(out)
        out = leaky_relu(out, 0.1)
        out = _ConvPixelShuffle(64 * 4, name="upconv2")(out)
        out = leaky_relu(out, 0.1)
        out = nn.Conv(64, (3, 3), padding=1,
                      kernel_init=torch_conv_kernel_init(), name="HRconv")(out)
        out = leaky_relu(out, 0.1)
        out = nn.Conv(3, (3, 3), padding=1,
                      kernel_init=torch_conv_kernel_init(), name="conv_last")(out)

        out = out.reshape(Bf, Tf, 4 * Hf, 4 * Wf, 3)
        return out.astype(jnp.float32) + upsample_x

    # ------------------------------------------------------------------

    def _compute_flows(self, xp, frames_mirror: bool):
        """Per-stage flow pyramid (reference vmg.py:435-464)."""
        cfg = self.cfg
        B, T, Hp, Wp, C = xp.shape
        spynet = SPyNet(name="spynet")
        flows_f, flows_b = [], []
        frames = xp.astype(jnp.float32)
        shared = cfg.flow_levels == "shared"
        for i in range(cfg.num_enc_layers):
            h, w = Hp // (2 ** i), Wp // (2 ** i)
            if shared and i > 0:
                # downsample the level-0 flow instead of rerunning SPyNet
                # (flow values halve with resolution)
                fwd = adaptive_avg_pool2d(flows_f[0], h, w) * (0.5 ** i)
                bwd = adaptive_avg_pool2d(flows_b[0], h, w) * (0.5 ** i)
            else:
                lv = adaptive_avg_pool2d(frames.reshape(B * T, Hp, Wp, C), h, w)
                lv = lv.reshape(B, T, h, w, C)
                src_fwd = lv[:, :-1].reshape(B * (T - 1), h, w, C)
                src_bwd = lv[:, 1:].reshape(B * (T - 1), h, w, C)
                fwd = spynet(src_bwd, src_fwd).reshape(B, T - 1, h, w, 2)
                if frames_mirror:
                    bwd = fwd[:, ::-1]
                else:
                    bwd = spynet(src_fwd, src_bwd).reshape(B, T - 1, h, w, 2)
            flows_f.append(fwd)
            flows_b.append(bwd)
        return flows_f, flows_b

    def _forward_multi(self, x, ff, fb, stage):
        cfg = self.cfg
        down = [
            UpdownkeepSampling(cfg.embed_dim[i], cfg.embed_dim[i + 1], "down",
                               name=f"downsample{i}")
            for i in range(cfg.num_enc_layers - 1)
        ]
        ups = [
            UpdownkeepSampling(
                cfg.embed_dim[cfg.num_enc_layers - 1 + i],
                cfg.embed_dim[cfg.num_enc_layers + i],
                "up",
                name=f"upsample{i}",
            )
            for i in range(cfg.num_dec_layers)
        ]

        x1 = stage(0, x, ff[0], fb[0])
        if cfg.use_mdsc:
            B, T, H1, W1, C1 = x1.shape
            p = adaptive_max_pool2d(x1.reshape(B * T, H1, W1, C1), H1 // 4, W1 // 4)
            p = nn.Conv(cfg.embed_dim[2], (1, 1),
                        kernel_init=torch_conv_kernel_init(), name="sc_64_16_conv")(p)
            p = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="sc_64_16_gn")(p)
            x1_3 = jax.nn.relu(p).reshape(B, T, H1 // 4, W1 // 4, cfg.embed_dim[2])
        x1_ = down[0](x1)

        x2 = stage(1, x1_, ff[1], fb[1])
        if cfg.use_mdsc:
            B, T, H2, W2, C2 = x2.shape
            p = adaptive_max_pool2d(x2.reshape(B * T, H2, W2, C2), H2 // 4, W2 // 4)
            p = nn.Conv(cfg.embed_dim[3], (1, 1),
                        kernel_init=torch_conv_kernel_init(), name="sc_32_8_conv")(p)
            p = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="sc_32_8_gn")(p)
            x2_4 = jax.nn.relu(p).reshape(B, T, H2 // 4, W2 // 4, cfg.embed_dim[3])
        x2_ = down[1](x2)

        x3 = stage(2, x2_, ff[2], fb[2])
        x3_ = down[2](x3 + x1_3) if cfg.use_mdsc else down[2](x3)

        x4 = stage(3, x3_, ff[3], fb[3])
        x4_ = ups[0](x4 + x2_4) if cfg.use_mdsc else ups[0](x4)

        def merge(skip, dec, idx):
            if not cfg.if_concat:
                return dec + skip
            B, T, Hc, Wc, Cc = dec.shape
            cat = jnp.concatenate([skip, dec], axis=-1).reshape(B * T, Hc, Wc, 2 * Cc)
            red = nn.Conv(Cc, (1, 1), kernel_init=torch_conv_kernel_init(),
                          name=f"reduce{idx}")(cat)
            return red.reshape(B, T, Hc, Wc, Cc)

        x5 = stage(4, x4_, ff[2], fb[2])
        x5_ = ups[1](merge(x3, x5, 2))
        x6 = stage(5, x5_, ff[1], fb[1])
        x6_ = ups[2](merge(x2, x6, 1))
        x7 = stage(6, x6_, ff[0], fb[0])
        return merge(x1, x7, 0)

    def _forward_few(self, x, ff, fb, stage):
        cfg = self.cfg
        down0 = UpdownkeepSampling(cfg.embed_dim[0], cfg.embed_dim[1], "down",
                                   name="downsample0")
        up0 = UpdownkeepSampling(cfg.embed_dim[1], cfg.embed_dim[2], "up",
                                 name="upsample0")
        x1 = stage(0, x, ff[0], fb[0])
        x1_ = down0(x1)
        x2 = stage(1, x1_, ff[1], fb[1])
        x2_ = up0(x2)
        x3 = stage(2, x2_, ff[0], fb[0])
        return x3 + x1


def create_model(cfg: VMGNetworkConfig, is_train: bool = True,
                 dtype: Any = jnp.float32) -> VMG:
    return VMG(cfg=cfg, is_train=is_train, dtype=dtype)
