"""Typed configuration for VMG-TPU.

The reference drives everything through a YAML -> NoneDict where *any*
missing key silently reads as ``None`` and is then passed positionally into
the model constructor (reference ``utils/config.py:97-110``,
``models/__init__.py:11-44``) -- SURVEY.md §5 documents how this bricks the
full-model config.  Here every knob is a typed dataclass field with an
explicit default; unknown YAML keys raise instead of disappearing.

YAML files using the reference schema load directly (same section names and
key names), so a user of the reference can bring their configs across.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from fractions import Fraction
from typing import Optional, Tuple

import yaml


def _frac(x) -> float:
    if isinstance(x, str):
        return float(Fraction(x))
    return float(x)


@dataclass
class VMGNetworkConfig:
    """Architecture of the VMG U-Net (reference ``models/vmg.py:176-413``)."""

    in_chans: int = 3
    embed_dim: Tuple[int, ...] = (144, 144, 144)
    depths: Tuple[int, ...] = (4, 4, 4)
    num_heads: Tuple[int, ...] = (4, 8, 4)
    num_frames: int = 6
    window_sizes: Tuple[Tuple[int, int, int], ...] = ((2, 8, 8), (4, 8, 8), (2, 8, 8))
    mlp_ratio: float = 2.0
    n_groups: int = 1
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    back_RBs: int = 0
    spynet: Optional[str] = "spynet"  # None disables flow entirely
    flow_fix: Optional[int] = 5000
    image_size: Tuple[int, int] = (64, 64)
    # temporal mixing per *encoder* stage (index i also covers mirror stage)
    ltam: bool = True
    traj_win: Tuple[Optional[int], ...] = (6, None)
    traj_keyframes_n: Tuple[Optional[int], ...] = (3, None)
    traj_heads: Tuple[Optional[int], ...] = (4, None)
    # temporal_type per enc stage: False -> trajectory, None -> window attn
    # (or identity when temporal_empty), True -> flow-guided DCN alignment
    temporal_type: Tuple[Optional[bool], ...] = (False, None)
    temporal_empty: bool = True
    traj_res_n: Tuple[int, ...] = (15, 0, 15)  # per *layer* (enc+dec)
    deform_groups: Tuple[int, ...] = (8, 16, 8)
    max_res_scale: Tuple[int, ...] = (1, 2, 1)
    spatial_type: Tuple[bool, ...] = (False, False)
    use_mdsc: bool = False
    if_concat: bool = False
    flow_smooth: bool = True
    smooth_region_range: int = 4
    ret_decay: bool = True
    non_linear: bool = True
    gating: bool = True
    if_symm: bool = True
    symm_act: str = "tanh"
    relu_scale: bool = True
    relu_scale_norm: bool = False
    ffn_type: str = "ffn_cnn"
    mixer_type: Tuple[str, ...] = ("mlps", "mlps")
    mixer_n: Tuple[Optional[int], ...] = (None, None)
    r_scaling: float = 0.1
    chunk_ratios: Tuple[float, ...] = (0.125, 0.25)
    traj_mode: str = "wins"
    twins: Tuple[int, int] = (2, 2)
    traj_scale: bool = True
    traj_refine: Optional[str] = None
    m_scaling: float = 1.0
    if_local_fuse: bool = True
    channel_mixer: str = "rcab"
    # TPU-only knob: rematerialize TAB blocks and the trajectory scan step
    # in the backward pass (jax.checkpoint) -- trades FLOPs for the
    # activation memory the training recipe needs (crop 256, T=16)
    remat: bool = True
    # optional jax.checkpoint_policies name for the remat calls (e.g.
    # 'dots_saveable' saves MXU outputs: less recompute, more memory);
    # None = save nothing (full recompute inside remat'ed blocks)
    remat_policy: Optional[str] = None
    # MorphFC axis-FC form: True = block-diagonal big-matrix (serving
    # fast path; materializes (chunk*C)^2 weights), False = transpose
    # form with true (C, C) weights (training memory probe)
    morph_fused: bool = True
    # training-only: optimization_barrier between TAB blocks.  The train
    # step's 11.9 GB temp cliff is the scheduler interleaving many TAB
    # backwards' FFN-hidden working sets (round-5 buffer forensics); the
    # barrier's backward is also a barrier, forcing block-sequential
    # scheduling at the cost of cross-block overlap
    stage_barrier: bool = False
    # 'per_level' reruns SPyNet on every pyramid level (reference
    # vmg.py:435-453 semantics); 'shared' computes level-0 flow once and
    # average-pools it down (faster, near-identical fields) -- opt-in
    flow_levels: str = "per_level"

    def __post_init__(self):
        self.embed_dim = tuple(self.embed_dim)
        self.depths = tuple(self.depths)
        self.num_heads = tuple(self.num_heads)
        self.window_sizes = tuple(tuple(w) for w in self.window_sizes)
        self.chunk_ratios = tuple(_frac(r) for r in self.chunk_ratios)
        for f in ("traj_win", "traj_keyframes_n", "traj_heads",
                  "temporal_type", "traj_res_n", "deform_groups",
                  "max_res_scale", "spatial_type", "mixer_type", "mixer_n",
                  "twins", "image_size"):
            v = getattr(self, f)
            if isinstance(v, list):
                setattr(self, f, tuple(v))
        if len(self.embed_dim) != len(self.depths):
            raise ValueError("embed_dim and depths must have equal length")
        n_enc = len(self.depths) // 2 + 1
        if len(self.chunk_ratios) < n_enc:
            raise ValueError(f"need {n_enc} chunk_ratios, got {len(self.chunk_ratios)}")

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_enc_layers(self) -> int:
        return self.num_layers // 2 + 1

    @property
    def num_dec_layers(self) -> int:
        return self.num_layers // 2

    @property
    def scale_factor(self) -> int:
        """Spatial pad multiple: 2^(enc_layers - 1)."""
        return 2 ** (self.num_enc_layers - 1)


@dataclass
class DatasetConfig:
    name: str = "REDS"
    mode: str = "train"
    dataroot_HR: Optional[str] = None
    dataroot_LR: Optional[str] = None
    cache_keys: Optional[str] = None
    dataset_root: Optional[str] = None  # eval LR root
    gt_root: Optional[str] = None  # eval GT root
    num_frames: int = 16
    num_out_frames: int = 100
    use_shuffle: bool = True
    n_workers: int = 4
    batch_size: int = 8
    total_batch: int = 8
    crop_size: int = 256
    image_shape: Tuple[int, int, int] = (3, 720, 1280)
    image_shape_r: Tuple[int, int, int] = (3, 256, 256)
    use_hflip: bool = True
    use_vflip: bool = True
    use_rot: bool = True
    use_mirrors: bool = False
    random_reverse: bool = True
    dataset_expand_ratio: int = 2
    total_num_frames: int = 100
    pre_seed: int = 0
    interval_list: Tuple[int, ...] = (1,)
    # eval-only knobs
    data_enhance: bool = False
    eval_mid_clip: bool = False
    selected_topk: int = 1
    overlapped_mode: str = "mid"  # small | mid | large | int
    FLOPs: bool = False
    flops_num_frames: int = 16
    wins: Optional[Tuple[int, int]] = (128, 128)
    overlapped_spatial_length: int = 20


@dataclass
class TrainConfig:
    lr: float = 2e-4
    lr_scheme: str = "CosineAnnealingLR_Restart"
    beta1: float = 0.9
    beta2: float = 0.99
    niter: int = 600000
    warmup_iter: int = -1
    T_period: Tuple[int, ...] = (600000,)
    restarts: Optional[Tuple[int, ...]] = None
    restart_weights: Tuple[float, ...] = (1.0,)
    eta_min: float = 1e-7
    val_freq: int = 5000
    manual_seed: int = 0
    amp: bool = False  # on TPU: bf16 compute, no loss scaling
    grad_acc: bool = True
    if_grad_clip: bool = False
    grad_clip_up: float = 0.5
    revise_epoch: bool = True
    pre_training: bool = True  # SPyNet param group at pre_lr_ratio * lr
    pre_lr_ratio: float = 0.125
    weight_decay: Optional[float] = None  # applied to .mlp_blocks. params
    f_u_params: bool = False
    eps: float = 1e-12  # Charbonnier epsilon (inside sqrt)
    if_aux: bool = True
    aux_ratio: float = 0.005
    reduced_iter: Optional[int] = None

    def __post_init__(self):
        # YAML 1.1 parses bare scientific notation ('1e-12') as a string --
        # the reference worked around it with !!float tags; coerce instead
        for f in ("lr", "eta_min", "eps", "aux_ratio", "pre_lr_ratio",
                  "grad_clip_up", "beta1", "beta2"):
            setattr(self, f, float(getattr(self, f)))
        if self.weight_decay is not None:
            self.weight_decay = float(self.weight_decay)
        self.niter = int(self.niter)
        self.val_freq = int(float(self.val_freq))


@dataclass
class EvalConfig:
    checkpoint_from: str = "mine"  # mine | ST | KAIR
    tta: bool = False


@dataclass
class LoggerConfig:
    print_freq: int = 1000
    save_checkpoint_freq: int = 10000
    use_tb_logger: bool = False


@dataclass
class PathConfig:
    pretrain_model: Optional[str] = None
    strict_load: bool = True
    resume_state: Optional[str] = None
    output_dir: str = "./results"
    experiments_root: str = "./experiments"


@dataclass
class ExperimentConfig:
    name: str = "VMG-REDS"
    model: str = "VMG"
    scale: int = 4
    is_train: bool = True
    network: VMGNetworkConfig = field(default_factory=VMGNetworkConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    logger: LoggerConfig = field(default_factory=LoggerConfig)
    path: PathConfig = field(default_factory=PathConfig)
    # parallelism: device mesh axes (data, tensor); tensor>1 shards the
    # bottleneck embed dim
    mesh_shape: Tuple[int, int] = (1, 1)


# --- YAML loading (reference schema compatible) ----------------------------

_NET_KEY_ALIASES = {
    "use_mdsc": "use_mdsc",
    "if_symm": "if_symm",
    "max_res_scale": "max_res_scale",
    "ret_decay": "ret_decay",
}

_IGNORED_TOP_KEYS = {"use_tb_logger", "gpu_ids", "if_train", "checkpoint_from"}


def _build(dc_cls, data: dict, ctx: str):
    names = {f.name for f in dataclasses.fields(dc_cls)}
    unknown = set(data) - names
    if unknown:
        raise KeyError(f"unknown {ctx} config keys: {sorted(unknown)}")
    return dc_cls(**data)


def load_config(path: str, is_train: Optional[bool] = None) -> ExperimentConfig:
    """Load a reference-schema YAML into a typed ExperimentConfig."""
    with open(path) as f:
        raw = yaml.safe_load(f)

    net = dict(raw.get("network", {}))
    # reference network-section keys that map 1:1
    rename = {"spynet": "spynet"}
    net.pop("flops_num_frames", None)
    netcfg_fields = {f.name for f in dataclasses.fields(VMGNetworkConfig)}
    net = {rename.get(k, k): v for k, v in net.items() if k in netcfg_fields or k not in _IGNORED_TOP_KEYS}
    # drop Nones so dataclass defaults win (reference uses ~ for "default")
    net = {k: v for k, v in net.items() if v is not None or k in (
        "spynet", "flow_fix", "traj_refine", "restarts")}
    net = {k: v for k, v in net.items() if k in netcfg_fields}

    ds = {k: v for k, v in dict(raw.get("dataset", {})).items()}
    ds_fields = {f.name for f in dataclasses.fields(DatasetConfig)}
    ds = {k: v for k, v in ds.items() if k in ds_fields and v is not None}

    tr = dict(raw.get("train", {}) or {})
    tr_fields = {f.name for f in dataclasses.fields(TrainConfig)}
    tr = {k: (int(v) if k in ("niter", "val_freq") else v) for k, v in tr.items() if k in tr_fields and v is not None}
    if "T_period" in tr:
        tr["T_period"] = tuple(int(x) for x in tr["T_period"])

    lg = dict(raw.get("logger", {}) or {})
    lg_fields = {f.name for f in dataclasses.fields(LoggerConfig)}
    lg = {k: int(v) if k != "use_tb_logger" else v for k, v in lg.items() if k in lg_fields}
    if raw.get("use_tb_logger") is not None:
        lg["use_tb_logger"] = bool(raw["use_tb_logger"])

    pt = dict(raw.get("path", {}) or {})
    pt_fields = {f.name for f in dataclasses.fields(PathConfig)}
    pt = {k: v for k, v in pt.items() if k in pt_fields and v is not None}

    train_flag = raw.get("if_train", True) if is_train is None else is_train
    imgshape_r = ds.get("image_shape_r", (3, 256, 256))
    scale = int(raw.get("scale", 4))
    net.setdefault("image_size", (imgshape_r[1] // scale, imgshape_r[2] // scale))

    return ExperimentConfig(
        name=raw.get("name", "VMG"),
        model=raw.get("model", "VMG"),
        scale=scale,
        is_train=bool(train_flag),
        network=_build(VMGNetworkConfig, net, "network"),
        dataset=_build(DatasetConfig, ds, "dataset"),
        train=_build(TrainConfig, tr, "train"),
        eval=EvalConfig(checkpoint_from=raw.get("checkpoint_from", "mine")),
        logger=_build(LoggerConfig, lg, "logger"),
        path=_build(PathConfig, pt, "path"),
    )


# --- presets ----------------------------------------------------------------

FEW_LEVELS_PRESET = VMGNetworkConfig()  # defaults mirror VMG-REDS-few_levels.yml

FULL_PRESET = VMGNetworkConfig(
    embed_dim=(112, 224, 224, 448, 224, 224, 112),
    depths=(4, 4, 2, 2, 2, 4, 4),
    num_heads=(4, 8, 8, 16, 8, 8, 4),
    num_frames=16,
    window_sizes=(
        (2, 8, 8), (4, 8, 8), (6, 8, 8), (8, 8, 8), (6, 8, 8), (4, 8, 8), (2, 8, 8),
    ),
    mlp_ratio=6.0,
    n_groups=4,
    traj_win=(16, None, None, None),
    traj_keyframes_n=(3, None, None, None),
    traj_heads=(4, None, None, None),
    temporal_type=(False, None, None, None),
    temporal_empty=True,
    traj_res_n=(15, 0, 0, 0, 0, 0, 15),
    # the full reference YAML omits these; canonical values follow the
    # few-levels config pattern (SURVEY.md §5 "config minefield")
    deform_groups=(8, 16, 16, 32),
    max_res_scale=(1, 2, 2, 4),
    spatial_type=(False, False, False, False),
    mixer_type=("mlps", "mlps", "mlps", "mlps"),
    mixer_n=(None, None, None, None),
    use_mdsc=True,
    chunk_ratios=(0.125, 0.25, 0.1875, 0.125),
    if_local_fuse=True,
    channel_mixer="rcab",
)

TINY_TEST_PRESET = VMGNetworkConfig(
    embed_dim=(32, 32, 32),
    depths=(2, 2, 2),
    num_heads=(2, 4, 2),
    num_frames=4,
    window_sizes=((2, 4, 4), (2, 4, 4), (2, 4, 4)),
    mlp_ratio=2.0,
    traj_win=(4, None),
    traj_keyframes_n=(2, None),
    traj_heads=(2, None),
    temporal_type=(False, None),
    traj_res_n=(2, 0, 2),
    image_size=(32, 32),
    chunk_ratios=(0.25, 0.25),
)
