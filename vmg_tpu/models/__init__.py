from vmg_tpu.models.vmg import VMG, create_model, MlpEncoderStage, InputProj, UpdownkeepSampling
from vmg_tpu.models.spynet import SPyNet
from vmg_tpu.models.trajectory import TrajectoryMultiHead, LTAM, ResidualBlocksWithInputConv
from vmg_tpu.models.blocks import TAB, MorphFC, MorphFCDecay
from vmg_tpu.models.swin3d import DecoderLayer
