from vmg_tpu.data.storage import open_backend, PackedWriter
from vmg_tpu.data.clip_dataset import REDSDataset, VimeoDataset, create_dataset, RepeatDataset
from vmg_tpu.data.sampler import IterSampler
from vmg_tpu.data.loader import PrefetchLoader, create_dataloader
from vmg_tpu.data.color import rgb2ycbcr, bgr2ycbcr, ycbcr2rgb, channel_convert
