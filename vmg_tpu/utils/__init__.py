from vmg_tpu.utils.logging_utils import setup_logger, AverageMeter
from vmg_tpu.utils.misc import set_random_seed, mkdir_and_rename, count_params
from vmg_tpu.utils.scalars import ScalarLogger, make_scalar_logger
from vmg_tpu.utils.collect_env import collect_env
