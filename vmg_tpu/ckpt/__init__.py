from vmg_tpu.ckpt.torch_convert import (
    convert_torch_state_dict,
    convert_spynet_state_dict,
    strip_module_prefix,
)
from vmg_tpu.ckpt.orbax_io import save_checkpoint, restore_checkpoint, latest_step
