from vmg_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_sharded_train_step,
    process_local_batch_slice,
)
from vmg_tpu.parallel.tp import (
    param_shardings,
    shard_params,
    state_shardings,
    shard_state,
)
