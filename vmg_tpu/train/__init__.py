from vmg_tpu.train.loss import charbonnier_loss, edge_loss, total_loss
from vmg_tpu.train.schedule import cosine_annealing_restart, main_lr_schedule, spynet_lr_schedule
from vmg_tpu.train.optimizer import build_optimizer, param_labels
from vmg_tpu.train.train_step import TrainState, make_train_step, init_train_state
