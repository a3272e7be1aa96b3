from .metrics import abs_depth_error, threshold_metric, interval_metric, eval_metrics
from .state import TrainState, create_train_state, make_lr_schedule, make_optimizer
from .loop import make_train_step, make_eval_step, Trainer
from .checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint
