from fdgan_tpu.train.loop import TrainState, create_train_state, make_train_step
from fdgan_tpu.train.schedule import linear_decay_schedule, adjust_learning_rate
from fdgan_tpu.train.pool import ImagePool
from fdgan_tpu.train.meters import AverageMeter, MetricLogger

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "linear_decay_schedule",
    "adjust_learning_rate",
    "ImagePool",
    "AverageMeter",
    "MetricLogger",
]
