"""Training layer: functional train state, one fused jitted G+D step,
experiment driver, checkpointing."""

from sp_gan_tpu.train.state import TrainState, create_train_state
from sp_gan_tpu.train.step import (make_train_step,
                                   make_train_step_pointsharded,
                                   make_sample_fn,
                                   make_sample_fn_pointsharded)
from sp_gan_tpu.train.trainer import Trainer

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_train_step_pointsharded", "make_sample_fn",
           "make_sample_fn_pointsharded", "Trainer"]
