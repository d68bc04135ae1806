from sav_tpu.train.checkpoint import CheckpointManager
from sav_tpu.train.loop import MetricLogger, TrainConfig, Trainer
from sav_tpu.train.state import (TrainState, build_optimizer,
                                 warmup_cosine_schedule)
from sav_tpu.train.steps import (blended_targets, eval_step, make_eval_step,
                                 make_train_step, shard_batch, shard_state,
                                 train_step)

__all__ = ['CheckpointManager', 'MetricLogger', 'TrainConfig', 'Trainer',
           'TrainState', 'build_optimizer', 'warmup_cosine_schedule',
           'blended_targets', 'eval_step', 'make_eval_step',
           'make_train_step', 'shard_batch', 'shard_state', 'train_step']
