"""Training: mixed-precision SGD, loss scaling, train step, checkpointing.

(ref: internal/gpu/optimize.go, internal/nnet/train_step.go,
cpp/include/tensor_fp16.h LossScaler.)
"""

from kaldi_fp16_tpu.training.optimizer import SGDConfig, init_sgd_state, sgd_update
from kaldi_fp16_tpu.training.loss_scale import LossScaleState, init_loss_scale, update_loss_scale
from kaldi_fp16_tpu.training.train_step import TrainConfig, make_train_step, TrainStepOutput
