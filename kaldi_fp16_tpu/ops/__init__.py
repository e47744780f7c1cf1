"""Reusable NN compute blocks beyond the xconfig layer set.

Covers the capability surface of the reference's GoTorch side-stack and
cnn_kernels.cu (SURVEY.md §2.4-2.5: conv1d, max/avg pooling, x-vector
statistics pooling, layernorm, depthwise-separable conv, SE block,
dropout) as idiomatic JAX functions — autodiff provides every backward.
"""

from kaldi_fp16_tpu.ops.nn import (
    conv1d, max_pool1d, avg_pool1d, stats_pooling, layer_norm,
    depthwise_separable_conv1d, squeeze_excite, dropout,
)
