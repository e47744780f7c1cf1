"""Utilities: low-precision analysis, profiling, metrics."""

from kaldi_fp16_tpu.utils.lowp import (
    analyze_conversion, f32_to_f16, f16_to_f32, f32_to_bf16, ConversionStats,
)
from kaldi_fp16_tpu.utils.profiling import StepTimer, trace, profile_fn
from kaldi_fp16_tpu.utils.metrics import MetricsLogger
