"""WFST Viterbi beam decoding + lattices + WER.

NET-NEW capability: the reference implements no decoder at all
(SURVEY.md §6: "WER (no decoder exists in the reference)"); this supplies
the inference half of the hybrid-ASR pipeline: acoustic posteriors ->
HCLG beam search -> word sequence -> WER.
"""

from kaldi_fp16_tpu.decode.viterbi import DecodeOptions, ViterbiDecoder, DecodeResult
from kaldi_fp16_tpu.decode.graph import DecodingGraph
from kaldi_fp16_tpu.decode.wer import wer, levenshtein
from kaldi_fp16_tpu.decode.tpu_viterbi import DenseViterbiDecoder, DenseGraph
from kaldi_fp16_tpu.decode.lm import NGramLM as _NGramLM  # noqa: F401
from kaldi_fp16_tpu.decode.lm import read_arpa, read_symbol_table, sentence_cost
from kaldi_fp16_tpu.decode.lattice import (
    Lattice, LatticeArc, LatticeDecodeOptions, LatticeDecoder, NGramLM,
    rescore_with_lm,
)
from kaldi_fp16_tpu.decode.tpu_viterbi import (
    DeviceLatticeDecoder, SparseViterbiDecoder,
)
from kaldi_fp16_tpu.decode.streaming import (
    StreamingDecoder, StreamingEncoder, StreamingPipeline,
    WindowedStreamingDecoder,
)
