"""xconfig parser + layer resolution tests."""

import pytest

from kaldi_fp16_tpu.models.xconfig import (
    LayerType, InputType, parse_xconfig, parse_input,
)
from kaldi_fp16_tpu.models.layers import resolve_layers
from kaldi_fp16_tpu.models.model import build_model, build_model_from_string

SMALL = """\
input name=input dim=40
input name=ivector dim=32
idct-layer name=idct input=input dim=40
linear-component name=linear1 input=Append(idct, ivector) dim=128
batchnorm-component name=bn1
tdnnf-layer name=tdnnf1 dim=128 bottleneck-dim=64 time-stride=0 bypass-scale=0.66
tdnnf-layer name=tdnnf2 dim=128 bottleneck-dim=64 time-stride=3 bypass-scale=0.66
prefinal-layer name=prefinal input=tdnnf2 small-dim=64 big-dim=128
output-layer name=output dim=40 include-log-softmax=false
"""


class TestParser:
    def test_parse_small(self):
        cfgs = parse_xconfig(SMALL)
        assert len(cfgs) == 9
        assert cfgs[0].type == LayerType.INPUT
        assert cfgs[3].type == LayerType.LINEAR
        assert cfgs[3].input_spec() == "Append(idct, ivector)"
        assert cfgs[5].get_float("bypass-scale") == 0.66
        assert not cfgs[8].get_bool("include-log-softmax", True)

    def test_comments_and_blank_lines(self):
        cfgs = parse_xconfig("# comment\n\ninput name=a dim=4  # trailing\n")
        assert len(cfgs) == 1
        assert cfgs[0].name == "a"

    def test_unknown_type(self):
        with pytest.raises(ValueError):
            parse_xconfig("frobnicate-layer name=x dim=3")

    def test_missing_name(self):
        with pytest.raises(ValueError):
            parse_xconfig("input dim=3")

    def test_int_list(self):
        cfgs = parse_xconfig(
            "conv-relu-batchnorm-layer name=c height-in=4 num-filters-out=2 "
            "time-offsets=-1,0,1 height-offsets=-1,0,1")
        assert cfgs[0].get_int_list("time-offsets") == [-1, 0, 1]


class TestParseInput:
    def test_simple(self):
        r = parse_input("tdnnf3")
        assert r.type == InputType.SIMPLE and r.name == "tdnnf3"

    def test_append(self):
        r = parse_input("Append(a, b, c)")
        assert r.type == InputType.APPEND
        assert r.names == ["a", "b", "c"]

    def test_append_with_replace_index(self):
        r = parse_input("Append(idct, ReplaceIndex(ivector, t, 0))")
        assert r.names == ["idct", "ReplaceIndex(ivector, t, 0)"]

    def test_replace_index(self):
        r = parse_input("ReplaceIndex(ivector, t, 0)")
        assert r.type == InputType.REPLACE_INDEX and r.source == "ivector"

    def test_empty_is_previous(self):
        assert parse_input("").type == InputType.PREVIOUS


class TestResolve:
    def test_dims(self):
        model = build_model_from_string(SMALL)
        lm = model.layer_map
        assert lm["idct"].input_dim == 40 and lm["idct"].output_dim == 40
        assert lm["linear1"].input_dim == 72   # 40 + 32
        assert lm["linear1"].output_dim == 128
        assert lm["bn1"].output_dim == 128
        assert lm["tdnnf1"].output_dim == 128
        assert lm["prefinal"].output_dim == 64
        assert lm["output"].input_dim == 64
        assert lm["output"].output_dim == 40

    def test_dotted_suffix_resolution(self):
        """Dotted suffix match takes the latest layer (ref layers.go:357-374)."""
        text = """\
input name=input dim=8
linear-component name=block.a dim=16
linear-component name=block.b dim=24
linear-component name=out input=block dim=4
"""
        model = build_model_from_string(text)
        assert model.layer_map["out"].input_dim == 24

    def test_missing_input_raises(self):
        with pytest.raises(ValueError):
            build_model_from_string("input name=a dim=4\n"
                                    "linear-component name=l input=nope dim=2")

    def test_conv_offsets_cartesian(self):
        """time x height offsets form a cartesian product (Kaldi <Offsets>)."""
        text = ("input name=input dim=12\n"
                "conv-relu-batchnorm-layer name=c height-in=4 height-out=4 "
                "time-offsets=-1,0,1 height-offsets=-1,0,1 num-filters-out=8")
        model = build_model_from_string(text)
        spec = model.layer_map["c"].spec
        assert spec.num_filters_in == 3
        assert len(spec.offsets) == 9
        assert spec.offsets[0] == (-1, -1)
        assert spec.offsets[-1] == (1, 1)
        assert model.layer_map["c"].output_dim == 32

    def test_attention_dims(self):
        text = ("input name=input dim=64\n"
                "attention-relu-batchnorm-layer name=att num-heads=4 "
                "value-dim=8 key-dim=8 num-left-inputs=3 num-right-inputs=2 "
                "time-stride=3")
        model = build_model_from_string(text)
        spec = model.layer_map["att"].spec
        assert spec.context_dim == 6
        assert model.layer_map["att"].output_dim == 4 * (8 + 6)


class TestFlagship:
    def test_cnn_tdnn_config(self):
        model = build_model("configs/cnn_tdnn.xconfig")
        lm = model.layer_map
        assert lm["combine_inputs"].input_dim == 240   # 40 + 200
        assert lm["cnn1"].spec.num_filters_in == 6
        assert lm["cnn1"].output_dim == 40 * 64
        assert lm["cnn3"].output_dim == 20 * 128
        assert lm["cnn6"].output_dim == 10 * 256
        assert lm["tdnnf7"].input_dim == 2560
        assert lm["tdnnf8"].input_dim == 1024
        assert lm["output"].output_dim == 3080
        assert model.chain_output().name == "output"
        assert model.xent_output().name == "output-xent"
        assert model.num_params() > 10_000_000   # ~23M params
        s = model.summary()
        assert "tdnnf21" in s
