"""Kaldi nnet3 text parser + weight import tests, including the reference's
own captured fixture snippets (weight_loader_test.go:11-52) and an
export -> import round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.models.model import build_model_from_string
from kaldi_fp16_tpu.models.network import forward, init_params
from kaldi_fp16_tpu.models.kaldi_loader import (
    export_params_to_text, load_weights_from_text, parse_nnet3_text,
)

# Mirror of the reference test fixture (captured nnet3-copy output shapes)
FIXTURE = """\
<ComponentName> idct <FixedAffineComponent> <LinearParams>  [
  0.1581139 0.0870932 0.05438261 0.03986969
  0.1581139 0.08655624 0.05304353 0.03766649 ]
<BiasParams>  [ 0.0 0.0 0.0 0.0 ]
<ComponentName> ivector-linear <LinearComponent> <MaxChange> 0.75 <L2Regularize> 0.03 <LearningRate> 0.0001 <Params>  [
  0.01 0.02 0.03
  0.04 0.05 0.06 ]
<ComponentName> ivector-batchnorm <BatchNormComponent> <Dim> 4 <BlockDim> 4 <Epsilon> 0.001 <TargetRms> 0.025 <TestMode> F <Count> 176000 <StatsMean>  [ -0.005183299 -0.00281566 0.001 0.002 ]
<StatsVar>  [ 0.1 0.2 0.3 0.4 ]
<ComponentName> cnn1.conv <TimeHeightConvolutionComponent> <LearningRateFactor> 0.333 <MaxChange> 0.25 <L2Regularize> 0.03 <LearningRate> 3.33e-05 <Model> <ConvolutionModel> <NumFiltersIn> 6 <NumFiltersOut> 48 <HeightIn> 40 <HeightOut> 40 <HeightSubsampleOut> 1 <Offsets> [ -1,-1 -1,0 -1,1 0,-1 0,0 0,1 1,-1 1,0 1,1 ]
<LinearParams>  [
  0.001 0.002 0.003
  0.004 0.005 0.006 ]
<BiasParams>  [ 0.05598261 0.06961362 0.07 ]
<ComponentName> cnn1.relu <RectifiedLinearComponent> <Dim> 1920 <ValueAvg>  [ 0.05577822 0.08261247 ]
<ComponentName> cnn1.batchnorm <BatchNormComponent> <Dim> 3 <BlockDim> 3 <Epsilon> 0.001 <TargetRms> 1 <TestMode> F <Count> 68864 <StatsMean>  [ 0.01 0.02 0.03 ]
<StatsVar>  [ 0.5 0.6 0.7 ]
<ComponentName> tdnnf7.linear <TdnnComponent> <MaxChange> 0.75 <L2Regularize> 0.03 <LearningRate> 0.0001 <TimeOffsets> [ 0 ]
<LinearParams>  [
  3.699428e-43 -3.699428e-43
  -3.643376e-43 3.643376e-43 ]
<BiasParams>  [ ]
<ComponentName> output.affine <NaturalGradientAffineComponent> <MaxChange> 1.5 <L2Regularize> 0.015 <LearningRate> 0.0001 <LinearParams>  [
  0.1 0.2 0.3
  0.4 0.5 0.6
  0.7 0.8 0.9 ]
<BiasParams>  [ 0.01 0.02 0.03 ]
<ComponentName> noop1 <NoOpComponent> <Dim> 768
<ComponentName> output-xent.log-softmax <LogSoftmaxComponent> <Dim> 3080 <ValueAvg>  [ ]
"""


class TestParseNnet3Text:
    def test_component_inventory(self):
        comps = parse_nnet3_text(FIXTURE)
        assert set(comps) >= {"idct", "ivector-linear", "ivector-batchnorm",
                              "cnn1.conv", "cnn1.batchnorm", "tdnnf7.linear",
                              "output.affine"}

    def test_offset_lists(self):
        comps = parse_nnet3_text(FIXTURE)
        conv = comps["cnn1.conv"]
        assert conv.offsets == [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0),
                                (0, 1), (1, -1), (1, 0), (1, 1)]
        assert conv.height_subsample == 1
        assert comps["tdnnf7.linear"].time_offsets == [0]

    def test_idct(self):
        c = parse_nnet3_text(FIXTURE)["idct"]
        assert c.type == "FixedAffineComponent"
        assert c.linear_params.shape == (2, 4)
        assert abs(c.linear_params[0, 0] - 0.1581139) < 1e-7
        np.testing.assert_array_equal(c.bias_params, np.zeros(4))

    def test_linear(self):
        c = parse_nnet3_text(FIXTURE)["ivector-linear"]
        assert c.linear_params.shape == (2, 3)
        assert c.max_change == 0.75
        assert c.l2_regularize == 0.03

    def test_batchnorm(self):
        c = parse_nnet3_text(FIXTURE)["ivector-batchnorm"]
        assert c.target_rms == 0.025
        assert c.epsilon == 0.001
        assert c.count == 176000
        assert len(c.stats_mean) == 4
        assert abs(c.stats_mean[0] + 0.005183299) < 1e-8
        np.testing.assert_allclose(c.stats_var, [0.1, 0.2, 0.3, 0.4])

    def test_conv(self):
        c = parse_nnet3_text(FIXTURE)["cnn1.conv"]
        assert c.type == "TimeHeightConvolutionComponent"
        assert c.num_filters_in == 6 and c.num_filters_out == 48
        assert c.height_in == 40 and c.height_out == 40
        assert c.linear_params.shape == (2, 3)
        np.testing.assert_allclose(c.bias_params,
                                   [0.05598261, 0.06961362, 0.07], atol=1e-7)

    def test_denormal_values(self):
        c = parse_nnet3_text(FIXTURE)["tdnnf7.linear"]
        assert c.linear_params.shape == (2, 2)
        assert c.linear_params[0, 0] == np.float32(3.699428e-43)

    def test_output_affine(self):
        c = parse_nnet3_text(FIXTURE)["output.affine"]
        assert c.linear_params.shape == (3, 3)
        assert c.max_change == 1.5


SMALL = """\
input name=input dim=8
idct-layer name=idct input=input dim=8
batchnorm-component name=idct-batchnorm
linear-component name=linear1 dim=12
conv-relu-batchnorm-layer name=cnn1 height-in=4 height-out=4 time-offsets=-1,0,1 height-offsets=0 num-filters-out=6
tdnnf-layer name=tdnnf1 dim=24 bottleneck-dim=8 time-stride=1
prefinal-layer name=prefinal small-dim=8 big-dim=16
output-layer name=output dim=10 include-log-softmax=false
"""


class TestRoundTrip:
    def test_export_import_preserves_forward(self, rng):
        model = build_model_from_string(SMALL)
        params, state = init_params(model, jax.random.PRNGKey(0))
        # make BN stats non-trivial
        feats = jnp.asarray(rng.normal(size=(2, 9, 8)).astype(np.float32))
        _, state = forward(model, params, state, feats, train=True,
                           compute_dtype=jnp.float32)

        text = export_params_to_text(model, params, state)
        assert "<ComponentName> cnn1.conv" in text
        assert "<ComponentName> tdnnf1.linear" in text
        assert "<ComponentName> prefinal.batchnorm2" in text

        params2, state2 = init_params(model, jax.random.PRNGKey(99))
        params2, state2, report = load_weights_from_text(model, params2,
                                                         state2, text)
        assert report  # something loaded
        out1, _ = forward(model, params, state, feats, train=False,
                          compute_dtype=jnp.float32)
        out2, _ = forward(model, params2, state2, feats, train=False,
                          compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out1["output"]),
                                   np.asarray(out2["output"]),
                                   rtol=1e-4, atol=1e-5)

    def test_transpose_convention(self):
        """Kaldi [out, in] must become our [in, out]."""
        model = build_model_from_string(
            "input name=input dim=3\n"
            "linear-component name=lin dim=2\n"
            "output-layer name=output dim=2 include-log-softmax=false")
        params, state = init_params(model, jax.random.PRNGKey(0))
        text = """\
<ComponentName> lin <LinearComponent> <Params>  [
  1 2 3
  4 5 6 ]
<ComponentName> output.affine <NaturalGradientAffineComponent> <LinearParams>  [
  1 0
  0 1 ]
<BiasParams>  [ 0 0 ]
"""
        params, state, _ = load_weights_from_text(model, params, state, text)
        assert params["lin"]["w"].shape == (3, 2)
        np.testing.assert_array_equal(np.asarray(params["lin"]["w"]),
                                      [[1, 4], [2, 5], [3, 6]])
        x = jnp.asarray([[[1.0, 0.0, 0.0]]])
        out, _ = forward(model, params, state, x, train=False,
                         compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out["output"][0, 0]), [1.0, 4.0],
                                   atol=1e-6)

    def test_block_bn_tiling(self):
        """Per-filter BN stats tile across heights in h*nf+f layout."""
        model = build_model_from_string(
            "input name=input dim=6\n"
            "conv-relu-batchnorm-layer name=cnn1 height-in=3 height-out=3 "
            "time-offsets=0 height-offsets=0 num-filters-out=2\n"
            "output-layer name=output dim=2 include-log-softmax=false")
        params, state = init_params(model, jax.random.PRNGKey(0))
        text = """\
<ComponentName> cnn1.conv <TimeHeightConvolutionComponent> <NumFiltersIn> 2 <NumFiltersOut> 2 <HeightIn> 3 <HeightOut> 3 <Offsets> [ 0,0 ]
<LinearParams>  [
  1 0
  0 1 ]
<BiasParams>  [ 0 0 ]
<ComponentName> cnn1.batchnorm <BatchNormComponent> <Dim> 6 <BlockDim> 2 <Epsilon> 0.001 <TargetRms> 1 <Count> 100 <StatsMean>  [ 0.5 -0.5 ]
<StatsVar>  [ 1.0 2.0 ]
"""
        params, state, _ = load_weights_from_text(model, params, state, text)
        mean = np.asarray(state["cnn1"]["mean"])
        # h*nf+f layout: [f0, f1, f0, f1, f0, f1]
        np.testing.assert_array_equal(mean, [0.5, -0.5, 0.5, -0.5, 0.5, -0.5])
        var = np.asarray(state["cnn1"]["var"])
        np.testing.assert_array_equal(var, [1, 2, 1, 2, 1, 2])

    def test_missing_component_raises(self):
        model = build_model_from_string(
            "input name=input dim=4\n"
            "tdnnf-layer name=tdnnf1 dim=4 bottleneck-dim=2 time-stride=1\n"
            "output-layer name=output dim=2 include-log-softmax=false")
        params, state = init_params(model, jax.random.PRNGKey(0))
        with pytest.raises(KeyError):
            load_weights_from_text(model, params, state, "")
