"""Real-Kaldi text fixtures for the model loader.

The component text below is captured `nnet3-copy --binary=false` output
re-derived from the reference's loader tests
(/root/reference/internal/nnet/weight_loader_test.go:11-427) — i.e. real
Kaldi data, not this repo's exporter — so these tests would fail if our
reading of Kaldi's text format (inline vs multi-line matrices, empty
vectors, scalar tags, component-name conventions) were wrong,
independently of our own writer.
"""

import numpy as np
import pytest

from kaldi_fp16_tpu.models.kaldi_loader import parse_nnet3_text

# captured nnet3-copy output (weight_loader_test.go:11-53)
TEST_COMPONENTS = """<ComponentName> idct <FixedAffineComponent> <LinearParams>  [
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
<ComponentName> tdnnf7.affine <TdnnComponent> <MaxChange> 0.75 <L2Regularize> 0.03 <LearningRate> 0.0001 <TimeOffsets> [ 0 ]
<LinearParams>  [
  0.1 0.2 0.3
  0.4 0.5 0.6 ]
<BiasParams>  [ -1.943402e-05 -1.780113e-05 7.44856e-06 ]
<ComponentName> tdnnf7.batchnorm <BatchNormComponent> <Dim> 3 <BlockDim> 3 <Epsilon> 0.001 <TargetRms> 1 <TestMode> F <Count> 68864 <StatsMean>  [ 0.001 0.002 0.003 ]
<StatsVar>  [ 0.1 0.2 0.3 ]
<ComponentName> prefinal-chain.affine <NaturalGradientAffineComponent> <MaxChange> 0.75 <L2Regularize> 0.03 <LearningRate> 0.0001 <LinearParams>  [
  0.01 0.02
  0.03 0.04 ]
<BiasParams>  [ 0.001 0.002 ]
<ComponentName> output.affine <NaturalGradientAffineComponent> <MaxChange> 1.5 <L2Regularize> 0.015 <LearningRate> 0.0001 <LinearParams>  [
  0.1 0.2 0.3
  0.4 0.5 0.6
  0.7 0.8 0.9 ]
<BiasParams>  [ 0.01 0.02 0.03 ]
<ComponentName> noop1 <NoOpComponent> <Dim> 768
<ComponentName> output-xent.log-softmax <LogSoftmaxComponent> <Dim> 3080 <ValueAvg>  [ ]
"""


@pytest.fixture(scope="module")
def comps():
    return parse_nnet3_text(TEST_COMPONENTS)


class TestCapturedComponents:
    """Assertions mirror weight_loader_test.go:54-260 value-for-value."""

    def test_all_names_present(self, comps):
        expected = {
            "idct", "ivector-linear", "ivector-batchnorm",
            "cnn1.conv", "cnn1.relu", "cnn1.batchnorm",
            "tdnnf7.linear", "tdnnf7.affine", "tdnnf7.batchnorm",
            "prefinal-chain.affine", "output.affine",
            "noop1", "output-xent.log-softmax",
        }
        assert expected <= set(comps.keys())

    def test_idct(self, comps):
        c = comps["idct"]
        assert c.type == "FixedAffineComponent"
        assert c.linear_params.shape == (2, 4)
        assert abs(c.linear_params[0, 0] - 0.1581139) < 1e-5
        assert abs(c.linear_params[1, 0] - 0.1581139) < 1e-5
        assert len(c.bias_params) == 4

    def test_linear_component(self, comps):
        c = comps["ivector-linear"]
        assert c.type == "LinearComponent"
        assert c.linear_params.shape == (2, 3)
        assert c.learning_rate == pytest.approx(0.0001)
        assert c.l2_regularize == pytest.approx(0.03)
        assert c.max_change == pytest.approx(0.75)

    def test_batchnorm(self, comps):
        c = comps["ivector-batchnorm"]
        assert c.type == "BatchNormComponent"
        assert c.epsilon == pytest.approx(0.001)
        assert c.target_rms == pytest.approx(0.025)
        assert c.count == pytest.approx(176000)
        assert len(c.stats_mean) == 4 and len(c.stats_var) == 4
        assert c.stats_mean[0] == pytest.approx(-0.005183299, abs=1e-6)
        assert c.stats_var[0] == pytest.approx(0.1, abs=1e-6)

    def test_conv(self, comps):
        c = comps["cnn1.conv"]
        assert c.type == "TimeHeightConvolutionComponent"
        assert c.num_filters_in == 6 and c.num_filters_out == 48
        assert c.height_in == 40 and c.height_out == 40
        assert c.linear_params.shape == (2, 3)
        assert len(c.bias_params) == 3
        assert c.bias_params[0] == pytest.approx(0.05598261, abs=1e-6)

    def test_tdnn_empty_bias(self, comps):
        c = comps["tdnnf7.linear"]
        assert c.type == "TdnnComponent"
        assert c.linear_params.shape == (2, 2)
        # empty "[ ]" bias must parse as empty/None, not crash
        assert c.bias_params is None or len(c.bias_params) == 0
        # denormal-range SVD init values survive
        assert c.linear_params[0, 0] == pytest.approx(3.699428e-43,
                                                      abs=1e-45)

    def test_tdnn_with_bias(self, comps):
        c = comps["tdnnf7.affine"]
        assert c.linear_params.shape == (2, 3)
        assert len(c.bias_params) == 3
        assert c.bias_params[0] == pytest.approx(-1.943402e-05, abs=1e-8)

    def test_ng_affine(self, comps):
        c = comps["prefinal-chain.affine"]
        assert c.type == "NaturalGradientAffineComponent"
        assert c.linear_params.shape == (2, 2)
        assert len(c.bias_params) == 2

    def test_output_affine(self, comps):
        c = comps["output.affine"]
        assert c.linear_params.shape == (3, 3)
        assert c.linear_params[2, 2] == pytest.approx(0.9, abs=1e-6)
        assert c.max_change == pytest.approx(1.5)

    def test_noop_has_no_params(self, comps):
        c = comps["noop1"]
        assert c.type == "NoOpComponent"
        assert c.linear_params is None

    def test_logsoftmax_empty_valueavg(self, comps):
        assert comps["output-xent.log-softmax"].type == "LogSoftmaxComponent"


class TestSingleLineFixtures:
    def test_real_batchnorm_line(self):
        """weight_loader_test.go:253-283 — scalars and inline vector on
        the ComponentName line itself."""
        text = ("<ComponentName> prefinal-chain.batchnorm2 "
                "<BatchNormComponent> <Dim> 192 <BlockDim> 192 "
                "<Epsilon> 0.001 <TargetRms> 1 <TestMode> F <Count> 41344 "
                "<StatsMean>  [ 4.844032e-10 -4.039575e-09 -7.640916e-11 ]\n"
                "<StatsVar>  [ 0.001 0.002 0.003 ]")
        c = parse_nnet3_text(text)["prefinal-chain.batchnorm2"]
        assert c.epsilon == pytest.approx(0.001)
        assert c.target_rms == pytest.approx(1.0)
        assert c.count == pytest.approx(41344)
        assert len(c.stats_mean) == 3
        assert c.stats_mean[0] == pytest.approx(4.844032e-10, abs=1e-15)

    def test_inline_vector(self):
        text = ("<ComponentName> test <BatchNormComponent> <Dim> 3 "
                "<Epsilon> 0.001 <TargetRms> 1 <Count> 100 "
                "<StatsMean>  [ 0.1 0.2 0.3 ]\n"
                "<StatsVar>  [ 0.4 0.5 0.6 ]")
        c = parse_nnet3_text(text)["test"]
        assert list(np.round(c.stats_mean, 6)) == [0.1, 0.2, 0.3]
        assert c.stats_var[2] == pytest.approx(0.6)


class TestRealComponentInventory:
    """The real final.mdl component-name inventory
    (weight_loader_test.go:386-427): cnn1-6 / tdnnf7-21 / prefinal-* /
    output — our loader's name->layer mapping must cover all of them."""

    def test_flagship_xconfig_covers_inventory(self):
        from kaldi_fp16_tpu.models.model import build_model
        model = build_model("configs/cnn_tdnn.xconfig")
        names = {l.name for l in model.layers}
        for i in range(1, 7):
            assert f"cnn{i}" in names
        for i in range(7, 22):
            assert f"tdnnf{i}" in names
        assert "prefinal-chain" in names and "prefinal-xent" in names
        assert "output" in names and "output-xent" in names


class TestBatchNormDerivation:
    """Value-level check of the eval-mode BN transform computed from the
    captured running stats.

    Kaldi's BatchNormComponent WRITES StatsVar already centered
    (nnet-normalize-component.cc Write(): var = sumsq/count - mean^2), so
    the eval transform is  target_rms * (x - mean) / sqrt(var + eps)
    using StatsVar directly.  (The reference's Go derivation at
    weight_loader_test.go:284-300 subtracts mean^2 a SECOND time — a
    deviation from Kaldi that is negligible for its near-zero means but
    wrong in general; we follow Kaldi.)"""

    def test_eval_transform_from_captured_stats(self):
        import jax.numpy as jnp
        from kaldi_fp16_tpu.models.network import _batchnorm
        c = parse_nnet3_text(TEST_COMPONENTS)["ivector-batchnorm"]
        x = np.linspace(-1, 1, 8).reshape(1, 2, 4).astype(np.float32)
        state = {"count": jnp.asarray(c.count, jnp.float32),
                 "mean": jnp.asarray(c.stats_mean, jnp.float32),
                 "var": jnp.asarray(c.stats_var, jnp.float32)}
        out, _ = _batchnorm(jnp.asarray(x), state, c.target_rms,
                            c.epsilon, train=False)
        exp = (c.target_rms * (x - c.stats_mean)
               / np.sqrt(c.stats_var + c.epsilon))
        np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-5)

    def test_loader_bn_state_uses_stats_directly(self):
        from kaldi_fp16_tpu.models.kaldi_loader import _bn_state_from
        c = parse_nnet3_text(TEST_COMPONENTS)["ivector-batchnorm"]
        st = _bn_state_from(c, 4)
        np.testing.assert_allclose(np.asarray(st["mean"]), c.stats_mean,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(st["var"]), c.stats_var,
                                   rtol=1e-6)
        assert float(st["count"]) == pytest.approx(176000)
