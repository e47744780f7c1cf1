"""Kaldi binary nnet3 model files: primitive round-trips, full-model
round-trips, and equivalence with the text import path.

The reference can only import models through a live Kaldi install
(nnet3-copy subprocess, weight_loader.go:605-613); io/nnet3_binary.py
handles the binary container standalone, validated here by byte-level
round-trips and text-path cross-checks."""

import numpy as np
import pytest

from kaldi_fp16_tpu.io.kaldi_io import BinaryReader, BinaryWriter
from kaldi_fp16_tpu.io.nnet3_binary import (
    BinaryComponent, Nnet3Model, components_from_text, read_component,
    read_nnet3, to_kaldi_components, write_component, write_nnet3,
)


class TestPushback:
    def test_multi_byte_unread(self):
        r = BinaryReader(b"abcdef")
        got = [r.read_byte() for _ in range(3)]
        for b in reversed(got):
            r.unread_byte(b)
        assert r.read_bytes(6) == b"abcdef"


def roundtrip_component(comp: BinaryComponent) -> BinaryComponent:
    w = BinaryWriter()
    write_component(w, comp)
    return read_component(BinaryReader(w.getvalue()))


class TestComponentRoundtrip:
    def test_scalars_ints_bools(self):
        c = BinaryComponent(type="LinearComponent")
        c.set_int("<Dim>", 512)
        c.set_float("<LearningRate>", 0.00125)
        c.set_bool("<IsGradient>", True)
        r = roundtrip_component(c)
        assert r.type == "LinearComponent"
        assert r.ints["<Dim>"] == 512
        assert abs(r.scalars["<LearningRate>"] - 0.00125) < 1e-9
        assert r.bools["<IsGradient>"] is True

    def test_matrix_vector(self):
        rng = np.random.default_rng(0)
        c = BinaryComponent(type="NaturalGradientAffineComponent")
        c.set_matrix("<LinearParams>", rng.normal(
            size=(7, 5)).astype(np.float32))
        c.set_vector("<BiasParams>", rng.normal(size=7).astype(np.float32))
        r = roundtrip_component(c)
        np.testing.assert_array_equal(r.matrices["<LinearParams>"],
                                      c.matrices["<LinearParams>"])
        np.testing.assert_array_equal(r.vectors["<BiasParams>"],
                                      c.vectors["<BiasParams>"])

    def test_negative_exponent_scalar_not_mistaken_for_int(self):
        c = BinaryComponent(type="BatchNormComponent")
        c.set_float("<Epsilon>", 1e-3)
        c.set_float("<TargetRms>", 0.025)
        r = roundtrip_component(c)
        assert abs(r.scalars["<Epsilon>"] - 1e-3) < 1e-9
        assert abs(r.scalars["<TargetRms>"] - 0.025) < 1e-7

    def test_views_are_read_only(self):
        c = BinaryComponent(type="LinearComponent")
        c.set_int("<Dim>", 4)
        with pytest.raises(TypeError):
            c.ints["<Dim>"] = 8
        with pytest.raises(TypeError):
            c.scalars["<LearningRate>"] = 0.1
        assert c.ints["<Dim>"] == 4

    def test_unknown_flag_tag_preserved(self):
        c = BinaryComponent(type="NoOpComponent")
        c.set_flag("<SomeFlag>")
        r = roundtrip_component(c)
        assert r.flags == ("<SomeFlag>",)

    def test_integer_vector_tags(self):
        """Kaldi WriteIntegerVector payloads (sized count + raw int32
        block), incl. negative offsets that are not plausible floats."""
        c = BinaryComponent(type="TimeHeightConvolutionComponent")
        c.set_intvec("<RequiredTimeOffsets>", np.array([-1, 0, 1], np.int32))
        c.set_intvec("<TimeOffsets>", np.array([-3, 0, 3], np.int32))
        r = roundtrip_component(c)
        np.testing.assert_array_equal(r.int_vectors["<RequiredTimeOffsets>"],
                                      [-1, 0, 1])
        np.testing.assert_array_equal(r.int_vectors["<TimeOffsets>"],
                                      [-3, 0, 3])

    def test_source_order_preserved_byte_stable(self):
        """Kaldi component readers are ExpectToken-sequenced: write must
        replay items in READ order, byte-identically."""
        rng = np.random.default_rng(3)
        c = BinaryComponent(type="NaturalGradientAffineComponent")
        c.set_float("<LearningRate>", 0.001)
        c.set_matrix("<LinearParams>", rng.normal(size=(4, 3))
                     .astype(np.float32))
        c.set_vector("<BiasParams>", rng.normal(size=4).astype(np.float32))
        c.set_int("<RankIn>", 20)
        c.set_float("<NumSamplesHistory>", 2000.0)
        c.set_bool("<IsGradient>", False)
        w = BinaryWriter()
        write_component(w, c)
        data = w.getvalue()
        r = read_component(BinaryReader(data))
        assert [t for t, _, _ in r.items] == [t for t, _, _ in c.items]
        w2 = BinaryWriter()
        write_component(w2, r)
        assert w2.getvalue() == data
        # NumSamplesHistory is a float in Kaldi, not an int
        assert abs(r.scalars["<NumSamplesHistory>"] - 2000.0) < 1e-3

    def test_untagged_payload_roundtrip(self):
        """A payload with no preceding tag must re-write as a bare
        payload, not as a bogus token."""
        w = BinaryWriter()
        w.write_token("<SumBlockComponent>")
        w.write_token("FV")
        w.write_byte(4)
        import struct
        w.write_bytes(struct.pack("<i", 2))
        w.write_bytes(np.array([1.5, -2.5], np.float32).tobytes())
        w.write_token("</SumBlockComponent>")
        data = w.getvalue()
        r = read_component(BinaryReader(data))
        assert r.items[0][0] is None and r.items[0][1] == "vector"
        w2 = BinaryWriter()
        write_component(w2, r)
        assert w2.getvalue() == data

    def test_unknown_int_tag_heuristic(self):
        """An unknown tag whose 4 bytes are not a plausible float decodes
        as int (e.g. a small count), not denormal-float garbage."""
        import struct
        w = BinaryWriter()
        w.write_token("<FooComponent>")
        w.write_token("<LeftContext>")
        w.write_byte(4)
        w.write_bytes(struct.pack("<i", 100))
        w.write_token("</FooComponent>")
        r = read_component(BinaryReader(w.getvalue()))
        assert r.ints["<LeftContext>"] == 100


def small_model() -> Nnet3Model:
    rng = np.random.default_rng(1)
    lin = BinaryComponent(name="lin1", type="LinearComponent")
    lin.set_matrix("<Params>", rng.normal(size=(8, 16)).astype(np.float32))
    lin.set_float("<LearningRate>", 0.001)
    bn = BinaryComponent(name="bn1", type="BatchNormComponent")
    bn.set_int("<Dim>", 8)
    bn.set_float("<Epsilon>", 1e-3)
    bn.set_float("<TargetRms>", 1.0)
    bn.set_float("<Count>", 100.0)
    bn.set_vector("<StatsMean>", rng.normal(size=8).astype(np.float32))
    bn.set_vector("<StatsVar>", rng.uniform(0.5, 2, 8).astype(np.float32))
    cfg = [
        "input-node name=input dim=16",
        "component-node name=lin1 component=lin1 input=input",
        "component-node name=bn1 component=bn1 input=lin1",
        "output-node name=output input=bn1 objective=linear",
    ]
    return Nnet3Model(config_lines=cfg, components=[lin, bn])


class TestFileRoundtrip:
    def test_raw_model(self, tmp_path):
        m = small_model()
        data = write_nnet3(m, str(tmp_path / "m.raw"))
        m2 = read_nnet3(str(tmp_path / "m.raw"))
        assert m2.config_lines == m.config_lines
        assert m2.transition_model is None
        assert [c.name for c in m2.components] == ["lin1", "bn1"]
        np.testing.assert_array_equal(
            m2.component("lin1").matrices["<Params>"],
            m.component("lin1").matrices["<Params>"])
        # byte-stable second write
        assert write_nnet3(m2) == data

    def test_mdl_with_opaque_transition_model(self):
        m = small_model()
        # synthetic TransitionModel blob with binary payloads inside
        tm = (b"<TransitionModel> <Topology> " + bytes(range(1, 40))
              + b" </Topology> <Tuples> junk </Tuples> "
              + b"</TransitionModel> ")
        m.transition_model = tm
        data = write_nnet3(m)
        m2 = read_nnet3(data)
        assert m2.transition_model == tm
        assert write_nnet3(m2) == data

    def test_rejects_text_file(self):
        with pytest.raises(ValueError, match="binary"):
            read_nnet3(b"<Nnet3> not binary")


class TestTextPathEquivalence:
    """text export -> parse -> binary write -> binary read -> load must
    give the SAME network params as the text path."""

    XCONFIG = """\
input name=input dim=16
linear-component name=lin1 dim=32
batchnorm-component name=bn1
tdnnf-layer name=tdnnf1 dim=32 bottleneck-dim=16 time-stride=1 bypass-scale=0.66
prefinal-layer name=prefinal small-dim=16 big-dim=32
output-layer name=output dim=8 include-log-softmax=false
"""

    def test_binary_path_matches_text_path(self):
        import jax
        from kaldi_fp16_tpu.models.model import build_model_from_string
        from kaldi_fp16_tpu.models.network import init_params
        from kaldi_fp16_tpu.models.kaldi_loader import (
            export_params_to_text, parse_nnet3_text,
            load_params_from_components,
        )

        model = build_model_from_string(self.XCONFIG)
        params, state = init_params(model, jax.random.PRNGKey(0))
        text = export_params_to_text(model, params, state)
        comps_text = parse_nnet3_text(text)

        # text -> binary -> parse back
        bin_model = Nnet3Model(config_lines=[],
                               components=components_from_text(comps_text))
        comps_bin = to_kaldi_components(read_nnet3(write_nnet3(bin_model)))

        p1, s1 = init_params(model, jax.random.PRNGKey(1))
        p2, s2 = init_params(model, jax.random.PRNGKey(2))
        p1, s1, rep1 = load_params_from_components(model, p1, s1, comps_text)
        p2, s2, rep2 = load_params_from_components(model, p2, s2, comps_bin)
        assert rep1 == rep2
        for lname in p1:
            for pname in p1[lname]:
                np.testing.assert_array_equal(
                    np.asarray(p1[lname][pname]), np.asarray(p2[lname][pname]),
                    err_msg=f"{lname}/{pname}")
        for lname in s1:
            leaves1 = jax.tree_util.tree_leaves(s1[lname])
            leaves2 = jax.tree_util.tree_leaves(s2[lname])
            for a, b in zip(leaves1, leaves2):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-6, err_msg=lname)


class TestModeltoolsCLI:
    def test_copy_info_compare(self, tmp_path):
        """tools/modeltools.py: text -> binary -> text with zero diff."""
        import os
        import subprocess
        import sys
        import jax
        from kaldi_fp16_tpu.models.model import build_model_from_string
        from kaldi_fp16_tpu.models.network import init_params
        from kaldi_fp16_tpu.models.kaldi_loader import export_params_to_text

        model = build_model_from_string(
            "input name=input dim=8\n"
            "linear-component name=lin1 dim=16\n"
            "output-layer name=output dim=4 include-log-softmax=false\n")
        params, state = init_params(model, jax.random.PRNGKey(0))
        t0 = tmp_path / "m.txt"
        t0.write_text(export_params_to_text(model, params, state))
        raw = tmp_path / "m.raw"
        t1 = tmp_path / "m2.txt"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        tool = os.path.join(root, "tools", "modeltools.py")

        def run(*a):
            return subprocess.run([sys.executable, tool, *a], env=env,
                                  capture_output=True, text=True, cwd=root)

        assert run("copy", str(t0), str(raw), "--binary").returncode == 0
        info = run("info", str(raw))
        assert info.returncode == 0 and "binary container" in info.stdout
        assert run("copy", str(raw), str(t1), "--text").returncode == 0
        cmp_ = run("compare", str(t0), str(t1))
        assert cmp_.returncode == 0, cmp_.stdout
        assert "worst |diff| = 0.000e+00" in cmp_.stdout


class TestCanonicalTokenSequences:
    """components_from_text must emit each component family's tags in
    Kaldi's ExpectToken Write() order (zero-valued required tags
    included) so order-strict real-Kaldi readers can consume the
    output.  With offset lists present (the text bridge carries them
    since r4) conv/tdnn emit the COMPLETE grammar incl. the
    ConvolutionModel block and natural-gradient tails; without them the
    components stay PARTIAL (readable by this repo only), as documented
    in the emitter.  tests/test_foreign_bytes.py pins the same grammar
    against hand-built byte streams."""

    @staticmethod
    def _tags(kc):
        [bc] = components_from_text({kc.name: kc})
        return [t for t, _, _ in bc.items]

    def _kc(self, **kw):
        from kaldi_fp16_tpu.models.kaldi_loader import KaldiComponent
        return KaldiComponent(**kw)

    def test_ng_affine_sequence(self):
        kc = self._kc(name="a", type="NaturalGradientAffineComponent",
                      linear_params=np.ones((3, 4), np.float32),
                      bias_params=np.zeros(3, np.float32),
                      learning_rate=0.0)   # zero LR must STILL be emitted
        assert self._tags(kc) == [
            "<LearningRate>", "<LinearParams>", "<BiasParams>",
            "<RankIn>", "<RankOut>", "<UpdatePeriod>",
            "<NumSamplesHistory>", "<Alpha>"]

    def test_affine_prologue_optionals(self):
        kc = self._kc(name="a", type="AffineComponent",
                      linear_params=np.ones((2, 2), np.float32),
                      max_change=0.75, l2_regularize=0.004,
                      learning_rate=1e-3)
        assert self._tags(kc) == [
            "<MaxChange>", "<L2Regularize>", "<LearningRate>",
            "<LinearParams>", "<BiasParams>"]

    def test_linear_sequence(self):
        kc = self._kc(name="l", type="LinearComponent",
                      linear_params=np.ones((2, 3), np.float32))
        assert self._tags(kc) == [
            "<LearningRate>", "<Params>",
            "<OrthonormalConstraint>", "<UseNaturalGradient>"]

    def test_batchnorm_sequence(self):
        kc = self._kc(name="bn", type="BatchNormComponent",
                      stats_mean=np.zeros(4, np.float32),
                      stats_var=np.ones(4, np.float32),
                      epsilon=1e-3, target_rms=1.0, count=0.0)
        assert self._tags(kc) == [
            "<Dim>", "<BlockDim>", "<Epsilon>", "<TargetRms>",
            "<TestMode>", "<Count>", "<StatsMean>", "<StatsVar>"]

    def test_conv_sequence(self):
        kc = self._kc(name="c", type="TimeHeightConvolutionComponent",
                      linear_params=np.ones((8, 6), np.float32),
                      num_filters_in=2, num_filters_out=8,
                      height_in=0, height_out=0)   # zeros still emitted
        assert self._tags(kc) == [
            "<LearningRate>", "<NumFiltersIn>", "<NumFiltersOut>",
            "<HeightIn>", "<HeightOut>", "<LinearParams>", "<BiasParams>"]

    def test_conv_sequence_with_offsets(self):
        # offsets present -> the COMPLETE TimeHeightConvolutionComponent
        # Write() grammar: <Model> + ConvolutionModel block (pair-vector
        # <Offsets>), params, and the natural-gradient tail with the
        # two-payload <AlphaInOut>/<RankInOut> tags (the second value of
        # each rides an untagged item)
        kc = self._kc(name="c", type="TimeHeightConvolutionComponent",
                      linear_params=np.ones((8, 6), np.float32),
                      num_filters_in=2, num_filters_out=8,
                      height_in=3, height_out=3,
                      offsets=[(-1, 0), (-1, 1), (0, 0), (0, 1)])
        [bc] = components_from_text({kc.name: kc})
        assert [t for t, _, _ in bc.items] == [
            "<LearningRate>", "<Model>", "<ConvolutionModel>",
            "<NumFiltersIn>", "<NumFiltersOut>",
            "<HeightIn>", "<HeightOut>", "<HeightSubsampleOut>",
            "<Offsets>", "<RequiredTimeOffsets>", "</ConvolutionModel>",
            "<LinearParams>", "<BiasParams>", "<MaxMemoryMb>",
            "<UseNaturalGradient>", "<NumMinibatchesHistory>",
            "<AlphaInOut>", None, "<RankInOut>", None]
        assert bc.int_vectors["<Offsets>"].tolist() == [-1, 0, -1, 1, 0, 0, 0, 1]
        assert dict(
            (t, k) for t, k, _ in bc.items)["<Offsets>"] == "intpairvec"
        assert bc.int_vectors["<RequiredTimeOffsets>"].tolist() == [-1, 0]
        assert bc.ints["<HeightSubsampleOut>"] == 1

    def test_tdnn_sequence(self):
        kc = self._kc(name="t", type="TdnnComponent",
                      linear_params=np.ones((4, 8), np.float32),
                      bias_params=np.zeros(4, np.float32))
        assert self._tags(kc) == [
            "<LearningRate>", "<LinearParams>", "<BiasParams>",
            "<OrthonormalConstraint>", "<UseNaturalGradient>"]

    def test_tdnn_sequence_with_offsets(self):
        kc = self._kc(name="t", type="TdnnComponent",
                      linear_params=np.ones((4, 8), np.float32),
                      bias_params=np.zeros(4, np.float32),
                      time_offsets=[-3, 0])
        [bc] = components_from_text({kc.name: kc})
        assert [t for t, _, _ in bc.items] == [
            "<LearningRate>", "<TimeOffsets>", "<LinearParams>",
            "<BiasParams>", "<OrthonormalConstraint>",
            "<UseNaturalGradient>", "<NumSamplesHistory>",
            "<AlphaInOut>", None, "<RankInOut>", None]
        assert bc.int_vectors["<TimeOffsets>"].tolist() == [-3, 0]

    def test_tdnn_no_bias_sequence(self):
        kc = self._kc(name="t", type="TdnnComponent",
                      linear_params=np.ones((4, 8), np.float32))
        assert self._tags(kc) == [
            "<LearningRate>", "<LinearParams>",
            "<OrthonormalConstraint>", "<UseNaturalGradient>"]

    def test_attention_sequence(self):
        kc = self._kc(name="at", type="RestrictedAttentionComponent",
                      num_heads=4, key_dim=16, value_dim=16,
                      key_scale=0.25)
        assert self._tags(kc) == [
            "<NumHeads>", "<KeyDim>", "<ValueDim>", "<KeyScale>",
            "<Count>"]

    def test_unknown_type_stable_order(self):
        kc = self._kc(name="u", type="SomeFutureComponent",
                      linear_params=np.ones((2, 2), np.float32),
                      count=0.0)
        tags = self._tags(kc)
        # declared-map order, learning_rate/count kept even at zero
        assert tags == ["<LearningRate>", "<Count>", "<LinearParams>"]


class TestLegacyOffsetsFraming:
    """Pre-pair-vector exports of this repo framed <Offsets> as
    WriteIntegerVector (count = number of INTS); the reader sniffs that
    framing and still parses those models (same data bytes, only the
    count differs — the bytes after the payload begin an ASCII tag in
    the legacy framing and raw int pairs in the Kaldi framing)."""

    def _conv(self):
        import struct
        c = BinaryComponent(type="TimeHeightConvolutionComponent")
        c.set_intpairvec("<Offsets>", np.array(
            [-1, 0, -1, 1, 0, 0, 0, 1, 1, 0, 1, 1], np.int32))  # 6 pairs
        c.set_intvec("<RequiredTimeOffsets>", np.array([0], np.int32))
        c.set_matrix("<LinearParams>", np.ones((4, 6), np.float32))
        w = BinaryWriter()
        write_component(w, c)
        return c, w.getvalue(), struct

    def test_modern_framing_roundtrips(self):
        c, raw, _ = self._conv()
        r = read_component(BinaryReader(raw))
        np.testing.assert_array_equal(r.int_vectors["<Offsets>"],
                                      c.int_vectors["<Offsets>"])

    def test_legacy_intvec_framing_parses(self):
        c, raw, struct = self._conv()
        # patch the pair count (6) to the legacy int count (12); the
        # data bytes are identical between the two framings
        needle = b"<Offsets> \x04" + struct.pack("<i", 6)
        assert raw.count(needle) == 1
        legacy = raw.replace(needle,
                             b"<Offsets> \x04" + struct.pack("<i", 12))
        r = read_component(BinaryReader(legacy))
        np.testing.assert_array_equal(r.int_vectors["<Offsets>"],
                                      c.int_vectors["<Offsets>"])
        np.testing.assert_array_equal(
            r.int_vectors["<RequiredTimeOffsets>"], [0])
        assert r.matrices["<LinearParams>"].shape == (4, 6)


class TestComponentFuzz:
    """Randomized write->read round-trips across mixed item sequences:
    the tag-driven reader must reproduce every (tag, kind, value) item
    in source order for arbitrary (valid) component payloads — the
    class of framing bug the fixed cases can't enumerate."""

    KNOWN_INT = ["<Dim>", "<BlockDim>", "<RankIn>", "<RankOut>",
                 "<UpdatePeriod>", "<InputDim>", "<OutputDim>"]
    KNOWN_FLOAT = ["<LearningRate>", "<Epsilon>", "<TargetRms>",
                   "<Count>", "<Alpha>", "<NumSamplesHistory>",
                   "<MaxChange>", "<L2Regularize>"]
    KNOWN_BOOL = ["<IsGradient>", "<TestMode>", "<UseNaturalGradient>"]
    KNOWN_INTVEC = ["<TimeOffsets>", "<RequiredTimeOffsets>", "<Context>"]

    @pytest.mark.parametrize("seed", [5, 17, 29])
    def test_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        c = BinaryComponent(type="FuzzComponent")
        used = set()
        for i in range(int(rng.integers(4, 16))):
            kind = rng.choice(["int", "float", "vector", "matrix",
                               "intvec", "bool", "pairvec"])
            if kind == "int":
                tag = str(rng.choice(self.KNOWN_INT))
                if tag in used:
                    continue
                c.set_int(tag, int(rng.integers(-1000, 100000)))
            elif kind == "float":
                tag = str(rng.choice(self.KNOWN_FLOAT))
                if tag in used:
                    continue
                # cover negative exponents, zeros, big values
                v = float(rng.choice([0.0, 1e-8, -2.5e-4, 3.25,
                                      65536.0, -1.0]))
                c.set_float(tag, v)
            elif kind == "bool":
                tag = str(rng.choice(self.KNOWN_BOOL))
                if tag in used:
                    continue
                c.set_bool(tag, bool(rng.integers(0, 2)))
            elif kind == "vector":
                tag = f"<FuzzVec{i}>"
                c.set_vector(tag, rng.normal(
                    size=int(rng.integers(0, 40))).astype(np.float32))
            elif kind == "matrix":
                tag = f"<FuzzMat{i}>"
                c.set_matrix(tag, rng.normal(size=(
                    int(rng.integers(1, 12)),
                    int(rng.integers(1, 12)))).astype(np.float32))
            elif kind == "intvec":
                tag = str(rng.choice(self.KNOWN_INTVEC))
                if tag in used:
                    continue
                c.set_intvec(tag, rng.integers(
                    -99, 99, size=int(rng.integers(0, 12))
                ).astype(np.int32))
            else:
                tag = "<Offsets>"
                if tag in used:
                    continue
                n = int(rng.integers(1, 9))
                c.set_intpairvec(tag, rng.integers(
                    -9, 9, size=2 * n).astype(np.int32))
            used.add(tag)
        r = roundtrip_component(c)
        assert r.type == c.type
        assert len(r.items) == len(c.items)
        for (ta, ka, va), (tb, kb, vb) in zip(c.items, r.items):
            assert (ta, ka) == (tb, kb), (ta, ka, tb, kb)
            if ka in ("vector", "matrix", "intvec", "intpairvec"):
                np.testing.assert_array_equal(va, vb)
            elif ka == "float":
                assert abs(va - vb) <= 1e-6 * max(1.0, abs(va))
            else:
                assert va == vb
