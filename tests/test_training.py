"""Training stack tests: SGD math, max-change clipping, loss scaling, and the
end-to-end chain training loop (loss must decrease over 10 steps — the
reference traintest assertion, cmd/traintest/main.go:34-162)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.chain.graph import (
    DenominatorGraph, build_numerator_batch, make_simple_den_fst,
)
from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
from kaldi_fp16_tpu.chain.objective import ChainTrainingOpts
from kaldi_fp16_tpu.io.sparse import fst_to_csr
from kaldi_fp16_tpu.models.model import build_model_from_string
from kaldi_fp16_tpu.training.optimizer import SGDConfig, init_sgd_state, sgd_update
from kaldi_fp16_tpu.training.loss_scale import (
    init_loss_scale, update_loss_scale, grads_finite,
)
from kaldi_fp16_tpu.training.train_step import (
    TrainConfig, init_train_state, make_train_step,
)
from tests.test_chain_numerator import random_fst


class TestSGD:
    def _simple(self):
        params = {"l": {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}}
        grads = {"l": {"w": jnp.full((2, 2), 0.1), "b": jnp.full(2, 0.2)}}
        return params, grads

    def test_plain_sgd(self):
        params, grads = self._simple()
        st = init_sgd_state(params)
        cfg = SGDConfig(learning_rate=0.1, momentum=0.0,
                        max_param_change=1e9, default_max_change=1e9)
        new_params, new_st, _ = sgd_update(params, grads, st, cfg)
        np.testing.assert_allclose(np.asarray(new_params["l"]["w"]),
                                   1.0 - 0.1 * 0.1, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(new_params["l"]["b"]),
                                   -0.1 * 0.2, rtol=1e-6)
        assert int(new_st["step"]) == 1

    def test_momentum(self):
        """v = mu*v + g; w -= lr*v  (ref: optimize.go:1-9)."""
        params, grads = self._simple()
        st = init_sgd_state(params)
        cfg = SGDConfig(learning_rate=0.1, momentum=0.9,
                        max_param_change=1e9, default_max_change=1e9)
        p1, st1, _ = sgd_update(params, grads, st, cfg)
        p2, st2, _ = sgd_update(p1, grads, st1, cfg)
        # after 2 steps: v1 = g, v2 = 0.9 g + g = 1.9 g
        # w = 1 - lr*g - lr*1.9g = 1 - 0.1*0.1*(1+1.9)
        np.testing.assert_allclose(np.asarray(p2["l"]["w"]),
                                   1.0 - 0.01 * 2.9, rtol=1e-5)

    def test_global_max_change_clips(self):
        params = {"l": {"w": jnp.zeros((10, 10))}}
        grads = {"l": {"w": jnp.full((10, 10), 100.0)}}
        st = init_sgd_state(params)
        cfg = SGDConfig(learning_rate=1.0, momentum=0.0,
                        max_param_change=0.5, default_max_change=1e9)
        new_params, _, stats = sgd_update(params, grads, st, cfg)
        norm = float(jnp.sqrt(jnp.sum(new_params["l"]["w"] ** 2)))
        assert abs(norm - 0.5) < 1e-4
        assert float(stats["global_clip_scale"]) < 1.0

    def test_per_component_max_change(self):
        params = {"a": {"w": jnp.zeros(4)}, "b": {"w": jnp.zeros(4)}}
        grads = {"a": {"w": jnp.full(4, 100.0)}, "b": {"w": jnp.full(4, 1e-4)}}
        st = init_sgd_state(params)
        cfg = SGDConfig(learning_rate=1.0, max_param_change=1e9,
                        default_max_change=0.25)
        hyper = {"a": {"lr_factor": 1.0, "max_change": 0.25},
                 "b": {"lr_factor": 1.0, "max_change": 0.25}}
        new_params, _, _ = sgd_update(params, grads, st, cfg, hyper=hyper)
        a_norm = float(jnp.linalg.norm(new_params["a"]["w"]))
        b_norm = float(jnp.linalg.norm(new_params["b"]["w"]))
        assert abs(a_norm - 0.25) < 1e-5   # clipped
        assert b_norm < 1e-3               # not clipped

    def test_lr_factor(self):
        params = {"a": {"w": jnp.zeros(2)}, "b": {"w": jnp.zeros(2)}}
        grads = {"a": {"w": jnp.ones(2)}, "b": {"w": jnp.ones(2)}}
        st = init_sgd_state(params)
        cfg = SGDConfig(learning_rate=0.1, max_param_change=1e9,
                        default_max_change=1e9)
        hyper = {"a": {"lr_factor": 0.5, "max_change": 0.0},
                 "b": {"lr_factor": 1.0, "max_change": 0.0}}
        new_params, _, _ = sgd_update(params, grads, st, cfg, hyper=hyper)
        np.testing.assert_allclose(np.asarray(new_params["a"]["w"]), -0.05,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_params["b"]["w"]), -0.1,
                                   rtol=1e-5)

    def test_skip_freezes_everything(self):
        params, grads = self._simple()
        st = init_sgd_state(params)
        cfg = SGDConfig(learning_rate=0.1)
        new_params, new_st, _ = sgd_update(params, grads, st, cfg,
                                           skip=jnp.asarray(True))
        np.testing.assert_array_equal(np.asarray(new_params["l"]["w"]),
                                      np.asarray(params["l"]["w"]))
        np.testing.assert_array_equal(np.asarray(new_st["velocity"]["l"]["w"]),
                                      0.0)
        assert int(new_st["step"]) == 0

    def test_skip_with_nonfinite_grads_leaves_params_exact(self):
        """Regression: 0 * inf = NaN — a multiplicative skip gate poisoned
        the weights when the overflowed grads were inf (found by sgdtest)."""
        params, _ = self._simple()
        grads = jax.tree_util.tree_map(
            lambda w: jnp.full_like(w, jnp.inf), params)
        st = init_sgd_state(params)
        cfg = SGDConfig(learning_rate=0.1)
        new_params, new_st, _ = sgd_update(params, grads, st, cfg,
                                           skip=jnp.asarray(True))
        np.testing.assert_array_equal(np.asarray(new_params["l"]["w"]),
                                      np.asarray(params["l"]["w"]))
        assert np.isfinite(np.asarray(new_params["l"]["w"])).all()

    def test_trainable_mask(self):
        params = {"idct": {"m": jnp.ones(3)}, "l": {"w": jnp.ones(3)}}
        grads = {"idct": {"m": jnp.ones(3)}, "l": {"w": jnp.ones(3)}}
        st = init_sgd_state(params)
        cfg = SGDConfig(learning_rate=0.1, max_param_change=1e9,
                        default_max_change=1e9)
        mask = {"idct": {"m": False}, "l": {"w": True}}
        new_params, _, _ = sgd_update(params, grads, st, cfg, trainable=mask)
        np.testing.assert_array_equal(np.asarray(new_params["idct"]["m"]), 1.0)
        assert float(new_params["l"]["w"][0]) < 1.0


class TestLossScale:
    def test_growth(self):
        st = init_loss_scale(initial=2.0, growth_interval=2)
        st, skip = update_loss_scale(st, jnp.asarray(True))
        assert not bool(skip) and float(st.scale) == 2.0
        st, _ = update_loss_scale(st, jnp.asarray(True))
        assert float(st.scale) == 4.0       # grew after 2 good steps
        assert int(st.good_steps) == 0

    def test_backoff(self):
        st = init_loss_scale(initial=1024.0)
        st, skip = update_loss_scale(st, jnp.asarray(False))
        assert bool(skip)
        assert float(st.scale) == 512.0

    def test_min_scale(self):
        st = init_loss_scale(initial=1.0, min_scale=1.0)
        st, _ = update_loss_scale(st, jnp.asarray(False))
        assert float(st.scale) == 1.0

    def test_grads_finite(self):
        good = {"a": jnp.ones(3)}
        bad = {"a": jnp.array([1.0, jnp.nan, 2.0])}
        assert bool(grads_finite(good))
        assert not bool(grads_finite(bad))


NUM_PDFS = 8
T_IN = 18      # input frames
STRIDE = 3
T_OUT = 6      # supervision frames
B = 2

XCONFIG = f"""\
input name=input dim=20
linear-component name=linear1 dim=64
batchnorm-component name=bn1
tdnnf-layer name=tdnnf1 dim=64 bottleneck-dim=32 time-stride=1 bypass-scale=0.66
tdnnf-layer name=tdnnf2 dim=64 bottleneck-dim=32 time-stride=1 bypass-scale=0.66
prefinal-layer name=prefinal small-dim=32 big-dim=64
output-layer name=output dim={NUM_PDFS} include-log-softmax=false
prefinal-layer name=prefinal-xent input=tdnnf2 small-dim=32 big-dim=64
output-layer name=output-xent dim={NUM_PDFS}
"""


@pytest.fixture(scope="module")
def training_setup():
    rng = np.random.default_rng(11)
    model = build_model_from_string(XCONFIG)
    den_graph = DenominatorGraph.from_fst(
        make_simple_den_fst(num_pdfs=NUM_PDFS, num_states=6, seed=5), NUM_PDFS)
    den = DenominatorComputation(den_graph, leaky=1e-4)
    csrs = [fst_to_csr(random_fst(rng, num_pdfs=NUM_PDFS, T=T_OUT,
                                  num_states=2 * (T_OUT + 1)))
            for _ in range(B)]
    num_graph = build_numerator_batch(csrs)
    batch = {
        "features": jnp.asarray(rng.normal(size=(B, T_IN, 20)).astype(np.float32)),
        "weights": jnp.ones(B, jnp.float32),
    }
    return model, den, num_graph, batch


class TestTrainStep:
    def test_loss_decreases_over_10_steps(self, training_setup):
        model, den, num_graph, batch = training_setup
        config = TrainConfig(learning_rate=0.02, momentum=0.5,
                             frame_subsampling_factor=STRIDE, left_context=0,
                             compute_dtype="float32")
        step = make_train_step(model, den, num_graph,
                               ChainTrainingOpts(), config,
                               num_frames_out=T_OUT, donate=False)
        params, net_state, opt_state, scale_state = init_train_state(
            model, jax.random.PRNGKey(0), config)
        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(10):
            key, sub = jax.random.split(key)
            params, net_state, opt_state, scale_state, out = step(
                params, net_state, opt_state, scale_state, batch, sub)
            losses.append(float(out.loss))
            assert bool(out.ok), f"step {i}: chain NaN containment fired"
            assert not bool(out.skipped)
        assert losses[-1] < losses[0], losses
        # loss must drop substantially on an overfittable toy batch
        assert losses[-1] < 0.7 * losses[0], losses

    def test_weights_change(self, training_setup):
        model, den, num_graph, batch = training_setup
        config = TrainConfig(learning_rate=0.01,
                             frame_subsampling_factor=STRIDE,
                             compute_dtype="float32")
        step = make_train_step(model, den, num_graph, ChainTrainingOpts(),
                               config, num_frames_out=T_OUT, donate=False)
        params, net_state, opt_state, scale_state = init_train_state(
            model, jax.random.PRNGKey(0), config)
        w0 = np.asarray(params["linear1"]["w"]).copy()
        params, *_ = step(params, net_state, opt_state, scale_state, batch,
                          jax.random.PRNGKey(2))
        assert np.abs(np.asarray(params["linear1"]["w"]) - w0).max() > 0

    def test_xent_head_trains(self, training_setup):
        model, den, num_graph, batch = training_setup
        config = TrainConfig(learning_rate=0.01, xent_regularize=0.1,
                             frame_subsampling_factor=STRIDE,
                             compute_dtype="float32")
        step = make_train_step(model, den, num_graph, ChainTrainingOpts(),
                               config, num_frames_out=T_OUT, donate=False)
        params, net_state, opt_state, scale_state = init_train_state(
            model, jax.random.PRNGKey(0), config)
        w0 = np.asarray(params["output-xent"]["w"]).copy()
        params, _, _, _, out = step(params, net_state, opt_state, scale_state,
                                    batch, jax.random.PRNGKey(3))
        assert float(out.xent_objf) != 0.0
        assert np.abs(np.asarray(params["output-xent"]["w"]) - w0).max() > 0

    def test_bf16_compute_runs(self, training_setup):
        model, den, num_graph, batch = training_setup
        config = TrainConfig(learning_rate=0.01,
                             frame_subsampling_factor=STRIDE,
                             compute_dtype="bfloat16")
        step = make_train_step(model, den, num_graph, ChainTrainingOpts(),
                               config, num_frames_out=T_OUT, donate=False)
        params, net_state, opt_state, scale_state = init_train_state(
            model, jax.random.PRNGKey(0), config)
        _, _, _, _, out = step(params, net_state, opt_state, scale_state,
                               batch, jax.random.PRNGKey(4))
        assert np.isfinite(float(out.loss))
        # master params stay fp32
        assert params["linear1"]["w"].dtype == jnp.float32


class TestNaturalGradient:
    """NG-SGD end-to-end: preconditioned training must still descend,
    Fisher states must update, and skipping must freeze them."""

    def test_ng_training_descends(self, training_setup):
        model, den, num_graph, batch = training_setup
        config = TrainConfig(learning_rate=0.02, momentum=0.5,
                             frame_subsampling_factor=STRIDE,
                             compute_dtype="float32",
                             natural_gradient=True, ng_rank_in=4,
                             ng_rank_out=4)
        step = make_train_step(model, den, num_graph, ChainTrainingOpts(),
                               config, num_frames_out=T_OUT, donate=False)
        params, net_state, opt_state, scale_state = init_train_state(
            model, jax.random.PRNGKey(0), config)
        assert "ng" in opt_state and len(opt_state["ng"]) >= 7
        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(10):
            key, sub = jax.random.split(key)
            params, net_state, opt_state, scale_state, out = step(
                params, net_state, opt_state, scale_state, batch, sub)
            losses.append(float(out.loss))
            assert bool(out.ok)
            assert not bool(out.skipped)
            assert np.isfinite(losses[-1])
        assert losses[-1] < 0.7 * losses[0], losses
        # Fisher stats actually learned something: some site has d > 0
        ds = [float(np.asarray(v["in"].d).max())
              for v in jax.tree_util.tree_leaves(
                  {k: v for k, v in opt_state["ng"].items()},
                  is_leaf=lambda x: isinstance(x, dict) and "in" in x)]
        assert max(ds) > 0, ds
        # counters advanced
        any_site = next(iter(opt_state["ng"].values()))
        assert int(any_site["in"].t) == 10

    def test_ng_sites_cover_all_affine_params(self, training_setup):
        from kaldi_fp16_tpu.models.network import ng_sites
        model, _, _, _ = training_setup
        sites = ng_sites(model)
        names = {s["name"] for s in sites}
        assert "linear1/w" in names
        assert "tdnnf1/linear_w" in names and "tdnnf1/affine_w" in names
        assert "prefinal/big_w" in names and "prefinal/small_w" in names
        assert "output/w" in names and "output-xent/w" in names


class TestKaldiHyperparams:
    """xconfig l2-regularize = lr-scaled weight decay; explicit
    max-change=0 disables the per-component clip (review findings)."""

    def test_l2_weight_decay_applied(self):
        params = {"l": {"w": jnp.full((2, 2), 2.0)}}
        grads = {"l": {"w": jnp.zeros((2, 2))}}
        st = init_sgd_state(params)
        cfg = SGDConfig(learning_rate=0.1, max_param_change=1e9,
                        default_max_change=1e9)
        hyper = {"l": {"lr_factor": 1.0, "max_change": None, "l2": 0.5}}
        new_params, _, _ = sgd_update(params, grads, st, cfg, hyper=hyper)
        # w -= lr * l2 * w = 2.0 - 0.1*0.5*2.0 = 1.9
        np.testing.assert_allclose(np.asarray(new_params["l"]["w"]), 1.9,
                                   rtol=1e-6)

    def test_explicit_max_change_zero_disables_clip(self):
        params = {"l": {"w": jnp.zeros(4)}}
        grads = {"l": {"w": jnp.full(4, 100.0)}}
        st = init_sgd_state(params)
        cfg = SGDConfig(learning_rate=1.0, max_param_change=1e9,
                        default_max_change=0.25)
        hyper = {"l": {"lr_factor": 1.0, "max_change": 0.0}}
        new_params, _, _ = sgd_update(params, grads, st, cfg, hyper=hyper)
        norm = float(jnp.linalg.norm(new_params["l"]["w"]))
        assert norm > 100.0  # unclipped

    def test_layer_hyperparams_l2_and_unset_max_change(self):
        from kaldi_fp16_tpu.training.optimizer import layer_hyperparams
        model = build_model_from_string("""\
input name=input dim=8
linear-component name=l1 dim=8 l2-regularize=0.01
relu-batchnorm-layer name=l2 dim=8 max-change=0
output-layer name=output dim=4 include-log-softmax=false
""")
        h = layer_hyperparams(model)
        assert h["l1"]["l2"] == pytest.approx(0.01)
        assert h["l1"]["max_change"] is None      # unset -> default
        assert h["l2"]["max_change"] == 0.0       # explicit 0 = disabled


class TestDerivWeights:
    def test_zero_deriv_weights_freeze_chain_gradient(self, training_setup):
        """Kaldi supervision deriv-weights mask the chain derivative; a
        batch with all-zero weights must produce a (near-)zero update
        through the full train step (review finding: they were silently
        dropped on the training path)."""
        model, den, num_graph, batch = training_setup
        config = TrainConfig(learning_rate=0.05, momentum=0.0,
                             frame_subsampling_factor=STRIDE,
                             compute_dtype="float32")
        step = make_train_step(model, den, num_graph, ChainTrainingOpts(),
                               config, num_frames_out=T_OUT, donate=False)
        params, net_state, opt_state, scale_state = init_train_state(
            model, jax.random.PRNGKey(0), config)
        b0 = dict(batch)
        b0["deriv_weights"] = jnp.zeros((B, T_OUT), jnp.float32)
        p0 = jax.tree_util.tree_map(lambda x: x, params)
        new_params, *_ , out = step(params, net_state, opt_state,
                                    scale_state, b0, jax.random.PRNGKey(2))
        # objf is still computed (unweighted), but the update is ~zero
        assert np.isfinite(float(out.objf_per_frame))
        max_delta = max(float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree_util.tree_leaves(new_params),
            jax.tree_util.tree_leaves(p0)))
        assert max_delta < 1e-7, max_delta

    def test_partial_deriv_weights_change_gradient(self, training_setup):
        model, den, num_graph, batch = training_setup
        config = TrainConfig(learning_rate=0.05, momentum=0.0,
                             frame_subsampling_factor=STRIDE,
                             compute_dtype="float32")
        step = make_train_step(model, den, num_graph, ChainTrainingOpts(),
                               config, num_frames_out=T_OUT, donate=False)
        params, net_state, opt_state, scale_state = init_train_state(
            model, jax.random.PRNGKey(0), config)
        outs = {}
        for name, dw in (("ones", jnp.ones((B, T_OUT), jnp.float32)),
                         ("half", jnp.concatenate(
                             [jnp.ones((B, T_OUT // 2), jnp.float32),
                              jnp.zeros((B, T_OUT - T_OUT // 2), jnp.float32)],
                             axis=1))):
            b = dict(batch)
            b["deriv_weights"] = dw
            _, _, _, _, out = step(params, net_state, opt_state, scale_state,
                                   b, jax.random.PRNGKey(2))
            outs[name] = float(out.grad_norm)
        assert outs["half"] < outs["ones"], outs


def test_remat_matches_exact(training_setup):
    """jax.checkpoint rematerialization changes memory, not numbers."""
    model, den, num_graph, batch = training_setup
    outs = {}
    for remat in (False, True):
        config = TrainConfig(learning_rate=0.02, momentum=0.5,
                             frame_subsampling_factor=STRIDE,
                             compute_dtype="float32", remat=remat)
        step = make_train_step(model, den, num_graph, ChainTrainingOpts(),
                               config, num_frames_out=T_OUT, donate=False)
        params, net_state, opt_state, scale_state = init_train_state(
            model, jax.random.PRNGKey(0), config)
        p, _, _, _, out = step(params, net_state, opt_state, scale_state,
                               batch, jax.random.PRNGKey(3))
        outs[remat] = (p, float(out.loss), float(out.grad_norm))
    assert outs[False][1] == pytest.approx(outs[True][1], rel=1e-6)
    assert outs[False][2] == pytest.approx(outs[True][2], rel=1e-5)
    for lname in outs[False][0]:
        for pname in outs[False][0][lname]:
            np.testing.assert_allclose(
                np.asarray(outs[False][0][lname][pname]),
                np.asarray(outs[True][0][lname][pname]), rtol=1e-5, atol=1e-7)


def test_checkpoint_roundtrip_with_ng_state(training_setup, tmp_path):
    """Orbax checkpoint must round-trip the NG Fisher NamedTuples living
    inside opt_state (new with NG-SGD)."""
    from kaldi_fp16_tpu.training.checkpoint import CheckpointManager, DataPosition
    model, den, num_graph, batch = training_setup
    config = TrainConfig(learning_rate=0.02, frame_subsampling_factor=STRIDE,
                         compute_dtype="float32", natural_gradient=True,
                         ng_rank_in=4, ng_rank_out=4)
    step = make_train_step(model, den, num_graph, ChainTrainingOpts(),
                           config, num_frames_out=T_OUT, donate=False)
    params, net_state, opt_state, scale_state = init_train_state(
        model, jax.random.PRNGKey(0), config)
    params, net_state, opt_state, scale_state, _ = step(
        params, net_state, opt_state, scale_state, batch,
        jax.random.PRNGKey(1))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    key_at_save = np.asarray(jax.random.split(jax.random.PRNGKey(3))[0],
                             np.uint32)
    mgr.save(7, params, net_state, opt_state, scale_state,
             DataPosition(epoch=2, batches_consumed=3,
                          rng_key=key_at_save))
    p2, n2, o2, s2 = init_train_state(model, jax.random.PRNGKey(9), config)
    p2, n2, o2, s2, step_no, pos = mgr.restore(None, p2, n2, o2, s2)
    mgr.close()
    assert step_no == 7 and pos.epoch == 2 and pos.batches_consumed == 3
    # rng key round-trips (replay fidelity: resumed runs must re-draw
    # the SAME SpecAugment/dropout noise — soak replay check, r3)
    np.testing.assert_array_equal(pos.rng_key, key_at_save)
    assert "ng" in o2
    site = next(iter(opt_state["ng"]))
    np.testing.assert_array_equal(np.asarray(o2["ng"][site]["in"].v),
                                  np.asarray(opt_state["ng"][site]["in"].v))
    assert int(o2["ng"][site]["in"].t) == int(opt_state["ng"][site]["in"].t)
    # restored state continues training without retrace errors
    _ = step(p2, n2, o2, s2, batch, jax.random.PRNGKey(2))
