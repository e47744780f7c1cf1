"""X-vector model family: shapes, embedding convention, trainability
(the reference's GoTorch XVector capability, go/gotorch/cnn_tdnn.go)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.models.xvector import (
    XVectorConfig, init_xvector, xvector_forward, xvector_loss,
)

CFG = XVectorConfig(feat_dim=12, tdnn_dims=(16, 16, 24),
                    tdnn_contexts=((-2, -1, 0, 1, 2), (-2, 0, 2), (0,)),
                    embed_dim=16, segment_dims=(16, 8), num_speakers=4)


def test_shapes(rng):
    params = init_xvector(CFG, jax.random.PRNGKey(0))
    feats = jnp.asarray(rng.normal(size=(3, 20, 12)).astype(np.float32))
    emb, logits = xvector_forward(CFG, params, feats)
    assert emb.shape == (3, 16)
    assert logits.shape == (3, 4)
    assert np.isfinite(np.asarray(emb)).all()


def test_embedding_is_preactivation(rng):
    """Embedding must be segment0's pre-activation: it can go negative
    (post-ReLU could not)."""
    params = init_xvector(CFG, jax.random.PRNGKey(1))
    feats = jnp.asarray(rng.normal(size=(8, 30, 12)).astype(np.float32))
    emb, _ = xvector_forward(CFG, params, feats)
    assert float(np.asarray(emb).min()) < 0


def test_time_invariance_of_stats_pooling(rng):
    """Permuting frames leaves the embedding unchanged for context-free
    TDNN stacks (statistics pooling is order-free)."""
    cfg = XVectorConfig(feat_dim=12, tdnn_dims=(16,), tdnn_contexts=((0,),),
                        embed_dim=8, segment_dims=(8,), num_speakers=0)
    params = init_xvector(cfg, jax.random.PRNGKey(2))
    feats = rng.normal(size=(2, 25, 12)).astype(np.float32)
    perm = rng.permutation(25)
    e1, _ = xvector_forward(cfg, params, jnp.asarray(feats))
    e2, _ = xvector_forward(cfg, params, jnp.asarray(feats[:, perm]))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=1e-4, atol=1e-5)


def test_speaker_classification_trains(rng):
    """Four synthetic speakers with different spectral means: 50 SGD steps
    must clearly reduce the loss (GoTorch traintest-style assertion)."""
    params = init_xvector(CFG, jax.random.PRNGKey(3))

    def batch():
        labels = rng.integers(0, 4, size=16)
        means = np.linspace(-1.5, 1.5, 4)[labels]
        feats = (rng.normal(size=(16, 20, 12)) * 0.5
                 + means[:, None, None]).astype(np.float32)
        return jnp.asarray(feats), jnp.asarray(labels)

    loss_grad = jax.jit(jax.value_and_grad(
        lambda p, f, y: xvector_loss(CFG, p, f, y)))
    first = None
    for _ in range(50):
        f, y = batch()
        loss, g = loss_grad(params, f, y)
        if first is None:
            first = float(loss)
        params = jax.tree_util.tree_map(lambda w, gw: w - 0.1 * gw, params, g)
    assert float(loss) < 0.7 * first, (first, float(loss))
