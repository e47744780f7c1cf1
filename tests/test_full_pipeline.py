"""The full user-story pipeline in ONE test: synthetic cegs arks ->
DataLoader -> Trainer -> export to Kaldi nnet3 TEXT -> convert to a
BINARY .mdl through the binary writers -> standalone re-import into a
freshly-initialized model -> posterior parity -> WFST Viterbi decode of
both model copies through a word graph -> identical transcripts and
WER == 0 between them.

Every stage is tested in isolation elsewhere (test_end_to_end,
test_kaldi_loader, test_nnet3_binary, test_decoder); this test pins the
SEAMS between them — the switch-over path a user of the reference
follows (SURVEY.md §6 / BASELINE config 5: train -> final.mdl ->
decode).  Ref analog: the reference's train->final.mdl flow stops at
weight export (weight_loader.go:605-613); decode is net-new here.
"""

import numpy as np

import jax

from test_end_to_end import (
    NUM_PDFS, STRIDE, XCONFIG, _loader, make_trainer, synth_example,
)

from kaldi_fp16_tpu.decode.graph import DecodingGraph
from kaldi_fp16_tpu.decode.viterbi import ViterbiDecoder
from kaldi_fp16_tpu.decode.wer import wer
from kaldi_fp16_tpu.io.egs import write_ark
from kaldi_fp16_tpu.io.fst import Fst, FstArc, FstState
from kaldi_fp16_tpu.io.nnet3_binary import (
    Nnet3Model, components_from_text, write_nnet3,
)
from kaldi_fp16_tpu.models.kaldi_loader import (
    export_params_to_text, load_weights_from_file, parse_nnet3_text,
)
from kaldi_fp16_tpu.models.model import build_model_from_string
from kaldi_fp16_tpu.models.network import forward, init_params, subsample_output


def word_loop_graph(num_words: int) -> Fst:
    """Unigram word loop: one state, word w = pdf w (1-indexed), each
    frame emits one word.  The simplest graph that turns framewise
    posteriors into a transcript."""
    s = FstState()
    for w in range(1, num_words + 1):
        s.arcs.append(FstArc(w, 0.0, 0, olabel=w))
    s.final = 0.0
    return Fst(start=0, states=[s])


def test_train_export_binary_reimport_decode(tmp_path):
    # 1. data -> training
    rng = np.random.default_rng(7)
    write_ark(str(tmp_path / "cegs.1.ark"),
              [synth_example(rng, f"utt-{i:03d}") for i in range(8)])
    trainer = make_trainer()
    batches = list(_loader(tmp_path))
    objfs = []
    for _ in range(3):
        for b in batches:
            objfs.append(float(trainer.train_batch(b).objf_per_frame))
    assert np.isfinite(objfs).all()
    assert np.mean(objfs[-2:]) > np.mean(objfs[:2])  # it learned something

    # 2. export text -> binary .mdl via the binary writers
    text = export_params_to_text(trainer.model, trainer.params,
                                 trainer.net_state)
    mdl = str(tmp_path / "final.mdl")
    write_nnet3(Nnet3Model(config_lines=[],
                           components=components_from_text(
                               parse_nnet3_text(text))), mdl)
    with open(mdl, "rb") as f:
        assert f.read(2) == b"\x00B"  # Kaldi binary marker

    # 3. standalone re-import into a fresh model (different init seed)
    model2 = build_model_from_string(XCONFIG)
    params2, state2 = init_params(model2, jax.random.PRNGKey(1234))
    params2, state2, report = load_weights_from_file(model2, params2,
                                                     state2, mdl)
    assert report

    # 4. posterior parity on real batch features
    b = batches[0]
    feats = np.asarray(b.features, np.float32)
    ivecs = None if b.ivectors is None else np.asarray(b.ivectors, np.float32)

    def posts(model, params, state):
        out, _ = forward(model, params, state, feats, ivecs, train=False,
                         compute_dtype=np.float32)
        out = subsample_output(out[model.chain_output().name], STRIDE,
                               b.left_context, b.frames_per_seq)
        return np.asarray(out, np.float64)

    p1 = posts(trainer.model, trainer.params, trainer.net_state)
    p2 = posts(model2, params2, state2)
    np.testing.assert_allclose(p2, p1, rtol=1e-4, atol=1e-5)

    # 5. decode both copies -> identical transcripts, WER == 0
    dec = ViterbiDecoder(DecodingGraph.from_fst(word_loop_graph(NUM_PDFS)))
    refs, hyps = [], []
    for i, key in enumerate(b.keys):
        r1 = dec.decode(p1[i])
        r2 = dec.decode(p2[i])
        assert r1.final_reached and r2.final_reached
        assert len(r1.words) == b.frames_per_seq
        assert r1.words == r2.words, key
        refs.append(r1.words)
        hyps.append(r2.words)
    report = wer(refs, hyps)
    assert report["wer"] == 0.0
