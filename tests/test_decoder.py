"""WFST Viterbi decoder + WER tests on hand-built decoding graphs."""

import numpy as np
import pytest

from kaldi_fp16_tpu.io.fst import Fst, FstArc, FstState
from kaldi_fp16_tpu.decode.graph import DecodingGraph
from kaldi_fp16_tpu.decode.viterbi import DecodeOptions, ViterbiDecoder
from kaldi_fp16_tpu.decode.wer import levenshtein, wer


def two_word_graph():
    """Graph accepting word 1 = pdfs [1,2] or word 2 = pdfs [3,4], then
    optional epsilon back to start (so sequences of words decode)."""
    s = [FstState() for _ in range(5)]
    # word 1 path: 0 -(pdf1)-> 1 -(pdf2, emit word1)-> 4
    s[0].arcs.append(FstArc(1, 0.0, 1, olabel=0))
    s[1].arcs.append(FstArc(2, 0.0, 4, olabel=1))
    # word 2 path: 0 -(pdf3)-> 2 -(pdf4, emit word2)-> 4
    s[0].arcs.append(FstArc(3, 0.0, 2, olabel=0))
    s[2].arcs.append(FstArc(4, 0.0, 4, olabel=2))
    # epsilon loop back for next word
    s[4].arcs.append(FstArc(0, 0.1, 0, olabel=0))
    s[4].final = 0.0
    return Fst(start=0, states=s)


def loglikes_for(pdf_seq, num_pdfs=6, good=5.0, bad=0.0):
    """[T, P] loglikes strongly favoring pdf_seq (1-indexed pdfs)."""
    T = len(pdf_seq)
    ll = np.full((T, num_pdfs), bad, dtype=np.float64)
    for t, p in enumerate(pdf_seq):
        ll[t, p - 1] = good
    return ll


class TestDecodingGraph:
    def test_from_fst_splits_arcs(self):
        g = DecodingGraph.from_fst(two_word_graph())
        assert g.num_states == 5
        assert len(g.em_ilabel) == 4
        assert len(g.eps_dst) == 1
        assert np.isfinite(g.final_cost[4])
        assert not np.isfinite(g.final_cost[0])

    def test_pdf_mapping(self):
        g = DecodingGraph.from_fst(two_word_graph())
        assert g.pdf_of(3) == 2
        g2 = DecodingGraph.from_fst(two_word_graph(),
                                    ilabel_to_pdf=np.array([0, 5, 6, 7, 8]))
        assert g2.pdf_of(3) == 7


class TestViterbi:
    def test_single_word(self):
        dec = ViterbiDecoder(DecodingGraph.from_fst(two_word_graph()))
        res = dec.decode(loglikes_for([1, 2]))
        assert res.words == [1]
        assert res.final_reached
        assert res.alignment == [1, 2]

    def test_other_word(self):
        dec = ViterbiDecoder(DecodingGraph.from_fst(two_word_graph()))
        res = dec.decode(loglikes_for([3, 4]))
        assert res.words == [2]

    def test_word_sequence(self):
        dec = ViterbiDecoder(DecodingGraph.from_fst(two_word_graph()))
        res = dec.decode(loglikes_for([1, 2, 3, 4, 1, 2]))
        assert res.words == [1, 2, 1]
        assert res.final_reached

    def test_ambiguous_prefers_acoustics(self):
        """Acoustic evidence flips the decision despite graph weights."""
        fst = two_word_graph()
        fst.states[0].arcs[0].weight = 3.0  # penalize word-1 path in graph
        dec = ViterbiDecoder(DecodingGraph.from_fst(fst))
        res = dec.decode(loglikes_for([1, 2], good=10.0))
        assert res.words == [1]  # acoustics (10 vs 0) beat graph cost 3
        res2 = dec.decode(loglikes_for([1, 2], good=1.0))
        assert res2.words == [2]  # weak acoustics: graph cost dominates

    def test_acoustic_scale(self):
        fst = two_word_graph()
        fst.states[0].arcs[0].weight = 3.0
        dec = ViterbiDecoder(DecodingGraph.from_fst(fst),
                             DecodeOptions(acoustic_scale=0.1))
        res = dec.decode(loglikes_for([1, 2], good=10.0))
        assert res.words == [2]  # scaled-down acoustics lose

    def test_beam_pruning_still_finds_path(self):
        dec = ViterbiDecoder(DecodingGraph.from_fst(two_word_graph()),
                             DecodeOptions(beam=1.0, max_active=2))
        res = dec.decode(loglikes_for([1, 2, 3, 4]))
        assert res.words == [1, 2]

    def test_batch(self):
        dec = ViterbiDecoder(DecodingGraph.from_fst(two_word_graph()))
        lls = np.stack([loglikes_for([1, 2]), loglikes_for([3, 4])])
        results = dec.decode_batch(lls)
        assert [r.words for r in results] == [[1], [2]]

    def test_total_cost_value(self):
        """Cost = graph weights + scaled negative loglikes on best path."""
        dec = ViterbiDecoder(DecodingGraph.from_fst(two_word_graph()))
        res = dec.decode(loglikes_for([1, 2], good=5.0))
        # two emitting arcs at -5.0 acoustic each, no graph cost, final 0
        assert abs(res.total_cost - (-10.0)) < 1e-9


class TestWER:
    def test_levenshtein_identity(self):
        assert levenshtein([1, 2, 3], [1, 2, 3]) == (0, 0, 0, 0)

    def test_substitution(self):
        s, i, d, e = levenshtein([1, 2, 3], [1, 9, 3])
        assert (s, i, d, e) == (1, 0, 0, 1)

    def test_insertion_deletion(self):
        s, i, d, e = levenshtein([1, 2], [1, 2, 3])
        assert (i, e) == (1, 1)
        s, i, d, e = levenshtein([1, 2, 3], [1, 3])
        assert (d, e) == (1, 1)

    def test_wer_corpus(self):
        refs = [["a", "b", "c"], ["d", "e"]]
        hyps = [["a", "x", "c"], ["d", "e"]]
        r = wer(refs, hyps)
        assert abs(r["wer"] - 20.0) < 1e-9
        assert r["substitutions"] == 1
        assert r["ref_words"] == 5

    def test_empty_hyp(self):
        r = wer([["a", "b"]], [[]])
        assert r["wer"] == 100.0
        assert r["deletions"] == 2


class TestEndToEndDecode:
    def test_network_to_words(self, rng):
        """Posteriors from a network decode to the expected word sequence."""
        import jax
        import jax.numpy as jnp
        from kaldi_fp16_tpu.models.model import build_model_from_string
        from kaldi_fp16_tpu.models.network import forward, init_params

        model = build_model_from_string(
            "input name=input dim=6\n"
            "linear-component name=lin dim=6\n"
            "output-layer name=output dim=6 include-log-softmax=false")
        params, state = init_params(model, jax.random.PRNGKey(0))
        params["lin"]["w"] = jnp.eye(6)
        params["output"]["w"] = jnp.eye(6) * 5.0
        params["output"]["b"] = jnp.zeros(6)
        # features one-hot encode the pdf sequence 1,2,3,4 (0-indexed 0..3)
        feats = np.zeros((1, 4, 6), dtype=np.float32)
        for t, p in enumerate([0, 1, 2, 3]):
            feats[0, t, p] = 1.0
        outs, _ = forward(model, params, state, jnp.asarray(feats),
                          train=False, compute_dtype=jnp.float32)
        ll = np.asarray(outs["output"][0], dtype=np.float64)
        dec = ViterbiDecoder(DecodingGraph.from_fst(two_word_graph()))
        res = dec.decode(ll)
        assert res.words == [1, 2]
