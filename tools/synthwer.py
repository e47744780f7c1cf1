#!/usr/bin/env python
"""synthwer — closed-loop WER on synthetic speech: train the chain model
on utterances generated from a KNOWN word/phone/pdf process, decode
held-out utterances through a word-loop graph on device, and report WER
falling to ~0 as training converges.

No real speech exists in this environment (BASELINE config 5's
LibriSpeech end state is environmental), so this is the strongest
available end-to-end ACCURACY proof: cegs ark IO, the DataLoader, the
LF-MMI Trainer (numerator/denominator forward-backward), posterior
extraction, decoding-graph construction, the on-device Viterbi decoder,
and WER scoring must all work TOGETHER for the error rate to reach
zero.  The reference has no decoder at all (README.md:10 — WFST listed
as philosophy), so there is no baseline; parity anchor is Kaldi's
decode-after-train recipe shape.

Each word is a phone sequence; each phone emits `--dur` supervision
frames whose input features are a per-phone mean vector + noise.  The
decoding graph is an epsilon-free word loop with per-phone self-loops
(durations >= 1 accepted), word olabels on word-entry arcs.

Usage:
  python tools/synthwer.py [--cpu] [--steps 150] [--batch 16]
      [--phones 12] [--words 6] [--phones-per-word 2] [--dur 2]
      [--words-per-utt 3] [--feat-dim 24] [--eval-every 30]
      [--ambiguous] [--zipf 1.2] [--lm-rescore] [--lm-weight 1.0]
      [--lattice-beam 8.0] [--max-dur 4] [--streaming]
      [--stream-chunk 6] [--stream-window 12]

Prints one JSON line per evaluation and a final summary line
{"ok": true/false, "wer_first": ..., "wer_final": ...}.
"""

import argparse
import json
import os
import tempfile

import _common  # noqa: F401
import numpy as np

LEFT, RIGHT, STRIDE = 3, 5, 3


def build_xconfig(feat_dim: int, num_pdfs: int, dim: int = 48) -> str:
    return f"""\
input name=input dim={feat_dim}
linear-component name=linear1 dim={dim}
batchnorm-component name=bn1
tdnnf-layer name=tdnnf1 dim={dim} bottleneck-dim={dim // 2} time-stride=1 bypass-scale=0.66
tdnnf-layer name=tdnnf2 dim={dim} bottleneck-dim={dim // 2} time-stride=3 bypass-scale=0.66
prefinal-layer name=prefinal small-dim={dim // 2} big-dim={dim}
output-layer name=output dim={num_pdfs} include-log-softmax=false
"""


def make_lexicon(rng, phones: int, words: int, ppw: int,
                 disjoint: bool = True):
    """Phone sequences, one per word id 1..words.  `disjoint` (default)
    partitions the phone set across words so the word loop has no
    segmentation ambiguity and 0% WER is reachable; non-disjoint words
    share phones, leaving genuine LM-free homophone-boundary ambiguity
    (real ASR resolves those with an LM)."""
    if disjoint:
        assert phones >= words * ppw, (
            f"--disjoint needs phones >= words*phones_per_word "
            f"({phones} < {words}*{ppw})")
        perm = [int(p) for p in rng.permutation(phones)]
        return {w + 1: tuple(perm[w * ppw:(w + 1) * ppw])
                for w in range(words)}
    if phones ** ppw < words:
        raise SystemExit(f"only {phones ** ppw} distinct "
                         f"{ppw}-phone sequences exist over {phones} "
                         f"phones — cannot build {words} words")
    lex, seen = {}, set()
    w = 1
    while w <= words:
        seq = tuple(int(p) for p in rng.integers(0, phones, size=ppw))
        if seq in seen:
            continue
        seen.add(seq)
        lex[w] = seq
        w += 1
    return lex


def sample_utt(rng, lex, words_per_utt: int, dur: int,
               zipf: float = 0.0, max_dur: int = 0):
    """-> (word ids, supervision pdf sequence 0-indexed).  `zipf` skews
    the word distribution (p proportional to rank^-zipf; 0 = uniform) —
    a skew the LM can exploit when rescoring ambiguous lexica.
    `max_dur` > dur draws each phone's duration uniformly from
    [dur, max_dur]: utterance lengths then vary, exercising bucketed
    batching in training and duration-flexible decoding."""
    n = len(lex)
    p = np.arange(1, n + 1, dtype=np.float64) ** -zipf
    p /= p.sum()
    ws = [int(w) + 1 for w in rng.choice(n, size=words_per_utt, p=p)]
    hi = max(max_dur, dur)
    pdfs = [p_ for w in ws for p_ in lex[w]
            for _ in range(int(rng.integers(dur, hi + 1)))]
    return ws, np.asarray(pdfs, np.int64)


def features_for(rng, pdf_seq, means, noise: float):
    """Input-frame features at STRIDE x the supervision rate: row r
    carries the mean vector of the nearest supervision frame's pdf."""
    fps = len(pdf_seq)
    t_in = LEFT + (fps - 1) * STRIDE + 1 + RIGHT
    rows = np.clip(np.round((np.arange(t_in) - LEFT) / STRIDE), 0,
                   fps - 1).astype(np.int64)
    feats = means[pdf_seq[rows]] + rng.normal(
        size=(t_in, means.shape[1])) * noise
    return feats.astype(np.float32)


def make_example(rng, key, lex, args, means):
    from kaldi_fp16_tpu.io.egs import Example, Index, IoBlock, Supervision
    from kaldi_fp16_tpu.io.fst import Fst, FstArc, FstState
    ws, pdfs = sample_utt(rng, lex, args.words_per_utt, args.dur,
                          zipf=args.zipf, max_dur=args.max_dur)
    fps = len(pdfs)
    states = [FstState() for _ in range(fps + 1)]
    for i, p in enumerate(pdfs):          # linear chain, 1-indexed labels
        states[i].arcs.append(FstArc(int(p) + 1, 0.0, i + 1))
    states[-1].final = 0.0
    sup = Supervision(name="output", weight=1.0, num_sequences=1,
                      frames_per_seq=fps, label_dim=args.phones,
                      end2end=False, fst=Fst(start=0, states=states),
                      indexes=[Index(0, i * STRIDE, 0) for i in range(fps)],
                      deriv_weights=np.ones(fps, np.float32))
    feats = features_for(rng, pdfs, means, args.noise)
    ex = Example(key=key, inputs=[
        IoBlock("input", [Index(0, t - LEFT, 0)
                          for t in range(feats.shape[0])], feats, "CM")],
        supervision=sup)
    return ex, ws


def write_arpa(path: str, transcripts, n_words: int, k: float = 0.5):
    """Order-2 ARPA estimated from the training transcripts (word ids
    as tokens).  Every bigram over the closed vocabulary is explicit
    (add-k smoothed), so no backoff mass is ever consulted — the
    simplest valid ARPA that read_arpa/rescore_with_lm consume."""
    import math
    V = [str(w) for w in range(1, n_words + 1)]
    uni = {w: 0 for w in V + ["</s>"]}
    bi = {}
    for ws in transcripts:
        seq = [str(w) for w in ws]
        prev = "<s>"
        for w in seq + ["</s>"]:
            uni[w] += 1
            bi[(prev, w)] = bi.get((prev, w), 0) + 1
            prev = w
    N = sum(uni.values())
    ctxs = ["<s>"] + V
    ctx_tot = {c: 0 for c in ctxs}
    for (c, w), n in bi.items():
        ctx_tot[c] += n
    lines = ["\\data\\", f"ngram 1={len(V) + 2}",
             f"ngram 2={len(ctxs) * (len(V) + 1)}", "", "\\1-grams:",
             "-99\t<s>\t0"]
    for w in V + ["</s>"]:
        p = (uni[w] + k) / (N + k * (len(V) + 1))
        lines.append(f"{math.log10(p):.6f}\t{w}"
                     + ("\t0" if w != "</s>" else ""))
    lines += ["", "\\2-grams:"]
    for c in ctxs:
        for w in V + ["</s>"]:
            p = ((bi.get((c, w), 0) + k)
                 / (ctx_tot[c] + k * (len(V) + 1)))
            lines.append(f"{math.log10(p):.6f}\t{c} {w}")
    lines += ["", "\\end\\", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def bigram_den_fst(phones: int):
    """Ergodic phone bigram: any pdf sequence is a den path, so the
    numerator is always a subset and objf/frame stays <= 0 — the
    coverage property Kaldi's estimated phone LM guarantees
    (chain-est-phone-lm)."""
    from kaldi_fp16_tpu.io.fst import Fst, FstArc, FstState
    states = [FstState() for _ in range(phones + 1)]   # 0 = start hub
    for p in range(phones):
        states[0].arcs.append(FstArc(p + 1, 0.0, p + 1))
        for q in range(phones):
            states[p + 1].arcs.append(FstArc(q + 1, 0.0, q + 1))
        states[p + 1].final = 0.0
    return Fst(start=0, states=states)


def word_loop_fst(lex):
    """Epsilon-free word loop: from the hub each word enters on its
    first phone (olabel = word), each phone state self-loops (duration
    >= 1), word-final states fan out to every word's entry arc and are
    final.  All arcs consume a pdf — on-device decodable as-is."""
    from kaldi_fp16_tpu.io.fst import Fst, FstArc, FstState
    states = [FstState()]                 # 0 = start hub
    entry = {}                            # w -> (first pdf label, first state)
    last = {}                             # w -> word-final state id
    for w, phones in lex.items():
        ids = []
        for _ in phones:
            states.append(FstState())
            ids.append(len(states) - 1)
        for j in range(len(phones)):
            states[ids[j]].arcs.append(        # self-loop: stay in phone
                FstArc(phones[j] + 1, 0.0, ids[j], olabel=0))
            if j + 1 < len(phones):            # advance to next phone
                states[ids[j]].arcs.append(
                    FstArc(phones[j + 1] + 1, 0.0, ids[j + 1], olabel=0))
        entry[w] = (phones[0] + 1, ids[0])
        last[w] = ids[-1]
        states[last[w]].final = 0.0
    for w in lex:                              # word entries from the hub
        lbl, st = entry[w]
        states[0].arcs.append(FstArc(lbl, 0.0, st, olabel=w))
    for w_from in lex:                         # word -> next word
        for w_to in lex:
            lbl, st = entry[w_to]
            states[last[w_from]].arcs.append(
                FstArc(lbl, 0.0, st, olabel=w_to))
    return Fst(start=0, states=states)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--phones", type=int, default=12)
    ap.add_argument("--words", type=int, default=6)
    ap.add_argument("--phones-per-word", dest="ppw", type=int, default=2)
    ap.add_argument("--dur", type=int, default=2)
    ap.add_argument("--max-dur", type=int, default=0,
                    help="> --dur: per-phone durations drawn uniformly "
                         "from [dur, max-dur] — variable utterance "
                         "lengths (bucketed batching, flexible decode)")
    ap.add_argument("--words-per-utt", type=int, default=3)
    ap.add_argument("--feat-dim", type=int, default=24)
    ap.add_argument("--noise", type=float, default=0.5)
    ap.add_argument("--train-utts", type=int, default=384)
    ap.add_argument("--test-utts", type=int, default=32)
    ap.add_argument("--eval-every", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--final-lr", type=float, default=0.003)
    ap.add_argument("--l2", type=float, default=1e-3,
                    help="chain output l2 (keeps logits bounded once the "
                         "classes separate — Kaldi l2-regularize)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--acoustic-scale", type=float, default=1.0)
    ap.add_argument("--ambiguous", action="store_true",
                help="words may share phones (segmentation ambiguity:\n0%% WER not guaranteed without an LM)")
    ap.add_argument("--zipf", type=float, default=0.0,
                    help="word-frequency skew (p ~ rank^-zipf; 0 = "
                         "uniform) — gives the rescoring LM real signal")
    ap.add_argument("--lm-rescore", action="store_true",
                    help="after training: decode exact device lattices, "
                         "rescore with a bigram ARPA LM estimated from "
                         "the TRAIN transcripts, compare WER")
    ap.add_argument("--lm-weight", type=float, default=1.0)
    ap.add_argument("--lattice-beam", type=float, default=8.0)
    ap.add_argument("--streaming", action="store_true",
                    help="after training: ALSO decode through the "
                         "windowed streaming decoder (chunked feeds, "
                         "bounded backpointer window) and score its WER "
                         "— the online serving path's accuracy check")
    ap.add_argument("--stream-chunk", type=int, default=6)
    ap.add_argument("--stream-window", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.enable_compile_cache()
    if args.cpu:
        _common.force_cpu()

    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
    from kaldi_fp16_tpu.chain.graph import DenominatorGraph
    from kaldi_fp16_tpu.chain.objective import ChainTrainingOpts
    from kaldi_fp16_tpu.decode.graph import DecodingGraph
    from kaldi_fp16_tpu.decode.tpu_viterbi import SparseViterbiDecoder
    from kaldi_fp16_tpu.decode.wer import wer
    from kaldi_fp16_tpu.io.dataloader import DataLoader, DataLoaderConfig
    from kaldi_fp16_tpu.io.egs import write_ark
    from kaldi_fp16_tpu.models.model import build_model_from_string
    from kaldi_fp16_tpu.models.network import forward, subsample_output
    from kaldi_fp16_tpu.training.train_step import TrainConfig
    from kaldi_fp16_tpu.training.trainer import Trainer

    rng = np.random.default_rng(args.seed)
    lex = make_lexicon(rng, args.phones, args.words, args.ppw,
                   disjoint=not args.ambiguous)
    means = rng.normal(size=(args.phones, args.feat_dim)).astype(
        np.float32) * 1.5

    # -- data -----------------------------------------------------------
    workdir = tempfile.mkdtemp(prefix="synthwer_")
    train_pairs = [make_example(rng, f"tr-{i:04d}", lex, args, means)
                   for i in range(args.train_utts)]
    train_exs = [ex for ex, _ in train_pairs]
    train_refs = [ws for _, ws in train_pairs]
    half = len(train_exs) // 2
    write_ark(os.path.join(workdir, "cegs.1.ark"), train_exs[:half])
    write_ark(os.path.join(workdir, "cegs.2.ark"), train_exs[half:])
    test = [make_example(rng, f"te-{i:04d}", lex, args, means)
            for i in range(args.test_utts)]
    test_refs = [ws for _, ws in test]
    # group test utts by length (durations may vary with --max-dur);
    # each group decodes as one batch, results land back in test order
    groups = {}
    for i, (ex, _) in enumerate(test):
        groups.setdefault(ex.supervision.frames_per_seq,
                          []).append(i)
    test_groups = [
        (idx, np.stack([test[i][0].inputs[0].data for i in idx]), f)
        for f, idx in sorted(groups.items())]
    max_fps = max(ex.supervision.frames_per_seq
                  for ex, _ in train_pairs + test)

    # -- model + trainer --------------------------------------------------
    model = build_model_from_string(
        build_xconfig(args.feat_dim, args.phones))
    den = DenominatorComputation(DenominatorGraph.from_fst(
        bigram_den_fst(args.phones), args.phones), leaky=1e-4)
    config = TrainConfig(learning_rate=args.lr, momentum=0.5,
                         frame_subsampling_factor=STRIDE,
                         xent_regularize=0.0, compute_dtype="float32")
    from kaldi_fp16_tpu.training.trainer import exponential_lr
    trainer = Trainer(model, den, config,
                      ChainTrainingOpts(l2_regularize=args.l2),
                      lr_schedule=exponential_lr(args.lr, args.final_lr,
                                                 args.steps),
                      fst_pad_states=1 << max(4, int(np.ceil(np.log2(
                          max_fps + 2)))),
                      fst_pad_arcs=1 << max(5, int(np.ceil(np.log2(
                          max_fps + 2)))))

    # -- decoder over the word loop ---------------------------------------
    dec = SparseViterbiDecoder(DecodingGraph.from_fst(word_loop_fst(lex)),
                               acoustic_scale=args.acoustic_scale)

    import functools

    @functools.partial(jax.jit, static_argnames=("fps",))
    def acoustic(params, state, feats, fps):
        outs, _ = forward(model, params, state, feats, None, train=False,
                          compute_dtype=jnp.float32)
        return subsample_output(outs[model.chain_output().name],
                                STRIDE, LEFT, fps)

    def posteriors_by_group():
        """-> [(test indices, loglikes [b, fps, P])] per length group."""
        out = []
        for idx, feats, f in test_groups:
            ll = np.asarray(acoustic(trainer.params, trainer.net_state,
                                     jnp.asarray(feats), f), np.float64)
            out.append((idx, ll))
        return out

    def eval_wer():
        hyps = [None] * len(test_refs)
        for idx, ll in posteriors_by_group():
            for i, r in zip(idx, dec.decode_batch(ll)):
                hyps[i] = r["words"]
        return wer(test_refs, hyps)

    def loader():
        return DataLoader(os.path.join(workdir, "cegs.*.ark"),
                          DataLoaderConfig(batch_size=args.batch,
                                           feat_dim=args.feat_dim,
                                           label_dim=args.phones,
                                           shuffle_files=True,
                                           shuffle_buffer=256,
                                           seed=args.seed))

    if args.train_utts < args.batch:
        raise SystemExit(f"--train-utts {args.train_utts} < --batch "
                         f"{args.batch}: the loader would never yield a "
                         f"full batch (drop_remainder)")

    history = []
    report = eval_wer()
    history.append({"step": 0, **report})
    print(json.dumps(history[-1]), flush=True)
    steps = 0
    while steps < args.steps:
        made_progress = False
        for batch in loader():
            made_progress = True
            out = trainer.train_batch(batch)
            steps += 1
            if steps % args.eval_every == 0 or steps >= args.steps:
                report = eval_wer()
                history.append({
                    "step": steps,
                    "objf": round(float(out.objf_per_frame), 4),
                    **{k: round(v, 4) for k, v in report.items()}})
                print(json.dumps(history[-1]), flush=True)
            if steps >= args.steps:
                break
        if not made_progress:
            raise SystemExit("the data never filled one homogeneous "
                             "batch — lower --batch or raise "
                             "--train-utts")

    streamed = None
    if args.streaming:
        from kaldi_fp16_tpu.decode.streaming import WindowedStreamingDecoder
        sdec = WindowedStreamingDecoder(
            DecodingGraph.from_fst(word_loop_fst(lex)),
            acoustic_scale=args.acoustic_scale,
            window=args.stream_window)
        hyps_s = [None] * len(test_refs)
        C = args.stream_chunk
        for idx, ll in posteriors_by_group():
            st = sdec.init(batch=ll.shape[0])
            for c0 in range(0, ll.shape[1], C):
                st = sdec.feed(st, ll[:, c0:c0 + C])
            for i, r in zip(idx, sdec.finalize(st)):
                hyps_s[i] = r["words"]
        streamed = {"streaming_wer": wer(test_refs, hyps_s)["wer"],
                    "chunk": C, "window": args.stream_window}
        print(json.dumps({"streaming": streamed}), flush=True)

    rescored = None
    if args.lm_rescore:
        from kaldi_fp16_tpu.decode.lattice import rescore_with_lm
        from kaldi_fp16_tpu.decode.lm import read_arpa
        from kaldi_fp16_tpu.decode.tpu_viterbi import DeviceLatticeDecoder
        arpa = os.path.join(workdir, "bigram.arpa")
        write_arpa(arpa, train_refs, len(lex))
        lm, syms = read_arpa(arpa, {str(w): w for w in lex})
        ldec = DeviceLatticeDecoder(
            DecodingGraph.from_fst(word_loop_fst(lex)),
            acoustic_scale=args.acoustic_scale,
            lattice_beam=args.lattice_beam)
        hyps_v = [None] * len(test_refs)
        hyps_r = [None] * len(test_refs)
        for idx, ll in posteriors_by_group():
            for i, lat in zip(idx, ldec.decode_batch(ll)):
                w0, _ = lat.best_path(acoustic_scale=args.acoustic_scale)
                rlat = rescore_with_lm(lat, lm, lm_weight=args.lm_weight,
                                       old_lm_weight=1.0,
                                       eos=syms["</s>"])
                w1, _ = rlat.best_path(acoustic_scale=args.acoustic_scale)
                hyps_v[i] = w0
                hyps_r[i] = w1
        rescored = {"lattice_viterbi_wer": wer(test_refs, hyps_v)["wer"],
                    "lm_rescored_wer": wer(test_refs, hyps_r)["wer"]}
        print(json.dumps({"lm_rescore": rescored}), flush=True)

    first, final = history[0]["wer"], history[-1]["wer"]
    ok = final < first and final <= 0.05
    if streamed is not None:
        # the online path must match the offline result it's contracted
        # to (traceback-delay commits; see decode/streaming.py)
        ok = ok and streamed["streaming_wer"] <= max(final, 0.05)
    if rescored is not None:
        # rescoring must not WORSEN the converged result — a broken
        # lattice/ARPA path fails the gate instead of hiding behind the
        # Viterbi number
        ok = ok and rescored["lm_rescored_wer"] <= max(final, 0.05)
    out = {"ok": bool(ok), "wer_first": first, "wer_final": final,
           "steps": steps, "lexicon_words": len(lex),
           "test_utts": args.test_utts}
    if rescored is not None:
        out["wer_rescored"] = rescored["lm_rescored_wer"]
    if streamed is not None:
        out["wer_streaming"] = streamed["streaming_wer"]
    print(json.dumps(out), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
