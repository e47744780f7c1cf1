"""Decoding graph: HCLG transducer in SoA form for beam search.

Arcs are split into emitting (ilabel > 0; consumes one acoustic frame) and
epsilon (ilabel == 0) groups per state, pre-sorted for the decoder.
ilabel conventions: by default ilabel-1 indexes the acoustic log-likelihood
row (pdf-id); an optional ilabel_to_pdf map handles transition-id graphs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from kaldi_fp16_tpu.io.fst import Fst, read_fst_file


@dataclass
class DecodingGraph:
    num_states: int
    start: int
    # emitting arcs, CSR by source state
    em_row_ptr: np.ndarray     # [S+1]
    em_dst: np.ndarray         # [E]
    em_ilabel: np.ndarray      # [E] (>0)
    em_olabel: np.ndarray      # [E]
    em_weight: np.ndarray      # [E] tropical (cost)
    # epsilon arcs, CSR by source state
    eps_row_ptr: np.ndarray
    eps_dst: np.ndarray
    eps_olabel: np.ndarray
    eps_weight: np.ndarray
    final_cost: np.ndarray     # [S], +inf if not final
    ilabel_to_pdf: Optional[np.ndarray] = None  # [max_ilabel+1]

    def pdf_of(self, ilabel: int) -> int:
        if self.ilabel_to_pdf is not None:
            return int(self.ilabel_to_pdf[ilabel])
        return ilabel - 1

    @classmethod
    def from_fst(cls, fst: Fst,
                 ilabel_to_pdf: Optional[np.ndarray] = None) -> "DecodingGraph":
        S = fst.num_states
        em_rp = [0]
        eps_rp = [0]
        em_dst, em_il, em_ol, em_w = [], [], [], []
        eps_dst, eps_ol, eps_w = [], [], []
        final = np.full(S, np.inf, dtype=np.float64)
        for s, st in enumerate(fst.states):
            for a in st.arcs:
                if a.label > 0:
                    em_dst.append(a.next_state)
                    em_il.append(a.label)
                    em_ol.append(a.olabel)
                    em_w.append(a.weight)
                else:
                    eps_dst.append(a.next_state)
                    eps_ol.append(a.olabel)
                    eps_w.append(a.weight)
            em_rp.append(len(em_dst))
            eps_rp.append(len(eps_dst))
            if st.is_final:
                final[s] = st.final
        return cls(
            num_states=S, start=fst.start,
            em_row_ptr=np.asarray(em_rp, np.int64),
            em_dst=np.asarray(em_dst, np.int32),
            em_ilabel=np.asarray(em_il, np.int32),
            em_olabel=np.asarray(em_ol, np.int32),
            em_weight=np.asarray(em_w, np.float64),
            eps_row_ptr=np.asarray(eps_rp, np.int64),
            eps_dst=np.asarray(eps_dst, np.int32),
            eps_olabel=np.asarray(eps_ol, np.int32),
            eps_weight=np.asarray(eps_w, np.float64),
            final_cost=final,
            ilabel_to_pdf=ilabel_to_pdf,
        )

    @classmethod
    def from_file(cls, path: str, **kw) -> "DecodingGraph":
        fst = read_fst_file(path)
        if fst is None:
            raise ValueError(f"cannot read FST {path}")
        return cls.from_fst(fst, **kw)
