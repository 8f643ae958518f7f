"""Device-resident log-score tables memoised from model parameters.

The TPU equivalent of the reference's QuaffScores (src/qmodel.cpp:296-325):
all transition log-probs and the full [ref symbol, read k-mer, quality]
emission tables are precomputed host-side in float64 and shipped to the
device once per parameter set, so the DP kernels only do gathers and adds.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..alphabet import ALPHABET_SIZE, QUAL_SCORE_RANGE
from ..model.negbinom import log_negative_binomial_array
from ..model.params import QuaffParams


@dataclass
class ScoreTables:
    match_kmer_len: int
    indel_kmer_len: int
    # emissions
    match_score: np.ndarray  # [4, Km, Q]  log P(read sym+qual | ref sym, kmer ctx)
    match_score_noq: np.ndarray  # [4, Km]
    insert_score: np.ndarray  # [4, Q]
    insert_score_noq: np.ndarray  # [4]
    # transitions
    m2m: np.ndarray  # [Ki]
    m2i: np.ndarray  # [Ki]
    m2d: np.ndarray  # [Ki]
    m2e: np.ndarray  # [Ki]
    d2d: float
    d2m: float
    i2i: float
    i2m: float

    @classmethod
    def from_params(cls, qp: QuaffParams) -> "ScoreTables":
        q = np.arange(QUAL_SCORE_RANGE)
        km = qp.num_match_kmers
        match_noq = np.log(qp.match_prob)
        match = np.empty((ALPHABET_SIZE, km, QUAL_SCORE_RANGE))
        for i in range(ALPHABET_SIZE):
            for j in range(km):
                match[i, j] = match_noq[i, j] + log_negative_binomial_array(
                    q, qp.match_q[i, j], qp.match_r[i, j]
                )
        ins_noq = np.log(qp.insert_prob)
        ins = np.empty((ALPHABET_SIZE, QUAL_SCORE_RANGE))
        for i in range(ALPHABET_SIZE):
            ins[i] = ins_noq[i] + log_negative_binomial_array(
                q, qp.insert_q[i], qp.insert_r[i]
            )
        return cls(
            match_kmer_len=qp.match_kmer_len,
            indel_kmer_len=qp.indel_kmer_len,
            match_score=match,
            match_score_noq=match_noq,
            insert_score=ins,
            insert_score_noq=ins_noq,
            m2m=np.log(1 - qp.begin_insert) + np.log(1 - qp.begin_delete),
            m2i=np.log(qp.begin_insert),
            m2d=np.log(1 - qp.begin_insert) + np.log(qp.begin_delete),
            m2e=np.log(qp.begin_insert),
            d2d=float(np.log(qp.extend_delete)),
            d2m=float(np.log(1 - qp.extend_delete)),
            i2i=float(np.log(qp.extend_insert)),
            i2m=float(np.log(1 - qp.extend_insert)),
        )
