"""Faithful port of the reference retrieval scorer — the rank-identity oracle.

Ported from /root/reference/knowledge4ir/utils/retrieval_model.py (class
RetrievalModel, lines 77-291).  Every quirk of the reference implementation is
preserved because BASELINE.json demands rank-identical top-k with scores
within 1e-6:

- bm25 (retrieval_model.py:251-266):
  * tf_part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  * ratio   = max((N - df + 0.5) / (df + 0.5), 1.0)
  * idf     = max(log(ratio), 0)            (redundant: ratio>=1 => log>=0)
  * score   = ratio . (tf_part * idf)       <- the dot re-weights by the RAW
                                               ratio (an idf^2 flavor), quirk
  * score   = log(max(score, 1.0))          <- floor at 0, quirk
  * v_q = q_tf/sum(q_tf) is computed but UNUSED (q term multiplicity ignored
    beyond term identity), quirk (line 254)
  * doc_len == 0 -> 0
- lm (205-217): tf floored at min_tf=0.1, /dl, floored at 1e-10, log . q_tf
- lm_dir (219-227): Dirichlet mu=2500 with DF (not collection TF!) as the
  corpus probability, q-normalized, +20 offset (the +20 exists in
  retrieval_model.py but NOT in its near-duplicate duet_feature/base.py:166-174
  — this engine standardizes on retrieval_model.py, divergence documented in
  SURVEY.md §2.8 F3).
- lm_jm (229-237), lm_twoway (239-249): lambda=0.4, same +20.
- coordinate/bool_and/bool_or (268-277), tf_idf (279-285), tf (287-291).
- missing df -> 0.0, missing doc tf -> 0 (set_from_raw, lines 139-148).

Determinism note: the reference sums via numpy dot in query-term dict order;
bit-level order is a numpy implementation detail.  This oracle fixes
SEQUENTIAL summation in query-term first-occurrence order — the engine's
grouped aggregation folds contributions in the same order (sorted by
term_idx), so within-run values agree to the last ulp of the respective
platform's libm, and ranking uses a quantized key (see ``rank_key``) so
cross-platform ulp noise can never flip an exact tie.
"""

from __future__ import annotations

import math

BM25_K1 = 1.2
BM25_B = 0.75
LM_DIR_MU = 2500
LM_MIN_TF = 0.1
LM_JM_LAMBDA = 0.4
MIN_LM_SCORE = 1e-10

# ranking-key quantum: scores are compared at 1e-9 granularity (BASELINE
# tolerance is 1e-6; platform ulp noise is ~1e-13), ties broken by doc_id asc.
RANK_QUANTUM = 1e9


def rank_key(score: float) -> int:
    return math.floor(score * RANK_QUANTUM)


class OracleScorer:
    """Per (query, doc, field) scorer over aligned term vectors.

    Vectors are aligned to the query's DISTINCT terms in first-occurrence
    order, exactly like the reference's ``set_from_raw``
    (retrieval_model.py:117-154).
    """

    def __init__(
        self,
        h_q_terms: dict[str, int],
        h_doc_terms: dict[str, int],
        h_df: dict[str, float] | None = None,
        total_df: float | None = None,
        avg_doc_len: float | None = None,
    ):
        h_df = h_df or {}
        l_q_terms = list(h_q_terms.keys())
        self.v_q_tf = [float(h_q_terms[t]) for t in l_q_terms]
        self.doc_len = float(sum(h_doc_terms.values()))
        self.total_df = float(total_df) if total_df else 0.0
        self.avg_doc_len = float(avg_doc_len) if avg_doc_len else 0.0
        self.v_q_df = [float(h_df.get(t, 0.0)) for t in l_q_terms]
        self.v_tf = [float(h_doc_terms.get(t, 0)) for t in l_q_terms]

    def bm25(self, k1: float = BM25_K1, b: float = BM25_B) -> float:
        if self.doc_len == 0:
            return 0.0
        score = 0.0
        for tf, df in zip(self.v_tf, self.v_q_df):
            tf_part = tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * self.doc_len / self.avg_doc_len)
            )
            ratio = max((self.total_df - df + 0.5) / (df + 0.5), 1.0)
            idf = max(math.log(ratio), 0.0)
            score += ratio * (tf_part * idf)
        score = max(score, 1.0)
        return math.log(score)

    def lm(self) -> float:
        if self.doc_len == 0:
            return math.log(MIN_LM_SCORE)
        score = 0.0
        for tf, q_tf in zip(self.v_tf, self.v_q_tf):
            v = max(max(tf, LM_MIN_TF) / self.doc_len, MIN_LM_SCORE)
            score += math.log(v) * q_tf
        return score

    def lm_dir(self, mu: float = LM_DIR_MU) -> float:
        if self.doc_len == 0:
            return math.log(MIN_LM_SCORE)
        sum_q = sum(self.v_q_tf)
        score = 0.0
        for tf, df, q_tf in zip(self.v_tf, self.v_q_df, self.v_q_tf):
            v = (tf + mu * (df / self.total_df)) / (self.doc_len + mu)
            v = max(v, MIN_LM_SCORE)
            score += math.log(v) * (q_tf / sum_q)
        return score + 20

    def lm_jm(self, lam: float = LM_JM_LAMBDA) -> float:
        if self.doc_len == 0:
            return math.log(MIN_LM_SCORE)
        score = 0.0
        for tf, df, q_tf in zip(self.v_tf, self.v_q_df, self.v_q_tf):
            v = tf / self.doc_len * (1 - lam) + lam * df / self.total_df
            v = max(v, MIN_LM_SCORE)
            score += math.log(v) * q_tf
        return score + 20

    def lm_twoway(self, mu: float = LM_DIR_MU, lam: float = LM_JM_LAMBDA) -> float:
        if self.doc_len == 0:
            return math.log(MIN_LM_SCORE)
        score = 0.0
        for tf, df, q_tf in zip(self.v_tf, self.v_q_df, self.v_q_tf):
            v = (tf + mu * (df / self.total_df)) / (self.doc_len + mu)
            v = v * (1 - lam) + lam * df / self.total_df
            v = max(v, MIN_LM_SCORE)
            score += math.log(v) * q_tf
        return score + 20

    def coordinate(self) -> int:
        return sum(1 for tf in self.v_tf if tf > 0)

    def bool_and(self) -> int:
        return 1 if self.coordinate() == len(self.v_q_tf) else 0

    def bool_or(self) -> int:
        return min(1, self.coordinate())

    def tf_idf(self) -> float:
        if self.doc_len == 0:
            return 0.0
        score = 0.0
        for tf, df in zip(self.v_tf, self.v_q_df):
            score += math.log(1 + self.total_df / max(df, 1.0)) * (tf / self.doc_len)
        return score

    def tf(self) -> float:
        if self.doc_len == 0:
            return 0.0
        return sum(tf / self.doc_len for tf in self.v_tf)

    def cosine(self) -> float:
        """duet_feature/base.py:215-226 — scipy cosine DISTANCE (1 - sim) of
        the q-normalized vs doc-normalized aligned vectors; doc_len==0,
        all-zero tf, or NaN -> 0.  Quirk: a distance, not a similarity."""
        if self.doc_len == 0:
            return 0.0
        if sum(self.v_tf) == 0:
            return 0.0
        sum_q = sum(self.v_q_tf)
        dot = 0.0
        nq = 0.0
        nd = 0.0
        for q_tf, tf in zip(self.v_q_tf, self.v_tf):
            vq = q_tf / sum_q
            vd = tf / self.doc_len
            dot += vq * vd
            nq += vq * vq
            nd += vd * vd
        denom = math.sqrt(nq) * math.sqrt(nd)
        if denom == 0:
            return 0.0
        return 1.0 - dot / denom

    def all_scores(self) -> dict[str, float]:
        """Reference ``all_scores`` name set (retrieval_model.py:171-194)."""
        return {
            "lm": self.lm(),
            "lm_dir": self.lm_dir(),
            "lm_jm": self.lm_jm(),
            "lm_twoway": self.lm_twoway(),
            "bm25": self.bm25(),
            "coordinate": float(self.coordinate()),
            "tf_idf": self.tf_idf(),
            "bool_and": float(self.bool_and()),
            "bool_or": float(self.bool_or()),
        }
