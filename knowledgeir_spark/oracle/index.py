"""Dict-based oracle index: corpus stats, posting lists, brute-force BM25 top-k.

This is the golden model for the Spark engine's index build
(knowledgeir_spark/index/build.py) and query path (index/query.py).

Definitions (engine semantics, SURVEY.md §2.4):
- tf(doc, term): count of term in tokenize_doc(text)
- doc_len(doc): total term count (post stopword removal) — matches the
  reference's doc_len = sum(h_doc_terms.values()) (retrieval_model.py:131)
- df(term): number of DISTINCT docs containing term.  NOTE: the reference's
  stat producers are buggy/inconsistent (prepare_corpus_stat.py:40 never
  increments; collect_corpus_stat.py:34-38 counts occurrences); the engine
  uses the documented/intended DF semantics (SURVEY.md §2.4 A5).
- total_df: number of docs (prepare_corpus_stat.py:44 semantics)
- avg_doc_len: mean doc_len over ALL docs (including empty ones)
"""

from __future__ import annotations

from .retrieval import OracleScorer, rank_key
from .tokenizer import doc_lm, query_lm


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]]):
        """docs: list of (doc_id, text)."""
        self.doc_lms: dict[int, dict[str, int]] = {
            doc_id: doc_lm(text) for doc_id, text in docs
        }
        self.doc_len: dict[int, int] = {
            d: sum(lm.values()) for d, lm in self.doc_lms.items()
        }
        self.postings: dict[str, list[tuple[int, int]]] = {}
        for doc_id in sorted(self.doc_lms):
            for term, tf in self.doc_lms[doc_id].items():
                self.postings.setdefault(term, []).append((doc_id, tf))
        self.df: dict[str, float] = {t: float(len(p)) for t, p in self.postings.items()}
        self.total_df = float(len(self.doc_lms))
        self.avg_doc_len = (
            sum(self.doc_len.values()) / self.total_df if self.total_df else 0.0
        )

    def score_all(self, query: str, model: str = "bm25") -> dict[int, float]:
        """Score every doc that contains >=1 query term."""
        h_q = query_lm(query)
        cand: set[int] = set()
        for t in h_q:
            cand.update(d for d, _ in self.postings.get(t, []))
        out: dict[int, float] = {}
        for d in cand:
            scorer = OracleScorer(
                h_q, self.doc_lms[d], self.df, self.total_df, self.avg_doc_len
            )
            out[d] = getattr(scorer, model)()
        return out

    def topk(self, query: str, k: int = 20, model: str = "bm25") -> list[tuple[int, float]]:
        """Top-k (doc_id, score); rank order = (quantized score desc, doc_id
        asc) — the engine contract (oracle.retrieval.rank_key)."""
        scores = self.score_all(query, model)
        ranked = sorted(scores.items(), key=lambda kv: (-rank_key(kv[1]), kv[0]))
        return ranked[:k]
