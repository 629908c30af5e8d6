"""Sequential-dependence proximity features (ordered / unordered windows).

KnowledgeIR's LeToR stack scores bag-of-words and bag-of-entities fields but
delegates phrase/proximity evidence to its external retrieval engine (Indri
`#1(..)` / `#uw8(..)` operators — the engine KnowledgeIR shells out to,
/root/reference/knowledge4ir/utils/base.py:210-258).  This module brings the
Metzler-Croft sequential-dependence bigram counts in-engine as a pure
DataFrame program:

  n_ordered : for each adjacent query bigram (a, b), the number of token
              positions i with doc[i] = a and doc[i+1] = b  (Indri #1).
  n_uw8     : directional pair count — positions (i, j), i != j,
              |i - j| <= window-1, doc[i] = a, doc[j] = b  (Indri #uw8
              analogue; for a == b each unordered pair counts twice, a
              deliberate, documented simplification mirrored by the oracle).

Positions are 1-based indices over the *non-empty* tokens of the parity
tokenizer (lower + split on [^a-z0-9]+), identical to the minhash shingle
position scheme (parity_ext._minhash_sql tp CTE).

Plan shape / 100 TB notes:
- The (tiny) bigram table is broadcast into the token-position scan — the
  per-term position extraction is map-side, no shuffle.
- The position pair join shuffles on (qid, bigram, doc_id); its size per
  group is tf(a) x tf(b) within ONE document — bounded and skew-free, no
  doc-level cross joins.
- At serving scale this would sit behind the posting index with positional
  postings; the full-scan form here is the feature-extraction (LeToR
  training) path, which is a corpus sweep by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "token_positions",
    "query_bigrams",
    "sdm_bigram_counts",
    "candidate_cut",
    "sdm_rerank",
]


def token_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, pos): 1-based position over non-empty simple tokens."""
    raw = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias(
            "ord", "term"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("ord")
    return (
        raw.where(F.col("term") != "")
        .select("doc_id", "term", F.row_number().over(w).alias("pos"))
    )


def query_bigrams(queries: DataFrame) -> DataFrame:
    """Adjacent-term bigrams (qid, bg_id, term_a, term_b) from a
    (qid, term, pos) query-term table; bg_id is the left term's position."""
    a = queries.select("qid", F.col("pos").alias("bg_id"), F.col("term").alias("term_a"))
    b = queries.select("qid", (F.col("pos") - 1).alias("bg_id"), F.col("term").alias("term_b"))
    return a.join(b, ["qid", "bg_id"])


def sdm_bigram_counts(
    docs: DataFrame,
    queries: DataFrame,
    window: int = 8,
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Per-(qid, doc) sequential-dependence counts (see module docstring).

    Returns (qid, doc_id, n_ordered, n_uw) for documents where at least one
    bigram co-occurs within the window; n_uw uses |i-j| <= window-1.

    `candidates` (any frame with a doc_id column, e.g. a first-pass top-N)
    semi-joins the corpus BEFORE tokenization — the serving-rerank path
    touches depth*|queries| documents, not the corpus.
    """
    if candidates is not None:
        docs = docs.join(
            candidates.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    bg = F.broadcast(query_bigrams(queries))
    tp = token_positions(docs, text_col)
    pa = bg.join(tp, tp["term"] == bg["term_a"]).select(
        "qid", "bg_id", "doc_id", F.col("pos").alias("i")
    )
    pb = bg.join(tp, tp["term"] == bg["term_b"]).select(
        "qid", "bg_id", "doc_id", F.col("pos").alias("j")
    )
    pairs = pa.join(pb, ["qid", "bg_id", "doc_id"]).where(
        (F.col("i") != F.col("j"))
        & (F.abs(F.col("j") - F.col("i")) <= window - 1)
    )
    return pairs.groupBy("qid", "doc_id").agg(
        F.sum((F.col("j") == F.col("i") + 1).cast("long")).alias("n_ordered"),
        F.count("*").alias("n_uw"),
    )


def candidate_cut(scored: DataFrame, depth: int = 100) -> DataFrame:
    """First-pass top-`depth` per query by the quantized rank key."""
    wc = Window.partitionBy("qid").orderBy(
        F.floor(F.col("score") * 1e9).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= depth)
        .drop("crank")
    )


def sdm_rerank(
    scored: DataFrame,
    sdm_counts: DataFrame,
    depth: int = 100,
    k: int = 20,
    w_ordered: float = 0.5,
    w_window: float = 0.3,
) -> DataFrame:
    """Match-then-rerank: blend proximity evidence into a first-pass score.

    `scored` is (qid, doc_id, score) from any retrieval model (full-scan or
    the posting index); `sdm_counts` is sdm_bigram_counts' output.  The
    candidate set is cut to `depth` per query FIRST, so at serving scale
    the proximity join touches depth*|q| rows, not the corpus — the
    standard two-phase serving layout (cheap bag-of-words match, expensive
    positional rerank on the head).

        final = score + w_ordered*ln(1+n_ordered) + w_window*ln(1+n_uw)

    Returns (qid, doc_id, rank, score) for the top-k by the quantized key
    (floor(final*1e9) desc, doc_id asc).
    """
    cand = candidate_cut(scored, depth)
    j = cand.join(sdm_counts, ["qid", "doc_id"], "left").select(
        "qid",
        "doc_id",
        (
            F.col("score")
            + w_ordered * F.log(1 + F.coalesce(F.col("n_ordered"), F.lit(0)))
            + w_window * F.log(1 + F.coalesce(F.col("n_uw"), F.lit(0)))
        ).alias("score"),
    )
    wf = Window.partitionBy("qid").orderBy(
        F.floor(F.col("score") * 1e9).desc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= k)
        .orderBy("qid", "rank")
    )
