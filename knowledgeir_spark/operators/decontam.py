"""Train/eval cross-corpus decontamination.

Not in the reference (it assumes clean TREC pools) but a first-class
requirement for the 10^12-doc training-data workload: before training, any
evaluation set's k-gram shingles must be checked against the training
corpus, and overlapping documents dropped or attributed (the standard
"n-gram decontamination" used by major LLM training pipelines; k=8..13
word-grams are the common operating points).

Both operators are pure DataFrame programs over doc_shingles (same
tokenizer and k-gram construction as the dedup suite, so one shingle
definition serves dedup AND decontamination):

- eval_overlap_fractions: per eval doc, what fraction of its distinct
  k-gram shingles occurs ANYWHERE in the training corpus.  This is the
  decontamination decision metric (drop eval docs above a threshold, or —
  run in reverse — drop training docs that leak eval content).
- contamination_pairs: (train_id, eval_id, n_shared) attribution pairs for
  auditing WHICH training docs leak WHICH eval docs.

Scale notes: the overlap join is a single shuffle keyed on the shingle
(train side reduced to DISTINCT shingles first — the join key table, not
the corpus, is what shuffles); `max_train_df` drops boilerplate shingles
shared by more than that many training docs before pairing, which bounds
the pair-join fanout exactly like the dedup suite's stop-shingle cut
(a shingle in 10^6 train docs contributes 10^6 pairs per eval hit and
carries no contamination signal).  Exact DuckDB oracles in parity
(decontam_fractions, decontam_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles


def eval_overlap_fractions(
    train: DataFrame,
    evals: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(eval doc_id, n_shingles, n_overlap, overlap_frac_e6): per eval doc,
    the count of its distinct k-gram shingles, how many occur anywhere in
    `train`, and the contamination fraction floor-quantized at 1e6 (exact
    across engines: integer counts, one multiply-then-divide)."""
    tsh = doc_shingles(train, k=k, text_col=text_col, id_col=id_col) \
        .select("shingle").distinct()
    esh = doc_shingles(evals, k=k, text_col=text_col, id_col=id_col)
    tot = esh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hit = (
        esh.join(tsh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        tot.join(hit, "doc_id", "left")
        .fillna(0, subset=["n_overlap"])
        .select(
            "doc_id", "n_shingles", "n_overlap",
            F.floor(F.lit(1000000) * F.col("n_overlap") / F.col("n_shingles"))
            .cast("long").alias("overlap_frac_e6"),
        )
    )


def contamination_pairs(
    train: DataFrame,
    evals: DataFrame,
    k: int = 8,
    min_shared: int = 1,
    max_train_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(train_id, eval_id, n_shared): attribution pairs — which training
    docs share >= min_shared distinct k-gram shingles with which eval docs.
    max_train_df excludes shingles occurring in more than that many
    training docs before pairing (boilerplate guard; None keeps all)."""
    tsh = doc_shingles(train, k=k, text_col=text_col, id_col=id_col) \
        .withColumnRenamed("doc_id", "train_id")
    if max_train_df is not None:
        ok = (
            tsh.groupBy("shingle")
            .agg(F.count("*").alias("tdf"))
            .filter(F.col("tdf") <= max_train_df)
            .select("shingle")
        )
        tsh = tsh.join(ok, "shingle", "left_semi")
    esh = doc_shingles(evals, k=k, text_col=text_col, id_col=id_col) \
        .withColumnRenamed("doc_id", "eval_id")
    return (
        tsh.join(esh, "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
