"""LeToR feature extraction — the reference's main query-engine entry point
(SURVEY.md §3.2, /root/reference/knowledge4ir/duet_feature/extractor.py:42-234
LeToRFeatureExtractCenter) as one DataFrame program:

  candidates (qid, doc_id[, base_score])      [top-k cutoff applied upstream, W2]
    ⋈ doc_terms ⋈ broadcast(q terms) ⋈ term_stats      [J9]
    → per-(qid, doc_id) ALL retrieval scores as feature columns (F1-F10)
    → left join qrels -> label (default 0)             [J3, extractor.py:170-174]
    → base score feature '0_basescore' (default -25.0) [J4, extractor.py:104-109]

Quirks preserved: the extractor seeds every row with the candidate ranking's
base score under feature name '0_basescore' (so feature_hash puts it first);
missing qrel -> label 0; missing base score -> -25.0.

Output: (qid, docno, label, features map<string,double>) — exactly the shape
sources/svm.write_svm consumes, so the reference's
``extract -> svm file -> RankLib`` flow is: extract_features -> write_svm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scoring import score_full_vector, score_matched
from .retrieval import completed_frame, matched_frame, query_terms

ALL_MODELS_MATCHED = ("bm25", "tf_idf", "coordinate", "bool_or")
ALL_MODELS_FULL = ("lm", "lm_dir", "lm_jm", "lm_twoway", "bool_and", "cosine")
BASE_SCORE_DEFAULT = -25.0  # extractor.py:104-109


def extract_features(
    queries_df: DataFrame,
    candidates_df: DataFrame,
    doc_terms_df: DataFrame,
    term_stats_df: DataFrame,
    total_df: float,
    avg_doc_len: float,
    qrels_df: DataFrame | None = None,
    feature_prefix: str = "ir_",
) -> DataFrame:
    """candidates_df: (qid, doc_id[, base_score]).  Returns
    (qid, docno, label, features map<string,double>)."""
    q = query_terms(queries_df)
    cand = candidates_df.select(
        "qid", "doc_id",
        *( [F.col("base_score")] if "base_score" in candidates_df.columns else [] ),
    )
    # restrict the scoring join to candidate docs (P4 semi-join prefilter)
    dt = doc_terms_df.join(
        F.broadcast(cand.select("doc_id").distinct()), "doc_id", "left_semi"
    )
    m = matched_frame(q, dt, term_stats_df).join(
        F.broadcast(cand.select("qid", "doc_id")), ["qid", "doc_id"], "left_semi"
    )
    matched_scores = score_matched(
        m, total_df, avg_doc_len, models=ALL_MODELS_MATCHED
    )
    # the reference scores EVERY candidate through RetrievalModel with a
    # full tf vector (zero-overlap -> tf=0 everywhere, still smoothed
    # nonzero lm* scores; doc absent from the corpus -> doc_len=0 ->
    # log(1e-10) early return), so the completion runs over ALL candidates,
    # with doc_len joined from the doc-terms side (0 when the doc is empty
    # or unknown)
    doc_lens = dt.select("doc_id", "doc_len").distinct()
    cand_dl = (
        cand.select("qid", "doc_id")
        .join(doc_lens, "doc_id", "left")
        .select(
            "qid", "doc_id",
            F.coalesce(F.col("doc_len"), F.lit(0)).cast("long").alias("doc_len"),
        )
    )
    comp = completed_frame(m, q, term_stats_df, candidates=cand_dl)
    full_scores = score_full_vector(comp, total_df, models=ALL_MODELS_FULL)
    feats = cand.join(matched_scores, ["qid", "doc_id"], "left").join(
        full_scores, ["qid", "doc_id"], "left"
    )
    # matched-only scores for zero-overlap candidates stay at the coalesce
    # default 0.0 — identical to the reference's value on a tf=0 vector
    # (bm25 = log(max(0,1)) = 0, tf_idf/coordinate/bools = 0).
    score_cols = list(ALL_MODELS_MATCHED) + list(ALL_MODELS_FULL)
    pairs = []
    for c in score_cols:
        pairs.append(F.lit(feature_prefix + c))
        pairs.append(F.coalesce(F.col(c).cast("double"), F.lit(0.0)))
    pairs.append(F.lit("0_basescore"))
    if "base_score" in candidates_df.columns:
        pairs.append(
            F.coalesce(F.col("base_score").cast("double"), F.lit(BASE_SCORE_DEFAULT))
        )
    else:
        pairs.append(F.lit(BASE_SCORE_DEFAULT))
    out = feats.select(
        "qid",
        F.col("doc_id").cast("string").alias("docno"),
        F.create_map(*pairs).alias("features"),
    )
    if qrels_df is not None:
        out = out.join(
            qrels_df.select("qid", "docno", "label"), ["qid", "docno"], "left"
        ).select(
            "qid", "docno",
            F.coalesce("label", F.lit(0)).cast("int").alias("label"),
            "features",
        )
    else:
        out = out.select("qid", "docno", F.lit(0).alias("label"), "features")
    return out


def add_family_features(features_df: DataFrame, long_feats: DataFrame) -> DataFrame:
    """Extractor-center composition (extractor.py:61-70 merges each
    registered family's h_feature dict into one map): merge long-form
    family features (qid, docno, feature, value — letor_families output)
    into the (qid, docno, label, features) frame.  Family feature names are
    prefix-disjoint by construction; a collision raises (Spark map_concat
    duplicate-key policy), which is the correct loud failure."""
    from .letor_families import features_to_map

    fam = features_to_map(long_feats).withColumnRenamed("features", "_ff")
    return (
        features_df.join(fam, ["qid", "docno"], "left")
        .select(
            "qid", "docno", "label",
            F.map_concat(
                "features",
                F.coalesce(
                    "_ff", F.create_map().cast("map<string,double>")
                ),
            ).alias("features"),
        )
    )
