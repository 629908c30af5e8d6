"""Duet/embedding feature operators (SURVEY.md §2.8 F15-F17).

- translation_sims: the q-term x doc-term cosine matrix underlying the
  word2vec translation histogram
  (/root/reference/knowledge4ir/duet_feature/matching/word2vec_histogram.py:
  104-179) — long-form (qid, doc_id, q_term, d_term, sim) via TWO broadcast
  joins against the embedding table (OOV terms drop out, like the
  reference's vocab check).
- word2vec_histogram: per (qid, doc_id): mean/max over the q axis, overall
  mean, plus the A13 log-binned counts (functions/textsim.bin_similarity).
- pool_sim_bins: the embedding-vote pooling of utils/boe.py:44-65 —
  max/mean(+weights) and the four FIXED bins [==1, 0.75-1), [0.5,0.75),
  [0.25,0.5) — note sim<0.25 falls in NO bin and sim==1 also not in bin_1
  (quirks kept).
- surface_ambiguity: cmns entropy + top-diff per annotation
  (utils/boe.py:102-117; entropy of the UNNORMALIZED cmns list via
  scipy-stats semantics: normalize then -sum(p ln p)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_expr


def translation_sims(
    pairs: DataFrame,
    embeddings: DataFrame,
    q_term_col: str = "q_term",
    d_term_col: str = "d_term",
    token_col: str = "token",
    vec_col: str = "vector",
) -> DataFrame:
    """pairs: (qid, doc_id, q_term, d_term) -> + sim (cosine of embeddings).
    Rows whose q_term or d_term is OOV are dropped (reference checks
    ``if t in word2vec``)."""
    qe = embeddings.select(
        F.col(token_col).alias(q_term_col), F.col(vec_col).alias("_qv")
    )
    de = embeddings.select(
        F.col(token_col).alias(d_term_col), F.col(vec_col).alias("_dv")
    )
    return (
        pairs.join(F.broadcast(qe), q_term_col)
        .join(F.broadcast(de), d_term_col)
        .withColumn("sim", cosine_expr(F.col("_qv"), F.col("_dv")))
        .drop("_qv", "_dv")
    )


def word2vec_histogram(
    sims: DataFrame,
    nb_bin: int = 5,
    group_cols: tuple[str, str] = ("qid", "doc_id"),
) -> DataFrame:
    """Per (qid, doc_id): Mean/Max pooled over each q_term then averaged
    (the reference pools per-q-term rows), overall mean, and log bins."""
    from ..functions.textsim import bin_similarity

    g = list(group_cols)
    per_q_term = sims.groupBy(*g, "q_term").agg(
        F.max("sim").alias("_qmax"), F.avg("sim").alias("_qmean")
    )
    pooled = per_q_term.groupBy(*g).agg(
        F.avg("_qmax").alias("sim_MaxPool"),
        F.avg("_qmean").alias("sim_MeanPool"),
    )
    overall = sims.groupBy(*g).agg(F.avg("sim").alias("sim_MeanAll"))
    bins = bin_similarity(sims, g, "sim", nb_bin=nb_bin, bin_func="log")
    return pooled.join(overall, g).join(bins, g)


def pool_sim_bins(
    sims: DataFrame,
    group_cols: list[str],
    sim_col: str = "sim",
    weight_col: str | None = None,
) -> DataFrame:
    """utils/boe.py:44-65 quirks: bin_0 counts sim==1 exactly; bin_1
    [0.75,1); bin_2 [0.5,0.75); bin_3 [0.25,0.5); below 0.25 uncounted;
    mean is weight-normalized; empty group handled upstream (no row)."""
    s = F.col(sim_col)
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    return sims.groupBy(*group_cols).agg(
        F.max(s).alias("max_sim"),
        (F.sum(s * w) / F.sum(w)).alias("mean_sim"),
        F.sum(F.when(s == 1.0, w).otherwise(F.lit(0.0))).alias("bin_0"),
        F.sum(F.when((s >= 0.75) & (s < 1.0), w).otherwise(F.lit(0.0))).alias("bin_1"),
        F.sum(F.when((s >= 0.5) & (s < 0.75), w).otherwise(F.lit(0.0))).alias("bin_2"),
        F.sum(F.when((s >= 0.25) & (s < 0.5), w).otherwise(F.lit(0.0))).alias("bin_3"),
    )


def surface_ambiguity(annotations: DataFrame, ent_col: str = "entities") -> DataFrame:
    """Per annotation row: cmns_entropy (scipy.stats.entropy semantics —
    normalize the cmns list, -sum(p ln p), zero probs skipped) and
    cmns_topdiff (top1 - top2, missing second -> top1 - 0).
    Input rows carry an array<struct<id,cmns>> column."""
    cmns = F.transform(F.col(ent_col), lambda e: e["cmns"].cast("double"))
    total = F.aggregate(cmns, F.lit(0.0), lambda a, x: a + x)
    probs = F.transform(cmns, lambda x: x / total)
    entropy = -F.aggregate(
        probs,
        F.lit(0.0),
        lambda a, p: a + F.when(p > 0, p * F.log(p)).otherwise(F.lit(0.0)),
    )
    sorted_desc = F.reverse(F.array_sort(cmns))
    top1 = F.coalesce(F.try_element_at(sorted_desc, F.lit(1)), F.lit(0.0))
    top2 = F.coalesce(F.try_element_at(sorted_desc, F.lit(2)), F.lit(0.0))
    return annotations.select(
        "*",
        F.when(total > 0, entropy).otherwise(F.lit(float("inf"))).alias("cmns_entropy"),
        (top1 - top2).alias("cmns_topdiff"),
    )


def surface_stat_features(
    annotations: DataFrame,
    field_texts: DataFrame | None = None,
    surface_stats: DataFrame | None = None,
    field_col: str = "field",
    text_col: str = "text",
    ent_col: str = "entities",
) -> DataFrame:
    """F17 completion (round-1 gap): the remaining per-annotation surface
    features of /root/reference/knowledge4ir/utils/boe.py:77-136 —

    - cmns_prior: the FIRST candidate's cmns (boe.py:77-86 cmns_feature;
      missing/empty candidate list -> 0);
    - sf_coverage: (loc[1]-loc[0]) / len(field_text.split()) (boe.py:117-123;
      raw whitespace split of the RAW field text; empty text raises
      ZeroDivisionError in the reference — engine yields null, documented);
    - sf_len: len(surface) in characters (boe.py:123);
    - sf_lp: wiki link probability from a surface-stat resource, gated on
      wiki tf >= 10 (boe.py:126-135 surface_lp; missing surface -> 0).

    annotations: rows with (id-ish cols, field, surface, loc array<int>,
    entities array<struct<id,cmns>>).  field_texts: (doc_id, field, text)
    for coverage (skipped when None).  surface_stats: (surface, tf, lp)
    broadcast dimension (skipped when None -> sf_lp = 0)."""
    out = annotations.withColumn(
        "cmns_prior",
        F.coalesce(
            F.try_element_at(F.col(ent_col), F.lit(1))["cmns"].cast("double"),
            F.lit(0.0),
        ),
    ).withColumn("sf_len", F.length("surface").cast("long"))
    if field_texts is not None:
        ft = field_texts.select(
            "doc_id", field_col,
            F.size(F.split(F.trim(F.col(text_col)), "\\s+")).alias("_n_toks"),
            (F.length(F.trim(F.col(text_col))) == 0).alias("_empty"),
        )
        out = out.join(ft, ["doc_id", field_col], "left").withColumn(
            "sf_coverage",
            F.when(
                ~F.col("_empty") & (F.col("_n_toks") > 0),
                (
                    F.col("loc").getItem(1) - F.col("loc").getItem(0)
                ).cast("double") / F.col("_n_toks"),
            ),
        ).drop("_n_toks", "_empty")
    if surface_stats is not None:
        ss = surface_stats.select(
            "surface", F.col("tf").alias("_wtf"), F.col("lp").alias("_lp")
        )
        out = out.join(F.broadcast(ss), "surface", "left").withColumn(
            "sf_lp",
            F.when(F.col("_wtf") >= 10, F.col("_lp")).otherwise(F.lit(0.0)),
        ).drop("_wtf", "_lp")
    else:
        out = out.withColumn("sf_lp", F.lit(0.0))
    return out
