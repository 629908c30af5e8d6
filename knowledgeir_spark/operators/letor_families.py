"""Composed LeToR feature families beyond IRFusion (SURVEY.md §2.8; VERDICT
round-1 item 4).  The reference's extractor registry
(/root/reference/knowledge4ir/duet_feature/extractor.py:61-70) wires eight
per-row extractors; the engine re-expresses each as a DataFrame program over
long-form inputs, emitting features LONG-FORM (qid, docno, feature, value)
so families compose by union; `features_to_map` pivots to the
(qid, docno, features map) shape extract.extract_features / sources.svm use.

Input contracts (all long-form DataFrames):
  pairs(qid, doc_id)                         candidate pairs (W2 cutoff done)
  q_ents(qid, e)                             query entity ids (ana.entities[0])
  doc_ents(doc_id, field, e[, weight])       one row per annotation occurrence
  entity_texts(e, e_field, text)             entity descriptions (name/desp)
  entity_emb(e, vector array<float>)         entity embeddings
  doc_terms_df(doc_id, term, tf, doc_len)    engine doc long form

Families:
- les_features           /root/reference/knowledge4ir/duet_feature/matching/les.py:65-106
- esr_bin_features       .../ESR.py:93-244 (weighted sim bins)
- boe_emb_features       .../BoeEmb.py:94-139 (max/mean bins, mean-all, topk)
- q_de_text_features     .../q_de_text.py:84-306 (IndriScores + TopExpTextSim
                         + TopTf, with the A8 -20 top-k padding)
- page_rank_features     .../page_rank.py:50-150 (per-doc entity random walk)

Scale notes: every join against entity_texts/entity_emb is a broadcast of
the (dimension-table-sized) entity side sliced to the entities present;
per-(q,doc) math with genuinely matrix semantics (the random walk) runs in
an Arrow-grouped pandas UDF over doc-local matrices (<= max_e entities);
everything else is exploded long-form + groupBy — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scoring import score_full_vector, score_matched
from .retrieval import completed_frame, matched_frame
from .similarity import cosine_expr

LOG_MIN = 1e-10
PAD_SCORE = -20.0
ALL_MODELS = (
    "lm", "lm_dir", "lm_jm", "lm_twoway", "bm25", "coordinate", "tf_idf",
    "bool_and", "bool_or",
)
_MATCHED = ("bm25", "tf_idf", "coordinate", "bool_or")


def form_bins(nb_bin: int = 6, bin_range: float = 1.0) -> list[float]:
    """duet_feature base _form_bins: descending lower bounds starting at 1;
    an exact-0 bound is nudged to 1e-8 (quirk kept)."""
    bins = [1.0]
    if nb_bin == 1:
        return bins
    size = bin_range / (nb_bin - 1)
    for i in range(nb_bin - 1):
        bound = bins[i] - size
        if bound == 0:
            bound = 0.00000001
        bins.append(bound)
    return bins


def features_to_map(long_feats: DataFrame) -> DataFrame:
    """(qid, docno, feature, value) -> (qid, docno, features map).  Feature
    name collisions within a pair are invalid upstream (asserted by count)."""
    return (
        long_feats.groupBy("qid", "docno")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("feature", "value")))
            ).alias("features")
        )
    )


def _title(s: str) -> str:
    return s.title()


# ---------------------------------------------------------------------------
# Les (les.py:65-106): entity text as the QUERY side, doc text as the doc
# side; average over the query's entities.


def les_features(
    q_ents: DataFrame,
    entity_texts: DataFrame,
    doc_terms_df: DataFrame,
    term_stats_df: DataFrame,
    total_df: float,
    avg_doc_len: float,
    pairs: DataFrame,
    field: str = "bodyText",
    models: tuple[str, ...] = ALL_MODELS,
    prefix: str = "Les",
) -> DataFrame:
    """For each (qid, doc_id) pair and entity field: mean over the query's
    entities (that HAVE that e_field text) of all_scores(e_text_lm as q,
    doc_lm as d) — les.py:65-106.  Doc side tf/doc_len from doc_terms_df;
    entity text tokenized with the clean tokenizer upstream (entity_texts
    arrives long-form: e, e_field, term, tf — see entity_text_terms)."""
    from .retrieval import query_terms

    # (qid, e, e_field) -> pseudo-query id; the e_text LM is the q side.
    # entity lacking an e_field text -> excluded from sum AND cnt (inner
    # join, les.py `continue`); reference divides by cnt = entities scored.
    qe = q_ents.join(
        F.broadcast(entity_texts.select("e", "e_field", "text").distinct()), "e"
    )
    pseudo_q = qe.select(
        F.concat_ws("\x01", "qid", "e", "e_field").alias("qid"),
        F.col("text").alias("query"),
    )
    # q side: the reference uses text2lm(e_text, clean=True) for the entity
    # text even on the query side of set_from_raw, but the engine's
    # query_terms uses raw whitespace tokenization — pass PRE-CLEANED text
    # in entity_texts (clean tokens re-joined with spaces).
    q = query_terms(pseudo_q)
    # every (q entity with text, candidate doc) is scored — zero-overlap
    # pairs get the smoothed tf=0 scores, exactly like RetrievalModel
    grid = (
        qe.select("qid", "e", "e_field")
        .join(pairs.select("qid", "doc_id"), "qid")
        .select(
            F.concat_ws("\x01", "qid", "e", "e_field").alias("qid"), "doc_id"
        )
    )
    doc_lens = doc_terms_df.select("doc_id", "doc_len").distinct()
    cands = grid.join(doc_lens, "doc_id", "left").select(
        "qid", "doc_id",
        F.coalesce("doc_len", F.lit(0)).cast("long").alias("doc_len"),
    )
    m = matched_frame(q, doc_terms_df, term_stats_df).join(
        grid, ["qid", "doc_id"], "left_semi"
    )
    matched_models = tuple(mm for mm in models if mm in _MATCHED)
    full_models = tuple(mm for mm in models if mm not in _MATCHED)
    scores = cands.select("qid", "doc_id")
    if matched_models:
        ms = score_matched(m, total_df, avg_doc_len, models=matched_models)
        scores = scores.join(ms, ["qid", "doc_id"], "left")
    if full_models:
        comp = completed_frame(m, q, term_stats_df, candidates=cands)
        fs = score_full_vector(comp, total_df, models=full_models)
        scores = scores.join(fs, ["qid", "doc_id"], "left")
    parts = F.split(F.col("qid"), "\x01")
    scored = scores.select(
        parts.getItem(0).alias("qid"),
        parts.getItem(1).alias("e"),
        parts.getItem(2).alias("e_field"),
        "doc_id",
        *[
            (F.coalesce(F.col(m), F.lit(0.0)) if m in matched_models
             else F.col(m)).alias(m)
            for m in models
        ],
    )
    agg = scored.groupBy("qid", "doc_id", "e_field").agg(
        *[F.avg(m).alias(m) for m in models]
    )
    stack_cols = []
    for m in models:
        stack_cols.append(
            F.struct(
                F.concat(
                    F.lit(prefix), F.initcap("e_field"), F.lit(_title(field)),
                    F.lit(m.title()),
                ).alias("feature"),
                F.col(m).cast("double").alias("value"),
            )
        )
    return agg.select(
        "qid",
        F.col("doc_id").cast("string").alias("docno"),
        F.explode(F.array(*stack_cols)).alias("fv"),
    ).select("qid", "docno", F.col("fv.feature").alias("feature"),
             F.col("fv.value").alias("value"))


def entity_text_terms(entity_texts: DataFrame) -> DataFrame:
    """(e, e_field, text) -> (e, e_field, term, tf, doc_len) with the CLEAN
    tokenizer (text2lm(clean=True) composition, same as doc side)."""
    from ..functions.text import tokenize_expr

    toks = tokenize_expr(F.lower(F.col("text")))
    base = entity_texts.select(
        "e", "e_field", F.size(toks).alias("doc_len"), F.explode(toks).alias("term")
    )
    return base.groupBy("e", "e_field", "doc_len", "term").agg(
        F.count("*").cast("long").alias("tf")
    ).select("e", "e_field", "term", "tf", "doc_len")


# ---------------------------------------------------------------------------
# ESR (ESR.py:93-244) and BoeEmb (BoeEmb.py:94-139): q-entity x doc-entity
# cosine matrix -> per-doc-entity max/mean over the q axis -> descending
# similarity bins (first bin whose lower bound <= sim), weighted (ESR) or
# counted (BoeEmb), then log / norm_tf.


def _entity_sims(
    pairs: DataFrame,
    q_ents: DataFrame,
    doc_ents: DataFrame,
    entity_emb: DataFrame,
    weight_col: str | None,
) -> DataFrame:
    """(qid, doc_id, field, d_idx, weight, sim_max, sim_mean) — one row per
    doc-entity OCCURRENCE (duplicates are separate matrix columns in the
    reference), with max/mean over the query-entity axis.  OOV entities on
    either side drop out (``if e in emb_model``)."""
    qv = q_ents.join(
        F.broadcast(entity_emb.select("e", F.col("vector").alias("_qv"))), "e"
    ).select("qid", F.col("e").alias("q_e"), "_qv")
    w = Window.partitionBy("doc_id", "field").orderBy(F.monotonically_increasing_id())
    de = doc_ents.withColumn("d_idx", F.row_number().over(w)).join(
        F.broadcast(entity_emb.select("e", F.col("vector").alias("_dv"))), "e"
    )
    if weight_col is None:
        de = de.withColumn("_w", F.lit(1.0))
    else:
        de = de.withColumn("_w", F.col(weight_col).cast("double"))
    grid = (
        pairs.join(qv, "qid")
        .join(de.select("doc_id", "field", "d_idx", "e", "_dv", "_w"), "doc_id")
    )
    # identical vectors (same entity, or distinct entities sharing an
    # embedding row) have cosine exactly 1 by definition; computing it
    # numerically lands an ulp around 1.0 and flips the `sim >= 1` bin —
    # the short-circuit makes bin_0 ("exact match") deterministic
    simmed = grid.withColumn(
        "sim",
        F.when(F.col("_qv") == F.col("_dv"), F.lit(1.0)).otherwise(
            cosine_expr(F.col("_qv"), F.col("_dv"))
        ),
    )
    return simmed.groupBy("qid", "doc_id", "field", "d_idx").agg(
        F.max("sim").alias("sim_max"),
        F.avg("sim").alias("sim_mean"),
        F.first("_w").alias("weight"),
    )


def _bin_expr(sim, bins: list[float]):
    """Index of the FIRST (descending) bin whose lower bound <= sim; -1 when
    below every bin (uncounted, reference `break` semantics)."""
    expr = F.lit(-1)
    for i in range(len(bins) - 1, -1, -1):
        expr = F.when(sim >= F.lit(bins[i]), F.lit(i)).otherwise(expr)
    return expr


def entity_sim_bin_features(
    pairs: DataFrame,
    q_ents: DataFrame,
    doc_ents: DataFrame,
    entity_emb: DataFrame,
    bins: list[float] | None = None,
    bin_func: str = "log",
    pools: tuple[str, ...] = ("max", "mean"),
    weight_col: str | None = None,
    prefix: str = "ESR",
    bin_name_fmt: str = "Bin_%03d",
    log_min: float = LOG_MIN,
) -> DataFrame:
    """Shared ESR/BoeEmb core.  Long-form features per candidate pair; every
    (pair, field, pool, bin) gets a row even at count 0 (log(max(0,1e-10)))
    — fields are those present in doc_ents for the doc."""
    bins = bins if bins is not None else form_bins(6, 1.0)
    sims = _entity_sims(pairs, q_ents, doc_ents, entity_emb, weight_col)
    out_parts = []
    for pool in pools:
        col = {"max": "sim_max", "mean": "sim_mean"}[pool]
        binned = sims.select(
            "qid", "doc_id", "field", "weight", _bin_expr(F.col(col), bins).alias("b")
        ).filter(F.col("b") >= 0)
        counts = binned.groupBy("qid", "doc_id", "field", "b").agg(
            F.sum("weight").alias("cnt")
        )
        # densify: all bins per (pair, field) seen in doc_ents
        pf = sims.select("qid", "doc_id", "field").distinct()
        template = pf.crossJoin(
            F.broadcast(
                pairs.sparkSession.createDataFrame(
                    [(i,) for i in range(len(bins))], "b int"
                )
            )
        )
        dense = template.join(counts, ["qid", "doc_id", "field", "b"], "left").select(
            "qid", "doc_id", "field", "b",
            F.coalesce("cnt", F.lit(0.0)).alias("cnt"),
        )
        if bin_func == "log":
            val = F.log(F.greatest(F.col("cnt"), F.lit(log_min)))
        elif bin_func == "norm_tf":
            z = F.sum("cnt").over(Window.partitionBy("qid", "doc_id", "field"))
            val = F.when(z > 0, F.col("cnt") / z).otherwise(F.col("cnt"))
        else:
            val = F.col("cnt")
        name = F.concat(
            F.lit(prefix + "_"), F.initcap("field"), F.lit("_" + pool.title()),
            F.format_string(bin_name_fmt.replace("%03d", "%03d"), F.col("b"))
            if "%03d" in bin_name_fmt
            else F.format_string(bin_name_fmt, F.col("b")),
        )
        out_parts.append(
            dense.select(
                "qid", F.col("doc_id").cast("string").alias("docno"),
                name.alias("feature"), val.cast("double").alias("value"),
            )
        )
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out


def esr_bin_features(*args, **kwargs) -> DataFrame:
    """ESR.py:93 flavor: weighted bins (use_entity_weight), 'Bin_%03d'."""
    kwargs.setdefault("prefix", "ESR")
    kwargs.setdefault("bin_name_fmt", "Bin_%03d")
    return entity_sim_bin_features(*args, **kwargs)


def boe_emb_features(*args, **kwargs) -> DataFrame:
    """BoeEmb.py:94 flavor: unweighted counts, 'Bin_%d' names."""
    kwargs.setdefault("prefix", "BoeEmb")
    kwargs.setdefault("bin_name_fmt", "Bin_%d")
    kwargs.setdefault("weight_col", None)
    return entity_sim_bin_features(*args, **kwargs)


def boe_emb_extra_pools(
    pairs: DataFrame,
    q_ents: DataFrame,
    doc_ents: DataFrame,
    entity_emb: DataFrame,
    top_k: int = 3,
    prefix: str = "BoeEmb",
) -> DataFrame:
    """BoeEmb 'mean-all' (mean of the full matrix, 0 when empty) and 'topk'
    (k largest matrix cells, 0-padded) pools — BoeEmb.py:262-289."""
    qv = q_ents.join(
        F.broadcast(entity_emb.select("e", F.col("vector").alias("_qv"))), "e"
    ).select("qid", "_qv")
    de = doc_ents.join(
        F.broadcast(entity_emb.select("e", F.col("vector").alias("_dv"))), "e"
    ).select("doc_id", "field", "_dv")
    cells = (
        pairs.join(qv, "qid").join(de, "doc_id")
        .withColumn("sim", cosine_expr(F.col("_qv"), F.col("_dv")))
    )
    agg = cells.groupBy("qid", "doc_id", "field").agg(
        F.avg("sim").alias("_meanall"),
        F.slice(F.reverse(F.array_sort(F.collect_list("sim"))), 1, top_k).alias("_top"),
    )
    rows = [
        F.struct(
            F.concat(F.lit(prefix + "_"), F.initcap("field"),
                     F.lit("_Meanall")).alias("feature"),
            F.col("_meanall").cast("double").alias("value"),
        )
    ]
    for i in range(top_k):
        rows.append(
            F.struct(
                F.concat(
                    F.lit(prefix + "_"), F.initcap("field"),
                    F.lit(f"_Top_{i}".title()),
                ).alias("feature"),
                F.coalesce(
                    F.try_element_at("_top", F.lit(i + 1)), F.lit(0.0)
                ).cast("double").alias("value"),
            )
        )
    return agg.select(
        "qid", F.col("doc_id").cast("string").alias("docno"),
        F.explode(F.array(*rows)).alias("fv"),
    ).select("qid", "docno", F.col("fv.feature").alias("feature"),
             F.col("fv.value").alias("value"))


# ---------------------------------------------------------------------------
# PageRank (page_rank.py:50-150): per (doc, field) random walk over the
# doc-entity cosine matrix; features = mean/max PR of the query's entities.


def page_rank_features(
    pairs: DataFrame,
    q_ents: DataFrame,
    doc_ents: DataFrame,
    entity_emb: DataFrame,
    steps: tuple[int, ...] = (1, 5, 20),
    max_e_per_d: int = 1000,
    init_with_freq: bool = True,
    prefix: str = "PageRank",
    fields: tuple[str, ...] = ("bodyText",),
) -> DataFrame:
    """Arrow-grouped per-(doc, field) random walk.  The matrix is doc-local
    (<= max_e_per_d distinct entities after the tf cut), so each group is a
    tiny numpy problem; embeddings for the doc's entities ride along via a
    pre-join (no driver-side model object).  Deviation from the reference:
    the tf cut breaks tf ties by entity id asc (Python 2.7 dict order was
    unspecified).  PR of a query entity absent from the doc = 0; no query
    entities (in-emb) -> mean = max = 0 (reference `if l_q_pr` fallback)."""
    spark = pairs.sparkSession
    emb = entity_emb.select("e", "vector")
    de = (
        doc_ents.join(
            F.broadcast(
                doc_ents.select("e").distinct().join(emb, "e").select("e")
            ),
            "e",
            "left_semi",
        )
        .groupBy("doc_id", "field", "e")
        .agg(F.count("*").alias("tf"))
        .join(emb, "e")
    )
    qe = q_ents.join(emb.select("e"), "e", "left_semi").groupBy("qid").agg(
        F.collect_set("e").alias("q_es")
    )
    fields_df = F.broadcast(
        spark.createDataFrame([(f,) for f in fields], "field string")
    )
    grid = (
        pairs.crossJoin(fields_df)
        .join(qe, "qid", "left")
        .join(
            de.groupBy("doc_id", "field").agg(
                F.collect_list(F.struct("e", "tf", "vector")).alias("ents")
            ),
            ["doc_id", "field"],
            "left",
        )
    )

    steps_t = tuple(steps)
    out_cols = ["qid string", "docno string"]
    for s in steps_t:
        out_cols.append(f"S{s}_mean double")
        out_cols.append(f"S{s}_max double")
    schema = ", ".join(out_cols)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.itertuples():
            q_es = list(r.q_es) if r.q_es is not None else []
            ents = list(r.ents) if r.ents is not None else []
            feats = {}
            if ents:
                # tf cut: top max_e by (-tf, e asc), weights tf/z
                ents.sort(key=lambda x: (-x["tf"], x["e"]))
                ents = ents[:max_e_per_d]
                l_e = [x["e"] for x in ents]
                tfs = np.array([float(x["tf"]) for x in ents])
                w = tfs / tfs.sum()
                vecs = np.array([np.asarray(x["vector"], dtype=np.float64)
                                 for x in ents])
                norms = np.linalg.norm(vecs, axis=1)
                norms[norms == 0] = 1.0
                unit = vecs / norms[:, None]
                sim = unit @ unit.T
                np.fill_diagonal(sim, 1.0)
                sim = np.maximum(sim, 0.0)
                colsum = sim.sum(axis=0)
                colsum[colsum == 0] = 1.0
                sim = sim / colsum  # column-stochastic (ref /= sum(axis=0))
                v_init = w if init_with_freq else np.ones_like(w)
                pos = {e: i for i, e in enumerate(l_e)}
                res = np.array(v_init)
                done = 0
                for s in sorted(steps_t):
                    for _ in range(s - done):
                        res = (sim * res).sum(axis=1)
                    done = s
                    q_pr = [float(res[pos[q]]) if q in pos else 0.0
                            for q in q_es]
                    if q_pr:
                        feats[s] = (float(np.mean(q_pr)), float(np.max(q_pr)))
                    else:
                        feats[s] = (0.0, 0.0)
            row = {"qid": r.qid, "docno": str(r.doc_id)}
            for s in steps_t:
                m, mx = feats.get(s, (0.0, 0.0))
                row[f"S{s}_mean"] = m
                row[f"S{s}_max"] = mx
            rows.append(row)
        return pd.DataFrame(rows, columns=[c.split(" ")[0] for c in out_cols])

    # one input row per (qid, doc_id, field) after the collect_list, so a
    # row-wise mapInPandas suffices (each row is an independent matrix)
    wide = grid.select("qid", "doc_id", "field", "q_es", "ents").mapInPandas(
        lambda it: (
            run(pdf).assign(field=pdf["field"].values) for pdf in it if len(pdf)
        ),
        schema + ", field string",
    )
    stack = []
    for s in steps_t:
        for kind in ("mean", "max"):
            stack.append(
                F.struct(
                    F.concat(
                        F.lit(prefix + "_"), F.col("field"),
                        F.lit(f"_S{s}_{kind}"),
                    ).alias("feature"),
                    F.col(f"S{s}_{kind}").cast("double").alias("value"),
                )
            )
    return wide.select(
        "qid", "docno", F.explode(F.array(*stack)).alias("fv")
    ).select("qid", "docno", F.col("fv.feature").alias("feature"),
             F.col("fv.value").alias("value"))


# ---------------------------------------------------------------------------
# QDocEText (q_de_text.py:84-306): query vs the texts of the DOC's entities.


def q_de_text_features(
    queries_df: DataFrame,
    pairs: DataFrame,
    doc_ents: DataFrame,
    body_anno: DataFrame,
    e_text_terms: DataFrame,
    term_stats_df: DataFrame,
    total_df: float,
    avg_doc_len: float,
    field: str = "bodyText",
    e_fields: tuple[str, ...] = ("name", "desp"),
    models: tuple[str, ...] = ALL_MODELS,
    top_k: int = 3,
    prefix: str = "QDocEText",
) -> DataFrame:
    """The three q_de_text feature groups as one DataFrame program:

    - IndriScores (q_de_text.py:217-254): per (pair, doc field): all
      retrieval scores of query vs EVERY doc entity's e_field text (empty
      text scored too, doc_len=0 semantics), pooled Max / Wsum(e_tf) /
      Top-k(-20 pad) per key = e_field.title()+sim.title().
    - TopExpTextSim (:161-188): per e_field, the doc's top-k entities by
      lm(query, e_field text) (nonempty texts only) form an expanded
      pseudo-document; all scores of query vs it, with the reference's
      hard-coded avg_doc_len=100.0 quirk.
    - TopTf (:127-159): the same top-k entities' tf and annotation-score
      sums in the doc's BODY annotations, 0-based Top%dTf / Top%dAnaTf.

    Deviation (documented): top-k and pool ties break by entity id asc —
    the reference inherits Python 2.7 dict iteration order.
    body_anno: (doc_id, e, score) one row per body annotation occurrence.
    e_text_terms: entity_text_terms() output.
    """
    from .retrieval import query_terms

    q = query_terms(queries_df)
    spark = queries_df.sparkSession

    # ---- entities per candidate pair (from the doc field's annotations)
    e_tf = doc_ents.filter(F.col("field") == field).groupBy("doc_id", "e").agg(
        F.count("*").cast("double").alias("e_tf")
    )
    cand_e = pairs.join(e_tf, "doc_id")  # (qid, doc_id, e, e_tf)

    # ---- all-model scores of query vs each DISTINCT (qid, e, e_field),
    # completed so empty/missing texts score through the doc_len=0 path
    qe_keys = (
        cand_e.select("qid", "e").distinct()
        .crossJoin(F.broadcast(spark.createDataFrame(
            [(ef,) for ef in e_fields], "e_field string"
        )))
    )
    side = e_text_terms.select(
        F.concat_ws("\x01", "e", "e_field").alias("doc_id"), "term", "tf", "doc_len"
    )
    m = matched_frame(q, side, term_stats_df)
    # keep only this query's (e, e_field) rows
    m = m.withColumn("_k", F.concat_ws("\x01", "qid", "doc_id")).join(
        qe_keys.select(
            F.concat_ws(
                "\x01", "qid", F.concat_ws("\x01", "e", "e_field")
            ).alias("_k")
        ),
        "_k",
        "left_semi",
    ).drop("_k")
    cands = qe_keys.join(
        e_text_terms.select(
            "e", "e_field", F.col("doc_len").alias("_dl")
        ).distinct(),
        ["e", "e_field"],
        "left",
    ).select(
        "qid",
        F.concat_ws("\x01", "e", "e_field").alias("doc_id"),
        F.coalesce("_dl", F.lit(0)).cast("long").alias("doc_len"),
    )
    matched_models = tuple(mm for mm in models if mm in _MATCHED)
    full_models = tuple(mm for mm in models if mm not in _MATCHED)
    scores = cands.select("qid", "doc_id")
    if matched_models:
        ms = score_matched(m, total_df, avg_doc_len, models=matched_models)
        scores = scores.join(ms, ["qid", "doc_id"], "left")
    if full_models:
        comp = completed_frame(m, q, term_stats_df, candidates=cands)
        fs = score_full_vector(comp, total_df, models=full_models)
        scores = scores.join(fs, ["qid", "doc_id"], "left")
    parts = F.split("doc_id", "\x01")
    ent_scores = scores.select(
        "qid", parts.getItem(0).alias("e"), parts.getItem(1).alias("e_field"),
        *[F.coalesce(F.col(mm), F.lit(0.0)).alias(mm) for mm in matched_models],
        *[F.col(mm) for mm in full_models],
    )

    # ---- IndriScores pools
    per_ent = cand_e.join(ent_scores, ["qid", "e"])  # x e_field
    z = F.sum("e_tf").over(Window.partitionBy("qid", "doc_id", "e_field"))
    pooled_parts = []
    for mm in models:
        key = F.concat(F.initcap("e_field"), F.lit(mm.title()))
        base = per_ent.select(
            "qid", "doc_id", "e_field", "e", "e_tf",
            key.alias("_key"), F.col(mm).cast("double").alias("_v"),
            (F.col(mm) * F.col("e_tf") / z).alias("_wv"),
        )
        g = base.groupBy("qid", "doc_id", "_key").agg(
            F.max("_v").alias("_max"),
            F.sum("_wv").alias("_wsum"),
            F.slice(
                F.reverse(F.array_sort(F.collect_list("_v"))), 1, top_k
            ).alias("_top"),
        )
        rows = [
            F.struct(F.concat(F.lit("Max"), "_key").alias("feature"),
                     F.col("_max").alias("value")),
            F.struct(F.concat(F.lit("Wsum"), "_key").alias("feature"),
                     F.col("_wsum").alias("value")),
        ]
        for i in range(top_k):
            rows.append(
                F.struct(
                    F.concat(F.col("_key"), F.lit(f"Top{i + 1}")).alias("feature"),
                    F.coalesce(
                        F.try_element_at("_top", F.lit(i + 1)), F.lit(PAD_SCORE)
                    ).alias("value"),
                )
            )
        pooled_parts.append(
            g.select("qid", "doc_id", F.explode(F.array(*rows)).alias("fv"))
        )
    pooled = pooled_parts[0]
    for p in pooled_parts[1:]:
        pooled = pooled.unionByName(p)
    indri = pooled.select(
        "qid", F.col("doc_id").cast("string").alias("docno"),
        F.concat(F.lit(prefix + _title(field)), F.col("fv.feature")).alias("feature"),
        F.col("fv.value").cast("double").alias("value"),
    )

    # ---- top-k similar entities per (pair, e_field) by lm(q, e_text),
    # nonempty texts only; tie-break (lm desc, e asc)
    lm_scores = ent_scores.join(
        e_text_terms.select("e", "e_field").distinct(), ["e", "e_field"], "left_semi"
    ).select("qid", "e", "e_field", F.col("lm").alias("_lm"))
    ranked = (
        cand_e.select("qid", "doc_id", "e")
        .join(lm_scores, ["qid", "e"])
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("qid", "doc_id", "e_field").orderBy(
                    F.col("_lm").desc(), F.col("e").asc()
                )
            ),
        )
        .filter(F.col("_r") <= top_k)
    )

    # ---- TopTf: body tf + annotation-score sums of the top-k entities
    body_lm = body_anno.groupBy("doc_id", "e").agg(
        F.count("*").cast("double").alias("_btf"),
        F.sum(F.col("score").cast("double")).alias("_bana"),
    )
    toptf = ranked.join(body_lm, ["doc_id", "e"], "left").select(
        "qid", F.col("doc_id").cast("string").alias("docno"), "e_field", "_r",
        F.coalesce("_btf", F.lit(0.0)).alias("_btf"),
        F.coalesce("_bana", F.lit(0.0)).alias("_bana"),
    )
    toptf_rows = toptf.select(
        "qid", "docno",
        F.explode(
            F.array(
                F.struct(
                    F.concat(F.lit(prefix), "e_field",
                             F.format_string("Top%dTf", F.col("_r") - 1)
                             ).alias("feature"),
                    F.col("_btf").alias("value"),
                ),
                F.struct(
                    F.concat(F.lit(prefix), "e_field",
                             F.format_string("Top%dAnaTf", F.col("_r") - 1)
                             ).alias("feature"),
                    F.col("_bana").alias("value"),
                ),
            )
        ).alias("fv"),
    ).select("qid", "docno", F.col("fv.feature").alias("feature"),
             F.col("fv.value").cast("double").alias("value"))

    # ---- TopExpTextSim: expanded pseudo-doc from the top-k entities' texts
    exp_terms = (
        ranked.join(e_text_terms, ["e", "e_field"])
        .groupBy("qid", "doc_id", "e_field", "term")
        .agg(F.sum("tf").alias("tf"))
    )
    exp_len = (
        ranked.join(
            e_text_terms.select("e", "e_field", "doc_len").distinct(),
            ["e", "e_field"],
        )
        .groupBy("qid", "doc_id", "e_field")
        .agg(F.sum("doc_len").alias("doc_len"))
    )
    exp_side = exp_terms.join(exp_len, ["qid", "doc_id", "e_field"]).select(
        F.concat_ws("\x01", "qid", "doc_id", "e_field").alias("_pid"),
        "term", "tf", "doc_len",
    )
    exp_cands = (
        pairs.crossJoin(F.broadcast(spark.createDataFrame(
            [(ef,) for ef in e_fields], "e_field string"
        )))
        .join(exp_len, ["qid", "doc_id", "e_field"], "left")
        .select(
            "qid",
            F.concat_ws("\x01", "qid", "doc_id", "e_field").alias("doc_id"),
            F.coalesce("doc_len", F.lit(0)).cast("long").alias("doc_len"),
        )
    )
    m2 = matched_frame(
        q, exp_side.withColumnRenamed("_pid", "doc_id"), term_stats_df
    ).filter(F.split("doc_id", "\x01").getItem(0) == F.col("qid"))
    exp_scores = exp_cands.select("qid", "doc_id")
    if matched_models:
        # reference quirk: avg_doc_len hard-coded to 100.0 here
        ms2 = score_matched(m2, total_df, 100.0, models=matched_models)
        exp_scores = exp_scores.join(ms2, ["qid", "doc_id"], "left")
    if full_models:
        comp2 = completed_frame(m2, q, term_stats_df, candidates=exp_cands)
        fs2 = score_full_vector(comp2, total_df, models=full_models)
        exp_scores = exp_scores.join(fs2, ["qid", "doc_id"], "left")
    p2 = F.split("doc_id", "\x01")
    exp_rows = []
    for mm in models:
        v = F.coalesce(F.col(mm), F.lit(0.0)) if mm in matched_models else F.col(mm)
        exp_rows.append(
            F.struct(
                F.concat(
                    F.lit(prefix + "Exp"), F.initcap(p2.getItem(2)),
                    F.lit(mm.title()),
                ).alias("feature"),
                v.cast("double").alias("value"),
            )
        )
    expsim = exp_scores.select(
        "qid", p2.getItem(1).alias("docno"),
        F.explode(F.array(*exp_rows)).alias("fv"),
    ).select("qid", "docno", F.col("fv.feature").alias("feature"),
             F.col("fv.value").alias("value"))

    return indri.unionByName(toptf_rows).unionByName(expsim)


# ---------------------------------------------------------------------------
# Pretrain (pre_trained.py:92-220): per-doc-entity pre-trained feature
# vectors (e.g. salience features) -> per-query-entity lookup (default -30
# vector when the query entity is absent from the doc) -> optional
# normalization across the doc's entities -> pooling over query entities.


def _pretrain_norm(m: np.ndarray, norm: str, boe_len: float) -> np.ndarray:
    """pre_trained.py:170-220 normalizers over the (n_entities x dim)
    feature matrix."""
    if norm == "":
        return m
    if norm == "softmax":
        e = np.exp(m)
        return np.log(e / e.sum(axis=0))
    if norm == "minmax":
        mx, mn = m.max(axis=0), m.min(axis=0)
        return (m - mn) / np.maximum(mx - mn, 1e-10)
    if norm == "uniq":
        return m / float(m.shape[0])
    if norm == "expuniq":
        return np.log(np.exp(m) / float(m.shape[0]))
    if norm == "doclen":
        z = np.sum(np.exp(m[:, 0]))
        return np.log(np.exp(m) / float(z))
    if norm == "docuniq":
        z = np.sum(np.exp(m[:, 0]))
        return np.log(np.exp(m) / float(z) / float(m.shape[0]))
    if norm == "boelen":
        return m - np.log(float(boe_len))
    if norm == "log_boelen":
        return m / float(boe_len)
    raise NotImplementedError(norm)


def pretrain_features(
    pairs: DataFrame,
    q_ents: DataFrame,
    doc_ent_feats: DataFrame,
    feature_dim: int = 22,
    feature_field: str = "salience_feature",
    default_value: float = -30.0,
    norms: tuple[str, ...] = ("",),
    pools: tuple[str, ...] = ("sum",),
    fields: tuple[str, ...] = ("bodyText",),
    prefix: str = "Pretrain",
) -> DataFrame:
    """pre_trained.py:92-160 as an Arrow-grouped DataFrame op.

    doc_ent_feats: (doc_id, field, e, features array<double>) — one row per
    annotated entity that HAS the pre-trained vector (reference skips
    feature-less anas at :107-110; a query entity absent from the doc keeps
    the default -30 vector for EVERY norm, quirk preserved).  boe_len for
    the boelen norms counts the field's annotations with features.

    Pools over query entities per feature dim follow utils/base.py:633-675
    verbatim, including log_sum's accumulator quirk (it reads the UNsuffixed
    key, which never exists, so 'LogSum' degenerates to log(max(LAST
    entity's value, e^-30)) — kept, documented).

    Feature names: {prefix}_{field}_{feature_field}{Norm.title()}_{p:03d}_{Pool}.
    """
    spark = pairs.sparkSession
    de = doc_ent_feats.groupBy("doc_id", "field").agg(
        F.collect_list(F.struct("e", "features")).alias("ents")
    )
    qe = q_ents.groupBy("qid").agg(F.collect_list("e").alias("q_es"))
    fields_df = F.broadcast(
        spark.createDataFrame([(f,) for f in fields], "field string")
    )
    grid = (
        pairs.crossJoin(fields_df)
        .join(qe, "qid", "left")
        .join(de, ["doc_id", "field"], "left")
    )
    norms_t, pools_t = tuple(norms), tuple(pools)
    out_names = []
    for norm in norms_t:
        for p in range(feature_dim):
            for pool in pools_t:
                suffix = {"sum": "_Sum", "max": "_Max", "mean": "_Mean",
                          "log_sum": "_LogSum"}[pool]
                out_names.append((norm, p, pool, suffix))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.itertuples():
            q_es = list(r.q_es) if r.q_es is not None else []
            ents = list(r.ents) if r.ents is not None else []
            l_e = [x["e"] for x in ents]
            feats = {}
            if q_es:
                m0 = (
                    np.array([list(x["features"]) for x in ents],
                             dtype=np.float64)
                    if ents else np.zeros((0, feature_dim))
                )
                boe_len = max(float(len(ents)), 1.0)
                # h_q_e_feature persists across norms (reference quirk)
                h_q = {q: np.full(feature_dim, default_value) for q in q_es}
                for norm in norms_t:
                    m = _pretrain_norm(m0, norm, boe_len) if len(m0) else m0
                    lut = {e: m[i] for i, e in enumerate(l_e)}
                    for q in q_es:
                        if q in lut:
                            h_q[q] = lut[q]
                    vecs = [h_q[q] for q in q_es]
                    for p in range(feature_dim):
                        vals = [v[p] for v in vecs]
                        for pool in pools_t:
                            if pool == "sum":
                                x = float(sum(vals))
                            elif pool == "max":
                                x = float(max(vals))
                            elif pool == "mean":
                                x = float(sum(vals) / len(vals))
                            else:  # log_sum quirk: log of the LAST value
                                x = float(np.log(max(vals[-1], np.exp(-30))))
                            feats[(norm, p, pool)] = x
            for norm, p, pool, suffix in out_names:
                name = (
                    f"{prefix}_{r.field}_{feature_field}{norm.title()}"
                    f"_{p:03d}{suffix}"
                )
                rows.append(
                    {"qid": r.qid, "docno": str(r.doc_id), "feature": name,
                     "value": feats.get((norm, p, pool), default_value)}
                )
        return pd.DataFrame(
            rows, columns=["qid", "docno", "feature", "value"]
        )

    return grid.select("qid", "doc_id", "field", "q_es", "ents").mapInPandas(
        lambda it: (run(pdf) for pdf in it if len(pdf)),
        "qid string, docno string, feature string, value double",
    )
