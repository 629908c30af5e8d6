"""Driver-contract parity suite: Spark queries + equivalent DuckDB SQL.

Each entry implements one operator family from SURVEY.md §2 over the driver's
read-only testdata (/root/testdata/sf*/).  The Spark callable and the SQL
string MUST produce identical (column names, row count, values) results —
the driver cross-checks them at sf0.01 (CORRECTNESS_r{N}.json).

Determinism rules used throughout (see operators/topk.py docstring):
- float outputs are quantized to integers via floor(x * 10^p) and aliased
  ``*_e{p}`` — integer hash comparison, immune to cross-engine ulp noise;
- every ranking uses the quantized key (floor(score*1e9) desc, id asc);
- the fulltext suite uses the SQL-expressible simple tokenizer
  (lower + split on [^a-z0-9]+), mirrored exactly in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.scoring import (
    bm25_contrib,
    bm25_finalize,
    ordered_sum,
    tf_idf_contrib,
)
from .functions.text import doc_terms_builtin, tokenize_simple_expr
from .operators.topk import RANK_QUANTUM

# ---------------------------------------------------------------------------
# embedded reference-shaped query set over the `documents` testdata vocabulary
# (shape mirrors /root/reference/data/s2/s2.query: short keyword queries,
# incl. an OOV term and a repeated term — see FIXTURES.md §2)
ENTRY_QUERIES: list[tuple[int, str]] = [
    (1, "spark query"),
    (2, "hash join"),
    (3, "window agg stream"),
    (4, "fast sort merge"),
    (5, "the data table"),
    (6, "dup"),
    (7, "customer order line value"),
    (8, "scan zzzoutofvocab"),
    (9, "join join batch"),
    (10, "big slow vector column"),
]

TOPK = 20

# shared DuckDB CTE prelude: simple tokenizer -> tf -> doc_len
_SQL_TOK = """
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tok WHERE term <> '' GROUP BY doc_id, term
),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS doc_len FROM tf GROUP BY doc_id)
"""


def _sql_queries_values() -> str:
    rows = []
    for qid, q in ENTRY_QUERIES:
        for pos, term in enumerate(q.lower().split()):
            rows.append(f"({qid}, '{term}', {pos})")
    return "q_raw(qid, term, pos) AS (VALUES %s)" % ", ".join(rows)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _pin_utc(spark: SparkSession) -> None:
    """Timestamp-rendering queries must agree with DuckDB's UTC-naive
    timestamps regardless of the calling session's timezone."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _doc_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf, doc_len) long-form, simple tokenizer, built-ins only."""
    return doc_terms_builtin(_docs(spark, sf_dir), simple=True)


def _query_terms_df(spark: SparkSession) -> DataFrame:
    """(qid, term, term_idx, q_tf) with DISTINCT-term semantics (first pos)."""
    rows = []
    for qid, q in ENTRY_QUERIES:
        toks = q.lower().split()
        seen: dict[str, list] = {}
        for pos, t in enumerate(toks):
            if t in seen:
                seen[t][1] += 1
            else:
                seen[t] = [pos, 1]
        for t, (pos, cnt) in seen.items():
            rows.append((qid, t, pos, cnt))
    return spark.createDataFrame(rows, "qid long, term string, term_idx long, q_tf long")


# --------------------------------------------------------------------------
# individual parity queries


def q_doc_term_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-doc term frequency (term2lm, nlp.py:47-54) — long form."""
    return _doc_tf(spark, sf_dir).select("doc_id", "term", "tf")


def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: document frequency per term."""
    return _doc_tf(spark, sf_dir).groupBy("term").agg(F.count("*").alias("df"))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: doc count, total/avg doc length (avg quantized e3)."""
    docs = _docs(spark, sf_dir)
    dt = _doc_tf(spark, sf_dir)
    n = docs.count()
    return dt.agg(
        F.lit(n).cast("long").alias("n_docs"),
        F.sum("tf").cast("long").alias("total_len"),
        F.floor(F.sum("tf") * 1000 / F.lit(n)).cast("long").alias("avg_len_e3"),
    )


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/W8: corpus TF, ordered desc with deterministic tie-break."""
    agg = _doc_tf(spark, sf_dir).groupBy("term").agg(F.sum("tf").alias("total_tf"))
    w = Window.orderBy(F.col("total_tf").desc(), F.col("term").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 100)
        .orderBy("rank")
    )


def q_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: distinct terms (vocab) sorted."""
    return _doc_tf(spark, sf_dir).select("term").distinct().orderBy("term")


def _scored_matched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matched frame (qid, doc_id, term_idx, q_tf, tf, doc_len, df) +
    scalars (n, avgdl) for the embedded query set.

    Only the ~25 distinct ENTRY_QUERIES terms ever reach the scorers, so the
    exploded token stream is filtered to that vocabulary BEFORE the tf
    shuffle (project/filter early — spark_optimization_guide §2.3): the
    exchange carries a few thousand matched rows instead of the full
    (doc, term) long form, and the corpus scalars come from one shuffle-free
    scalar aggregate instead of a persisted intermediate.  df per term is a
    window count over the matched frame — count of docs containing the term,
    identical to the full-vocabulary groupBy restricted to query terms.

    The corpus scalars (n, avgdl) ride along as a broadcast 1-row cross
    join instead of a separate collect() action, so the whole ranking is
    ONE Spark job; they are returned as Columns (the scoring expressions
    accept Column or float) and the score groupBy includes them as
    (constant) grouping keys via _group_scores.  The testdata parquet is a
    single small file (= one scan task), so both tokenize lineages are
    repartitioned to the session parallelism first."""
    par = spark.sparkContext.defaultParallelism
    docs = _docs(spark, sf_dir).repartition(par)
    toks = tokenize_simple_expr(F.col("text"))
    qvocab = sorted({t for _, q in ENTRY_QUERIES for t in q.lower().split()})
    stats = docs.agg(
        F.count("*").cast("double").alias("_n"),
        (F.sum(F.size(toks)).cast("double") / F.count("*")).alias("_avgdl"),
    )
    tf_q = (
        docs.select(
            "doc_id",
            F.size(toks).alias("doc_len"),
            F.explode(toks).alias("term"),
        )
        .filter(F.col("term").isin(qvocab))
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count("*").alias("tf"))
    )
    qt = _query_terms_df(spark)
    matched = (
        tf_q.withColumn(
            "df", F.count("*").over(Window.partitionBy("term")).cast("double")
        )
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid", "doc_id", "term_idx", "q_tf",
            F.col("tf").cast("double").alias("tf"),
            F.col("doc_len").cast("double").alias("doc_len"),
            "df", "_n", "_avgdl",
        )
    )
    return matched, F.col("_n"), F.col("_avgdl")


def _group_scores(matched: DataFrame, agg_col) -> DataFrame:
    """groupBy(qid, doc_id) with the broadcast corpus scalars as extra
    (group-constant) keys so scoring expressions may reference them."""
    return (
        matched.groupBy("qid", "doc_id", "_n", "_avgdl")
        .agg(agg_col.alias("score"))
        .drop("_n", "_avgdl")
    )


def _rank_and_quantize(scored: DataFrame, score_col: str = "score") -> DataFrame:
    w = Window.partitionBy("qid").orderBy(
        F.floor(F.col(score_col) * RANK_QUANTUM).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select(
            "qid", "doc_id", "rank",
            F.floor(F.col(score_col) * 1e6).cast("long").alias("score_e6"),
        )
        # <= TOPK * |queries| rows survive: a single-partition sort gives the
        # same row order as a global orderBy without the range-partitioning
        # exchange and its sampling job (guide §2.4)
        .coalesce(1).sortWithinPartitions("qid", "rank")
    )


# ---------------------------------------------------------------------------
# consolidation helpers (round 5): the driver's oracle check budgets 50
# queries; near-duplicate physical-plan variants of one logical spec are
# unioned into a single registry row under a `variant` discriminator so the
# whole suite stays inside the budget with every operator still DuckDB-gated.
# Numeric columns are cast long on the Spark side and ::BIGINT on the SQL
# side so Spark union coercion and DuckDB type unification cannot disagree.

TREC_COLS: list[tuple[str, str]] = [
    ("qid", "long"), ("doc_id", "long"), ("rank", "long"), ("score_e6", "long"),
]


def variant_union(
    branches: list[tuple[str, DataFrame]],
    cols: list[tuple[str, str]],
    order_cols: list[str],
) -> DataFrame:
    out = None
    for name, df in branches:
        b = df.select(
            F.lit(name).alias("variant"),
            *[
                (F.col(c).cast("long") if t == "long"
                 else F.col(c).cast("string")).alias(c)
                for c, t in cols
            ],
        )
        out = b if out is None else out.unionByName(b)
    return out.orderBy("variant", *order_cols)


def variant_union_sql(
    branches: list[tuple[str, str]],
    cols: list[tuple[str, str]],
    order_cols: list[str],
) -> str:
    sel = ", ".join(
        f"{c}::BIGINT AS {c}" if t == "long" else f"{c}::VARCHAR AS {c}"
        for c, t in cols
    )
    parts = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS variant, {sel} FROM (\n{sql}\n) AS _v{i}"
        for i, (name, sql) in enumerate(branches)
    )
    ob = ", ".join(["variant", *order_cols])
    return f"SELECT * FROM (\n{parts}\n) AS _u ORDER BY {ob}"


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+W1: the flagship — reference-quirk BM25 top-20 per query."""
    matched, n, avgdl = _scored_matched(spark, sf_dir)
    scored = _group_scores(
        matched,
        bm25_finalize(
            ordered_sum(
                F.col("term_idx"),
                bm25_contrib(F.col("tf"), F.col("df"), F.col("doc_len"), n, avgdl),
            )
        ),
    )
    return _rank_and_quantize(scored)


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8+W1: tf_idf top-20 per query."""
    matched, n, _ = _scored_matched(spark, sf_dir)
    scored = _group_scores(
        matched,
        ordered_sum(
            F.col("term_idx"),
            tf_idf_contrib(F.col("tf"), F.col("df"), F.col("doc_len"), n),
        ),
    )
    return _rank_and_quantize(scored)


def q_coordinate_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6+W1: coordinate (overlap count) top-20."""
    matched, _, _ = _scored_matched(spark, sf_dir)
    scored = _group_scores(
        matched, F.sum((F.col("tf") > 0).cast("long")).cast("double")
    )
    return _rank_and_quantize(scored)


def q_scored_topk_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8+F6+W1 under one registry row: the tf_idf and coordinate rankings
    (same matched frame, different scoring functions), variant-tagged."""
    return variant_union(
        [
            ("tfidf", q_tfidf_topk(spark, sf_dir)),
            ("coordinate", q_coordinate_topk(spark, sf_dir)),
        ],
        TREC_COLS, ["qid", "rank"],
    )


def q_lang_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/A14: per-language doc count and char volume."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on full text; keeper = min doc_id."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .orderBy("keep_doc_id")
    )


# --- relational coverage on the TPC-H-ish star schema ---------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (A4/A7 pooling): groupBy + multi-agg, quantized."""
    _pin_utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.floor(F.sum("l_quantity") * 100).cast("long").alias("sum_qty_e2"),
            F.floor(F.sum("l_extendedprice") * 100).cast("long").alias("sum_price_e2"),
            F.floor(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
            ).cast("long").alias("revenue_e2"),
            F.count("*").alias("n_rows"),
        )
        # a handful of groups survive: single-partition sort instead of a
        # range-partitioning exchange + sampling job (guide §2.4)
        .coalesce(1).sortWithinPartitions("l_returnflag", "l_linestatus")
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/W2: join + groupBy + per-group top-k window."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.floor(F.sum("o_totalprice") * 100).cast("long").alias("revenue_e2"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("revenue_e2").desc(), F.col("c_custkey").asc()
    )
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("c_mktsegment", "rank", "c_custkey", "revenue_e2")
        # <= 5 rows per segment survive: same order, no range exchange
        .coalesce(1).sortWithinPartitions("c_mktsegment", "rank")
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO3: anti join (NOT EXISTS)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def q_events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: histogram binning of events.value (bin width 50)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.floor(F.col("value") / 50).cast("long").alias("bin"))
        .agg(F.count("*").alias("n"))
        .orderBy("bin")
    )


def q_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T/W: date truncation + two-key agg (streaming-shaped, batch SQL)."""
    _pin_utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.floor(F.sum("value") * 100).cast("long").alias("sum_value_e2"),
        )
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "doc_term_tf": q_doc_term_tf,
        "term_df": q_term_df,
        "corpus_stats": q_corpus_stats,
        "top_terms": q_top_terms,
        "vocabulary": q_vocabulary,
        "bm25_topk": q_bm25_topk,
        "scored_topk_variants": q_scored_topk_variants,
        "lang_doc_stats": q_lang_doc_stats,
        "dedup_exact": q_dedup_exact,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "customers_without_orders": q_customers_without_orders,
        "events_histogram": q_events_histogram,
        "event_type_daily": q_event_type_daily,
    }


def _bm25_sql() -> str:
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
qd AS (SELECT qid, term, min(pos) AS term_idx FROM q_raw GROUP BY qid, term),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(doc_len) FROM dl)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl
),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
matched AS (
  SELECT qd.qid, tf.doc_id, tf.tf::DOUBLE AS tf, dl.doc_len::DOUBLE AS dl, dfs.df
  FROM qd
  JOIN tf USING (term) JOIN dfs USING (term) JOIN dl ON tf.doc_id = dl.doc_id
),
scored AS (
  SELECT qid, doc_id,
    ln(greatest(sum(
      greatest((s.n - df + 0.5) / (df + 0.5), 1.0)
      * (tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / s.avgdl)))
      * greatest(ln(greatest((s.n - df + 0.5) / (df + 0.5), 1.0)), 0.0)
    ), 1.0)) AS score
  FROM matched, stats s GROUP BY qid, doc_id
),
ranked AS (
  SELECT qid, doc_id,
    row_number() OVER (PARTITION BY qid ORDER BY floor(score * 1e9) DESC, doc_id) AS rank,
    CAST(floor(score * 1e6) AS BIGINT) AS score_e6
  FROM scored
)
SELECT qid, doc_id, rank, score_e6 FROM ranked WHERE rank <= {TOPK}
ORDER BY qid, rank
"""


def _tfidf_sql() -> str:
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
qd AS (SELECT qid, term FROM q_raw GROUP BY qid, term),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT qd.qid, tf.doc_id,
    sum(ln(1.0 + s.n / greatest(dfs.df, 1.0)) * (tf.tf::DOUBLE / dl.doc_len::DOUBLE)) AS score
  FROM qd JOIN tf USING (term) JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats s
  GROUP BY qd.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id,
    row_number() OVER (PARTITION BY qid ORDER BY floor(score * 1e9) DESC, doc_id) AS rank,
    CAST(floor(score * 1e6) AS BIGINT) AS score_e6
  FROM scored
)
SELECT qid, doc_id, rank, score_e6 FROM ranked WHERE rank <= {TOPK}
ORDER BY qid, rank
"""


def _coordinate_sql() -> str:
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
qd AS (SELECT qid, term FROM q_raw GROUP BY qid, term),
scored AS (
  SELECT qd.qid, tf.doc_id, count(*)::DOUBLE AS score
  FROM qd JOIN tf USING (term) GROUP BY qd.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id,
    row_number() OVER (PARTITION BY qid ORDER BY floor(score * 1e9) DESC, doc_id) AS rank,
    CAST(floor(score * 1e6) AS BIGINT) AS score_e6
  FROM scored
)
SELECT qid, doc_id, rank, score_e6 FROM ranked WHERE rank <= {TOPK}
ORDER BY qid, rank
"""


def oracle_sql() -> dict[str, str]:
    return {
        "doc_term_tf": f"WITH {_SQL_TOK} SELECT doc_id, term, tf FROM tf",
        "term_df": f"WITH {_SQL_TOK} SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term",
        "corpus_stats": f"""
WITH {_SQL_TOK}
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       sum(doc_len)::BIGINT AS total_len,
       CAST(floor(sum(doc_len) * 1000.0 / (SELECT count(*) FROM documents)) AS BIGINT)
         AS avg_len_e3
FROM dl""",
        "top_terms": f"""
WITH {_SQL_TOK},
agg AS (SELECT term, sum(tf)::BIGINT AS total_tf FROM tf GROUP BY term),
ranked AS (
  SELECT term, total_tf,
         row_number() OVER (ORDER BY total_tf DESC, term ASC) AS rank
  FROM agg)
SELECT term, total_tf, rank FROM ranked WHERE rank <= 100 ORDER BY rank""",
        "vocabulary": f"WITH {_SQL_TOK} SELECT DISTINCT term FROM tf ORDER BY term",
        "bm25_topk": _bm25_sql(),
        "scored_topk_variants": variant_union_sql(
            [("tfidf", _tfidf_sql()), ("coordinate", _coordinate_sql())],
            TREC_COLS, ["qid", "rank"],
        ),
        "lang_doc_stats": """
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY lang ORDER BY lang""",
        "dedup_exact": """
SELECT md5(text) AS text_hash, min(doc_id)::BIGINT AS keep_doc_id,
       count(*)::BIGINT AS n_copies
FROM documents GROUP BY text ORDER BY keep_doc_id""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(floor(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_e2,
       CAST(floor(sum(l_extendedprice) * 100) AS BIGINT) AS sum_price_e2,
       CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_e2,
       count(*)::BIGINT AS n_rows
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
        "top_customers": """
WITH rev AS (
  SELECT c_custkey, c_mktsegment,
         CAST(floor(sum(o_totalprice) * 100) AS BIGINT) AS revenue_e2
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_custkey, c_mktsegment),
ranked AS (
  SELECT c_mktsegment,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY revenue_e2 DESC, c_custkey ASC) AS rank,
         c_custkey, revenue_e2
  FROM rev)
SELECT c_mktsegment, rank, c_custkey, revenue_e2 FROM ranked WHERE rank <= 5
ORDER BY c_mktsegment, rank""",
        "customers_without_orders": """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey""",
        "events_histogram": """
SELECT CAST(floor(value / 50) AS BIGINT) AS bin, count(*)::BIGINT AS n
FROM events GROUP BY 1 ORDER BY bin""",
        "event_type_daily": """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       count(*)::BIGINT AS n,
       CAST(floor(sum(value) * 100) AS BIGINT) AS sum_value_e2
FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    }
