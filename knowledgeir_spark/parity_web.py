"""Web-ingest parity suite: URL canonicalization, dup clustering, proximity.

Same contract as parity.py / parity_ext.py — each Spark callable and its
DuckDB SQL string produce identical (column names, row count, values)
results at sf0.01.

The testdata `documents` table carries no url column, so both engines
derive one deterministically from (doc_id, source) with deliberately messy
variants (http/https, www., mixed-case host, query string, fragment,
trailing slash) — the parity row then exercises the REAL normalization
operator (functions/url.py) against an independently written SQL mirror of
its spec.  Same deterministic-derivation trick as the pagerank/LeToR
families in parity_ext.py.
"""
# (registered in __spark_entry__.py; rows: url_host_stats, url_dedup,
#  dup_clusters, sdm_bigrams)

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.scoring import bm25_contrib, bm25_finalize, ordered_sum
from .functions.text import tokenize_simple_expr
from .functions.url import host_stats, url_dedup
from .operators.dedup import minhash_lsh_dedup
from .operators.graph import dup_clusters
from .operators.ivf import ivf_topk
from .operators.proximity import candidate_cut, sdm_bigram_counts, sdm_rerank
from .operators.spell import prefix_suggest, spell_correct, vocab_df
from .parity import (
    ENTRY_QUERIES,
    TOPK,
    _SQL_TOK,
    _doc_tf,
    _docs,
    _query_terms_df,
    _scored_matched,
    _sql_queries_values,
)
from .parity_ext import MINHASH_THRESHOLD, N_BANDS, N_HASHES, _minhash_sql

# ---------------------------------------------------------------------------
# deterministic synthetic URL (both engines derive the same value)


def _with_urls(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("https")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.com/p/"),
        (d % 100).cast("string"),
        F.when(d % 13 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(F.lit("?utm="), (d % 11).cast("string"))).otherwise(
            F.lit("")
        ),
        F.when(d % 4 == 0, F.concat(F.lit("#s"), (d % 3).cast("string"))).otherwise(
            F.lit("")
        ),
    )
    return docs.withColumn("url", url)


_SQL_URLS = """
u AS (
  SELECT doc_id, lang, n_chars,
         (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://' ||
         (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
         (CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END) ||
         '.example.com/p/' || CAST(doc_id % 100 AS VARCHAR) ||
         (CASE WHEN doc_id % 13 = 0 THEN '/' ELSE '' END) ||
         (CASE WHEN doc_id % 5 = 0
               THEN '?utm=' || CAST(doc_id % 11 AS VARCHAR) ELSE '' END) ||
         (CASE WHEN doc_id % 4 = 0
               THEN '#s' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END) AS url
  FROM documents
),
norm AS (
  SELECT doc_id, lang, n_chars,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           lower(url),
           '[?#].*$', ''), '^[a-z][a-z0-9+.-]*://', ''), '^www\\.', ''),
           '/$', '') AS stripped
  FROM u
),
canon AS (
  SELECT doc_id, lang, n_chars,
         'https://' || stripped AS canonical,
         regexp_replace(stripped, '[/:].*$', '') AS host
  FROM norm
)
"""


# ---------------------------------------------------------------------------
# Spark side


def q_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return host_stats(_with_urls(_docs(spark, sf_dir))).orderBy("host")


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return url_dedup(_with_urls(_docs(spark, sf_dir))).orderBy("canonical")


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_lsh_dedup(
        _docs(spark, sf_dir),
        k=3,
        n_hashes=N_HASHES,
        n_bands=N_BANDS,
        threshold=MINHASH_THRESHOLD,
    ).select("doc_a", "doc_b")
    return dup_clusters(pairs).orderBy("doc_id")


def q_sdm_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = sdm_bigram_counts(_docs(spark, sf_dir), _query_terms(spark), window=8)
    w = Window.partitionBy("qid").orderBy(
        F.desc("n_ordered"), F.desc("n_uw"), F.col("doc_id")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
        .select("qid", "doc_id", "n_ordered", F.col("n_uw").alias("n_uw8"), "rnk")
        .orderBy("qid", "rnk")
    )


RERANK_DEPTH = 100
RERANK_W_ORD = 0.5
RERANK_W_UW = 0.3


def _query_terms(spark: SparkSession) -> DataFrame:
    rows = [
        (qid, term, pos)
        for qid, q in ENTRY_QUERIES
        for pos, term in enumerate(q.lower().split())
    ]
    return spark.createDataFrame(rows, "qid int, term string, pos int")


def q_sdm_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase serving: reference-quirk BM25 match to depth 100, then
    proximity-blended rerank to top-20 (operators/proximity.sdm_rerank)."""
    matched, n, avgdl = _scored_matched(spark, sf_dir)
    scored = matched.groupBy("qid", "doc_id").agg(
        bm25_finalize(
            ordered_sum(
                F.col("term_idx"),
                bm25_contrib(F.col("tf"), F.col("df"), F.col("doc_len"), n, avgdl),
            )
        ).alias("score")
    )
    cand = candidate_cut(scored, RERANK_DEPTH)
    # serving shape: the positional scan touches only first-pass candidates
    # (the oracle computes sdm over all docs; restriction is result-invisible
    # because the blend only reads sdm rows for candidate (qid, doc_id)s)
    sdm = sdm_bigram_counts(
        _docs(spark, sf_dir), _query_terms(spark), window=8, candidates=cand
    )
    res = sdm_rerank(
        cand, sdm, depth=RERANK_DEPTH, k=TOPK,
        w_ordered=RERANK_W_ORD, w_window=RERANK_W_UW,
    )
    return res.select(
        "qid",
        "doc_id",
        "rank",
        F.floor(F.col("score") * 1e6).cast("long").alias("score_e6"),
    ).orderBy("qid", "rank")


IVF_K = 8
IVF_ITERS = 3
IVF_NPROBE = 2
IVF_TOPK = 10


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    res = ivf_topk(
        emb, qs, k_clusters=IVF_K, iters=IVF_ITERS, nprobe=IVF_NPROBE, k=IVF_TOPK
    )
    return res.select(
        "q_id",
        "vec_id",
        "rank",
        F.floor(F.col("cos") * 1e6).cast("long").alias("cos_e6"),
    ).orderBy("q_id", "rank")


SNIPPET_WINDOW = 12
SNIPPET_DEPTH = 5


def q_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-biased snippets for the BM25 top-5 of every query
    (operators/snippet.py), oracle-gated by composing the bm25 oracle's
    candidate CTE with a positional window-count replay — the snippet
    STRING itself is compared, not just its coordinates."""
    from .operators.snippet import best_snippets

    matched, n, avgdl = _scored_matched(spark, sf_dir)
    scored = matched.groupBy("qid", "doc_id").agg(
        bm25_finalize(
            ordered_sum(
                F.col("term_idx"),
                bm25_contrib(F.col("tf"), F.col("df"), F.col("doc_len"), n, avgdl),
            )
        ).alias("score")
    )
    cand = candidate_cut(scored, SNIPPET_DEPTH).select("qid", "doc_id")
    res = best_snippets(
        _docs(spark, sf_dir),
        _query_terms(spark),
        cand,
        window=SNIPPET_WINDOW,
    )
    return res.orderBy("qid", "doc_id")


def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F over deterministically derived fields (title = first 6 tokens,
    body = rest) so DuckDB can replay the field split; on real web pages
    the fields come from functions/html.with_extracted_text instead."""
    from .operators.fielded import bm25f_topk

    docs = _docs(spark, sf_dir)
    toks = tokenize_simple_expr(F.col("text"))
    fdocs = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(toks, 1, 6)).alias("title"),
        F.concat_ws(
            " ", F.slice(toks, 7, F.greatest(F.size(toks) - 6, F.lit(0)))
        ).alias("body"),
    )
    res = bm25f_topk(fdocs, _query_terms_df(spark), k=TOPK)
    return res.select(
        "qid",
        "doc_id",
        "rank",
        F.floor(F.col("score") * 1e6).cast("long").alias("score_e6"),
    ).orderBy("qid", "rank")


def q_spell_correct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell-style spell correction (operators/spell.py) over the corpus
    vocabulary.  Misspelled inputs are derived deterministically from the
    vocabulary itself (terms with df >= 2 and length >= 5, 3rd char
    dropped) so both engines correct the same typo set; the Spark side
    runs the scalable delete-key join, the oracle the brute-force
    cross-join + levenshtein spec — they must agree exactly."""
    vocab = vocab_df(_doc_tf(spark, sf_dir))
    inputs = (
        vocab.filter((F.length("term") >= 5) & (F.col("df") >= 2))
        .select(
            F.expr("concat(substring(term, 1, 2), substring(term, 4))").alias("input")
        )
        .distinct()
    )
    return spell_correct(inputs, vocab).orderBy("input")


ANCHOR_FIELDS = {
    "title": (2.0, 0.75),
    "body": (1.0, 0.75),
    "anchor": (1.5, 0.5),
}


def q_anchor_bm25f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web ranking with an aggregated anchor field: a deterministic
    2-outlink graph (dst = (7*src+13) % n and (13*src+101) % n, anchor
    text = the source's first 3 tokens) is rolled up per destination by
    operators/anchor.aggregate_anchor_text, then scored as the third
    BM25F field (weight 1.5, b 0.5) beside title/body."""
    from .operators.anchor import aggregate_anchor_text
    from .operators.fielded import bm25f_topk

    docs = _docs(spark, sf_dir)
    n = docs.count()
    toks = tokenize_simple_expr(F.col("text"))
    base = docs.select("doc_id", toks.alias("l"))
    a_text = F.concat_ws(" ", F.slice("l", 1, 3))

    def edge(mul: int, add: int, link_id: int):
        return base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * mul + add) % n).alias("dst"),
            F.lit(link_id).alias("link_id"),
            a_text.alias("anchor_text"),
        )

    anchor = aggregate_anchor_text(
        edge(7, 13, 1).unionByName(edge(13, 101, 2))
    ).select("doc_id", "anchor")
    fdocs = (
        docs.select(
            "doc_id",
            F.concat_ws(" ", F.slice(toks, 1, 6)).alias("title"),
            F.concat_ws(
                " ", F.slice(toks, 7, F.greatest(F.size(toks) - 6, F.lit(0)))
            ).alias("body"),
        )
        .join(anchor, "doc_id", "left")
        .withColumn("anchor", F.coalesce(F.col("anchor"), F.lit("")))
    )
    res = bm25f_topk(fdocs, _query_terms_df(spark), fields=ANCHOR_FIELDS, k=TOPK)
    return res.select(
        "qid",
        "doc_id",
        "rank",
        F.floor(F.col("score") * 1e6).cast("long").alias("score_e6"),
    ).orderBy("qid", "rank")


def _derived_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a deterministic line structure injected: 8-token
    chunks, chunk i of doc d suffixed by (d+i)%4 -> '.' / '!' / '' (fails
    the terminal-punctuation rule) / ' {' (hits a bad marker) — so the C4
    rules have real work on the punctuation-free testdata."""
    toks = tokenize_simple_expr(F.col("text"))
    docs = _docs(spark, sf_dir).select("doc_id", toks.alias("l"))
    suffixes = F.array(F.lit("."), F.lit("!"), F.lit(""), F.lit(" {"))
    lines = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size("l") / F.lit(8)).cast("int") - 1),
        lambda i: F.concat(
            F.array_join(F.slice(F.col("l"), i * 8 + 1, 8), " "),
            F.element_at(suffixes, ((F.col("doc_id") + i) % 4 + 1).cast("int")),
        ),
    )
    return docs.filter(F.size("l") > 0).select(
        "doc_id", F.array_join(lines, "\n").alias("text")
    )


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line filtering (operators/clean.py) over deterministically
    line-structured documents; the oracle replays the rules on the same
    derived lines and the clean_text strings compare byte-for-byte."""
    from .operators.clean import c4_line_filter

    return c4_line_filter(_derived_lines(spark, sf_dir)).orderBy("doc_id")


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking (functions/pii.py): synthetic email/phone/IPv4 strings
    are injected deterministically per doc_id, masked in fixed order, and
    the scrubbed strings compared byte-for-byte."""
    from .functions.pii import scrub_pii

    d = F.col("doc_id")
    injected = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 3 != 0,
                F.concat(F.lit(" contact user"), d.cast("string"),
                         F.lit("@mail"), (d % 7).cast("string"),
                         F.lit(".com")),
            ).otherwise(F.lit("")),
            F.when(
                d % 2 == 0,
                F.concat(F.lit(" call 555-12"), (d % 10).cast("string"),
                         F.lit("-4567")),
            ).otherwise(F.lit("")),
            F.lit(" at 10.0."), (d % 256).cast("string"), F.lit(".1 end"),
        ).alias("text"),
    )
    return scrub_pii(injected).select(
        "doc_id", "n_email", "n_phone", "n_ipv4", "scrubbed"
    ).orderBy("doc_id")


def q_host_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-collapsed serving (operators/topk.collapse_per_key): BM25
    scores joined to each doc's derived host, at most 2 results per
    (query, host), reranked to top-10."""
    from .functions.url import host_of
    from .operators.topk import collapse_per_key

    matched, n, avgdl = _scored_matched(spark, sf_dir)
    scored = matched.groupBy("qid", "doc_id").agg(
        bm25_finalize(
            ordered_sum(
                F.col("term_idx"),
                bm25_contrib(F.col("tf"), F.col("df"), F.col("doc_len"), n, avgdl),
            )
        ).alias("score")
    )
    hosts = _with_urls(_docs(spark, sf_dir)).select(
        "doc_id", host_of(F.col("url")).alias("host")
    )
    res = collapse_per_key(scored.join(hosts, "doc_id"), "host", m=2, k=10)
    return res.select(
        "qid",
        "doc_id",
        "host",
        "rank",
        F.floor(F.col("score") * 1e6).cast("long").alias("score_e6"),
    ).orderBy("qid", "rank")


def q_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix autocomplete (operators/spell.prefix_suggest): 3-char
    prefixes derived from the vocabulary itself, top-3 completions each
    by (df desc, term asc)."""
    vocab = vocab_df(_doc_tf(spark, sf_dir))
    prefixes = (
        vocab.filter((F.col("df") >= 2) & (F.length("term") >= 3))
        .select(F.substring("term", 1, 3).alias("prefix"))
        .distinct()
    )
    return prefix_suggest(vocab, prefixes, n=3).orderBy("prefix", "rank")


# ---------------------------------------------------------------------------
# DuckDB oracles

_HOST_STATS_SQL = f"""
WITH {_SQL_URLS}
SELECT host,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT canonical)::BIGINT AS n_canonical,
       sum(n_chars)::BIGINT AS total_chars,
       count(DISTINCT lang)::BIGINT AS n_langs
FROM canon GROUP BY host ORDER BY host"""

_URL_DEDUP_SQL = f"""
WITH {_SQL_URLS}
SELECT canonical,
       min(doc_id) AS keep_doc_id,
       (count(*) - 1)::BIGINT AS n_dups
FROM canon GROUP BY canonical ORDER BY canonical"""


def _dup_clusters_sql() -> str:
    # exact connected components: transitive closure over the symmetrized
    # near-dup pair graph, label = min reachable node
    return f"""
WITH RECURSIVE
mh AS ({_minhash_sql()}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM mh
  UNION
  SELECT doc_b AS s, doc_a AS d FROM mh
),
reach AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON e.s = r.d
),
lbl AS (
  SELECT s AS doc_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s
),
sz AS (
  SELECT cluster_id, count(*)::BIGINT AS cluster_size FROM lbl GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, sz.cluster_size
FROM lbl l JOIN sz USING (cluster_id)
ORDER BY doc_id"""


def _sdm_sql() -> str:
    return f"""
WITH {_sql_queries_values()},
bg AS (
  SELECT a.qid, a.pos AS bg_id, a.term AS term_a, b.term AS term_b
  FROM q_raw a JOIN q_raw b ON b.qid = a.qid AND b.pos = a.pos + 1
),
raw AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term,
         generate_subscripts(string_split_regex(lower(text), '[^a-z0-9]+'), 1) AS ord
  FROM documents
),
tp AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
  FROM raw WHERE term <> ''
),
pa AS (
  SELECT bg.qid, bg.bg_id, tp.doc_id, tp.pos AS i
  FROM bg JOIN tp ON tp.term = bg.term_a
),
pb AS (
  SELECT bg.qid, bg.bg_id, tp.doc_id, tp.pos AS j
  FROM bg JOIN tp ON tp.term = bg.term_b
),
pairs AS (
  SELECT pa.qid, pa.doc_id, pa.i, pb.j
  FROM pa JOIN pb ON pb.qid = pa.qid AND pb.bg_id = pa.bg_id
                 AND pb.doc_id = pa.doc_id
  WHERE pa.i <> pb.j AND abs(pb.j - pa.i) <= 7
),
agg AS (
  SELECT qid, doc_id,
         sum(CASE WHEN j = i + 1 THEN 1 ELSE 0 END)::BIGINT AS n_ordered,
         count(*)::BIGINT AS n_uw8
  FROM pairs GROUP BY qid, doc_id
),
rk AS (
  SELECT qid, doc_id, n_ordered, n_uw8,
         row_number() OVER (PARTITION BY qid
                            ORDER BY n_ordered DESC, n_uw8 DESC, doc_id) AS rnk
  FROM agg
)
SELECT qid, doc_id, n_ordered, n_uw8, rnk FROM rk WHERE rnk <= 20
ORDER BY qid, rnk"""


def _sdm_rerank_sql() -> str:
    # phase 1 (scored CTE) is the bm25 oracle's scoring text verbatim
    # (parity._bm25_sql — keep in sync); phase 2 composes the sdm oracle's
    # position CTEs under p-prefixed names to avoid colliding with _SQL_TOK
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
cand AS (
  SELECT qid, doc_id, score FROM (
    SELECT qid, doc_id, score,
           row_number() OVER (PARTITION BY qid
                              ORDER BY floor(score * 1e9) DESC, doc_id) AS crank
    FROM scored) WHERE crank <= {RERANK_DEPTH}
),
bg AS (
  SELECT a.qid, a.pos AS bg_id, a.term AS term_a, b.term AS term_b
  FROM q_raw a JOIN q_raw b ON b.qid = a.qid AND b.pos = a.pos + 1
),
praw AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term,
         generate_subscripts(string_split_regex(lower(text), '[^a-z0-9]+'), 1) AS ord
  FROM documents
),
ptp AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
  FROM praw WHERE term <> ''
),
ppa AS (
  SELECT bg.qid, bg.bg_id, ptp.doc_id, ptp.pos AS i
  FROM bg JOIN ptp ON ptp.term = bg.term_a
),
ppb AS (
  SELECT bg.qid, bg.bg_id, ptp.doc_id, ptp.pos AS j
  FROM bg JOIN ptp ON ptp.term = bg.term_b
),
ppairs AS (
  SELECT ppa.qid, ppa.doc_id, ppa.i, ppb.j
  FROM ppa JOIN ppb ON ppb.qid = ppa.qid AND ppb.bg_id = ppa.bg_id
                   AND ppb.doc_id = ppa.doc_id
  WHERE ppa.i <> ppb.j AND abs(ppb.j - ppa.i) <= 7
),
sdm AS (
  SELECT qid, doc_id,
         sum(CASE WHEN j = i + 1 THEN 1 ELSE 0 END)::BIGINT AS n_ordered,
         count(*)::BIGINT AS n_uw
  FROM ppairs GROUP BY qid, doc_id
),
final AS (
  SELECT c.qid, c.doc_id,
         c.score + {RERANK_W_ORD} * ln(1 + coalesce(s.n_ordered, 0))
                 + {RERANK_W_UW} * ln(1 + coalesce(s.n_uw, 0)) AS score
  FROM cand c LEFT JOIN sdm s ON s.qid = c.qid AND s.doc_id = c.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY floor(score * 1e9) DESC, doc_id) AS rank,
         CAST(floor(score * 1e6) AS BIGINT) AS score_e6
  FROM final
)
SELECT qid, doc_id, rank, score_e6 FROM ranked WHERE rank <= {TOPK}
ORDER BY qid, rank"""


def _ivf_sql(
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    topk: int = IVF_TOPK,
) -> str:
    """Replays the deterministic IVF pipeline (operators/ivf.py) as a
    materialized Lloyd-iteration CTE chain — same construction as the
    pagerank oracle in parity_ext.py."""
    parts = [
        """
ve AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)""",
        f"""
initids AS (
  SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
)""",
        """
c0 AS (SELECT ii.cid, ve.i, ve.x FROM ve JOIN initids ii USING (vec_id))""",
    ]
    for t in range(1, iters + 1):
        parts.append(f"""
d{t} AS (
  SELECT ve.vec_id, c.cid, sum((ve.x - c.x) * (ve.x - c.x)) AS dist
  FROM ve JOIN c{t - 1} c ON c.i = ve.i GROUP BY ve.vec_id, c.cid
),
a{t} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d{t}) WHERE rn = 1
),
c{t} AS (
  SELECT a.cid, ve.i, avg(ve.x) AS x
  FROM ve JOIN a{t} a USING (vec_id) GROUP BY a.cid, ve.i
)""")
    parts.append(f"""
df AS (
  SELECT ve.vec_id, c.cid, sum((ve.x - c.x) * (ve.x - c.x)) AS dist
  FROM ve JOIN c{iters} c ON c.i = ve.i GROUP BY ve.vec_id, c.cid
),
af AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM df) WHERE rn = 1
),
q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
qe AS (
  SELECT q_id, unnest(q_vec)::DOUBLE AS x, generate_subscripts(q_vec, 1) AS i
  FROM q
),
qd AS (
  SELECT qe.q_id, c.cid, sum((qe.x - c.x) * (qe.x - c.x)) AS dist
  FROM qe JOIN c{iters} c ON c.i = qe.i GROUP BY qe.q_id, c.cid
),
probes AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid,
           row_number() OVER (PARTITION BY q_id ORDER BY dist, cid) AS pn
    FROM qd) WHERE pn <= {nprobe}
),
cand AS (
  SELECT p.q_id, a.vec_id
  FROM probes p JOIN af a ON a.cid = p.cid
  WHERE a.vec_id <> p.q_id
),
dots AS (
  SELECT c.q_id, c.vec_id, sum(qe.x * ve.x) AS dot
  FROM cand c
  JOIN qe ON qe.q_id = c.q_id
  JOIN ve ON ve.vec_id = c.vec_id AND ve.i = qe.i
  GROUP BY c.q_id, c.vec_id
),
norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ve GROUP BY vec_id),
cos AS (
  SELECT d.q_id, d.vec_id, d.dot / (nq.nrm * nv.nrm) AS cos
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.q_id
  JOIN norms nv ON nv.vec_id = d.vec_id
),
ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY floor(cos * 1e9) DESC, vec_id ASC) AS rank,
         CAST(floor(cos * 1e6) AS BIGINT) AS cos_e6
  FROM cos
)
SELECT q_id, vec_id, rank, cos_e6 FROM ranked WHERE rank <= {topk}
ORDER BY q_id, rank""")
    return "WITH " + ",".join(parts)


def _snippets_sql() -> str:
    """Phase 1 is the bm25 oracle's scoring text verbatim (keep in sync with
    parity._bm25_sql), cut at depth 5; phase 2 replays the snippet spec:
    1-based positions over non-empty simple tokens, window starts at match
    positions, count ties broken by earliest start, snippet = the token
    slice joined by spaces."""
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
cand AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY floor(score * 1e9) DESC, doc_id) AS rn
    FROM scored) WHERE rn <= {SNIPPET_DEPTH}
),
ptoks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
),
praw AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos FROM ptoks
),
pm AS (
  SELECT q.qid, c.doc_id, praw.pos
  FROM (SELECT DISTINCT qid, term FROM q_raw) q
  JOIN praw ON praw.term = q.term
  JOIN cand c ON c.qid = q.qid AND c.doc_id = praw.doc_id
),
wnd AS (
  SELECT m1.qid, m1.doc_id, m1.pos AS start, count(*)::BIGINT AS n_matches
  FROM pm m1
  JOIN pm m2 ON m2.qid = m1.qid AND m2.doc_id = m1.doc_id
            AND m2.pos >= m1.pos AND m2.pos < m1.pos + {SNIPPET_WINDOW}
  GROUP BY m1.qid, m1.doc_id, m1.pos
),
best AS (
  SELECT qid, doc_id, start, n_matches,
         row_number() OVER (PARTITION BY qid, doc_id
                            ORDER BY n_matches DESC, start) AS rn
  FROM wnd
)
SELECT b.qid, b.doc_id, b.start AS start_pos, b.n_matches,
       array_to_string(list_slice(p.l, b.start, b.start + {SNIPPET_WINDOW - 1}),
                       ' ') AS snippet
FROM best b JOIN ptoks p ON p.doc_id = b.doc_id
WHERE b.rn = 1
ORDER BY b.qid, b.doc_id"""


def _bm25f_sql() -> str:
    """Replays the BM25F program (operators/fielded.py) field-for-field:
    same token slices, same conditional field pivot, same Lucene-style
    ln(1 + idf) — only the per-(qid,doc) sum order differs, absorbed by
    the floor-quantized outputs like every other scoring row."""
    return f"""
WITH
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
),
ftok AS (
  SELECT doc_id, 'title' AS field, unnest(list_slice(l, 1, 6)) AS term FROM toks
  UNION ALL
  SELECT doc_id, 'body' AS field, unnest(list_slice(l, 7, len(l))) AS term FROM toks
),
fw(field, w, b) AS (VALUES ('title', 2.0, 0.75), ('body', 1.0, 0.75)),
ftf AS (
  SELECT doc_id, field, term, count(*)::BIGINT AS tf
  FROM ftok GROUP BY doc_id, field, term
),
flen AS (
  SELECT doc_id, field, sum(tf)::BIGINT AS flen FROM ftf GROUP BY doc_id, field
),
avgl AS (
  SELECT field, sum(flen)::DOUBLE / (SELECT count(*) FROM documents) AS avglen
  FROM flen GROUP BY field
),
dfs AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM ftf GROUP BY term),
wtf AS (
  SELECT ftf.doc_id, ftf.term,
         sum(fw.w * (ftf.tf / (1 - fw.b + fw.b * flen.flen / avgl.avglen))) AS wtf
  FROM ftf
  JOIN flen USING (doc_id, field) JOIN avgl USING (field) JOIN fw USING (field)
  GROUP BY ftf.doc_id, ftf.term
),
{_sql_queries_values()},
qd AS (SELECT qid, term, min(pos) AS term_idx FROM q_raw GROUP BY qid, term),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n),
scored AS (
  SELECT qid, doc_id,
         sum(ln(1.0 + (s.n - dfs.df + 0.5) / (dfs.df + 0.5))
             * wtf / (1.2 + wtf)) AS score
  FROM qd JOIN wtf USING (term) JOIN dfs USING (term), stats s
  GROUP BY qid, doc_id
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY floor(score * 1e9) DESC, doc_id) AS rank,
         CAST(floor(score * 1e6) AS BIGINT) AS score_e6
  FROM scored
)
SELECT qid, doc_id, rank, score_e6 FROM ranked WHERE rank <= {TOPK}
ORDER BY qid, rank"""


_SPELL_SQL = f"""
WITH {_SQL_TOK},
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
inputs AS (
  SELECT DISTINCT substr(term, 1, 2) || substr(term, 4) AS input
  FROM vocab WHERE length(term) >= 5 AND df >= 2
),
cand AS (
  SELECT i.input, v.term AS suggestion,
         levenshtein(i.input, v.term) AS ed, v.df AS sugg_df
  FROM inputs i, vocab v
  WHERE length(i.input) >= 3 AND levenshtein(i.input, v.term) <= 1
),
pick AS (
  SELECT input, suggestion, ed, sugg_df,
         row_number() OVER (PARTITION BY input
                            ORDER BY ed, sugg_df DESC, suggestion) AS rn
  FROM cand
)
SELECT input, suggestion, ed, sugg_df FROM pick WHERE rn = 1 ORDER BY input"""


def _host_collapse_sql() -> str:
    """bm25 scoring text verbatim + the derived-URL host CTEs + the two
    deterministic windows of collapse_per_key."""
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
{_SQL_URLS},
sh AS (
  SELECT s.qid, s.doc_id, s.score, c.host
  FROM scored s JOIN canon c USING (doc_id)
),
keyed AS (
  SELECT qid, doc_id, host, score,
         row_number() OVER (PARTITION BY qid, host
                            ORDER BY floor(score * 1e9) DESC, doc_id) AS kr
  FROM sh
),
final AS (
  SELECT qid, doc_id, host, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY floor(score * 1e9) DESC, doc_id) AS rank
  FROM keyed WHERE kr <= 2
)
SELECT qid, doc_id, host, rank,
       CAST(floor(score * 1e6) AS BIGINT) AS score_e6
FROM final WHERE rank <= 10
ORDER BY qid, rank"""


def _anchor_bm25f_sql() -> str:
    """The three-field BM25F replay: derived 2-outlink graph, string_agg
    anchor rollup in (src, link_id) order, then the same field pivot /
    scoring text as _bm25f_sql with the anchor field added."""
    return f"""
WITH
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
),
stats0 AS (SELECT count(*)::BIGINT AS n FROM documents),
links AS (
  SELECT doc_id AS src, (doc_id * 7 + 13) % s.n AS dst, 1 AS link_id,
         array_to_string(list_slice(l, 1, 3), ' ') AS anchor_text
  FROM toks, stats0 s
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 101) % s.n, 2,
         array_to_string(list_slice(l, 1, 3), ' ')
  FROM toks, stats0 s
),
anchor AS (
  SELECT dst AS doc_id,
         string_agg(anchor_text, ' ' ORDER BY src, link_id) AS anchor
  FROM links GROUP BY dst
),
fdoc AS (
  SELECT t.doc_id,
         array_to_string(list_slice(l, 1, 6), ' ') AS title,
         array_to_string(list_slice(l, 7, len(l)), ' ') AS body,
         coalesce(a.anchor, '') AS anchor
  FROM toks t LEFT JOIN anchor a USING (doc_id)
),
ftok AS (
  SELECT doc_id, 'title' AS field,
         unnest(list_filter(string_split_regex(lower(title), '[^a-z0-9]+'),
                            x -> x <> '')) AS term FROM fdoc
  UNION ALL
  SELECT doc_id, 'body',
         unnest(list_filter(string_split_regex(lower(body), '[^a-z0-9]+'),
                            x -> x <> '')) FROM fdoc
  UNION ALL
  SELECT doc_id, 'anchor',
         unnest(list_filter(string_split_regex(lower(anchor), '[^a-z0-9]+'),
                            x -> x <> '')) FROM fdoc
),
fw(field, w, b) AS (VALUES ('title', 2.0, 0.75), ('body', 1.0, 0.75),
                           ('anchor', 1.5, 0.5)),
ftf AS (
  SELECT doc_id, field, term, count(*)::BIGINT AS tf
  FROM ftok GROUP BY doc_id, field, term
),
flen AS (
  SELECT doc_id, field, sum(tf)::BIGINT AS flen FROM ftf GROUP BY doc_id, field
),
avgl AS (
  SELECT field, sum(flen)::DOUBLE / (SELECT count(*) FROM documents) AS avglen
  FROM flen GROUP BY field
),
dfs AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM ftf GROUP BY term),
wtf AS (
  SELECT ftf.doc_id, ftf.term,
         sum(fw.w * (ftf.tf / (1 - fw.b + fw.b * flen.flen / avgl.avglen))) AS wtf
  FROM ftf
  JOIN flen USING (doc_id, field) JOIN avgl USING (field) JOIN fw USING (field)
  GROUP BY ftf.doc_id, ftf.term
),
{_sql_queries_values()},
qd AS (SELECT qid, term, min(pos) AS term_idx FROM q_raw GROUP BY qid, term),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n),
scored AS (
  SELECT qid, doc_id,
         sum(ln(1.0 + (s.n - dfs.df + 0.5) / (dfs.df + 0.5))
             * wtf / (1.2 + wtf)) AS score
  FROM qd JOIN wtf USING (term) JOIN dfs USING (term), stats s
  GROUP BY qid, doc_id
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY floor(score * 1e9) DESC, doc_id) AS rank,
         CAST(floor(score * 1e6) AS BIGINT) AS score_e6
  FROM scored
)
SELECT qid, doc_id, rank, score_e6 FROM ranked WHERE rank <= {TOPK}
ORDER BY qid, rank"""


_DERIVED_LINES_SQL = """
dtoks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
),
dlines AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(l) / 8.0) AS INT)), i ->
           array_to_string(list_slice(l, i * 8 + 1, i * 8 + 8), ' ') ||
           (CASE (doc_id + i) % 4 WHEN 0 THEN '.' WHEN 1 THEN '!'
                 WHEN 2 THEN '' ELSE ' {' END)) AS ls
  FROM dtoks WHERE len(l) > 0
)"""

_C4_CLEAN_SQL = (
    "WITH "
    + _DERIVED_LINES_SQL
    + """,
c4 AS (
  SELECT doc_id, ls,
         list_filter(ls, li ->
           regexp_matches(trim(li), '[.!?"]$')
           AND len(list_filter(string_split_regex(trim(li), '\\s+'),
                               w -> w <> '')) >= 5
           AND NOT contains(lower(trim(li)), 'javascript')
           AND NOT contains(lower(trim(li)), 'lorem ipsum')
           AND NOT contains(lower(trim(li)), '{')) AS kl
  FROM dlines
)
SELECT doc_id, array_to_string(kl, chr(10)) AS clean_text,
       len(kl) AS n_kept, (len(ls) - len(kl)) AS n_dropped
FROM c4 WHERE len(kl) >= 3 ORDER BY doc_id"""
)


def _pii_sql() -> str:
    """Splices the EXACT pattern strings from functions.pii so both engines
    run identical regex text in the identical mask order."""
    from .functions.pii import PII_PATTERNS

    (e_name, e_pat, e_mask), (p_name, p_pat, p_mask), (i_name, i_pat, i_mask) = (
        PII_PATTERNS
    )
    return """
WITH inj AS (
  SELECT doc_id,
    text ||
    (CASE WHEN doc_id % 3 <> 0
          THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail' ||
               CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END) ||
    (CASE WHEN doc_id % 2 = 0
          THEN ' call 555-12' || CAST(doc_id % 10 AS VARCHAR) || '-4567'
          ELSE '' END) ||
    ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 end' AS t
  FROM documents
),
s1 AS (
  SELECT doc_id, CAST(len(regexp_extract_all(t, '{e_pat}')) AS INT) AS n_{e_name},
         regexp_replace(t, '{e_pat}', '{e_mask}', 'g') AS t1
  FROM inj
),
s2 AS (
  SELECT doc_id, n_{e_name},
         CAST(len(regexp_extract_all(t1, '{p_pat}')) AS INT) AS n_{p_name},
         regexp_replace(t1, '{p_pat}', '{p_mask}', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_{e_name}, n_{p_name},
         CAST(len(regexp_extract_all(t2, '{i_pat}')) AS INT) AS n_{i_name},
         regexp_replace(t2, '{i_pat}', '{i_mask}', 'g') AS scrubbed
  FROM s2
)
SELECT doc_id, n_{e_name}, n_{p_name}, n_{i_name}, scrubbed FROM s3
ORDER BY doc_id""".format(
        # DuckDB regular string literals do not process backslash escapes,
        # so the regex text goes in verbatim
        e_name=e_name, e_pat=e_pat, e_mask=e_mask,
        p_name=p_name, p_pat=p_pat, p_mask=p_mask,
        i_name=i_name, i_pat=i_pat, i_mask=i_mask,
    )


_AUTOCOMPLETE_SQL = f"""
WITH {_SQL_TOK},
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
prefixes AS (
  SELECT DISTINCT substr(term, 1, 3) AS prefix
  FROM vocab WHERE df >= 2 AND length(term) >= 3
),
cand AS (
  SELECT p.prefix, v.term, v.df
  FROM prefixes p JOIN vocab v ON starts_with(v.term, p.prefix)
),
pick AS (
  SELECT prefix, term, df,
         row_number() OVER (PARTITION BY prefix
                            ORDER BY df DESC, term) AS rank
  FROM cand
)
SELECT prefix, term, df, rank FROM pick WHERE rank <= 3
ORDER BY prefix, rank"""


# ---------------------------------------------------------------------------
# boolean (AND / AND-NOT) and exact-phrase retrieval — the SERVING reader
# itself under the DuckDB gate (index/query.py search_local mode="and" and
# search_phrase).  Engine addition: the reference delegates retrieval to
# Indri/ES (setup.py:23); scoring reuses its bm25 quirks
# (retrieval_model.py:205-291).


# deterministic per-query excluded term: the first token of the NEXT entry
# query (never one of the query's own terms — asserted at import time)
_EXCL_TERMS: dict[str, str] = {
    str(q): ENTRY_QUERIES[(i + 1) % len(ENTRY_QUERIES)][1].split()[0]
    for i, (q, _t) in enumerate(ENTRY_QUERIES)
}
assert all(
    x not in t.split() for (q, t), x in zip(ENTRY_QUERIES, _EXCL_TERMS.values())
)


def _serving_trec(spark: SparkSession, rows) -> DataFrame:
    out = spark.createDataFrame(
        rows, "qid string, doc_id long, score double, rank int"
    )
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        "doc_id",
        "rank",
        F.floor(F.col("score") * 1e6).cast("long").alias("score_e6"),
    ).orderBy("qid", "rank")


def q_bool_and_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) top-k through the serving reader: only docs
    containing EVERY query term, scored bm25, block-skip intersection
    (df-ascending, rarest term bounds the candidates)."""
    from .index.query import IndexReader
    from .parity_ext import ensure_parity_index

    reader = IndexReader(spark, ensure_parity_index(spark, sf_dir))
    rows = reader.search_local(
        [(str(q), t) for q, t in ENTRY_QUERIES], k=TOPK, mode="and"
    )
    return _serving_trec(spark, rows)


def q_bool_andnot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-NOT through the serving reader: conjunctive over the query terms,
    minus docs containing the per-query excluded term."""
    from .index.query import IndexReader
    from .parity_ext import ensure_parity_index

    reader = IndexReader(spark, ensure_parity_index(spark, sf_dir))
    rows = reader.search_local(
        [(str(q), t) for q, t in ENTRY_QUERIES],
        k=TOPK,
        mode="and",
        exclude={q: [t] for q, t in _EXCL_TERMS.items()},
    )
    return _serving_trec(spark, rows)


def q_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase top-k through the serving reader: conjunctive candidates
    from the posting index, adjacency verified on the docstore forward
    index, bm25-ranked survivors.  The oracle replays the phrase as a
    normalized-text substring match (same [a-z0-9]+ token stream)."""
    import os as _os

    from .index.docstore import write_docstore
    from .index.query import IndexReader
    from .parity_ext import ensure_parity_index

    idx_dir = ensure_parity_index(spark, sf_dir)
    if not _os.path.isdir(_os.path.join(idx_dir, "docstore")):
        write_docstore(_docs(spark, sf_dir), idx_dir, n_buckets=16)
    reader = IndexReader(spark, idx_dir)
    rows = reader.search_phrase(
        [(str(q), t) for q, t in ENTRY_QUERIES], k=TOPK, tokenizer="simple"
    )
    return _serving_trec(spark, rows)


def q_phrase_positional_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The POSITIONAL-STORE phrase path under the same oracle as
    phrase_topk: adjacency verified by offset intersection over the
    bucket-pruned positions store instead of re-tokenizing docstore
    texts.  Same spec, different physical plan — both DuckDB-gated."""
    import os as _os

    from .index.positions import write_positions_store
    from .index.query import IndexReader
    from .parity_ext import ensure_parity_index

    idx_dir = ensure_parity_index(spark, sf_dir)
    if not _os.path.isdir(_os.path.join(idx_dir, "positions")):
        write_positions_store(_docs(spark, sf_dir), idx_dir, tokenizer="simple")
    reader = IndexReader(spark, idx_dir)
    rows = reader.search_phrase(
        [(str(q), t) for q, t in ENTRY_QUERIES],
        k=TOPK,
        tokenizer="simple",
        verify="positions",
    )
    return _serving_trec(spark, rows)


def _conj_cte(exclude: bool) -> str:
    """Shared bm25-conjunctive CTE chain (mirrors parity._bm25_sql's scoring
    exactly, plus the all-terms filter and optional exclusion)."""
    xv = ", ".join(
        f"({q}, '{t}')"
        for q, t in sorted(_EXCL_TERMS.items(), key=lambda kv: int(kv[0]))
    )
    xv_cte = f"xv(qid, xterm) AS (VALUES {xv})," if exclude else ""
    qd = (
        """qd AS (
  SELECT qd0.qid, qd0.term, qd0.term_idx FROM qd0
  LEFT JOIN xv ON xv.qid = qd0.qid AND xv.xterm = qd0.term
  WHERE xv.qid IS NULL
),"""
        if exclude
        else "qd AS (SELECT * FROM qd0),"
    )
    notx = (
        """
    AND NOT EXISTS (
      SELECT 1 FROM tf x JOIN xv ON xv.qid = sc.qid
      WHERE x.term = xv.xterm AND x.doc_id = sc.doc_id)"""
        if exclude
        else ""
    )
    return f"""
{_sql_queries_values()},
qd0 AS (SELECT qid, term, min(pos) AS term_idx FROM q_raw GROUP BY qid, term),
{xv_cte}
{qd}
qn AS (SELECT qid, count(*) AS nt FROM qd GROUP BY qid),
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
    ), 1.0)) AS score,
    count(*) AS nmatch
  FROM matched, stats s GROUP BY qid, doc_id
),
conj AS (
  SELECT sc.qid, sc.doc_id, sc.score
  FROM scored sc JOIN qn USING (qid)
  WHERE sc.nmatch = qn.nt{notx}
),
ranked AS (
  SELECT qid, doc_id,
    row_number() OVER (PARTITION BY qid ORDER BY floor(score * 1e9) DESC, doc_id) AS rank,
    CAST(floor(score * 1e6) AS BIGINT) AS score_e6
  FROM conj
)"""


def _bool_and_sql(exclude: bool = False) -> str:
    return f"""
WITH {_SQL_TOK},
{_conj_cte(exclude)}
SELECT qid, doc_id, rank, score_e6 FROM ranked WHERE rank <= {TOPK}
ORDER BY qid, rank"""


def _phrase_sql() -> str:
    ph = ", ".join(f"({q}, '{t}')" for q, t in ENTRY_QUERIES)
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
qd AS (SELECT qid, term, min(pos) AS term_idx FROM q_raw GROUP BY qid, term),
ph(qid, phrase) AS (VALUES {ph}),
ntext AS (
  SELECT doc_id,
         ' ' || trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) || ' ' AS s
  FROM documents
),
pdocs AS (
  SELECT ph.qid, ntext.doc_id
  FROM ph JOIN ntext ON ntext.s LIKE '% ' || ph.phrase || ' %'
),
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
conj AS (
  SELECT sc.qid, sc.doc_id, sc.score FROM scored sc JOIN pdocs USING (qid, doc_id)
),
ranked AS (
  SELECT qid, doc_id,
    row_number() OVER (PARTITION BY qid ORDER BY floor(score * 1e9) DESC, doc_id) AS rank,
    CAST(floor(score * 1e6) AS BIGINT) AS score_e6
  FROM conj
)
SELECT qid, doc_id, rank, score_e6 FROM ranked WHERE rank <= {TOPK}
ORDER BY qid, rank"""


# ---------------------------------------------------------------------------
# hybrid RRF fusion, facets, repeated-ngram span dedup (round 4 additions)

RRF_DEPTH = 50
RRF_K = 60
NGRAM_N = 8


def _bm25_ranked_depth(spark: SparkSession, sf_dir: str, depth: int) -> DataFrame:
    """Reference-quirk BM25 ranked to `depth` (qid, doc_id, rank)."""
    matched, n, avgdl = _scored_matched(spark, sf_dir)
    scored = matched.groupBy("qid", "doc_id").agg(
        bm25_finalize(
            ordered_sum(
                F.col("term_idx"),
                bm25_contrib(F.col("tf"), F.col("df"), F.col("doc_len"), n, avgdl),
            )
        ).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(
        F.floor(F.col("score") * 1e9).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= depth)
        .select("qid", "doc_id", "rank")
    )


def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 depth-50 fused with embedding-cosine depth-50
    by reciprocal-rank (operators/fusion.rrf_fuse).  The query embedding for
    qid q is deterministically the embedding of vec_id q, and embedding
    vec_ids are read as doc_ids — the harness alignment that lets one corpus
    serve both legs (same trick as the LeToR families' derived columns)."""
    from .operators.fusion import rrf_fuse
    from .operators.similarity import brute_force_topk

    bm = _bm25_ranked_depth(spark, sf_dir, RRF_DEPTH)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [q for q, _ in ENTRY_QUERIES]
    qvecs = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    ev = brute_force_topk(emb, qvecs, k=RRF_DEPTH).select(
        F.col("q_id").alias("qid"), F.col("vec_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse([bm, ev], k_rrf=RRF_K, topk=TOPK)
    return fused.select(
        "qid", "doc_id", "rank",
        F.floor(F.col("rrf_score") * 1e6).cast("long").alias("rrf_e6"),
    ).orderBy("qid", "rank")


def q_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facets over the full BM25 match set: per query, how matching docs
    distribute over the `lang` attribute (operators/facets.facet_counts)."""
    from .operators.facets import facet_counts

    matched, _, _ = _scored_matched(spark, sf_dir)
    return (
        facet_counts(matched, _docs(spark, sf_dir), "lang")
        .select("qid", F.col("facet").alias("lang"), "n_docs")
        .orderBy("qid", "lang")
    )


def q_facet_counts_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING facet path under the same oracle as facet_counts: the
    dense doc->code sidecar (index/facetstore) + id-only posting decode
    (IndexReader.facet_counts_local) instead of a Spark aggregation —
    same spec, different physical plan, both DuckDB-gated."""
    import os as _os

    from .index.facetstore import write_facet_store
    from .index.query import IndexReader
    from .parity_ext import ensure_parity_index

    idx_dir = ensure_parity_index(spark, sf_dir)
    if not _os.path.isdir(_os.path.join(idx_dir, "facets", "lang")):
        write_facet_store(_docs(spark, sf_dir), idx_dir, ["lang"])
    reader = IndexReader(spark, idx_dir)
    rows = reader.facet_counts_local(
        [(str(q), t) for q, t in ENTRY_QUERIES], "lang"
    )
    return spark.createDataFrame(
        [(int(q), v, c) for q, v, c in rows], "qid int, lang string, n_docs long"
    ).orderBy("qid", "lang")


def q_facet_counts_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drill-down facets: the facet histogram over the CONJUNCTIVE match
    set (docs containing every query term), served from the facet sidecar
    via per-term id-stream intersection (facet_counts_local mode='and').
    Oracle: HAVING count(distinct term) = |q| per (qid, doc)."""
    import os as _os

    from .index.facetstore import write_facet_store
    from .index.query import IndexReader
    from .parity_ext import ensure_parity_index

    idx_dir = ensure_parity_index(spark, sf_dir)
    if not _os.path.isdir(_os.path.join(idx_dir, "facets", "lang")):
        write_facet_store(_docs(spark, sf_dir), idx_dir, ["lang"])
    reader = IndexReader(spark, idx_dir)
    rows = reader.facet_counts_local(
        [(str(q), t) for q, t in ENTRY_QUERIES], "lang", mode="and"
    )
    return spark.createDataFrame(
        [(int(q), v, c) for q, v, c in rows], "qid int, lang string, n_docs long"
    ).orderBy("qid", "lang")


def _facet_and_sql() -> str:
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
qd AS (SELECT qid, term FROM q_raw GROUP BY qid, term),
qn AS (SELECT qid, count(*)::BIGINT AS n_terms FROM qd GROUP BY qid),
mm AS (
  SELECT qd.qid, tf.doc_id, count(DISTINCT qd.term)::BIGINT AS k
  FROM qd JOIN tf USING (term)
  GROUP BY qd.qid, tf.doc_id
),
m AS (SELECT mm.qid, mm.doc_id FROM mm JOIN qn USING (qid) WHERE mm.k = qn.n_terms),
fc AS (
  SELECT m.qid, d.lang, count(*)::BIGINT AS n_docs
  FROM m JOIN documents d USING (doc_id)
  GROUP BY m.qid, d.lang
)
SELECT qid, lang, n_docs FROM fc ORDER BY qid, lang"""


def q_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup stats (Lee et al. ACL'22 shape):
    duplicated 8-gram starts and covered-token counts per doc."""
    from .operators.ngram_dedup import repeated_ngram_stats

    return repeated_ngram_stats(
        _docs(spark, sf_dir), n=NGRAM_N, min_count=2
    ).orderBy("doc_id")


def _rrf_sql() -> str:
    qids = ", ".join(str(q) for q, _ in ENTRY_QUERIES)
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
bm25r AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
      row_number() OVER (PARTITION BY qid
                         ORDER BY floor(score * 1e9) DESC, doc_id) AS rank
    FROM scored
  ) WHERE rank <= {RRF_DEPTH}
),
q AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
  WHERE vec_id IN ({qids})
),
qe AS (
  SELECT q_id, unnest(q_vec)::DOUBLE AS x, generate_subscripts(q_vec, 1) AS i FROM q
),
ve AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
dots AS (
  SELECT qe.q_id, ve.vec_id, sum(qe.x * ve.x) AS dot
  FROM qe JOIN ve ON qe.i = ve.i GROUP BY qe.q_id, ve.vec_id
),
norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ve GROUP BY vec_id),
cos AS (
  SELECT d.q_id, d.vec_id, d.dot / (nq.nrm * nv.nrm) AS cos
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.q_id
  JOIN norms nv ON nv.vec_id = d.vec_id
  WHERE d.vec_id <> d.q_id
),
embr AS (
  SELECT q_id AS qid, vec_id AS doc_id, rank FROM (
    SELECT q_id, vec_id,
      row_number() OVER (PARTITION BY q_id
                         ORDER BY floor(cos * 1e9) DESC, vec_id ASC) AS rank
    FROM cos
  ) WHERE rank <= {RRF_DEPTH}
),
fused AS (
  SELECT coalesce(b.qid, e.qid) AS qid,
         coalesce(b.doc_id, e.doc_id) AS doc_id,
         coalesce(1.0 / ({RRF_K}.0 + b.rank::DOUBLE), 0.0)
           + coalesce(1.0 / ({RRF_K}.0 + e.rank::DOUBLE), 0.0) AS rrf_score
  FROM bm25r b FULL OUTER JOIN embr e
    ON b.qid = e.qid AND b.doc_id = e.doc_id
),
franked AS (
  SELECT qid, doc_id,
    row_number() OVER (PARTITION BY qid
                       ORDER BY floor(rrf_score * 1e9) DESC, doc_id) AS rank,
    CAST(floor(rrf_score * 1e6) AS BIGINT) AS rrf_e6
  FROM fused
)
SELECT qid, doc_id, rank, rrf_e6 FROM franked WHERE rank <= {TOPK}
ORDER BY qid, rank"""


def _facet_sql() -> str:
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
qd AS (SELECT qid, term FROM q_raw GROUP BY qid, term),
m AS (SELECT DISTINCT qd.qid, tf.doc_id FROM qd JOIN tf USING (term)),
fc AS (
  SELECT m.qid, d.lang, count(*)::BIGINT AS n_docs
  FROM m JOIN documents d USING (doc_id)
  GROUP BY m.qid, d.lang
)
SELECT qid, lang, n_docs FROM fc ORDER BY qid, lang"""


def _ngram_sql() -> str:
    n = NGRAM_N
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
tl AS (SELECT doc_id, toks, len(toks)::BIGINT AS n_tokens FROM base),
starts AS (
  SELECT doc_id, unnest(range(n_tokens - {n} + 1)) AS s, toks
  FROM tl WHERE n_tokens >= {n}
),
keys AS (
  SELECT doc_id, s,
         md5(list_aggregate(toks[s + 1:s + {n}], 'string_agg', chr(1))) AS key
  FROM starts
),
dup AS (SELECT key FROM keys GROUP BY key HAVING count(*) >= 2),
ds AS (SELECT k.doc_id, k.s FROM keys k JOIN dup USING (key)),
pdn AS (SELECT doc_id, count(*)::BIGINT AS n_dup_ngrams FROM ds GROUP BY doc_id),
cov0 AS (SELECT doc_id, s, unnest(range({n})) AS u FROM ds),
cov1 AS (SELECT DISTINCT doc_id, s + u AS pos FROM cov0),
cov AS (SELECT doc_id, count(*)::BIGINT AS n_dup_tokens FROM cov1 GROUP BY doc_id)
SELECT t.doc_id, t.n_tokens,
       coalesce(p.n_dup_ngrams, 0)::BIGINT AS n_dup_ngrams,
       coalesce(c.n_dup_tokens, 0)::BIGINT AS n_dup_tokens
FROM tl t
LEFT JOIN pdn p USING (doc_id)
LEFT JOIN cov c USING (doc_id)
ORDER BY t.doc_id"""


# ---------------------------------------------------------------------------
# round-5 consolidated rows (see parity.variant_union docstring): plan
# variants of one logical spec share a registry slot so the whole suite
# fits the driver's 50-query oracle budget.

_ANN_COLS = [
    ("q_id", "long"), ("vec_id", "long"), ("rank", "long"), ("cos_e6", "long"),
]


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three ANN paths under one row: brute-force cosine (exact
    baseline), random-hyperplane LSH (deterministic planes, oracle replays
    the identical pipeline), and IVF (deterministic k-means, nprobe-pruned)."""
    from .parity import variant_union
    from .parity_ext import q_embedding_topk, q_rp_lsh_ann

    return variant_union(
        [
            ("brute", q_embedding_topk(spark, sf_dir)),
            ("rp_lsh", q_rp_lsh_ann(spark, sf_dir)),
            ("ivf", q_ivf_ann(spark, sf_dir)),
        ],
        _ANN_COLS, ["q_id", "rank"],
    )


_FACET_COLS = [("qid", "long"), ("lang", "string"), ("n_docs", "long")]


def q_facet_counts_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three facet paths under one row: distributed Spark aggregation
    over the OR match set, the serving facet-sidecar path (same OR spec,
    different physical plan), and the serving AND-mode drill-down."""
    from .parity import variant_union

    return variant_union(
        [
            ("or_spark", q_facet_counts(spark, sf_dir)),
            ("or_serving", q_facet_counts_serving(spark, sf_dir)),
            ("and_serving", q_facet_counts_and(spark, sf_dir)),
        ],
        _FACET_COLS, ["qid", "lang"],
    )


def q_bool_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean serving under one row: conjunctive (AND) and AND-NOT."""
    from .parity import TREC_COLS, variant_union

    return variant_union(
        [
            ("and", q_bool_and_topk(spark, sf_dir)),
            ("andnot", q_bool_andnot_topk(spark, sf_dir)),
        ],
        TREC_COLS, ["qid", "rank"],
    )


def q_phrase_topk_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase serving under one row: docstore-verified and
    positional-store-verified paths (same spec, different physical plan)."""
    from .parity import TREC_COLS, variant_union

    return variant_union(
        [
            ("docstore", q_phrase_topk(spark, sf_dir)),
            ("positions", q_phrase_positional_topk(spark, sf_dir)),
        ],
        TREC_COLS, ["qid", "rank"],
    )


def q_bm25f_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fielded BM25F under one row: title/body and title/body/anchor
    (aggregated in-link anchor text as a third field)."""
    from .parity import TREC_COLS, variant_union

    return variant_union(
        [
            ("title_body", q_bm25f_topk(spark, sf_dir)),
            ("anchor", q_anchor_bm25f(spark, sf_dir)),
        ],
        TREC_COLS, ["qid", "rank"],
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "url_host_stats": q_url_host_stats,
        "url_dedup": q_url_dedup,
        "dup_clusters": q_dup_clusters,
        "sdm_bigrams": q_sdm_bigrams,
        "sdm_rerank": q_sdm_rerank,
        "ann_topk": q_ann_topk,
        "spell_correct": q_spell_correct,
        "bm25f_variants": q_bm25f_variants,
        "snippets": q_snippets,
        "autocomplete": q_autocomplete,
        "c4_clean": q_c4_clean,
        "pii_scrub": q_pii_scrub,
        "host_collapse": q_host_collapse,
        "bool_topk": q_bool_topk,
        "phrase_topk": q_phrase_topk_all,
        "rrf_hybrid": q_rrf_hybrid,
        "facet_counts": q_facet_counts_all,
        "ngram_spans": q_ngram_spans,
    }


def oracle_sql() -> dict[str, str]:
    from .parity import TREC_COLS, variant_union_sql
    from .parity_ext import _EMB_TOPK_SQL, _rp_lsh_sql

    return {
        "url_host_stats": _HOST_STATS_SQL,
        "url_dedup": _URL_DEDUP_SQL,
        "dup_clusters": _dup_clusters_sql(),
        "sdm_bigrams": _sdm_sql(),
        "sdm_rerank": _sdm_rerank_sql(),
        "ann_topk": variant_union_sql(
            [
                ("brute", _EMB_TOPK_SQL),
                ("rp_lsh", _rp_lsh_sql()),
                ("ivf", _ivf_sql()),
            ],
            _ANN_COLS, ["q_id", "rank"],
        ),
        "spell_correct": _SPELL_SQL,
        "bm25f_variants": variant_union_sql(
            [("title_body", _bm25f_sql()), ("anchor", _anchor_bm25f_sql())],
            TREC_COLS, ["qid", "rank"],
        ),
        "snippets": _snippets_sql(),
        "autocomplete": _AUTOCOMPLETE_SQL,
        "c4_clean": _C4_CLEAN_SQL,
        "pii_scrub": _pii_sql(),
        "host_collapse": _host_collapse_sql(),
        "bool_topk": variant_union_sql(
            [("and", _bool_and_sql()), ("andnot", _bool_and_sql(exclude=True))],
            TREC_COLS, ["qid", "rank"],
        ),
        "phrase_topk": variant_union_sql(
            [("docstore", _phrase_sql()), ("positions", _phrase_sql())],
            TREC_COLS, ["qid", "rank"],
        ),
        "rrf_hybrid": _rrf_sql(),
        "facet_counts": variant_union_sql(
            [
                ("or_spark", _facet_sql()),
                ("or_serving", _facet_sql()),
                ("and_serving", _facet_and_sql()),
            ],
            _FACET_COLS, ["qid", "lang"],
        ),
        "ngram_spans": _ngram_sql(),
    }
