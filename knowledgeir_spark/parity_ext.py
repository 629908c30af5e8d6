"""Extended parity suite: training-data ops + index path + eval under the
DuckDB gate.

Same contract as parity.py (column names/values must match exactly; floats
quantized to ints via floor(x*10^p)).  SQL for the hash-heavy operators
(minhash / simhash / RP-LSH) is generated programmatically from the same
constants the engine uses, so both sides share one definition.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.langid import LANG_MARKERS, detect_language
from .functions.quality import token_counts
from .operators.dedup import SIMHASH_BITS, minhash_lsh_dedup, simhash
from .operators.eval import ndcg_err_at_k
from .operators.rm3 import rm3_expansion
from .operators.similarity import brute_force_topk
from .operators.topk import topk_per_query
from .parity import (
    ENTRY_QUERIES,
    TOPK,
    _SQL_TOK,
    _doc_tf,
    _docs,
    _scored_matched,
    _sql_queries_values,
)
from .functions.scoring import bm25_contrib, bm25_finalize, ordered_sum

N_HASHES = 16
N_BANDS = 4
MINHASH_THRESHOLD = 0.5
MAX_BUCKET = 500  # LSH band-bucket cap (engine default, mirrored in SQL)

_E6 = lambda c: F.floor(c * 1e6).cast("long")  # noqa: E731


# --------------------------------------------------------------------------
# Spark side


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_lsh_dedup(
        _docs(spark, sf_dir), k=3, n_hashes=N_HASHES, n_bands=N_BANDS,
        threshold=MINHASH_THRESHOLD,
    )
    # quantize from the integer counts (floor(a*1e6/b)) so the division shape
    # matches the SQL oracle bit-for-bit
    return pairs.select(
        "doc_a", "doc_b",
        F.floor(
            F.col("n_inter") * 1e6 / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).cast("long").alias("jaccard_e6"),
    ).orderBy("doc_a", "doc_b")


def q_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_docs(spark, sf_dir)).orderBy("doc_id")


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = brute_force_topk(emb, q, k=10)
    return out.select("q_id", "vec_id", "rank", _E6(F.col("cos")).alias("cos_e6"))


def q_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features quantized from INTEGER ingredients (floor(a*1e6/b))
    so the division shape matches the SQL oracle exactly; the float-valued
    engine op (functions/quality.quality_features) is unit-tested separately."""
    dt = _doc_tf(spark, sf_dir)
    words = dt.groupBy("doc_id").agg(
        F.sum("tf").alias("n_words"),
        F.sum(F.length("term") * F.col("tf")).alias("sum_len"),
        F.max("tf").alias("max_tf"),
    )
    t = F.col("text")
    nz = F.greatest(F.length(t), F.lit(1))
    return (
        _docs(spark, sf_dir)
        .join(words, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.floor(
                F.coalesce(
                    F.col("sum_len") * 1e6 / F.greatest("n_words", F.lit(1)), F.lit(0.0)
                )
            ).cast("long").alias("mean_word_len_e6"),
            F.floor(
                F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", "")) * 1e6 / nz
            ).cast("long").alias("punct_ratio_e6"),
            F.floor(
                F.length(F.regexp_replace(t, "[^0-9]", "")) * 1e6 / nz
            ).cast("long").alias("digit_ratio_e6"),
            F.floor(
                F.length(F.regexp_replace(t, "[^A-Z]", "")) * 1e6 / nz
            ).cast("long").alias("upper_ratio_e6"),
            F.floor(
                F.coalesce(
                    F.col("max_tf") * 1e6 / F.greatest("n_words", F.lit(1)), F.lit(0.0)
                )
            ).cast("long").alias("max_word_ratio_e6"),
        )
        .orderBy("doc_id")
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens_ws", "n_tokens_bpe"
    ).orderBy("doc_id")


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return detect_language(_docs(spark, sf_dir)).orderBy("doc_id")


def _raw_bm25_ranking(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    matched, n, avgdl = _scored_matched(spark, sf_dir)
    scored = matched.groupBy("qid", "doc_id").agg(
        bm25_finalize(
            ordered_sum(
                F.col("term_idx"),
                bm25_contrib(F.col("tf"), F.col("df"), F.col("doc_len"), n, avgdl),
            )
        ).alias("score")
    )
    return topk_per_query(scored, k=k)


def q_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranking = _raw_bm25_ranking(spark, sf_dir, k=10)
    exp = rm3_expansion(ranking, _doc_tf(spark, sf_dir), n_docs=10, n_terms=10)
    return exp.select(
        "qid", "term", "exp_rank", _E6(F.col("exp_score")).alias("exp_score_e6")
    ).orderBy("qid", "exp_rank")


def _synthetic_qrels(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 7 == 0)
        .crossJoin(
            spark.createDataFrame([(q,) for q, _ in ENTRY_QUERIES], "qid long")
        )
        .select(
            "qid",
            F.col("doc_id").alias("docno"),
            ((F.col("doc_id") / 7 + F.col("qid")) % 5).cast("int").alias("label"),
        )
    )


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # quantized scores in -> identical run order in both engines
    from .parity import q_bm25_topk

    ranking = q_bm25_topk(spark, sf_dir).select(
        "qid", F.col("doc_id").alias("docno"),
        (F.col("score_e6") / 1e6).alias("score"),
    )
    per_q = ndcg_err_at_k(ranking, _synthetic_qrels(spark, sf_dir), k=TOPK)
    return per_q.select(
        "qid", _E6(F.col("ndcg")).alias("ndcg_e6"), _E6(F.col("err")).alias("err_e6")
    ).orderBy("qid")


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 30 min starts a new session): per user, session
    count + total events — the lag/cumsum window pattern, batch analog of
    streaming session windows."""
    from .parity import _pin_utc

    _pin_utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact epoch on both engines (DuckDB mirror: epoch_us)
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gaps = ev.select(
        "user_id",
        ((us - F.lag(us).over(w)) > 1800 * 1_000_000).cast("int").alias("new_sess"),
    ).select(
        "user_id", F.coalesce("new_sess", F.lit(1)).alias("new_sess")
    )
    return (
        gaps.groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


def q_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint shared-span pairs.  DuckDB oracle: the uint64
    polynomial rolling hash is replayed with HUGEINT arithmetic mod 2^64
    (_fingerprint_sql), winnowing as a ROWS-window min — value-identical to
    the numpy path (text is ASCII, so char positions == byte positions).
    The testdata's 31-word vocabulary makes char-8-gram fingerprints collide
    across almost all docs, so this is bounded to the first 100 docs with a
    high shared-count threshold (real corpora are far sparser)."""
    from .functions.fingerprint import doc_fingerprints, shared_fingerprint_pairs

    fp = doc_fingerprints(_docs(spark, sf_dir).filter(F.col("doc_id") < 100))
    return shared_fingerprint_pairs(fp, min_shared=20).orderBy("doc_a", "doc_b")


def q_rp_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH.  Recall < 1 by design but
    the algorithm is fully deterministic (md5-derived Rademacher planes), so
    the DuckDB oracle (_rp_lsh_sql) replays the identical plane/band/rerank
    pipeline and must agree exactly — approximation is part of the spec."""
    from .operators.similarity import rp_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = rp_lsh_topk(emb, q, k=10)
    return out.select("q_id", "vec_id", "rank", _E6(F.col("cos")).alias("cos_e6"))


def q_kfold_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: fold partition by key mod k (kfold_partition.py:40-45)."""
    return (
        _docs(spark, sf_dir)
        .groupBy((F.col("doc_id") % 5).cast("int").alias("fold"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("fold")
    )


_PARITY_INDEX_CACHE: dict[str, str] = {}


def ensure_parity_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) the shared simple-tokenizer parity index;
    returns its directory.  Used by the indexed parity rows here and the
    boolean/phrase serving rows in parity_web."""
    import tempfile

    from .index.build import IndexConfig, build_index

    key = os.path.abspath(sf_dir)
    if key not in _PARITY_INDEX_CACHE:
        idx_dir = os.path.join(
            tempfile.gettempdir(), "kir_parity_index_" + key.replace("/", "_")
        )
        cfg = IndexConfig(
            block_size=64, salt_range=128, n_buckets=8, tokenizer="simple"
        )
        build_index(
            spark, _docs(spark, sf_dir).select("doc_id", "text"), idx_dir, cfg,
            input_token=key,
        )
        _PARITY_INDEX_CACHE[key] = idx_dir
    return _PARITY_INDEX_CACHE[key]


def q_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The POSTING-INDEX query path under the same SQL oracle as the
    full-scan flagship: build once per sf_dir (simple tokenizer), search the
    embedded query set, emit identical columns."""
    from .index.query import IndexReader

    reader = IndexReader(spark, ensure_parity_index(spark, sf_dir))
    queries = [(str(q), text) for q, text in ENTRY_QUERIES]
    out = reader.search(queries, k=TOPK, model="bm25", prune=True)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        "doc_id", "rank", _E6(F.col("score")).alias("score_e6"),
    ).orderBy("qid", "rank")


def q_bm25_topk_impact_prewarmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two round-4 serving additions under the SAME SQL oracle as the
    flagship: an IMPACT-ordered index (block_order='impact' — blocks
    bucketed by descending tf; bound-cut-discriminative layout) served by a
    PREWARMED coordinator (IndexReader.prewarm pre-decodes head terms into
    the DecodedTermCache) through search_local.  Rank identity is layout-
    and cache-invariant by construction; this row proves it against DuckDB
    end to end."""
    import tempfile

    from .index.build import IndexConfig, build_index
    from .index.query import IndexReader

    key = os.path.abspath(sf_dir) + "#impact"
    if key not in _PARITY_INDEX_CACHE:
        idx_dir = os.path.join(
            tempfile.gettempdir(),
            "kir_parity_index_impact_" + os.path.abspath(sf_dir).replace("/", "_"),
        )
        cfg = IndexConfig(
            block_size=64, salt_range=128, n_buckets=8, tokenizer="simple",
            block_order="impact",
        )
        build_index(
            spark, _docs(spark, sf_dir).select("doc_id", "text"), idx_dir, cfg,
            input_token=key,
        )
        _PARITY_INDEX_CACHE[key] = idx_dir
    reader = IndexReader(spark, _PARITY_INDEX_CACHE[key])
    reader.prewarm(n_terms=16)
    rows = reader.search_local(
        [(str(q), text) for q, text in ENTRY_QUERIES], k=TOPK, model="bm25"
    )
    out = spark.createDataFrame(
        rows, "qid string, doc_id long, score double, rank int"
    )
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        "doc_id", "rank", _E6(F.col("score")).alias("score_e6"),
    ).orderBy("qid", "rank")


def q_decontam_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination metric: eval docs = doc_id % 7 == 3,
    train = the rest; per eval doc the fraction of its distinct 5-gram
    shingles occurring anywhere in train (operators/decontam.py)."""
    from .operators.decontam import eval_overlap_fractions

    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 7 != 3)
    evals = docs.filter(F.col("doc_id") % 7 == 3)
    return eval_overlap_fractions(train, evals, k=5).orderBy("doc_id")


def q_decontam_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination attribution pairs (train_id, eval_id, n_shared >= 2),
    same split as decontam_fractions."""
    from .operators.decontam import contamination_pairs

    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 7 != 3)
    evals = docs.filter(F.col("doc_id") % 7 == 3)
    return contamination_pairs(train, evals, k=5, min_shared=2).orderBy(
        "train_id", "eval_id"
    )


def q_repetition_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-doc repetition features over documents
    (operators/textrep.py) — integer-ratio e6 quantization, exact oracle."""
    from .operators.textrep import repetition_features

    return repetition_features(_docs(spark, sf_dir)).orderBy("doc_id")


def _gram_sql(k: int, alias: str = "g") -> str:
    """k-gram CTE over tp (token positions): (doc_id, item)."""
    joins = "\n  ".join(
        f"JOIN tp t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
        for i in range(1, k)
    )
    item = " || ' ' || ".join(f"t{i}.term" for i in range(k))
    return f"""{alias} AS (
  SELECT t0.doc_id, {item} AS item
  FROM tp t0
  {joins}
)"""


_TP_SQL = """raw AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term,
         generate_subscripts(string_split_regex(lower(text), '[^a-z0-9]+'), 1) AS ord
  FROM documents
),
tp AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
  FROM raw WHERE term <> ''
)"""


def _decontam_fractions_sql(k: int = 5) -> str:
    return f"""
WITH {_TP_SQL},
{_gram_sql(k)},
gd AS (SELECT DISTINCT doc_id, item FROM g),
tsh AS (SELECT DISTINCT item FROM gd WHERE doc_id % 7 <> 3),
esh AS (SELECT doc_id, item FROM gd WHERE doc_id % 7 = 3),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM esh GROUP BY 1),
hit AS (
  SELECT e.doc_id, count(*) AS n_overlap
  FROM esh e JOIN tsh USING (item) GROUP BY 1
)
SELECT t.doc_id, t.n_shingles, coalesce(h.n_overlap, 0) AS n_overlap,
       CAST(floor(1000000 * coalesce(h.n_overlap, 0) / t.n_shingles)
            AS BIGINT) AS overlap_frac_e6
FROM tot t LEFT JOIN hit h USING (doc_id)
ORDER BY doc_id
"""


def _decontam_pairs_sql(k: int = 5, min_shared: int = 2) -> str:
    return f"""
WITH {_TP_SQL},
{_gram_sql(k)},
gd AS (SELECT DISTINCT doc_id, item FROM g)
SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
       count(*) AS n_shared
FROM gd tr JOIN gd ev USING (item)
WHERE tr.doc_id % 7 <> 3 AND ev.doc_id % 7 = 3
GROUP BY 1, 2 HAVING count(*) >= {min_shared}
ORDER BY train_id, eval_id
"""


_REPETITION_SQL = f"""
WITH {_TP_SQL},
tok AS (
  SELECT d.doc_id, length(d.text) AS text_chars,
         count(tp.term) AS n_tokens,
         count(DISTINCT tp.term) AS n_distinct_tokens
  FROM documents d LEFT JOIN tp ON tp.doc_id = d.doc_id
  GROUP BY 1, 2
),
{_gram_sql(2, 'g2')},
{_gram_sql(3, 'g3')},
{_gram_sql(4, 'g4')},
t2 AS (SELECT doc_id, max(cnt * length(item)) AS top FROM
       (SELECT doc_id, item, count(*) AS cnt FROM g2 GROUP BY 1, 2)
       GROUP BY 1),
t3 AS (SELECT doc_id, max(cnt * length(item)) AS top FROM
       (SELECT doc_id, item, count(*) AS cnt FROM g3 GROUP BY 1, 2)
       GROUP BY 1),
t4 AS (SELECT doc_id, max(cnt * length(item)) AS top FROM
       (SELECT doc_id, item, count(*) AS cnt FROM g4 GROUP BY 1, 2)
       GROUP BY 1),
ln AS (
  SELECT doc_id, unnest(list_filter(string_split(text, chr(10)),
                                    x -> x <> '')) AS item
  FROM documents
),
lnc AS (SELECT doc_id, item, count(*) AS cnt, length(item) AS chars
        FROM ln GROUP BY 1, 2),
lagg AS (
  SELECT doc_id, sum(cnt) AS n_lines,
         coalesce(sum(CASE WHEN cnt >= 2 THEN cnt END), 0) AS dl,
         sum(cnt * chars) AS lc,
         coalesce(sum(CASE WHEN cnt >= 2 THEN cnt * chars END), 0) AS dlc
  FROM lnc GROUP BY 1
)
SELECT tok.doc_id,
       tok.n_tokens, tok.n_distinct_tokens,
       CASE WHEN tok.n_tokens > 0 THEN CAST(floor(
         1000000 * (tok.n_tokens - tok.n_distinct_tokens) / tok.n_tokens)
         AS BIGINT) ELSE 0 END AS dup_word_frac_e6,
       coalesce(lagg.n_lines, 0)::BIGINT AS n_lines,
       CASE WHEN coalesce(lagg.n_lines, 0) > 0 THEN CAST(floor(
         1000000 * lagg.dl / lagg.n_lines) AS BIGINT) ELSE 0
         END AS dup_line_frac_e6,
       CASE WHEN coalesce(lagg.lc, 0) > 0 THEN CAST(floor(
         1000000 * lagg.dlc / lagg.lc) AS BIGINT) ELSE 0
         END AS dup_line_char_frac_e6,
       CASE WHEN tok.text_chars > 0 THEN CAST(floor(
         1000000 * coalesce(t2.top, 0) / tok.text_chars) AS BIGINT)
         ELSE 0 END AS top2gram_char_frac_e6,
       CASE WHEN tok.text_chars > 0 THEN CAST(floor(
         1000000 * coalesce(t3.top, 0) / tok.text_chars) AS BIGINT)
         ELSE 0 END AS top3gram_char_frac_e6,
       CASE WHEN tok.text_chars > 0 THEN CAST(floor(
         1000000 * coalesce(t4.top, 0) / tok.text_chars) AS BIGINT)
         ELSE 0 END AS top4gram_char_frac_e6
FROM tok
LEFT JOIN lagg ON lagg.doc_id = tok.doc_id
LEFT JOIN t2 ON t2.doc_id = tok.doc_id
LEFT JOIN t3 ON t3.doc_id = tok.doc_id
LEFT JOIN t4 ON t4.doc_id = tok.doc_id
ORDER BY tok.doc_id
"""


# --------------------------------------------------------------------------
# DuckDB side (programmatically generated where hash-heavy)

_SQL_SHINGLES = """
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
sh AS (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS shingle
  FROM tp a
  JOIN tp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tp c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
)
"""


def _minhash_sql() -> str:
    mh_cols = ", ".join(
        f"min(md5('{i}:' || shingle)) AS mh_{i}" for i in range(N_HASHES)
    )
    rows = N_HASHES // N_BANDS
    band_selects = []
    for b in range(N_BANDS):
        parts = " || '|' || ".join(f"mh_{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({parts}) AS sig FROM sig"
        )
    bands = " UNION ALL ".join(band_selects)
    # mirrors minhash_lsh_dedup defaults: stop-shingle cut at
    # max(n_docs//2, 3) df, band buckets capped at MAX_BUCKET; signatures
    # AND the exact-Jaccard verification both run on the cut shingle set
    return f"""
WITH {_SQL_SHINGLES},
shf AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) <= greatest((SELECT count(*) // 2 FROM documents), 3)
       ) ok USING (shingle)
),
sig AS (SELECT doc_id, {mh_cols} FROM shf GROUP BY doc_id),
bands0 AS ({bands}),
bands AS (
  SELECT doc_id, band, sig FROM (
    SELECT doc_id, band, sig,
           count(*) OVER (PARTITION BY band, sig) AS bsz
    FROM bands0
  ) WHERE bsz <= {MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_i
  FROM cand c
  JOIN shf s1 ON s1.doc_id = c.doc_a
  JOIN shf s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(floor(i.n_i * 1e6 / (na.n_sh + nb.n_sh - i.n_i)) AS BIGINT) AS jaccard_e6
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE i.n_i * 1.0 / (na.n_sh + nb.n_sh - i.n_i) >= {MINHASH_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def _simhash_sql() -> str:
    # 64-bit simhash, two 32-bit md5 halves (hi = hex 1-8, lo = hex 9-16);
    # HUGEINT recombination then two's-complement fold into signed BIGINT
    # (bit 63 is the sign bit), matching the engine's shiftleft(hi,32)|lo
    def bit(j: int) -> str:
        return f"((h_lo >> {j}) & 1)" if j < 32 else f"((h_hi >> {j - 32}) & 1)"

    bit_sums = ", ".join(
        f"sum(tf * ({bit(j)} * 2 - 1)) AS b{j}" for j in range(SIMHASH_BITS)
    )
    recombine = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j}::HUGEINT ELSE 0::HUGEINT END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH {_SQL_TOK},
h AS (
  SELECT doc_id, tf,
         ('0x' || substring(md5(term), 1, 8))::BIGINT AS h_hi,
         ('0x' || substring(md5(term), 9, 8))::BIGINT AS h_lo
  FROM tf
),
sums AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id),
raw AS (SELECT doc_id, ({recombine}) AS s FROM sums)
SELECT doc_id,
       CAST(CASE WHEN s >= {1 << 63}::HUGEINT THEN s - {1 << 64}::HUGEINT
                 ELSE s END AS BIGINT) AS simhash
FROM raw ORDER BY doc_id
"""


_EMB_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5
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
ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY floor(cos * 1e9) DESC, vec_id ASC) AS rank,
         CAST(floor(cos * 1e6) AS BIGINT) AS cos_e6
  FROM cos
)
SELECT q_id, vec_id, rank, cos_e6 FROM ranked WHERE rank <= 10
ORDER BY q_id, rank
"""

_QUALITY_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tokf AS (SELECT doc_id, term FROM tok WHERE term <> ''),
wsx AS (
  SELECT t.doc_id, count(*)::BIGINT AS n_words, sum(len(t.term))::BIGINT AS sum_len
  FROM tokf t GROUP BY t.doc_id
),
mx AS (
  SELECT doc_id, max(cnt)::BIGINT AS max_tf
  FROM (SELECT doc_id, term, count(*) AS cnt FROM tokf GROUP BY doc_id, term)
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(w.n_words, 0) AS n_words,
       CAST(floor(coalesce(w.sum_len * 1e6 / greatest(w.n_words, 1), 0)) AS BIGINT)
         AS mean_word_len_e6,
       CAST(floor(len(regexp_replace(d.text, '[a-zA-Z0-9\s]', '', 'g')) * 1e6
                  / greatest(len(d.text), 1)) AS BIGINT) AS punct_ratio_e6,
       CAST(floor(len(regexp_replace(d.text, '[^0-9]', '', 'g')) * 1e6
                  / greatest(len(d.text), 1)) AS BIGINT) AS digit_ratio_e6,
       CAST(floor(len(regexp_replace(d.text, '[^A-Z]', '', 'g')) * 1e6
                  / greatest(len(d.text), 1)) AS BIGINT) AS upper_ratio_e6,
       CAST(floor(coalesce(m.max_tf * 1e6 / greatest(w.n_words, 1), 0)) AS BIGINT)
         AS max_word_ratio_e6
FROM documents d
LEFT JOIN wsx w ON w.doc_id = d.doc_id
LEFT JOIN mx m ON m.doc_id = d.doc_id
ORDER BY d.doc_id
"""

_TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens_ws,
       len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+'))
         AS n_tokens_bpe
FROM documents ORDER BY doc_id
"""


def _langid_sql() -> str:
    rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang, ws in LANG_MARKERS.items()
        for w in sorted(set(ws))
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tokf AS (SELECT doc_id, term FROM tok WHERE term <> ''),
totals AS (SELECT doc_id, count(*) AS n_tokens FROM tokf GROUP BY doc_id),
markers(m_lang, term) AS (VALUES {rows}),
hits AS (
  SELECT t.doc_id, m.m_lang, count(*) AS hits
  FROM tokf t JOIN markers m ON t.term = m.term
  GROUP BY t.doc_id, m.m_lang
),
best AS (
  SELECT doc_id, m_lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, m_lang ASC) AS r
  FROM hits
)
SELECT tt.doc_id,
       coalesce(b.m_lang, 'und') AS pred_lang,
       coalesce(b.hits, 0) AS marker_hits,
       tt.n_tokens
FROM totals tt LEFT JOIN (SELECT * FROM best WHERE r = 1) b ON b.doc_id = tt.doc_id
ORDER BY tt.doc_id
"""


def _bm25_ranked_cte() -> str:
    """Shared CTE chain producing the RAW-score bm25 ranking (rank<=10)."""
    return f"""
{_SQL_TOK},
{_sql_queries_values()},
qd AS (SELECT qid, term, min(pos) AS term_idx FROM q_raw GROUP BY qid, term),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(doc_len) FROM dl)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl
),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
matched AS (
  SELECT qd.qid, tf.doc_id, tf.tf::DOUBLE AS tf, dl.doc_len AS doc_len, dfs.df
  FROM qd
  JOIN tf USING (term) JOIN dfs USING (term) JOIN dl ON tf.doc_id = dl.doc_id
),
scored AS (
  SELECT qid, doc_id,
    ln(greatest(sum(
      greatest((s.n - df + 0.5) / (df + 0.5), 1.0)
      * (tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * doc_len::DOUBLE / s.avgdl)))
      * greatest(ln(greatest((s.n - df + 0.5) / (df + 0.5), 1.0)), 0.0)
    ), 1.0)) AS score
  FROM matched, stats s GROUP BY qid, doc_id
),
ranking AS (
  SELECT qid, doc_id, score,
    row_number() OVER (PARTITION BY qid
                       ORDER BY floor(score * 1e9) DESC, doc_id) AS rank
  FROM scored
)
"""


def _rm3_sql() -> str:
    return f"""
WITH {_bm25_ranked_cte()},
top AS (SELECT * FROM ranking WHERE rank <= 10),
exp AS (
  SELECT t.qid, tf.term,
         sum(tf.tf::DOUBLE / dl.doc_len * t.score) AS exp_score
  FROM top t
  JOIN tf ON tf.doc_id = t.doc_id
  JOIN dl ON dl.doc_id = t.doc_id
  GROUP BY t.qid, tf.term
),
eranked AS (
  SELECT qid, term, exp_score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY floor(exp_score * 1e9) DESC, term ASC)
           AS exp_rank
  FROM exp
)
SELECT qid, term, exp_rank, CAST(floor(exp_score * 1e6) AS BIGINT) AS exp_score_e6
FROM eranked WHERE exp_rank <= 10 ORDER BY qid, exp_rank
"""


def _ndcg_sql() -> str:
    qids = ", ".join(f"({q})" for q, _ in ENTRY_QUERIES)
    return f"""
WITH {_bm25_ranked_cte()},
run AS (
  SELECT qid, doc_id AS docno, floor(score * 1e6) / 1e6 AS qscore
  FROM ranking WHERE rank <= {TOPK}
),
qrels AS (
  SELECT q.qid, d.doc_id AS docno,
         CAST((d.doc_id / 7 + q.qid) % 5 AS INT) AS label
  FROM documents d, (VALUES {qids}) q(qid)
  WHERE d.doc_id % 7 = 0
),
run_pos AS (
  SELECT qid, docno, qscore,
         row_number() OVER (PARTITION BY qid
                            ORDER BY qscore DESC, docno DESC) AS pos
  FROM run
),
gains AS (
  SELECT r.qid, r.pos, coalesce(q.label, 0)::DOUBLE AS g,
         (pow(2.0, coalesce(q.label, 0)) - 1) AS gain,
         (pow(2.0, coalesce(q.label, 0)) - 1) / 16.0 AS r
  FROM run_pos r LEFT JOIN qrels q ON q.qid = r.qid AND q.docno = r.docno
  WHERE r.pos <= {TOPK}
),
decayed AS (
  SELECT qid, pos, gain, r,
         exp(coalesce(sum(ln(1 - r)) OVER (PARTITION BY qid ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)) AS decay
  FROM gains
),
per_q AS (
  SELECT qid, sum(gain / log2(pos + 1)) AS dcg,
         sum(r * decay / pos) AS err
  FROM decayed GROUP BY qid
),
ideal AS (
  SELECT qid, sum((pow(2.0, label) - 1) / log2(pos + 1)) AS idcg
  FROM (
    SELECT qid, label,
           row_number() OVER (PARTITION BY qid ORDER BY label DESC) AS pos
    FROM qrels
  ) WHERE pos <= {TOPK}
  GROUP BY qid
)
SELECT i.qid,
       CAST(floor(CASE WHEN i.idcg > 0
                       THEN coalesce(p.dcg, 0) / i.idcg ELSE 0 END * 1e6) AS BIGINT)
         AS ndcg_e6,
       CAST(floor(coalesce(p.err, 0) * 1e6) AS BIGINT) AS err_e6
FROM ideal i LEFT JOIN per_q p ON p.qid = i.qid
ORDER BY i.qid
"""


def _fingerprint_sql() -> str:
    """Replay functions/fingerprint.py in SQL: uint64 polynomial rolling
    hash of char 8-grams (HUGEINT arithmetic mod 2^64 — powers of the base
    precomputed in Python), winnowing = distinct min-per-4-window (the
    engine dedups by VALUE, so rightmost-vs-leftmost min is immaterial),
    then the shared-fingerprint pair join.  Bit-identical because the
    testdata text is ASCII (char positions == UTF-8 byte positions)."""
    from .functions.fingerprint import K_GRAM, WINDOW, _BASE

    k, w, mod = K_GRAM, WINDOW, 2 ** 64
    powers = [0] * k
    powers[k - 1] = 1
    for i in range(k - 2, -1, -1):
        powers[i] = (powers[i + 1] * int(_BASE)) % mod
    terms = " + ".join(
        (f"c * {powers[0]}::HUGEINT" if j == 0
         else f"lead(c, {j}) OVER w * {powers[j]}::HUGEINT")
        for j in range(k)
    )
    return f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
pos AS (SELECT doc_id, text, unnest(range(1, length(text)+1)) AS i FROM d),
codes AS (SELECT doc_id, i, unicode(substr(text, i::INT, 1))::HUGEINT AS c FROM pos),
kg AS (
  SELECT doc_id, i AS p, ({terms}) % {mod}::HUGEINT AS h,
         count(*) OVER (PARTITION BY doc_id) AS n_chars
  FROM codes WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
kgv AS (SELECT doc_id, p, h FROM kg WHERE p <= n_chars - {k - 1}),
wins AS (
  SELECT doc_id, p,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mh,
         count(*) OVER (PARTITION BY doc_id) AS n_kg
  FROM kgv
),
fps AS (SELECT DISTINCT doc_id, mh FROM wins WHERE p <= greatest(n_kg - {w - 1}, 1))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
FROM fps a JOIN fps b ON a.mh = b.mh AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 20
ORDER BY doc_a, doc_b
"""


def _rp_lsh_sql(
    n_planes: int = 64, n_bands: int = 16, n_probes: int = 16, dim: int = 64
) -> str:
    """Replay operators/similarity.rp_lsh_topk (at its SHIPPED defaults,
    including multi-probe) in SQL: md5-derived Rademacher planes (sign =
    bit 0 of digest byte 0 = parity of md5 hex char 2), per-band sign-bit
    values, query-side probes = exact bands plus the single-bit flips of the
    `n_probes` globally-lowest-|dot| planes (ties by plane index, matching
    numpy's stable argsort), band-bucket candidate join, exact cosine
    re-rank with the floor(cos*1e9) rank key."""
    rows = n_planes // n_bands
    odd = "('1','3','5','7','9','b','d','f')"
    return f"""
WITH pl AS (
  SELECT p.p, d.d,
         CASE WHEN substr(md5(p.p::VARCHAR || ':' || d.d::VARCHAR), 2, 1)
              IN {odd} THEN 1.0 ELSE -1.0 END AS s
  FROM (SELECT unnest(range(0,{n_planes})) AS p) p,
       (SELECT unnest(range(0,{dim})) AS d) d
),
ve AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS x,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
dots AS (
  SELECT ve.vec_id, pl.p, sum(ve.x * pl.s) AS dot
  FROM ve JOIN pl ON pl.d = ve.d GROUP BY ve.vec_id, pl.p
),
bands AS (
  SELECT vec_id, (p // {rows})::INT AS b,
         sum(CASE WHEN dot > 0 THEN 1 << (p % {rows}) ELSE 0 END)::BIGINT AS v
  FROM dots GROUP BY vec_id, p // {rows}
),
qflip AS (
  SELECT vec_id, p, (p // {rows})::INT AS b, (1 << (p % {rows}))::BIGINT AS fbit,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY abs(dot) ASC, p ASC) AS rn
  FROM dots WHERE vec_id < 5
),
qprobes AS (
  SELECT vec_id, b, v FROM bands WHERE vec_id < 5
  UNION
  SELECT f.vec_id, f.b, xor(bb.v, f.fbit) AS v
  FROM qflip f JOIN bands bb ON bb.vec_id = f.vec_id AND bb.b = f.b
  WHERE f.rn <= {n_probes}
),
cand AS (
  SELECT DISTINCT qb.vec_id AS q_id, vb.vec_id AS vec_id
  FROM bands vb JOIN qprobes qb ON vb.b = qb.b AND vb.v = qb.v
  WHERE vb.vec_id <> qb.vec_id
),
norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ve GROUP BY vec_id),
pdots AS (
  SELECT c.q_id, c.vec_id, sum(a.x * b.x) AS dot
  FROM cand c
  JOIN ve a ON a.vec_id = c.q_id
  JOIN ve b ON b.vec_id = c.vec_id AND b.d = a.d
  GROUP BY c.q_id, c.vec_id
),
cos AS (
  SELECT p.q_id, p.vec_id, p.dot / (nq.nrm * nv.nrm) AS cos
  FROM pdots p
  JOIN norms nq ON nq.vec_id = p.q_id
  JOIN norms nv ON nv.vec_id = p.vec_id
),
ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY floor(cos * 1e9) DESC, vec_id ASC) AS rank,
         CAST(floor(cos * 1e6) AS BIGINT) AS cos_e6
  FROM cos
)
SELECT q_id, vec_id, rank, cos_e6 FROM ranked WHERE rank <= 10
ORDER BY q_id, rank
"""


_KFOLD_SQL = """
SELECT CAST(doc_id % 5 AS INT) AS fold, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY 1 ORDER BY fold
"""


# ---------------------------------------------------------------------------
# round-5 consolidated rows: physical-plan / scoring variants of one logical
# spec share a registry slot (variant column) so the whole suite fits the
# driver's 50-query oracle budget — every operator stays DuckDB-gated.


def q_bm25_index_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three non-flagship BM25 paths under one row: posting-index
    distributed search, impact-ordered + prewarmed local serving, and the
    ES-prefetched-stats variant."""
    from .parity import TREC_COLS, variant_union

    return variant_union(
        [
            ("indexed", q_bm25_topk_indexed(spark, sf_dir)),
            ("impact_prewarmed", q_bm25_topk_impact_prewarmed(spark, sf_dir)),
            ("es_stats", q_es_bm25(spark, sf_dir)),
        ],
        TREC_COLS, ["qid", "rank"],
    )


_TEXT_FEATURES_LONGS = [
    "n_words", "mean_word_len_e6", "punct_ratio_e6", "digit_ratio_e6",
    "upper_ratio_e6", "max_word_ratio_e6", "n_tokens_ws", "n_tokens_bpe",
    "marker_hits", "n_tokens",
]


def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc text-analysis panel under one row: quality features +
    whitespace/BPE-ish token counts + language-ID, joined on doc_id (inner:
    langid only emits docs with >= 1 token, mirrored in the oracle)."""
    out = (
        q_quality_features(spark, sf_dir)
        .join(q_token_counts(spark, sf_dir), "doc_id")
        .join(q_langid(spark, sf_dir), "doc_id")
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[F.col(c).cast("long").alias(c) for c in _TEXT_FEATURES_LONGS],
        "pred_lang",
    ).orderBy("doc_id")


def _text_features_sql() -> str:
    longs = ", ".join(
        f"{c}::BIGINT AS {c}" for c in _TEXT_FEATURES_LONGS
    )
    return f"""
SELECT doc_id::BIGINT AS doc_id, {longs}, pred_lang
FROM ({_QUALITY_SQL}) AS q
JOIN ({_TOKEN_COUNTS_SQL}) AS t USING (doc_id)
JOIN ({_langid_sql()}) AS l USING (doc_id)
ORDER BY doc_id"""


def q_letor_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two LM-model LeToR families (Les, QDocEText) under one row."""
    from .parity import variant_union

    return variant_union(
        [
            ("les", q_les_lm(spark, sf_dir)),
            ("qdetext", q_qdetext_lm(spark, sf_dir)),
        ],
        [("qid", "long"), ("docno", "string"), ("feature", "string"),
         ("value_e6", "long")],
        ["qid", "docno", "feature"],
    )


def q_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pair detectors under one row: MinHash-LSH Jaccard
    pairs (value = jaccard_e6) and winnowing-fingerprint shared-span pairs
    (value = n_shared fingerprints)."""
    from .parity import variant_union

    return variant_union(
        [
            ("minhash", q_minhash_pairs(spark, sf_dir)
             .withColumnRenamed("jaccard_e6", "value")),
            ("winnow", q_fingerprint_pairs(spark, sf_dir)
             .withColumnRenamed("n_shared", "value")),
        ],
        [("doc_a", "long"), ("doc_b", "long"), ("value", "long")],
        ["doc_a", "doc_b"],
    )


def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination under one row.  variant='frac': id_a =
    eval doc, (v1, v2, v3) = (n_shingles, n_overlap, overlap_frac_e6),
    id_b = -1.  variant='pairs': (id_a, id_b) = (train_id, eval_id),
    v1 = n_shared, v2 = v3 = 0."""
    from .parity import variant_union

    frac = q_decontam_fractions(spark, sf_dir).select(
        F.col("doc_id").alias("id_a"), F.lit(-1).alias("id_b"),
        F.col("n_shingles").alias("v1"), F.col("n_overlap").alias("v2"),
        F.col("overlap_frac_e6").alias("v3"),
    )
    pairs = q_decontam_pairs(spark, sf_dir).select(
        F.col("train_id").alias("id_a"), F.col("eval_id").alias("id_b"),
        F.col("n_shared").alias("v1"), F.lit(0).alias("v2"),
        F.lit(0).alias("v3"),
    )
    return variant_union(
        [("frac", frac), ("pairs", pairs)],
        [("id_a", "long"), ("id_b", "long"), ("v1", "long"), ("v2", "long"),
         ("v3", "long")],
        ["id_a", "id_b"],
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "neardup_pairs": q_neardup_pairs,
        "simhash_docs": q_simhash_docs,
        "text_features": q_text_features,
        "rm3_expansion": q_rm3_expansion,
        "ndcg_eval": q_ndcg_eval,
        "kfold_counts": q_kfold_counts,
        "bm25_index_variants": q_bm25_index_variants,
        "decontam": q_decontam,
        "repetition_features": q_repetition_features,
        "user_sessions": q_user_sessions,
        "sig_test": q_sig_test,
        "boe_emb_bins": q_boe_emb_bins,
        "salience_eval": q_salience_eval,
        "letor_lm": q_letor_lm,
        "windowed_events": q_windowed_events,
        "esr_bins": q_esr_bins,
        "pretrain": q_pretrain,
        "pagerank": q_pagerank,
    }


def oracle_sql() -> dict[str, str]:
    from .parity import TREC_COLS, _bm25_sql, variant_union_sql

    pair_cols = [("doc_a", "long"), ("doc_b", "long"), ("value", "long")]
    decontam_cols = [
        ("id_a", "long"), ("id_b", "long"), ("v1", "long"), ("v2", "long"),
        ("v3", "long"),
    ]
    return {
        "neardup_pairs": variant_union_sql(
            [
                ("minhash",
                 "SELECT doc_a, doc_b, jaccard_e6 AS value FROM ("
                 + _minhash_sql() + ") AS mh"),
                ("winnow",
                 "SELECT doc_a, doc_b, n_shared AS value FROM ("
                 + _fingerprint_sql() + ") AS fp"),
            ],
            pair_cols, ["doc_a", "doc_b"],
        ),
        "simhash_docs": _simhash_sql(),
        "text_features": _text_features_sql(),
        "rm3_expansion": _rm3_sql(),
        "ndcg_eval": _ndcg_sql(),
        "kfold_counts": _KFOLD_SQL,
        "bm25_index_variants": variant_union_sql(
            [
                ("indexed", _bm25_sql()),
                ("impact_prewarmed", _bm25_sql()),
                ("es_stats", _es_bm25_sql()),
            ],
            TREC_COLS, ["qid", "rank"],
        ),
        "decontam": variant_union_sql(
            [
                ("frac",
                 "SELECT doc_id AS id_a, -1 AS id_b, n_shingles AS v1, "
                 "n_overlap AS v2, overlap_frac_e6 AS v3 FROM ("
                 + _decontam_fractions_sql() + ") AS df"),
                ("pairs",
                 "SELECT train_id AS id_a, eval_id AS id_b, n_shared AS v1, "
                 "0 AS v2, 0 AS v3 FROM ("
                 + _decontam_pairs_sql() + ") AS dp"),
            ],
            decontam_cols, ["id_a", "id_b"],
        ),
        "repetition_features": _REPETITION_SQL,
        "user_sessions": """
WITH g AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
              THEN 1
              WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL THEN 1
              ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, sum(new_sess)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events
FROM g GROUP BY user_id ORDER BY user_id""",
        "sig_test": _sig_test_sql(),
        "boe_emb_bins": _boe_emb_sql(),
        "salience_eval": _salience_sql(),
        "letor_lm": variant_union_sql(
            [("les", _les_lm_sql()), ("qdetext", _qdetext_lm_sql())],
            [("qid", "long"), ("docno", "string"), ("feature", "string"),
             ("value_e6", "long")],
            ["qid", "docno", "feature"],
        ),
        "windowed_events": _WINDOWED_EVENTS_SQL,
        "esr_bins": _esr_sql(),
        "pretrain": _pretrain_sql(),
        "pagerank": _pagerank_sql(),
    }


# --------------------------------------------------------------------------
# round-2 additions: randomization significance test + a LeToR family


SIG_TRIALS = 400
SIG_SEED = 7


def q_sig_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 randomization significance test (result_collect/base.py:7-38) over
    deterministic per-query metric pairs derived from doc_ids.  Deltas are
    INTEGER-valued doubles so the permutation sums are exact in any engine
    (no float-order sensitivity on the strict > comparison)."""
    from .operators.eval import randomization_test

    per_q = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < 30)
        .select(
            F.col("doc_id").cast("string").alias("qid"),
            ((F.col("doc_id") * 7) % 13).cast("double").alias("target"),
            ((F.col("doc_id") * 5) % 11).cast("double").alias("base"),
        )
    )
    out = randomization_test(per_q, n_trials=SIG_TRIALS, seed=SIG_SEED)
    return out.select(
        F.floor(F.col("p_value") * 1e6).cast("long").alias("p_e6"),
        F.col("win").cast("long").alias("win"),
        F.col("tie").cast("long").alias("tie"),
        F.col("loss").cast("long").alias("loss"),
    )


def _sig_test_sql() -> str:
    return f"""
WITH dq AS (
  SELECT doc_id::VARCHAR AS qid,
         ((doc_id * 7) % 13)::DOUBLE AS t,
         ((doc_id * 5) % 11)::DOUBLE AS b
  FROM documents WHERE doc_id < 30
),
obs AS (
  SELECT avg(t - b) AS diff,
         sum((round(t, 3) > round(b, 3))::INT)::BIGINT AS win,
         sum((round(t, 3) = round(b, 3))::INT)::BIGINT AS tie,
         sum((round(t, 3) < round(b, 3))::INT)::BIGINT AS loss
  FROM dq
),
trials AS (SELECT unnest(range(0, {SIG_TRIALS})) AS trial),
grid AS (
  SELECT trial,
         CASE WHEN ('0x' || substr(md5('{SIG_SEED}:' || trial || ':' || qid), 1, 1))::BIGINT % 2 = 1
              THEN -(t - b) ELSE (t - b) END AS sd
  FROM dq, trials
),
pt AS (SELECT trial, avg(sd) AS td FROM grid GROUP BY trial),
cnt AS (SELECT count(*) FILTER (WHERE pt.td > obs.diff)::BIGINT AS c FROM pt, obs)
SELECT CAST(floor(c * 2500.0) AS BIGINT) AS p_e6, win, tie, loss
FROM cnt, obs
"""


BOE_BINS = None  # set lazily from letor_families.form_bins


def q_boe_emb_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BoeEmb LeToR family (BoeEmb.py:94-139) under the DuckDB gate: doc
    'entities' = terms with tf>=3 (deterministic pseudo-annotations), query
    entities = the embedded query set's terms, entity embedding = the
    embeddings table row at md5(term) % n_vectors.  Max/mean sim bins,
    log-binned, one long-form feature row per (pair, pool, bin)."""
    from .operators.letor_families import boe_emb_features, form_bins

    dt = _doc_tf(spark, sf_dir)
    d_ents = dt.filter((F.col("tf") >= 3) & (F.col("doc_id") < 40)).select(
        "doc_id", F.lit("bodyText").alias("field"), F.col("term").alias("e")
    )
    q_rows = sorted({(str(q), t) for q, text in ENTRY_QUERIES
                     for t in text.lower().split()})
    q_ents = spark.createDataFrame(q_rows, "qid string, e string")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    all_terms = d_ents.select("e").union(q_ents.select("e")).distinct()
    ent_emb = (
        all_terms.withColumn(
            "vec_id",
            F.conv(F.substring(F.md5(F.col("e").cast("binary")), 1, 8), 16, 10)
            .cast("long") % n_vec,
        )
        .join(emb, "vec_id")
        .select("e", F.col("embedding").alias("vector"))
    )
    pairs = q_ents.select("qid").distinct().crossJoin(
        d_ents.select("doc_id").distinct()
    )
    feats = boe_emb_features(
        pairs, q_ents, d_ents, ent_emb,
        bins=form_bins(6, 1.0), bin_func="log", pools=("max", "mean"),
    )
    return feats.select(
        F.col("qid").cast("long").alias("qid"), "docno", "feature",
        F.floor(F.col("value") * 1e6).cast("long").alias("value_e6"),
    ).orderBy("qid", "docno", "feature")


def _boe_emb_sql() -> str:
    from .operators.letor_families import form_bins

    bins = form_bins(6, 1.0)
    case = "CASE " + " ".join(
        f"WHEN s >= {b!r} THEN {i}" for i, b in enumerate(bins)
    ) + " ELSE -1 END"
    bins_vals = ", ".join(f"({i})" for i in range(len(bins)))
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
dents AS (SELECT doc_id, term AS e FROM tf WHERE tf >= 3 AND doc_id < 40),
qents AS (SELECT DISTINCT qid, term AS e FROM q_raw),
allt AS (SELECT DISTINCT e FROM (SELECT e FROM dents UNION SELECT e FROM qents)),
nv AS (SELECT count(*) AS n FROM embeddings),
ev AS (
  SELECT a.e, emb.embedding
  FROM allt a CROSS JOIN nv
  JOIN embeddings emb
    ON emb.vec_id = ('0x' || substr(md5(a.e), 1, 8))::BIGINT % nv.n
),
ex AS (
  SELECT e, unnest(embedding)::DOUBLE AS x,
         generate_subscripts(embedding, 1) AS i
  FROM ev
),
norms AS (SELECT e, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY e),
need AS (
  SELECT DISTINCT q.e AS qe, d.e AS de FROM qents q CROSS JOIN dents d
),
dots AS (
  SELECT n.qe, n.de, sum(a.x * b.x) AS dot
  FROM need n JOIN ex a ON a.e = n.qe JOIN ex b ON b.e = n.de AND b.i = a.i
  GROUP BY n.qe, n.de
),
vecs AS (SELECT e, embedding FROM ev),
cosv AS (
  SELECT d.qe, d.de,
         CASE WHEN vq.embedding = vd.embedding THEN 1.0
              ELSE d.dot / (nq.nrm * nd.nrm) END AS cos
  FROM dots d
  JOIN norms nq ON nq.e = d.qe JOIN norms nd ON nd.e = d.de
  JOIN vecs vq ON vq.e = d.qe JOIN vecs vd ON vd.e = d.de
),
persim AS (
  SELECT q.qid, dd.doc_id, dd.e,
         max(c.cos) AS sim_max, avg(c.cos) AS sim_mean
  FROM qents q
  JOIN cosv c ON c.qe = q.e
  JOIN dents dd ON dd.e = c.de
  GROUP BY q.qid, dd.doc_id, dd.e
),
stacked AS (
  SELECT qid, doc_id, 'Max' AS pool, sim_max AS s FROM persim
  UNION ALL
  SELECT qid, doc_id, 'Mean' AS pool, sim_mean AS s FROM persim
),
binned AS (
  SELECT qid, doc_id, pool, {case} AS b FROM stacked
),
counts AS (
  SELECT qid, doc_id, pool, b, count(*)::DOUBLE AS cnt
  FROM binned WHERE b >= 0 GROUP BY qid, doc_id, pool, b
),
template AS (
  SELECT DISTINCT s.qid, s.doc_id, s.pool, bb.b
  FROM stacked s CROSS JOIN (VALUES {bins_vals}) bb(b)
),
dense AS (
  SELECT t.qid, t.doc_id, t.pool, t.b, coalesce(c.cnt, 0.0) AS cnt
  FROM template t
  LEFT JOIN counts c
    ON c.qid = t.qid AND c.doc_id = t.doc_id AND c.pool = t.pool AND c.b = t.b
)
SELECT qid::BIGINT AS qid, doc_id::VARCHAR AS docno,
       'BoeEmb_Bodytext_' || pool || 'Bin_' || b AS feature,
       CAST(floor(ln(greatest(cnt, 1e-10)) * 1e6) AS BIGINT) AS value_e6
FROM dense
ORDER BY qid, docno, feature
"""


# --------------------------------------------------------------------------
# round-3 addition: salience metric suite (p@k / r@k / precision / recall /
# accuracy / ROC AUC), ref salience/utils/evaluation.py:34-116


def q_salience_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SalienceEva over a deterministic synthetic salience task on the
    documents table: entities = the doc's terms, score = tf + len(term)/10
    (engineered to produce cross-term score ties, exercising the stable
    sort and the tie-averaged AUC ranks), gold label = len(term) >= 5."""
    from .operators.eval import salience_metrics
    from .parity import _doc_tf

    ents = _doc_tf(spark, sf_dir).select(
        "doc_id",
        "term",
        (F.col("tf") + F.length("term") / F.lit(10.0)).alias("score"),
        F.when(F.length("term") >= 5, F.lit(1)).otherwise(F.lit(0)).alias("label"),
    )
    m = salience_metrics(ents, order_col="term")
    cols = [F.col("doc_id")] + [
        F.floor(F.col(c) * F.lit(1000000.0)).cast("long").alias(f"{c}_e6")
        for c in m.columns
        if c != "doc_id"
    ]
    return m.select(*cols).orderBy("doc_id")


def _salience_sql() -> str:
    from .parity import _SQL_TOK

    depths = (1, 5, 10, 20)
    c_cols = ",\n         ".join(
        f"sum(CASE WHEN rn <= {k} AND pos = 1 THEN 1 ELSE 0 END) AS c_{k}"
        for k in depths
    )
    p_cols = ",\n  ".join(
        f"CAST(floor(c_{k} / {k} * 1000000.0) AS BIGINT) AS p_at_{k:02d}_e6"
        for k in depths
    )
    r_cols = ",\n  ".join(
        f"CAST(floor(c_{k} / greatest(n_pos, 1) * 1000000.0) AS BIGINT)"
        f" AS r_at_{k:02d}_e6"
        for k in depths
    )
    return f"""
WITH {_SQL_TOK},
ents AS (
  SELECT doc_id, term, tf + length(term) / 10.0 AS score,
         CASE WHEN length(term) >= 5 THEN 1 ELSE 0 END AS pos
  FROM tf
),
ranked AS (
  SELECT doc_id, score, pos,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn,
         2 * rank() OVER (PARTITION BY doc_id ORDER BY score ASC)
           + count(*) OVER (PARTITION BY doc_id, score) - 1 AS rank2
  FROM ents
),
agg AS (
  SELECT doc_id, sum(pos) AS n_pos, count(*) AS n,
         sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS n_pred,
         sum(CASE WHEN score > 0 AND pos = 1 THEN 1 ELSE 0 END) AS n_hit,
         sum(CASE WHEN pos = 1 THEN rank2 ELSE 0 END) AS pos_rank2,
         {c_cols}
  FROM ranked GROUP BY doc_id
)
SELECT doc_id,
  {p_cols},
  {r_cols},
  CAST(floor(n_hit / greatest(n_pred, 1) * 1000000.0) AS BIGINT) AS precision_e6,
  CAST(floor(n_hit / greatest(n_pos, 1) * 1000000.0) AS BIGINT) AS recall_e6,
  CAST(floor(n_hit / greatest(n, 1) * 1000000.0) AS BIGINT) AS accuracy_e6,
  CAST(floor((CASE WHEN n_pos = 0 THEN 0.0 WHEN n_pos = n THEN 1.0
       ELSE (pos_rank2 - n_pos * (n_pos + 1)) / (2 * n_pos * (n - n_pos))
       END) * 1000000.0) AS BIGINT) AS auc_e6
FROM agg
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# round-3 addition: Les family (lm model) under the DuckDB gate


def q_les_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Les LeToR family (les.py:65-106) with the deterministic-entity trick:
    query entities = the query's terms, each entity's `name` text = the term
    itself, so the pseudo-query LM is a single-term vector and the family's
    full pipeline (pseudo-query construction, completed-frame smoothing of
    zero-overlap pairs, mean pooling over the query's entities) runs under
    the SQL oracle with the `lm` model."""
    from .operators.corpus_stats import term_stats
    from .operators.letor_families import les_features

    dt = _doc_tf(spark, sf_dir)
    docs40 = dt.filter(F.col("doc_id") < 40)
    q_rows = sorted({(str(q), t) for q, text in ENTRY_QUERIES
                     for t in text.lower().split()})
    q_ents = spark.createDataFrame(q_rows, "qid string, e string")
    entity_texts = q_ents.select("e").distinct().select(
        "e", F.lit("name").alias("e_field"), F.col("e").alias("text")
    )
    pairs = q_ents.select("qid").distinct().crossJoin(
        docs40.select("doc_id").distinct()
    )
    feats = les_features(
        q_ents, entity_texts, docs40, term_stats(dt),
        total_df=1.0, avg_doc_len=1.0,  # unused by the lm formula
        pairs=pairs, models=("lm",),
    )
    return feats.select(
        F.col("qid").cast("long").alias("qid"), "docno", "feature",
        F.floor(F.col("value") * 1000000.0).cast("long").alias("value_e6"),
    ).orderBy("qid", "docno")


def _les_lm_sql() -> str:
    from .parity import _SQL_TOK, _sql_queries_values

    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
qe AS (SELECT DISTINCT qid, term AS e FROM q_raw),
docs AS (
  SELECT DISTINCT t.doc_id, d.doc_len
  FROM tf t JOIN dl d ON d.doc_id = t.doc_id
  WHERE t.doc_id < 40
),
scored AS (
  SELECT q.qid, d.doc_id,
         ln(greatest(greatest(coalesce(t.tf, 0), 0.1) / d.doc_len, 1e-10)) AS s
  FROM qe q CROSS JOIN docs d
  LEFT JOIN tf t ON t.doc_id = d.doc_id AND t.term = q.e
)
SELECT qid::BIGINT AS qid, doc_id::VARCHAR AS docno,
       'LesNameBodytextLm' AS feature,
       CAST(floor(avg(s) * 1000000.0) AS BIGINT) AS value_e6
FROM scored GROUP BY qid, doc_id
ORDER BY qid, docno
"""


# --------------------------------------------------------------------------
# round-3 addition: QDocEText family (lm model, name field) under the gate


def q_qdetext_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QDocEText LeToR family (q_de_text.py:84-306) with deterministic
    pseudo-annotations: doc entities = terms with tf>=3 (one annotation
    occurrence per tf count, annotation score = len(e)/10), entity `name`
    text = the entity term itself (pre-tokenized e_text_terms row, tf=1,
    doc_len=1).  All three feature groups run under the SQL oracle with
    the lm model: IndriScores Max/Wsum/Top-3(-20 pad), TopTf/TopAnaTf of
    the top-3 entities by lm(q, name), and the expanded-pseudo-doc
    TopExpTextSim."""
    from .operators.corpus_stats import term_stats
    from .operators.letor_families import q_de_text_features

    dt = _doc_tf(spark, sf_dir)
    ents_occ = (
        dt.filter((F.col("tf") >= 3) & (F.col("doc_id") < 24))
        .select(
            "doc_id", F.col("term").alias("e"),
            F.explode(F.sequence(F.lit(1), F.col("tf"))).alias("_i"),
        )
    )
    doc_ents = ents_occ.select("doc_id", F.lit("bodyText").alias("field"), "e")
    body_anno = ents_occ.select(
        "doc_id", "e", (F.length("e") / F.lit(10.0)).alias("score")
    )
    e_text_terms = (
        doc_ents.select("e").distinct().select(
            "e", F.lit("name").alias("e_field"), F.col("e").alias("term"),
            F.lit(1).cast("long").alias("tf"),
            F.lit(1).cast("long").alias("doc_len"),
        )
    )
    queries_df = spark.createDataFrame(
        [(str(q), text) for q, text in ENTRY_QUERIES], "qid string, query string"
    )
    pairs = queries_df.select("qid").crossJoin(
        doc_ents.select("doc_id").distinct()
    )
    feats = q_de_text_features(
        queries_df, pairs, doc_ents, body_anno, e_text_terms, term_stats(dt),
        total_df=1.0, avg_doc_len=1.0,  # unused by the lm formula
        e_fields=("name",), models=("lm",), top_k=3,
    )
    return feats.select(
        F.col("qid").cast("long").alias("qid"), "docno", "feature",
        F.floor(F.col("value") * 1000000.0).cast("long").alias("value_e6"),
    ).orderBy("qid", "docno", "feature")


def _qdetext_lm_sql() -> str:
    from .parity import _SQL_TOK, _sql_queries_values

    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
qterms AS (
  SELECT qid, term, count(*)::BIGINT AS q_tf FROM q_raw GROUP BY qid, term
),
ents AS (
  SELECT doc_id, term AS e, tf AS e_tf FROM tf WHERE tf >= 3 AND doc_id < 24
),
pairs AS (
  SELECT q.qid, d.doc_id
  FROM (SELECT DISTINCT qid FROM qterms) q
  CROSS JOIN (SELECT DISTINCT doc_id FROM ents) d
),
-- lm(query, entity `name` text {{e:1}}, dl=1), per-q-term sum
entscore AS (
  SELECT qq.qid, al.e,
         sum(qq.q_tf * ln(greatest(
             greatest(CASE WHEN qq.term = al.e THEN 1 ELSE 0 END, 0.1) / 1,
             1e-10))) AS lm
  FROM (SELECT DISTINCT e FROM ents) al
  CROSS JOIN qterms qq
  GROUP BY qq.qid, al.e
),
perent AS (
  SELECT p.qid, p.doc_id, e.e, e.e_tf, s.lm
  FROM pairs p
  JOIN ents e ON e.doc_id = p.doc_id
  JOIN entscore s ON s.qid = p.qid AND s.e = e.e
),
zt AS (SELECT qid, doc_id, sum(e_tf) AS z FROM perent GROUP BY qid, doc_id),
pooled AS (
  SELECT pe.qid, pe.doc_id, max(pe.lm) AS mx, sum(pe.lm * pe.e_tf / z.z) AS wsum
  FROM perent pe JOIN zt z ON z.qid = pe.qid AND z.doc_id = pe.doc_id
  GROUP BY pe.qid, pe.doc_id
),
topv AS (
  SELECT qid, doc_id, lm,
         row_number() OVER (PARTITION BY qid, doc_id ORDER BY lm DESC) AS r
  FROM perent
),
rank3 AS (
  SELECT * FROM (
    SELECT qid, doc_id, e,
           row_number() OVER (
             PARTITION BY qid, doc_id ORDER BY lm DESC, e ASC) AS r
    FROM perent
  ) WHERE r <= 3
),
nums AS (SELECT unnest(range(1, 1001)) AS i),
anno AS (
  SELECT e2.doc_id, e2.e, length(e2.e) / 10.0 AS score
  FROM ents e2 JOIN nums ON nums.i <= e2.e_tf
),
bodylm AS (
  SELECT doc_id, e, count(*)::DOUBLE AS btf, sum(score) AS bana
  FROM anno GROUP BY doc_id, e
),
expstats AS (SELECT qid, doc_id, count(*) AS dl FROM rank3 GROUP BY qid, doc_id),
expscore AS (
  SELECT qq.qid, es.doc_id,
         sum(qq.q_tf * ln(greatest(
             greatest(CASE WHEN r.e IS NOT NULL THEN 1 ELSE 0 END, 0.1) / es.dl,
             1e-10))) AS lm
  FROM expstats es
  JOIN qterms qq ON qq.qid = es.qid
  LEFT JOIN rank3 r
    ON r.qid = es.qid AND r.doc_id = es.doc_id AND r.e = qq.term
  GROUP BY qq.qid, es.doc_id
)
SELECT qid::BIGINT AS qid, doc_id::VARCHAR AS docno, feature,
       CAST(floor(value * 1000000.0) AS BIGINT) AS value_e6
FROM (
  SELECT qid, doc_id, 'QDocETextBodytextMaxNameLm' AS feature, mx AS value
  FROM pooled
  UNION ALL
  SELECT qid, doc_id, 'QDocETextBodytextWsumNameLm', wsum FROM pooled
  UNION ALL
  SELECT t.qid, t.doc_id,
         'QDocETextBodytextNameLmTop' || k.i::VARCHAR,
         coalesce(tv.lm, -20.0)
  FROM pooled t
  CROSS JOIN (VALUES (1), (2), (3)) k(i)
  LEFT JOIN topv tv ON tv.qid = t.qid AND tv.doc_id = t.doc_id AND tv.r = k.i
  UNION ALL
  SELECT r.qid, r.doc_id, 'QDocETextnameTop' || (r.r - 1)::VARCHAR || 'Tf', b.btf
  FROM rank3 r JOIN bodylm b ON b.doc_id = r.doc_id AND b.e = r.e
  UNION ALL
  SELECT r.qid, r.doc_id, 'QDocETextnameTop' || (r.r - 1)::VARCHAR || 'AnaTf',
         b.bana
  FROM rank3 r JOIN bodylm b ON b.doc_id = r.doc_id AND b.e = r.e
  UNION ALL
  SELECT qid, doc_id, 'QDocETextExpNameLm', lm FROM expscore
)
ORDER BY qid, docno, feature
"""


# --------------------------------------------------------------------------
# round-3 addition: windowed event counts (the streaming agg surface,
# batch-checked — streaming/incremental.windowed_event_counts is the same
# DataFrame program under readStream; its streaming ≡ batch equivalence is
# pytest-asserted in test_multimodal_streaming.py)


def q_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .parity import _pin_utc
    from .streaming.incremental import windowed_event_counts

    _pin_utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(ev, window="5 minutes")
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type", "n",
        F.floor(F.col("total_value") * 100).cast("long").alias("total_value_e2"),
    ).orderBy("win_start", "event_type")


_WINDOWED_EVENTS_SQL = """
SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M:%S')
         AS win_start,
       event_type, count(*)::BIGINT AS n,
       CAST(floor(sum(value) * 100) AS BIGINT) AS total_value_e2
FROM events GROUP BY 1, 2 ORDER BY win_start, event_type
"""


# --------------------------------------------------------------------------
# round-3 addition: ESR family (weighted similarity bins) under the gate


def q_esr_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ESR LeToR family (ESR.py:93-244) — the weighted flavor of the shared
    similarity-bin core already gated as boe_emb_bins: doc entities = terms
    with tf>=3 weighted by their tf (use_entity_weight), log-binned, with
    the 'Bin_%03d' names.  Same deterministic md5->embeddings-row entity
    vectors as boe_emb_bins."""
    from .operators.letor_families import esr_bin_features, form_bins

    dt = _doc_tf(spark, sf_dir)
    d_ents = dt.filter((F.col("tf") >= 3) & (F.col("doc_id") < 40)).select(
        "doc_id", F.lit("bodyText").alias("field"), F.col("term").alias("e"),
        F.col("tf").cast("double").alias("e_tf"),
    )
    q_rows = sorted({(str(q), t) for q, text in ENTRY_QUERIES
                     for t in text.lower().split()})
    q_ents = spark.createDataFrame(q_rows, "qid string, e string")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    all_terms = d_ents.select("e").union(q_ents.select("e")).distinct()
    ent_emb = (
        all_terms.withColumn(
            "vec_id",
            F.conv(F.substring(F.md5(F.col("e").cast("binary")), 1, 8), 16, 10)
            .cast("long") % n_vec,
        )
        .join(emb, "vec_id")
        .select("e", F.col("embedding").alias("vector"))
    )
    pairs = q_ents.select("qid").distinct().crossJoin(
        d_ents.select("doc_id").distinct()
    )
    feats = esr_bin_features(
        pairs, q_ents, d_ents, ent_emb,
        bins=form_bins(6, 1.0), bin_func="log", pools=("max", "mean"),
        weight_col="e_tf",
    )
    return feats.select(
        F.col("qid").cast("long").alias("qid"), "docno", "feature",
        F.floor(F.col("value") * 1e6).cast("long").alias("value_e6"),
    ).orderBy("qid", "docno", "feature")


def _esr_sql() -> str:
    from .operators.letor_families import form_bins

    bins = form_bins(6, 1.0)
    case = "CASE " + " ".join(
        f"WHEN s >= {b!r} THEN {i}" for i, b in enumerate(bins)
    ) + " ELSE -1 END"
    bins_vals = ", ".join(f"({i})" for i in range(len(bins)))
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
dents AS (
  SELECT doc_id, term AS e, tf::DOUBLE AS e_tf
  FROM tf WHERE tf >= 3 AND doc_id < 40
),
qents AS (SELECT DISTINCT qid, term AS e FROM q_raw),
allt AS (SELECT DISTINCT e FROM (SELECT e FROM dents UNION SELECT e FROM qents)),
nv AS (SELECT count(*) AS n FROM embeddings),
ev AS (
  SELECT a.e, emb.embedding
  FROM allt a CROSS JOIN nv
  JOIN embeddings emb
    ON emb.vec_id = ('0x' || substr(md5(a.e), 1, 8))::BIGINT % nv.n
),
ex AS (
  SELECT e, unnest(embedding)::DOUBLE AS x,
         generate_subscripts(embedding, 1) AS i
  FROM ev
),
norms AS (SELECT e, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY e),
need AS (
  SELECT DISTINCT q.e AS qe, d.e AS de FROM qents q CROSS JOIN dents d
),
dots AS (
  SELECT n.qe, n.de, sum(a.x * b.x) AS dot
  FROM need n JOIN ex a ON a.e = n.qe JOIN ex b ON b.e = n.de AND b.i = a.i
  GROUP BY n.qe, n.de
),
vecs AS (SELECT e, embedding FROM ev),
cosv AS (
  SELECT d.qe, d.de,
         CASE WHEN vq.embedding = vd.embedding THEN 1.0
              ELSE d.dot / (nq.nrm * nd.nrm) END AS cos
  FROM dots d
  JOIN norms nq ON nq.e = d.qe JOIN norms nd ON nd.e = d.de
  JOIN vecs vq ON vq.e = d.qe JOIN vecs vd ON vd.e = d.de
),
persim AS (
  SELECT q.qid, dd.doc_id, dd.e, dd.e_tf,
         max(c.cos) AS sim_max, avg(c.cos) AS sim_mean
  FROM qents q
  JOIN cosv c ON c.qe = q.e
  JOIN dents dd ON dd.e = c.de
  GROUP BY q.qid, dd.doc_id, dd.e, dd.e_tf
),
stacked AS (
  SELECT qid, doc_id, 'Max' AS pool, sim_max AS s, e_tf FROM persim
  UNION ALL
  SELECT qid, doc_id, 'Mean' AS pool, sim_mean AS s, e_tf FROM persim
),
binned AS (
  SELECT qid, doc_id, pool, {case} AS b, e_tf FROM stacked
),
counts AS (
  SELECT qid, doc_id, pool, b, sum(e_tf)::DOUBLE AS cnt
  FROM binned WHERE b >= 0 GROUP BY qid, doc_id, pool, b
),
template AS (
  SELECT DISTINCT s.qid, s.doc_id, s.pool, bb.b
  FROM stacked s CROSS JOIN (VALUES {bins_vals}) bb(b)
),
dense AS (
  SELECT t.qid, t.doc_id, t.pool, t.b, coalesce(c.cnt, 0.0) AS cnt
  FROM template t
  LEFT JOIN counts c
    ON c.qid = t.qid AND c.doc_id = t.doc_id AND c.pool = t.pool AND c.b = t.b
)
SELECT qid::BIGINT AS qid, doc_id::VARCHAR AS docno,
       'ESR_Bodytext_' || pool || 'Bin_' || lpad(b::VARCHAR, 3, '0') AS feature,
       CAST(floor(ln(greatest(cnt, 1e-10)) * 1e6) AS BIGINT) AS value_e6
FROM dense
ORDER BY qid, docno, feature
"""


# --------------------------------------------------------------------------
# round-3 addition: ES-term-vector TermStat variant (bm25) under the gate


def q_es_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES-term-vector stats variant (ref duet_feature/base.py:241-313):
    bm25 where each query's per-term df comes from a PREFETCHED table that
    legitimately diverges per qid (ES df is shard-approximate).  The
    deterministic divergence here: prefetched df = corpus df + (qid % 3),
    so the same term scores differently under different queries — the
    quirk the operator preserves."""
    from .operators.es_stats import es_all_scores

    dt = _doc_tf(spark, sf_dir)
    queries_df = spark.createDataFrame(
        [(str(q), t) for q, t in ENTRY_QUERIES], "qid string, query string"
    )
    dfs = dt.groupBy("term").agg(F.count("*").alias("df"))
    q_pairs = spark.createDataFrame(
        sorted({(str(q), t) for q, text in ENTRY_QUERIES
                for t in text.lower().split()}),
        "qid string, term string",
    )
    q_term_df = q_pairs.join(dfs, "term", "left").select(
        "qid", "term",
        (F.coalesce("df", F.lit(0)).cast("double")
         + (F.col("qid").cast("long") % 3).cast("double")).alias("df"),
    )
    row = dt.select("doc_id", "doc_len").distinct().agg(
        F.count("*").alias("n"), F.sum("doc_len").alias("total_len")
    ).collect()[0]
    n, total_len = int(row["n"]), int(row["total_len"])
    scores = es_all_scores(
        queries_df, dt, q_term_df,
        total_df=float(n), avg_doc_len=total_len / n, models=("bm25",),
    )
    w = Window.partitionBy("qid").orderBy(
        F.floor(F.col("bm25") * 1e9).desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select(
            F.col("qid").cast("long").alias("qid"), "doc_id", "rank",
            F.floor(F.col("bm25") * 1e6).cast("long").alias("score_e6"),
        )
        .orderBy("qid", "rank")
    )


def _es_bm25_sql() -> str:
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
qd AS (SELECT qid, term, min(pos) AS term_idx FROM q_raw GROUP BY qid, term),
stats AS (
  SELECT (SELECT count(*) FROM dl)::DOUBLE AS n,
         (SELECT sum(doc_len) FROM dl)::DOUBLE / (SELECT count(*) FROM dl)
           AS avgdl
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
qdf AS (
  SELECT qd.qid, qd.term,
         coalesce(dfs.df, 0)::DOUBLE + (qd.qid % 3)::DOUBLE AS df
  FROM qd LEFT JOIN dfs USING (term)
),
matched AS (
  SELECT q.qid, tf.doc_id, tf.tf::DOUBLE AS tf, dl.doc_len::DOUBLE AS dl, q.df
  FROM qdf q
  JOIN tf USING (term) JOIN dl ON tf.doc_id = dl.doc_id
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


# --------------------------------------------------------------------------
# round-3 addition: Pretrain family (raw norm, sum/max/mean pools) under
# the gate


def q_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretrain LeToR family (pre_trained.py:92-160): per-doc-entity
    pre-trained feature vectors -> per-query-entity lookup with the -30
    default vector -> pooling over query entities.  Deterministic vectors:
    entity e in doc d carries [tf, len(e), tf*len(e), 1.0] — all
    INTEGER-valued on purpose: sums of exactly-representable doubles are
    order-independent, so the cross-engine floor(x*1e6) quantization cannot
    land one quantum apart (a fractional dim measurably did)."""
    from .operators.letor_families import pretrain_features

    dt = _doc_tf(spark, sf_dir)
    ents = dt.filter((F.col("tf") >= 3) & (F.col("doc_id") < 30))
    doc_ent_feats = ents.select(
        "doc_id", F.lit("bodyText").alias("field"),
        F.col("term").alias("e"),
        F.array(
            F.col("tf").cast("double"),
            F.length("term").cast("double"),
            (F.col("tf") * F.length("term")).cast("double"),
            F.lit(1.0),
        ).alias("features"),
    )
    q_rows = sorted({(str(q), t) for q, text in ENTRY_QUERIES
                     for t in text.lower().split()})
    q_ents = spark.createDataFrame(q_rows, "qid string, e string")
    pairs = q_ents.select("qid").distinct().crossJoin(
        ents.select("doc_id").distinct()
    )
    feats = pretrain_features(
        pairs, q_ents, doc_ent_feats, feature_dim=4,
        pools=("sum", "max", "mean"),
    )
    return feats.select(
        F.col("qid").cast("long").alias("qid"), "docno", "feature",
        F.floor(F.col("value") * 1e6).cast("long").alias("value_e6"),
    ).orderBy("qid", "docno", "feature")


def _pretrain_sql() -> str:
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
ents AS (SELECT doc_id, term AS e, tf FROM tf WHERE tf >= 3 AND doc_id < 30),
featl AS (
  SELECT doc_id, e, 0 AS p, tf::DOUBLE AS val FROM ents
  UNION ALL SELECT doc_id, e, 1, length(e)::DOUBLE FROM ents
  UNION ALL SELECT doc_id, e, 2, (tf * length(e))::DOUBLE FROM ents
  UNION ALL SELECT doc_id, e, 3, 1.0 FROM ents
),
qe AS (SELECT DISTINCT qid, term AS e FROM q_raw),
docs AS (SELECT DISTINCT doc_id FROM ents),
pairsq AS (SELECT q.qid, d.doc_id, q.e FROM qe q CROSS JOIN docs d),
dims AS (SELECT unnest(range(0, 4)) AS p),
cell AS (
  SELECT pq.qid, pq.doc_id, pq.e, dm.p, coalesce(f.val, -30.0) AS val
  FROM pairsq pq CROSS JOIN dims dm
  LEFT JOIN featl f ON f.doc_id = pq.doc_id AND f.e = pq.e AND f.p = dm.p
),
agg AS (
  SELECT qid, doc_id, p,
         sum(val) AS s, max(val) AS mx, sum(val) / count(*) AS mn
  FROM cell GROUP BY qid, doc_id, p
),
stacked AS (
  SELECT qid, doc_id, p, '_Sum' AS suffix, s AS value FROM agg
  UNION ALL SELECT qid, doc_id, p, '_Max', mx FROM agg
  UNION ALL SELECT qid, doc_id, p, '_Mean', mn FROM agg
)
SELECT qid::BIGINT AS qid, doc_id::VARCHAR AS docno,
       'Pretrain_bodyText_salience_feature_' || lpad(p::VARCHAR, 3, '0')
         || suffix AS feature,
       CAST(floor(value * 1e6) AS BIGINT) AS value_e6
FROM stacked
ORDER BY qid, docno, feature
"""


# --------------------------------------------------------------------------
# round-3 addition: PageRank family under the gate (unrolled random walk)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank LeToR family (page_rank.py:50-150): per-doc random walk
    over the doc-entity cosine matrix (clamped >= 0, diag 1, column-
    stochastic), tf-weighted init, PR of the query's entities pooled
    mean/max at steps 1/5/20.  Deterministic md5->embeddings entity
    vectors; docs < 25 keep the 20-step SQL unroll small."""
    from .operators.letor_families import page_rank_features

    dt = _doc_tf(spark, sf_dir)
    ents_occ = (
        dt.filter((F.col("tf") >= 3) & (F.col("doc_id") < 25))
        .select(
            "doc_id", F.col("term").alias("e"),
            F.explode(F.sequence(F.lit(1), F.col("tf"))).alias("_i"),
        )
    )
    doc_ents = ents_occ.select("doc_id", F.lit("bodyText").alias("field"), "e")
    q_rows = sorted({(str(q), t) for q, text in ENTRY_QUERIES
                     for t in text.lower().split()})
    q_ents = spark.createDataFrame(q_rows, "qid string, e string")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    all_terms = doc_ents.select("e").union(q_ents.select("e")).distinct()
    ent_emb = (
        all_terms.withColumn(
            "vec_id",
            F.conv(F.substring(F.md5(F.col("e").cast("binary")), 1, 8), 16, 10)
            .cast("long") % n_vec,
        )
        .join(emb, "vec_id")
        .select("e", F.col("embedding").alias("vector"))
    )
    pairs = q_ents.select("qid").distinct().crossJoin(
        doc_ents.select("doc_id").distinct()
    )
    feats = page_rank_features(
        pairs, q_ents, doc_ents, ent_emb, steps=(1, 5, 20),
    )
    return feats.select(
        F.col("qid").cast("long").alias("qid"), "docno", "feature",
        F.floor(F.col("value") * 1e6).cast("long").alias("value_e6"),
    ).orderBy("qid", "docno", "feature")


def _pagerank_sql(steps: tuple[int, ...] = (1, 5, 20)) -> str:
    max_step = max(steps)
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so a 20-step
    # chain would re-expand the whole sim pipeline once per step
    walk_ctes = []
    prev = "init"
    for t in range(1, max_step + 1):
        walk_ctes.append(
            f"w{t} AS MATERIALIZED (\n"
            f"  SELECT p.doc_id, p.ea AS e, sum(p.v * w.val) AS val\n"
            f"  FROM pmat p JOIN {prev} w ON w.doc_id = p.doc_id AND w.e = p.eb\n"
            f"  GROUP BY p.doc_id, p.ea\n)"
        )
        prev = f"w{t}"
    pools = "\n  UNION ALL\n".join(
        f"  SELECT qid, doc_id, 'PageRank_bodyText_S{s}_mean' AS feature,\n"
        f"         sum(pr) / count(*) AS value FROM qpr{s} GROUP BY qid, doc_id\n"
        f"  UNION ALL\n"
        f"  SELECT qid, doc_id, 'PageRank_bodyText_S{s}_max', max(pr)\n"
        f"  FROM qpr{s} GROUP BY qid, doc_id"
        for s in steps
    )
    qpr_ctes = ",\n".join(
        f"qpr{s} AS (\n"
        f"  SELECT pq.qid, pq.doc_id, coalesce(w.val, 0.0) AS pr\n"
        f"  FROM pairsq pq LEFT JOIN w{s} w\n"
        f"    ON w.doc_id = pq.doc_id AND w.e = pq.e\n)"
        for s in steps
    )
    return f"""
WITH {_SQL_TOK},
{_sql_queries_values()},
dents AS (
  SELECT doc_id, term AS e, tf FROM tf WHERE tf >= 3 AND doc_id < 25
),
qents AS (SELECT DISTINCT qid, term AS e FROM q_raw),
allt AS (SELECT DISTINCT e FROM (SELECT e FROM dents UNION SELECT e FROM qents)),
nv AS (SELECT count(*) AS n FROM embeddings),
ev AS (
  SELECT a.e, emb.embedding
  FROM allt a CROSS JOIN nv
  JOIN embeddings emb
    ON emb.vec_id = ('0x' || substr(md5(a.e), 1, 8))::BIGINT % nv.n
),
ex AS (
  SELECT e, unnest(embedding)::DOUBLE AS x,
         generate_subscripts(embedding, 1) AS i
  FROM ev
),
norms AS (
  SELECT e, CASE WHEN sqrt(sum(x * x)) = 0 THEN 1.0
                 ELSE sqrt(sum(x * x)) END AS nrm
  FROM ex GROUP BY e
),
exu AS (  -- unit vectors, elementwise x/nrm (the numpy shape)
  SELECT ex.e, ex.i, ex.x / n.nrm AS u FROM ex JOIN norms n ON n.e = ex.e
),
needp AS MATERIALIZED (
  SELECT a.doc_id, a.e AS ea, b.e AS eb
  FROM (SELECT DISTINCT doc_id, e FROM dents) a
  JOIN (SELECT DISTINCT doc_id, e FROM dents) b ON b.doc_id = a.doc_id
),
dotsu AS MATERIALIZED (  -- unit-vector dots over the needed entity pairs
  SELECT p.ea, p.eb, sum(ua.u * ub.u) AS dot
  FROM (SELECT DISTINCT ea, eb FROM needp) p
  JOIN exu ua ON ua.e = p.ea
  JOIN exu ub ON ub.e = p.eb AND ub.i = ua.i
  GROUP BY p.ea, p.eb
),
simraw AS MATERIALIZED (  -- doc-local cosine, diag 1, clamped >= 0
  SELECT n.doc_id, n.ea, n.eb,
         CASE WHEN n.ea = n.eb THEN 1.0
              ELSE greatest(d.dot, 0.0) END AS s
  FROM needp n JOIN dotsu d ON d.ea = n.ea AND d.eb = n.eb
),
colsum AS (
  SELECT doc_id, eb, CASE WHEN sum(s) = 0 THEN 1.0 ELSE sum(s) END AS z
  FROM simraw GROUP BY doc_id, eb
),
pmat AS MATERIALIZED (  -- column-stochastic walk matrix
  SELECT sr.doc_id, sr.ea, sr.eb, sr.s / c.z AS v
  FROM simraw sr JOIN colsum c ON c.doc_id = sr.doc_id AND c.eb = sr.eb
),
dtf AS (SELECT doc_id, sum(tf) AS ztf FROM dents GROUP BY doc_id),
init AS (  -- tf-weighted init vector
  SELECT d.doc_id, d.e, d.tf / dtf.ztf AS val
  FROM dents d JOIN dtf ON dtf.doc_id = d.doc_id
),
{",".join(walk_ctes)},
pairsq AS (
  SELECT q.qid, d.doc_id, q.e
  FROM qents q CROSS JOIN (SELECT DISTINCT doc_id FROM dents) d
),
{qpr_ctes}
SELECT qid::BIGINT AS qid, doc_id::VARCHAR AS docno, feature,
       CAST(floor(value * 1e6) AS BIGINT) AS value_e6
FROM (
{pools}
)
ORDER BY qid, docno, feature
"""
