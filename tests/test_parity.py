"""Driver-contract simulation: for every queries() entry, run the Spark query
and the DuckDB oracle_sql side-by-side at sf0.01 and require identical
row-count, schema (column names) and values — the same comparison the driver
makes for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"qid", "doc_id", "rank", "score_e6"}


def test_all_queries_have_oracles(entry_mod):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o).issubset(set(q))
    assert len(q) >= 25
    # every registered query has a DuckDB oracle (round-2 bar)
    assert set(q) - set(o) == set()


@pytest.mark.parametrize("name", [
    "doc_term_tf", "term_df", "corpus_stats", "top_terms", "vocabulary",
    "bm25_topk", "scored_topk_variants", "lang_doc_stats",
    "dedup_exact", "pricing_summary", "top_customers",
    "customers_without_orders", "events_histogram", "event_type_daily",
    "neardup_pairs", "simhash_docs", "text_features",
    "rm3_expansion", "ndcg_eval", "kfold_counts",
    "bm25_index_variants", "user_sessions", "decontam",
    "sig_test", "boe_emb_bins", "letor_lm",
    "url_host_stats", "url_dedup", "dup_clusters", "sdm_bigrams", "ann_topk",
    "sdm_rerank", "spell_correct", "bm25f_variants", "snippets",
    "autocomplete", "c4_clean", "pii_scrub", "host_collapse",
    "bool_topk", "phrase_topk",
])
def test_query_matches_oracle(spark, entry_mod, ddb, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = qfn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
    res = ddb.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    a = _normalize(srows, scols)
    b = _normalize(drows, dcols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, f"{name}: first mismatch {a[mism[0]]} vs {b[mism[0]]}"
