"""Synthetic Common-Crawl-style webpage corpus (FIXTURES.md §1) + query set (§2).

Deterministic (seeded numpy RNG), no external data.  Shapes:
  webpages(url string, warc_ts timestamp, html binary, text string, lang string)
  queries(qid string, query string)

Design goals mirrored from the reference workload:
- Zipf-sampled vocabulary (~5k terms, s≈1.07) so head-term skew is real —
  this is what the salted index build is tested against.
- log-normal doc lengths (mean ≈ 120 tokens); a few empty docs to exercise
  the doc_len==0 paths (retrieval_model.py:210,252).
- HTML wraps the text with boilerplate nav/footer/title and occasional junk
  before '<html' (exercises parse_html.py:39-44 prefix-trim behavior).
- queries: 1-9 terms like /root/reference/data/s2/s2.query; mix of head
  terms, tail terms, an OOV term (df=0 path, retrieval_model.py:139-144) and
  repeated-term queries (unused-v_q quirk in bm25).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.07

_EPOCH = _dt.datetime(2023, 1, 1, tzinfo=_dt.timezone.utc)


def _vocab(n: int = VOCAB_SIZE) -> list[str]:
    # deterministic pseudo-words: w0000..wNNNN plus a few realistic heads
    heads = [
        "the", "data", "spark", "index", "query", "search", "web", "page",
        "crawl", "rank", "score", "term", "doc", "join", "shuffle", "text",
    ]
    return heads + [f"w{i:04d}" for i in range(n - len(heads))]


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def gen_webpages(n_docs: int = 1000, seed: int = SEED,
                 with_html: bool = True) -> pd.DataFrame:
    """Vectorized: one Zipf draw for the whole corpus, split per doc — keeps
    generation O(total_tokens) numpy so 100k+ doc bench corpora are cheap.
    with_html=False skips the html column (bench corpora; text/lang only)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    probs = _zipf_probs(len(vocab))
    lengths = np.clip(
        rng.lognormal(mean=np.log(120), sigma=0.6, size=n_docs), 0, 2000
    ).astype(np.int64)
    # ~0.5% empty docs
    lengths[rng.random(n_docs) < 0.005] = 0

    all_toks = rng.choice(vocab, size=int(lengths.sum()), p=probs)
    bounds = np.cumsum(lengths)[:-1]
    doc_toks = np.split(all_toks, bounds)
    title_toks = rng.choice(vocab, size=(n_docs, 3), p=probs)
    junk_mask = rng.random(n_docs) < 0.1
    lang_mask = rng.random(n_docs) > 0.05

    urls, tss, htmls, texts, langs = [], [], [], [], []
    junk = b"WARC-junk/1.0 \xff\xfe "
    for i in range(n_docs):
        text = " ".join(doc_toks[i].tolist())
        if with_html:
            title = " ".join(title_toks[i].tolist())
            html = (junk if junk_mask[i] else b"") + (
                "<html><head><title>{t}</title>"
                "<style>body {{ color: red }}</style></head>"
                "<body><nav>home about contact</nav>"
                "<p>{x}</p>"
                "<footer>copyright 2023 example</footer></body></html>"
            ).format(t=title, x=text).encode("utf-8")
            htmls.append(html)
        urls.append(f"https://host{i % 17}.example/p/{i}")
        tss.append(_EPOCH + _dt.timedelta(seconds=i * 60))
        texts.append(text)
        langs.append("en" if lang_mask[i] else "xx")
    cols = {"url": urls, "warc_ts": tss, "text": texts, "lang": langs}
    if with_html:
        cols["html"] = htmls
    return pd.DataFrame(cols)[
        ["url", "warc_ts", "html", "text", "lang"] if with_html
        else ["url", "warc_ts", "text", "lang"]
    ]


def gen_queries(n_queries: int = 50, seed: int = SEED + 1) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    probs = _zipf_probs(len(vocab))
    rows = []
    for qid in range(1, n_queries + 1):
        n_terms = int(rng.integers(1, 10))
        terms = rng.choice(vocab, size=n_terms, p=probs).tolist()
        if qid % 10 == 0:
            terms.append("zzzoutofvocab")  # df=0 path
        if qid % 7 == 0 and terms:
            terms.append(terms[0])  # repeated term (v_q quirk)
        rows.append({"qid": str(qid), "query": " ".join(terms)})
    return pd.DataFrame(rows)


def webpages_spark_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )


def webpages_df(spark, n_docs: int = 1000, seed: int = SEED):
    pdf = gen_webpages(n_docs, seed)
    return spark.createDataFrame(pdf, schema=webpages_spark_schema())


def queries_df(spark, n_queries: int = 50, seed: int = SEED + 1):
    return spark.createDataFrame(gen_queries(n_queries, seed))
