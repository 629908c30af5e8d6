"""LeToR feature families vs per-row pure-Python oracles that replicate the
reference extractors verbatim (feature names AND values):

- Les            /root/reference/knowledge4ir/duet_feature/matching/les.py:65-106
- ESR bins       .../ESR.py:93-244
- BoeEmb bins    .../BoeEmb.py:94-139 + mean-all/topk pools
- QDocEText      .../q_de_text.py:84-306 (IndriScores/TopExpTextSim/TopTf)
- PageRank       .../page_rank.py:50-150

Tokenizer note: both sides use the ENGINE tokenizer contract (doc side =
clean pipeline, query side = raw lower split) — the reference's NLTK
tokenizer is out of scope (SURVEY §8), so the oracles here tokenize with the
same oracle/tokenizer the rest of the suite uses.  Tie-breaks in top-k /
pools use (score desc, entity asc) where the reference inherited Python 2.7
dict order (documented deviation).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowledgeir_spark.functions.text import doc_terms
from knowledgeir_spark.operators.corpus_stats import doc_stats, field_stats, term_stats
from knowledgeir_spark.operators.letor_families import (
    boe_emb_extra_pools,
    boe_emb_features,
    entity_text_terms,
    esr_bin_features,
    features_to_map,
    form_bins,
    les_features,
    page_rank_features,
    q_de_text_features,
)
from knowledgeir_spark.oracle.retrieval import OracleScorer
from knowledgeir_spark.oracle.tokenizer import doc_lm, query_lm

ENTS = [f"e{i}" for i in range(8)]
MODELS = (
    "lm", "lm_dir", "lm_jm", "lm_twoway", "bm25", "coordinate", "tf_idf",
    "bool_and", "bool_or",
)


def _all_scores(h_q, h_d, df, total_df, avgdl):
    s = OracleScorer(h_q, h_d, df, total_df, avgdl)
    return s.all_scores()


@pytest.fixture(scope="module")
def fam(spark, webpages_pdf, queries_pdf):
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"}).iloc[:40]
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    dt = doc_terms(docs).cache()
    ts = term_stats(dt)
    fs = field_stats(doc_stats(dt, docs_df=docs))
    queries = queries_pdf.iloc[:4]

    # entity texts: pre-cleaned snippets of fixture docs (e7 has none)
    etext_rows = []
    etexts: dict[str, dict[str, str]] = {}
    for i, e in enumerate(ENTS[:7]):
        name = " ".join(sorted(doc_lm(pdf["text"].iloc[i][:60])))
        etexts.setdefault(e, {})["name"] = name
        etext_rows.append((e, "name", name))
        if i % 3 != 2:
            from knowledgeir_spark.oracle.tokenizer import tokenize_doc

            desp = " ".join(tokenize_doc(pdf["text"].iloc[i][:200]))
            etexts[e]["desp"] = desp
            etext_rows.append((e, "desp", desp))
    entity_texts = spark.createDataFrame(
        etext_rows, "e string, e_field string, text string"
    )

    # deterministic doc annotations (duplicates on purpose) + body scores
    rng = np.random.default_rng(11)
    doc_ent_rows, body_rows = [], []
    doc_ents_py: dict[int, list[str]] = {}
    body_py: dict[int, list[tuple[str, float]]] = {}
    for d in range(12):
        k = 1 + (d % 4)
        es = [ENTS[(d + j) % 8] for j in range(k)] + ([ENTS[d % 8]] if d % 3 == 0 else [])
        doc_ents_py[d] = es
        for e in es:
            w = round(float(rng.uniform(0.1, 1.0)), 3)
            doc_ent_rows.append((d, "bodyText", e, w))
            body_rows.append((d, e, w))
        body_py[d] = [(e, w) for (_d, e, w) in
                      [r for r in body_rows if r[0] == d]]
    doc_ents = spark.createDataFrame(
        doc_ent_rows, "doc_id long, field string, e string, weight double"
    )
    body_anno = spark.createDataFrame(body_rows, "doc_id long, e string, score double")

    # query entities: 1-2 per query (one query gets an OOV-only entity)
    q_ent_rows = []
    q_ents_py: dict[str, list[str]] = {}
    for i, q in enumerate(queries.itertuples()):
        es = [ENTS[i % 8]] + ([ENTS[(i + 3) % 8]] if i % 2 == 0 else [])
        q_ents_py[q.qid] = es
        for e in es:
            q_ent_rows.append((q.qid, e))
    q_ents = spark.createDataFrame(q_ent_rows, "qid string, e string")

    # embeddings for e0..e5 only (e6, e7 OOV)
    emb_py = {e: rng.normal(size=6) for e in ENTS[:6]}
    entity_emb = spark.createDataFrame(
        [(e, [float(x) for x in v]) for e, v in emb_py.items()],
        "e string, vector array<float>",
    )
    # float32 round-trip so oracle and engine see identical vectors
    emb_py = {e: np.array(v, dtype=np.float32).astype(np.float64)
              for e, v in emb_py.items()}

    pair_rows = [
        (q.qid, d) for q in queries.itertuples() for d in range(0, 12, 2)
    ]
    pairs = spark.createDataFrame(pair_rows, "qid string, doc_id long")

    return dict(
        pdf=pdf, docs=docs, dt=dt, ts=ts, fs=fs, queries=queries,
        entity_texts=entity_texts, etexts=etexts, doc_ents=doc_ents,
        doc_ents_py=doc_ents_py, body_anno=body_anno, body_py=body_py,
        q_ents=q_ents, q_ents_py=q_ents_py, entity_emb=entity_emb,
        emb_py=emb_py, pairs=pairs, pair_rows=pair_rows,
        df_py={}, total_df=fs.total_df, avgdl=fs.avg_doc_len,
    )


@pytest.fixture(scope="module")
def df_py(fam):
    return {r["term"]: float(r["df"]) for r in fam["ts"].collect()}


def test_les_matches_oracle(fam, df_py):
    got = les_features(
        fam["q_ents"], fam["entity_texts"], fam["dt"], fam["ts"],
        fam["total_df"], fam["avgdl"], fam["pairs"],
    ).collect()
    by_key = {(r["qid"], r["docno"], r["feature"]): r["value"] for r in got}
    pdf = fam["pdf"].set_index("doc_id")
    n_checked = 0
    for qid, d in fam["pair_rows"]:
        h_doc = doc_lm(pdf.loc[d, "text"])
        for e_field in ("name", "desp"):
            sums: dict[str, float] = {}
            cnt = 0
            for e in fam["q_ents_py"][qid]:
                text = fam["etexts"].get(e, {}).get(e_field)
                if text is None:
                    continue
                cnt += 1
                sc = _all_scores(
                    doc_lm(text), h_doc, df_py, fam["total_df"], fam["avgdl"]
                )
                for m, v in sc.items():
                    sums[m] = sums.get(m, 0.0) + v
            for m in MODELS:
                key = (qid, str(d), f"Les{e_field.title()}Bodytext{m.title()}")
                if cnt == 0:
                    assert key not in by_key
                else:
                    assert by_key[key] == pytest.approx(sums[m] / cnt, abs=1e-9), key
                    n_checked += 1
    assert n_checked > 100


def _oracle_bins(v_sim, weights, bins, bin_func, log_min=1e-10):
    nb = [0.0] * len(bins)
    for p in range(len(v_sim)):
        w = weights[p] if weights is not None else 1.0
        for bp in range(len(bins)):
            if v_sim[p] >= bins[bp]:
                nb[bp] += w
                break
    if bin_func == "log":
        nb = [math.log(max(x, log_min)) for x in nb]
    elif bin_func == "norm_tf":
        z = float(sum(nb))
        if z:
            nb = [x / z for x in nb]
    return nb


def _cos(a, b):
    if np.array_equal(a, b):
        return 1.0  # engine short-circuits identical vectors (bin_0 edge)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def _sim_matrix(fam, qid, d):
    q_es = [e for e in fam["q_ents_py"][qid] if e in fam["emb_py"]]
    d_es = [e for e in fam["doc_ents_py"].get(d, []) if e in fam["emb_py"]]
    m = np.zeros((len(q_es), len(d_es)))
    for i, qe in enumerate(q_es):
        for j, de in enumerate(d_es):
            m[i, j] = _cos(fam["emb_py"][qe], fam["emb_py"][de])
    return q_es, d_es, m


def test_esr_and_boe_bins_match_oracle(fam):
    bins = form_bins(6, 1.0)
    for flavor, weight_col, prefix, fmt in (
        ("esr", "weight", "ESR", "Bin_%03d"),
        ("boe", None, "BoeEmb", "Bin_%d"),
    ):
        fn = esr_bin_features if flavor == "esr" else boe_emb_features
        got = fn(
            fam["pairs"], fam["q_ents"], fam["doc_ents"], fam["entity_emb"],
            bins=bins, bin_func="log", pools=("max", "mean"),
            weight_col=weight_col,
        ).collect()
        by_key = {(r["qid"], r["docno"], r["feature"]): r["value"] for r in got}
        n_checked = 0
        for qid, d in fam["pair_rows"]:
            q_es, d_es, m = _sim_matrix(fam, qid, d)
            if m.shape[0] == 0 or m.shape[1] == 0:
                # no sims -> no (pair, field) row at all (reference emits
                # zero-bins; engine drops the pair — see docstring)
                continue
            weights = None
            if weight_col:
                seen: dict[str, int] = {}
                weights = []
                for e in fam["doc_ents_py"][d]:
                    if e not in fam["emb_py"]:
                        continue
                    idx = seen.get(e, 0)
                    occ = [w for (ee, w) in fam["body_py"][d] if ee == e]
                    weights.append(occ[idx] if idx < len(occ) else occ[0])
                    seen[e] = idx + 1
            for pool, vec in (("max", m.max(axis=0)), ("mean", m.mean(axis=0))):
                expected = _oracle_bins(vec, weights, bins, "log")
                for b, val in enumerate(expected):
                    key = (qid, str(d),
                           f"{prefix}_Bodytext_{pool.title()}" + (fmt % b))
                    assert by_key[key] == pytest.approx(val, abs=1e-6), key
                    n_checked += 1
        assert n_checked > 50


def test_boe_extra_pools_match_oracle(fam):
    got = boe_emb_extra_pools(
        fam["pairs"], fam["q_ents"], fam["doc_ents"], fam["entity_emb"], top_k=3
    ).collect()
    by_key = {(r["qid"], r["docno"], r["feature"]): r["value"] for r in got}
    n_checked = 0
    for qid, d in fam["pair_rows"]:
        q_es, d_es, m = _sim_matrix(fam, qid, d)
        if m.size == 0:
            continue
        key = (qid, str(d), "BoeEmb_Bodytext_Meanall")
        assert by_key[key] == pytest.approx(float(m.mean()), abs=1e-6)
        flat = sorted(m.reshape(-1).tolist(), reverse=True)
        for k in range(3):
            v = flat[k] if k < len(flat) else 0.0
            key = (qid, str(d), f"BoeEmb_Bodytext_Top_{k}".title().replace(
                "Boeemb", "BoeEmb"))
            # engine name: BoeEmb_Bodytext_Top_0
            key = (qid, str(d), f"BoeEmb_Bodytext_Top_{k}")
            assert by_key[key] == pytest.approx(v, abs=1e-6), key
            n_checked += 1
    assert n_checked > 20


def test_page_rank_matches_oracle(fam):
    got = page_rank_features(
        fam["pairs"], fam["q_ents"], fam["doc_ents"], fam["entity_emb"],
        steps=(1, 5), fields=("bodyText",),
    ).collect()
    by_key = {(r["qid"], r["docno"], r["feature"]): r["value"] for r in got}
    n_checked = 0
    for qid, d in fam["pair_rows"]:
        l_doc_e_all = [e for e in fam["doc_ents_py"].get(d, [])
                       if e in fam["emb_py"]]
        q_es = [e for e in fam["q_ents_py"][qid] if e in fam["emb_py"]]
        feats = {}
        if l_doc_e_all:
            tf: dict[str, int] = {}
            for e in l_doc_e_all:
                tf[e] = tf.get(e, 0) + 1
            items = sorted(tf.items(), key=lambda it: (-it[1], it[0]))
            l_e = [e for e, _ in items]
            z = float(sum(t for _, t in items))
            w = np.array([t / z for _, t in items])
            nmat = len(l_e)
            sim = np.zeros((nmat, nmat))
            for i in range(nmat):
                for j in range(nmat):
                    sim[i, j] = 1.0 if i == j else max(
                        0.0, _cos(fam["emb_py"][l_e[i]], fam["emb_py"][l_e[j]])
                    )
            sim = sim / sim.sum(axis=0)
            for step in (1, 5):
                res = np.array(w)
                for _ in range(step):
                    res = (sim * res).sum(axis=1)
                q_pr = [float(res[l_e.index(q)]) if q in l_e else 0.0
                        for q in q_es]
                feats[step] = (
                    (float(np.mean(q_pr)), float(np.max(q_pr))) if q_pr
                    else (0.0, 0.0)
                )
        for step in (1, 5):
            mean, mx = feats.get(step, (0.0, 0.0))
            assert by_key[(qid, str(d), f"PageRank_bodyText_S{step}_mean")] \
                == pytest.approx(mean, abs=1e-9)
            assert by_key[(qid, str(d), f"PageRank_bodyText_S{step}_max")] \
                == pytest.approx(mx, abs=1e-9)
            n_checked += 2
    assert n_checked > 40


def test_q_de_text_matches_oracle(fam, df_py):
    top_k = 2
    got = q_de_text_features(
        fam["queries"].pipe(lambda p: fam["docs"].sparkSession.createDataFrame(p)),
        fam["pairs"], fam["doc_ents"], fam["body_anno"],
        entity_text_terms(fam["entity_texts"]), fam["ts"],
        fam["total_df"], fam["avgdl"], top_k=top_k,
    ).collect()
    by_key = {(r["qid"], r["docno"], r["feature"]): r["value"] for r in got}
    qtext = fam["queries"].set_index("qid")["query"]
    n_checked = 0
    for qid, d in fam["pair_rows"]:
        h_q = query_lm(qtext.loc[qid])
        doc_es = fam["doc_ents_py"].get(d, [])
        e_tf: dict[str, int] = {}
        for e in doc_es:
            e_tf[e] = e_tf.get(e, 0) + 1
        if not e_tf:
            continue
        # ---- IndriScores oracle
        l_scores, l_tf, l_es = [], [], []
        for e in sorted(e_tf):  # engine tie-break: e asc (pool order-free)
            h_scores = {}
            for e_field in ("name", "desp"):
                text = fam["etexts"].get(e, {}).get(e_field, "")
                sc = _all_scores(h_q, doc_lm(text), df_py,
                                 fam["total_df"], fam["avgdl"])
                for m, v in sc.items():
                    h_scores[e_field.title() + m.title()] = v
            l_scores.append(h_scores)
            l_tf.append(e_tf[e])
            l_es.append(e)
        z = float(sum(l_tf))
        for key in l_scores[0]:
            vals = [h[key] for h in l_scores]
            mx = max(vals)
            ws = sum(v * (t / z) for v, t in zip(vals, l_tf))
            srt = sorted(vals, reverse=True)
            while len(srt) < top_k:
                srt.append(-20.0)
            assert by_key[(qid, str(d), f"QDocETextBodytextMax{key}")] \
                == pytest.approx(mx, abs=1e-9)
            assert by_key[(qid, str(d), f"QDocETextBodytextWsum{key}")] \
                == pytest.approx(ws, abs=1e-9)
            for i in range(top_k):
                assert by_key[(qid, str(d), f"QDocETextBodytext{key}Top{i+1}")] \
                    == pytest.approx(srt[i], abs=1e-9)
            n_checked += 2 + top_k
        # ---- top-k entities per e_field by lm(q, e_text), nonempty only
        for e_field in ("name", "desp"):
            l_e_score = []
            for e in sorted(e_tf):
                text = fam["etexts"].get(e, {}).get(e_field)
                if not text:
                    continue
                s = OracleScorer(h_q, doc_lm(text), {}, None, None)
                l_e_score.append((e, s.lm()))
            l_e_score.sort(key=lambda it: (-it[1], it[0]))
            top = [e for e, _ in l_e_score[:top_k]]
            # TopTf
            h_btf: dict[str, float] = {}
            h_bana: dict[str, float] = {}
            for e, w in fam["body_py"].get(d, []):
                h_btf[e] = h_btf.get(e, 0) + 1
                h_bana[e] = h_bana.get(e, 0) + w
            for k, e in enumerate(top):
                assert by_key[(qid, str(d), f"QDocEText{e_field}Top{k}Tf")] \
                    == pytest.approx(h_btf.get(e, 0.0), abs=1e-9)
                assert by_key[(qid, str(d), f"QDocEText{e_field}Top{k}AnaTf")] \
                    == pytest.approx(h_bana.get(e, 0.0), abs=1e-9)
                n_checked += 2
            # TopExpTextSim: expanded doc, avg_doc_len = 100.0 quirk
            exp_lm: dict[str, int] = {}
            for e in top:
                for t, c in doc_lm(fam["etexts"][e][e_field]).items():
                    exp_lm[t] = exp_lm.get(t, 0) + c
            sc = _all_scores(h_q, exp_lm, df_py, fam["total_df"], 100.0)
            for m in MODELS:
                key = (qid, str(d), f"QDocETextExp{e_field.title()}{m.title()}")
                assert by_key[key] == pytest.approx(sc[m], abs=1e-9), key
                n_checked += 1
    assert n_checked > 300


def test_features_to_map_shape(fam):
    long_feats = boe_emb_extra_pools(
        fam["pairs"], fam["q_ents"], fam["doc_ents"], fam["entity_emb"]
    )
    m = features_to_map(long_feats).collect()
    assert m and all(isinstance(r["features"], dict) for r in m)
    n_long = long_feats.count()
    assert sum(len(r["features"]) for r in m) == n_long  # no name collisions


def test_pretrain_matches_oracle(fam):
    """Pretrain family vs a verbatim replay of pre_trained.py:92-220
    (default-vector persistence across norms, softmax/minmax normalizers,
    sum/max/mean pools over query entities)."""
    from knowledgeir_spark.operators.letor_families import pretrain_features

    dim = 4
    rng = np.random.default_rng(23)
    feat_rows = []
    feats_py: dict[int, dict[str, list[float]]] = {}
    for d, es in fam["doc_ents_py"].items():
        for e in sorted(set(es)):
            if (d + int(e[1])) % 5 == 4:
                continue  # some entities lack the pre-trained vector
            v = [round(float(x), 4) for x in rng.normal(size=dim)]
            feats_py.setdefault(d, {})[e] = v
            feat_rows.append((d, "bodyText", e, v))
    doc_ent_feats = fam["docs"].sparkSession.createDataFrame(
        feat_rows, "doc_id long, field string, e string, features array<double>"
    )
    norms = ("", "softmax", "minmax")
    pools = ("sum", "max", "mean")
    got = pretrain_features(
        fam["pairs"], fam["q_ents"], doc_ent_feats, feature_dim=dim,
        norms=norms, pools=pools,
    ).collect()
    by_key = {(r["qid"], r["docno"], r["feature"]): r["value"] for r in got}

    def norm_m(m, norm):
        if norm == "softmax":
            e = np.exp(m)
            return np.log(e / e.sum(axis=0))
        if norm == "minmax":
            return (m - m.min(axis=0)) / np.maximum(
                m.max(axis=0) - m.min(axis=0), 1e-10)
        return m

    n_checked = 0
    for qid, d in fam["pair_rows"]:
        q_es = fam["q_ents_py"][qid]
        lut0 = feats_py.get(d, {})
        l_e = sorted(lut0)
        m0 = np.array([lut0[e] for e in l_e]) if l_e else np.zeros((0, dim))
        h_q = {q: np.full(dim, -30.0) for q in q_es}
        for norm in norms:
            m = norm_m(m0, norm) if len(m0) else m0
            lut = {e: m[i] for i, e in enumerate(l_e)}
            for q in q_es:
                if q in lut:
                    h_q[q] = lut[q]
            vecs = [h_q[q] for q in q_es]
            for p in range(dim):
                vals = [v[p] for v in vecs]
                exp = {"sum": sum(vals), "max": max(vals),
                       "mean": sum(vals) / len(vals)}
                for pool, suffix in (("sum", "_Sum"), ("max", "_Max"),
                                     ("mean", "_Mean")):
                    key = (qid, str(d),
                           f"Pretrain_bodyText_salience_feature"
                           f"{norm.title()}_{p:03d}{suffix}")
                    assert by_key[key] == pytest.approx(exp[pool], abs=1e-9), key
                    n_checked += 1
    assert n_checked > 500
