"""S12 NIF scan (regex N-Triples subset) + L5 ranking overview table."""

from __future__ import annotations

import pytest

NIF_SAMPLE = r"""
<http://ex.org/ctx#offset_0_12> <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#anchorOf> "Barack Obama"@en .
<http://ex.org/ctx#offset_0_12> <http://www.w3.org/2005/11/its/rdf#taIdentRef> <http://dbpedia.org/resource/Barack_Obama> .
<http://ex.org/ctx#offset_20_26> <http://www.w3.org/2005/11/its/rdf#taIdentRef> <http://dbpedia.org/resource/United_States> .
<http://ex.org/ctx#offset_20_26> <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#anchorOf> "the US" .
<http://ex.org/ctx2#offset_5_17> <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#anchorOf> "Barack Obama"^^<http://www.w3.org/2001/XMLSchema#string> .
<http://ex.org/ctx2#offset_5_17> <http://www.w3.org/2005/11/its/rdf#taIdentRef> <http://dbpedia.org/resource/Barack_Obama> .
<http://ex.org/ctx3#offset_1_5> <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#anchorOf> "Obáma \"quoted\"" .
<http://ex.org/ctx3#offset_1_5> <http://www.w3.org/2005/11/its/rdf#taIdentRef> <http://dbpedia.org/resource/Barack_Obama> .
<http://ex.org/ctx#offset_0_12> <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#isString> "Barack Obama visited the US" .
not a triple at all
"""


def test_nif_surface_link_map(spark, tmp_path):
    from knowledgeir_spark.sources.nif import (
        nif_triples,
        parse_triple,
        surface_link_map,
        surface_link_stats,
    )

    # unit: literal unescaping and uri objects
    s, p, o = parse_triple(
        '<http://a> <http://b#anchorOf> "x \\"y\\" \\u00e9"@en .'
    )
    assert o == 'x "y" é'
    assert parse_triple("garbage") is None

    src = str(tmp_path / "dump.nt")
    with open(src, "w") as f:
        f.write(NIF_SAMPLE)
    triples = nif_triples(spark, src)
    assert triples.count() == 9  # garbage line dropped
    links = {(r["surface"], r["entity"]): r["n_links"]
             for r in surface_link_map(triples).collect()}
    assert links[("Barack Obama", "Barack_Obama")] == 2
    assert links[("the US", "United_States")] == 1
    assert links[('Obáma "quoted"', "Barack_Obama")] == 1
    stats = {r["surface"]: r for r in
             surface_link_stats(surface_link_map(triples)).collect()}
    assert stats["Barack Obama"]["num_linked"] == 2
    assert stats["Barack Obama"]["targets"][0]["entity"] == "Barack_Obama"


def test_ranking_overview_table(spark):
    from knowledgeir_spark.operators.eval import ranking_overview

    base_rows = [(str(q), 0.5 + (q % 3) * 0.02, 0.3) for q in range(20)]
    better = [(qid, v + 0.2, e + 0.1) for qid, v, e in base_rows]
    worse = [(qid, v - 0.1, e) for qid, v, e in base_rows]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "qid string, ndcg double, err double")
    out = ranking_overview(
        {"base": mk(base_rows), "better": mk(better), "worse": mk(worse)},
        baseline="base", n_trials=300, seed=3,
    ).collect()
    t = {(r["run"], r["metric"]): r for r in out}
    assert len(t) == 6
    b = t[("better", "ndcg")]
    assert b["win"] == 20 and b["p_value"] < 0.05
    assert b["mean"] == pytest.approx(
        sum(v for _, v, _ in better) / 20)
    w = t[("worse", "ndcg")]
    assert w["loss"] == 20 and w["p_value"] > 0.5  # diff negative: never >
    s = t[("base", "ndcg")]
    assert s["tie"] == 20 and s["p_value"] == 0.0
