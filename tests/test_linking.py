"""Entity linking / spotting / grid operators vs reference semantics."""

from __future__ import annotations

import pytest


def test_cmns_link_greedy_longest_first(spark):
    from knowledgeir_spark.operators.linking import cmns_link

    sf = {"new york": "E1", "new york city": "E2", "city": "E3", "Boston": "E4"}
    docs = spark.createDataFrame(
        [
            (0, "i love new york city a lot"),
            (1, "boston is nice"),   # only matches via .title() variant
            (2, "nothing here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["annotations"] for r in cmns_link(docs, sf).collect()}
    # longest-first: 'new york city' (E2) wins over 'new york'+'city'
    a0 = got[0]
    assert [a["id"] for a in a0] == ["E2"]
    assert a0[0]["surface"] == "new york city"
    # char offsets over space-joined stream: 'i love ' = 7 chars
    assert (a0[0]["char_st"], a0[0]["char_ed"]) == (7, 7 + len("new york city"))
    # capitalization variant: 'boston'.title() == 'Boston'
    assert [a["id"] for a in got[1]] == ["E4"]
    assert got[2] == []


def test_spotter_all_candidates_and_caps(spark):
    from knowledgeir_spark.operators.linking import spot_entities

    sf = {
        "big apple": [("E1", 0.9), ("E2", 0.1)],
        "apple": [(f"E{i}", 1.0 / (i + 1)) for i in range(10)],
    }
    docs = spark.createDataFrame([(0, "the big apple shines")], "doc_id long, text string")
    got = spot_entities(docs, sf, max_candidate_per_surface=5).collect()[0]["spot"]
    by_surface = {s["surface"]: s for s in got}
    # non-greedy: both the 2-gram and the inner 1-gram are spotted
    assert set(by_surface) == {"big apple", "apple"}
    assert by_surface["big apple"]["loc"] == [1, 3]
    assert by_surface["apple"]["loc"] == [2, 3]
    assert len(by_surface["apple"]["entities"]) == 5  # cap quirk (spotter.py:36)
    assert by_surface["big apple"]["entities"][0]["id"] == "E1"
    # only_longest: greedy skip
    got2 = spot_entities(docs, sf, only_longest=True).collect()[0]["spot"]
    assert [s["surface"] for s in got2] == ["big apple"]


def test_entity_grid_rebases_offsets(spark):
    from knowledgeir_spark.operators.linking import entity_grid, spot_entities

    sf = {"alpha": [("E1", 1.0)], "gamma": [("E2", 1.0)]}
    docs = spark.createDataFrame(
        [(0, "alpha beta. gamma delta epsilon.")], "doc_id long, text string"
    )
    # note: spotter sees raw tokens incl. punctuation-attached ones
    spotted = spot_entities(docs, sf)
    grid = entity_grid(spotted, docs).collect()
    rows = {r["sent_idx"]: r for r in grid}
    assert rows[0]["sentence"] == "alpha beta"
    assert rows[1]["sentence"] == "gamma delta epsilon"
    assert [s["surface"] for s in rows[0]["spot"]] == ["alpha"]
    assert rows[0]["spot"][0]["loc"] == [0, 1]
    assert [s["surface"] for s in rows[1]["spot"]] == ["gamma"]
    # rebased: 'gamma' is token 2 globally, token 0 in sentence 1
    assert rows[1]["spot"][0]["loc"] == [0, 1]


def test_boe_overlap(spark):
    from knowledgeir_spark.operators.linking import boe_overlap

    q = spark.createDataFrame(
        [("1", ["E1", "E2"]), ("2", ["E9"])], "qid string, entities array<string>"
    )
    d = spark.createDataFrame(
        [(10, ["E1", "E3"]), (11, ["E1", "E2", "E4"]), (12, ["E5"])],
        "doc_id long, entities array<string>",
    )
    got = {(r["qid"], r["doc_id"]): (r["n_overlap"], r["q_coverage"])
           for r in boe_overlap(q, d).collect()}
    assert got[("1", 10)] == (1, 0.5)
    assert got[("1", 11)] == (2, 1.0)
    assert ("2", 12) not in got and ("1", 12) not in got


def test_ac_spotter_matches_bruteforce(spark):
    """Aho-Corasick spotter == re.finditer brute force over every surface,
    including overlaps, duplicates and the reference's loc quirk
    (spotter.py:63-65: begin = last_char_index - len(key))."""
    import re

    from knowledgeir_spark.operators.linking import ac_spot_entities

    sf = {
        "spark": [("E:spark", 0.9)],
        "park": [("E:park", 0.5), ("E:park2", 0.3)],
        "data lake": [("E:dl", 1.0)],
        "lake": [("E:lake", 0.8)],
        "a": [("E:a", 0.1)],
    }
    docs = spark.createDataFrame(
        [(0, "Spark over the data lake in a park"),
         (1, "aaa"), (2, ""), (3, "nothing matches here?? qqq")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["spot"] for r in ac_spot_entities(docs, sf).collect()}
    for doc_id, text in [(0, "Spark over the data lake in a park"),
                         (1, "aaa"), (2, ""), (3, "nothing matches here?? qqq")]:
        t = text.lower()
        expected = sorted(
            (m.start() + len(k) - 1, k)
            for k in sf for m in re.finditer(re.escape(k), t)
        )
        have = sorted(
            (a["loc"][1], a["surface"]) for a in got[doc_id]
        )
        assert have == expected, doc_id
        for a in got[doc_id]:
            # loc quirk: [last_idx - len(key), last_idx]
            assert a["loc"][0] == a["loc"][1] - len(a["surface"])
            assert [e["id"] for e in a["entities"]] == [x[0] for x in sf[a["surface"]]]


def test_ac_spotter_scales_to_large_dict(spark):
    """>=10^5 surfaces: automaton build + spotting stays fast (the greedy
    n-gram scan is the small-dict path; this is the big-dict one)."""
    import time

    from knowledgeir_spark.operators.linking import ac_spot_entities

    sf = {f"entity{i:06d} phrase": [(f"E{i}", 1.0)] for i in range(100_000)}
    sf["needle in haystack"] = [("E:needle", 1.0)]
    text = ("filler words " * 200) + "the needle in haystack appears " + (
        "entity000042 phrase also " * 2)
    docs = spark.createDataFrame(
        [(i, text) for i in range(20)], "doc_id long, text string"
    )
    t0 = time.monotonic()
    rows = {r["doc_id"]: r["spot"] for r in ac_spot_entities(docs, sf).collect()}
    elapsed = time.monotonic() - t0
    surfaces = {a["surface"] for a in rows[0]}
    assert {"needle in haystack", "entity000042 phrase"} <= surfaces
    assert elapsed < 120, elapsed


def test_cmns_stemming_variant(spark):
    """cmns.py:97-120 stemming branch: plural surfaces fold to the dict's
    singular via morphy noun rules; quirks preserved (surface = stemmed
    phrase, char_ed spans the ORIGINAL phrase; raw variants tried first)."""
    from knowledgeir_spark.operators.linking import cmns_link, lemma_noun_simple

    assert lemma_noun_simple("cities") == "city"
    assert lemma_noun_simple("boxes") == "box"
    assert lemma_noun_simple("churches") == "church"
    assert lemma_noun_simple("glasses") == "glass"
    assert lemma_noun_simple("women") == "woman"  # -men -> -man
    assert lemma_noun_simple("dogs") == "dog"
    assert lemma_noun_simple("s") == "s"  # too short to strip

    sf = {"new york city": "E:nyc", "dog": "E:dog", "dogs": "E:dogs"}
    docs = spark.createDataFrame(
        [(0, "the new york cities dogs bark"), (1, "dog runs")],
        "doc_id long, text string",
    )
    plain = {r["doc_id"]: r["annotations"]
             for r in cmns_link(docs, sf, stemming=False).collect()}
    stemmed = {r["doc_id"]: r["annotations"]
               for r in cmns_link(docs, sf, stemming=True).collect()}
    # without stemming: only the exact-form 'dogs' matches in doc 0
    assert [a["id"] for a in plain[0]] == ["E:dogs"]
    # with stemming: 'new york cities' folds to the dict surface; raw
    # variants come first so 'dogs' still hits its own exact entry
    ids = [a["id"] for a in stemmed[0]]
    assert ids == ["E:nyc", "E:dogs"]
    nyc = stemmed[0][0]
    assert nyc["surface"] == "new york city"  # stemmed surface recorded
    # char_ed spans the ORIGINAL 'new york cities' (reference quirk)
    assert nyc["char_ed"] - nyc["char_st"] == len("new york cities")
    assert [a["id"] for a in stemmed[1]] == ["E:dog"]
