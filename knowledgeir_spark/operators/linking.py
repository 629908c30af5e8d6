"""Entity linking / annotation operators (SURVEY.md §2.9 E1-E4, §2.5 J10-J12).

Doc-local sequence scans re-expressed as Arrow pandas UDFs with the surface
dict broadcast to executors:

- cmns_link: greedy longest-first exact-match linker, faithful to
  /root/reference/knowledge4ir/entity_linking/cmns.py:70-113 — window up to
  max_surface_len tokens, case variants [raw, Title, UPPER] tried in order,
  greedy skip past a match, CHAR offsets computed over the space-joined
  token stream (offset += len(phrase)+1), emits [id, char_st, char_ed,
  surface].
- spot_entities: the all-candidate spotter, faithful to
  /root/reference/knowledge4ir/joint/spotting/spotter.py:61-136 — ≤5-gram
  windows scanned longest-first PER START (not greedy unless only_longest),
  TOKEN offsets [st, ed), candidates capped at max_candidate_per_surface,
  case priority [Title, raw] for phrases longer than 3 chars
  (_capitalization_ngrams, :102-112).
- entity_grid: sentence bucketing of token-span annotations with offset
  rebase (entity_grid/construction.py:31-100; deterministic sentence split
  on [.!?] instead of NLTK).
- boe_overlap: exact-match bag-of-entities q∩d features (boe_exact/
  boe_feature.py:185-207) as an array_intersect join.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANNOTATION_SCHEMA = (
    "array<struct<surface:string, loc:array<int>, "
    "entities:array<struct<id:string, cmns:double>>>>"
)


# WordNet morphy noun detachment rules (T8 approximation: the reference
# lemmatizes candidate phrases with WordNetLemmatizer noun mode,
# cmns.py:115-120; without the WordNet lexicon the engine applies morphy's
# suffix-detachment rules unconditionally — identical on regular plurals,
# may over-strip rare irregulars, documented deviation)
_MORPHY_NOUN_RULES = (
    ("ches", "ch"), ("shes", "sh"), ("xes", "x"), ("zes", "z"),
    ("ses", "s"), ("ies", "y"), ("men", "man"), ("s", ""),
)


def lemma_noun_simple(term: str) -> str:
    for suf, rep in _MORPHY_NOUN_RULES:
        if term.endswith(suf) and len(term) > len(suf):
            return term[: -len(suf)] + rep
    return term


def _phrase_stem(phrase: str) -> str:
    """cmns.py:115-120 per-term noun lemmatization of a phrase."""
    return " ".join(lemma_noun_simple(t) for t in phrase.split())


def cmns_link(
    docs: DataFrame,
    surface_form: dict[str, str],
    max_surface_len: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    stemming: bool = False,
) -> DataFrame:
    """(doc_id, annotations array<struct<id, char_st, char_ed, surface>>).
    surface_form: {surface -> entity id} (case-sensitive keys, like the
    reference's read_surface_form).  stemming=True additionally tries the
    noun-lemmatized phrase when the raw variants miss (cmns.py:97-106);
    reference quirks preserved: the annotation's surface is the STEMMED
    phrase, but its char_ed spans the ORIGINAL phrase's length."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(surface_form)

    def link_one(text: str) -> list:
        h = bc.value
        l_term = (text or "").split()
        out = []
        offset = 0
        st = 0
        while st < len(l_term):
            matched = False
            for ed in range(max_surface_len):
                phrase = " ".join(l_term[st : st + max_surface_len - ed])
                for this_phrase in (phrase, phrase.title(), phrase.upper()):
                    if this_phrase in h:
                        out.append(
                            {
                                "id": h[this_phrase],
                                "char_st": offset,
                                "char_ed": offset + len(this_phrase),
                                "surface": this_phrase,
                            }
                        )
                        st += max_surface_len - ed
                        offset += len(this_phrase) + 1
                        matched = True
                        break
                    if stemming:
                        stemmed = _phrase_stem(this_phrase)
                        if stemmed in h:
                            out.append(
                                {
                                    "id": h[stemmed],
                                    "char_st": offset,
                                    "char_ed": offset + len(this_phrase),
                                    "surface": stemmed,
                                }
                            )
                            st += max_surface_len - ed
                            offset += len(this_phrase) + 1
                            matched = True
                            break
                if matched:
                    break
            if not matched:
                offset += len(l_term[st]) + 1
                st += 1
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "annotations": pdf[text_col].map(link_one),
                }
            )

    schema = (
        "doc_id long, annotations array<struct<id:string, char_st:int, "
        "char_ed:int, surface:string>>"
    )
    return docs.select(id_col, text_col).mapInPandas(run, schema)


def spot_entities(
    docs: DataFrame,
    surface_candidates: dict[str, list[tuple[str, float]]],
    max_surface_len: int = 5,
    max_candidate_per_surface: int = 5,
    only_longest: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, spot ANNOTATION_SCHEMA) — all-candidate spotter.
    surface_candidates: {surface -> [(entity_id, cmns prior), ...]}."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(surface_candidates)

    def spot_one(text: str) -> list:
        h_sf = bc.value
        l_terms = (text or "").split()
        l_spot = []
        st = 0
        while st < len(l_terms):
            for reverse_len in range(max_surface_len):
                ed = st + max_surface_len - reverse_len
                if ed > len(l_terms):
                    continue
                sub_str = " ".join(l_terms[st:ed])
                variations = (
                    [sub_str.title(), sub_str] if len(sub_str) > 3 else [sub_str]
                )
                spotted = False
                for ngram in variations:
                    l_ana = h_sf.get(ngram, [])[:max_candidate_per_surface]
                    if l_ana:
                        l_spot.append(
                            {
                                "surface": ngram,
                                "loc": [st, ed],
                                "entities": [
                                    {"id": e, "cmns": float(p)} for e, p in l_ana
                                ],
                            }
                        )
                        spotted = True
                        break
                if only_longest and spotted:
                    st = ed - 1
                    break
            st += 1
        return l_spot

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "spot": pdf[text_col].map(spot_one)}
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, f"doc_id long, spot {ANNOTATION_SCHEMA}"
    )


def entity_grid(
    spotted: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sent_idx, sentence, spot) — annotations bucketed into
    sentences with token offsets REBASED per sentence (construction.py:31-100).
    Deterministic sentence split on [.!?]+ (documented divergence from NLTK
    sent_tokenize)."""
    joined = docs.select(id_col, text_col).join(spotted, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        sent_re = re.compile(r"[.!?]+")
        for pdf in batches:
            rows = []
            for doc_id, text, spots in zip(pdf[id_col], pdf[text_col], pdf["spot"]):
                sents = [s.strip() for s in sent_re.split(text or "") if s.strip()]
                bounds = []
                start = 0
                for s in sents:
                    n = len(s.split())
                    bounds.append((start, start + n))
                    start += n
                if spots is None:
                    spots = []
                for si, (s, (lo, hi)) in enumerate(zip(sents, bounds)):
                    in_sent = []
                    for a in spots:
                        st, ed = int(a["loc"][0]), int(a["loc"][1])
                        if st >= lo and ed <= hi:
                            in_sent.append(
                                {
                                    "surface": a["surface"],
                                    "loc": [st - lo, ed - lo],
                                    "entities": [
                                        {"id": e["id"], "cmns": float(e["cmns"])}
                                        for e in (
                                            a["entities"]
                                            if a["entities"] is not None
                                            else []
                                        )
                                    ],
                                }
                            )
                    rows.append(
                        {"doc_id": doc_id, "sent_idx": si, "sentence": s, "spot": in_sent}
                    )
            yield pd.DataFrame(rows)

    return joined.mapInPandas(
        run, f"doc_id long, sent_idx int, sentence string, spot {ANNOTATION_SCHEMA}"
    )


def boe_overlap(
    q_entities: DataFrame, doc_entities: DataFrame
) -> DataFrame:
    """Exact-match BOE features per (qid, doc_id): overlap count, coverage
    (J10, boe_feature.py:185-207).  Inputs: (qid, entities array<string>),
    (doc_id, entities array<string>)."""
    q = q_entities.select("qid", F.col("entities").alias("q_ents"))
    d = doc_entities.select("doc_id", F.col("entities").alias("d_ents"))
    return (
        d.crossJoin(F.broadcast(q))
        .select(
            "qid", "doc_id",
            F.size(F.array_intersect("q_ents", "d_ents")).alias("n_overlap"),
            (
                F.size(F.array_intersect("q_ents", "d_ents"))
                / F.greatest(F.size("q_ents"), F.lit(1))
            ).alias("q_coverage"),
        )
        .filter(F.col("n_overlap") > 0)
    )


# ---------------------------------------------------------------------------
# Aho-Corasick spotter (E3 full version; round-1 shipped the greedy n-gram
# scan only).  /root/reference/linker/spot/spotter.py:17-67 builds a
# character-level automaton over LOWERCASED surface keys and emits every
# occurrence of every key (overlaps allowed, no word-boundary check).  The
# automaton is built once on the driver and broadcast; matching is O(chars)
# per doc regardless of dictionary size — the right tool when the surface
# dict is >> 10^6 entries (the greedy scan pays an n-gram dict lookup per
# token position x per length).


class AhoCorasick:
    """Pure-Python Aho-Corasick (goto / fail / merged output links)."""

    __slots__ = ("goto", "fail", "out")

    def __init__(self, keyed_values):
        from collections import deque

        goto: list[dict] = [{}]
        out: list[list] = [[]]
        for key, val in keyed_values:
            node = 0
            for ch in key:
                nxt = goto[node].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[node][ch] = nxt
                node = nxt
            out[node].append((key, val))
        fail = [0] * len(goto)
        q = deque()
        for nxt in goto[0].values():
            q.append(nxt)
        while q:
            r = q.popleft()
            for ch, u in goto[r].items():
                q.append(u)
                f = fail[r]
                while f and ch not in goto[f]:
                    f = fail[f]
                nf = goto[f].get(ch, 0)
                fail[u] = 0 if nf == u else nf
                out[u] = out[u] + out[fail[u]]
        self.goto, self.fail, self.out = goto, fail, out

    def iter_matches(self, text: str):
        """Yields (last_char_index, key, value) for every occurrence."""
        node = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, ch in enumerate(text):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                for key, val in out[node]:
                    yield i, key, val


def ac_spot_entities(
    docs: DataFrame,
    surface_candidates: dict[str, list[tuple[str, float]]],
    max_candidate_per_surface: int = 5,
    lowercase_text: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, spot) — every occurrence of every dictionary surface, char
    offsets.  Quirk preserved from spotter.py:63-65: the reference computes
    begin_index = end_index - len(key) where pyahocorasick's end_index is
    the LAST character's index, so loc = [match_start - 1, last_char_index]
    — off by one from the natural span, kept verbatim for parity (the
    surface string itself is authoritative).  Keys are lowercased at build
    (spotter.py:43); lowercase_text=True also lowers the text at match time
    (the reference matches raw text against lowered keys, which silently
    misses capitalized mentions — set False to reproduce that)."""
    spark = docs.sparkSession
    ac = AhoCorasick(
        (
            surface.lower(),
            [(e, float(p)) for e, p in cands[:max_candidate_per_surface]],
        )
        for surface, cands in surface_candidates.items()
    )
    bc = spark.sparkContext.broadcast(ac)

    def spot_one(text: str) -> list:
        a = bc.value
        t = (text or "")
        if lowercase_text:
            t = t.lower()
        return [
            {
                "surface": key,
                "loc": [end - len(key), end],
                "entities": [{"id": e, "cmns": p} for e, p in val],
            }
            for end, key, val in a.iter_matches(t)
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "spot": pdf[text_col].map(spot_one)}
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, f"doc_id long, spot {ANNOTATION_SCHEMA}"
    )
