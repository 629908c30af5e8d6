"""Frozen tokenizer spec (engine spec v1) — pure Python reference impl.

The reference's doc-side term pipeline is ``text2lm(text, clean=True)``
(/root/reference/knowledge4ir/utils/nlp.py:38-44): NLTK word_tokenize ->
punctuation (except '/') replaced by space, empties dropped -> lowercase ->
NLTK-english stopword removal -> whitespace split -> counts.  The query side
is ``text2lm(query.lower())`` with NO cleaning — whitespace split only
(/root/reference/knowledge4ir/duet_feature/matching/ir_fusion.py:52,60).
That doc/query asymmetry is load-bearing for rank identity and is preserved.

NLTK is not a dependency of this engine; the spec below is a deterministic
regex re-definition (documented divergence from NLTK's Penn-Treebank
tokenizer).  Both the engine's Spark expressions
(knowledgeir_spark/functions/text.py) and this oracle implement the SAME
spec, so engine-vs-oracle equality is exact:

  doc terms   = [t for t in re.findall('[a-z0-9/]+', text.lower())
                 if t not in STOPWORDS]
  query terms = query.lower().split()          # punctuation kept, no stopwords
"""

from __future__ import annotations

import re
from collections import Counter

# The classic NLTK english stopword list (public domain word list, 179 words),
# frozen here so the engine has zero runtime data-file dependencies.
STOPWORDS: frozenset[str] = frozenset(
    """a about above after again against ain all am an and any are aren
    aren't as at be because been before being below between both but by can
    couldn couldn't d did didn didn't do does doesn doesn't doing don don't
    down during each few for from further had hadn hadn't has hasn hasn't
    have haven haven't having he her here hers herself him himself his how
    i if in into is isn isn't it it's its itself just ll m ma me mightn
    mightn't more most mustn mustn't my myself needn needn't no nor not now
    o of off on once only or other our ours ourselves out over own re s same
    shan shan't she she's should should've shouldn shouldn't so some such t
    than that that'll the their theirs them themselves then there these they
    this those through to too under until up ve very was wasn wasn't we were
    weren weren't what when where which while who whom why will with won
    won't wouldn wouldn't y you you'd you'll you're you've your yours
    yourself yourselves""".split()
)

# Token = run of lowercase alnum or '/' (reference keeps '/' — nlp.py:11).
TOKEN_RE = re.compile(r"[a-z0-9/]+")


def tokenize_doc(text: str) -> list[str]:
    """Doc-side terms: regex tokenize + lowercase + stopword removal."""
    if not text:
        return []
    return [t for t in TOKEN_RE.findall(text.lower()) if t not in STOPWORDS]


def tokenize_query(query: str) -> list[str]:
    """Query-side terms: lowercase whitespace split ONLY (ir_fusion.py:52)."""
    if not query:
        return []
    return query.lower().split()


def doc_lm(text: str) -> dict[str, int]:
    """term -> tf for one doc (reference term2lm, nlp.py:47-54)."""
    return dict(Counter(tokenize_doc(text)))


def query_lm(query: str) -> dict[str, int]:
    return dict(Counter(tokenize_query(query)))


# --- simple symmetric tokenizer used for the DuckDB-parity query suite on
# the driver's `documents` testdata table (SQL-expressible in both engines):
SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize_simple(text: str) -> list[str]:
    if not text:
        return []
    return SIMPLE_TOKEN_RE.findall(text.lower())
