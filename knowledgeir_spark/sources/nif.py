"""NIF/RDF scan (SURVEY §2.1 S12; reference /root/reference/linker/data/
nif_parser.py:1-59 + scan_wiki_links.py:139-176).

The reference streams DBpedia NIF dumps through rdflib and pairs, per
triple subject, `nif-core#anchorOf` (the surface literal) with
`#taIdentRef` (the linked resource) to build the surface-form link map —
the upstream source of the cmns surface dictionary.

rdflib is not in this container, and the DBpedia NIF dumps are
line-oriented N-Triples (one `<s> <p> o .` statement per line), so the
engine parses that subset with a vectorized regex inside mapInPandas —
Spark reads the (optionally .gz/.bz2) text transparently and in parallel
splits.  The anchor/ident pairing is a groupBy on the subject (the
reference's anchors/link_to dicts are exactly a hash join on s), which also
makes the scan order-independent — the reference depends on both triples
of a subject arriving in one batch.

Out of scope (declared): full Turtle (prefixes, multi-line literals,
blank-node syntax) — DBpedia NIF dumps don't use them.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TRIPLE_RE = re.compile(
    r'^\s*<([^>]*)>\s+<([^>]*)>\s+'            # <subject> <predicate>
    r'(?:<([^>]*)>'                            # <uri> object ...
    r'|"((?:[^"\\]|\\.)*)"(?:@[\w-]+|\^\^<[^>]*>)?)'  # ... or literal[@l|^^t]
    r'\s*\.\s*$'
)

_ESCAPES = {
    r"\\": "\\", r"\"": '"', r"\n": "\n", r"\t": "\t", r"\r": "\r",
}


def _unescape(lit: str) -> str:
    out = re.sub(
        r"\\u([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), lit
    )
    out = re.sub(
        r"\\U([0-9a-fA-F]{8})", lambda m: chr(int(m.group(1), 16)), out
    )
    for k, v in _ESCAPES.items():
        out = out.replace(k, v)
    return out


def parse_triple(line: str) -> tuple[str, str, str] | None:
    m = _TRIPLE_RE.match(line)
    if not m:
        return None
    s, p, o_uri, o_lit = m.groups()
    return s, p, o_uri if o_uri is not None else _unescape(o_lit or "")


def nif_triples(spark: SparkSession, path: str) -> DataFrame:
    """(s, p, o) triples from an N-Triples NIF dump (text/gz/bz2)."""
    lines = spark.read.text(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                t = parse_triple(line or "")
                if t is not None:
                    rows.append({"s": t[0], "p": t[1], "o": t[2]})
            yield pd.DataFrame(rows, columns=["s", "p", "o"])

    return lines.mapInPandas(run, "s string, p string, o string")


def get_resource_name(uri: str) -> str:
    """scan_wiki_links.get_resource_name analog: the last path segment."""
    return uri.rsplit("/", 1)[-1]


def surface_link_map(triples: DataFrame) -> DataFrame:
    """(surface, entity, n_links) — anchorOf literals paired with their
    subject's taIdentRef target (scan_wiki_links.py:150-176), counted over
    all mentions.  The reference's SurfaceLinkMap accumulates per-surface
    per-target counts; this is its long form (pivot downstream as needed)."""
    anchors = triples.filter(F.col("p").endswith("nif-core#anchorOf")).select(
        "s", F.col("o").alias("surface")
    )
    idents = triples.filter(F.col("p").endswith("#taIdentRef")).select(
        "s", F.col("o").alias("_target")
    )
    return (
        anchors.join(idents, "s")
        .select(
            "surface",
            F.element_at(F.split("_target", "/"), -1).alias("entity"),
        )
        .groupBy("surface", "entity")
        .agg(F.count("*").alias("n_links"))
    )


def surface_link_stats(link_map: DataFrame) -> DataFrame:
    """Per surface: total appearances across targets + the target list
    sorted by count desc (the write_as_json shape, scan_wiki_links.py:183+,
    minus the context-appearance denominator which needs the isString
    corpus scan)."""
    return (
        link_map.groupBy("surface")
        .agg(
            F.sum("n_links").alias("num_linked"),
            F.reverse(
                F.array_sort(
                    F.collect_list(F.struct("n_links", "entity"))
                )
            ).alias("targets"),
        )
    )
