"""Query spell correction over the corpus vocabulary (SymSpell-style).

Not in the reference (its queries are curated TREC topics), but a serving
feature every user-facing fulltext engine needs: map a misspelled query
term to the most plausible vocabulary term within a small edit distance,
ranked by a noisy-channel prior (document frequency).

Scale design — the naive formulation is a |inputs| x |vocab| cross join
with a Levenshtein filter, quadratic in vocabulary size.  This module uses
the symmetric-delete trick (SymSpell): for edit distance <= 1, two strings
a, b satisfy lev(a, b) <= 1 ONLY IF their delete-1 neighborhoods intersect
(a = b; substitution: drop the differing char from both; insertion into a:
drop it from a to get b; deletion from a: drop the same char from b to get
a).  So:

1. explode each side into its delete-1 keys (the string itself + each
   single-char deletion) — O(L) keys per term, built-in exprs only;
2. equi-join on the key (a bucketed shuffle join on short strings, never
   a cross join) and dedupe candidate pairs;
3. verify with the exact built-in ``levenshtein`` (JVM-side), which also
   discards the neighborhood's false positives (e.g. transpositions:
   deletes('ab') and deletes('ba') both contain 'a', but lev = 2);
4. rank suggestions per input by (edit distance asc, df desc, term asc)
   and keep the top one — an in-vocabulary input wins with itself at
   ed = 0, so correct terms pass through unchanged.

Both the candidate recall argument (step 1-2 superset of the lev<=1 set)
and the exact verify are engine-portable, so the whole operator has an
exact DuckDB oracle (cross join + levenshtein at sf0.01) in the parity
suite: the scalable plan and the brute-force spec must agree row-for-row.

Skew: delete keys are near-unique in natural-language vocabularies (a
bucket is "all terms one deletion away from the same short string"), and
``min_len`` keeps degenerate 1-2 char inputs — whose neighborhoods ARE
hot — out of the join entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def delete1_keys(col: Column) -> Column:
    """Array of delete-1 variants of ``col``, plus ``col`` itself."""
    return F.array_union(
        F.array(col),
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                F.substring(col, F.lit(1), i - 1),
                F.substring(col, i + 1, F.length(col)),
            ),
        ),
    )


def vocab_df(doc_tf: DataFrame) -> DataFrame:
    """(term, df) from a long-form (doc_id, term, tf) frame."""
    return doc_tf.groupBy("term").agg(F.count("*").alias("df"))


def prefix_suggest(
    vocab: DataFrame,
    prefixes: DataFrame,
    n: int = 5,
    prefix_col: str = "prefix",
    max_key_len: int = 10,
) -> DataFrame:
    """Query autocomplete: top-``n`` vocabulary completions per prefix,
    ranked (df desc, term asc): (prefix, term, df, rank).

    Scale shape: the vocabulary side explodes each term into its prefixes
    of length 1..min(len, ``max_key_len``) — a bounded fan-out like the
    spell delete keys — and the match is an equi-join on the prefix key,
    never a LIKE scan.  Inputs longer than ``max_key_len`` join on their
    first ``max_key_len`` chars and are refiltered with an exact
    startswith, so correctness does not depend on the cap.
    """
    inp = (
        prefixes.select(F.col(prefix_col).alias("prefix"))
        .filter(F.length("prefix") >= 1)
        .distinct()
        .withColumn("pkey", F.substring("prefix", 1, max_key_len))
    )
    keys = vocab.select(
        "term",
        "df",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.least(F.length("term"), F.lit(max_key_len))),
                lambda i: F.substring("term", F.lit(1), i),
            )
        ).alias("pkey"),
    )
    cand = (
        inp.join(keys, "pkey")
        .filter(F.col("term").startswith(F.col("prefix")))
        .select("prefix", "term", "df")
    )
    w = Window.partitionBy("prefix").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def spell_correct(
    inputs: DataFrame,
    vocab: DataFrame,
    input_col: str = "input",
    min_len: int = 3,
) -> DataFrame:
    """Top-1 suggestion per input term: (input, suggestion, ed, sugg_df).

    ``inputs`` needs a string column ``input_col`` (deduped internally);
    ``vocab`` is (term, df).  Inputs shorter than ``min_len`` or with no
    vocabulary term within edit distance 1 produce no row (caller decides
    whether "no suggestion" means pass-through).
    """
    inp = (
        inputs.select(F.col(input_col).alias("input"))
        .filter(F.length("input") >= min_len)
        .distinct()
        .select("input", F.explode(delete1_keys(F.col("input"))).alias("dkey"))
    )
    voc = vocab.select(
        F.col("term").alias("suggestion"),
        F.col("df").alias("sugg_df"),
        F.explode(delete1_keys(F.col("term"))).alias("dkey"),
    )
    cand = (
        inp.join(voc, "dkey")
        .select("input", "suggestion", "sugg_df")
        .distinct()
        .withColumn("ed", F.levenshtein("input", "suggestion"))
        .filter(F.col("ed") <= 1)
    )
    w = Window.partitionBy("input").orderBy(
        F.col("ed").asc(), F.col("sugg_df").desc(), F.col("suggestion").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
