"""Text/LM similarity functions (SURVEY.md §2.8 F13-F16, §2.4 A13).

- lm_cosine: sparse term-vector cosine of two map<string,int> LMs, faithful
  to /root/reference/knowledge4ir/utils/nlp.py:84-102 (0 when either side is
  empty or zero-norm).
- avg_embedding: mean of in-vocab token vectors after clean+stopword removal
  (nlp.py:105-113) — explode -> broadcast-join embeddings -> per-dim avg.
- bin_similarity / form_bins: fixed-bin histogram of similarity scores,
  faithful to utils/base.py:507-533 incl. quirks: a score lands in the FIRST
  bin whose lower bound it meets (bins descending from 1), scores below the
  last bound are dropped, and the 'log' bin_func is log(max(count, 1e-10))
  — i.e. empty bins become log(1e-10) = -23.02... .
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokenize_expr


def lm_cosine(a: Column, b: Column) -> Column:
    """Cosine of two map<string,numeric> language models."""
    ka = F.map_keys(a)
    dot = F.aggregate(
        ka,
        F.lit(0.0),
        lambda k: F.lit(0.0),  # placeholder; replaced below
    )
    # expr-based: sum over keys of a: a[k]*b.get(k,0)
    dot = F.aggregate(
        ka,
        F.lit(0.0),
        lambda acc, k: acc
        + F.element_at(a, k).cast("double")
        * F.coalesce(F.element_at(b, k).cast("double"), F.lit(0.0)),
    )
    norm_a = F.sqrt(
        F.aggregate(
            F.map_values(a), F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    norm_b = F.sqrt(
        F.aggregate(
            F.map_values(b), F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return F.when(
        (F.size(a) == 0) | (F.size(b) == 0) | (norm_a == 0) | (norm_b == 0),
        F.lit(0.0),
    ).otherwise(dot / norm_a / norm_b)


def avg_embedding(
    docs: DataFrame,
    embeddings: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str = "token",
    vec_col: str = "vector",
) -> DataFrame:
    """(doc_id, avg_vec array<double>) — mean of in-vocab token vectors;
    docs with no in-vocab tokens are absent (reference returns None)."""
    toks = docs.select(
        F.col(id_col), F.explode(tokenize_expr(F.col(text_col))).alias(token_col)
    )
    joined = toks.join(F.broadcast(embeddings), token_col)
    dim = len(embeddings.select(vec_col).first()[0])
    per_dim = joined.select(
        id_col,
        *[F.col(vec_col)[i].cast("double").alias(f"_d{i}") for i in range(dim)],
    )
    agg = per_dim.groupBy(id_col).agg(
        *[F.avg(f"_d{i}").alias(f"_d{i}") for i in range(dim)]
    )
    return agg.select(
        id_col, F.array(*[F.col(f"_d{i}") for i in range(dim)]).alias("avg_vec")
    )


def form_bins(nb_bin: int, bin_range: float = 1.0) -> list[float]:
    """base.py:525-533: descending lower bounds starting at 1."""
    l_bins = [1.0]
    if nb_bin == 1:
        return l_bins
    bin_size = bin_range / float(nb_bin - 1)
    for i in range(nb_bin - 1):
        l_bins.append(l_bins[i] - bin_size)
    return l_bins


def bin_similarity(
    sims: DataFrame,
    group_cols: list[str],
    sim_col: str,
    nb_bin: int = 5,
    bin_func: str = "log",
) -> DataFrame:
    """Per group: counts per bin (first bound <= sim wins; below-all dropped),
    then 'log' (log(max(c,1e-10))) or 'norm_tf' (c/total) — base.py:507-523.
    Output: group_cols + bin_0..bin_{n-1}."""
    bins = form_bins(nb_bin)
    bin_idx = F.lit(None).cast("int")
    # first matching bound wins -> evaluate in order via chained when
    expr = None
    for i, bound in enumerate(bins):
        cond = F.col(sim_col) >= F.lit(bound)
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    bin_idx = expr
    counted = (
        sims.withColumn("_bin", bin_idx)
        .filter(F.col("_bin").isNotNull())
        .groupBy(*group_cols, "_bin")
        .agg(F.count("*").alias("_c"))
    )
    pivoted = (
        counted.groupBy(*group_cols)
        .pivot("_bin", list(range(nb_bin)))
        .sum("_c")
        .na.fill(0)
    )
    out_cols = [F.col(c) for c in group_cols]
    if bin_func == "log":
        for i in range(nb_bin):
            out_cols.append(
                F.log(F.greatest(F.col(str(i)).cast("double"), F.lit(1e-10))).alias(
                    f"bin_{i}"
                )
            )
    elif bin_func == "norm_tf":
        total = None
        for i in range(nb_bin):
            t = F.col(str(i)).cast("double")
            total = t if total is None else total + t
        for i in range(nb_bin):
            out_cols.append(
                F.when(total > 0, F.col(str(i)).cast("double") / total)
                .otherwise(F.lit(0.0))
                .alias(f"bin_{i}")
            )
    else:
        for i in range(nb_bin):
            out_cols.append(F.col(str(i)).cast("double").alias(f"bin_{i}"))
    return pivoted.select(*out_cols)
