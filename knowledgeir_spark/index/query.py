"""Index query path: pruned BM25 top-k from the posting shards.

Plan shape (SURVEY.md §3.2 "Spark shape"):

  postings scan [bucket partition-pruned to <= |q| buckets,
                 term predicate pushed to parquet row groups]
    ⋈ broadcast(query terms)
    → groupBy(qid, salt).applyInPandas(block-max pruned scorer)   [local top-k]
    → window top-k merge                                          [global]

Each (qid, salt) group holds the query's posting blocks for ONE contiguous
doc_id range (the build's range salt), so groups are disjoint in docs: local
top-k lists merge into the exact global top-k.  Executors therefore process
doc ranges in parallel per query — the WAND analog of doc-partitioned
sharding in Lucene/Indri.

Pruning inside a group ("block-max sort + chunked rescore", exact):
  1. decode blocks, accumulate per-doc UPPER BOUND from block-max metadata
     (bound = contrib(max_tf, min_doc_len) per block — no scoring yet);
  2. sort candidates by bound desc; exact-score in chunks, keep a running
     top-k threshold θ; STOP when the next chunk's max bound quantized below
     θ quantized (floor(x*1e9), the engine-wide ranking key).  Monotonicity
     (exact <= bound) makes the early exit exact, including doc_id
     tie-breaks, which is asserted against the unpruned path in tests.

Scores are rank-identical to the full-scan DataFrame path and the oracle
(same ordered summation + quantized ranking key).
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.topk import topk_per_query
from .build import term_bucket_py
from .codec import decode_blocks_concat, decode_ids_concat, decode_payload, delta_decode
from . import scoring_np as S

_RANK_Q = 1e9
_CHUNK = 1024
# engage decode-level WAND only when there is enough to skip
_BMW_MIN_BLOCKS = 32
# introspection: the last dense-scorer run's skip statistics (tests assert
# the MaxScore path actually engages; bench reads it for reporting)
_LAST_DENSE_STATS: dict = {}


def _score_group(
    pdf: pd.DataFrame,
    q_terms: dict[str, list[dict]],
    n: float,
    avgdl: float,
    model: str,
    k: int,
    prune: bool,
    codec: str = "varint",
) -> pd.DataFrame:
    """One (qid, salt) group -> local top-k (qid, doc_id, score)."""
    qid = pdf["qid"].iat[0]
    terms = q_terms[qid]
    # decode all blocks per term in three vectorized passes (segmented
    # cumsum over concatenated varint streams — see codec.decode_blocks_concat)
    df_by_term = {t["term"]: float(t["df"]) for t in terms}
    id_by: dict[str, np.ndarray] = {}
    tf_raw: dict[str, np.ndarray] = {}
    dl_raw: dict[str, np.ndarray] = {}
    bound_by: dict[str, np.ndarray] = {}
    for term, g in pdf.groupby("term", sort=False):
        ids, tfs, dls = decode_blocks_concat(
            [bytes(x) for x in g["doc_id_deltas"]],
            [bytes(x) for x in g["tfs"]],
            [bytes(x) for x in g["doc_lens"]],
            g["n_docs"].tolist(),
            codec=codec,
        )
        id_by[term] = ids.astype(np.int64)
        tf_raw[term] = tfs.astype(np.float64)
        dl_raw[term] = dls.astype(np.float64)
        if prune and model == "bm25":
            mt = g["max_tf"].to_numpy(np.float64)
            mdl = g["min_doc_len"].to_numpy(np.float64)
            df = df_by_term[term]
            tf_part = mt * (S.BM25_K1 + 1) / (
                mt + S.BM25_K1 * (1 - S.BM25_B + S.BM25_B * mdl / avgdl)
            )
            ratio = max((n - df + 0.5) / (df + 0.5), 1.0)
            idf = max(math.log(ratio), 0.0)
            bound_by[term] = np.repeat(
                ratio * tf_part * idf, g["n_docs"].to_numpy(np.int64)
            )
    if not id_by:
        return pd.DataFrame({"qid": [], "doc_id": [], "score": []})
    all_ids = np.unique(np.concatenate(list(id_by.values())))
    n_cand = len(all_ids)
    dl = np.zeros(n_cand, dtype=np.float64)
    tf_by_term: dict[str, np.ndarray] = {}
    pos_by: dict[str, np.ndarray] = {}
    for term, ids in id_by.items():
        pos = np.searchsorted(all_ids, ids)
        pos_by[term] = pos
        v = np.zeros(n_cand, dtype=np.float64)
        v[pos] = tf_raw[term]
        tf_by_term[term] = v
        dl[pos] = dl_raw[term]

    if prune and model == "bm25" and n_cand > 4 * k:
        # per-doc upper bound = sum over terms of that doc's block bound
        ub = np.zeros(n_cand, dtype=np.float64)
        for term, bounds in bound_by.items():
            ub[pos_by[term]] += bounds
        ub = np.log(np.maximum(ub, 1.0))  # same finalize as bm25 (monotone)
        order = np.argsort(-ub, kind="stable")
        theta_q = -np.inf
        kept_ids: list[np.ndarray] = []
        kept_scores: list[np.ndarray] = []
        n_scored = 0
        for start in range(0, n_cand, _CHUNK):
            sel = order[start : start + _CHUNK]
            if math.floor(ub[sel[0]] * _RANK_Q) < theta_q:
                break  # no remaining doc can beat the current k-th (exact<=ub)
            sub_tf = {t: v[sel] for t, v in tf_by_term.items()}
            sc = S.score_terms(model, terms, sub_tf, dl[sel], n, avgdl)
            kept_ids.append(all_ids[sel])
            kept_scores.append(sc)
            n_scored += len(sel)
            flat_s = np.concatenate(kept_scores)
            if len(flat_s) >= k:
                qkeys = np.floor(flat_s * _RANK_Q)
                theta_q = np.partition(qkeys, len(qkeys) - k)[len(qkeys) - k]
        ids_out = np.concatenate(kept_ids)
        scores_out = np.concatenate(kept_scores)
    else:
        ids_out = all_ids
        scores_out = S.score_terms(model, terms, tf_by_term, dl, n, avgdl)

    # local top-k with the engine ranking key (quantized desc, doc_id asc)
    qkeys = np.floor(scores_out * _RANK_Q).astype(np.int64)
    order = np.lexsort((ids_out, -qkeys))[: k]
    return pd.DataFrame(
        {"qid": qid, "doc_id": ids_out[order], "score": scores_out[order]}
    )


def _score_group_bmw(
    pdf: pd.DataFrame,
    q_terms: dict[str, list[dict]],
    n: float,
    avgdl: float,
    k: int,
    codec: str = "varint",
    init_batch: int = 256,
) -> pd.DataFrame:
    """Cursor-style Block-Max WAND at DECODE granularity (bm25 only) — the
    head-term serving lever: blocks whose doc-id range lies entirely in
    segments bounded below the running top-k threshold are never decoded.

    _score_group prunes at the SCORING stage (it decodes every posting block
    first, so a Zipf head term costs ~df decode work regardless of k).  Here
    the doc-id axis is split into segments at block boundaries; each
    segment's upper bound is the sum of its covering blocks' block-max
    bounds (valid because a term's blocks are disjoint in doc_id: at most
    one block per term covers a segment, and block-max >= any member's
    contribution).  Segments are visited in bound-descending batches, each
    batch scored in ONE vectorized union (no per-doc Python), theta updated,
    and all remaining segments with quantized finalized bound < theta
    dropped.  Exact, including doc_id tie-breaks: ties (== theta) are always
    scored, and the quantized ranking key floor(score*1e9) matches the
    engine-wide contract.
    """
    qid = str(pdf["qid"].iat[0])
    terms = q_terms[qid]
    df_by_term = {t["term"]: float(t["df"]) for t in terms}

    # per-term block tables sorted by first_doc_id; bounds need NO decode
    tg: dict[str, dict] = {}
    total_blocks = 0
    for term, g in pdf.groupby("term", sort=False):
        first = g["first_doc_id"].to_numpy(np.int64)
        order = np.argsort(first, kind="stable")
        g = g.iloc[order]
        first = first[order]
        mt = g["max_tf"].to_numpy(np.float64)
        mdl = g["min_doc_len"].to_numpy(np.float64)
        df = df_by_term[term]
        tf_part = mt * (S.BM25_K1 + 1) / (
            mt + S.BM25_K1 * (1 - S.BM25_B + S.BM25_B * mdl / avgdl)
        )
        ratio = max((n - df + 0.5) / (df + 0.5), 1.0)
        idf = max(math.log(ratio), 0.0)
        tg[term] = {
            "first": first,
            "last": g["max_doc_id"].to_numpy(np.int64),
            "ub": ratio * tf_part * idf,
            "deltas": g["doc_id_deltas"].tolist(),
            "tfs": g["tfs"].tolist(),
            "dls": g["doc_lens"].tolist(),
            "nd": g["n_docs"].to_numpy(np.int64),
            "cache": {},
        }
        total_blocks += len(first)
    if not tg:
        return pd.DataFrame({"qid": [], "doc_id": [], "score": []})

    def decode_into_cache(d: dict, jj: int):
        c = d["cache"]
        if jj not in c:
            nd = int(d["nd"][jj])
            c[jj] = (
                delta_decode(
                    decode_payload(bytes(d["deltas"][jj]), nd, codec)
                ).astype(np.int64),
                decode_payload(bytes(d["tfs"][jj]), nd, codec).astype(np.float64),
                decode_payload(bytes(d["dls"][jj]), nd, codec).astype(np.float64),
            )
        return c[jj]

    # selective ("driving") terms — few blocks relative to the head terms —
    # are decoded EAGERLY: a sparse block can span a huge doc-id range, and
    # its span-wide block-max would otherwise keep every underlying head-term
    # block alive.  With exact postings in hand, such a term contributes to a
    # segment's bound only where it actually has a posting.
    cheap_cap = max(4, total_blocks // 16)
    cheap = {t for t, d in tg.items() if len(d["first"]) <= cheap_cap}
    if len(cheap) == len(tg):
        cheap = set()  # all-cheap degenerates to decode-all; skip the work

    # segment sweep: boundaries at block starts/ends.  Expensive terms add
    # their block-max over the block's whole span (difference array — a
    # term's blocks are disjoint); cheap terms add an exact per-segment max
    # of their per-doc contribution sums.
    bnds = np.unique(
        np.concatenate(
            [t["first"] for t in tg.values()] + [t["last"] + 1 for t in tg.values()]
        )
    )
    nseg = len(bnds) - 1
    diff = np.zeros(nseg + 1, dtype=np.float64)
    for term, t in tg.items():
        if term in cheap:
            continue
        np.add.at(diff, np.searchsorted(bnds, t["first"], "left"), t["ub"])
        np.add.at(diff, np.searchsorted(bnds, t["last"] + 1, "left"), -t["ub"])
    seg_ub = np.cumsum(diff[:nseg])
    if cheap:
        # exact per-doc sums across all cheap terms (union-aligned)
        cheap_parts = {}
        for term in cheap:
            d = tg[term]
            blks = [decode_into_cache(d, jj) for jj in range(len(d["first"]))]
            cheap_parts[term] = (
                np.concatenate([b[0] for b in blks]),
                np.concatenate([b[1] for b in blks]),
                np.concatenate([b[2] for b in blks]),
            )
        cu = np.unique(np.concatenate([v[0] for v in cheap_parts.values()]))
        csum = np.zeros(len(cu), dtype=np.float64)
        for term, (ids, tfs, dls) in cheap_parts.items():
            pos = np.searchsorted(cu, ids)
            contrib = S.bm25_term_contrib(tfs, df_by_term[term], dls, n, avgdl)
            np.add.at(csum, pos, contrib)
        seg_of_cheap = np.searchsorted(bnds, cu, "right") - 1
        np.maximum.at(seg_ub, seg_of_cheap, seg_ub[seg_of_cheap] + csum)
    # finalized quantized bound (log is monotone; same key as the ranking)
    seg_fin = np.floor(np.log(np.maximum(seg_ub, 1.0)) * _RANK_Q)
    remaining = np.argsort(-seg_ub, kind="stable")

    def term_batch_slice(t: str, d: dict, batch_segs: np.ndarray):
        """Term t's postings falling in any batch segment (vectorized)."""
        starts = bnds[batch_segs]
        j = np.searchsorted(d["first"], starts, "right") - 1
        ok = (j >= 0) & (d["last"][np.maximum(j, 0)] >= starts)
        need = np.unique(j[ok])
        if not len(need):
            return None
        parts = [decode_into_cache(d, int(jj)) for jj in need]
        ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        # keep postings whose segment is in the batch (batch_segs sorted)
        seg_of = np.searchsorted(bnds, ids, "right") - 1
        pos = np.searchsorted(batch_segs, seg_of)
        pos = np.minimum(pos, len(batch_segs) - 1)
        mask = batch_segs[pos] == seg_of
        return ids[mask], tfs[mask], dls[mask]

    theta_q = -np.inf
    kept_ids: list[np.ndarray] = []
    kept_scores: list[np.ndarray] = []
    kept_n = 0
    batch_sz = init_batch
    while len(remaining):
        # drop every segment that can no longer reach the top-k (ties kept)
        if theta_q > -np.inf:
            remaining = remaining[seg_fin[remaining] >= theta_q]
            if not len(remaining):
                break
        batch = np.sort(remaining[:batch_sz])
        remaining = remaining[batch_sz:]
        per_term = {}
        for t, d in tg.items():
            sl = term_batch_slice(t, d, batch)
            if sl is not None and len(sl[0]):
                per_term[t] = sl
        if per_term:
            u = np.unique(np.concatenate([v[0] for v in per_term.values()]))
            dl = np.zeros(len(u), dtype=np.float64)
            tf_by = {}
            for t, (ids, tfs, dls) in per_term.items():
                pos = np.searchsorted(u, ids)
                v = np.zeros(len(u), dtype=np.float64)
                v[pos] = tfs
                tf_by[t] = v
                dl[pos] = dls
            sc = S.score_terms("bm25", terms, tf_by, dl, n, avgdl)
            kept_ids.append(u)
            kept_scores.append(sc)
            kept_n += len(u)
            if kept_n >= k:
                flat = np.concatenate(kept_scores)
                qk = np.floor(flat * _RANK_Q)
                theta_q = np.partition(qk, len(qk) - k)[len(qk) - k]
        batch_sz = min(batch_sz * 2, 8192)

    if not kept_ids:
        return pd.DataFrame({"qid": [], "doc_id": [], "score": []})
    ids_out = np.concatenate(kept_ids)
    scores_out = np.concatenate(kept_scores)
    qkeys = np.floor(scores_out * _RANK_Q).astype(np.int64)
    order = np.lexsort((ids_out, -qkeys))[:k]
    return pd.DataFrame(
        {"qid": qid, "doc_id": ids_out[order], "score": scores_out[order]}
    )


class DecodedTermCache:
    """Hot-term decoded-postings cache for the serving coordinator (the
    standard production-engine lever: Zipf query streams repeat head terms,
    whose decode dominates point-query latency).  Holds FULLY-decoded
    (ids, tfs, dls) per term, bounded by total postings; LRU eviction
    (get() refreshes recency).
    Correctness-neutral: cached arrays are exactly what decode produces,
    and the cache lives inside one IndexReader (one index snapshot)."""

    def __init__(self, max_postings: int = 10_000_000):
        from collections import OrderedDict

        self.max_postings = max_postings
        self._d: "OrderedDict[str, tuple]" = OrderedDict()
        self._total = 0
        self.hits = 0
        self.misses = 0

    def get(self, term: str):
        hit = self._d.get(term)
        if hit is None:
            self.misses += 1
        else:
            self.hits += 1
            self._d.move_to_end(term)
        return hit

    def put(self, term: str, arrays: tuple) -> None:
        if term in self._d:
            return
        size = len(arrays[0])
        if size > self.max_postings:
            return
        while self._total + size > self.max_postings and self._d:
            _, old = self._d.popitem(last=False)
            self._total -= len(old[0])
        self._d[term] = arrays
        self._total += size


def _score_group_dense(
    pdf: pd.DataFrame,
    q_terms: dict[str, list[dict]],
    n: float,
    avgdl: float,
    k: int,
    codec: str,
    id_space: int,
    cache: DecodedTermCache | None = None,
) -> pd.DataFrame:
    """Dense-accumulator bm25 scorer for the serving coordinator — the fast
    path when the doc-id space fits a flat array (engine doc_ids are dense
    ints by construction).

    Three levers over the union-based _score_group:
    - accumulate score[doc_id] += contrib per term (one fancy-index add over
      the term's postings) — no np.unique / searchsorted / per-term scatter
      over the candidate union, which dominated head-term latency;
    - terms whose idf clamps to 0 (df > ~N/2 under the reference's
      max(log(max((N-df+.5)/(df+.5),1)),0) quirk — i.e. exactly the Zipf
      head) contribute 0 to EVERY doc, so only their doc-id stream is
      decoded (candidacy) and tf/doc_len streams are skipped entirely;
    - MaxScore block skipping for positive-idf head terms: selective terms
      (large per-term bound, from block metadata only) are decoded first;
      once the remaining terms' summed bounds quantize strictly below the
      running k-th best partial, those terms decode only the blocks whose
      doc-id range contains a candidate.  Exact, including doc_id
      tie-breaks: the comparison runs one quantum below the ranking key,
      and a final re-accumulation in term_idx order (the same per-doc
      left-to-right fold as ordered_sum/the oracle) keeps candidate scores
      bit-identical to the unpruned paths.
    """
    qid = str(pdf["qid"].iat[0])
    terms = sorted(q_terms[qid], key=lambda t: t["term_idx"])
    groups = {term: g for term, g in pdf.groupby("term", sort=False)}

    def decode(g) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        ids, tfs, dls = decode_blocks_concat(
            [bytes(x) for x in g["doc_id_deltas"]],
            [bytes(x) for x in g["tfs"]],
            [bytes(x) for x in g["doc_lens"]],
            g["n_docs"].tolist(),
            codec=codec,
        )
        return ids.astype(np.int64), tfs, dls

    # plan: per-term global contribution bound from block metadata (no
    # decode); zero-idf terms keep the lazy candidacy-only treatment below
    scored_terms = []
    deferred = []  # zero-idf term groups: candidacy-only, decoded lazily
    for t in terms:
        g = groups.get(t["term"])
        if g is None:
            continue
        df = float(t["df"])
        ratio = max((n - df + 0.5) / (df + 0.5), 1.0)
        idf = max(math.log(ratio), 0.0)
        if idf == 0.0:
            deferred.append(g)
            continue
        bound = float(
            np.max(
                S.bm25_term_bound(
                    g["max_tf"].to_numpy(np.float64),
                    g["min_doc_len"].to_numpy(np.float64),
                    df, n, avgdl,
                )
            )
        )
        scored_terms.append({"t": t, "g": g, "df": df, "bound": bound})

    def qf(x: float) -> int:  # the engine-wide quantized ranking key
        return math.floor(math.log(max(x, 1.0)) * _RANK_Q)

    by_bound = sorted(scored_terms, key=lambda d: -d["bound"])
    score_sel = np.zeros(id_space, dtype=np.float64)
    seen = np.zeros(id_space, dtype=bool)
    decoded: dict[str, tuple] = {}

    if len(by_bound) == 1:
        # SINGLE scored term (the 2M-doc tail driver: one mid-idf head term
        # whose full posting list was decoded for a top-20): decode its
        # blocks in descending block-bound order and STOP once the next
        # block's bound quantizes strictly below the running k-th best
        # exact score — a doc in an undecoded block scores <= bound, so
        # qf(score) <= qf(bound) < qf(kth) excludes it even on a doc_id
        # tie.  Exact: single-term scores are complete per decoded doc.
        d = by_bound[0]
        g = d["g"]
        hit = cache.get(d["t"]["term"]) if cache is not None else None
        cache_hit = hit is not None
        if hit is not None:
            ids, tfs, dls = hit
            seen[ids] = True
            score_sel[ids] += S.bm25_term_contrib(
                tfs.astype(np.float64), d["df"], dls.astype(np.float64),
                n, avgdl,
            )
            pos = 0  # nothing decoded: the cached arrays supplied everything
        else:
            bounds = S.bm25_term_bound(
                g["max_tf"].to_numpy(np.float64),
                g["min_doc_len"].to_numpy(np.float64),
                d["df"], n, avgdl,
            )
            order = np.argsort(-bounds, kind="stable")
            pos, batch = 0, 64
            parts = []
            while pos < len(order):
                take = order[pos:pos + batch]
                ids, tfs, dls = decode(g.iloc[take])
                parts.append((ids, tfs, dls))
                seen[ids] = True
                score_sel[ids] += S.bm25_term_contrib(
                    tfs.astype(np.float64), d["df"], dls.astype(np.float64),
                    n, avgdl,
                )
                pos += len(take)
                batch *= 2  # geometric growth bounds the re-check cost
                if pos >= len(order):
                    break
                cand_sel = score_sel[seen]
                if len(cand_sel) >= k:
                    kth = float(
                        np.partition(cand_sel, len(cand_sel) - k)[
                            len(cand_sel) - k
                        ]
                    )
                    if qf(float(bounds[order[pos]])) < qf(kth):
                        break
            if cache is not None and pos >= len(order):
                cache.put(d["t"]["term"], tuple(
                    np.concatenate([p[i] for p in parts]) for i in range(3)
                ))
        score = score_sel
        _LAST_DENSE_STATS.clear()
        _LAST_DENSE_STATS.update(
            qid=qid, n_scored_terms=1, n_essential=1,
            blocks_total=len(g), blocks_decoded=pos, cache_hit=cache_hit,
        )
        return _dense_topk(qid, score, seen, deferred, k, codec)

    # SELECTION (MaxScore at block-metadata granularity — the mid-idf
    # head-term lever): decode terms in descending bound order; once the
    # summed bounds of the remaining terms quantize strictly below the
    # current k-th best partial (one extra quantum of margin swallows the
    # reordered-summation ulps of this phase), a doc with no hit in the
    # decoded "essential" terms can never enter the top-k — even on a
    # doc_id tie — so the remaining (head) terms only need blocks whose
    # doc-id range contains an already-seen candidate.
    n_ess = 0
    for d in by_bound:
        if n_ess > 0:
            # rest_bound is recomputed EXACTLY each iteration (at most |q|
            # adds) rather than decremented from the initial total, so
            # catastrophic cancellation between a huge decoded bound and
            # small remaining ones can never leave it under-estimated
            # beyond the one spare quantum reserved below
            rest_bound = sum(x["bound"] for x in by_bound[n_ess:])
            cand_sel = score_sel[seen]
            if len(cand_sel) >= k:
                theta = float(
                    np.partition(cand_sel, len(cand_sel) - k)[len(cand_sel) - k]
                )
                if qf(rest_bound) < qf(theta) - 1:
                    break
        term = d["t"]["term"]
        hit = cache.get(term) if cache is not None else None
        if hit is None:
            hit = decode(d["g"])
            if cache is not None:
                cache.put(term, hit)
        ids, tfs, dls = hit
        decoded[term] = hit
        seen[ids] = True
        score_sel[ids] += S.bm25_term_contrib(
            tfs.astype(np.float64), d["df"], dls.astype(np.float64), n, avgdl
        )
        n_ess += 1

    # FILL-IN: skipped terms still contribute to candidates' exact scores —
    # decode only their blocks whose [first_doc_id, max_doc_id] range holds
    # a candidate (head-term blocks are doc-dense, candidates sparse, so
    # most blocks drop)
    blocks_decoded = sum(len(d["g"]) for d in by_bound[:n_ess])
    if n_ess < len(by_bound):
        # CANDIDATE FILTER (exact MaxScore step 2): a candidate whose upper
        # bound — its exact partial over the essential terms plus the summed
        # bounds of every undecoded term — quantizes strictly below the
        # running k-th best partial (one spare quantum for the reordered-
        # sum ulps, the same margin as the selection break) can never enter
        # the top-k, even on a doc_id tie: there are >= k candidates whose
        # EXACT scores are >= their partials = theta > the dropped one's
        # ceiling.  Dropping them up front narrows the doc-id ranges the
        # fill-in must decode, which is where multi-term queries spend
        # their decode budget.  Contributions only grow (bm25 terms are
        # non-negative), so partials are valid lower bounds.
        rest_total = sum(x["bound"] for x in by_bound[n_ess:])
        cand_idx = np.flatnonzero(seen)
        if len(cand_idx) >= k:
            partials = score_sel[cand_idx]
            theta = float(
                np.partition(partials, len(partials) - k)[len(partials) - k]
            )
            ub_q = np.floor(
                np.log(np.maximum(partials + rest_total, 1.0)) * _RANK_Q
            )
            drop = ub_q < qf(theta) - 1
            if drop.any():
                seen[cand_idx[drop]] = False
        cum = np.zeros(id_space + 1, dtype=np.int64)
        np.cumsum(seen, out=cum[1:])
        for d in by_bound[n_ess:]:
            term = d["t"]["term"]
            hit = cache.get(term) if cache is not None else None
            if hit is not None:
                # full cached arrays supersede the partial decode: extra
                # (non-candidate) contributions only touch docs that the
                # bound argument already excludes from the top-k
                decoded[term] = hit
                continue
            g = d["g"]
            lo = g["first_doc_id"].to_numpy(np.int64)
            hi = g["max_doc_id"].to_numpy(np.int64)
            keep = (cum[hi + 1] - cum[lo]) > 0
            if cache is not None and cache.max_postings > 0 and keep.mean() > 0.5:
                # candidates blanket most of this term's block ranges (the
                # common mid-df case): a full decode costs barely more than
                # the partial one and makes the term cacheable, so repeat
                # queries skip the decode entirely
                full = decode(g)
                cache.put(term, full)
                decoded[term] = full
                blocks_decoded += len(g)
            elif keep.any():
                decoded[term] = decode(g[keep])
                blocks_decoded += int(keep.sum())
    _LAST_DENSE_STATS.clear()
    _LAST_DENSE_STATS.update(
        qid=qid, n_scored_terms=len(by_bound), n_essential=n_ess,
        blocks_total=sum(len(d["g"]) for d in by_bound),
        blocks_decoded=blocks_decoded,
    )

    # EXACT accumulation in term_idx order over the decoded blocks — the
    # same per-doc left-to-right fold as ordered_sum/the oracle (a doc
    # appears in at most one block per term), so candidate scores are
    # bit-identical to the unpruned paths
    score = np.zeros(id_space, dtype=np.float64)
    for t in terms:
        dec = decoded.get(t["term"])
        if dec is None:
            continue
        ids, tfs, dls = dec
        score[ids] += S.bm25_term_contrib(
            tfs.astype(np.float64), float(t["df"]), dls.astype(np.float64),
            n, avgdl,
        )
    return _dense_topk(qid, score, seen, deferred, k, codec)


def _dense_topk(
    qid: str,
    score: np.ndarray,
    seen: np.ndarray,
    deferred: list,
    k: int,
    codec: str,
) -> pd.DataFrame:
    """Shared dense-scorer tail: zero-idf candidacy fill, bm25 finalize,
    quantized-key pre-selection, top-k."""
    cand = np.flatnonzero(seen)
    # a zero-idf term's docs all score exactly 0: they can only reach the
    # top-k when fewer than k positive-quantized scores exist, so their
    # (large, Zipf-head) doc-id streams are decoded only in that rare case
    if deferred:
        need_zero = len(cand) < k
        if not need_zero:
            kth_raw = np.partition(score[cand], len(cand) - k)[len(cand) - k]
            need_zero = math.floor(math.log(max(kth_raw, 1.0)) * _RANK_Q) <= 0
        if need_zero:
            for g in deferred:
                ids = decode_ids_concat(
                    [bytes(x) for x in g["doc_id_deltas"]], g["n_docs"].tolist(),
                    codec,
                ).astype(np.int64)
                seen[ids] = True
            cand = np.flatnonzero(seen)
    if not len(cand):
        return pd.DataFrame({"qid": [], "doc_id": [], "score": []})
    sc = np.log(np.maximum(score[cand], 1.0))  # bm25 finalize
    qkeys = np.floor(sc * _RANK_Q).astype(np.int64)
    if len(cand) > max(4096, 4 * k):
        # full lexsort of millions of candidates for a top-20 is the tail
        # cost at 2M+ docs: pre-select everything >= the k-th quantized key
        # (ties INCLUDED, so doc_id ordering among equals is preserved)
        kth = np.partition(qkeys, len(qkeys) - k)[len(qkeys) - k]
        keep = qkeys >= kth
        cand, sc, qkeys = cand[keep], sc[keep], qkeys[keep]
    order = np.lexsort((cand, -qkeys))[:k]
    return pd.DataFrame({"qid": qid, "doc_id": cand[order], "score": sc[order]})


_LAST_BOOL_STATS: dict = {}


def _score_group_bool(
    pdf: pd.DataFrame,
    q_terms: dict[str, list[dict]],
    n: float,
    avgdl: float,
    model: str,
    k: int,
    codec: str,
    excl_terms: dict[str, set[str]] | None = None,
    cache: "DecodedTermCache | None" = None,
    return_all: bool = False,
    cand_init: np.ndarray | None = None,
) -> pd.DataFrame:
    """Conjunctive (AND / AND-NOT) retrieval over one (qid[, salt]) group:
    only docs containing EVERY query term and NONE of the excluded terms
    are scored (same model kernels and quantized rank key as the OR path,
    so AND of a single term is rank-identical to OR).

    Block-skip intersection: terms are processed df-ascending — the rarest
    term is decoded in full and every later term decodes ONLY the blocks
    whose [first_doc_id, max_doc_id] range still contains a surviving
    candidate (binary search on the sorted candidate ids).  On a Zipf web
    corpus the rare term bounds the candidate set at once, so the head
    terms' (huge) posting lists are mostly skipped — the classic
    smallest-list-first conjunctive plan, done at block granularity with
    the metadata the index already carries.  Works under both block
    layouts (ids are re-sorted after decode, so impact-ordered blocks are
    fine).  Skip counters land in _LAST_BOOL_STATS.

    return_all=True yields every matching doc (no top-k cut) — the phrase
    path filters by adjacency before cutting.

    cand_init: optional sorted unique doc-id restriction (e.g. a nextword
    store's exact-adjacency postings).  Scores are per-doc, so restricting
    the candidate set is value-identical to filtering the unrestricted
    result afterwards — and every term's decode is block-pruned to the
    restriction from the start."""
    qid = pdf["qid"].iat[0]
    excl = (excl_terms or {}).get(qid, set())
    terms = [t for t in q_terms[qid] if t["term"] not in excl]
    if not terms:
        return pd.DataFrame({"qid": [], "doc_id": [], "score": []})
    groups = {t: g for t, g in pdf.groupby("term", sort=False)}
    blocks_total = int(sum(len(g) for g in groups.values()))
    blocks_decoded = 0

    # a required term with no postings -> AND can match nothing
    if any(t["term"] not in groups for t in terms):
        _LAST_BOOL_STATS.clear()
        _LAST_BOOL_STATS.update(
            {"bool_blocks_total": blocks_total, "bool_blocks_decoded": 0,
             "bool_candidates": 0}
        )
        return pd.DataFrame({"qid": [], "doc_id": [], "score": []})

    def decode_rows(g: pd.DataFrame):
        ids, tfs, dls = decode_blocks_concat(
            [bytes(x) for x in g["doc_id_deltas"]],
            [bytes(x) for x in g["tfs"]],
            [bytes(x) for x in g["doc_lens"]],
            g["n_docs"].tolist(),
            codec=codec,
        )
        ids = ids.astype(np.int64)
        order = np.argsort(ids, kind="stable")
        return ids[order], tfs[order].astype(np.float64), dls[order].astype(
            np.float64
        )

    def decode_term(term: str, g: pd.DataFrame, cand: np.ndarray | None):
        """Full decode via cache when available, else block-pruned decode."""
        nonlocal blocks_decoded
        hit = cache.get(term) if cache is not None else None
        if hit is not None:
            ids, tfs, dls = hit
            ids = ids.astype(np.int64)
            order = np.argsort(ids, kind="stable")
            return ids[order], tfs[order].astype(np.float64), dls[
                order
            ].astype(np.float64)
        if cand is not None:
            first = g["first_doc_id"].to_numpy(np.int64)
            last = g["max_doc_id"].to_numpy(np.int64)
            lo = np.searchsorted(cand, first, side="left")
            hi = np.searchsorted(cand, last, side="right")
            g = g[lo < hi]
        blocks_decoded += len(g)
        if not len(g):
            return (np.empty(0, np.int64), np.empty(0), np.empty(0))
        return decode_rows(g)

    ordered = sorted(terms, key=lambda t: (float(t["df"]), t["term"]))
    decoded: dict[str, tuple] = {}
    cand: np.ndarray | None = (
        None if cand_init is None else np.asarray(cand_init, dtype=np.int64)
    )
    for t in ordered:
        term = t["term"]
        ids, tfs, dls = decode_term(term, groups[term], cand)
        decoded[term] = (ids, tfs, dls)
        cand = ids if cand is None else cand[
            np.isin(cand, ids, assume_unique=True)
        ]
        if not len(cand):
            break
    if cand is not None and len(cand):
        for xt in sorted(excl):
            g = groups.get(xt)
            if g is None:
                continue
            x_ids, _, _ = decode_term(xt, g, cand)
            cand = cand[~np.isin(cand, x_ids, assume_unique=True)]
            if not len(cand):
                break
    _LAST_BOOL_STATS.clear()
    _LAST_BOOL_STATS.update(
        {"bool_blocks_total": blocks_total,
         "bool_blocks_decoded": blocks_decoded,
         "bool_candidates": int(len(cand) if cand is not None else 0)}
    )
    if cand is None or not len(cand):
        return pd.DataFrame({"qid": [], "doc_id": [], "score": []})

    tf_by_term: dict[str, np.ndarray] = {}
    dl = None
    for term, (ids, tfs, dls) in decoded.items():
        pos = np.searchsorted(ids, cand)
        tf_by_term[term] = tfs[pos]
        if dl is None:
            dl = dls[pos]
    scores = S.score_terms(model, terms, tf_by_term, dl, n, avgdl)
    qkeys = np.floor(scores * _RANK_Q).astype(np.int64)
    order = np.lexsort((cand, -qkeys))
    if not return_all:
        order = order[:k]
    return pd.DataFrame(
        {"qid": qid, "doc_id": cand[order], "score": scores[order]}
    )


def _query_term_dicts(queries: list[tuple[str, str]]):
    """[(qid, text)] -> ({qid: [term dicts]}, all_terms set) — shared by the
    distributed and serving paths."""
    from ..oracle.tokenizer import tokenize_query

    q_terms: dict[str, list[dict]] = {}
    all_terms: set[str] = set()
    for qid, qtext in queries:
        seen: dict[str, dict] = {}
        for pos, t in enumerate(tokenize_query(qtext)):
            if t in seen:
                seen[t]["q_tf"] += 1
            else:
                seen[t] = {"term": t, "term_idx": pos, "q_tf": 1}
        q_terms[str(qid)] = list(seen.values())
        all_terms.update(seen)
    return q_terms, all_terms


def _delete1_py(t: str) -> list[str]:
    """The term itself + every single-char deletion (SymSpell key set) —
    mirrors operators/spell.delete1_keys."""
    return [t] + [t[:i] + t[i + 1:] for i in range(len(t))]


def _build_spell_index(df_dict: dict[str, float]) -> dict[str, list[str]]:
    idx: dict[str, list[str]] = {}
    for t in df_dict:
        for dk in _delete1_py(t):
            idx.setdefault(dk, []).append(t)
    return idx


def _suggest_from_dict(
    terms: list[str],
    df_dict: dict[str, float],
    spell_index: dict[str, list[str]],
    min_len: int,
) -> dict[str, tuple[str, int, float]]:
    """Shared suggest core: the exact operators/spell.spell_correct spec
    over a driver-side (term -> df) dict."""
    out: dict[str, tuple[str, int, float]] = {}
    for t in dict.fromkeys(terms):
        if len(t) < min_len:
            continue
        cands: set[str] = set()
        for dk in _delete1_py(t):
            cands.update(spell_index.get(dk, ()))
        best = None
        for c in cands:
            ed = _lev_le1(t, c)
            if ed is None:
                continue
            key = (ed, -df_dict[c], c)
            if best is None or key < best[0]:
                best = (key, c, ed)
        if best is not None:
            out[t] = (best[1], best[2], df_dict[best[1]])
    return out


def _lev_le1(a: str, b: str) -> int | None:
    """0 if equal, 1 if levenshtein(a, b) == 1, else None (cheap exact
    check — candidates come pre-screened by delete-key intersection)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return None
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return None
                seen = True
        return 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else None


class IndexReader:
    """Reads a committed index (build.build_index layout)."""

    # term_stats tables up to this row count are collected once into a
    # driver-side dict (a few MB); larger vocabularies fall back to a
    # filtered scan per search.
    _TERM_STATS_CACHE_MAX = 2_000_000

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "field_stats.json")) as f:
            self.field_stats = json.load(f)
        self.n_buckets = int(self.field_stats["n_buckets"])
        self.codec = self.field_stats.get("codec", "varint")
        # "impact" layouts have overlapping per-block doc-id ranges, which
        # invalidates the decode-level WAND's disjointness assumption — the
        # reader gates that path on the recorded layout
        self.block_order = self.field_stats.get("block_order", "docid")
        # the doc tokenizer the index was built with (phrase verification
        # must tokenize identically); older indexes predate the key
        self.tokenizer = self.field_stats.get("tokenizer", "spec")
        # build the scan DataFrames once (schema discovery is not free)
        self._postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self._term_stats = spark.read.parquet(os.path.join(index_dir, "term_stats"))
        self._df_cache: dict[str, float] | None = None
        self._df_cache_checked = False
        # serving hot-term cache (decoded postings; one index snapshot per
        # reader, so no invalidation concern).  Budget scales with the
        # corpus: a fixed 10M-posting cap starves large indexes (at 2M docs
        # one head term is ~800k postings, so 10M held ~12 terms); 12
        # postings/doc ≈ the head-term working set of a Zipf query stream,
        # ~576 MB of arrays at 2M docs — coordinator-sized.  Override by
        # replacing the cache (reader.decode_cache = DecodedTermCache(n)).
        self.decode_cache = DecodedTermCache(
            max_postings=max(10_000_000,
                             12 * int(self.field_stats.get("n_docs", 0)))
        )
        # lazy delete-key index for suggest(); built once per reader
        self._spell_index: dict[str, list[str]] | None = None
        # lazy facet sidecar reader (facet_counts_local)
        self._facet_store = None
        # lazy nextword (head-head bigram) store reader, None if absent
        self._nextword = False  # False = not yet probed

    def _nextword_store(self):
        if self._nextword is False:
            from .nextword import NextwordStore

            meta = os.path.join(self.index_dir, "nextword", "_nextword.json")
            self._nextword = (
                NextwordStore(self.index_dir) if os.path.exists(meta) else None
            )
        return self._nextword

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        buckets = sorted({term_bucket_py(t, self.n_buckets) for t in terms})
        return (
            self._postings
            .filter(F.col("bucket").isin(buckets))       # partition pruning
            .filter(F.col("term").isin(list(terms)))     # row-group pushdown
        )

    def term_stats_for(self, terms: list[str]) -> dict[str, float]:
        if self._df_cache is None and not self._df_cache_checked:
            # run the size check once per reader: oversized vocabularies must
            # not pay a full count() on every search
            self._df_cache_checked = True
            n = self._term_stats.count()
            if n <= self._TERM_STATS_CACHE_MAX:
                self._df_cache = {
                    r["term"]: float(r["df"]) for r in self._term_stats.collect()
                }
        if self._df_cache is not None:
            return {t: self._df_cache[t] for t in terms if t in self._df_cache}
        rows = self._term_stats.filter(F.col("term").isin(list(terms))).collect()
        return {r["term"]: float(r["df"]) for r in rows}

    # scoring-exchange sizing: the Python scorer pays a fixed per-task cost
    # (worker round-trip + Arrow serde), so the partition count follows the
    # candidate volume (sum of term dfs) instead of the session shuffle
    # width; capped at defaultParallelism = one wave of Python workers.
    _CAND_POSTINGS_PER_TASK = 15_000
    # merge="auto" routes to the driver scatter-gather merge when the
    # estimated fan-in (k * queries * salt ranges) is below this
    _DRIVER_MERGE_MAX_ROWS = 50_000

    def search(
        self,
        queries: list[tuple[str, str]] | DataFrame,
        k: int = 20,
        model: str = "bm25",
        prune: bool = True,
        merge: str = "auto",
        mode: str = "or",
        exclude: dict[str, list[str]] | None = None,
    ) -> DataFrame:
        """queries: [(qid, query_text)] or DataFrame(qid string, query string).
        Returns (qid, doc_id, score, rank) — TREC-shaped, rank-identical to
        the full-scan path/oracle.

        merge="spark": global top-k via window (the fully-distributed path —
        right when the per-query candidate fan-in is large).
        merge="driver": scatter-gather — each (query, doc-range) group's local
        top-k (<= k rows) is collected and merged on the driver with the same
        quantized ranking key; one Spark job instead of three stages, the
        standard low-latency coordinator shape.  Identical results (tested).
        merge="auto" (default): driver scatter-gather when the estimated
        fan-in (k * |queries| * salt ranges) is coordinator-sized
        (_DRIVER_MERGE_MAX_ROWS), else the spark window path.

        mode="and" / exclude: conjunctive (AND-NOT) retrieval.  Correct
        under the salted layout because the salt is a CONTIGUOUS DOC
        RANGE shared by every term — each (qid, salt) group sees all
        postings of its doc range, so per-group intersection composes to
        the global one with no extra shuffle.
        """
        if isinstance(queries, DataFrame):
            queries = [(r["qid"], r["query"]) for r in queries.collect()]
        excl_map = {str(q): set(ts) for q, ts in (exclude or {}).items()}
        if excl_map and mode != "and":
            raise ValueError("exclude requires mode='and'")
        # driver-side query-term table (queries are small by definition)
        q_terms, all_terms = _query_term_dicts(queries)
        if excl_map:
            all_terms = set(all_terms)
            for ts in excl_map.values():
                all_terms.update(ts)
        dfs = self.term_stats_for(sorted(all_terms))
        for terms in q_terms.values():
            for t in terms:
                t["df"] = dfs.get(t["term"], 0.0)

        n = float(self.field_stats["n_docs"])
        avgdl = float(self.field_stats["avg_doc_len"])

        qt_rows = [
            (qid, t["term"]) for qid, terms in q_terms.items() for t in terms
        ]
        qt_rows += [
            (qid, xt)
            for qid, xts in excl_map.items()
            for xt in sorted(xts)
            if xt not in {t["term"] for t in q_terms.get(qid, [])}
        ]
        if not qt_rows:
            return self.spark.createDataFrame(
                [], "qid string, doc_id long, score double, rank int"
            )
        postings = self.postings_for_terms(sorted(all_terms))
        if len(q_terms) == 1:
            # single query: every pruned posting row belongs to the one qid,
            # so a literal column replaces the broadcast join (drops the
            # BroadcastExchange and the driver->JVM row conversion)
            joined = postings.withColumn("qid", F.lit(next(iter(q_terms))))
        else:
            qt_df = self.spark.createDataFrame(
                qt_rows, "qid string, term string"
            )
            joined = postings.join(F.broadcast(qt_df), "term")
        # Explicitly size the scoring exchange from the per-(qid, term)
        # candidate volume.  Left to the session default, AQE coalesces the
        # tiny point-query exchange to ONE partition and the Python scorer
        # runs serially (measured: 1.11s -> 0.42s per query at 100k docs).
        work = sum(dfs.get(t, 0.0) for _, t in qt_rows)
        parts = max(
            1,
            min(
                -(-int(work) // self._CAND_POSTINGS_PER_TASK),
                self.spark.sparkContext.defaultParallelism,
            ),
        )
        joined = joined.repartition(parts, "qid", "salt")

        codec = self.codec

        def apply_fn(pdf):
            if mode == "and":
                return _score_group_bool(
                    pdf, q_terms, n, avgdl, model, k, codec,
                    excl_terms=excl_map,
                )
            return _score_group(pdf, q_terms, n, avgdl, model, k, prune, codec)

        local = joined.groupBy("qid", "salt").applyInPandas(
            apply_fn, "qid string, doc_id long, score double"
        )
        if merge == "auto":
            n_salts = -(-int(n) // int(
                self.field_stats.get("salt_range", 1 << 20)
            )) or 1
            est_rows = k * len(q_terms) * n_salts
            merge = (
                "driver" if est_rows <= self._DRIVER_MERGE_MAX_ROWS
                else "spark"
            )
        if merge == "spark":
            return topk_per_query(
                local, k=k, single_partition_sort=(k * len(q_terms) <= 100_000)
            )
        if merge == "local":
            raise ValueError("use search_local() for the serving path")
        # driver-side scatter-gather merge (rows collected: <= k * n_ranges)
        import math as _math

        rows = local.collect()
        by_q: dict[str, list] = {}
        for r in rows:
            by_q.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
        out = []
        for qid in sorted(by_q, key=lambda q: int(q) if q.isdigit() else 0):
            cand = sorted(
                by_q[qid],
                key=lambda ds: (-_math.floor(ds[1] * 1e9), ds[0]),
            )[:k]
            out.extend(
                (qid, doc_id, float(score), rank + 1)
                for rank, (doc_id, score) in enumerate(cand)
            )
        return self._rows_df(out)

    def _rows_df(self, rows: list[tuple]) -> DataFrame:
        """TREC-shaped rows -> DataFrame as a SINGLE-slice RDD: the default
        createDataFrame parallelizes tiny result sets over
        defaultParallelism empty slices, so every downstream collect()
        schedules ~32 no-op tasks (measured 0.27s per point query)."""
        schema = "qid string, doc_id long, score double, rank int"
        if not rows:
            return self.spark.createDataFrame([], schema)
        rdd = self.spark.sparkContext.parallelize(rows, 1)
        return self.spark.createDataFrame(rdd, schema)

    # ------------------------------------------------------------------
    # serving path: no Spark job per query

    # if the queries' pruned slice exceeds this many postings, search_auto
    # routes to the distributed path instead of the coordinator
    _LOCAL_MAX_POSTINGS = 20_000_000
    # dense-accumulator scorer ceiling: one float64 + one bool per doc id
    # (~9 bytes/doc -> ~450 MB at the cap, coordinator-sized)
    _DENSE_MAX_DOCS = 50_000_000

    def search_auto(
        self, queries: list[tuple[str, str]], k: int = 20,
        model: str = "bm25", prune: bool = True,
    ):
        """Route point queries to the serving path when the |q|-term slice is
        coordinator-sized (sum of df from term_stats), else run distributed.
        Returns a DataFrame either way."""
        q_terms, all_terms = _query_term_dicts(queries)
        dfs = self.term_stats_for(sorted(all_terms))
        slice_postings = sum(dfs.values())
        if slice_postings <= self._LOCAL_MAX_POSTINGS:
            rows = self.search_local(queries, k=k, model=model, prune=prune)
            return self._rows_df(rows)
        return self.search(queries, k=k, model=model, prune=prune)

    def _local_dataset(self):
        if not hasattr(self, "_pa_dataset"):
            import pyarrow.dataset as ds

            self._pa_dataset = ds.dataset(
                os.path.join(self.index_dir, "postings"), partitioning="hive"
            )
        return self._pa_dataset

    def prewarm(self, n_terms: int = 256) -> dict:
        """Serving cold-start prewarm: populate the driver-side term_stats
        dict, open the pyarrow dataset, and pre-decode the highest-df
        POSITIVE-idf terms into the DecodedTermCache (zero-idf Zipf-head
        terms contribute 0 to every score and are decoded lazily by the
        scorer only in the rare under-k case, so caching them would spend
        the postings budget on dead weight).  Fill stops at the cache's
        postings budget — prewarm never evicts what it just decoded.
        Returns {terms_warmed, postings_cached, sec} for observability.
        Cost is one sequential pruned read of the head row groups —
        amortizing exactly the ~seconds of first-touch latency a cold
        coordinator otherwise pays on its first head-term queries."""
        import pyarrow.dataset as ds

        t0 = time.time()
        n = float(self.field_stats["n_docs"])
        self.term_stats_for([])  # populate / size-check the df dict once
        if self._df_cache is not None:
            items = self._df_cache.items()
        else:  # oversized vocab: fetch just the df head via Spark
            items = [
                (r["term"], float(r["df"]))
                for r in self._term_stats.orderBy(F.col("df").desc())
                .limit(4 * n_terms).collect()
            ]
        pos = [
            (t, df) for t, df in items
            if max((n - df + 0.5) / (df + 0.5), 1.0) > 1.0
        ]
        pos.sort(key=lambda kv: (-kv[1], kv[0]))
        budget = self.decode_cache.max_postings
        picked: list[str] = []
        total = 0
        for t, df in pos[: 4 * n_terms]:
            if len(picked) >= n_terms:
                break
            if total + int(df) > budget:
                continue
            picked.append(t)
            total += int(df)
        if not picked:
            return {"terms_warmed": 0, "postings_cached": 0,
                    "sec": round(time.time() - t0, 3)}
        buckets = sorted({term_bucket_py(t, self.n_buckets) for t in picked})
        filt = ds.field("bucket").isin(buckets) & ds.field("term").isin(
            sorted(picked)
        )
        pdf = self._local_dataset().to_table(
            filter=filt,
            columns=["term", "n_docs", "doc_id_deltas", "tfs", "doc_lens"],
        ).to_pandas()
        warmed = cached = 0
        for term, g in pdf.groupby("term", sort=False):
            if self.decode_cache.get(term) is not None:
                continue
            ids, tfs, dls = decode_blocks_concat(
                [bytes(x) for x in g["doc_id_deltas"]],
                [bytes(x) for x in g["tfs"]],
                [bytes(x) for x in g["doc_lens"]],
                g["n_docs"].tolist(),
                codec=self.codec,
            )
            self.decode_cache.put(term, (ids.astype(np.int64), tfs, dls))
            warmed += 1
            cached += len(ids)
        return {"terms_warmed": warmed, "postings_cached": cached,
                "sec": round(time.time() - t0, 3)}

    def facet_counts_local(
        self, queries: list[tuple[str, str]], facet: str, mode: str = "or"
    ) -> list[tuple[str, str, int]]:
        """Serving-side facets (ES-aggs shape): for each query, count how
        the match set distributes over a categorical document attribute
        from the facet sidecar (index/facetstore.write_facet_store).

        mode="or" (default): docs containing ANY query term — the same OR
        match set operators/facets.facet_counts aggregates.
        mode="and": drill-down facets — docs containing EVERY query term
        (per-term id-stream decode, sorted-array intersection); a query
        with any out-of-vocabulary term has an empty AND set.

        Cost per query: the pruned columnar read + id-only decode of the
        |q| terms' doc-id streams (tf/doc_len never decoded — same lever
        as the zero-idf candidacy path) and one np.bincount over the dense
        code array; independent of corpus size given the match set.
        Returns [(qid, facet_value, n_docs)], zero-count values omitted.
        """
        import pyarrow.dataset as ds

        from .facetstore import FacetStore

        if mode not in ("or", "and"):
            raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
        if self._facet_store is None:
            self._facet_store = FacetStore(self.index_dir)
        q_terms, all_terms = _query_term_dicts(queries)
        buckets = sorted({term_bucket_py(t, self.n_buckets) for t in all_terms})
        filt = ds.field("bucket").isin(buckets) & ds.field("term").isin(
            sorted(all_terms)
        )
        tbl = self._local_dataset().to_table(
            filter=filt, columns=["term", "n_docs", "doc_id_deltas"]
        )
        pdf = tbl.to_pandas()
        out: list[tuple[str, str, int]] = []
        for qid, _qtext in queries:
            qid = str(qid)
            terms = {t["term"] for t in q_terms[qid]}
            if not terms:
                continue
            if mode == "and":
                per_term = []
                for t in sorted(terms):
                    sub = pdf[pdf["term"] == t]
                    if not len(sub):
                        per_term = None  # OOV term -> empty conjunction
                        break
                    per_term.append(
                        decode_ids_concat(
                            [bytes(x) for x in sub["doc_id_deltas"]],
                            sub["n_docs"].tolist(),
                            self.codec,
                        ).astype(np.int64)
                    )
                if per_term is None:
                    continue
                ids = per_term[0]
                for arr in per_term[1:]:
                    # posting lists are unique-sorted per term by build
                    ids = np.intersect1d(ids, arr, assume_unique=True)
                if not len(ids):
                    continue
            else:
                sub = pdf[pdf["term"].isin(terms)]
                if not len(sub):
                    continue
                ids = np.unique(
                    decode_ids_concat(
                        [bytes(x) for x in sub["doc_id_deltas"]],
                        sub["n_docs"].tolist(),
                        self.codec,
                    ).astype(np.int64)
                )
            for value, cnt in self._facet_store.counts(facet, ids):
                out.append((qid, value, cnt))
        return out

    def last_query_stats(self) -> dict:
        """Serving introspection after a search_local call: the last dense
        scorer's skip statistics (blocks decoded vs total, MaxScore
        essential-term count, cache_hit) plus the decode cache's hit/miss
        counters and fill level.  For operators watching whether pruning
        and caching actually engage on their workload — the same numbers
        the bench and the skip-rate tests read.

        Both stat dicts are cleared at the start of each search_local call,
        so the numbers always describe the most recent local search only.
        The distributed search() path does NOT populate them — its scoring
        runs on executors, where these module globals are invisible to the
        driver."""
        return {
            **dict(_LAST_DENSE_STATS),
            **dict(_LAST_BOOL_STATS),
            "cache_hits": self.decode_cache.hits,
            "cache_misses": self.decode_cache.misses,
            "cache_postings": self.decode_cache._total,
            "cache_budget": self.decode_cache.max_postings,
            "cache_terms": len(self.decode_cache._d),
        }

    def suggest(
        self, terms: list[str], min_len: int = 3
    ) -> dict[str, tuple[str, int, float]]:
        """Serving-side spell correction: {input: (suggestion, ed, df)} —
        the SAME spec as operators/spell.spell_correct (edit distance <= 1
        candidates via symmetric deletes, ranked (ed asc, df desc, term
        asc); in-vocab inputs return themselves at ed 0).

        When the vocabulary fits the driver-side df cache (the common
        serving case), the delete-key index is built once per reader and
        lookups are dictionary probes — microseconds per query term.
        Oversized vocabularies fall back to the distributed operator over
        the term_stats table.
        """
        self.term_stats_for([])  # run the cache size-check once
        if self._df_cache is None:
            from ..operators.spell import spell_correct

            inp = self.spark.createDataFrame(
                [(t,) for t in terms], "input string"
            )
            rows = spell_correct(
                inp, self._term_stats.select("term", "df"), min_len=min_len
            ).collect()
            return {
                r["input"]: (r["suggestion"], r["ed"], float(r["sugg_df"]))
                for r in rows
            }
        if self._spell_index is None:
            self._spell_index = _build_spell_index(self._df_cache)
        return _suggest_from_dict(
            terms, self._df_cache, self._spell_index, min_len
        )

    def search_local(
        self,
        queries: list[tuple[str, str]],
        k: int = 20,
        model: str = "bm25",
        prune: bool = True,
        stats_override: tuple[float, float, dict] | None = None,
        mode: str = "or",
        exclude: dict[str, list[str]] | None = None,
        _all_matches: bool = False,
        cand_init: dict[str, np.ndarray] | None = None,
    ) -> list[tuple[str, int, float, int]]:
        """Coordinator-local point-query path: the SAME pruned slice a Spark
        job would scan (bucket dirs + term row groups) is read directly with
        pyarrow on the driver and scored with the same numpy kernels — no
        job scheduling, millisecond latency.  Exactly the scatter-gather a
        dedicated query node performs; correct whenever the pruned slice of
        |q| terms fits driver memory (it is the index slice, ~bytes/doc —
        at larger fan-in fall back to search()).  Returns
        [(qid, doc_id, score, rank)] rank-identical to search()/oracle.

        mode="and": conjunctive retrieval — only docs containing EVERY
        query term (block-skip intersection, _score_group_bool).
        exclude={qid: [terms]} drops docs containing any excluded term
        (AND-NOT; requires mode="and")."""
        import pyarrow.dataset as ds

        # reset both introspection dicts so last_query_stats() reflects
        # THIS call only — an OR query must not report a previous AND
        # query's bool_* counters (and vice versa)
        _LAST_DENSE_STATS.clear()
        _LAST_BOOL_STATS.clear()
        excl_map = {str(q): set(ts) for q, ts in (exclude or {}).items()}
        if excl_map and mode != "and":
            raise ValueError("exclude requires mode='and'")
        q_terms, all_terms = _query_term_dicts(queries)
        if excl_map:
            all_terms = set(all_terms)
            for ts in excl_map.values():
                all_terms.update(ts)
        if not all_terms:
            # no queries, or every query tokenized to nothing (e.g. a
            # stopword-only phrase) — an empty isin() set would reach
            # pyarrow as a null-typed array and raise ArrowTypeError
            return []
        if stats_override is not None:
            # sharded serving: score THIS shard's postings with the global
            # corpus statistics so per-shard top-k merge exactly
            n, avgdl, dfs = stats_override
        else:
            dfs = self.term_stats_for(sorted(all_terms))
            n = float(self.field_stats["n_docs"])
            avgdl = float(self.field_stats["avg_doc_len"])
        for terms in q_terms.values():
            for t in terms:
                t["df"] = dfs.get(t["term"], 0.0)
        buckets = sorted({term_bucket_py(t, self.n_buckets) for t in all_terms})
        filt = ds.field("bucket").isin(buckets) & ds.field("term").isin(
            sorted(all_terms)
        )
        tbl = self._local_dataset().to_table(
            filter=filt,
            columns=[
                "term", "n_docs", "first_doc_id", "max_doc_id", "max_tf",
                "min_doc_len", "doc_id_deltas", "tfs", "doc_lens",
            ],
        )
        pdf = tbl.to_pandas()
        out: list[tuple[str, int, float, int]] = []
        for qid, _qtext in queries:
            qid = str(qid)
            terms = {t["term"] for t in q_terms[qid]} | excl_map.get(qid, set())
            sub = pdf[pdf["term"].isin(terms)]
            if not len(sub):
                continue
            sub = sub.assign(qid=qid)
            if mode == "and":
                res = _score_group_bool(
                    sub, q_terms, n, avgdl, model, k, self.codec,
                    excl_terms=excl_map, cache=self.decode_cache,
                    return_all=_all_matches,
                    cand_init=(cand_init or {}).get(qid),
                )
                for rank, row in enumerate(res.itertuples(), start=1):
                    out.append((qid, int(row.doc_id), float(row.score), rank))
                continue
            # one group == all doc ranges -> the local top-k IS the global
            # one.  bm25 routing: dense-accumulator scorer when the doc-id
            # space fits a flat array (the head-term lever); decode-level
            # WAND when it doesn't but the query spans many blocks; the
            # union scorer otherwise / for other models.
            id_space = int(sub["max_doc_id"].max()) + 1
            if prune and model == "bm25" and id_space <= self._DENSE_MAX_DOCS:
                res = _score_group_dense(
                    sub, q_terms, n, avgdl, k, self.codec, id_space,
                    cache=self.decode_cache,
                )
            elif (
                prune and model == "bm25" and len(sub) >= _BMW_MIN_BLOCKS
                and self.block_order == "docid"
            ):
                res = _score_group_bmw(sub, q_terms, n, avgdl, k, self.codec)
            else:
                res = _score_group(sub, q_terms, n, avgdl, model, k, prune, self.codec)
            for rank, row in enumerate(res.itertuples(), start=1):
                out.append((qid, int(row.doc_id), float(row.score), rank))
        return out

    def search_phrase(
        self,
        queries: list[tuple[str, str]],
        k: int = 20,
        model: str = "bm25",
        tokenizer: str | None = None,
        verify: str = "auto",
    ) -> list[tuple[str, int, float, int]]:
        """Exact-phrase top-k: the standard two-phase web-serving shape.

        Phase 1 (inverted index): conjunctive candidates for the phrase's
        distinct terms via the block-skip intersection — at web scale the
        rarest phrase term bounds the candidate set, so this reads a tiny
        slice of the index.  Phase 2 (forward index): each candidate's
        token stream is fetched from the docstore (bucket-pruned reads)
        and the phrase is verified as a CONSECUTIVE token run; survivors
        keep their phase-1 scores and are cut to top-k under the engine
        rank key (quantized score desc, doc_id asc).

        The phrase is tokenized with the INDEX's doc tokenizer (recorded
        in field_stats; override with `tokenizer=`), so adjacency means
        "adjacent in the indexed token stream" — under the 'spec'
        tokenizer stopwords are not indexed and cannot appear inside a
        phrase.

        verify="positions" reads the positional store
        (index/positions.write_positions_store — pruned columnar read of
        the phrase terms' buckets + vectorized offset intersection);
        verify="docstore" re-tokenizes candidate texts from the forward
        index; "auto" prefers the positions store when present.  Both
        paths implement the same adjacency spec (tested equal).

        When a nextword store (index/nextword.py) is present, adjacent
        head-head pairs are answered from its exact-adjacency postings:
        a covered 2-token phrase needs no verification at all (the bigram
        postings ARE the phrase docs), and longer phrases intersect every
        covered pair's doc set into a phase-1 candidate restriction —
        identical results (the store is exact), minus the head-head
        candidate explosion the round-5 verdict measured."""
        from .docstore import DocStore
        from ..oracle.tokenizer import tokenize_doc, tokenize_simple

        tok = (
            tokenize_simple
            if (tokenizer or self.tokenizer) == "simple"
            else tokenize_doc
        )
        if verify == "auto":
            verify = (
                "positions"
                if os.path.isdir(os.path.join(self.index_dir, "positions"))
                else "docstore"
            )
        phrases = {str(q): tok(text) for q, text in queries}
        # nextword fast path: exact-adjacency postings for covered pairs
        nw = self._nextword_store()
        if nw is not None and nw.tokenizer != (tokenizer or self.tokenizer):
            nw = None  # store built under a different token stream
        cand_restrict: dict[str, np.ndarray] = {}
        nw_exact: set[str] = set()
        if nw is not None:
            for qid, toks in phrases.items():
                if len(toks) < 2:
                    continue
                pairs = list(zip(toks, toks[1:]))
                covered = [p for p in pairs if nw.covers(*p)]
                if not covered:
                    continue
                inter: np.ndarray | None = None
                for p in covered:
                    ids = nw.doc_ids(*p)
                    inter = ids if inter is None else inter[
                        np.isin(inter, ids, assume_unique=True)
                    ]
                    if not len(inter):
                        break
                cand_restrict[qid] = inter
                if len(pairs) == 1:
                    # the single covered pair IS the whole phrase:
                    # adjacency already proven, no verification needed
                    nw_exact.add(qid)
        # phase-1 conjunction must run over the DOC-TOKENIZED phrase, not
        # the raw text: search_local's query tokenizer is a whitespace
        # split, so a raw stopword/punctuation token would become a
        # required AND term with df=0 and silently empty the result even
        # when docs match the indexed phrase.
        live = [
            (q, " ".join(phrases[str(q)])) for q, _t in queries
            if phrases[str(q)]
        ]
        cand_rows = self.search_local(
            live, k=k, model=model, mode="and", _all_matches=True,
            cand_init=cand_restrict or None,
        )
        by_q: dict[str, list[tuple[int, float]]] = {}
        all_ids: set[int] = set()
        for qid, doc_id, score, _rank in cand_rows:
            by_q.setdefault(qid, []).append((doc_id, score))
            if qid not in nw_exact:
                all_ids.add(doc_id)
        if verify == "positions":
            from .positions import PositionsStore, phrase_match

            store = PositionsStore(self.index_dir)
            all_terms = sorted({t for p in phrases.values() for t in p})
            pos_map = store.positions_for(all_terms, sorted(all_ids))

            def matches(qid: str, doc_id: int) -> bool:
                return phrase_match(pos_map, phrases[qid], doc_id)

        else:
            texts = DocStore(self.index_dir).texts_for(sorted(all_ids))

            def matches(qid: str, doc_id: int) -> bool:
                needle = " " + " ".join(phrases[qid]) + " "
                return needle in " " + " ".join(tok(texts.get(doc_id, ""))) + " "

        out: list[tuple[str, int, float, int]] = []
        for qid, _qtext in queries:
            qid = str(qid)
            if not phrases.get(qid) or qid not in by_q:
                continue
            kept = [
                (doc_id, score)
                for doc_id, score in by_q[qid]
                if qid in nw_exact or matches(qid, doc_id)
            ]
            kept.sort(key=lambda ds: (-math.floor(ds[1] * _RANK_Q), ds[0]))
            out.extend(
                (qid, int(doc_id), float(score), rank)
                for rank, (doc_id, score) in enumerate(kept[:k], start=1)
            )
        return out


class ShardedReader:
    """Scatter-gather serving over MULTIPLE index shards, rank-identical
    to one monolithic index over the union of the shards' documents
    (asserted in tests/test_index.py).

    This is how a 10^12-doc deployment actually serves: the corpus is
    built as S independent shards (by crawl segment / time bucket), each
    a complete build_index layout with its own lineage, and a query node
    fans out to all shards and merges.  Correctness hinges on GLOBAL
    statistics: BM25's idf and length normalization use the union's
    (n_docs, avgdl, df), so each shard is scored with the global numbers
    (``stats_override``) — a document's score then depends only on its
    own postings plus global stats, which makes the merged per-shard
    top-k exactly the monolithic top-k.  Global df per term is the sum of
    the shards' dfs (doc_ids are globally unique by the deterministic id
    assignment); n/avgdl come from the exact integer ``total_len`` each
    field_stats records.  The merge uses the engine-wide quantized key
    (floor(score*1e9) desc, doc_id asc).
    """

    def __init__(self, spark: SparkSession, index_dirs: list[str]):
        if not index_dirs:
            raise ValueError("at least one shard required")
        self.readers = [IndexReader(spark, d) for d in index_dirs]
        self.n_docs = float(sum(int(r.field_stats["n_docs"]) for r in self.readers))
        total_len = sum(int(r.field_stats["total_len"]) for r in self.readers)
        self.avg_doc_len = total_len / self.n_docs
        self._global_df: dict[str, float] | None = None
        self._global_spell_index: dict[str, list[str]] | None = None

    def global_stats_for(self, terms: list[str]) -> dict[str, float]:
        dfs: dict[str, float] = {}
        for r in self.readers:
            for t, df in r.term_stats_for(terms).items():
                dfs[t] = dfs.get(t, 0.0) + df
        return dfs

    def suggest(
        self, terms: list[str], min_len: int = 3
    ) -> dict[str, tuple[str, int, float]]:
        """Spell suggestions over the UNION vocabulary with global df
        (a term's prior sums across shards) — same spec as
        IndexReader.suggest.  Requires every shard's vocabulary to fit its
        driver-side cache (the serving case); oversized shards raise."""
        if self._global_df is None:
            merged: dict[str, float] = {}
            for r in self.readers:
                r.term_stats_for([])
                if r._df_cache is None:
                    raise ValueError(
                        "shard vocabulary exceeds the driver cache; use the "
                        "distributed operators/spell path instead"
                    )
                for t, df in r._df_cache.items():
                    merged[t] = merged.get(t, 0.0) + df
            self._global_df = merged
            self._global_spell_index = _build_spell_index(merged)
        return _suggest_from_dict(
            terms, self._global_df, self._global_spell_index, min_len
        )

    def facet_counts_local(
        self, queries: list[tuple[str, str]], facet: str, mode: str = "or"
    ) -> list[tuple[str, str, int]]:
        """Facets across shards: doc_ids are globally unique (deterministic
        id assignment), so a doc's match membership lives in exactly one
        shard and the global facet histogram is the plain SUM of per-shard
        histograms — the same additive-merge property the global df relies
        on (for mode="and" too: a doc's conjunction membership is decided
        entirely within its own shard).  Each shard needs its own facet
        sidecar."""
        merged: dict[tuple[str, str], int] = {}
        for r in self.readers:
            for qid, value, cnt in r.facet_counts_local(queries, facet, mode):
                merged[(qid, value)] = merged.get((qid, value), 0) + cnt
        return [(q, v, c) for (q, v), c in sorted(merged.items())]

    def search_local(
        self,
        queries: list[tuple[str, str]],
        k: int = 20,
        model: str = "bm25",
        prune: bool = True,
    ) -> list[tuple[str, int, float, int]]:
        import math as _m

        _, all_terms = _query_term_dicts(queries)
        dfs = self.global_stats_for(sorted(all_terms))
        override = (self.n_docs, self.avg_doc_len, dfs)
        per_q: dict[str, list[tuple[int, float]]] = {}
        for r in self.readers:
            for qid, doc_id, score, _rank in r.search_local(
                queries, k=k, model=model, prune=prune,
                stats_override=override,
            ):
                per_q.setdefault(qid, []).append((doc_id, score))
        out: list[tuple[str, int, float, int]] = []
        for qid, _qtext in queries:
            qid = str(qid)
            cands = per_q.get(qid, [])
            cands.sort(key=lambda ds: (-_m.floor(ds[1] * 1e9), ds[0]))
            for rank, (doc_id, score) in enumerate(cands[:k], start=1):
                out.append((qid, doc_id, score, rank))
        return out
