"""IR-effectiveness evaluation over runs + qrels, as DataFrame aggregates.

Re-expresses the reference's `JASS_eval` metric set (`tools/JASS_eval.cpp`,
`source/evaluate_*.cpp`) declaratively. Semantics pinned to the reference:

- MAP (`source/evaluate_map.cpp:19-52`): Σ (found_and_relevant / rank) over
  relevant hits within `depth`, divided by the TOTAL number of relevant
  assessments; no relevant assessments → 1; empty results → 0.
- MRR (`source/evaluate_mean_reciprocal_rank.cpp:19-37`): 1/rank of the
  first relevant hit within depth, else 0.
- RBP (`source/evaluate_rank_biased_precision.cpp:19-43`, Moffat et al.):
  (1 - p) * Σ p^(rank-1) over relevant hits in ranks 1..depth; 0 if none.
- Precision (`source/evaluate_precision.cpp:19-45`): Σ assessment score
  over the first `depth` results / depth (binary qrels → count).
- Recall (`source/evaluate_recall.cpp:20-41`): relevant found in top depth
  / min(total relevant, depth); NULL when the query has no relevant
  assessments (the C++ divides 0/0).

Float determinism — why fixed-point: a cross-engine oracle comparison is
bitwise, but double summation is order-sensitive and engines associate
window/group sums differently. So the per-query accumulations are EXACT
int64 sums: MAP terms are scaled by lcm(1..depth) (found/rank becomes the
integer found·(lcm/rank)), RBP weights p^(rank-1) are precomputed in
CPython and fixed-pointed at 2^48. Each metric then ends with the same
fixed sequence of ≤2 IEEE divisions/multiplies on both engines. Values
agree with the reference's sequential-double formula to < 2^-40 relative.
The lcm fixed-point fits int64 only up to depth ≈ 42; at the reference's
deeper reporting depths (100/200/500/1000, JASS_eval `-d`) the 1/rank sums
fall back to plain float accumulation — same values to float precision,
only the cross-engine bitwise guarantee is forfeited.

Scale: run/qrels join keyed (query_id, doc_id) — skew-free; all window
work is per-query over ≤ depth rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RBP_SCALE = 1 << 48


def rbp_weights_fixed(depth: int, p: float) -> list[tuple[int, int]]:
    """[(rank, round(p^(rank-1) · 2^48))] — driver-side, engine-neutral."""
    return [(r, int(round((float(p) ** (r - 1)) * RBP_SCALE))) for r in range(1, depth + 1)]


def evaluate_run(
    run: DataFrame,
    qrels: DataFrame,
    depth: int = 10,
    rbp_p: float = 0.95,
    id_col: str = "doc_id",
    k4: int | None = None,
) -> DataFrame:
    """Per-query metrics for `run(query_id, doc_id, rank)` against
    `qrels(query_id, doc_id)` (binary relevance). `k4` is the K of the
    parametric metrics (JASS_eval `-k`, default = depth).

    Returns (query_id, n_rel, n_ret, map, mrr, rbp, p_at_depth, recall,
    esl, f1, mrr4k)."""
    k4 = depth if k4 is None else k4
    spark = run.sparkSession
    # The 1/rank sums (MAP, MRR4K) accumulate as exact integers Σ lcm/rank
    # when lcm(1..depth) fits the fixed-point guard — cross-engine bitwise.
    # Beyond depth ≈ 42 the lcm overflows int64, so fall back to plain
    # float accumulation (the reference's own math, JASS_eval reports
    # depths 100/200/500/1000): only the cross-engine bitwise guarantee is
    # forfeited, values differ at most by float association order.
    ap_lcm = math.lcm(*range(1, depth + 1))
    fixed_point = ap_lcm * depth * depth < 1 << 62
    if fixed_point:
        ap_ws: list = [ap_lcm // r for r in range(1, depth + 1)]
        ap_type, ap_scale = "long", float(ap_lcm)
    else:
        ap_ws = [1.0 / r for r in range(1, depth + 1)]
        ap_type, ap_scale = "double", 1.0

    w_rows = [
        (r, w, ap_ws[r - 1])
        for r, (_, w) in zip(range(1, depth + 1), rbp_weights_fixed(depth, rbp_p))
    ]
    weights = F.broadcast(
        spark.createDataFrame(w_rows, f"rank long, rbp_wi long, ap_wi {ap_type}")
    )

    rel = qrels.select("query_id", F.col(id_col).alias("doc_id")).distinct()
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))

    rr = (
        run.where(F.col("rank") <= F.lit(depth))
        .select("query_id", F.col(id_col).alias("doc_id"), F.col("rank").cast("long").alias("rank"))
        .join(rel.withColumn("is_rel", F.lit(1)), ["query_id", "doc_id"], "left")
        .na.fill({"is_rel": 0})
        .join(weights, "rank")
    )

    cum = Window.partitionBy("query_id").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    rr = rr.withColumn("found", F.sum("is_rel").over(cum))  # exact int cumsum

    per_q = rr.groupBy("query_id").agg(
        F.sum(F.when(F.col("is_rel") == 1, F.col("found") * F.col("ap_wi")).otherwise(F.lit(0)))
        .cast(ap_type)
        .alias("ap_int"),
        # MRR4K numerator (`evaluate_mean_reciprocal_rank4k.cpp:19-44`):
        # Σ 1/rank over the first k4 relevant hits, as the exact integer
        # Σ lcm/rank (one rounding at the end, engine-neutral)
        F.sum(
            F.when(
                (F.col("is_rel") == 1) & (F.col("found") <= F.lit(k4)), F.col("ap_wi")
            ).otherwise(F.lit(0))
        )
        .cast(ap_type)
        .alias("rr4k_int"),
        F.sum(F.when(F.col("is_rel") == 1, F.col("rbp_wi")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rbp_int"),
        F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum("is_rel").cast("long").alias("n_rel_ret"),
        F.count(F.lit(1)).cast("long").alias("n_ret"),
    )

    out = n_rel.join(per_q, "query_id", "full_outer")
    n_rel_c = F.coalesce(F.col("n_rel"), F.lit(0)).cast("long")
    n_ret_c = F.coalesce(F.col("n_ret"), F.lit(0)).cast("long")
    n_rel_ret_c = F.coalesce(F.col("n_rel_ret"), F.lit(0)).cast("long")

    map_c = (
        F.when(n_rel_c == 0, F.lit(1.0))
        .when(n_ret_c == 0, F.lit(0.0))
        .otherwise(
            (F.coalesce(F.col("ap_int"), F.lit(0)).cast("double") / F.lit(ap_scale))
            / n_rel_c.cast("double")
        )
    )
    mrr_c = F.when(
        F.col("first_rel").isNotNull(), F.lit(1.0) / F.col("first_rel").cast("double")
    ).otherwise(F.lit(0.0))
    rbp_c = F.lit(1.0 - float(rbp_p)) * (
        F.coalesce(F.col("rbp_int"), F.lit(0)).cast("double") / F.lit(float(RBP_SCALE))
    )
    prec_c = n_rel_ret_c.cast("double") / F.lit(float(depth))
    recall_c = F.when(n_rel_c == 0, F.lit(None).cast("double")).otherwise(
        n_rel_ret_c.cast("double") / F.least(n_rel_c, F.lit(depth)).cast("double")
    )
    # ESL (`source/evaluate_expected_search_length.cpp:21-39`): non-relevant
    # results seen before the first relevant one; `depth` when none found.
    esl_c = F.when(
        F.col("first_rel").isNotNull(), (F.col("first_rel") - F.lit(1)).cast("double")
    ).otherwise(F.lit(float(depth)))
    # F1 (`source/evaluate_f.cpp:20-29`): harmonic of P@depth and recall,
    # 0 when both 0; NULL when recall is undefined (no relevant
    # assessments — the C++ divides 0/0 there).
    f_c = (
        F.when(n_rel_c == 0, F.lit(None).cast("double"))
        .when(prec_c + recall_c == F.lit(0.0), F.lit(0.0))
        .otherwise(F.lit(2.0) * ((prec_c * recall_c) / (prec_c + recall_c)))
    )
    # MRR4K: defined (and nonzero) only when at least k4 relevant hits were
    # retrieved within depth; else 0 (the reference falls through to 0).
    mrr4k_c = F.when(
        n_rel_ret_c >= F.lit(k4),
        (F.coalesce(F.col("rr4k_int"), F.lit(0)).cast("double") / F.lit(ap_scale))
        / F.lit(float(k4)),
    ).otherwise(F.lit(0.0))

    return out.select(
        "query_id",
        n_rel_c.alias("n_rel"),
        n_ret_c.alias("n_ret"),
        map_c.alias("map"),
        mrr_c.alias("mrr"),
        rbp_c.alias("rbp"),
        prec_c.alias("p_at_depth"),
        recall_c.alias("recall"),
        esl_c.alias("esl"),
        f_c.alias("f1"),
        mrr4k_c.alias("mrr4k"),
    )


def ndcg_discounts_fixed(depth: int, max_rel: int) -> tuple[list[tuple[int, int]], int]:
    """Driver-side nDCG discount table: [(rank, w_r)] with
    w_r = round(scale / log2(rank+1)), scale the largest power of two such
    that the worst-case DCG sum (2^max_rel − 1) · scale · depth stays below
    2^62 — exact int64 accumulation at any depth/grade within the guard."""
    if max_rel < 1 or max_rel > 20:
        raise ValueError("max_rel must be in [1, 20]")
    scale = 1 << 62
    while ((1 << max_rel) - 1) * scale * depth >= 1 << 62:
        scale >>= 1
    if scale == 0:
        raise ValueError(f"depth={depth} max_rel={max_rel} overflow int64")
    return (
        [(r, int(round(scale / math.log2(r + 1)))) for r in range(1, depth + 1)],
        scale,
    )


def evaluate_ndcg(
    run: DataFrame,
    qrels: DataFrame,
    depth: int = 10,
    max_rel: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Graded nDCG@depth (Järvelin & Kekäläinen TOIS'02, exponential-gain
    form gain = 2^rel − 1, the trec_eval/web-track convention) — the
    standard metric the reference's JASS_eval family lacks (it ships only
    the price-binned PBnDCG/BPnDCG variants,
    `source/evaluate_price_based_normalized_discounted_cumulative_gain.cpp`).

    `run(query_id, doc_id, rank)`, `qrels(query_id, doc_id, rel)` with
    integer grades 0..max_rel (rows with rel ≤ 0 are non-relevant).

    Float determinism: discounts 1/log2(rank+1) are precomputed driver-side
    as integers w_r = round(scale/log2(r+1)) (see :func:`ndcg_discounts_fixed`),
    so DCG and ideal-DCG accumulate as EXACT int64 sums Σ gain·w_r on any
    engine/parallelism; ndcg is one final int64→double division. Ties in
    the ideal ranking don't affect idcg (equal gains × whichever discounts).

    Returns (query_id, dcg_int, idcg_int, ndcg); queries with no positively
    graded assessment are omitted (0/0 — trec_eval's convention too).
    Scale: one (query_id, doc_id) equi-join + per-query windows over
    ≤ depth rows."""
    spark = run.sparkSession
    w_rows, _scale = ndcg_discounts_fixed(depth, max_rel)
    weights = F.broadcast(spark.createDataFrame(w_rows, "pos long, ndcg_wi long"))

    graded = (
        qrels.select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            F.col("rel").cast("long").alias("rel"),
        )
        .where(F.col("rel") > 0)
    )
    # guard: grades beyond the scale bound would overflow the int64 sums
    graded = graded.withColumn("rel", F.least(F.col("rel"), F.lit(int(max_rel))))
    gain = F.expr("CAST(shiftleft(1L, CAST(rel AS INT)) - 1 AS BIGINT)")

    dcg = (
        run.where(F.col("rank") <= F.lit(depth))
        .select("query_id", F.col(id_col).alias("doc_id"), F.col("rank").cast("long").alias("pos"))
        .join(graded, ["query_id", "doc_id"], "inner")
        .join(weights, "pos")
        .groupBy("query_id")
        .agg(F.sum(gain * F.col("ndcg_wi")).cast("long").alias("dcg_int"))
    )

    ideal_w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    idcg = (
        graded.withColumn("pos", F.row_number().over(ideal_w).cast("long"))
        .where(F.col("pos") <= F.lit(depth))
        .join(weights, "pos")
        .groupBy("query_id")
        .agg(F.sum(gain * F.col("ndcg_wi")).cast("long").alias("idcg_int"))
    )

    out = idcg.join(dcg, "query_id", "full_outer")
    dcg_c = F.coalesce(F.col("dcg_int"), F.lit(0)).cast("long")
    return out.select(
        "query_id",
        dcg_c.alias("dcg_int"),
        F.coalesce(F.col("idcg_int"), F.lit(0)).cast("long").alias("idcg_int"),
        F.when(
            F.col("idcg_int").isNotNull() & (F.col("idcg_int") > 0),
            dcg_c.cast("double") / F.col("idcg_int").cast("double"),
        ).alias("ndcg"),
    )


def evaluate_run_priced(
    run: DataFrame,
    qrels: DataFrame,
    prices: DataFrame,
    depth: int = 10,
    id_col: str = "doc_id",
    k4: int | None = None,
) -> DataFrame:
    """Per-query eCommerce metrics (the JASS_eval `-p` price mode,
    `tools/JASS_eval.cpp` metrics 112-117): `prices(doc_id, price)` must
    cover every doc appearing in `run` or `qrels`.

    - cheapest_precision (`source/evaluate_cheapest_precision.cpp:21-99`):
      the relevant set is sliced to the first min(depth, |results|) entries
      **in (query_id, doc_id-as-string) order — the reference sorts the
      judgement vector with judgement::operator<, which compares document
      ids lexicographically, not prices** (`source/evaluate.h:91-112`); the
      slice extends over the consecutive run of equal-priced entries at the
      boundary; score = |top-depth results ∩ slice| / depth. No results →
      0; no relevant assessments → 1.
    - buying_power (`source/evaluate_buying_power.cpp:21-84`): cheapest
      relevant price / Σ prices of results up to and including the first
      relevant one; 1 with no relevant assessments, 0 when relevant exist
      but none retrieved within depth.
    - selling_power (`source/evaluate_selling_power.cpp:21-91`): over the
      first query_depth = min(n_rel, depth) results, each relevant hit i
      (in rank order) contributes (i-th cheapest relevant price / hit
      price); sum / query_depth; 1 with no relevant assessments.
    - buying_power4k (`source/evaluate_buying_power4k.cpp:21-95`, JASS_eval
      `-k`, default = depth): Σ of the k4 cheapest relevant prices / Σ
      prices of results up to and including the k4-th relevant one; 0 when
      fewer than k4 relevant exist or fewer than k4 are retrieved in depth.
    - pb_ndcg (`evaluate_price_based_normalized_discounted_cumulative_gain
      .cpp:21-138`): nDCG whose gains come from 5 exponential price bins
      over the relevant price range (cheaper → higher gain 1..5); the
      ideal ranking is cheapest-first; discounts 1/log2(pos+2) count ALL
      result positions. 1 with no relevant assessments.
    - bp_ndcg (`evaluate_buying_power_normalized_discounted_cumulative_gain
      .cpp:20-116`): same structure with gain = cheapest_rel_price / price.

    Float determinism: the bin coefficients (1-e^i)/(1-e^5) and the
    log2(pos+2) discounts are Python-computed literals shared with the SQL
    oracle, and every DCG sum is pivot-chained in position order, so both
    engines execute the identical IEEE expression tree.

    Scale: every join is keyed (query_id, doc_id) or a broadcast of the
    per-query relevant sets — skew-free; windows run over ≤ depth rows.
    """
    k4 = depth if k4 is None else k4
    n_bins = 5
    bin_cis = [(1.0 - math.exp(i)) / (1.0 - math.exp(n_bins)) for i in range(n_bins)]
    logs = [math.log2(i + 2) for i in range(depth)]
    rel = qrels.select("query_id", F.col(id_col).alias("doc_id")).distinct()
    rel_p = rel.join(prices.select(F.col(id_col).alias("doc_id"), "price"), "doc_id")
    n_rel = rel_p.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel"),
        F.min("price").alias("min_rel_price"),
        F.max("price").alias("max_rel_price"),
    )

    def _bin_gain(price_col):
        """6 - bin_no with bin boundaries lo + (hi-lo)·c_i (c_i literal);
        bin_no counts boundaries ≤ price, exactly the reference's loop."""
        bin_no = None
        for ci in bin_cis:
            hit = F.when(
                F.col("min_rel_price")
                + (F.col("max_rel_price") - F.col("min_rel_price")) * F.lit(ci)
                <= price_col,
                1,
            ).otherwise(0)
            bin_no = hit if bin_no is None else bin_no + hit
        return (F.lit(n_bins + 1) - bin_no).cast("double")

    def _chain(slots):
        total = F.coalesce(slots[0], F.lit(0.0))
        for s in slots[1:]:
            total = total + F.coalesce(s, F.lit(0.0))
        return total

    res = (
        run.select("query_id", F.col(id_col).alias("doc_id"), F.col("rank").cast("long").alias("rank"))
        .join(prices.select(F.col(id_col).alias("doc_id"), "price"), "doc_id", "left")
        .join(rel.withColumn("is_rel", F.lit(1)), ["query_id", "doc_id"], "left")
        .na.fill({"is_rel": 0})
    )
    n_ret = res.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ret"))

    w = Window.partitionBy("query_id").orderBy("rank")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)

    # --- buying power ----------------------------------------------------
    bp_rows = res.where(F.col("rank") <= F.lit(depth)).withColumn(
        "cum_price", F.sum("price").over(cum)
    )
    bp_marks = bp_rows.where(F.col("is_rel") == 1).withColumn(
        "rn", F.row_number().over(w)
    )
    bp_q = bp_marks.where(F.col("rn") == 1).select(
        "query_id", F.col("cum_price").alias("spend_at_first_rel")
    )
    bp4_q = bp_marks.where(F.col("rn") == F.lit(k4)).select(
        "query_id", F.col("cum_price").alias("spend_at_k4_rel")
    )

    # --- selling power ---------------------------------------------------
    # i-th relevant hit by rank (within the first query_depth results)
    # pairs with the i-th cheapest relevant price
    wp = Window.partitionBy("query_id").orderBy("price", "doc_id")
    cheap = rel_p.withColumn("i", F.row_number().over(wp)).select(
        "query_id", "i", F.col("price").alias("cheap_price")
    )
    # BP4K minimum basket: Σ of the k4 cheapest relevant prices, pinned
    # ascending association order (pivot + chain-add, engine-neutral)
    mc_slots = [
        F.max(F.when(F.col("i") == j, F.col("cheap_price"))) for j in range(1, k4 + 1)
    ]
    mc_sum = F.coalesce(mc_slots[0], F.lit(0.0))
    for s in mc_slots[1:]:
        mc_sum = mc_sum + F.coalesce(s, F.lit(0.0))
    min_cost_q = cheap.groupBy("query_id").agg(mc_sum.alias("min_cost"))

    # nDCG ideal vectors: cheapest-first positions 1..depth
    cheap_nd = cheap.join(
        n_rel.select("query_id", "min_rel_price", "max_rel_price"), "query_id"
    )
    ideal_q = cheap_nd.groupBy("query_id").agg(
        _chain(
            [
                F.max(
                    F.when(
                        F.col("i") == j,
                        _bin_gain(F.col("cheap_price")) / F.lit(logs[j - 1]),
                    )
                )
                for j in range(1, depth + 1)
            ]
        ).alias("pb_ideal"),
        _chain(
            [
                F.max(
                    F.when(
                        F.col("i") == j,
                        (F.col("min_rel_price") / F.col("cheap_price"))
                        / F.lit(logs[j - 1]),
                    )
                )
                for j in range(1, depth + 1)
            ]
        ).alias("bp_ideal"),
    )

    # nDCG of the run: discounts use the ABSOLUTE result position (rank),
    # relevant rows contribute, non-relevant still consume positions
    res_nd = res.where(F.col("rank") <= F.lit(depth)).where(F.col("is_rel") == 1).join(
        n_rel.select("query_id", "min_rel_price", "max_rel_price"), "query_id"
    )
    dcg_q = res_nd.groupBy("query_id").agg(
        _chain(
            [
                F.max(
                    F.when(
                        F.col("rank") == j,
                        _bin_gain(F.col("price")) / F.lit(logs[j - 1]),
                    )
                )
                for j in range(1, depth + 1)
            ]
        ).alias("pb_dcg"),
        _chain(
            [
                F.max(
                    F.when(
                        F.col("rank") == j,
                        (F.col("min_rel_price") / F.col("price")) / F.lit(logs[j - 1]),
                    )
                )
                for j in range(1, depth + 1)
            ]
        ).alias("bp_dcg"),
    )
    # the ratio sum is floating point, so the association order must be
    # pinned for cross-engine bitwise parity: pivot the ≤ depth ratios into
    # slots and chain-add them left to right (same expression in the SQL
    # oracle) instead of relying on an engine's aggregate order.
    slot = [
        F.max(F.when(F.col("i") == j, F.col("cheap_price") / F.col("price")))
        for j in range(1, depth + 1)
    ]
    sp_sum = F.coalesce(slot[0], F.lit(0.0))
    for s in slot[1:]:
        sp_sum = sp_sum + F.coalesce(s, F.lit(0.0))
    sp_hits = (
        res.join(n_rel.select("query_id", "n_rel"), "query_id")
        .where(F.col("rank") <= F.least(F.col("n_rel"), F.lit(depth)))
        .where(F.col("is_rel") == 1)
        .withColumn("i", F.row_number().over(w))
        .join(cheap, ["query_id", "i"])
        .groupBy("query_id")
        .agg(sp_sum.alias("sp_sum"))
    )

    # --- cheapest precision ----------------------------------------------
    # judgement-order slice (doc_id STRING compare — the reference quirk)
    wj = Window.partitionBy("query_id").orderBy(F.col("doc_id").cast("string"))
    sliced = (
        rel_p.withColumn("j", F.row_number().over(wj))
        .join(n_ret, "query_id")
        .withColumn("sp0", F.least(F.lit(depth), F.col("n_ret")))
    )
    boundary = sliced.where(F.col("j") == F.col("sp0") + 1).select(
        "query_id", F.col("price").alias("boundary_price")
    )
    # beyond sp0, keep only the consecutive run of boundary-priced entries
    tail_breaks = F.sum(
        F.when(
            (F.col("j") > F.col("sp0"))
            & (F.col("price") != F.coalesce(F.col("boundary_price"), F.lit(float("nan")))),
            1,
        ).otherwise(0)
    ).over(wj.rowsBetween(Window.unboundedPreceding, 0))
    kept = (
        sliced.join(boundary, "query_id", "left")
        .withColumn("breaks", tail_breaks)
        .where((F.col("j") <= F.col("sp0")) | (F.col("breaks") == 0))
        .select("query_id", "doc_id")
    )
    cp_q = (
        res.where(F.col("rank") <= F.lit(depth))
        .join(kept.withColumn("in_slice", F.lit(1)), ["query_id", "doc_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("in_slice"), F.lit(0))).alias("cheap_found"))
    )

    out = (
        n_rel.join(n_ret, "query_id", "full_outer")
        .join(bp_q, "query_id", "left")
        .join(bp4_q, "query_id", "left")
        .join(min_cost_q, "query_id", "left")
        .join(ideal_q, "query_id", "left")
        .join(dcg_q, "query_id", "left")
        .join(sp_hits, "query_id", "left")
        .join(cp_q, "query_id", "left")
    )
    n_rel_c = F.coalesce(F.col("n_rel"), F.lit(0))
    n_ret_c = F.coalesce(F.col("n_ret"), F.lit(0))

    cp = (
        F.when(n_ret_c == 0, F.lit(0.0))
        .when(n_rel_c == 0, F.lit(1.0))
        .otherwise(F.coalesce(F.col("cheap_found"), F.lit(0)).cast("double") / F.lit(float(depth)))
    )
    bp = (
        F.when(n_rel_c == 0, F.lit(1.0))
        .when(F.col("spend_at_first_rel").isNull(), F.lit(0.0))
        .otherwise(F.col("min_rel_price") / F.col("spend_at_first_rel"))
    )
    sp = F.when(n_rel_c == 0, F.lit(1.0)).otherwise(
        F.coalesce(F.col("sp_sum"), F.lit(0.0))
        / F.least(n_rel_c, F.lit(depth)).cast("double")
    )
    bp4 = (
        F.when(n_rel_c < F.lit(k4), F.lit(0.0))
        .when(F.col("spend_at_k4_rel").isNull(), F.lit(0.0))
        .otherwise(F.col("min_cost") / F.col("spend_at_k4_rel"))
    )
    pbndcg = F.when(n_rel_c == 0, F.lit(1.0)).otherwise(
        F.coalesce(F.col("pb_dcg"), F.lit(0.0)) / F.col("pb_ideal")
    )
    bpndcg = F.when(n_rel_c == 0, F.lit(1.0)).otherwise(
        F.coalesce(F.col("bp_dcg"), F.lit(0.0)) / F.col("bp_ideal")
    )
    return out.select(
        "query_id",
        n_rel_c.cast("long").alias("n_rel"),
        n_ret_c.cast("long").alias("n_ret"),
        cp.alias("cheapest_precision"),
        bp.alias("buying_power"),
        sp.alias("selling_power"),
        bp4.alias("buying_power4k"),
        pbndcg.alias("pb_ndcg"),
        bpndcg.alias("bp_ndcg"),
    )


def mean_metrics(per_query: DataFrame) -> DataFrame:
    """Collection-level means (the JASS_eval summary block). Uses plain
    avg(): cross-query order is not pinned, so these are reporting numbers,
    not bitwise-reproducible artifacts."""
    # GMAP follows the reference exactly (`tools/JASS_eval.cpp:295,365`):
    # per-query term is ln(ap) with ap==0 contributing 0 (not -inf), the
    # terms are averaged over ALL queries, then exponentiated.
    gmap_term = F.when(F.col("map") == 0.0, F.lit(0.0)).otherwise(F.log(F.col("map")))
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg("map").alias("mean_map"),
        F.exp(F.avg(gmap_term)).alias("gmap"),
        F.avg("mrr").alias("mean_mrr"),
        F.avg("rbp").alias("mean_rbp"),
        F.avg("p_at_depth").alias("mean_p"),
        F.avg("recall").alias("mean_recall"),
        F.avg("esl").alias("mean_esl"),
        F.avg("f1").alias("mean_f1"),  # over queries where F is defined
    )


def run_overlap(run_a: DataFrame, run_b: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, n_a, n_b, n_common, overlap_pct): per-query agreement
    between two runs' top-k doc sets — the anytime quality-vs-budget
    harness. JASS's headline claim (Lin & Trotman, "Anytime Ranking for
    Impact-Ordered Indexes", ICTIR'15 lineage; `anytime/` in the
    reference) is that a small ρ postings budget loses almost nothing:
    this metric makes that measurable as |topk(ρ) ∩ topk(1.0)| per query.

    Inputs carry (query_id, doc_id, rank); rows with rank > k are
    ignored. Queries present in EITHER run emit a row (full outer), so a
    budget that empties a query is visible as n_b=0 rather than a missing
    row. overlap_pct = floor(100·n_common / max(n_a, 1)) — exact integer.

    Scale: two tiny (queries×k) inputs; one (query_id) agg each plus one
    equi-join — driver-free, any-size query batch."""
    a = run_a.where(F.col("rank") <= k).select("query_id", "doc_id")
    b = run_b.where(F.col("rank") <= k).select("query_id", "doc_id")
    na = a.groupBy("query_id").agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = b.groupBy("query_id").agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    common = (
        a.join(b, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        na.join(nb, "query_id", "full")
        .join(common, "query_id", "left")
        .na.fill(0)
        .select(
            "query_id",
            "n_a",
            "n_b",
            "n_common",
            F.floor(
                F.lit(100.0)
                * F.col("n_common").cast("double")
                / F.greatest(F.col("n_a"), F.lit(1)).cast("double")
            ).cast("long").alias("overlap_pct"),
        )
    )


def pool_runs(runs: list[DataFrame], depth: int = 10) -> DataFrame:
    """(query_id, doc_id, n_runs, best_rank): the TREC assessment pool —
    the union of every run's top-`depth` documents per topic, with how
    many runs retrieved each document and its best (lowest) rank across
    runs. This is how qrels are built before JASS_eval-style scoring can
    happen at all (pooling, Spärck Jones & van Rijsbergen 1975; every
    TREC since): assessors judge the pool, not the collection.

    Scale: each input is an already-top-k'd run (n_queries × depth rows);
    the union + (query_id, doc_id) agg is one tiny keyed exchange with
    map-side partial aggregation. Run count and depth are both bounded,
    so the pool is ≤ n_queries · depth · n_runs rows regardless of
    corpus size."""
    pooled: DataFrame | None = None
    for run in runs:
        top = run.where(F.col("rank") <= F.lit(int(depth))).select(
            "query_id", F.col("doc_id").cast("long").alias("doc_id"),
            F.col("rank").cast("long").alias("rank"),
        )
        pooled = top if pooled is None else pooled.unionByName(top)
    if pooled is None:
        raise ValueError("pool_runs needs at least one run")
    return pooled.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.min("rank").cast("long").alias("best_rank"),
    )


def kendall_tau(run_a: DataFrame, run_b: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, n_common, concordant, discordant, tau_micros): Kendall's
    τ between two runs' top-k orderings, per query, computed over the
    documents BOTH runs retrieved (the standard treatment for comparing
    system rankings with non-identical retrieved sets; `run_overlap`
    measures set agreement, this measures ORDER agreement on the shared
    set). Both inputs come from row_number windows, so neither ranking
    has ties: every pair is concordant or discordant and
    τ = (C − D) / (C + D), emitted as the exact integer
    floor(10⁶·(2C − P)/P) with P = n_common·(n_common−1)/2. Queries with
    n_common < 2 have no pairs and emit no row (τ undefined).

    Scale: inputs are top-k'd runs; the pair join is an equi-join on
    query_id whose per-query fan-out is capped at k(k−1)/2 — bounded by
    the constant k, uniform across queries."""
    ca = run_a.where(F.col("rank") <= k).select(
        "query_id", F.col("doc_id").alias("doc_id"), F.col("rank").alias("ra")
    )
    cb = run_b.where(F.col("rank") <= k).select(
        "query_id", F.col("doc_id").alias("doc_id"), F.col("rank").alias("rb")
    )
    common = ca.join(cb, ["query_id", "doc_id"])
    x = common.select(
        "query_id", F.col("doc_id").alias("da"),
        F.col("ra").alias("xa"), F.col("rb").alias("xb"),
    )
    y = common.select(
        "query_id", F.col("doc_id").alias("db"),
        F.col("ra").alias("ya"), F.col("rb").alias("yb"),
    )
    conc = (
        (F.col("xa") < F.col("ya")) == (F.col("xb") < F.col("yb"))
    ).cast("long")
    pairs = x.join(y, "query_id").where(F.col("da") < F.col("db"))
    return (
        pairs.select("query_id", conc.alias("conc"))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("conc").alias("concordant"),
        )
        .select(
            "query_id",
            F.col("concordant").cast("long").alias("concordant"),
            (F.col("n_pairs") - F.col("concordant")).cast("long").alias("discordant"),
            F.floor(
                F.lit(1_000_000.0)
                * (2.0 * F.col("concordant") - F.col("n_pairs")).cast("double")
                / F.col("n_pairs").cast("double")
            ).cast("long").alias("tau_micros"),
        )
    )


def rsv_mass(run: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, mass): Σ rsv over the run's top-k — the integer
    per-query effectiveness proxy the anytime literature plots against
    the ρ budget (total attained impact mass; exact, no qrels needed)."""
    return (
        run.where(F.col("rank") <= k)
        .groupBy("query_id")
        .agg(F.sum("rsv").cast("long").alias("mass"))
    )


def paired_run_test(metric_a: DataFrame, metric_b: DataFrame) -> DataFrame:
    """One row (n, wins_a, wins_b, ties, sum_delta, sum_delta2, t_micros):
    the paired comparison between two systems on a per-query integer
    metric (query_id, mass) — the sign-test counts plus the paired
    t statistic t = mean(d) / (s_d / √n), emitted as floor(10⁶·t).

    The accumulated moments (Σd, Σd²) are exact int64 sums over the
    joined queries, so the statistic is a fixed chain of IEEE double
    ops (two divides, one sqrt — all correctly rounded) from exact
    integers: bitwise-reproducible on any engine that writes the same
    expression. t is NULL when n < 2 or s_d = 0 (no variance).
    Significance thresholds are the caller's business; this emits the
    statistic, not a verdict.

    Scale: inputs are per-query scalars (one row per topic); one
    equi-join + a single global aggregate."""
    d = metric_a.select("query_id", F.col("mass").alias("ma")).join(
        metric_b.select("query_id", F.col("mass").alias("mb")), "query_id"
    ).select((F.col("ma") - F.col("mb")).cast("long").alias("delta"))
    agg = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("delta") > 0).cast("long")).cast("long").alias("wins_a"),
        F.sum((F.col("delta") < 0).cast("long")).cast("long").alias("wins_b"),
        F.sum((F.col("delta") == 0).cast("long")).cast("long").alias("ties"),
        F.sum("delta").cast("long").alias("sum_delta"),
        F.sum(F.col("delta") * F.col("delta")).cast("long").alias("sum_delta2"),
    )
    nn = F.col("n").cast("double")
    s1 = F.col("sum_delta").cast("double")
    s2 = F.col("sum_delta2").cast("double")
    var_num = s2 - s1 * s1 / nn  # (n-1)·s_d²
    t = (s1 / nn) / F.sqrt(var_num / (nn - F.lit(1.0)) / nn)
    return agg.select(
        "n", "wins_a", "wins_b", "ties", "sum_delta", "sum_delta2",
        F.when(
            (F.col("n") >= 2) & (var_num > 0), F.floor(F.lit(1_000_000.0) * t)
        ).cast("long").alias("t_micros"),
    )


def rbo_overlap(
    run_a: DataFrame,
    run_b: DataFrame,
    *,
    k: int = 10,
    p_num: int = 9,
    p_den: int = 10,
) -> DataFrame:
    """(query_id, n_common, rbo_micros): truncated rank-biased overlap at
    depth k (Webber, Moffat & Zobel, "A Similarity Measure for Indefinite
    Rankings", TOIS'10) with persistence p = p_num/p_den, normalized by
    the truncated weight mass (1 − p^k) so identical top-k rankings score
    exactly 10⁶ micros. Completes the run-comparison triad: `run_overlap`
    = set agreement, `kendall_tau` = order agreement on the shared set,
    RBO = the top-weighted blend of both that the IR literature treats as
    the standard ranking-similarity measure.

    Exact-integer recipe: RBO@k = Σ_d (1−p)p^(d−1)·X_d/d with
    X_d = |A_{1..d} ∩ B_{1..d}|. Swapping the sums, a doc common to both
    runs with m = max(rank_a, rank_b) contributes C(m) = Σ_{d≥m} w_d/d —
    a k-entry table computed driver-side as EXACT integers at scale
    S = p_den^k·lcm(1..k); the normalizer D = lcm(1..k)·(p_den^k − p_num^k)
    at the same scale. rbo_micros = (Σ C(m) · (10⁶/g)) DIV (D/g) with
    g = gcd(10⁶, D) — one integer division from associative int64 sums,
    bitwise on any engine/parallelism. Raises if the reduced product
    could overflow int64 (k ≈ 20 at the defaults; the reference depths
    are ≤ 10 here).

    Queries present in either run emit a row (n_common = 0 → rbo 0),
    matching `run_overlap`'s visibility convention. Scale: top-k'd
    inputs, one equi-join + one (query_id) agg — driver-free."""
    L = math.lcm(*range(1, k + 1))
    contrib = [
        sum(
            (p_den - p_num) * p_num ** (d - 1) * p_den ** (k - d) * (L // d)
            for d in range(m, k + 1)
        )
        for m in range(1, k + 1)
    ]
    den = L * (p_den**k - p_num**k)
    g = math.gcd(10**6, den)
    mult, den_r = 10**6 // g, den // g
    if den * mult >= 2**63:
        raise ValueError(f"k={k} p={p_num}/{p_den}: rbo fixed point overflows int64")

    ca = run_a.where(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("ra")
    )
    cb = run_b.where(F.col("rank") <= k).select(
        "query_id", "doc_id", F.col("rank").alias("rb")
    )
    ctab = F.array(*[F.lit(int(c)) for c in contrib])
    sums = (
        ca.join(cb, ["query_id", "doc_id"])
        .select(
            "query_id",
            F.element_at(ctab, F.greatest("ra", "rb").cast("int")).alias("c"),
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"), F.sum("c").alias("s"))
    )
    qids = (
        run_a.select("query_id")
        .unionByName(run_b.select("query_id"))
        .distinct()
    )
    return (
        qids.join(sums, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
            F.expr(f"coalesce(s, 0) * {mult} div {den_r}")
            .cast("long")
            .alias("rbo_micros"),
        )
    )
