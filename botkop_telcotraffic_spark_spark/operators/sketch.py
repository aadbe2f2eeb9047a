"""Mergeable cardinality sketches (Apache DataSketches HLL via Spark
3.5+ builtins) — the 100 TB pattern for distinct counts.

``approx_count_distinct`` gives one number per group per query;
**sketches** are state you can store: build per-partition (per day,
per shard) once, then answer any coarser rollup by unioning the
binary sketches — no rescan of the raw data.  That turns "distinct
users last quarter" from a 100 TB scan into a union of ~90 daily
sketches of a few KB each.

Key invariant (unit-tested): union-of-partial-sketches estimates ==
one-shot sketch estimate, exactly — the sketch is a deterministic
function of the value set, so pre-aggregation is lossless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LG_K = 12  # 4096 buckets, ~1.6% relative error — datasketches default

# log-histogram: values <= 0 (the histogram is multiplicative) live in a
# dedicated sentinel bucket that sorts before every real bucket
_NEG_BUCKET = -1099

# count-min hash family: depth independent rows of ((a*v + b) % P) % width.
# Constants are fixed primes/odds so both engines (and re-runs) agree.
_CMS_P = 1_000_000_007
_CMS_A = [999_883, 999_979, 999_961, 999_959, 999_953, 999_931]
_CMS_B = [12_345, 67_890, 13_579, 24_680, 98_765, 55_555]


def build_sketches(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = LG_K
) -> DataFrame:
    """Per-group binary HLL sketch of distinct ``value_col`` values —
    the materializable partial (store it partitioned by the keys)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("rows"),
    )


def rollup_sketches(
    sketches: DataFrame, keys: list[str], lg_k: int = LG_K
) -> DataFrame:
    """Union finer-grained sketches up to ``keys`` and estimate:
    (keys..., approx_distinct, rows).  Reads only the sketch table."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(True))
        ).alias("approx_distinct"),
        F.sum("rows").alias("rows"),
    )


# ---------------------------------------------------------------------------
# Log-histogram quantile sketch
# ---------------------------------------------------------------------------
# Mergeable quantiles for 100 TB rollups.  ``percentile_approx`` answers one
# group per query and its GK state is engine-internal; this sketch is a plain
# (keys..., bucket, cnt) TABLE you can store partitioned by the keys, merge
# by summation to any coarser grain, and query for any quantile — the same
# store-partials-once pattern as the HLL sketches above, with a bounded
# multiplicative error (the estimate is the arithmetic midpoint of a
# power-of-two bucket, so est/true ∈ [0.75, 1.5]).
#
# Everything is a pure Catalyst column expression, and every arithmetic step
# is exact in IEEE doubles (floor(log2(v)) buckets; midpoint 1.5 * 2^b), so
# the DuckDB oracle reproduces results bit-for-bit.


def loghist_build(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-group log₂ histogram of ``value_col``: one (keys..., bucket,
    cnt) row per occupied bucket — the materializable partial.

    Physical shape: ONE scan + one partial-aggregated groupBy; the
    output is ~64 rows per group regardless of input size, so the
    sketch table is negligible next to the data."""
    v = F.col(value_col)
    # floor(log2(v)) computed via floating log2 is NOT engine-exact:
    # libm log2 implementations differ in the last ulp near powers of
    # two (e.g. log(2^-29)/log(2) = -29.000000000000004 floors to
    # -30).  The one-step correction below compares against exact
    # powers of two (2^k is exactly representable), so the final
    # bucket is floor(log2(v)) in exact arithmetic on ANY engine
    # whose log2 is within 1 ulp — the oracle applies the same
    # correction.
    k0 = F.floor(F.log2(v))
    k = (
        F.when(F.pow(F.lit(2.0), k0 + 1) <= v, k0 + 1)
        .when(F.pow(F.lit(2.0), k0) > v, k0 - 1)
        .otherwise(k0)
    )
    bucket = F.when(v > 0, k).otherwise(F.lit(_NEG_BUCKET)).alias("bucket")
    return (
        df.where(v.isNotNull())
        .groupBy(*keys, bucket)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def loghist_rollup(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Merge finer sketches up to ``keys`` — summation per bucket.
    Lossless: rollup(build(day-grain)) == build(coarse-grain) exactly
    (unit-tested invariant), because the bucket of a value does not
    depend on the grouping."""
    return sketches.groupBy(*keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def loghist_quantiles(
    sketches: DataFrame, keys: list[str], qs: list[float]
) -> DataFrame:
    """Quantile estimates off the sketch table alone: for each q, the
    arithmetic midpoint (1.5·2^b, exact in doubles) of the first
    bucket whose cumulative count reaches q·total.  Values <= 0
    estimate as 0.0.

    Runs on the compact sketch table (two tiny window passes + one
    groupBy), never on the raw data — that is the point."""
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    est = F.when(F.col("bucket") == _NEG_BUCKET, F.lit(0.0)).otherwise(
        F.lit(1.5) * F.pow(F.lit(2.0), F.col("bucket"))
    )
    staged = (
        sketches.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("total", F.sum("cnt").over(w_all))
        .withColumn("est", est)
    )
    aggs = [F.max("total").alias("n")]
    for q in qs:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= F.col("total") * F.lit(q), F.col("est")
                )
            ).alias(f"p{int(round(q * 100))}_est")
        )
    return staged.groupBy(*keys).agg(*aggs)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of an integer column as a (d, bucket, cnt)
    table: depth independent hash rows, width buckets each.  Mergeable
    by per-cell summation (``cms_merge``); point frequency estimates
    never underestimate and overestimate by at most 2·N/width with
    probability 1 − 2^−depth.

    Physical shape: one scan, a depth-× row explode (cheap, column
    exprs only), one partially-aggregated groupBy into depth·width
    cells — a few KB regardless of input size."""
    if depth > len(_CMS_A):
        raise ValueError(f"depth <= {len(_CMS_A)} supported")
    a = F.element_at(F.array([F.lit(x) for x in _CMS_A]), F.col("d") + 1)
    b = F.element_at(F.array([F.lit(x) for x in _CMS_B]), F.col("d") + 1)
    v = F.col("_cms_v")
    return (
        df.select(F.col(value_col).cast("long").alias("_cms_v"))
        .where(v.isNotNull())
        .select(v, F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"))
        .groupBy("d", (((a * v + b) % _CMS_P) % width).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge unioned sketch tables cell-wise — partial sketches built
    per shard/day sum to exactly the one-shot sketch (unit-tested)."""
    return sketches.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Frequency estimate for each candidate value: min over the depth
    hash rows of the cell count.  The sketch side is depth·width rows,
    always broadcast — candidates stream through map-side."""
    a = F.element_at(F.array([F.lit(x) for x in _CMS_A]), F.col("d") + 1)
    b = F.element_at(F.array([F.lit(x) for x in _CMS_B]), F.col("d") + 1)
    v = F.col("_cms_v")
    probes = (
        candidates.withColumn("_cms_v", F.col(value_col).cast("long"))
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"))
        .withColumn("bucket", ((a * v + b) % _CMS_P) % width)
        .drop("_cms_v")
    )
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    group_cols = [c for c in candidates.columns]
    return joined.groupBy(*group_cols).agg(F.min("cnt").alias("cms_est"))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002
# ---------------------------------------------------------------------------

_KMV_P = 1_000_000_007
_KMV_A = 999_883
_KMV_B = 12_345
_KMV_A2 = 999_979
_KMV_B2 = 67_890


def kmv_hash(value: Column) -> Column:
    """Deterministic KMV hash to [0, P): LCG pass then a QUADRATIC
    mix, the same nonlinearity contract as the HLL family above.  A
    linear-only hash is low-discrepancy on consecutive integer ids —
    the k-th smallest of n structured hashes then sits far from its
    uniform expectation k·P/(n+1), and the (k-1)·P/h_k estimator
    overshot 5.7x on the sequential-id fixture (caught by the
    sketch_accuracy_users audit); the h² term breaks the lattice.
    h < P < 2^30·2 keeps h² + A2·h < 2^61, overflow-free in BIGINT
    on both engines."""
    h = (
        F.lit(_KMV_A) * value.cast("bigint") + F.lit(_KMV_B)
    ) % F.lit(_KMV_P)
    return (h * h + F.lit(_KMV_A2) * h + F.lit(_KMV_B2)) % F.lit(_KMV_P)


def kmv_build(
    df: DataFrame, keys: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest DISTINCT hash values
    of ``value_col`` (array<bigint>, ascending) — the mergeable,
    oracle-checkable member of the distinct-count sketch family
    (HLL's estimate is engine-internal; KMV's is closed-form over
    values both engines can reproduce).

    Scale shape: one distinct-reducing keyed aggregate
    ((keys, hash) distinct — map-side combined), then a per-key
    window keeps k rows before the tiny collect_list.  The sketch is
    k longs per group regardless of data size.
    """
    h = kmv_hash(F.col(value_col)).alias("h")
    dist = df.select(*keys, h).where(F.col(value_col).isNotNull()).distinct()
    w = Window.partitionBy(*keys).orderBy(F.col("h").asc())
    kept = dist.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    return kept.groupBy(*keys).agg(
        F.array_sort(F.collect_list("h")).alias("kmv")
    )


# ---------------------------------------------------------------------------
# Oracle-checkable HLL (textbook Flajolet HyperLogLog over a shared
# integer hash family)
# ---------------------------------------------------------------------------
# Spark's builtin hll_sketch_agg (Apache DataSketches) is the production
# choice above, but its binary sketch and estimate are engine-internal —
# un-checkable against a SQL oracle.  This variant IS the same algorithm
# with every step reproducible in any engine:
#   hash   h  = (A·v + B) mod P, mixed through (h² + A2·h + B2) mod P
#               (the mix must be NONLINEAR: a second linear pass is
#               low-discrepancy mod 2^p — too-uniform register spread
#               makes linear counting overestimate by 40%+; the h²
#               term breaks the structure and h < 2^30 keeps h² + A2·h
#               < 2^61, overflow-free in BIGINT on both engines)
#   index  r  = mix mod m          (m = 2^p registers)
#   word   w  = mix div m          (< P/m, i.e. < 2^(30-p))
#   rho(w)    = (30 - p + 1) - bitlength(w)   [w = 0 -> 30 - p + 1]
#   register M_r = max rho over the group     (a plain (keys, reg, mx) TABLE)
# and the closed-form estimate:
#   S   = sum over all m registers of 2^(-M_r)   (missing register -> 2^0)
#   raw = alpha_m · m² / S
#   est = m·ln(m/V) when raw <= 2.5m and V > 0 (linear counting), else raw
# Every 2^(-M) is an exact dyadic double (computed as 1/shiftleft(1,M),
# never pow), so S is EXACT regardless of summation order; ln enters only
# the small-range branch and the output rounds to 6.  The register table
# is the storable partial: merge to any coarser grain by MAX per register
# without rescanning raw data — identical semantics to the binary-sketch
# union, but visible to (and hash-checked against) the DuckDB oracle.

_OHLL_P = 1_073_741_789  # largest prime < 2^30: hash words fill 30 bits
_OHLL_A = 999_883
_OHLL_B = 12_345
_OHLL_A2 = 999_979
_OHLL_B2 = 67_890
OHLL_LOG2M = 8  # m = 256 registers, ~6.5% relative error


def ohll_alpha(m: int) -> float:
    """Flajolet bias-correction constant (m >= 128)."""
    return 0.7213 / (1.0 + 1.079 / m)


def ohll_registers(
    df: DataFrame, keys: list[str], value_col: str, p: int = OHLL_LOG2M
) -> DataFrame:
    """Per-group HLL register table (keys..., reg int, mx int) — the
    mergeable, oracle-checkable partial.  ONE keyed aggregate
    (map-side combined max), <= 2^p rows per group regardless of
    input size."""
    m = 1 << p
    width = 30 - p  # mix < 2^30, word = mix div m < 2^width
    v = F.col(value_col).cast("bigint")
    h = (F.lit(_OHLL_A) * v + F.lit(_OHLL_B)) % F.lit(_OHLL_P)
    mix = (h * h + F.lit(_OHLL_A2) * h + F.lit(_OHLL_B2)) % F.lit(_OHLL_P)
    w = (mix / F.lit(m)).cast("bigint")  # floor div: mix >= 0
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w))
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*keys, (mix % F.lit(m)).cast("int").alias("reg"), rho.alias("_rho"))
        .groupBy(*keys, "reg")
        .agg(F.max("_rho").cast("int").alias("mx"))
    )


def ohll_merge(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Union register tables up to coarser ``keys`` — MAX per register,
    computed from the partials alone (no rescan of raw data)."""
    return registers.groupBy(*keys, "reg").agg(
        F.max("mx").cast("int").alias("mx")
    )


def ohll_estimate(
    registers: DataFrame, keys: list[str], p: int = OHLL_LOG2M
) -> DataFrame:
    """(keys..., v_zero, est_distinct): the closed-form HLL estimate
    off the register table.  2^(-mx) via integer shift (exact dyadic
    doubles — S is order-independent), linear-counting branch for the
    small range, output rounded to 6."""
    m = 1 << p
    alpha = ohll_alpha(m)
    agg = registers.groupBy(*keys).agg(
        F.sum(
            F.lit(1.0)
            / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), mx) AS DOUBLE)")
        ).alias("_s_set"),
        F.count(F.lit(1)).alias("_n_set"),
    )
    v_zero = F.lit(m) - F.col("_n_set")
    s = F.col("_s_set") + v_zero.cast("double")
    raw = F.lit(alpha) * F.lit(float(m * m)) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *keys,
        v_zero.cast("long").alias("v_zero"),
        (F.round(est, 6) + F.lit(0.0)).alias("est_distinct"),
    )


def kmv_merge(sketches: DataFrame, keys: list[str], k: int = 64) -> DataFrame:
    """Union sketches up to coarser ``keys`` — k smallest distinct
    hashes of the union, computed from the SKETCH TABLE only (no
    rescan of raw data; the materialized-rollup pattern)."""
    exploded = sketches.select(*keys, F.explode("kmv").alias("h")).distinct()
    w = Window.partitionBy(*keys).orderBy(F.col("h").asc())
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("h")).alias("kmv"))
    )


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """(…, n_kept, est_distinct): closed-form KMV estimate — exact
    count when the sketch is unsaturated (n < k), else
    (k-1)·P / h_k with h_k the k-th smallest hash (Bar-Yossef 2002;
    E[h_k/P] = k/(n+1)).  Rounded to 6 — identical arithmetic in the
    DuckDB oracle."""
    n = F.size("kmv")
    hk = F.element_at("kmv", k)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(_KMV_P)) / hk.cast("double")
    )
    return sketches.select(
        *[c for c in sketches.columns if c != "kmv"],
        n.cast("long").alias("n_kept"),
        (F.round(est, 6) + F.lit(0.0)).alias("est_distinct"),
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    keys: list[str] | None = None,
    k: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Set-operation estimates from two KMV sketches (Beyer et al.
    2007, "On Synopses for Distinct-Value Estimation Under Multiset
    Operations", public literature): with K the k smallest distinct
    hashes of the UNION of the two sketches and
    ρ = |{h ∈ K : h ∈ A and h ∈ B}| / |K|,

        est_union     = KMV estimate over K
        est_jaccard   = ρ
        est_intersect = ρ · est_union

    When the union sketch is unsaturated (|K| < k) the sketches ARE
    the complete hash sets, so every estimate collapses to the exact
    value — the same exact-below-k contract as ``kmv_estimate``.

    Inputs are sketch tables from ``kmv_build`` (column ``kmv``);
    with ``keys`` they join keyed, without they must be single-row
    and combine via a broadcast.  Everything downstream is
    sketch-sized (k longs per side) — never data-sized.
    """
    keys = keys or []
    ak = a.select(*keys, F.col("kmv").alias("_ka"))
    bk = b.select(*keys, F.col("kmv").alias("_kb"))
    j = (
        ak.join(bk, keys)
        if keys
        else ak.crossJoin(F.broadcast(bk))
    )
    union_k = F.slice(
        F.array_sort(F.array_distinct(F.concat("_ka", "_kb"))), 1, k
    )
    j = j.select(*keys, "_ka", "_kb", union_k.alias("_u"))
    nu = F.size("_u")
    hk = F.element_at("_u", k)
    est_union = F.when(nu < k, nu.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(_KMV_P)) / hk.cast("double")
    )
    n_both = F.size(
        F.array_intersect(F.array_intersect("_u", "_ka"), "_kb")
    )
    rho = n_both.cast("double") / nu.cast("double")
    return j.select(
        *keys,
        nu.cast("long").alias("n_union_kept"),
        n_both.cast("long").alias("n_both_kept"),
        (F.round(est_union, round_to) + F.lit(0.0)).alias("est_union"),
        (F.round(rho * est_union, round_to) + F.lit(0.0)).alias(
            "est_intersect"
        ),
        (F.round(rho, round_to) + F.lit(0.0)).alias("est_jaccard"),
    )
