"""Deterministic sampling / splitting / budgeting for training-data
pipelines (SURVEY.md §2.12 extension surface).

Everything here is HASH-based, not RNG-based: ``df.sample()`` draws
from a per-partition RNG, so results change with partitioning,
retries, and engine — unacceptable for reproducible corpus builds
and unverifiable against an oracle.  A rolling-hash of a stable key
gives sampling that is (a) deterministic across engines and
partitionings, (b) stable under re-runs and late-arriving shards,
(c) pure scan-side column math — no shuffle, no state.

The hash is the engine-wide rolling fingerprint
(functions/textfn.rolling_fingerprint, h*131+c mod 1e9+7) over the
stable id rendered as a string, so DuckDB reproduces every decision
bit-exactly.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import FP_MOD, rolling_fingerprint


HASH_SALT = "mix:"


def hash_bucket(key: Column, buckets: int = 10_000, salt: str = HASH_SALT) -> Column:
    """Stable bucket in [0, buckets) from any key column (rendered as
    string, salt-prefixed, rolling-hash fingerprinted).

    The salt prefix is load-bearing, not optional: a bare 1-3 char
    key folds to a hash below ~2M, so short ids would concentrate in
    the low buckets (every 1-digit id would land in 'test').  The
    prefix guarantees >= 5 fold steps, which saturates the modulus
    and uniformizes the buckets; it also namespaces decisions so
    independent samples of the same corpus can use different salts.
    """
    return rolling_fingerprint(F.concat(F.lit(salt), key.cast("string"))) % buckets


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep each row iff its key's hash bucket falls under its
    stratum's rate — per-stratum downsampling (corpus mixing) that
    every engine and every re-run reproduces exactly.

    ``rates``: stratum value -> keep fraction in [0, 1].
    """
    b = hash_bucket(F.col(key_col), buckets)
    thresh = None
    for value, rate in rates.items():
        cond = F.col(stratum_col) == value
        t = F.lit(int(rate * buckets))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = thresh.otherwise(int(default_rate * buckets))
    return df.where(b < thresh)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    buckets: int = 10_000,
    split_col: str = "split",
) -> DataFrame:
    """Assign a stable split label per key: hash-range partitioning of
    the bucket space (test lowest, then val, rest train).  A key
    lands in the same split forever — across engines, re-runs, and
    dataset growth — which is the property that prevents train/test
    leakage in periodically-rebuilt corpora."""
    b = hash_bucket(F.col(key_col), buckets)
    t_hi = int(test_fraction * buckets)
    v_hi = t_hi + int(val_fraction * buckets)
    label = (
        F.when(b < t_hi, F.lit("test"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(split_col, label)


def token_budget_selection(
    df: DataFrame,
    token_count_col: str,
    priority_cols: Sequence[str],
    budget: int,
    partitions: int | None = None,
) -> DataFrame:
    """Select documents in priority order until the running token sum
    exceeds ``budget`` (the last admitted doc may cross it) — the
    standard "fill the training mix to N tokens" step.

    Physical shape — two-phase distributed prefix sum, NO global
    window (``Window.orderBy`` with no partitionBy funnels every row
    into ONE task in Spark, a wall at 100 TB):

    1. ``repartitionByRange`` on the priority order — an
       order-preserving range exchange, so global order ==
       (partition id, within-partition order).
    2. Per-partition running sums via a window PARTITIONED on
       ``spark_partition_id()`` — every partition computes its local
       prefix sums in parallel.
    3. Per-partition totals (one row per partition — a few hundred
       rows at any scale) get their exclusive prefix sum on a single
       tiny task, then broadcast back as offsets.
    4. running = local running + partition offset; cut at ``budget``.

    ``priority_cols`` must be a total order (include a unique
    tiebreaker) so the running sum is engine-independent.  The result
    is provably identical to the single global window: range
    partitioning never reorders across the total order, and offsets
    are exact sums of everything ordered earlier.
    """
    toks = F.col(token_count_col)
    running = distributed_running_sum(
        df, token_count_col, priority_cols, "running_tokens", partitions
    )
    return running.where(
        (F.col("running_tokens") - toks) < F.lit(budget)
    )


def distributed_running_sum(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    out_col: str = "running",
    partitions: int | None = None,
) -> DataFrame:
    """Global inclusive prefix sum of ``value_col`` in ``order_cols``
    order WITHOUT a global window — the two-phase shape shared by
    :func:`token_budget_selection` and :func:`token_balanced_shards`
    (see the former's docstring for the identity argument):
    order-preserving range exchange → per-partition parallel running
    sums → tiny per-partition-totals prefix (≤ `partitions` rows, one
    task) broadcast back as offsets.  ``order_cols`` must be a total
    order for engine-independent results.
    """
    from pyspark.sql import Window

    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    val = F.col(value_col)
    if partitions is None:
        partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    ranged = df.repartitionByRange(partitions, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    # PIN the sampled partitioning.  The ranged frame is consumed by
    # TWO branches (row-local running sums; the per-partition totals
    # aggregate).  Exchange reuse across branches is an OPTIMIZATION
    # Catalyst may skip (observed skipped under AQE at sf0.1), and
    # each re-execution of repartitionByRange re-SAMPLES its range
    # boundaries (RangePartitioner seeds by RDD id) — so without
    # pinning, `_pid` can mean different partition contents in the
    # two branches and the offsets silently drift (caught by the
    # sf0.1 oracle sweep: +3 579-token jump mid-prefix).  One
    # materialization is the honest cost of an exact distributed
    # prefix sum; on a cluster swap localCheckpoint for
    # persist(MEMORY_AND_DISK) — same trade as the iterative graph
    # ops.
    ranged = ranged.localCheckpoint()
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local_run", F.sum(val).over(w_local))
    # one row per partition; the global window here runs over at most
    # `partitions` rows — a deliberately tiny single task
    totals = ranged.groupBy("_pid").agg(F.sum(val).alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local_run") + F.col("_off"))
        .drop("_pid", "_local_run", "_off")
    )


def token_balanced_shards(
    df: DataFrame,
    token_count_col: str,
    n_shards: int,
    order_cols: Sequence[str],
    partitions: int | None = None,
) -> DataFrame:
    """Cut the corpus (in ``order_cols`` order) into ``n_shards``
    contiguous shards of ≈ equal TOKEN mass — the training-shard
    writer's partitioner.  Row-count sharding wastes accelerator
    steps when document lengths are skewed; token balancing makes
    every shard the same number of optimizer steps.

    Shard of a doc = which k-th of the total token mass its
    EXCLUSIVE running sum falls in: ``least(floor((running - toks) *
    k / total), k - 1)`` — every shard's token sum is within one
    document of total/k, and the assignment is a pure function of
    the order (reproducible on any cluster layout).

    Physical shape: the :func:`distributed_running_sum` two-phase
    prefix sum (no global window) + a 1-row total broadcast; adds
    ``running_tokens`` and ``shard``.  Pair ``order_cols`` with the
    rolling-fingerprint hash for a deterministic pre-shuffle
    (hash order ≈ random order), then write with
    ``partitionBy("shard")``.
    """
    toks = F.col(token_count_col)
    running = distributed_running_sum(
        df, token_count_col, order_cols, "running_tokens", partitions
    )
    # grand total from the INPUT (plain partial-agg scan), not from
    # `running` — avoids dragging the prefix-sum lineage into a
    # 1-row aggregate
    total = df.agg(F.sum(toks).cast("double").alias("_grand"))
    shard = F.least(
        F.floor(
            (F.col("running_tokens") - toks)
            * F.lit(float(n_shards))
            / F.col("_grand")
        ),
        F.lit(n_shards - 1),
    ).cast("int")
    return (
        running.crossJoin(F.broadcast(total))
        .withColumn("shard", shard)
        .drop("_grand")
    )


def epoch_repeat_mix(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    epochs: Mapping[str, float],
    default_epochs: float = 0.0,
    buckets: int = 10_000,
    salt: str = "epoch:",
) -> DataFrame:
    """Fractional-epoch upsampling: materialize each row
    ``floor(e)`` times plus one more iff its hash bucket falls under
    ``frac(e)`` — so a stratum with e=2.5 contributes every doc
    twice and a deterministic half of them a third time.  This is
    the "repeat the high-quality corpus 2.5 epochs" mixing step;
    :func:`stratified_hash_sample` is its e<1 downsampling special
    case, and both compose (same bucket space, different salts).

    Adds ``copy`` (1..n for that row).  Physical shape: a narrow
    per-row ``explode(sequence(...))`` — rows multiply by the epoch
    factor with no shuffle, no join, no driver data; which copy a
    doc gets is a pure function of (salt, key) so re-runs and
    engines agree exactly.

    Fractional-part accuracy is statistical: the rolling-hash
    buckets of short SEQUENTIAL keys equidistribute only past ~1-2k
    keys per stratum (below that, digit-structure runs cluster mod
    the bucket count).  Real corpora clear this by orders of
    magnitude; for tiny strata round the epochs or accept the
    variance.
    """
    e_expr = None
    for value, e in epochs.items():
        cond = F.col(stratum_col) == value
        e_expr = (
            F.when(cond, float(e))
            if e_expr is None
            else e_expr.when(cond, float(e))
        )
    e_expr = e_expr.otherwise(float(default_epochs))
    b = hash_bucket(F.col(key_col), buckets, salt)
    extra = (b < (e_expr - F.floor(e_expr)) * buckets).cast("int")
    n = (F.floor(e_expr).cast("int") + extra).alias("_n")
    # sequence(1, n) with n == 0 is DESCENDING [1, 0], not empty —
    # filter n >= 1 BEFORE exploding (the char_ngrams hazard)
    return (
        df.withColumn("_n", n)
        .where(F.col("_n") >= 1)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(1), F.col("_n")))
        )
        .drop("_n")
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "shuffle:",
) -> DataFrame:
    """Deterministic global pseudo-random shuffle + sharding: every
    row gets a ``shard`` in [0, n_shards) and a dense ``pos`` within
    its shard, both pure functions of (salt, key) — the corpus
    ordering step before training-shard writes.  Hash order is the
    random order: reshuffling with a new ``salt`` is a fresh
    permutation, and re-runs (or incremental corpus rebuilds)
    reproduce the same placement for unchanged keys.

    Physical shape: ONE hash exchange on ``shard`` and a per-shard
    window sort on the fingerprint — shards are uniform by
    construction (rolling-hash buckets), so no shard straggles; at
    scale set ``n_shards`` ≈ the target output file count and write
    with ``partitionBy("shard")``.  No global window, no driver
    data.
    """
    from pyspark.sql import Window

    fp = rolling_fingerprint(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    )
    with_fp = df.withColumn("_fp", fp).withColumn(
        "shard", (F.col("_fp") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_fp", key_col)
    return (
        with_fp.withColumn("pos", F.row_number().over(w))
        .drop("_fp")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    shards: int = 8,
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in id order
    and cut the stream every ``budget`` tokens — each document lands
    in the pack where its first token falls (packs may straddle doc
    boundaries, like training-sequence packing does).

    Returns one row per pack: (shard, pack_id, n_docs, pack_tokens,
    first_id, last_id).

    Scale: a single global running sum would range-partition the whole
    corpus through one sort; instead documents are deterministically
    sharded (id mod ``shards`` — at 100 TB use one shard per output
    writer task, thousands) and packed WITHIN each shard, so the
    window runs per-shard in parallel and the only global op is a
    hash partition on the shard key.  Pack boundaries are then a pure
    function of (shard, id order) — reproducible across engines and
    cluster layouts.
    """
    from pyspark.sql import Window

    ident = F.col(id_col)
    toks = F.col(token_count_col)
    shard = (ident % shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = df.select(ident, toks, shard).withColumn(
        "pack_id",
        F.floor((F.sum(toks).over(w) - toks) / F.lit(budget)),
    )
    return placed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("pack_tokens"),
        F.min(ident).alias("first_id"),
        F.max(ident).alias("last_id"),
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    source_col: str,
    alpha: float = 0.5,
    buckets: int = 10_000,
) -> DataFrame:
    """Temperature-based corpus mixing: keep-rate per source
    proportional to n_source^(alpha-1), normalized so the smallest
    source keeps everything — the standard "flatten the source
    distribution" step (alpha=1 keeps natural proportions, alpha->0
    approaches uniform over sources).

    The rates are computed IN-PLAN from a per-source count aggregate
    (a few rows, broadcast back) — no driver round-trip, no second
    job, and the whole mix stays one declarative query at any corpus
    size.  Row selection reuses the engine's deterministic
    hash-bucket rule, so the sampled corpus is reproducible across
    engines and re-runs.

    alpha=0.5 uses an explicit 1/sqrt(n) weight (IEEE sqrt/divide are
    correctly rounded -> bit-identical across engines); other alphas
    go through pow() whose last-ulp behavior is library-specific —
    fine in production, but pin 0.5 for oracle-checked runs.
    """
    n = F.count(F.lit(1)).alias("n")
    sizes = df.groupBy(source_col).agg(n)
    if alpha == 0.5:
        w = F.lit(1.0) / F.sqrt(F.col("n"))
    else:
        w = F.pow(F.col("n"), F.lit(alpha - 1.0))
    weighted = sizes.select(source_col, w.alias("w"))
    mx = weighted.agg(F.max("w").alias("w_max"))
    th = weighted.crossJoin(F.broadcast(mx)).select(
        source_col,
        F.floor(F.lit(buckets) * F.col("w") / F.col("w_max")).alias("_thresh"),
    )
    b = hash_bucket(F.col(key_col), buckets)
    return (
        df.join(F.broadcast(th), source_col)
        .where(b < F.col("_thresh"))
        .drop("_thresh")
    )


def rebalance_to_target(
    df: DataFrame,
    key_col: str,
    group_col: str,
    targets: Mapping[str, float],
    buckets: int = 10_000,
) -> DataFrame:
    """Downsample over-represented groups so the kept corpus matches
    EXPLICIT target proportions — the fixed-mixture (DoReMi-style
    domain weights) complement of `temperature_mix`, which instead
    transforms the natural distribution.

    Feasible scale ``s = min_g count_g / p_g`` (no upsampling: the
    binding group is kept whole); per-group keep-rate
    ``min(1, s·p_g/count_g)``.  Groups absent from ``targets`` are
    dropped; target groups absent from the corpus renormalize the
    mixture over the groups present.  Selection reuses the salted
    deterministic hash-bucket rule, so the kept set is reproducible
    across engines, partitionings, and re-runs.

    Physical shape: one tiny per-group count aggregate joined to the
    literal target table, a one-row feasible-scale scalar broadcast
    back over it, and ONE broadcast join of the per-group threshold
    onto the corpus — the fact table is scanned once and filtered
    scan-side; no windows, no per-group tasks, rate-based like every
    other sampler here.
    """
    tgt = df.sparkSession.createDataFrame(
        [(g, float(p)) for g, p in targets.items()],
        f"{group_col} string, _p double",
    )
    sizes = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(F.broadcast(tgt), group_col)
    )
    s = sizes.agg(F.min(F.col("_n") / F.col("_p")).alias("_s"))
    # The binding group has _n/_p == _s bit-exactly (_s IS the min of
    # those values), so short-circuit it to the full bucket range: the
    # floor(buckets * _s*_p/_n) round trip can land a hair under 1.0
    # and silently drop ~1/buckets of the group it promised to keep whole.
    th = sizes.crossJoin(F.broadcast(s)).select(
        group_col,
        F.when(
            F.col("_n") / F.col("_p") <= F.col("_s"), F.lit(buckets)
        )
        .otherwise(
            F.floor(
                F.lit(float(buckets))
                * F.least(F.lit(1.0), F.col("_s") * F.col("_p") / F.col("_n"))
            )
        )
        .alias("_thresh"),
    )
    b = hash_bucket(F.col(key_col), buckets)
    return (
        df.join(F.broadcast(th), group_col)
        .where(b < F.col("_thresh"))
        .drop("_thresh")
    )


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
    spread: int = 64,
    salt: str = "wsample:",
    priority_col: str = "sample_priority",
) -> DataFrame:
    """Deterministic weighted sample without replacement: keep the k
    rows (per stratum) with the highest Efraimidis–Spirakis priority
    ``u^(1/w)``, where u is derived from the rolling-hash fingerprint
    of the key instead of an RNG.  Inclusion probability is
    proportional to ``weight_col`` (the A-ES reservoir guarantee),
    yet every engine, partitioning, and re-run selects the identical
    rows — the reproducibility property RNG reservoirs lack.

    We rank on ``ln(u)/w`` (monotone in u^(1/w), cheaper, and better
    float behavior near u→1); ties break on the key, so selection is
    total-ordered.  The reported priority is rounded to 6 for
    engine-stable display.

    Scale shape: a single ``row_number() OVER (PARTITION BY stratum)``
    puts an entire stratum in one task — a skew wall at 100 TB.  This
    runs the exact two-phase decomposition instead: local top-k per
    (stratum, fp%%spread) shard, then global top-k over the
    ≤ spread·k survivors per stratum.  Phase-1 partitions are
    bounded, phase 2 sees k·spread rows per stratum — both trivially
    executor-sized; the result set is provably identical to the
    one-phase window (global top-k ⊆ union of shard top-ks).
    """
    from pyspark.sql import Window

    key = F.col(key_col)
    fp = rolling_fingerprint(F.concat(F.lit(salt), key.cast("string")))
    # the modulus rolling_fingerprint actually reduces by — imported,
    # not repeated, so u stays in (0, 1) if FP_MOD ever changes
    u = (fp.cast("double") + F.lit(0.5)) / F.lit(float(FP_MOD))
    w = F.col(weight_col).cast("double")
    # A-ES requires w > 0: w == 0 gives pr = -Inf (sorts last but
    # poisons the emitted priority) and w < 0 gives pr > 0 — sampled
    # FIRST, the opposite of its meaning.  Both are the w→0⁻/0⁺
    # boundary of the round-9 magnitude sweep: drop them before
    # ranking (a zero-weight row is "never sampled" in the limit;
    # negative/NULL weight is undefined) so every emitted priority is
    # finite.
    df = df.where(F.col(weight_col).cast("double") > 0)
    pr = F.log(u) / w  # < 0; larger (closer to 0) = more likely kept

    strata = [stratum_col] if stratum_col else []
    staged = df.withColumn("_pr", pr).withColumn(
        "_shard", (fp % F.lit(spread)).cast("int")
    )
    w1 = Window.partitionBy(*strata, "_shard").orderBy(
        F.desc("_pr"), key
    )
    local = (
        staged.withColumn("_rk", F.row_number().over(w1))
        .where(F.col("_rk") <= k)
        .drop("_rk", "_shard")
    )
    w2 = Window.partitionBy(*strata).orderBy(F.desc("_pr"), key)
    return (
        local.withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= k)
        .drop("_rk")
        .withColumn(priority_col, F.round(F.col("_pr"), 6))
        .drop("_pr")
    )


def negative_samples(
    df: DataFrame,
    key_col: str,
    k: int,
    salt: str = "negs:",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive
    training: each key draws ``k`` pseudo-random OTHER keys from the
    corpus — no RNG, so re-runs, retries, and the oracle reproduce
    the same pairs (the same discipline as every sampler here).

    Construction: keys get a dense global position in fingerprint
    order (hash order = random order) via the shared two-phase
    :func:`distributed_running_sum` — no global window.  Draw ``i``
    of ``k`` for key d jumps to position
    ``(pos(d) + 1 + h(d, i) mod (n-1)) mod n``: the offset lies in
    [1, n-1], so a key can NEVER draw itself, and the join back from
    target position to key is an equi-join on the dense rank.  Draws
    are with replacement ACROSS i (two draws of one key may coincide
    — at corpus scale collisions are ~k²/n and harmless for
    contrastive loss).

    Physical shape: rank assignment (one range exchange + per-shard
    window + broadcast offsets), a k-way narrow explode, and ONE
    keyed equi-join on position.  Returns
    ``(key_col, neg_rank, neg_<key_col>)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    fp = rolling_fingerprint(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    ranked = distributed_running_sum(
        df.select(key_col).withColumn("_nfp", fp).withColumn("_one", F.lit(1)),
        "_one",
        ["_nfp", key_col],
        out_col="_rank",
    ).select(key_col, (F.col("_rank") - 1).alias("_pos"))
    n_row = ranked.agg(F.count(F.lit(1)).alias("_n"))
    probes = (
        ranked.crossJoin(F.broadcast(n_row))
        .select(
            key_col,
            "_pos",
            "_n",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_rank"),
        )
        .withColumn(
            "_h",
            rolling_fingerprint(
                F.concat(
                    F.lit(salt + "p:"),
                    F.col(key_col).cast("string"),
                    F.lit(":"),
                    F.col("neg_rank").cast("string"),
                )
            ),
        )
        .select(
            key_col,
            F.col("neg_rank").cast("long").alias("neg_rank"),
            # n == 1 would be modulo-by-zero → NULL (non-ANSI) → silently
            # empty join; raise instead.  The guard lives inside the hot
            # expression so column pruning cannot drop it.
            (
                (
                    F.col("_pos")
                    + 1
                    + F.col("_h")
                    % F.when(F.col("_n") >= 2, F.col("_n") - 1).otherwise(
                        F.raise_error(
                            F.lit(
                                "negative_samples requires >= 2 distinct keys"
                            )
                        ).cast("long")
                    )
                )
                % F.col("_n")
            ).alias("_tgt"),
        )
    )
    targets = ranked.select(
        F.col(key_col).alias(f"neg_{key_col}"), F.col("_pos").alias("_tgt")
    )
    return probes.join(targets, "_tgt").select(
        key_col, "neg_rank", f"neg_{key_col}"
    )


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int,
    salt: str = "kfold:",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: ``fold`` in
    [0, k) from the stable key hash — folds are uniform, disjoint by
    construction, reproducible across engines/re-runs, and STABLE
    under corpus growth (a new doc lands in one fold without moving
    any existing doc — the property random splits lack and leak-free
    evaluation needs).  Train set for fold i = ``fold != i``; pure
    scan-side column math, no shuffle.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    return df.withColumn("fold", hash_bucket(F.col(key_col), k, salt))


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    n_max: int,
    order_col: str,
    ascending: bool = False,
    tiebreak_col: str | None = None,
    spread: int = 64,
    rank_col: str = "group_rank",
) -> DataFrame:
    """Per-group quota: keep at most ``n_max`` rows of each group,
    best-first by ``order_col`` (desc unless ``ascending``) with a
    total-order tiebreak.  This is the corpus-curation "domain cap"
    (FineWeb/RefinedWeb cap documents per registered domain so no
    single crawl source dominates the mixture) generalized to any
    quota: N products per supplier, N events per user, ...

    Exact two-phase shard top-k, the same decomposition as
    ``weighted_hash_sample``: phase 1 ranks within (group, shard)
    where shard = fingerprint(tiebreak) % ``spread`` and keeps
    ``n_max`` per shard; phase 2 re-ranks the ≤ spread·n_max
    survivors per group.  A single hot group never lands in one task
    with its full row set — the one-window ``row_number() OVER
    (PARTITION BY group)`` skew wall this replaces.  Result is
    provably identical (global top-n ⊆ union of shard top-ns).

    Returns the capped rows with ``rank_col`` (1 = best in group).
    """
    from pyspark.sql import Window

    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")
    tb = tiebreak_col or order_col
    direction = F.asc(order_col) if ascending else F.desc(order_col)
    fp = rolling_fingerprint(
        F.concat(F.lit("cap:"), F.col(tb).cast("string"))
    )
    staged = df.withColumn("_shard", (fp % F.lit(spread)).cast("int"))
    w1 = Window.partitionBy(*group_cols, "_shard").orderBy(
        direction, F.asc(tb)
    )
    local = (
        staged.withColumn("_rk", F.row_number().over(w1))
        .where(F.col("_rk") <= n_max)
        .drop("_rk", "_shard")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(direction, F.asc(tb))
    return (
        local.withColumn(rank_col, F.row_number().over(w2))
        .where(F.col(rank_col) <= n_max)
    )


def waterfill_allocate(
    shares: DataFrame,
    key_cols: Sequence[str],
    supply_col: str = "supply",
    share_col: str = "share",
    budget_col: str = "budget",
) -> DataFrame:
    """Token-budget allocation across sources as a deterministic
    WATERFILL — the mixture-weight solver between a temperature/
    configured prior and a physical corpus: each source i has a token
    supply s_i and a target share p_i of the global budget B; the
    solver allocates a_i = min(s_i, p_i·λ) with the waterline λ
    chosen so Σ a_i = min(B, Σ s_i).  Sources whose supply runs out
    below the waterline are CAPPED at their supply and their unmet
    demand redistributes to the rest pro rata — the classic
    capped-proportional fill (power waterfilling / progressive
    filling in the networking literature).

    Solved in ONE sorted-prefix pass, no iteration: sort sources by
    saturation ratio r_i = s_i / p_i (the waterline at which source i
    runs dry).  The optimal capped set is a prefix of that order;
    row i is capped iff r_i ≤ (B − S_{i-1}) / (P − P_{i-1}) with
    S/P prefix sums of supply/share over the sorted order (a running
    min-AND guards the theoretical prefix property numerically).
    λ = (B − S*) / (P − P*) over the capped totals.

    ``shares``: one row per source carrying key_cols, supply_col
    (double/long), share_col (positive double), budget_col (the SAME
    global budget on every row).  The frame is #sources-sized — the
    global windows here run over k rows, never the corpus (the corpus
    aggregation producing supplies is the caller's keyed aggregate).

    Returns key_cols + (supply, share, alloc, capped, waterline);
    alloc sums to min(B, Σ supply) up to float rounding.
    """
    from pyspark.sql import Window

    keys = [F.col(k) for k in key_cols]
    r = F.col(supply_col).cast("double") / F.col(share_col).cast("double")
    base = shares.withColumn("_r", r)
    w = Window.orderBy(F.col("_r"), *keys)
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    total = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sup = F.col(supply_col).cast("double")
    shr = F.col(share_col).cast("double")
    base = base.select(
        "*",
        F.coalesce(F.sum(sup).over(before), F.lit(0.0)).alias("_S"),
        F.coalesce(F.sum(shr).over(before), F.lit(0.0)).alias("_P"),
        F.sum(shr).over(total).alias("_Ptot"),
    )
    # capped iff this source runs dry below the waterline implied by
    # capping everything before it (cross-multiplied: share weights
    # are positive, so the inequality direction is stable)
    flag = (
        F.col("_r") * (F.col("_Ptot") - F.col("_P"))
        <= F.col(budget_col).cast("double") - F.col("_S")
    ).cast("int")
    base = base.withColumn("_capped", F.min(flag).over(
        Window.orderBy(F.col("_r"), *keys).rowsBetween(
            Window.unboundedPreceding, 0
        )
    ) == 1)
    # full-frame totals over the SAME (r, keys) order as the prefix
    # sums: float accumulation order is part of the contract (the
    # DuckDB oracle pins the identical ORDER BY), and an unordered
    # window would sum in partition-arbitrary order
    agg_w = Window.orderBy(F.col("_r"), *keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s_star = F.sum(F.when(F.col("_capped"), sup).otherwise(0.0)).over(agg_w)
    p_star = F.sum(F.when(F.col("_capped"), shr).otherwise(0.0)).over(agg_w)
    lam = F.when(
        F.col("_Ptot") - p_star > 0.0,
        (F.col(budget_col).cast("double") - s_star)
        / (F.col("_Ptot") - p_star),
    ).otherwise(F.lit(0.0))
    alloc = F.when(F.col("_capped"), sup).otherwise(shr * lam)
    return base.select(
        *key_cols,
        F.col(supply_col),
        F.col(share_col),
        alloc.alias("alloc"),
        F.col("_capped").alias("capped"),
        lam.alias("waterline"),
    )
