"""K-Means operators (reference W6/A4/A5 pipeline, SURVEY.md §2.9).

Batch surface: ``label_centroids`` + ``assign`` reproduce the
predict/distance stage (``ClusterAnalyser.scala:41-45``) as pure
DataFrame ops — centroids are a tiny DataFrame broadcast into a
nested-loop argmin, all codegen'd.

Streaming surface: ``StreamingKMeans`` implements the published
mini-batch update rule the reference gets from Spark 1.6 MLlib
(``ClusterAnalyser.scala:15-19,33``):

    c' = (c * n * a + x_sum * m) / (n * a + m)
    n' = n * a + m

with decay factor ``a``, per-batch cluster sums ``x_sum`` (m points).
Model state is tiny (k x dim) and driver-held, exactly like the
reference's ``latestModel``; each batch does one distributed
assignment + one groupBy — no collect of raw points.  The reference
trains on a batch *then* predicts the same batch with the updated
model; ``update_and_assign`` replicates that order.
"""

from __future__ import annotations

import contextlib
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@contextlib.contextmanager
def _model_sized_shuffles(spark):
    """Pin shuffle width to 1 and switch AQE off for a block whose
    only shuffles are MODEL-sized (bounded at k or k x dim grouped
    rows — set by the model, not the data; guide §2.2).  One reduce
    partition is scale-correct at any input size because map-side
    partial aggregation bounds what reaches it at (#map tasks) x k
    (x dim) partial rows, and AQE cannot improve a plan that is
    already one 1-partition shuffle — its per-stage re-optimization
    was pure driver overhead here (measured ~1 s/round on the Lloyd
    loop).  Same set/restore pattern as
    streaming/runner.py::replay_partitions."""
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        if int(prev_parts) > 1:
            spark.conf.set("spark.sql.shuffle.partitions", "1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)

from ..functions.vector import (
    euclidean,
    euclidean_sql,
    euclidean_unrolled,
    euclidean_unrolled_sql,
)

# Unroll the fixed-width distance only while the generated code stays
# compilable: measured crossover — dim=2 unrolled ~2x faster (HOF
# interpretation dominates), dim=64 unrolled ~2x SLOWER (Janino
# fallback on the k-times-repeated tree).
_UNROLL_MAX_DIM = 16


def assign(
    points: DataFrame,
    centroids: DataFrame,
    vec_col: str = "point",
    centroid_vec_col: str = "centroid",
    centroid_id_col: str = "prediction",
    dim: int | None = None,
) -> DataFrame:
    """Nearest-centroid assignment: adds prediction, centroid,
    distance columns.

    Physical shape: the k centroids collapse into ONE array row
    (collect_list) broadcast onto every point; the argmin is a
    scan-side fold over that array — no shuffle, no per-row synthetic
    id, no join-back.  (An earlier formulation keyed an argmin
    groupBy on monotonically_increasing_id(); nondeterministic ids
    evaluated in two plan branches silently mis-join once the scan
    is multi-partition — never key on nondeterministic ids.)

    Cost: exactly k distance evaluations per point (one transform
    over the centroid array, materialized once), then an O(k) scalar
    argmin — array_position(d, array_min(d)) — whose first-occurrence
    semantics give the tiebreak: lowest index of the id-sorted array
    = lowest centroid id, matching the oracle's ``row_number() ORDER
    BY dist, prediction``.

    ``dim``: when the vector width is statically known AND small
    (<= _UNROLL_MAX_DIM), the per-centroid distance uses the UNROLLED
    codegen form (functions/vector.py::euclidean_unrolled —
    bit-identical, but compiled instead of the interpreted HOF fold,
    which costs ~1 s per 20k-row batch at k=3 on the streaming
    replay hot path).  Wide vectors keep the fold: a 64-wide unroll
    inside the k-element transform lambda blows past Janino's
    codegen budget and falls back to interpreted eval of a huge tree
    (measured ~2x SLOWER than the fold at dim=64) — unrolling only
    pays while the expression stays compilable.

    ``centroids`` may be a DataFrame (the general path: agg to one
    array row, broadcast) OR a driver-side sequence of (id, vector)
    pairs — the streaming-model fast path: k*dim literal doubles
    inline in the projection, which deletes the aggregate subtree,
    the broadcast exchange, AND its per-batch build sub-job (the
    dominant fixed cost of a tiny foreachBatch job).  Values and
    argmin tiebreak are identical either way.
    """
    unroll = dim is not None and dim <= _UNROLL_MAX_DIM
    if not isinstance(centroids, DataFrame):
        # literal path: tiny (k x dim) constant — safe as a literal
        # (the F.lit-per-row cost note applies to KB-sized literals,
        # not 6 doubles); sorted by id to keep the argmin tiebreak.
        # Built as ONE SQL string, not k*dim nested F.lit Columns:
        # each Column node costs a Py4J round-trip at DataFrame build
        # time (k=8 x dim=64 = 512 round-trips ~ seconds per build,
        # and the driver/bench rebuild the frame per run).  repr() of
        # a Python float is the shortest exact decimal and Java's
        # Double.parseDouble is correctly rounded, so the 'D'-suffixed
        # literal reproduces the identical double bit-for-bit.
        # r13: the WHOLE three-stage chain is selectExpr SQL strings —
        # this runs once per micro-batch on the streaming hot paths
        # and per round in lloyd/minibatch loops, where the ~40 Py4J
        # Column constructions per build were the measured dominant
        # cost (~0.1 s/batch); the parsed expression tree, and so the
        # doubles and the argmin tiebreak, are identical.
        cents_sql = "array({})".format(
            ", ".join(
                "named_struct('id', {}, 'vec', array({}))".format(
                    int(i), ", ".join(f"{float(x)!r}D" for x in vec)
                )
                for i, vec in sorted(centroids)
            )
        )
        dist_sql = (
            euclidean_unrolled_sql(f"`{vec_col}`", "c.vec", dim)
            if unroll
            else euclidean_sql(f"`{vec_col}`", "c.vec")
        )
        cols = [f"`{c}`" for c in points.columns]
        with_d = points.selectExpr(
            *cols,
            f"{cents_sql} AS _cents",
            f"transform({cents_sql}, c -> {dist_sql}) AS _d",
        )
        with_best = with_d.selectExpr(
            *cols,
            "element_at(_cents, CAST(array_position(_d, array_min(_d))"
            " AS INT)) AS _b",
            "array_min(_d) AS distance",
        )
        return with_best.selectExpr(
            *cols,
            "_b.id AS prediction",
            "_b.vec AS centroid",
            "distance",
        )

    dist = (
        (lambda p, c: euclidean_unrolled(p, c, dim))
        if unroll
        else euclidean
    )
    cents = centroids.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(centroid_id_col).alias("id"),
                    F.col(centroid_vec_col).alias("vec"),
                )
            )
        ).alias("_cents")
    )
    base = points.crossJoin(F.broadcast(cents))
    cents_col = F.col("_cents")
    with_d = base.select(
        *points.columns,
        cents_col.alias("_cents"),
        F.transform(
            cents_col, lambda c: dist(F.col(vec_col), c["vec"])
        ).alias("_d"),
    )
    pos = F.array_position(F.col("_d"), F.array_min(F.col("_d"))).cast("int")
    with_best = with_d.select(
        *points.columns,
        F.element_at("_cents", pos).alias("_b"),
        F.array_min(F.col("_d")).alias("distance"),
    )
    return with_best.select(
        *points.columns,
        F.col("_b")["id"].alias("prediction"),
        F.col("_b")["vec"].alias("centroid"),
        "distance",
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int | None = None,
) -> DataFrame:
    """Per-label dimension-wise mean vectors -> (prediction, centroid).

    The deterministic centroid source for oracle-checked assignment
    (posexplode + avg + re-assemble; one shuffle on (label, dim)).
    ``round_digits`` pins the means so downstream distance math is
    bit-reproducible across engines despite AVG's order-dependence.
    """
    exploded = df.select(
        F.col(label_col).alias("prediction"),
        F.posexplode(F.col(vec_col)).alias("d", "x"),
    )
    m = F.avg(F.col("x").cast("double"))
    if round_digits is not None:
        m = F.round(m, round_digits)
    means = exploded.groupBy("prediction", "d").agg(m.alias("m"))
    return (
        means.groupBy("prediction")
        .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("_dm"))
        .select(
            "prediction",
            F.transform(F.col("_dm"), lambda s: s["m"]).alias("centroid"),
        )
    )


class StreamingKMeans:
    """Driver-held streaming K-Means with decay (reference W6 parity).

    Usage (inside foreachBatch or over any sequence of batch DFs):

        model = StreamingKMeans(k=3, dim=2, decay=1.0, seed=42)
        scored = model.update_and_assign(batch_df, vec_col="point")

    The model state is a plain list of (count, centroid) — O(k*dim)
    on the driver, like the reference's ``latestModel``.  All heavy
    work (assignment + per-cluster sums) is distributed.
    """

    def __init__(
        self,
        k: int,
        dim: int,
        decay: float = 1.0,
        seed: int = 42,
        round_state: int | None = None,
    ):
        """``round_state``: round every centroid coordinate to this
        many decimals after each batch update.  Cross-engine float
        summation drift (Spark's partial-agg order vs a serial
        oracle) otherwise compounds batch over batch; rounding the
        O(k·dim) state resets it each round, making the whole run
        hash-reproducible (the avg-round-9 convention of the batch
        Lloyd oracle, applied to the streaming update rule)."""
        self.k, self.dim, self.decay = k, dim, decay
        self.round_state = round_state
        self._seed = seed
        # Deterministic "random" init: small LCG, no numpy dependency
        state = seed & 0x7FFFFFFF or 1
        def rnd():
            nonlocal state
            state = (1103515245 * state + 12345) % (1 << 31)
            return state / float(1 << 31) - 0.5
        self.centroids: list[list[float]] = [
            [rnd() for _ in range(dim)] for _ in range(k)
        ]
        self.weights: list[float] = [0.0] * k

    def _centroid_df(self, spark) -> DataFrame:
        rows = [(i, [float(x) for x in c]) for i, c in enumerate(self.centroids)]
        return spark.createDataFrame(rows, "prediction int, centroid array<double>")

    def _centroid_pairs(self) -> list:
        """Driver-held state as (id, vector) pairs — assign()'s
        literal fast path (no per-batch broadcast build)."""
        return [(i, [float(x) for x in c]) for i, c in enumerate(self.centroids)]

    def _maybe_seed_from_batch(self, batch: DataFrame, vec_col: str) -> None:
        """First-batch centroid seeding: k distinct points in a
        deterministic order.  Random init concentrated near the origin
        (what the reference inherits from MLlib's dim=2 random init,
        ClusterAnalyser.scala:19) strands empty clusters on separated
        data; seeding from data is the standard fix and keeps runs
        reproducible."""
        if any(w > 0 for w in self.weights):
            return
        # evenly-spaced ranks over the lexicographic order spread the
        # seeds across the data's extent (all-smallest would collapse
        # every seed into one region); one fused job (_spread_seeds)
        seeds = _spread_seeds(
            batch.select(F.col(vec_col).alias("p")).distinct(), "p", self.k
        )
        for i, c in enumerate(seeds):
            self.centroids[i] = c

    def update(self, batch: DataFrame, vec_col: str = "point") -> None:
        """One mini-batch update: distributed assign + per-cluster
        sum/count, then the O(k*dim) driver-side rule."""
        spark = batch.sparkSession
        self._maybe_seed_from_batch(batch, vec_col)
        assigned = assign(batch.select(F.col(vec_col).alias("point")),
                          self._centroid_pairs(), vec_col="point",
                          dim=self.dim)
        # k-row reduce over a shuffle-free argmin: model-sized (r14)
        with _model_sized_shuffles(spark):
            sums = (
                assigned.select("prediction", "point")
                .groupBy("prediction")
                .agg(
                    F.count(F.lit(1)).cast("double").alias("m"),
                    *[
                        F.sum(F.element_at("point", d + 1)).alias(f"s{d}")
                        for d in range(self.dim)
                    ],
                )
            ).collect()  # k rows — driver state update only
        for row in sums:
            i = row["prediction"]
            m = row["m"]
            n = self.weights[i] * self.decay
            denom = n + m
            if denom <= 0:
                continue
            self.centroids[i] = [
                (self.centroids[i][d] * n + row[f"s{d}"]) / denom
                for d in range(self.dim)
            ]
            if self.round_state is not None:
                self.centroids[i] = [
                    round(x, self.round_state) for x in self.centroids[i]
                ]
            self.weights[i] = denom
        # decay clusters that saw no data this batch
        seen = {row["prediction"] for row in sums}
        for i in range(self.k):
            if i not in seen:
                self.weights[i] *= self.decay

    def update_and_assign(self, batch: DataFrame, vec_col: str = "point") -> DataFrame:
        """Train on the batch, then predict the same batch with the
        *updated* model — the reference's trainOn-then-predict order
        (ClusterAnalyser.scala:33,41)."""
        self.update(batch, vec_col)
        return assign(
            batch,
            self._centroid_pairs(),
            vec_col=vec_col,
            dim=self.dim,
        )

    # -- restart fault tolerance -------------------------------------
    #
    # Structured Streaming checkpoints SOURCE offsets, not this
    # driver-held model: after a crash, foreachBatch re-delivers the
    # uncommitted batch to a process whose model is back at __init__.
    # These two methods close that gap with the standard foreachBatch
    # state-versioning pattern: snapshot the O(k*dim) post-update
    # state per batch_id, and on every batch entry roll the model to
    # exactly the post-(batch_id - 1) state — a replayed batch then
    # recomputes the identical update, and a fresh process resumes as
    # if never killed.  Snapshots are tiny JSON files written
    # atomically (tmp + os.replace); at 10^3 batches this is a few
    # hundred KB — prune old ids outside the engine if it matters.

    _cursor: int | None = None

    def _state_path(self, state_dir: str, batch_id: int) -> str:
        import os

        return os.path.join(state_dir, f"b{batch_id}.json")

    def snapshot(
        self, state_dir: str, batch_id: int, keep_last: int | None = None
    ) -> None:
        """Atomically persist post-``batch_id`` model state.  Call as
        the LAST step of the foreachBatch body (after the sink write:
        a crash in between replays the batch against the prior
        snapshot, and an idempotent sink absorbs the rewrite).

        ``keep_last``: retain only the newest ``keep_last`` snapshots,
        pruned AFTER the new one is committed, with a hard floor of
        TWO retained files regardless of the requested value.  The
        floor is what the restart path actually needs: a crash after
        snapshot(N) but before the sink/offset commit replays batch N,
        whose align() must load snapshot b(N-1) — keep_last=1 would
        have pruned exactly that file the moment b(N) was written,
        and align() would silently reset to pristine __init__ state
        (round-7 ADVICE finding; the model diverges).  None = keep
        everything (a long-running stream should pass a small number;
        each snapshot is O(k*dim) bytes)."""
        import json as _json
        import os
        import re as _re

        os.makedirs(state_dir, exist_ok=True)
        tmp = self._state_path(state_dir, batch_id) + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(
                {"centroids": self.centroids, "weights": self.weights}, fh
            )
        os.replace(tmp, self._state_path(state_dir, batch_id))
        self._cursor = batch_id
        if keep_last is not None and keep_last >= 1:
            ids = sorted(
                int(m.group(1))
                for f in os.listdir(state_dir)
                if (m := _re.fullmatch(r"b(-?\d+)\.json", f))
            )
            # floor of 2: replaying the uncommitted batch N needs
            # b(N-1), which keep_last=1 would prune (see docstring)
            for old in ids[:-max(keep_last, 2)]:
                os.remove(self._state_path(state_dir, old))

    def align(self, state_dir: str, batch_id: int) -> None:
        """Roll the model to the exact post-(``batch_id`` - 1) state
        before processing ``batch_id``.  No-op when this process just
        completed batch_id - 1 (the common sequential case); otherwise
        load the snapshot (restart/replay), or reset to the pristine
        __init__ state when no prior snapshot exists (first batch)."""
        import json as _json
        import os

        if self._cursor == batch_id - 1:
            return
        path = self._state_path(state_dir, batch_id - 1)
        if os.path.exists(path):
            with open(path) as fh:
                st = _json.load(fh)
            self.centroids = [[float(x) for x in c] for c in st["centroids"]]
            self.weights = [float(w) for w in st["weights"]]
        else:
            # nothing committed yet: replay of the very first batch
            fresh = StreamingKMeans(
                self.k, self.dim, self.decay, self._seed, self.round_state
            )
            self.centroids, self.weights = fresh.centroids, fresh.weights
        self._cursor = batch_id - 1

    def exactly_once_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        state_dir: str,
        vec_col: str = "point",
    ) -> DataFrame:
        """align -> train-then-predict, for use inside foreachBatch.
        Pair with an idempotent per-batch sink and call
        :meth:`snapshot` after the sink write."""
        self.align(state_dir, batch_id)
        return self.update_and_assign(batch, vec_col)


def minibatch_kmeans(
    df: DataFrame,
    id_col: str,
    order_cols: list[str],
    vec_col: str = "point",
    k: int = 3,
    dim: int = 2,
    n_batches: int = 5,
    decay: float = 1.0,
    round_state: int | None = 9,
) -> DataFrame:
    """Deterministic mini-batch K-Means twin of the streaming model
    (reference W6, ClusterAnalyser.scala:15-43): slice the input into
    ``n_batches`` sequential mini-batches by ntile over a TOTAL order
    (``order_cols`` must be a unique key), then replay the exact
    StreamingKMeans train-then-predict loop batch by batch.

    Purpose: a hash-checkable oracle for the streaming update rule.
    The production path (streaming_kmeans_outliers) consumes real
    micro-batches whose composition the driver picks at runtime; this
    twin pins batch composition with SQL-expressible arithmetic
    (ntile) so a DuckDB oracle can unroll the n_batches update rounds
    as a CTE chain — the lloyd_kmeans oracle pattern applied to the
    streaming rule (seed from batch 1, per-batch weighted centroid
    update with decay, predict each batch with the just-updated
    model).

    Scale note: the global ntile is ONE total-order sort — this is a
    VERIFICATION twin, not the production path (real batching comes
    from the stream source; no global sort exists there).  The sliced
    frame is localCheckpoint-ed once so the ``2 * n_batches`` passes
    (update + predict per batch) read materialized blocks, not
    n_batches re-sorts.

    Returns (id_col, batch int, prediction int, distance double
    rounded 6).
    """
    from pyspark.sql import Window

    sliced = df.select(
        F.col(id_col),
        F.col(vec_col).alias("point"),
        F.ntile(n_batches)
        .over(Window.orderBy(*order_cols))
        .alias("b"),
        # lazy: batch 1's update action materializes the slices; the
        # remaining 2*n_batches-1 passes read the cached blocks
    ).localCheckpoint(eager=False)

    model = StreamingKMeans(
        k=k, dim=dim, decay=decay, round_state=round_state
    )
    outs: list[DataFrame] = []
    for t in range(1, n_batches + 1):
        batch = sliced.where(F.col("b") == t)
        scored = model.update_and_assign(batch, vec_col="point")
        outs.append(
            scored.select(
                F.col(id_col),
                F.lit(t).alias("batch"),
                "prediction",
                (F.round("distance", 6) + F.lit(0.0)).alias("distance"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def _spread_seeds(distinct, vec_col: str, k: int) -> list[list[float]]:
    """Evenly-spaced seed vectors over the lexicographic order of the
    DISTINCT vectors, selected in ONE job (round-9: was count +
    collect = two): rank and total-count share the same unpartitioned
    window task, and the k index expressions round(i*(n-1)/(kk-1))+1
    are evaluated per-row from the windowed n.  Rounding contract:
    F.round is HALF_UP, and .5 ties ARE reachable whenever k-1 is
    even (k=3: mid rank hits .5 for any n ≡ 2 mod 4; only the odd
    k-1 Lloyd case is tie-free).  HALF_UP is therefore the pinned
    convention on BOTH sides — every kmeans DuckDB oracle computes
    the same ranks with DuckDB round() (half-away-from-zero, equal to
    HALF_UP for these positive arguments); see
    _minibatch_kmeans_parts and
    tests/test_properties.py::test_minibatch_seed_midrank_tie_parity."""
    from pyspark.sql import Window

    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = distinct.select(
        F.col(vec_col).alias("_p"),
        F.row_number().over(Window.orderBy(vec_col)).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    n_col, rn = F.col("n"), F.col("rn")
    kk_col = F.least(F.lit(k), n_col)
    is_seed = (kk_col == 1) & (rn == 1)
    for i in range(k):
        # kk == 1 rows do evaluate (i*(n-1))/(kk-1) = x/0.0 — safe
        # because DOUBLE division never errors under ANSI (yields
        # NaN/Inf), and round(NaN)+1 / round(Inf)+1 never equals a
        # finite rn; such rows are seeded by the (kk==1 & rn==1) arm
        is_seed = is_seed | (
            (F.lit(i) < kk_col)
            & (kk_col > 1)
            & (rn == F.round(F.lit(i) * (n_col - 1) / (kk_col - 1)) + 1)
        )
    rows = ranked.where(is_seed).orderBy("rn").collect()
    return [[float(x) for x in r["_p"]] for r in rows]


def lloyd_kmeans(
    df: DataFrame,
    vec_col: str,
    k: int,
    iterations: int = 5,
    round_digits: int = 9,
    dim: int | None = None,
    as_pairs: bool = False,
) -> DataFrame | list:
    """Batch Lloyd's K-Means: deterministic data-spread seeding, then
    ``iterations`` rounds of (distributed assign -> dimension-wise
    mean recompute).  Returns the final (prediction, centroid) table.

    Scale shape: per iteration one broadcast argmin (shuffle-free,
    see ``assign``) + one (prediction, dim) aggregation shuffle of
    posexploded points; ONLY the k x dim centroid table ever reaches
    the driver.  Centroid means are rounded each round so results are
    reproducible regardless of partitioning (AVG order-dependence).

    Determinism: seeding takes k evenly-spaced rows of the distinct
    lexicographically-sorted vectors (same spread trick as
    StreamingKMeans seeding); everything downstream is a pure
    function of those seeds.

    ``dim``: pass the static vector width to run each round's argmin
    through assign()'s literal-centroid + unrolled-distance fast path
    (bit-identical; see assign) — the centroids are driver-held lists
    between rounds anyway.

    ``as_pairs``: return the final centroids as the driver-side
    ``[(id, vector), ...]`` list instead of a DataFrame.  The loop
    holds them driver-side anyway; handing them straight to
    ``assign()``'s literal fast path deletes the final assignment's
    collect_list aggregate + broadcast-exchange build sub-job
    (measured 3x on the sf0.1 embeddings assignment) with identical
    doubles.
    """
    spark = df.sparkSession
    pts = df.select(F.col(vec_col).alias("point"))
    seeds = _spread_seeds(pts.distinct(), "point", k)
    if not seeds:
        if as_pairs:
            return []
        return spark.createDataFrame([], "prediction int, centroid array<double>")
    cents = seeds

    # Model-sized shuffles (r14, guide §2.2): every per-round reduce
    # below is bounded at k x dim grouped rows — a width set by the
    # MODEL, not the data (measured: the 32-task means reduce of 512
    # rows cost 0.6-0.9 s/round on 2 000 input rows, and AQE's
    # per-stage re-planning another ~1 s/round).  Probe medians on
    # the same host: 6.8 s -> 3.0 s.
    with _model_sized_shuffles(spark):
        for _ in range(iterations):
            assigned = assign(
                pts, list(enumerate(cents)), vec_col="point", dim=dim
            )
            # collect the k x dim (prediction, d, m) grid FLAT and
            # assemble arrays driver-side (round-9: drops the second
            # groupBy stage per round; the grid is bounded at k*dim
            # rows)
            means = (
                assigned.select(
                    "prediction", F.posexplode("point").alias("d", "x")
                )
                .groupBy("prediction", "d")
                .agg(
                    F.round(
                        F.avg(F.col("x").cast("double")), round_digits
                    ).alias("m")
                )
            ).collect()  # k * dim rows
            by_pred: dict[int, dict[int, float]] = {}
            for r in means:
                by_pred.setdefault(r["prediction"], {})[r["d"]] = r["m"]
            new = {
                p: [dm[d] for d in sorted(dm)] for p, dm in by_pred.items()
            }
            cents = [new.get(i, cents[i]) for i in range(len(cents))]

    if as_pairs:
        return [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "prediction int, centroid array<double>",
    )
