"""Trajectory analytics over keyed point streams: segment speeds with
impossible-jump flags, and origin-destination cell flows.

The reference's domain is telco traffic — subscribers moving between
cell towers (`/root/reference/src/main/scala/traffic/process/
ClusterAnalyser.scala` clusters their positions; `Geofencer.scala`
tests containment).  These operators add the movement-analysis
layer every telco pipeline grows next: how FAST is each subscriber
moving (and which fixes are physically impossible — GPS glitch /
tower mislocation / SIM cloning), and which cell→cell flows carry
the traffic (the OD matrix that drives capacity planning).

Distance is great-circle haversine, generated as ONE SQL formula
string (`haversine_sql`) evaluated by `F.expr` on the Spark side and
verbatim by a DuckDB oracle — sin/cos/asin/radians/pow spell the
same in both dialects, so the expression tree is identical and only
last-ulp libm differences remain (absorbed by rounding, same
contract as the geohash generator `functions/geo.py::geohash_sql`).

Scale shape: both operators are ONE per-key ordered window pass
(lag of the previous fix) followed by scan-side arithmetic — speeds
add no shuffle beyond the window's keyed exchange; OD flows add one
(from, to) aggregate, map-side combined, whose output is
cell-pair-sized, not data-sized.  Keys are subscriber-sized: per-key
series are bounded by one device's fix rate (a device emitting 1
fix/s for a month is ~2.6 M rows — a single task's worth), the same
per-key-bounded contract as the rolling-window family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """Great-circle distance in km between (lat1, lng1) and
    (lat2, lng2) — one formula string valid in BOTH Spark SQL and
    DuckDB (identical expression tree on both engines; keep any
    edits dialect-neutral)."""
    return (
        f"(2.0 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians(({lng2}) - ({lng1})) / 2), 2))))"
    )


def trajectory_speeds(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    lat_col: str,
    lng_col: str,
    order_cols: list[str] | None = None,
    max_kmh: float = 1000.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-key consecutive-fix segments: distance (haversine km),
    elapsed seconds, speed km/h, and an ``impossible`` flag for
    segments faster than ``max_kmh`` (default 1000 km/h ≈ airliner —
    anything above is a glitch or a cloned identity) or teleports
    (zero elapsed time over nonzero distance).

    ``ts_col`` is epoch seconds (double); ``order_cols`` break
    timestamp ties so ``lag`` is well-defined.  Keys with a single
    fix emit nothing (no segment).

    Returns (keys, *order_cols, t_s, gap_s, dist_km, speed_kmh,
    impossible) — one row per segment, anchored at its END fix.
    """
    tie = list(order_cols or [])
    w = Window.partitionBy(*key_cols).orderBy("t_s", *tie)
    base = df.select(
        *key_cols,
        F.col(ts_col).cast("double").alias("t_s"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lng_col).cast("double").alias("_lng"),
        *tie,
    )
    seg = (
        base.withColumn("_pt", F.lag("t_s").over(w))
        .withColumn("_plat", F.lag("_lat").over(w))
        .withColumn("_plng", F.lag("_lng").over(w))
        .where(F.col("_pt").isNotNull())
    )
    dist = F.expr(haversine_sql("_plat", "_plng", "_lat", "_lng"))
    gap = F.col("t_s") - F.col("_pt")
    speed = F.when(gap > 0, dist / (gap / F.lit(3600.0)))
    return seg.select(
        *key_cols,
        *tie,
        "t_s",
        (F.round(gap, round_to) + F.lit(0.0)).alias("gap_s"),
        (F.round(dist, round_to) + F.lit(0.0)).alias("dist_km"),
        (F.round(speed, round_to) + F.lit(0.0)).alias("speed_kmh"),
        (
            F.coalesce(speed > F.lit(float(max_kmh)), dist > 0)
        ).alias("impossible"),
    )


def od_flows(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    cell_col: str,
    order_cols: list[str] | None = None,
    min_trips: int = 1,
) -> DataFrame:
    """Origin-destination matrix: per-key consecutive cell
    transitions (self-loops dropped — dwelling in a cell is not a
    trip), aggregated to (from_cell, to_cell) flow counts and
    distinct-key counts — the capacity-planning / commute-pattern
    primitive.

    ``approx``-free: n_keys is an exact count(distinct key) per
    cell pair; at extreme pair cardinality swap for
    approx_count_distinct at the call site.

    Returns (from_cell, to_cell, n_trips, n_keys), trips >=
    ``min_trips``.
    """
    tie = list(order_cols or [])
    w = Window.partitionBy(*key_cols).orderBy("_t", *tie)
    base = df.select(
        *key_cols,
        F.col(ts_col).cast("double").alias("_t"),
        F.col(cell_col).alias("_cell"),
        *tie,
    )
    trans = (
        base.withColumn("_prev", F.lag("_cell").over(w))
        .where(
            F.col("_prev").isNotNull()
            & (F.col("_prev") != F.col("_cell"))
        )
    )
    key_expr = F.concat_ws("\x01", *[F.col(c).cast("string") for c in key_cols])
    return (
        trans.groupBy(
            F.col("_prev").alias("from_cell"),
            F.col("_cell").alias("to_cell"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.countDistinct(key_expr).alias("n_keys"),
        )
        .where(F.col("n_trips") >= min_trips)
    )


def mobility_metrics(
    df: DataFrame,
    key_cols: list[str],
    lat_col: str,
    lng_col: str,
    cell_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-key human-mobility metrics (the two classics of the
    mobile-phone-data literature):

    * **radius of gyration** (González, Hidalgo & Barabási, Nature
      2008): r_g = sqrt(mean squared distance of each fix from the
      key's center of mass) — how far the subscriber's life spreads.
      Computed on the equirectangular plane tangent at the key's mean
      latitude (exact enough at city scale, and — unlike iterated
      haversine-to-centroid — expressible as ONE closed-form
      aggregate: E[d²] = var(lat_km) + var(lng_km); no second pass,
      no centroid join).
    * **location entropy** (Song et al., Science 2010 limits-of-
      predictability line): Shannon entropy over the key's cell-visit
      distribution — 0 bits = always the same cell (predictable),
      high = spread (roaming).

    Physical shape: one (key, cell) visit aggregate, one per-key
    window over the key's CELL table (cells-per-key-sized), and the
    gyration moments ride the same keyed aggregate — two keyed
    shuffles total, output key-sized.  deg-km conversion uses the
    fixed 111.32 km/deg equator constant on both engines.

    Returns (keys, n_fixes, n_cells, radius_gyration_km,
    location_entropy_bits).
    """
    from pyspark.sql import Window

    km_lat = F.lit(111.32)
    lat = F.col(lat_col).cast("double")
    lng = F.col(lng_col).cast("double")
    base = df.select(
        *key_cols,
        lat.alias("_lat"),
        lng.alias("_lng"),
        F.col(cell_col).alias("_cell"),
    )
    gyr = base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_fixes"),
        F.var_pop("_lat").alias("_vlat"),
        F.var_pop("_lng").alias("_vlng"),
        F.avg("_lat").alias("_mlat"),
    )
    # squared-km spread: var(lat)·(km/deg)² + var(lng)·(km/deg·cosφ)²
    coslat = F.cos(F.radians(F.col("_mlat")))
    rg = F.sqrt(
        F.col("_vlat") * km_lat * km_lat
        + F.col("_vlng") * km_lat * coslat * km_lat * coslat
    )
    visits = base.groupBy(*key_cols, "_cell").agg(
        F.count(F.lit(1)).alias("_n")
    )
    wk = Window.partitionBy(*key_cols)
    p = F.col("_n") / F.sum("_n").over(wk).cast("double")
    ent = (
        visits.withColumn("_term", -p * F.log(2.0, p))
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("_term").alias("_h"),
        )
    )
    return gyr.join(ent, key_cols).select(
        *key_cols,
        "n_fixes",
        "n_cells",
        (F.round(rg, round_to) + F.lit(0.0)).alias("radius_gyration_km"),
        (F.round(F.col("_h"), round_to) + F.lit(0.0)).alias(
            "location_entropy_bits"
        ),
    )


def dwell_times(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    cell_col: str,
    order_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-cell dwell-time profile: collapse each key's consecutive
    same-cell runs into VISITS (enter → leave), then aggregate per
    cell the visit count and mean/total dwell seconds — "how long do
    subscribers stay under this tower", the load-duration companion
    to :func:`od_flows` (which counts the transitions BETWEEN
    visits).

    A visit's dwell is last-fix-in-run → first-fix-of-next-run (the
    handover moment); each key's final open visit has no observed
    exit and is excluded (absorbing it would understate nothing —
    it is right-censored, same convention as the survival module's
    censoring).

    Run detection is the classic gaps-and-islands: a run id = count
    of cell CHANGES up to each fix (one conditional running sum over
    the per-key ordered window), then one (key, run) aggregate and
    one (cell) aggregate — two keyed shuffles after the window pass,
    output cell-sized.
    """
    tie = list(order_cols or [])
    w = Window.partitionBy(*key_cols).orderBy("_t", *tie)
    base = df.select(
        *key_cols,
        F.col(ts_col).cast("double").alias("_t"),
        F.col(cell_col).alias("_cell"),
        *tie,
    )
    marked = base.withColumn(
        "_chg",
        F.when(
            F.lag("_cell").over(w).isNull()
            | (F.lag("_cell").over(w) != F.col("_cell")),
            1,
        ).otherwise(0),
    ).withColumn(
        "_run",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = marked.groupBy(*key_cols, "_run").agg(
        F.first("_cell").alias("_cell"),
        F.min("_t").alias("_enter"),
    )
    wrun = Window.partitionBy(*key_cols).orderBy("_run")
    visits = (
        runs.withColumn("_exit", F.lead("_enter").over(wrun))
        .where(F.col("_exit").isNotNull())
        .select(
            "_cell", (F.col("_exit") - F.col("_enter")).alias("_dwell")
        )
    )
    return visits.groupBy(F.col("_cell").alias("cell")).agg(
        F.count(F.lit(1)).cast("long").alias("n_visits"),
        (F.round(F.avg("_dwell"), round_to) + F.lit(0.0)).alias(
            "mean_dwell_s"
        ),
        (F.round(F.sum("_dwell"), round_to) + F.lit(0.0)).alias(
            "total_dwell_s"
        ),
    )


def anchor_cells(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    lat_col: str,
    lng_col: str,
    cell_col: str,
    night_hours: tuple[int, int] = (0, 6),
    day_hours: tuple[int, int] = (9, 17),
    round_to: int = 6,
) -> DataFrame:
    """Home/work anchor inference — the standard CDR heuristic
    (most-visited cell in night hours = home, in office hours =
    work; cf. the mobile-phone-data literature's home-detection
    line) plus the commute distance between the two anchors
    (haversine of the anchors' mean fix positions).

    ``ts_col`` is a TIMESTAMP column; hours are event-time hours
    (the session must pin a timezone — `session.tune` does).  Ties
    in visit count break to the lexicographically smallest cell, so
    the anchor choice is deterministic across engines.  Keys lacking
    fixes in either window are omitted (no anchor to infer).

    Physical shape: one (key, cell, slot) visit aggregate carrying
    mean fix coordinates, one per-key-slot argmax window over the
    key's CELL table (cells-per-key-sized), one self-join of the two
    anchor rows per key — all keyed; output key-sized.
    """
    hr = F.hour(F.col(ts_col))
    slot = F.when(
        (hr >= night_hours[0]) & (hr <= night_hours[1]), F.lit("home")
    ).when(
        (hr >= day_hours[0]) & (hr <= day_hours[1]), F.lit("work")
    )
    base = df.select(
        *key_cols,
        slot.alias("_slot"),
        F.col(cell_col).alias("_cell"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lng_col).cast("double").alias("_lng"),
    ).where(F.col("_slot").isNotNull())
    agg = base.groupBy(*key_cols, "_slot", "_cell").agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_lat").alias("_alat"),
        F.avg("_lng").alias("_alng"),
    )
    wa = Window.partitionBy(*key_cols, "_slot").orderBy(
        F.col("_n").desc(), F.col("_cell")
    )
    top = agg.withColumn("_rk", F.row_number().over(wa)).where(
        F.col("_rk") == 1
    )
    home = top.where(F.col("_slot") == "home").select(
        *key_cols,
        F.col("_cell").alias("home_cell"),
        F.col("_n").alias("n_home_fixes"),
        F.col("_alat").alias("_hlat"),
        F.col("_alng").alias("_hlng"),
    )
    work = top.where(F.col("_slot") == "work").select(
        *key_cols,
        F.col("_cell").alias("work_cell"),
        F.col("_n").alias("n_work_fixes"),
        F.col("_alat").alias("_wlat"),
        F.col("_alng").alias("_wlng"),
    )
    commute = F.expr(haversine_sql("_hlat", "_hlng", "_wlat", "_wlng"))
    return home.join(work, key_cols).select(
        *key_cols,
        "home_cell",
        F.col("n_home_fixes").cast("long").alias("n_home_fixes"),
        "work_cell",
        F.col("n_work_fixes").cast("long").alias("n_work_fixes"),
        (F.round(commute, round_to) + F.lit(0.0)).alias("commute_km"),
    )


def transition_entropy(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    cell_col: str,
    order_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-key next-location predictability: the conditional entropy
    H(next cell | current cell) over the key's observed transitions
    (self-loops dropped, like :func:`od_flows`) — the Markov-level
    uncertainty measure from the limits-of-predictability line (Song
    et al.): 0 bits = every handover is determined by where you are
    now (perfectly predictable commuter); high = the next tower is
    anyone's guess.

        H(next|cur) = Σ_cur p(cur) · [−Σ_next p(next|cur) log2 p(next|cur)]

    Complements :func:`mobility_metrics`' location entropy (which
    ignores ORDER — a strict commuter and a random roamer can have
    the same visit distribution but opposite conditional entropy).

    Physical shape: the lag window pass (shared shape with od_flows),
    one (key, from, to) aggregate, a (key, from) window over the
    key's TRANSITION table (pair-sized), one final keyed aggregate.
    Output key-sized.

    Returns (keys, n_transitions, n_contexts, cond_entropy_bits);
    keys with no transition are omitted.
    """
    tie = list(order_cols or [])
    w = Window.partitionBy(*key_cols).orderBy("_t", *tie)
    base = df.select(
        *key_cols,
        F.col(ts_col).cast("double").alias("_t"),
        F.col(cell_col).alias("_cell"),
        *tie,
    )
    trans = (
        base.withColumn("_prev", F.lag("_cell").over(w))
        .where(
            F.col("_prev").isNotNull()
            & (F.col("_prev") != F.col("_cell"))
        )
        .groupBy(*key_cols, "_prev", "_cell")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    wf = Window.partitionBy(*key_cols, "_prev")
    wk = Window.partitionBy(*key_cols)
    p_cond = F.col("_n") / F.sum("_n").over(wf).cast("double")
    # H(next|cur) = Σ_{c,t} p(c,t)·(−log2 p(t|c)): weight each pair
    # row by its JOINT probability n_ct/tot; the conditional enters
    # only inside the log
    terms = trans.select(
        *key_cols,
        "_prev",
        "_n",
        F.sum("_n").over(wk).cast("double").alias("_tot"),
        (-F.log(2.0, p_cond)).alias("_nll"),
    )
    return terms.groupBy(*key_cols).agg(
        F.max("_tot").cast("long").alias("n_transitions"),
        F.countDistinct("_prev").cast("long").alias("n_contexts"),
        (
            F.round(
                F.sum(F.col("_n") / F.col("_tot") * F.col("_nll")),
                round_to,
            )
            + F.lit(0.0)
        ).alias("cond_entropy_bits"),
    )


def pingpong_handovers(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    cell_col: str,
    max_gap_s: float = 300.0,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Ping-pong handover detection — the classic radio-network
    pathology where a subscriber bounces A -> B -> A between two
    towers within seconds (overlapping coverage / mis-tuned
    hysteresis), inflating signalling load without real movement.
    Output is the NETWORK view: per unordered cell pair, how many
    ping-pong bounces and how many distinct subscribers exhibit
    them — the cell pairs a radio engineer would re-tune first.

    A bounce at fix t is ``cell(t) == cell(t-2) != cell(t-1)`` with
    the full A->B->A excursion completing within ``max_gap_s``
    seconds.  Consecutive duplicate fixes are NOT collapsed first:
    a dwell at B longer than ``max_gap_s`` cannot ping-pong anyway,
    and the time guard (not row adjacency) is the semantic bound.

    Physical shape: ONE per-key ordered window (two cell lags + one
    time lag, single pass), a scan-side bounce predicate, then ONE
    (cell_a, cell_b) aggregate — pair-sized output.  Per-key series
    stay under the bounded-fix-rate contract shared by the module.

    Returns (cell_a, cell_b, n_pingpongs, n_keys), cell_a < cell_b.
    """
    tie = list(order_cols or [])
    w = Window.partitionBy(*key_cols).orderBy("_t", *tie)
    base = df.select(
        *key_cols,
        F.col(ts_col).cast("double").alias("_t"),
        F.col(cell_col).alias("_cell"),
        *tie,
    )
    lagged = base.select(
        *key_cols,
        "_t",
        "_cell",
        F.lag("_cell", 1).over(w).alias("_c1"),
        F.lag("_cell", 2).over(w).alias("_c2"),
        F.lag("_t", 2).over(w).alias("_t2"),
    )
    bounces = lagged.where(
        F.col("_c2").isNotNull()
        & (F.col("_cell") == F.col("_c2"))
        & (F.col("_cell") != F.col("_c1"))
        & ((F.col("_t") - F.col("_t2")) <= F.lit(float(max_gap_s)))
    )
    return (
        bounces.groupBy(
            F.least("_cell", "_c1").alias("cell_a"),
            F.greatest("_cell", "_c1").alias("cell_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pingpongs"),
            F.countDistinct(*key_cols).cast("long").alias("n_keys"),
        )
    )


def route_motifs(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    cell_col: str,
    top_n: int = 20,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Top-N cell-sequence trigrams (route motifs): the most common
    3-cell paths across all subscribers — corridor mining for
    capacity planning (where do handover chains concentrate), the
    sequence-level companion to :func:`od_flows`' single-hop matrix.

    A motif is three CONSECUTIVE fixes whose cells are pairwise
    step-distinct (c1 != c2, c2 != c3 — self-loop steps are noise,
    same rule as od_flows; A->B->A ping-pongs remain visible and are
    separated by :func:`pingpong_handovers`).

    Physical shape: ONE per-key ordered window (two lags, one pass),
    scan-side motif predicate, ONE (c1, c2, c3) aggregate, global
    top-N via TakeOrderedAndProject with a full deterministic
    tie-break — never a global sort of the motif table.

    Returns (c1, c2, c3, n_trips, n_keys), the N most-travelled.
    """
    tie = list(order_cols or [])
    w = Window.partitionBy(*key_cols).orderBy("_t", *tie)
    base = df.select(
        *key_cols,
        F.col(ts_col).cast("double").alias("_t"),
        F.col(cell_col).alias("_c3"),
        *tie,
    )
    lagged = base.select(
        *key_cols,
        "_c3",
        F.lag("_c3", 1).over(w).alias("_c2"),
        F.lag("_c3", 2).over(w).alias("_c1"),
    )
    motifs = lagged.where(
        F.col("_c1").isNotNull()
        & (F.col("_c1") != F.col("_c2"))
        & (F.col("_c2") != F.col("_c3"))
    )
    return (
        motifs.groupBy(
            F.col("_c1").alias("c1"),
            F.col("_c2").alias("c2"),
            F.col("_c3").alias("c3"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trips"),
            F.countDistinct(*key_cols).cast("long").alias("n_keys"),
        )
        .orderBy(
            F.desc("n_trips"), F.asc("c1"), F.asc("c2"), F.asc("c3")
        )
        .limit(top_n)
    )
