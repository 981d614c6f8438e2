"""Event-analytics operators: grouped trend fit, cohort retention, funnels.

The reference delegates analytical SQL to the engine (SURVEY.md §2.5); these
are the three event-table analyses every warehouse deployment ends up
hand-writing, packaged as composable DataFrame operators:

  * `grouped_linear_trend` — closed-form per-group OLS fit of y over x:
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). One aggregation — the sums
    are map-side combinable, so the fit costs exactly one shuffle at any
    scale (the textbook sufficient-statistics formulation; no iteration,
    no driver math). Accumulation is exact DECIMAL so the fitted slope is
    independent of row order and partitioning.
  * `cohort_retention` — users bucketed by first-activity period; for each
    (cohort, period-offset), distinct returning users. Two shuffles: the
    per-user min (map-side combinable) and the cohort×offset distinct.
  * `funnel_counts` — strictly-ordered step progression per user (step k
    counts only if it happens AFTER the user's step k-1). One shuffle (the
    per-user conditional aggregation); the step chain is a fold over
    conditional MINs, not a self-join per step — k steps cost one pass,
    not k-1 joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# The shared cross-engine quantizer lives in the leaf module `numeric`;
# re-exported here because most call sites historically import it from
# analytics (and the oracle twin must stay next to it).
from .numeric import dec_double, dec_double_sql, grid_round, grid_round_sql  # noqa: F401


def grouped_linear_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x: Column,
    y: Column,
    scale: int = 6,
) -> DataFrame:
    """Per-group OLS slope/intercept via sufficient statistics. ``x`` and
    ``y`` are cast to DECIMAL(18,{scale}) before accumulation, so every sum
    is EXACT (products stay within decimal range in any engine: 18+18
    digits < 38) and the fit is independent of row order and partitioning.
    The final slope/intercept arithmetic runs on float64 — a fixed, tiny
    expression evaluated identically everywhere. Groups with zero
    x-variance yield NULL slope/intercept. Caller contract: |x| and |y|
    must fit 12 integer digits (offset/scale inputs accordingly)."""
    # grid_round before the decimal cast (r10 sweep): a bare double→DECIMAL
    # cast rounds engine-natively (Spark shortest-decimal HALF_UP vs DuckDB
    # binary) and diverges on half-grid inputs; the grid fixes the value
    # with shared IEEE ops first, making the cast exact
    xd = grid_round(x, scale).cast(f"decimal(18,{scale})")
    yd = grid_round(y, scale).cast(f"decimal(18,{scale})")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum((xd * yd).cast("decimal(38,12)")).alias("sxy"),
        F.sum((xd * xd).cast("decimal(38,12)")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy_d, sxx_d = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    denom = n_d * sxx_d - sx_d * sx_d
    numer = n_d * sxy_d - sx_d * sy_d
    slope = F.when(denom != 0, numer / denom)
    intercept = F.when(denom != 0, (sy_d - (numer / denom) * sx_d) / n_d)
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def approx_quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    relative_error: float = 0.001,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Fact-scale quantile bucketing (the ntile replacement promised by
    `ntile_customer_spend`): boundaries come from Spark's Greenwald-Khanna
    sketch (`approxQuantile`, mergeable map-side, bounded memory), then
    every row gets its bucket from a broadcast CASE chain — a stateless
    per-row projection. No global sort, no single-partition window: the
    only driver-side data is n_buckets-1 boundary scalars. Exact ntile
    needs a total order (one reducer sees everything); this is the shape
    that survives a 10^9-row column. Ties across a boundary all land in
    the lower bucket — deterministic, re-run-stable."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.approxQuantile(value_col, probs, relative_error)
    expr = F.lit(n_buckets)
    for i in reversed(range(len(bounds))):
        expr = F.when(F.col(value_col) <= bounds[i], F.lit(i + 1)).otherwise(expr)
    # NULL values get a NULL bucket — every <= comparison above is null for
    # them, so without this guard the otherwise(n_buckets) default would
    # silently file them in the top bucket
    expr = F.when(F.col(value_col).isNotNull(), expr)
    return df.withColumn(bucket_col, expr.cast("int"))


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Classic retention triangle: cohort = floor(first activity / period),
    offset = activity period − cohort period; output one row per
    (cohort_period, period_offset) with distinct active users.

    Two shuffles total, no join, no distinct-aggregate Expand: one user-key
    aggregate collects each user's DISTINCT activity periods (set size
    bounded by the calendar, not by event volume) with the cohort as the
    set's min; after explode every (user, period) row is unique by
    construction, so the per-(cohort, offset) user count is a plain
    combinable count — the countDistinct that a join-based phrasing needs
    (and its extra shuffle pair) never appears."""
    period = F.floor(F.col(ts_col).cast("double") / F.lit(period_seconds)).cast("long")
    per_user = (
        df.select(F.col(user_col).alias("u"), period.alias("p"))
        .groupBy("u")
        .agg(F.collect_set("p").alias("ps"))
    )
    exploded = per_user.select(
        F.array_min("ps").alias("cohort_p"), F.explode("ps").alias("p")
    )
    return (
        exploded.groupBy(
            F.col("cohort_p").alias("cohort_period"),
            (F.col("p") - F.col("cohort_p")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 3600,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): events more than
    ``gap_seconds`` apart start a new session. Appends ``session_no``
    (1-based per user, in time order). One shuffle — both windows share the
    (user, time) partitioning, so Catalyst plans a single Exchange+Sort.
    ``order_cols`` breaks timestamp ties deterministically."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull()
        | (F.col(ts_col).cast("double") - prev.cast("double") > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    flagged = df.withColumn("_new_session", new_session)
    return flagged.withColumn(
        "session_no",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new_session")


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step k iff an event of type
    steps[k] happens STRICTLY after the earliest moment they completed
    steps 0..k-1 in order (the greedy earliest-advance chain — provably
    equal to the iterated `min ts > previous` chain). One shuffle: the
    user's step events are collected, sorted in-row by (ts, type), and the
    chain is a JVM `aggregate` fold with a (step, ts) struct accumulator —
    funnel depth never adds shuffles or joins. Per-user state is bounded by
    that user's step-event count, the standard assumption for user funnels
    at any corpus scale."""
    n_steps = len(steps)
    evs = (
        df.where(F.col(type_col).isin(*steps))
        .groupBy(F.col(user_col).alias("u"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t")))
            ).alias("evs")
        )
    )
    # expected type at accumulator step s: steps[s]
    def expected(step_col):
        expr = F.lit(None).cast("string")
        for i in reversed(range(n_steps)):
            expr = F.when(step_col == i, F.lit(steps[i])).otherwise(expr)
        return expr

    init = F.struct(
        F.lit(0).cast("int").alias("step"), F.lit(None).cast("timestamp").alias("ts")
    )
    folded = evs.withColumn(
        "state",
        F.aggregate(
            "evs",
            init,
            lambda acc, ev: F.when(
                (acc["step"] < n_steps)
                & (ev["t"] == expected(acc["step"]))
                & ((acc["step"] == 0) | (ev["ts"] > acc["ts"])),
                F.struct((acc["step"] + 1).alias("step"), ev["ts"].alias("ts")),
            ).otherwise(acc),
        ),
    )
    reached = folded.select(F.col("state.step").alias("reached"))
    return reached.agg(
        *[
            F.sum(F.when(F.col("reached") >= i + 1, 1).otherwise(0)).alias(
                f"n_step{i}_{s}"
            )
            for i, s in enumerate(steps)
        ]
    )


def event_path_ngrams(
    df,
    n: int = 3,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    top_k: int = 15,
):
    """User-journey path mining: the corpus's most frequent length-`n` event
    sequences ("view>click>purchase"), counted over every user's
    chronologically ordered event stream.

    Shape: ONE shuffle builds each user's ordered type array
    (sort_array(collect_list(struct))) — the per-user stream is in-row from
    then on; n-gram expansion is a narrow transform+explode (same idiom as
    the dedup shingles); one combinable count shuffle; TakeOrdered for the
    top-k (no global sort). Ties break on the path string, deterministically.
    At 100 TB the only watch item is a single user with millions of events
    inflating one row — bound it upstream with a per-user event cap if the
    domain allows."""
    from pyspark.sql import functions as F

    seqs = df.groupBy(user_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(ts_col, tiebreak_col, type_col))),
            lambda s: s[type_col],
        ).alias("_types")
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_types") - n),
        lambda i: F.concat_ws(">", *[F.element_at(F.col("_types"), i + j + 1) for j in range(n)]),
    )
    return (
        seqs.where(F.size("_types") >= n)
        .select(F.explode(grams).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "path")
        .limit(top_k)
    )


def rolling_active_users(
    df,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Rolling N-day distinct active users per day (the DAU/WAU stickiness
    metric). Spark windows cannot do COUNT(DISTINCT) over a RANGE frame, so
    the distributable formulation is: dedup to (user, day) — one combinable
    shuffle — then fan each user-day out to the ≤N calendar days whose
    trailing window contains it (a narrow `sequence` explode, bounded ×N),
    and count distinct users per day (map-side-combinable after the user-day
    dedup made rows unique per (window_day, user)).

    Only days present in the data appear (a day with zero events has no row
    — join a calendar dimension for gap-filled reporting).

    Returns (day, n_active, n_active_rolling) — same-day distinct actives
    and the trailing `window_days` distinct actives."""
    from pyspark.sql import functions as F

    user_days = df.select(
        F.col(user_col).alias("user_id"), F.to_date(ts_col).alias("day")
    ).distinct()
    daily = user_days.groupBy("day").agg(F.count(F.lit(1)).alias("n_active"))
    fanned = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
        ).alias("window_day"),
    ).distinct()
    rolling = fanned.groupBy("window_day").agg(
        F.count(F.lit(1)).alias("n_active_rolling")
    )
    return (
        daily.join(rolling, daily["day"] == rolling["window_day"])
        .select("day", "n_active", "n_active_rolling")
    )


def event_transition_matrix(
    df,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
):
    """First-order Markov transition estimates over user event streams:
    P(next_type | current_type) from consecutive event pairs within each
    user's chronological stream.

    Same in-row shape as `event_path_ngrams` (one per-user shuffle, pairs
    extracted from the ordered array — no self-join on position), then one
    combinable pair count and a broadcast of the per-from totals (|types|²
    rows at most). Probabilities round to 1e-6 for engine-exact grading."""
    from pyspark.sql import functions as F

    seqs = df.groupBy(user_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(ts_col, tiebreak_col, type_col))),
            lambda s: s[type_col],
        ).alias("_types")
    )
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("_types") - 2),
        lambda i: F.struct(
            F.element_at(F.col("_types"), i + 1).alias("from_type"),
            F.element_at(F.col("_types"), i + 2).alias("to_type"),
        ),
    )
    counted = (
        seqs.where(F.size("_types") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.from_type", "p.to_type")
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = counted.groupBy("from_type").agg(F.sum("n_transitions").alias("_total"))
    return (
        counted.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            # int/int RATIONAL — the half-grid divergence class (r10
            # sweep): grid_round, not engine round()
            grid_round(F.col("n_transitions") / F.col("_total"), 6).alias("p_transition"),
        )
    )


def grouped_ewma(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Exponentially weighted moving average per group, reported at the last
    observation: ewma_t = α·x_t + (1−α)·ewma_{t−1}, seeded with the first
    value (pandas `ewm(adjust=False)` semantics — the standard streaming
    EWMA used for drift/level monitoring on metrics pipelines).

    Shape: ONE shuffle builds each group's chronologically ordered value
    array (sort_array over (ts, tiebreak, value) structs — deterministic
    under any partitioning); the fold is IN-ROW via `aggregate`, a strict
    left fold, so both Spark and any other IEEE-double engine folding left
    produce bit-identical results. No window, no second shuffle.
    At 100 TB the watch item is one group holding an entire history in a
    row — cap or pre-bucket by time range if groups grow unbounded."""
    seqs = df.groupBy(*keys).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(ts_col, tiebreak_col, value_col))),
            lambda s: s[value_col].cast("double"),
        ).alias("_vals")
    )
    folded = F.aggregate(
        F.slice(F.col("_vals"), F.lit(2), F.greatest(F.size("_vals") - 1, F.lit(0))),
        F.element_at(F.col("_vals"), 1),
        lambda acc, x: F.lit(float(alpha)) * x + F.lit(float(1.0 - alpha)) * acc,
    )
    return seqs.select(
        *keys,
        F.size("_vals").alias("n_obs"),
        # r11 sweep: the fold's result is a plain double — engine round()
        # diverges on shortest-decimal half-grid values, grid_round doesn't
        grid_round(folded, 6).alias("ewma"),
    )


def interarrival_stats(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Inter-arrival-time profile per event type: for each user's
    chronological stream, the gap to the previous event (any type), grouped
    by the CURRENT event's type — the standard arrival-process health signal
    (burst detection, dead-source alarms).

    Exactness: gaps are integer MICROSECONDS (unix_micros difference), so
    the per-type sums are exact BIGINT arithmetic — no float-summation
    order sensitivity across engines; the single division to seconds
    happens once per output row. Shape: one user-partitioned window (lag),
    one combinable aggregate."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    micros = F.unix_micros(F.col(ts_col))
    gap = micros - F.lag(micros).over(w)
    gaps = df.select(F.col(type_col), gap.alias("_gap_us")).where(F.col("_gap_us").isNotNull())
    return gaps.groupBy(type_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        # int/int RATIONALS — the half-grid divergence class (r10 sweep):
        # grid_round, not engine round() (max_gap is numerically identical
        # either way — its value has ≤ 6 true decimals — kept uniform)
        grid_round(F.sum("_gap_us") / F.count(F.lit(1)) / 1e6, 6).alias("avg_gap_sec"),
        grid_round(F.max("_gap_us") / 1e6, 6).alias("max_gap_sec"),
    )


def lagged_autocorrelation(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lag: int = 1,
    decimals: int = 6,
) -> DataFrame:
    """Lag-k autocorrelation of a value series per group — the standard
    seasonality/persistence probe on metric streams (reference scope: the
    engine-delegated analytical SQL family, SURVEY.md §2.5).

    Pearson correlation of (x_t, x_{t-k}) over each group's chronological
    order. Exactness discipline matches `pairwise_correlations`: values
    round to 1e-6 BEFORE summation, sufficient statistics accumulate in
    exact DECIMAL (order/partition-independent), and the final corr is one
    fixed IEEE expression of those exact sums — any engine computing the
    same formula agrees bit-for-bit, unlike the built-in running corr().

    Shape: one window shuffle (lag over the group's time order) + one
    map-side-combinable aggregate. The window partitions by the GROUP key,
    so a low-cardinality group column concentrates each series on one task;
    at 100 TB re-key long histories by (group, coarse time bucket) with a
    k-row overlap per bucket boundary — the lag pairs are local, so bucketed
    evaluation is exact, not an approximation."""
    w = Window.partitionBy(group_col).orderBy(ts_col, tiebreak_col)
    # decimal(18,s) keeps Spark's product scale exact (38x38 multiplies
    # round products back to scale s — see zipf_slope); caller contract:
    # |value| must fit 12 integer digits
    dec = f"decimal(18,{decimals})"
    # grid_round before the cast (r10/r11 sweep: input-side class)
    q = grid_round(F.col(value_col), decimals).cast(dec)
    pairs = (
        df.select(F.col(group_col), q.alias("_x"), F.col(ts_col), F.col(tiebreak_col))
        .withColumn("_y", F.lag("_x", lag).over(w))
        .where(F.col("_y").isNotNull())
    )
    stats = pairs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    num = n * sxy - sx * sy
    # guard each RADICAND, not the sqrt product: double cancellation makes
    # a constant series' n*sxx - sx*sx a tiny NEGATIVE (measured -1.2e-7 at
    # n=34), and sqrt(negative) is NaN here but a hard error in DuckDB —
    # the oracle must be able to phrase the same guard
    ra = n * sxx - sx * sx
    rb = n * syy - sy * sy
    # ROUNDED output, unlike zipf_slope: full-series sums here are large
    # enough to exceed int64 when decimal-scaled, and DuckDB's
    # hugeint->double cast is lossy by ~1-2 ulp — rounding at 1e-6 absorbs
    # that (the proven pairwise_correlations treatment); the correlation is
    # a non-quantized ratio, so rounding-boundary collisions are measure-zero
    return stats.select(
        F.col(group_col),
        F.col("_n").alias("n_pairs"),
        F.when(
            (ra > 0) & (rb > 0), grid_round(num / (F.sqrt(ra) * F.sqrt(rb)), decimals)
        ).alias(f"autocorr_lag{lag}"),
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    window: int = 20,
    min_obs: int = 10,
    k: int = 25,
    decimals: int = 6,
    bucket_seconds: int | None = 86400,
) -> DataFrame:
    """Rolling z-score anomaly detection: each observation scored against
    the mean/std of the PRECEDING `window` observations in its group (the
    current row is excluded — the score measures surprise vs history, so a
    level shift flags its first point, not its whole tail). Returns the
    top-k most anomalous rows by |z|.

    Exactness: the frame's sum/sum-of-squares accumulate over 1e-6-rounded
    DECIMAL values (exact integer arithmetic under any evaluation order —
    running-frame vs recompute-per-row give identical results, so Spark and
    DuckDB agree bit-for-bit); mean/std/z are then fixed IEEE expressions of
    those exact sums.

    100 TB shape (the r7-verdict mitigation, implemented): a window keyed by
    the group column alone caps parallelism at the number of groups — for a
    5-value event_type, 10x data means 10x-longer sorted frames on 5 fixed
    partitions (measured 7.6x at 10x). With `bucket_seconds` set (default),
    the evaluation is re-keyed EXACTLY:

      1. per-(group, time-bucket) counts — a tiny combinable aggregate;
      2. exclusive cumulative offsets over that tiny frame -> a global
         per-group row number rn = offset + within-bucket row_number, where
         the within-bucket window partitions by (group, bucket) so its
         parallelism tracks data volume;
      3. re-key by rn-block of size `window`, duplicating every row once
         into the following block as frame context: a row in block B needs
         only rows with rn >= (B-1)*window, all present in partition
         (group, B) by construction. Every partition is <= 2*window rows.

    The per-row frame contains exactly the same rows as the single-window
    formulation, and the sums are DECIMAL-exact, so the two paths are
    bit-identical (pinned by a test); `bucket_seconds=None` keeps the plain
    one-shuffle form for small-group-history data."""
    dec = f"decimal(18,{decimals})"
    # input-side quantization via grid_round (r10 sweep — engine round()
    # on raw doubles is the cross-engine shortest-decimal half-grid class)
    q = grid_round(F.col(value_col), decimals).cast(dec)
    if bucket_seconds is None:
        ow = Window.partitionBy(group_col).orderBy(ts_col, tiebreak_col)
        fw = ow.rowsBetween(-window, -1)
        scored = df.select(
            F.col(group_col),
            F.col(tiebreak_col),
            F.col(ts_col),
            q.alias("_x"),
            F.count(F.lit(1)).over(fw).alias("_n"),
            F.sum(q).over(fw).alias("_s"),
            F.sum(q * q).over(fw).alias("_ss"),
        ).where(F.col("_n") >= min_obs)
    else:
        # _tb is null-safe: a NULL ts lands in a sentinel earliest bucket so
        # it keeps its NULLS-FIRST position from the single-window ordering
        # instead of being dropped by the offsets equi-join (r8 review)
        base = df.select(
            F.col(group_col),
            F.col(tiebreak_col),
            F.col(ts_col),
            q.alias("_x"),
            F.coalesce(
                F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)),
                F.lit(-(2**62)),
            ).alias("_tb"),
        )
        counts = base.groupBy(group_col, "_tb").agg(F.count(F.lit(1)).alias("_c"))
        cum = Window.partitionBy(group_col).orderBy("_tb").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = counts.select(
            F.col(group_col).alias("_og"),
            F.col("_tb").alias("_otb"),
            F.coalesce(F.sum("_c").over(cum), F.lit(0)).alias("_off"),
        )
        in_bucket = Window.partitionBy(group_col, "_tb").orderBy(ts_col, tiebreak_col)
        # null-SAFE group equality: a NULL group key is a real window
        # partition in the single-window form and must survive the join
        rn_df = base.join(
            F.broadcast(offsets),
            base[group_col].eqNullSafe(F.col("_og")) & (base["_tb"] == F.col("_otb")),
        ).select(
            group_col,
            tiebreak_col,
            "_x",
            (F.col("_off") + F.row_number().over(in_bucket)).alias("_rn"),
        )
        blk = F.floor((F.col("_rn") - F.lit(1)) / F.lit(window))
        native = rn_df.select(
            group_col, tiebreak_col, "_x", "_rn", blk.alias("_blk"),
            F.lit(True).alias("_nat"),
        )
        context = rn_df.select(
            group_col, tiebreak_col, "_x", "_rn", (blk + 1).alias("_blk"),
            F.lit(False).alias("_nat"),
        )
        ow = Window.partitionBy(group_col, "_blk").orderBy("_rn")
        fw = ow.rowsBetween(-window, -1)
        qx = F.col("_x")
        scored = (
            native.unionByName(context)
            .select(
                F.col(group_col),
                F.col(tiebreak_col),
                F.col("_nat"),
                F.col("_x"),
                F.count(F.lit(1)).over(fw).alias("_n"),
                F.sum(qx).over(fw).alias("_s"),
                F.sum(qx * qx).over(fw).alias("_ss"),
            )
            .where(F.col("_nat") & (F.col("_n") >= min_obs))
        )
    n = F.col("_n").cast("double")
    s, ss = F.col("_s").cast("double"), F.col("_ss").cast("double")
    x = F.col("_x").cast("double")
    mean = s / n
    var = (n * ss - s * s) / (n * (n - 1))
    std = F.sqrt(var)
    # roll_mean stays unrounded (the plain sum fits int64 at any realistic
    # magnitude -> exact casts -> identical doubles). z IS rounded: the
    # sum-of-squares at scale 12 exceeds int64 once |value| reaches ~1e5
    # over a 20-row frame, and DuckDB's hugeint->double cast is ~1-ulp
    # lossy (hypothesis-found divergence in the 16th digit) — quantizing
    # to 1e-6 absorbs it. r11 sweep: the quantizer is grid_round (one
    # IEEE expression, engine-identical), not engine round() whose
    # half-grid behavior differs between Spark and DuckDB.
    z = grid_round((x - mean) / std, decimals)
    # guard on var > 0, NOT std > 0: catastrophic cancellation can make var a
    # tiny negative -> std = NaN, and NaN compares differently across engines
    # (DuckDB orders NaN above all values; Spark's NaN > 0 is false)
    return (
        scored.select(
            F.col(group_col),
            F.col(tiebreak_col),
            F.col("_x").cast("double").alias(value_col),
            mean.alias("roll_mean"),
            F.when(var > 0, z).alias("z"),
        )
        .where(F.col("z").isNotNull())
        .orderBy(F.abs(F.col("z")).desc(), F.col(tiebreak_col))
        .limit(k)
    )


def decayed_popularity(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    half_life_hours: float = 24.0,
    decimals: int = 6,
) -> DataFrame:
    """Time-decayed popularity: each event contributes 2^(-age/half_life)
    relative to the NEWEST event in the table — the standard trending-items
    score (recent activity dominates, old volume fades geometrically).
    Using the observed max timestamp as the reference keeps the operator
    deterministic (no wall-clock read) and re-run reproducible.

    Exactness: per-event weights are libm exp() values — rounded to 1e-6
    BEFORE summation so sub-ulp exp() differences across engines cannot
    survive — then summed in exact DECIMAL; the output is the exact sum
    cast to double (bit-identical anywhere). Shape: one 1-row max-ts
    aggregate broadcast onto the scan, one combinable sum — two scans, no
    sort, no window."""
    ref = df.agg(F.max(F.col(ts_col)).alias("_ref_ts"))
    age_sec = F.unix_micros(F.col("_ref_ts")) / 1e6 - F.unix_micros(F.col(ts_col)) / 1e6
    lam = 0.6931471805599453  # ln 2 as a fixed literal: same constant in any engine
    w = F.exp(F.lit(-lam) * age_sec / F.lit(half_life_hours * 3600.0))
    dec = f"decimal(18,{decimals})"
    return (
        df.crossJoin(F.broadcast(ref))
        # grid_round, not engine round() (r10/r11 sweep: the libm-exp
        # weight can land on the half-grid)
        .select(F.col(key_col), grid_round(w, decimals).cast(dec).alias("_w"))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_w").cast("double").alias("decayed_score"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    decimals: int = 6,
) -> DataFrame:
    """Mean-shift changepoint location by CUSUM: per group, the cumulative
    sum of deviations from the group mean, S_i = Σ_{j≤i}(x_j − x̄); the
    index maximizing |S_i| is the classic single-changepoint estimator
    (Page 1954 / Pettitt's statistic shape). Reports that location and
    max|S| per group.

    Exactness: S_i is phrased as cumsum(x) − i·(total/n) where cumsum and
    total are EXACT DECIMAL window/group sums — exact regardless of the
    engine's window evaluation strategy (DuckDB's segment-tree windows add
    in a different ORDER than Spark's running frames, which would diverge
    on double cumsums; integer/decimal addition is order-free) — and the
    subtraction is fixed IEEE arithmetic on exactly-cast doubles. The
    argmax tie breaks on the tiebreak column. Shape: one group-partitioned
    window (cumsum + row_number share the sort), a broadcast per-group
    totals join, a TakeOrdered-style per-group argmax — no global sort."""
    dec = f"decimal(18,{decimals})"
    # grid_round before the cast (r10/r11 sweep: input-side class)
    q = grid_round(F.col(value_col), decimals).cast(dec)
    w = Window.partitionBy(group_col).orderBy(ts_col, tiebreak_col)
    cum = (
        df.select(F.col(group_col), F.col(ts_col), F.col(tiebreak_col), q.alias("_x"))
        .withColumn("_cum", F.sum("_x").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("_i", F.row_number().over(w))
    )
    totals = cum.groupBy(group_col).agg(
        F.sum("_x").alias("_tot"), F.count(F.lit(1)).alias("n")
    )
    s_i = F.col("_cum").cast("double") - F.col("_i").cast("double") * (
        F.col("_tot").cast("double") / F.col("n").cast("double")
    )
    scored = cum.join(F.broadcast(totals), group_col).select(
        F.col(group_col), F.col("n"), F.col(tiebreak_col), F.abs(s_i).alias("_abs_s")
    )
    pick = Window.partitionBy(group_col).orderBy(
        F.desc("_abs_s"), F.col(tiebreak_col)
    )
    return (
        scored.withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .select(
            F.col(group_col),
            F.col("n"),
            F.col(tiebreak_col).alias("change_point_id"),
            F.col("_abs_s").alias("max_abs_cusum"),
        )
    )


def _round_half_up_py(x: float, scale: float) -> float:
    """floor(x*scale + 0.5)/scale in IEEE double — the SHARED rounding used
    by holt_linear_by_group in both engines (Python's round() is
    banker's-rounding and DuckDB's is half-away; this explicit floor form
    is the same three IEEE ops everywhere)."""
    import math

    return math.floor(x * scale + 0.5) / scale


def holt_linear_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    order_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    beta: float = 0.1,
    decimals: int = 9,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per group (Holt
    1957, public): level/trend recursion
    ``l_t = a*x_t + (1-a)*(l+b);  b_t = B*(l_t-l) + (1-B)*b`` with the
    standard init l_0=x_0, b_0=x_1-x_0. Returns per-group (n_points, level,
    trend, forecast_1) with forecast_1 = level + trend.

    This is the repo's canonical GENUINELY-SEQUENTIAL operator: the
    recursion cannot be expressed as a weighted sum (unlike EWMA, which
    reformulates into one — `grouped_ewma`), so it runs as sorted-group
    Arrow `applyInPandas` — the documented escape hatch for stateful
    per-key logic Spark's built-ins can't express. Work is one shuffle on
    the group key + an O(n) Python loop per group; at 100 TB the group
    count provides the parallelism and no state leaves its group.

    Engine-exact anyway: every smoothing step rounds with the explicit
    ``floor(x*10^d + 0.5)/10^d`` form (same IEEE ops in Python and SQL —
    Python's round() half-even vs DuckDB's half-away would diverge ON the
    boundary), so the whole recursion is graded against a DuckDB RECURSIVE
    CTE running the identical recurrence. Groups with < 2 points are
    excluded (no trend is defined).
    """
    import pandas as pd

    scale = float(10**decimals)
    out_schema = (
        f"{group_col} string, n_points long, level double, trend double, forecast_1 double"
    )

    sort_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    # NULL observations carry no signal and would arrive as NaN inside the
    # pandas UDF, where the floor-rounding raises on NaN — exclude them up
    # front (mirrored by the oracle's IS NOT NULL)
    df = df.where(F.col(value_col).isNotNull())

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols).reset_index(drop=True)
        xs = [float(v) for v in pdf[value_col]]
        if len(xs) < 2:
            return pd.DataFrame(columns=[group_col, "n_points", "level", "trend", "forecast_1"])
        lvl = xs[0]
        trd = xs[1] - xs[0]
        for x in xs[1:]:
            prev_lvl = lvl
            lvl = _round_half_up_py(alpha * x + (1.0 - alpha) * (lvl + trd), scale)
            trd = _round_half_up_py(beta * (lvl - prev_lvl) + (1.0 - beta) * trd, scale)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_points": [len(xs)],
                "level": [lvl],
                "trend": [trd],
                "forecast_1": [_round_half_up_py(lvl + trd, scale)],
            }
        )

    return df.groupBy(group_col).applyInPandas(fit, out_schema)


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Market-basket association strength: for item pairs co-occurring in the
    same basket, support counts and LIFT = P(a,b) / (P(a)·P(b)).

    The basket self-join is keyed on the basket id with `item_a < item_b`,
    so fan-out is bounded by items-per-basket squared (single digits for
    order lines) — never item×item across baskets. Counts are exact
    integers; lift is one double division of exact integers, rounded —
    deterministic across engines. At 100 TB the same plan holds: the join
    key is the basket id, co-partitioned by the shuffle, and the item-count
    dimension broadcasts.
    """
    from ..session import lineage_pin

    # `items` feeds FOUR consumers (the basket count, both self-join sides,
    # the item-count dimension) — unpinned, each replayed the fact scan +
    # distinct (r11 opt, guide §2.4). The r11 form additionally ran the
    # basket count as an EAGER driver action; r12 re-A/B (verdict item 6)
    # measured that the separate count job serializes against the pin
    # materialization (interleaved A/B at sf0.1: eager-count cold 7.9s /
    # steady 2.18s vs in-plan 3.7s / 1.99s, identical rows). The count is
    # now a 1-row aggregate cross-joined into the plan, so the whole query
    # is ONE action and the lazy pin materializes exactly once.
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    items = lineage_pin(items)
    nb = items.agg(F.countDistinct("basket").alias("_nb"))
    item_counts = items.groupBy("item").agg(F.count(F.lit(1)).alias("item_cnt"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, on=F.col("a.basket") == F.col("b.basket"))
        .where(F.col("a.item") < F.col("b.item"))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .where(F.col("pair_cnt") >= min_pair_count)
        .crossJoin(F.broadcast(nb))
    )
    scored = (
        pairs.join(F.broadcast(item_counts.withColumnsRenamed({"item": "item_a", "item_cnt": "cnt_a"})), "item_a")
        .join(F.broadcast(item_counts.withColumnsRenamed({"item": "item_b", "item_cnt": "cnt_b"})), "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            # grid_round, not engine round() (r11 sweep: int rational).
            # _nb is an exact integer cast to double — bit-identical to the
            # old driver-side float(n_baskets) literal.
            grid_round(
                (F.col("pair_cnt").cast("double") * F.col("_nb").cast("double"))
                / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("pair_cnt"), "item_a", "item_b").limit(top_k)


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation: per customer recency (latest order date), frequency
    (order count) and monetary (DECIMAL spend sum), each scored into
    `n_tiles` quantile bins, then aggregated per R-F-M segment.

    One aggregate + three window ntiles over the customer dimension (small
    relative to the fact table), with customer id as the deterministic
    tie-break inside every ntile ordering. Output is segment-level — tiny.
    """
    per_customer = orders.groupBy(customer_col).agg(
        F.max(date_col).alias("recency_date"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(amount_col).alias("monetary"),
    )
    w_r = Window.orderBy(F.desc("recency_date"), F.col(customer_col))
    w_f = Window.orderBy(F.desc("frequency"), F.col(customer_col))
    w_m = Window.orderBy(F.desc("monetary"), F.col(customer_col))
    scored = per_customer.select(
        F.col(customer_col),
        F.col("monetary"),
        F.ntile(n_tiles).over(w_r).alias("r_score"),
        F.ntile(n_tiles).over(w_f).alias("f_score"),
        F.ntile(n_tiles).over(w_m).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").alias("segment_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def trimmed_mean_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    trim_fraction: float = 0.1,
    scale: int = 6,
) -> DataFrame:
    """Robust per-group mean: drop the lowest and highest `trim_fraction`
    of rows BY RANK (floor(n·f) rows each side) and average the rest.

    Rank-based trimming avoids percentile interpolation, whose semantics
    differ across engines; with a total order (value, tiebreak) the kept
    row set is identical everywhere, and the mean is an exact DECIMAL sum
    over it divided once at the end. One window sort per group — a single
    shuffle."""
    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(tiebreak_col))
    ranked = (
        df.where(F.col(value_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
        .withColumn("_cut", F.floor(F.col("_n") * F.lit(trim_fraction)))
        .where((F.col("_rn") > F.col("_cut")) & (F.col("_rn") <= F.col("_n") - F.col("_cut")))
    )
    # DECIMAL sum (order-independent, cross-engine exact), ONE double
    # division at the end. The final quantization is `grid_round`, NOT
    # engine round(): the mean is RATIONAL (exact decimal sum / integer
    # count) and can land exactly on the half-grid where Spark and DuckDB
    # round() diverge — hypothesis found the live case on this operator's
    # twin (winsorized mean); same fix as exact_quartiles. Ties round
    # away from zero (r10: sign-symmetric form, see grid_round).
    # input-side quantization via grid_round BEFORE the decimal cast: a
    # bare double→DECIMAL cast rounds half-grid inputs engine-natively
    # (Spark shortest-decimal HALF_UP vs DuckDB binary — the same
    # divergence class as round()), so the grid fixes the value first and
    # the cast is then exact (r10 sweep)
    mean = (
        F.sum(grid_round(F.col(value_col), 6).cast("decimal(18,6)")).cast("double")
        / F.count(F.lit(1))
    )
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            grid_round(mean, scale).alias("trimmed_mean"),
        )
        .orderBy(group_col)
    )


def mann_kendall_by_group(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    scale: int = 6,
) -> DataFrame:
    """Mann-Kendall trend S-statistic per group over per-period means:
    S = Σ_{i<j} sign(x_j − x_i), the classic non-parametric monotone-trend
    test (Mann 1945, Kendall 1975).

    The series is first reduced to per-period (day) sufficient statistics —
    an exact DECIMAL sum and an integer count. Comparing period means
    s_i/n_i never divides: sign(x_j − x_i) = sign(s_j·n_i − s_i·n_j), a
    cross-multiplication of exact numbers, so S is bit-identical on any
    engine. The pairwise stage self-joins PERIODS within a group: quadratic
    in the number of days (bounded), never in the row count."""
    del scale  # kept for signature symmetry with the other analytics ops
    # NOTE (r9 review): this graded operator buckets days with to_date()
    # — correct under the repo's pinned-UTC sessions and frozen by its
    # green oracle; NEW operators use the tz-neutral epoch-day bucket
    # floor(ts/86400) instead (see kendall_tau_daily_level_volume /
    # burstiness_by_group). If this one is ever re-bucketed, change its
    # oracle in the same commit.
    daily = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, F.to_date(time_col).alias("period"))
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    cross = F.col("b.s") * F.col("a.n") - F.col("a.s") * F.col("b.n")
    pairs = a.join(
        b,
        on=(F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
        & (F.col("a.period") < F.col("b.period")),
    ).select(
        F.col(f"a.{group_col}").alias(group_col),
        F.when(cross > 0, F.lit(1)).when(cross < 0, F.lit(-1)).otherwise(F.lit(0)).alias("s"),
    )
    n_periods = daily.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_periods"))
    return (
        pairs.groupBy(group_col)
        .agg(F.sum("s").cast("long").alias("s_statistic"))
        .join(F.broadcast(n_periods), group_col)
        .orderBy(group_col)
    )


def seasonal_strength_by_group(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    scale: int = 6,
) -> DataFrame:
    """Day-of-week seasonality strength per group: the share of value
    variance explained by the day-of-week profile,
    between-group sum of squares / total sum of squares (a one-way
    variance decomposition — Hyndman's seasonal-strength idea restricted
    to the weekday factor so it stays SQL-exact).

    Two combinable aggregates (per (group, dow) and per group) + one
    broadcast join; every sum is DECIMAL, the final ratio is a single
    double division, rounded. Scan-bound at any scale."""
    # tz-FREE weekday: epoch-day mod 7 — F.dayofweek reads the session
    # timezone, which would shift midnight-adjacent events to a different
    # weekday under a non-UTC session and diverge from the oracle. The dow
    # is only a grouping key, so any consistent epoch-anchored mapping works.
    # grid_round BEFORE the decimal cast (the r10 input-quantization
    # class — a bare double→DECIMAL cast diverges between engines), and
    # dec_double instead of bare casts on the sufficient statistics
    # (their scaled integers pass 2^53 at large value magnitudes — the
    # r11 magnitude sweep caught the oracle's int64 product overflowing
    # here, the gumbel class)
    base = df.where(F.col(value_col).isNotNull()).select(
        group_col,
        (F.floor(F.col(time_col).cast("double") / F.lit(86400.0)) % 7).alias("dow"),
        grid_round(F.col(value_col).cast("double"), 6).cast("decimal(18,6)").alias("x"),
    )
    per_dow = base.groupBy(group_col, "dow").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    per_group = base.groupBy(group_col).agg(
        F.sum("x").alias("st"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("sq"),
        F.count(F.lit(1)).alias("nt"),
    )
    # SS_total = Σx² − (Σx)²/N ; SS_between = Σ_dow (s_d²/n_d) − (Σx)²/N.
    # The ratio is computed with every term NORMALIZED by nt·(sq/nt) = sq
    # (it cancels): t_d = s_d²/(n_d·sq) ∈ [0,1] and c = st²/(nt·sq) ∈
    # [0,1], so strength = (Σt_d − c)/(1 − c). The t_d accumulate as
    # 1e-9-grid SCALED INTEGERS (exact DECIMAL sum) — the old raw-double
    # Σ s_d²/n_d was partition-order-dependent (the token_entropy
    # nondeterminism class, r11 sweep follow-up) and its magnitude made
    # any absolute quantization grid impossible; normalized terms carry 9
    # absolute digits on [0,1].
    joined = per_dow.join(F.broadcast(per_group), group_col)
    sqd = dec_double(F.col("sq"))
    std = dec_double(F.col("st"))
    td = (dec_double(F.col("s")) * dec_double(F.col("s"))) / (
        F.col("n").cast("double") * sqd
    )
    tsi = (
        F.when(F.col("sq") > 0, F.floor(td * 1e9 + 0.5)).otherwise(F.lit(0))
        .cast("decimal(38,0)")
    )
    red = joined.groupBy(group_col, "st", "sq", "nt").agg(F.sum(tsi).alias("tsum"))
    c = (std * std) / (F.col("nt").cast("double") * sqd)
    num = F.col("tsum").cast("double") / 1e9 - c
    return (
        red.select(
            F.col(group_col),
            F.col("nt").alias("n_obs"),
            # zero total variance (single row / all-equal group, or the
            # all-zero sq = 0 case) → NULL, never an ANSI divide-by-zero
            # vs DuckDB's Inf (r11 sweep); grid_round, not engine round()
            F.when(
                (F.col("sq") > 0) & (1.0 - c != 0),
                grid_round(num / (1.0 - c), scale),
            ).alias("seasonal_strength"),
        )
        .orderBy(group_col)
    )


def theil_sen_trend_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    decimals: int = 6,
) -> DataFrame:
    """Theil-Sen robust trend per group (Theil 1950 / Sen 1968, public):
    the MEDIAN of all pairwise slopes between daily means — up to ~29%
    outlier-contaminated days cannot move it, where the OLS slope
    (`grouped_linear_trend`) follows any heavy day.

    Scale shape: the raw stream collapses to one row per (group, day)
    first (map-side-combinable decimal aggregate); the O(days^2) pairwise
    stage then runs on the COLLAPSED frame only — bounded by the time
    window (30 days -> 435 pairs/group), never by row count. For
    multi-year series, apply per rolling window.

    Determinism: daily means are double divisions of exact DECIMAL sums;
    slopes are fixed double expressions; the median picks by row_number
    (avg of the two middles when even), so both engines sort the identical
    doubles — equal slopes are interchangeable under any tie order."""
    daily = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col),
            F.floor(F.col(ts_col).cast("double") / F.lit(86400.0)).alias("_day"),
        )
        .agg(
            # input-side quantization via grid_round (r10 sweep): engine
            # round() on a raw double diverges cross-engine on
            # shortest-decimal half-grid inputs — same class as the finals
            F.sum(grid_round(F.col(value_col), decimals).cast(f"decimal(18,{decimals})")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            group_col,
            "_day",
            (F.col("_s").cast("double") / F.col("_n").cast("double")).alias("_m"),
        )
    )
    a = daily.select(F.col(group_col), F.col("_day").alias("d1"), F.col("_m").alias("m1"))
    b = daily.select(F.col(group_col), F.col("_day").alias("d2"), F.col("_m").alias("m2"))
    slopes = (
        a.join(b, group_col)
        .where(F.col("d1") < F.col("d2"))
        .select(
            group_col,
            ((F.col("m2") - F.col("m1")) / (F.col("d2") - F.col("d1")).cast("double")).alias(
                "_slope"
            ),
        )
    )
    w = Window.partitionBy(group_col).orderBy("_slope")
    ranked = slopes.select(
        group_col,
        "_slope",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("_cnt"),
    )
    mid = ranked.where(
        (F.col("_rn") == F.floor((F.col("_cnt") + 1) / 2))
        | (F.col("_rn") == F.floor(F.col("_cnt") / 2) + 1)
    )
    return (
        mid.groupBy(group_col)
        .agg(
            # r10 rounding sweep: the median slope is a RATIONAL chain
            # (decimal means over integer day gaps, averaged over 1-2
            # middles) — the winsorized half-grid class — so the final
            # quantization is grid_round, not engine round()
            grid_round(F.sum("_slope") / F.count(F.lit(1)), decimals).alias("ts_slope"),
            F.max("_cnt").alias("n_pairs"),
        )
        .select(group_col, "n_pairs", "ts_slope")
    )


def xcorr_lags(
    df: DataFrame,
    type_a: str,
    type_b: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    max_lag: int = 7,
    decimals: int = 6,
) -> DataFrame:
    """Daily cross-correlation profile between two series: Pearson r of
    (A on day d, B on day d-lag) for lag in 0..max_lag — does series B
    LEAD series A, and by how many days? Emits the whole lag table rather
    than an argmax so no float comparison ever decides a row's presence.

    Shape: the stream collapses to one decimal sum per (type, day); the
    lag fan-out explodes max_lag+1 small rows per day of the COLLAPSED
    A-series; all Pearson sufficient statistics are exact DECIMAL products
    and the final r is one fixed double expression per lag."""
    dec = f"decimal(18,{decimals})"
    daily = (
        df.where(F.col(group_col).isin([type_a, type_b]) & F.col(value_col).isNotNull())
        .groupBy(
            group_col,
            F.floor(F.col(ts_col).cast("double") / F.lit(86400.0)).alias("_day"),
        )
        .agg(F.sum(grid_round(F.col(value_col), decimals).cast(dec)).alias("_v"))
    )
    a = daily.where(F.col(group_col) == type_a).select(
        F.col("_day").alias("da"), F.col("_v").alias("x")
    )
    b = daily.where(F.col(group_col) == type_b).select(
        F.col("_day").alias("db"), F.col("_v").alias("y")
    )
    fan = a.select(
        "da", "x", F.explode(F.sequence(F.lit(0), F.lit(max_lag))).alias("lag")
    )
    paired = fan.join(b, fan.da - fan.lag == b.db)
    stats = paired.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_days").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    denom = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    # r is RATIONAL whenever the two variance factors form a perfect
    # square (proportional series make it exact) — half-grid class (r10
    # review): grid_round, not engine round()
    r = F.when(denom > 0, grid_round((n * sxy - sx * sy) / denom, decimals))
    return stats.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n_days").cast("long").alias("n_days"),
        r.alias("xcorr"),
    ).orderBy("lag")


def survival_hazard_curve(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    start_type: str = "signup",
    event_type: str = "purchase",
    decimals: int = 6,
) -> DataFrame:
    """Time-to-event curve (Kaplan & Meier 1958 / Nelson-Aalen, public):
    per day-since-signup t — users at risk, conversion events, censorings,
    the Nelson-Aalen cumulative hazard, and the Kaplan-Meier survival
    estimate. Right-censoring at the corpus horizon: a user who never
    converts is observed only until max(ts).

    Determinism: counts are exact integers; the hazard term d/n and
    ln(1-d/n) are rounded to 1e-9 BEFORE their cumulative DECIMAL sums, so
    the running products/sums are partition-order-independent; KM survival
    is exp() of the exact ln-sum, rounded once at the end. Shape: the
    stream collapses to one row per user (combinable min/max aggregate);
    everything after runs on a frame bounded by the observation window in
    days."""
    from ..session import lineage_pin

    # starts feeds the event join, the per-user frame AND the risk-set
    # total (3 references) — unpinned, each re-ran the signup scan+groupBy
    # (r12 plan sweep). User-scale narrow rows.
    starts = lineage_pin(
        df.where(F.col(type_col) == start_type)
        .groupBy(user_col)
        .agg(F.min(F.col(ts_col).cast("double")).alias("t0"))
    )
    horizon = df.agg(F.max(F.col(ts_col).cast("double")).alias("tmax"))
    events = (
        df.where(F.col(type_col) == event_type)
        .select(user_col, F.col(ts_col).cast("double").alias("te"))
        .join(starts, user_col)
        .where(F.col("te") >= F.col("t0"))
        .groupBy(user_col)
        .agg(F.min("te").alias("te"), F.min("t0").alias("t0"))
    )
    per_user = (
        starts.join(events.select(user_col, "te"), user_col, "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            user_col,
            F.when(
                F.col("te").isNotNull(),
                F.floor((F.col("te") - F.col("t0")) / 86400.0),
            ).alias("event_day"),
            F.floor((F.col("tmax") - F.col("t0")) / 86400.0).alias("censor_day"),
        )
    )
    per_day = per_user.groupBy(
        F.coalesce(F.col("event_day"), F.col("censor_day")).alias("t")
    ).agg(
        F.sum(F.when(F.col("event_day").isNotNull(), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("event_day").isNull(), 1).otherwise(0)).alias("c"),
    )
    total = starts.agg(F.count(F.lit(1)).alias("n0"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = per_day.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        "c",
        (F.col("n0") - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w), F.lit(0))).alias("n_risk"),
    )
    dec9 = "decimal(28,9)"
    # r10 rounding sweep: hterm = d/n_risk is RATIONAL and lands EXACTLY
    # on the 1e-9 half-grid for realistic cohorts — d odd, n_risk = 1024
    # gives d·5⁹/2, a half-integer in grid units — the winsorized
    # divergence class, so the 1e-9 pre-quantization is grid_round, not
    # engine round(). lnterm is log-irrational (tie measure-zero) but uses
    # the same form for one uniform semantics.
    hterm = grid_round(
        F.col("d").cast("double") / F.col("n_risk").cast("double"), 9
    ).cast(dec9)
    # At the full-depletion step (n_risk == d) the KM factor is exactly 0 —
    # ln(0) is undefined, so that row's lnterm is pinned to 0 and survival
    # is forced to 0 from that step on, instead of dropping the row (which
    # silently truncated the curve's defined final time point — r8 ADVICE).
    depleted = F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    lnterm = grid_round(
        F.when(F.col("d") == F.col("n_risk"), F.lit(0.0)).otherwise(
            F.log(1.0 - F.col("d").cast("double") / F.col("n_risk").cast("double"))
        ),
        9,
    ).cast(dec9)
    cw = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    km = F.when(F.max(depleted).over(cw) == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(lnterm).over(cw).cast("double"))
    )
    return (
        at_risk
        .select(
            F.col("t").cast("long").alias("days_since_signup"),
            F.col("n_risk").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("n_converted"),
            F.col("c").cast("long").alias("n_censored"),
            # cum_hazard is a 1e-9 DECIMAL sum cast to double — it can sit
            # exactly on the 1e-6 half-grid (e.g. a 0.0000005 running sum),
            # so the final is grid_round too; km is exp() (irrational,
            # tie measure-zero) and uses the same form for uniformity.
            grid_round(F.sum(hterm).over(cw).cast("double"), decimals).alias("cum_hazard"),
            grid_round(km, decimals).alias("km_survival"),
        )
        .orderBy("days_since_signup")
    )


def two_proportion_ab_test(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    conversion_type: str = "purchase",
    decimals: int = 6,
) -> DataFrame:
    """Two-proportion z-test over a deterministic 50/50 user split
    (variant = user_id mod 2): conversion = the user has at least one
    `conversion_type` event. The closed-form experiment readout every
    event pipeline ends with — pooled-variance z, per-variant rates.

    Exactness: every input to the z formula is an exact integer count;
    the z and rates are fixed double expressions rounded once. One
    combinable per-user aggregate + one 2-row rollup."""
    per_user = df.groupBy(user_col).agg(
        F.max(F.when(F.col(type_col) == conversion_type, 1).otherwise(0)).alias("conv")
    )
    per_variant = (
        per_user.select((F.col(user_col) % 2).cast("int").alias("variant"), "conv")
        .groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k"))
    )
    a = per_variant.where(F.col("variant") == 0).select(
        F.col("n").alias("n0"), F.col("k").alias("k0")
    )
    b = per_variant.where(F.col("variant") == 1).select(
        F.col("n").alias("n1"), F.col("k").alias("k1")
    )
    j = a.crossJoin(b)
    n0, k0 = F.col("n0").cast("double"), F.col("k0").cast("double")
    n1, k1 = F.col("n1").cast("double"), F.col("k1").cast("double")
    pool = (k0 + k1) / (n0 + n1)
    se = F.sqrt(pool * (1.0 - pool) * (1.0 / n0 + 1.0 / n1))
    return j.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("k0").cast("long").alias("conv_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        F.col("k1").cast("long").alias("conv_treatment"),
        # r10 rounding sweep: the conversion rates are int/int RATIONALS —
        # the winsorized half-grid class (e.g. k/n whose shortest-decimal
        # lands on ...5 at digit 7) — so they quantize with grid_round.
        # z_score's denominator is a sqrt (irrational, tie measure-zero);
        # same form for uniformity.
        grid_round(k0 / n0, decimals).alias("rate_control"),
        grid_round(k1 / n1, decimals).alias("rate_treatment"),
        F.when(se > 0, grid_round((k1 / n1 - k0 / n0) / se, decimals)).alias("z_score"),
    )


def user_behavior_entropy(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    decimals: int = 6,
) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity feature (bots/scrapers sit near 0, organic users
    spread). Each -p*ln(p) term is rounded to 1e-9 before the exact
    DECIMAL sum, so the per-user entropy is identical under any
    aggregation order. Two combinable aggregates, no window."""
    per = df.groupBy(user_col, type_col).agg(F.count(F.lit(1)).alias("c"))
    tot = df.groupBy(user_col).agg(F.count(F.lit(1)).alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    # r11 sweep: grid_round, not engine round() — the term is
    # log-irrational (half-grid ties measure-zero) but at d=9 the
    # magnitude-divergence mode starts at ~9e6·1e-9 = 9e-3, well inside
    # the term's [0, 1/e] range, so DuckDB's ×10^9 scaling can lose the
    # deciding ulp on ordinary values; the grid form is the same IEEE
    # expression in both engines.
    term = grid_round(-p * F.log(p), 9).cast("decimal(28,9)")
    return (
        per.join(tot, user_col)
        .groupBy(user_col, "n")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            # r10 rounding sweep: the entropy is a 1e-9 DECIMAL sum cast
            # to double — it can sit exactly on the 1e-6 half-grid (the
            # cum_hazard mechanism), so the final is grid_round
            grid_round(F.sum(term).cast("double"), decimals).alias("entropy"),
        )
        .select(
            user_col,
            F.col("n").cast("long").alias("n_events"),
            F.col("n_types").cast("long").alias("n_types"),
            "entropy",
        )
    )


def sequential_pattern_support(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Any-gap sequential-pattern support for ordered type pairs A->B
    (Agrawal & Srikant 1995 sequential patterns, restricted to length-2 so
    it stays one aggregate): a user supports A->B iff SOME A-event precedes
    SOME B-event — equivalently min_ts(A) < max_ts(B), so the whole mining
    collapses to per-(user, type) min/max timestamps (map-side combinable)
    followed by a type-dictionary-sized self-join per user. Distinct from
    `event_transition_matrix`, which counts only ADJACENT transitions.

    Output per ordered pair: supporting users, users with both types, and
    the confidence ratio. Exact integers + one double division."""
    spans = df.groupBy(user_col, type_col).agg(
        F.min(F.col(ts_col)).alias("_min"), F.max(F.col(ts_col)).alias("_max")
    )
    a = spans.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("type_a"), F.col("_min").alias("amin")
    )
    b = spans.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("type_b"), F.col("_max").alias("bmax")
    )
    pairs = a.join(b, "u").where(F.col("type_a") != F.col("type_b"))
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_users_both"),
            F.sum(F.when(F.col("amin") < F.col("bmax"), 1).otherwise(0)).alias("n_users_ordered"),
        )
        .select(
            "type_a",
            "type_b",
            F.col("n_users_both").cast("long").alias("n_users_both"),
            F.col("n_users_ordered").cast("long").alias("n_users_ordered"),
            (F.col("n_users_ordered").cast("double") / F.col("n_users_both").cast("double")).alias(
                "support_ratio"
            ),
        )
        .orderBy("type_a", "type_b")
    )


def _check_group_rows_bound(
    df: DataFrame, group_expr, bound: int, op_name: str
) -> None:
    """Opt-in pre-check for the DECIMAL(38,0) sufficient-statistics
    operators (r9 ADVICE): under Spark 4's default ANSI mode exceeding the
    documented rows-per-group bound fails the whole job with an opaque
    decimal-overflow error. This runs one cheap combinable count and
    raises a DIAGNOSABLE error naming the operator, the group size, and
    the mitigation instead. Opt-in because it is an extra job."""
    mx_row = (
        df.groupBy(group_expr)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n").alias("_mx"))
        .collect()
    )
    mx = mx_row[0]["_mx"] if mx_row else None
    if mx is not None and mx > bound:
        raise ValueError(
            f"{op_name}: a group holds {mx} rows, past the DECIMAL(38,0) "
            f"sufficient-statistics bound (~{bound:.0e} rows/group) — the "
            f"aggregate would overflow (ANSI mode: job failure). "
            f"Pre-aggregate, shard the group, or sample before correlating."
        )


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col,
    scale: int = 6,
    check_bound: bool = False,
    _bound_rows: int | None = None,
) -> DataFrame:
    """Spearman rank correlation per group between two expressions, with
    the statistically standard AVERAGE ranks for ties — computed exactly:
    2*avg_rank = 2*rank_min + (tie_count - 1) is an INTEGER, and Pearson's
    rho is scale-invariant, so the whole statistic reduces to integer
    sufficient statistics (n, Σa, Σb, Σa², Σb², Σab over the doubled ranks)
    combined in ONE double expression — bit-identical on any engine, no
    float accumulation anywhere. No tiebreak column is needed: average
    ranks are tie-INVARIANT by construction (r9 review dropped the dead
    parameter).

    The sufficient statistics are DECIMAL(38,0), not BIGINT: Σa² and Σab
    reach ~4n³ and the n·Σab cross terms ~4n⁴, which silently wraps (or
    ANSI-throws) 64-bit math past ~40k rows per group — found in the r9
    follow-up review, latent at exactly the 100 TB tier this operator
    targets. Decimal headroom holds to ~10⁹ rows per group (documented
    bound; beyond that the 1e-6-rounded rho is rank-noise-dominated
    anyway). Values are unchanged wherever the long math didn't overflow.

    Shape: two window ranks (same per-group shuffle), one combinable
    aggregate. The rank windows sort within groups only — no global sort."""
    x = x_col if not isinstance(x_col, str) else F.col(x_col)
    y = y_col if not isinstance(y_col, str) else F.col(y_col)
    base = df.select(
        F.col(group_col).alias("g"),
        x.alias("_x"),
        y.alias("_y"),
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    if check_bound:
        # Σa² ~ 4n³ and n·Σab ~ 4n⁴ over doubled ranks: 4n⁴ < 10³⁸ →
        # n < ~2.2e9; the guarded bound is a conservative 1e9 (the
        # docstring's documented headroom)
        _check_group_rows_bound(
            base, F.col("g"), _bound_rows or 1_000_000_000, "spearman_by_group"
        )

    def doubled_rank(col: str):
        wr = Window.partitionBy("g").orderBy(F.col(col))
        wt = Window.partitionBy("g", col)
        # 2*average_rank = 2*min_rank + (ties - 1): exact integer. rank()
        # is INT — widen BEFORE doubling, or rank > 2^30 overflows int32
        # upstream of the decimal sums (review follow-up to the r9 fix)
        return (
            F.rank().over(wr).cast("long") * 2 + F.count(F.lit(1)).over(wt) - 1
        ).cast("decimal(19,0)")

    ranked = base.select(
        "g", doubled_rank("_x").alias("a"), doubled_rank("_y").alias("b")
    )
    d38 = "decimal(38,0)"
    agg = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("a").cast(d38).alias("sa"),
        F.sum("b").cast(d38).alias("sb"),
        F.sum((F.col("a") * F.col("b")).cast(d38)).cast(d38).alias("sab"),
        F.sum((F.col("a") * F.col("a")).cast(d38)).cast(d38).alias("saa"),
        F.sum((F.col("b") * F.col("b")).cast(d38)).cast(d38).alias("sbb"),
    )
    num = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    den = F.sqrt(
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
        * (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    )
    return (
        agg.select(
            F.col("g").alias(group_col),
            F.col("n").cast("long").alias("n"),
            # rho is RATIONAL when the x/y rank-variance factors match
            # (den = sqrt(A·B) exact for A = B) — half-grid class (r10
            # review): grid_round, not engine round()
            F.when(den > 0, grid_round(num.cast("double") / den, scale)).alias("spearman_rho"),
        )
        .orderBy(group_col)
    )


def winsorized_mean_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    winsor_fraction: float = 0.1,
    scale: int = 6,
) -> DataFrame:
    """Winsorized per-group mean: the lowest and highest floor(n·f) rows BY
    RANK are CLAMPED to the nearest kept value (vs `trimmed_mean_by_group`,
    which drops them — winsorizing keeps n constant, the robust-statistics
    textbook pair). Rank-based cuts avoid percentile interpolation whose
    semantics differ across engines; with the (value, tiebreak) total order
    the clamp boundaries are identical everywhere, and the mean is an exact
    DECIMAL sum divided once. One window sort per group."""
    wg = Window.partitionBy(group_col)
    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(tiebreak_col))
    ranked = (
        df.where(F.col(value_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
        .withColumn("_cut", F.floor(F.col("_n") * F.lit(winsor_fraction)))
    )
    dec = "decimal(18,6)"
    # input-side quantization via grid_round (r10 sweep — engine round()
    # on raw doubles is the same cross-engine divergence class)
    v = grid_round(F.col(value_col), 6).cast(dec)
    lo = F.max(F.when(F.col("_rn") == F.col("_cut") + 1, v)).over(wg)
    hi = F.max(F.when(F.col("_rn") == F.col("_n") - F.col("_cut"), v)).over(wg)
    clamped = (
        F.when(F.col("_rn") <= F.col("_cut"), lo)
        .when(F.col("_rn") > F.col("_n") - F.col("_cut"), hi)
        .otherwise(v)
    )
    # engine-exact grid quantization (`grid_round`), NOT engine round():
    # the mean is an exact DECIMAL sum over an integer count — a RATIONAL
    # value that can land exactly on the half-grid, where Spark rounds the
    # double's shortest-decimal representation HALF_UP and DuckDB rounds
    # the binary value (hypothesis found a live divergence: sum
    # 99997.999929 / 6 → ...321 vs ...322). Ties round away from zero
    # (r10: sign-symmetric form, see grid_round).
    mean = F.sum("_cv").cast("double") / F.count(F.lit(1))
    return (
        ranked.withColumn("_cv", clamped)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            grid_round(mean, scale).alias("winsorized_mean"),
        )
        .orderBy(group_col)
    )


def burstiness_by_group(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    scale: int = 6,
    check_bound: bool = False,
    _bound_rows: int | None = None,
) -> DataFrame:
    """Burstiness of the per-day event-count series per group: the Fano
    factor (variance/mean of daily counts — 1 for a Poisson process, >1
    bursty, <1 regular) and the Goh–Barabási burstiness coefficient
    B = (σ−μ)/(σ+μ) ∈ [−1, 1). The dispersion diagnostics behind rate
    limiting and bot detection in event pipelines.

    The day series is zero-filled over the CORPUS-WIDE observation window
    [min day, max day] — a group firing everything in one day of a 90-day
    corpus must read as bursty, not as "one perfectly regular day" (the
    inversion an events-days-only denominator produces — r9 review). Zero
    days contribute nothing to Σc/Σc², so the fill is just the window span
    as n: no row explosion.

    Exactness: daily counts are exact integers; population variance comes
    from the integer sufficient statistics (n·Σc² − (Σc)²)/n², so Fano and
    B are each ONE double expression of exact ints, rounded once. Two
    combinable aggregates (day rollup, then group rollup) + a broadcast
    1-row corpus span — no windows."""
    # epoch-day bucket (tz-neutral — the repo-wide discipline for cross-
    # engine date math; calendar to_date would shift on non-UTC engines)
    day = F.floor(F.col(ts_col).cast("double") / 86400.0)
    if check_bound:
        # s·s with s = total rows/group must stay within DECIMAL(38,0):
        # s < ~1e19; guarded conservatively at 1e15 (r9 ADVICE — surface
        # the bound as a diagnosable error instead of an ANSI overflow)
        _check_group_rows_bound(
            df.select(F.col(group_col).alias("g")),
            F.col("g"),
            _bound_rows or 1_000_000_000_000_000,
            "burstiness_by_group",
        )
    span = df.agg(
        (F.max(day) - F.min(day) + 1).cast("long").alias("n")
    )
    daily = df.groupBy(
        F.col(group_col).alias("g"), day.alias("_d")
    ).agg(F.count(F.lit(1)).alias("c"))
    # DECIMAL(38,0) sufficient statistics: s is the group's TOTAL row count,
    # so s·s in BIGINT wraps (ANSI: throws) past ~3e9 rows/group — the same
    # latent-overflow class the r9 follow-up review fixed in spearman.
    # Identical values wherever the long math didn't overflow.
    d38 = "decimal(38,0)"
    agg = daily.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum("c").cast(d38).alias("s"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c")).cast(d38).alias("ss"),
    ).crossJoin(F.broadcast(span))
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    mean = s.cast("double") / n.cast("double")
    var = (n * ss - s * s).cast("double") / (n * n).cast("double")
    sigma = F.sqrt(var)
    # pure-double grid finals (`grid_round`): mean and fano are RATIONAL
    # (integer sufficient statistics) and B is rational whenever the
    # variance is a perfect square — all can land exactly on the half-grid
    # where engine round() diverges (the hypothesis-found winsorized
    # class). B is the one possibly-NEGATIVE final here (σ < μ), so the
    # r10 sign-symmetric form matters: its ties round away from zero.
    def q(c):
        return grid_round(c, scale)

    return (
        agg.select(
            F.col("g").alias(group_col),
            n.cast("long").alias("n_days"),
            F.col("n_active").cast("long").alias("n_active_days"),
            q(mean).alias("mean_daily"),
            F.when(s > 0, q(var / mean)).alias("fano_factor"),
            F.when((sigma + mean) > 0, q((sigma - mean) / (sigma + mean))).alias(
                "burstiness"
            ),
        )
        .orderBy(group_col)
    )


def next_event_conditional_entropy(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    scale: int = 6,
) -> DataFrame:
    """Conditional entropy of the NEXT event type given the current one:
    for each current type, H(next | current) = ln(T) − (Σ_next c·ln c)/T
    over the per-user ADJACENT transition counts. The predictability
    readout on top of the transition matrix (`event_transition_matrix`
    emits the probabilities; this collapses each row to one number — a
    type whose successor is near-deterministic scores ~0, a uniformly
    unpredictable one scores ln(n_types)).

    Determinism: transition counts are exact integers from the (user)
    window; each c·ln(c) term is rounded to 1e-9 and summed as exact
    DECIMAL (type-dictionary-sized sum), then H is one double expression
    rounded once. One window per user + two combinable aggregates."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    trans = (
        df.select(user_col, type_col, ts_col, id_col)
        .withColumn("_next", F.lead(type_col).over(w))
        .where(F.col("_next").isNotNull())
        .groupBy(F.col(type_col).alias("cur"), F.col("_next").alias("nxt"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dec9 = "decimal(28,9)"
    # r10 rounding sweep: c·ln(c) is log-irrational (half-grid ties are
    # measure-zero) but MAGNITUDE-exposed — past c ≈ 5e5 the term exceeds
    # ~9e6, where DuckDB's round() scales by 1e9 in double and loses ulps
    # that Spark's BigDecimal keeps (the falsified TWAP mechanism). The
    # grid form is the same IEEE ops in both engines at ANY magnitude.
    term = grid_round(
        F.col("c").cast("double") * F.log(F.col("c").cast("double")), 9
    ).cast(dec9)
    agg = trans.groupBy("cur").agg(
        F.sum("c").alias("t"),
        F.count(F.lit(1)).alias("k"),
        F.sum(term).alias("clnc"),
    )
    h = F.log(F.col("t").cast("double")) - F.col("clnc").cast("double") / F.col("t").cast("double")
    return agg.select(
        F.col("cur").alias("event_type"),
        F.col("t").cast("long").alias("n_transitions"),
        F.col("k").cast("long").alias("n_next_types"),
        # final: ln(t) − clnc/t — the clnc/t part is a quantized-decimal /
        # integer rational; grid_round for the same half-grid safety
        grid_round(h, scale).alias("next_entropy"),
    ).orderBy("event_type")


def twap_by_group(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    scale: int = 6,
) -> DataFrame:
    """Time-weighted average (trapezoidal) of an irregularly-sampled series
    per group: Σ (vᵢ₋₁+vᵢ)/2 · Δtᵢ / Σ Δtᵢ over consecutive observations —
    the unbiased mean when sampling density varies (the finance/telemetry
    TWAP), vs the naive row mean that over-weights dense bursts.

    Determinism (r9 follow-up hardening — a hypothesis run falsified the
    previous formulation live): the series order is the (ts, id) total
    order; Δt is EXACT INTEGER MICROSECONDS (unix_micros — never a double
    timestamp difference), values are 1e-6 DECIMALs, and the trapezoid
    numerator Σ (vᵢ₋₁+vᵢ)·Δtᵢ accumulates as EXACT DECIMAL with no
    intermediate rounding at all. The old per-segment `round(x, 9)` on a
    double was engine-divergent at MAGNITUDE: DuckDB scales by 1e9 in
    double (loses ulps past ~9e6) while Spark rounds via BigDecimal —
    measured one-ulp area drift on a 1.26e9 contribution. With the exact
    numerator, twap = area2 / (2·span_us) is ONE double division
    quantized on the pure-double 1e-6 grid. One window per group (single
    shuffle) + one combinable aggregate."""
    dec6 = "decimal(18,6)"
    w = Window.partitionBy("g").orderBy(F.col("_t"), F.col("_id"))
    base = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.unix_micros(F.col(ts_col)).alias("_t"),
            grid_round(F.col(value_col), 6).cast(dec6).alias("_v"),
            F.col(id_col).alias("_id"),
        )
        .withColumn("_pt", F.lag("_t").over(w))
        .withColumn("_pv", F.lag("_v").over(w))
        .where(F.col("_pt").isNotNull())
    )
    dt_us = F.col("_t") - F.col("_pt")
    # (pv+v)·Δt_us: decimal(19,6) × long → decimal(38,6), exact while the
    # product fits 32 integral digits (|v| ≤ 1e12 over ≤ ~30-year spans)
    contrib = (F.col("_pv") + F.col("_v")).cast("decimal(19,6)") * dt_us
    agg = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(dt_us).cast("decimal(38,0)").alias("span_us"),
        F.sum(contrib).alias("area2"),
    )
    # grid_round finals (r10 sign-symmetric): twap is a RATIONAL double
    # division (exact decimal / integer microseconds) and CAN be negative
    # with negative-valued series — ties round away from zero, matching
    # engine-native round() semantics while staying engine-identical.
    def q(c):
        return grid_round(c, scale)

    span_d = F.col("span_us").cast("double")
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n_segments").cast("long").alias("n_segments"),
        q(span_d / F.lit(1e6)).alias("total_span_sec"),
        F.when(
            F.col("span_us") > 0,
            q(F.col("area2").cast("double") / (F.lit(2.0) * span_d)),
        ).alias("twap"),
    ).orderBy(group_col)


def kendall_tau_daily_level_volume(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 6,
) -> DataFrame:
    """Kendall's tau-b per group between the DAILY MEAN level and the DAILY
    VOLUME (event count) — "do busy days run hot or cold?", the
    concordance question behind load-dependent quality drift. tau-b is the
    ties-corrected Kendall coefficient (Kendall 1945):
    (C − D) / sqrt((n0 − t_x)(n0 − t_y)) over all day pairs, with
    n0 = n(n−1)/2 and t_x/t_y the tied-pair counts per variable.

    Volume counts ALL events on a day (including rows whose value is NULL
    — heartbeats without a measurement still ARE load); the level mean
    divides only over the measured rows. Days with no measured value at
    all have no level and are excluded from the pairing (r9 review: the
    previous form silently undercounted busy days' volume when NULL
    values concentrate there).

    Exactness end to end: day means are never divided — comparing
    s_i/cv_i vs s_j/cv_j uses the cross-multiplication sign(s_i·cv_j −
    s_j·cv_i) over exact DECIMAL sums and integer measured-counts (the
    Mann-Kendall discipline); volumes are integers; C, D and the tie
    counts are exact integers from ONE self-join over the collapsed daily
    frame (quadratic in days, never in rows); tau is one double expression
    rounded once."""
    day = F.floor(F.col(ts_col).cast("double") / 86400.0)
    daily = (
        df.groupBy(F.col(group_col).alias("g"), day.alias("d"))
        .agg(
            F.sum(grid_round(F.col(value_col), 6).cast("decimal(18,6)")).alias("s"),
            F.count(value_col).alias("cv"),  # measured rows: mean denominator
            F.count(F.lit(1)).alias("c"),    # ALL rows: the day's volume
        )
        .where(F.col("cv") > 0)  # a day with no measurements has no level
    )
    a = daily.select(
        "g", F.col("d").alias("da"), F.col("s").alias("sa"),
        F.col("cv").alias("cva"), F.col("c").alias("ca"),
    )
    b = daily.select(
        "g", F.col("d").alias("db"), F.col("s").alias("sb"),
        F.col("cv").alias("cvb"), F.col("c").alias("cb"),
    )
    pairs = a.join(b, "g").where(F.col("da") < F.col("db"))
    # sign of mean difference without dividing: sa/cva vs sb/cvb
    x_cmp = F.signum((F.col("sb") * F.col("cva") - F.col("sa") * F.col("cvb")).cast("double"))
    y_cmp = F.signum((F.col("cb") - F.col("ca")).cast("double"))
    agg = pairs.groupBy("g").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(x_cmp * y_cmp > 0, 1).otherwise(0)).alias("conc"),
        F.sum(F.when(x_cmp * y_cmp < 0, 1).otherwise(0)).alias("disc"),
        F.sum(F.when(x_cmp == 0, 1).otherwise(0)).alias("tx"),
        F.sum(F.when(y_cmp == 0, 1).otherwise(0)).alias("ty"),
    )
    den = F.sqrt(
        (F.col("n0") - F.col("tx")).cast("double") * (F.col("n0") - F.col("ty")).cast("double")
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n0").cast("long").alias("n_day_pairs"),
        F.col("conc").cast("long").alias("n_concordant"),
        F.col("disc").cast("long").alias("n_discordant"),
        # tau_b is RATIONAL for tie-free groups (den = sqrt(n0²) = n0) —
        # half-grid class (r10 review): grid_round, not engine round()
        F.when(den > 0, grid_round((F.col("conc") - F.col("disc")).cast("double") / den, scale)).alias(
            "kendall_tau_b"
        ),
    ).orderBy(group_col)


def mann_whitney_u_by_variant(
    df: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    scale: int = 6,
) -> DataFrame:
    """Mann–Whitney U rank test between two variants (Mann & Whitney 1947,
    public): the nonparametric complement to `two_proportion_ab_test` for
    CONTINUOUS metrics — does variant 1's value distribution stochastically
    dominate variant 0's, without any normality assumption. Variant =
    user_id % 2 (the same deterministic split the A/B z-test uses).

    Tie-exact integer statistics via the doubled-rank identity shared with
    `spearman_by_group`: 2·avg_rank = 2·min_rank + (ties − 1) is an
    INTEGER, so 2·R1 (the doubled rank sum of variant 1) is an exact
    DECIMAL sum and U1 = R1 − n1(n1+1)/2 derives from it without any float
    accumulation. Emits U1, the rank-biserial effect size
    r = 2·U1/(n1·n2) − 1 ∈ [−1, 1] (RATIONAL → grid_round, the half-grid
    class), and the tie-corrected z statistic (sqrt-denominated; grid for
    uniformity).

    Shape: one global rank window over the pooled values (the two-sample
    test is one total order by definition — at 100 TB pre-aggregate to a
    value histogram and rank the DICTIONARY, same trick as the linkage
    collapse) + one combinable aggregate. Tie correction Σ(t³−t) comes
    from the same window pass.
    """
    base = df.where(F.col(value_col).isNotNull()).select(
        (F.col(user_col) % 2).cast("int").alias("variant"),
        F.col(value_col).alias("_v"),
    )
    wr = Window.orderBy("_v")
    wt = Window.partitionBy("_v")
    # doubled average rank (exact integer), tie-group size for correction
    ranked = base.select(
        "variant",
        (F.rank().over(wr).cast("long") * 2 + F.count(F.lit(1)).over(wt) - 1)
        .cast("decimal(19,0)")
        .alias("r2"),
        F.count(F.lit(1)).over(wt).cast("long").alias("t"),
    )
    agg = ranked.groupBy().agg(
        F.sum(F.when(F.col("variant") == 1, F.col("r2"))).cast("decimal(38,0)").alias("r2sum1"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        # Σ(t³−t) over tie GROUPS = Σ_rows (t³−t)/t = Σ_rows (t²−1), exact;
        # t widens to DECIMAL BEFORE squaring — a long t·t wraps (ANSI:
        # throws) past t ~ 3e9 rows sharing one value, exactly the
        # 100 TB-tier tie a constant default metric produces (r10 review)
        F.sum((F.col("t").cast("decimal(19,0)") * F.col("t") - 1).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("tie3"),
    )
    n1, n0 = F.col("n1").cast("double"), F.col("n0").cast("double")
    n = n1 + n0
    # U1 = R1 − n1(n1+1)/2; with r2sum1 = 2·R1 exact: U1 = (r2sum1 − n1(n1+1))/2
    u1 = (F.col("r2sum1").cast("double") - n1 * (n1 + 1.0)) / 2.0
    mu = n1 * n0 / 2.0
    var = n1 * n0 / 12.0 * ((n + 1.0) - F.col("tie3").cast("double") / (n * (n - 1.0)))
    z = F.when(var > 0, grid_round((u1 - mu) / F.sqrt(var), scale))
    return agg.select(
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        # U is exact in half-units ((int − int)/2 — an exact double), so it
        # is emitted RAW: no cast (Spark long-cast truncates while DuckDB's
        # rounds — a divergence), no quantization needed
        u1.alias("u1"),
        grid_round(2.0 * u1 / (n1 * n0) - 1.0, scale).alias("rank_biserial"),
        z.alias("z_score"),
    )


def welch_t_by_variant(
    df: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    scale: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t statistic between two variants (Welch
    1947, public) — the parametric mean-difference companion to the
    Mann-Whitney rank test, from exact DECIMAL sufficient statistics
    (n, Σv, Σv² per variant after grid-quantized 1e-6 input): means are
    RATIONAL finals (grid_round), t and the Welch–Satterthwaite df are
    sqrt/ratio expressions of the exact sums evaluated once (grid for
    uniformity). One combinable aggregate — a single shuffle of two
    partial rows at any scale."""
    v = grid_round(F.col(value_col), 6).cast("decimal(18,6)")
    base = df.where(F.col(value_col).isNotNull()).select(
        (F.col(user_col) % 2).cast("int").alias("variant"), v.alias("_v")
    )
    per = base.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_v").cast("decimal(38,6)").alias("s"),
        F.sum((F.col("_v") * F.col("_v")).cast("decimal(38,12)")).cast("decimal(38,12)").alias("ss"),
    )
    a = per.where(F.col("variant") == 0).select(
        F.col("n").alias("n0"), F.col("s").alias("s0"), F.col("ss").alias("ss0")
    )
    b = per.where(F.col("variant") == 1).select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("ss").alias("ss1")
    )
    j = a.crossJoin(b)
    n0, n1 = F.col("n0").cast("double"), F.col("n1").cast("double")
    m0 = F.col("s0").cast("double") / n0
    m1 = F.col("s1").cast("double") / n1
    # unbiased sample variance from exact sums: (Σv² − (Σv)²/n) / (n−1)
    v0 = (F.col("ss0").cast("double") - F.col("s0").cast("double") * F.col("s0").cast("double") / n0) / (n0 - 1.0)
    v1 = (F.col("ss1").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / n1) / (n1 - 1.0)
    se2 = v0 / n0 + v1 / n1
    t = F.when(se2 > 0, grid_round((m1 - m0) / F.sqrt(se2), scale))
    dof = F.when(
        se2 > 0,
        grid_round(
            (se2 * se2)
            / ((v0 / n0) * (v0 / n0) / (n0 - 1.0) + (v1 / n1) * (v1 / n1) / (n1 - 1.0)),
            scale,
        ),
    )
    return j.select(
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        grid_round(m0, scale).alias("mean_control"),
        grid_round(m1, scale).alias("mean_treatment"),
        t.alias("welch_t"),
        dof.alias("welch_df"),
    )


def hour_profile_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    scale: int = 6,
) -> DataFrame:
    """Hour-of-day activity profile per group: peak hour (deterministic
    argmax — max count, ties to the EARLIEST hour), the peak's share of
    all events, and the Herfindahl–Hirschman concentration index
    HHI = Σ_h (c_h/total)² ∈ [1/24, 1] — the one-number "is this traffic
    spread or spiky" readout (1/24 = uniform, 1 = single-hour bot burst).

    Exactness: hour counts are exact integers; HHI's numerator Σc² is an
    exact DECIMAL sum, so HHI and peak_share are single RATIONAL double
    divisions — grid_round finals (the half-grid class). Shape: one
    (group, hour) combinable count + one group rollup; the argmax rides
    the same rollup via max_by on an (count, −hour) struct — no window."""
    hour = (F.floor(F.col(ts_col).cast("double") / 3600.0) % 24).cast("int")
    hourly = df.groupBy(F.col(group_col).alias("g"), hour.alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = hourly.groupBy("g").agg(
        F.sum("c").cast("long").alias("total"),
        F.sum((F.col("c").cast("decimal(19,0)") * F.col("c")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sc2"),
        F.max(F.struct(F.col("c").alias("c"), (-F.col("h")).alias("nh"))).alias("_pk"),
        F.count(F.lit(1)).cast("long").alias("n_active_hours"),
    )
    tot = F.col("total").cast("double")
    return agg.select(
        F.col("g").alias(group_col),
        F.col("total").alias("n_events"),
        F.col("n_active_hours"),
        (-F.col("_pk.nh")).cast("int").alias("peak_hour"),
        grid_round(F.col("_pk.c").cast("double") / tot, scale).alias("peak_share"),
        grid_round(F.col("sc2").cast("double") / (tot * tot), scale).alias("hhi"),
    ).orderBy(group_col)


def last_touch_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    conversion_type: str = "purchase",
    window_seconds: int = 7 * 86400,
    scale: int = 6,
) -> DataFrame:
    """Last-touch conversion attribution (the standard marketing/journey
    credit rule, public): each conversion is credited to the LAST
    non-conversion event by the same user within `window_seconds` before
    it. Emits per touch type: conversions credited, credited conversion
    value, and share of attributed conversions (plus an `(unattributed)`
    row for conversions with no touch in the window — dropping them would
    silently inflate every share).

    Shape: ONE user-partitioned window (`last(when(non-conv, struct),
    ignorenulls=True)` over the (ts, id) order gives the most recent touch
    at each conversion — no self-join, no per-type scan), then one
    combinable rollup + a broadcast 1-row total for the shares. Shares are
    int/int RATIONALS → grid_round."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).cast("double"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col(type_col) != conversion_type,
            F.struct(
                F.col(ts_col).cast("double").alias("t"),
                F.col(type_col).alias("typ"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    conv = (
        df.select(
            F.col(user_col),
            F.col(type_col),
            F.col(ts_col),
            F.col(id_col),
            F.col(value_col),
            touch.alias("_touch"),
        )
        .where(F.col(type_col) == conversion_type)
        .select(
            F.when(
                F.col("_touch").isNotNull()
                & (F.col(ts_col).cast("double") - F.col("_touch.t") <= window_seconds),
                F.col("_touch.typ"),
            ).alias("touch_type"),
            F.coalesce(F.col(value_col), F.lit(0.0)).alias("_val"),
        )
    )
    per = conv.groupBy(
        F.coalesce(F.col("touch_type"), F.lit("(unattributed)")).alias("touch_type")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.sum(grid_round(F.col("_val"), 6).cast("decimal(18,6)")).alias("_sv"),
    )
    total = per.agg(F.sum("n_conversions").alias("_tot"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "touch_type",
            "n_conversions",
            grid_round(F.col("_sv").cast("double"), scale).alias("credited_value"),
            grid_round(
                F.col("n_conversions").cast("double") / F.col("_tot").cast("double"), scale
            ).alias("share"),
        )
        .orderBy("touch_type")
    )


def psi_value_drift_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 10,
    scale: int = 6,
) -> DataFrame:
    """Population Stability Index of the value distribution, first half of
    the observation window vs second half, per group — THE production
    drift gate for model inputs (PSI < 0.1 stable, 0.1–0.25 shifting,
    > 0.25 drifted; standard credit-scoring folklore, public). Bins are
    EQUAL-WIDTH over the group's full value range quantized to 1e-6 (the
    same engine-exact binning as `value_histogram` — rank-free, so no
    global sort), halves split at the corpus mid-TIMESTAMP.

    PSI = Σ_bins (p_b − q_b)·ln(p_b / q_b) with Laplace-style ε-floors on
    empty bins (ε = 0.5 count) so a bin emptying out is a large-but-finite
    signal, never a division by zero. Each bin term is grid-quantized to
    1e-9 and summed as exact DECIMAL (order-independent), PSI is one
    grid-rounded final. Shape: two combinable aggregates + a broadcast
    bounds row — no windows, no sort."""
    mid = df.agg(
        ((F.min(F.col(ts_col).cast("double")) + F.max(F.col(ts_col).cast("double"))) / 2.0).alias(
            "_mid"
        )
    )
    v = grid_round(F.col(value_col), 6)
    bounds = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(grid_round(F.min(value_col), 6).alias("_lo"), grid_round(F.max(value_col), 6).alias("_hi"))
    )
    base = (
        df.where(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(mid))
        .select(
            F.col(group_col).alias("g"),
            v.alias("_v"),
            (F.col(ts_col).cast("double") > F.col("_mid")).alias("_late"),
        )
        .join(F.broadcast(bounds), "g")
    )
    bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col("_v") - F.col("_lo")) * n_bins / (F.col("_hi") - F.col("_lo"))).cast(
                "int"
            ),
        )
    )
    observed = base.groupBy("g", bucket.alias("b")).agg(
        F.sum(F.when(~F.col("_late"), 1).otherwise(0)).cast("long").alias("c_early"),
        F.sum(F.when(F.col("_late"), 1).otherwise(0)).cast("long").alias("c_late"),
    )
    # observed feeds totals AND the grid join below — unpinned, each
    # reference re-ran the events scan + bucket aggregate (r12 plan sweep:
    # 18 scan copies in the declared plan). The pinned frame is
    # groups×n_bins rows at ANY corpus scale.
    from ..session import lineage_pin

    observed = lineage_pin(observed)
    totals = observed.groupBy("g").agg(
        F.sum("c_early").cast("long").alias("t_early"),
        F.sum("c_late").cast("long").alias("t_late"),
    )
    # the FULL bin grid per group, not just observed bins (r10 review): a
    # bin empty in BOTH halves still carries its ε-floor term — with
    # unbalanced halves p₀ ≠ q₀ and dropping it understates drift (and the
    # smoothed shares would no longer sum to 1). n_bins rows per group.
    grid_bins = totals.select(
        "g", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("b")
    )
    binned = grid_bins.join(observed, ["g", "b"], "left").select(
        "g",
        "b",
        F.coalesce(F.col("c_early"), F.lit(0)).alias("c_early"),
        F.coalesce(F.col("c_late"), F.lit(0)).alias("c_late"),
    )
    joined = binned.join(totals, "g")
    # ε-floored shares: (c + 0.5) / (t + 0.5·n_bins) keeps empty bins finite
    # and both halves normalized — the standard smoothed-PSI form
    p = (F.col("c_early").cast("double") + 0.5) / (
        F.col("t_early").cast("double") + 0.5 * n_bins
    )
    q = (F.col("c_late").cast("double") + 0.5) / (
        F.col("t_late").cast("double") + 0.5 * n_bins
    )
    term = grid_round((p - q) * F.log(p / q), 9).cast("decimal(28,9)")
    agg = joined.groupBy("g").agg(
        F.max("t_early").alias("n_early"),
        F.max("t_late").alias("n_late"),
        # bins observed in at least one half (the PSI sum itself runs over
        # ALL n_bins rows incl. both-empty ε-floor terms)
        F.sum(F.when(F.col("c_early") + F.col("c_late") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_bins_used"),
        F.sum(term).alias("_psi"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n_early"),
        F.col("n_late"),
        F.col("n_bins_used"),
        grid_round(F.col("_psi").cast("double"), scale).alias("psi"),
    ).orderBy(group_col)


def kruskal_wallis_by_group(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    scale: int = 6,
) -> DataFrame:
    """Kruskal–Wallis H rank test across k groups (Kruskal & Wallis 1952,
    public): the k-sample extension of `mann_whitney_u_by_variant` — do
    the groups' value distributions differ, without any normality
    assumption. The standard pre-gate before investing in per-pair tests.

    Tie-exact integer rank statistics via the shared doubled-rank identity
    (2·avg_rank = 2·min_rank + ties − 1 is an INTEGER): per-group doubled
    rank sums and the tie term Σ(t³−t) = Σ_rows(t²−1) accumulate as exact
    DECIMALs. Each group's R_j²/n_j term is one IEEE expression of those
    exact sums quantized on the 1e-2 grid (coarse on purpose: the term is
    O(N²)-scaled, so d=2 keeps the 2^62/10^d guard at 4.6e16 — N up to
    ~1e8 ranked rows before the identity branch; past that, rank the value
    DICTIONARY, the mann_whitney mitigation), summed exactly over the
    group frame; H and the tie-corrected H' are single expressions of the
    exact reduces, on the shared 1e-6 grid.

    Shape: one global rank window over pooled values (the test is one
    total order by definition) + one (group) aggregate + one k-row reduce.
    """
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    )
    wr = Window.orderBy("_v")
    wt = Window.partitionBy("_v")
    ranked = base.select(
        "_g",
        (F.rank().over(wr).cast("long") * 2 + F.count(F.lit(1)).over(wt) - 1)
        .cast("decimal(19,0)")
        .alias("r2"),
        F.count(F.lit(1)).over(wt).cast("long").alias("t"),
    )
    per = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("nj"),
        F.sum("r2").cast("decimal(38,0)").alias("r2j"),
        F.sum((F.col("t").cast("decimal(19,0)") * F.col("t") - 1).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("tie3j"),
    )
    # R_j = r2j/2 is an exact half-integer double below 2^53; the grid-2
    # quantization of R_j²/n_j is DEFINITIONAL (part of the operator), so
    # both engines agree bit-for-bit at any aggregation order
    termj = grid_round(
        (F.col("r2j").cast("double") / 2.0)
        * (F.col("r2j").cast("double") / 2.0)
        / F.col("nj").cast("double"),
        2,
    ).cast("decimal(38,2)")
    red = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("nj").cast("long").alias("n_total"),
        F.sum(termj).alias("_sq"),
        F.sum("tie3j").cast("decimal(38,0)").alias("tie3"),
    )
    n = F.col("n_total").cast("double")
    h = 12.0 / (n * (n + 1.0)) * F.col("_sq").cast("double") - 3.0 * (n + 1.0)
    corr = 1.0 - F.col("tie3").cast("double") / (n * n * n - n)
    return red.select(
        "n_groups",
        "n_total",
        grid_round(h, scale).alias("h_statistic"),
        F.when(corr > 0, grid_round(h / corr, scale)).alias("h_tie_corrected"),
    )


def cmh_test_stratified(
    df: DataFrame,
    stratum_col: str,
    variant_col,
    success_col,
    scale: int = 6,
) -> DataFrame:
    """Cochran–Mantel–Haenszel test of a 2×2 association ACROSS strata
    (Mantel & Haenszel 1959, public): does treatment move conversion once
    a confounding stratum (region, priority tier, device class) is
    controlled for — the stratified complement of
    `two_proportion_ab_test`, and the standard guard against Simpson's
    paradox in experiment readouts.

    Per stratum k (exact integer a, n1, n0, m1, m0, N): E_k = n1·m1/N and
    V_k = n1·n0·m1·m0 / (N²(N−1)) are RATIONALS quantized on the 1e-9
    grid into exact DECIMAL sums; the continuity-corrected statistic
    (|Σa − ΣE| − 0.5)² / ΣV is one IEEE expression of the exact reduces
    on the shared 1e-6 grid. One combinable per-stratum aggregate + one
    k-row reduce — two tiny shuffles at any scale.

    `variant_col` / `success_col` are 0/1 integer Column expressions.
    """
    base = df.select(
        F.col(stratum_col).alias("_s"),
        variant_col.cast("int").alias("_x"),
        success_col.cast("int").alias("_y"),
    # NULL variant/success rows are excluded (review-found: they counted
    # into N via count(*) while every margin sum skipped them, making
    # E/V denominators inconsistent with the margins)
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    per = base.groupBy("_s").agg(
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("a"),
        F.sum("_x").cast("long").alias("n1"),
        F.sum(1 - F.col("_x")).cast("long").alias("n0"),
        F.sum("_y").cast("long").alias("m1"),
        F.sum(1 - F.col("_y")).cast("long").alias("m0"),
        F.count(F.lit(1)).cast("long").alias("nn"),
    )
    nn = F.col("nn").cast("double")
    e = grid_round(F.col("n1").cast("double") * F.col("m1").cast("double") / nn, 9).cast(
        "decimal(28,9)"
    )
    v = F.when(
        F.col("nn") > 1,
        grid_round(
            F.col("n1").cast("double")
            * F.col("n0").cast("double")
            * F.col("m1").cast("double")
            * F.col("m0").cast("double")
            / (nn * nn * (nn - 1.0)),
            9,
        ),
    ).otherwise(F.lit(0.0)).cast("decimal(28,9)")
    red = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum(e).alias("_se"),
        F.sum(v).alias("_sv"),
    )
    dev = F.abs(F.col("sum_a").cast("double") - F.col("_se").cast("double"))
    sv = F.col("_sv").cast("double")
    return red.select(
        "n_strata",
        "sum_a",
        grid_round(F.col("_se").cast("double"), scale).alias("sum_expected"),
        F.when(
            sv > 0,
            grid_round((dev - 0.5) * (dev - 0.5) / sv, scale),
        ).alias("cmh_statistic"),
    )


def page_hinkley_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    delta: str = "0.005",
) -> DataFrame:
    """Page–Hinkley drift statistic per group (Page 1954; the sequential
    mean-shift detector production drift monitors run): PH = max_t (U_t −
    min_{s≤t} U_s) where U_t = Σ_{i≤t} (x_i − x̄_i − δ) and x̄_i is the
    running mean up to i. Complements `cusum_changepoint` (which tests
    against the GLOBAL mean and needs the full series) — PH is the
    one-directional online form whose reference mean only uses the past.

    Exactness: inputs quantize to 1e-6 DECIMAL on the shared grid; each
    running mean is one rational (exact cumsum / i) on the 1e-6 grid; the
    deviation cumsum, running minimum and the final max are then EXACT
    decimal arithmetic — no float accumulation anywhere. δ is a decimal
    string so both engines parse the identical constant. r12: the exact
    decimal statistic is RENDERED as double via dec_double (string
    round-trip, correctly rounded in both engines) — DECIMAL-typed output
    columns are driver-hash-divergent (the only three hash_match failures
    in CORRECTNESS_r11 were exactly the three DECIMAL finals registry-wide).

    Shape: one window sort per group (the sequential definition's price;
    groups are assumed time-series-sized) + one combinable max.
    """
    xq = grid_round(F.col(value_col), 6).cast("decimal(18,6)")
    w = Window.partitionBy(group_col).orderBy(ts_col, tiebreak_col)
    cum = (
        df.where(F.col(value_col).isNotNull())
        .select(group_col, F.col(ts_col), F.col(tiebreak_col), xq.alias("_x"))
        .withColumn("_i", F.row_number().over(w))
        .withColumn("_s", F.sum("_x").over(w))
    )
    # grid-6/(28,6) running mean (the cuped/welch discipline, r12 rotation
    # fix): the r11 grid-9/(28,9) cast diverged for |mean| in (9e6, 1e9) —
    # past the scale-9 cast-exact bound the double→DECIMAL cast rounds
    # engine-natively (Spark shortest-decimal HALF_UP vs DuckDB binary
    # scaling). Scale 6 is cast-exact to |mean| < 9e9, covering the 1e9
    # value contract; magnitude-swept 16/16 after the move.
    mean_i = grid_round(
        F.col("_s").cast("double") / F.col("_i").cast("double"), 6
    ).cast("decimal(28,6)")
    dev = cum.select(
        group_col,
        F.col(ts_col),
        F.col(tiebreak_col),
        (
            F.col("_x").cast("decimal(28,6)")
            - mean_i
            - F.lit(delta).cast("decimal(28,6)")
        ).alias("_d"),
    )
    wu = Window.partitionBy(group_col).orderBy(ts_col, tiebreak_col)
    walked = dev.withColumn("_u", F.sum("_d").over(wu)).withColumn(
        "_m", F.min(F.col("_u")).over(wu)
    )
    # narrow u/m to (37,6) BEFORE subtracting: a (38,6)−(38,6) difference
    # needs precision 39, and Spark's overflow rule clamps the SCALE
    # (silent last-digit loss) while DuckDB keeps it — found live by the
    # oracle check; (37,6)−(37,6) → (38,6) exact in both engines
    u = F.col("_u").cast("decimal(37,6)")
    m = F.col("_m").cast("decimal(37,6)")
    return walked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        dec_double(F.max((u - m).cast("decimal(38,6)"))).alias("ph_stat"),
    )


def gumbel_return_level_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    return_period: int = 30,
    scale: int = 6,
) -> DataFrame:
    """Gumbel extreme-value fit over daily block maxima with a
    T-period return level (Gumbel 1958, method-of-moments form): per
    group, take each day's max value, fit location/scale by moments
    (β = s·√6/π, μ = m − γ·β with Euler–Mascheroni γ), and report the
    value exceeded once per `return_period` days on average —
    μ − β·ln(−ln(1 − 1/T)). The capacity-planning primitive ("what hourly
    peak should we provision for per month") next to the drift family.

    Exactness: daily maxima are exact (max of raw doubles); moments come
    from exact DECIMAL sums of 1e-6 grid-quantized maxima; β/μ/level are
    one IEEE expression of those reduces with shared numeric literals for
    π and γ, finals on the 1e-6 grid. Shape: two combinable aggregates
    (day-max, then moments) — no windows, no joins."""
    day = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000)).alias("_day")
    daily = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("_g"), day)
        .agg(F.max(value_col).alias("_mx"))
    )
    mq = grid_round(F.col("_mx"), 6).cast("decimal(18,6)")
    per = daily.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(mq).cast("decimal(38,6)").alias("s"),
        F.sum((mq * mq).cast("decimal(38,12)")).cast("decimal(38,12)").alias("ss"),
    )
    n = F.col("n_days").cast("double")
    # dec_double (string round-trip) instead of the native decimal→double
    # cast: DuckDB's int128 cast double-rounds past 2^53 scaled (ss at
    # scale 12 passes it near |value| ~ 5e8 — the 1/16 magnitude-sweep
    # divergence; r12 rotation fix). Below the bound the two casts are
    # identical, so graded-SF values are unchanged.
    sd = dec_double(F.col("s"))
    m = sd / n
    # unbiased sample variance from exact sums; clamped at 0 (review-found:
    # constant daily maxima cancel to a tiny NEGATIVE var, where sqrt NaNs
    # on Spark and hard-errors on an ANSI engine — the grouped_outliers
    # greatest() treatment)
    var = F.greatest(
        (dec_double(F.col("ss")) - sd * sd / n) / (n - 1.0),
        F.lit(0.0),
    )
    beta = F.sqrt(var) * 2.449489742783178 / 3.141592653589793  # sqrt(6)/pi
    mu = m - 0.5772156649015329 * beta
    t = float(return_period)
    level = mu - beta * F.log(-F.log(F.lit(1.0) - F.lit(1.0) / F.lit(t)))
    return per.select(
        F.col("_g").alias(group_col),
        "n_days",
        grid_round(m, scale).alias("mean_daily_max"),
        F.when(F.col("n_days") > 1, grid_round(beta, scale)).alias("gumbel_beta"),
        F.when(F.col("n_days") > 1, grid_round(mu, scale)).alias("gumbel_mu"),
        F.when(F.col("n_days") > 1, grid_round(level, scale)).alias(
            f"return_level_{return_period}d"
        ),
    )


def longest_streak_by_user(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Longest run of consecutive same-type events per user (the classic
    gaps-and-islands rollup): engagement/bot signal — a 400-event 'view'
    streak is a scraper, alternating short streaks are organic. Exact
    integers end to end.

    Island id = global position − per-type position (both row_numbers over
    the same (ts, tiebreak) order), constant exactly within a run; per-run
    lengths roll up combinably. The per-user winner takes the LONGEST run,
    ties broken by type string DESCENDING via one max(struct) — no second
    window. One window shuffle + two combinable aggregates."""
    wall = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    wtyp = Window.partitionBy(user_col, type_col).orderBy(ts_col, tiebreak_col)
    runs = (
        df.select(user_col, type_col, F.col(ts_col), F.col(tiebreak_col))
        .withColumn("_isl", F.row_number().over(wall) - F.row_number().over(wtyp))
        .groupBy(user_col, type_col, "_isl")
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    return (
        runs.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max(F.struct(F.col("_len"), F.col(type_col))).alias("_m"),
        )
        .select(
            user_col,
            "n_streaks",
            F.col("_m._len").cast("long").alias("max_streak"),
            F.col(f"_m.{type_col}").alias("streak_type"),
        )
    )


def _dict_rank_counts(df: DataFrame, value_col, tag_col):
    """Shared dictionary-rank core for the rank-test family: aggregate to
    one row per DISTINCT value with per-tag counts, then derive each
    value's doubled midrank from the cumulative count — the 100 TB form
    of the global rank window (the sort runs over |distinct values| rows,
    never the corpus; identical ranks by construction since equal values
    share a midrank anyway).

    Returns one row per (value, tag) with (r2, t, n) where r2 = doubled
    midrank (exact integer), t = tie-group size, n = rows carrying that
    tag at this value."""
    per_val = (
        df.groupBy(F.col(value_col).alias("_v"), tag_col.alias("_tag"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    w = Window.orderBy("_v")
    totals = (
        per_val.groupBy("_v")
        .agg(F.sum("_n").cast("long").alias("_t"))
        .withColumn("_cum", F.sum("_t").over(w))
    )
    # doubled midrank of a tie group ending at cumulative count c with
    # size t: ranks are c-t+1 .. c, so 2*avg = (c-t+1) + c
    ranked = totals.select(
        "_v",
        "_t",
        ((F.col("_cum") - F.col("_t") + 1) + F.col("_cum"))
        .cast("decimal(19,0)")
        .alias("_r2"),
    )
    return per_val.join(ranked, "_v")


def mann_whitney_u_by_variant_dict(
    df: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    scale: int = 6,
) -> DataFrame:
    """`mann_whitney_u_by_variant` computed by DICTIONARY RANKING — the
    documented 100 TB mitigation, now a callable: instead of a global
    rank window over every row, aggregate to (value, variant, count)
    (map-side-combinable), sort only the DISTINCT-value dictionary, and
    derive each value's doubled midrank from the cumulative tie counts.
    Bit-identical output to the row-ranked form (property-tested): equal
    values share a midrank either way, so the rank sums, tie correction
    and U are the same exact integers. Use this form when the value
    domain is small relative to the corpus (metrics, prices, scores) —
    the single-partition sort drops from O(rows) to O(|distinct|)."""
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col), (F.col(user_col) % 2).cast("int").alias("_variant")
    )
    counted = _dict_rank_counts(base, value_col, F.col("_variant"))
    agg = counted.groupBy().agg(
        F.sum(F.when(F.col("_tag") == 1, F.col("_r2") * F.col("_n")))
        .cast("decimal(38,0)")
        .alias("r2sum1"),
        F.sum(F.when(F.col("_tag") == 1, F.col("_n")).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("_tag") == 0, F.col("_n")).otherwise(0)).cast("long").alias("n0"),
        # Σ over tie GROUPS of (t³−t): per (value, tag) row, weight the
        # group term by this row's share n/t → Σ n·(t²−1) row-additively
        F.sum(
            (F.col("_n").cast("decimal(19,0)")
             * (F.col("_t").cast("decimal(19,0)") * F.col("_t") - 1)).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("tie3"),
    )
    n1, n0 = F.col("n1").cast("double"), F.col("n0").cast("double")
    n = n1 + n0
    u1 = (F.col("r2sum1").cast("double") - n1 * (n1 + 1.0)) / 2.0
    mu = n1 * n0 / 2.0
    var = n1 * n0 / 12.0 * ((n + 1.0) - F.col("tie3").cast("double") / (n * (n - 1.0)))
    z = F.when(var > 0, grid_round((u1 - mu) / F.sqrt(var), scale))
    return agg.select(
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        u1.alias("u1"),
        grid_round(2.0 * u1 / (n1 * n0) - 1.0, scale).alias("rank_biserial"),
        z.alias("z_score"),
    )


def kruskal_wallis_by_group_dict(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    scale: int = 6,
) -> DataFrame:
    """`kruskal_wallis_by_group` by DICTIONARY RANKING (see
    `mann_whitney_u_by_variant_dict`): the global sort runs over the
    distinct-value dictionary instead of the corpus. Bit-identical
    output (property-tested) — same doubled midranks, same exact
    decimal sums, same grid finals."""
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col), F.col(group_col).alias("_g")
    )
    counted = _dict_rank_counts(base, value_col, F.col("_g"))
    per = counted.groupBy(F.col("_tag").alias("_g")).agg(
        F.sum("_n").cast("long").alias("nj"),
        F.sum(F.col("_r2") * F.col("_n")).cast("decimal(38,0)").alias("r2j"),
        F.sum(
            (F.col("_n").cast("decimal(19,0)")
             * (F.col("_t").cast("decimal(19,0)") * F.col("_t") - 1)).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("tie3j"),
    )
    termj = grid_round(
        (F.col("r2j").cast("double") / 2.0)
        * (F.col("r2j").cast("double") / 2.0)
        / F.col("nj").cast("double"),
        2,
    ).cast("decimal(38,2)")
    red = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("nj").cast("long").alias("n_total"),
        F.sum(termj).alias("_sq"),
        F.sum("tie3j").cast("decimal(38,0)").alias("tie3"),
    )
    n = F.col("n_total").cast("double")
    h = 12.0 / (n * (n + 1.0)) * F.col("_sq").cast("double") - 3.0 * (n + 1.0)
    corr = 1.0 - F.col("tie3").cast("double") / (n * n * n - n)
    return red.select(
        "n_groups",
        "n_total",
        grid_round(h, scale).alias("h_statistic"),
        F.when(corr > 0, grid_round(h / corr, scale)).alias("h_tie_corrected"),
    )


def _chrono_first_half(partition_col: str, ts_col: str, tiebreak_col: str) -> Column:
    """THE chronological half-split predicate (one definition for the
    whole paired family — wilcoxon/cuped via _user_half_sums, mcnemar,
    wasserstein): row r of n in (ts, tiebreak) order is in the first half
    iff 2r ≤ n+1, i.e. the first half takes the ceil(n/2) EARLIEST rows —
    the exact order-statistic rule every lockstep oracle spells as
    `row_number()*2 <= COUNT(*)+1`."""
    w = Window.partitionBy(partition_col).orderBy(ts_col, tiebreak_col)
    wg = Window.partitionBy(partition_col)
    return F.row_number().over(w) * 2 <= F.count(F.lit(1)).over(wg) + 1


def _user_half_sums(
    df: DataFrame,
    user_col: str,
    value_col: str,
    ts_col: str,
    tiebreak_col: str,
    extra_cols: tuple = (),
) -> DataFrame:
    """Shared per-user chronological half-split (r11 review: this block
    appeared verbatim in wilcoxon AND cuped): first half = the ceil(n/2)
    earliest events by (ts, tiebreak) — the exact order-statistic rule —
    with values grid-6-quantized to DECIMAL(18,6). Returns one row per
    user (plus ``extra_cols`` grouping columns): (s1, n1, s2, n2)."""
    xq = grid_round(F.col(value_col), 6).cast("decimal(18,6)")
    halved = df.where(F.col(value_col).isNotNull()).select(
        F.col(user_col).alias("_u"),
        *extra_cols,
        xq.alias("_x"),
        _chrono_first_half(user_col, ts_col, tiebreak_col).alias("_fh"),
    )
    group_cols = ["_u"] + [halved.columns[1 + i] for i in range(len(extra_cols))]
    return halved.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("_fh"), F.col("_x"))).alias("s1"),
        F.sum(F.when(F.col("_fh"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(~F.col("_fh"), F.col("_x"))).alias("s2"),
        F.sum(F.when(~F.col("_fh"), 1).otherwise(0)).cast("long").alias("n2"),
    )


def wilcoxon_signed_rank_by_user(
    df: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    scale: int = 6,
) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED per-user metrics (Wilcoxon
    1945, public): each user's mean value over their chronological first
    half vs second half — "did the same users' behavior shift", the
    within-subject complement of the two-sample Mann-Whitney (which
    compares DIFFERENT users). Users with an odd single event or a zero
    difference drop out, per the classic procedure.

    Exactness: per-user half means are rationals of exact DECIMAL sums
    quantized on the 1e-9 grid BEFORE differencing, so the sign/|d| rank
    base is engine-identical; |d| ranks use the shared doubled-midrank
    identity (exact integers), W+ accumulates as exact DECIMAL, and the
    tie-corrected normal approximation is one IEEE expression of the
    reduces on the 1e-6 grid.

    Shape: one per-user window split + combinable half sums, then one
    rank window over USERS (not events — the frame is user-count-sized),
    then a 1-row reduce."""
    per = _user_half_sums(df, user_col, value_col, ts_col, tiebreak_col)
    m1 = grid_round(F.col("s1").cast("double") / F.col("n1").cast("double"), 9)
    m2 = grid_round(F.col("s2").cast("double") / F.col("n2").cast("double"), 9)
    diffs = (
        per.where((F.col("n1") > 0) & (F.col("n2") > 0))
        .select("_u", (m2 - m1).alias("_d"))
        .where(F.col("_d") != 0)
    )
    wr = Window.orderBy(F.abs(F.col("_d")))
    wt = Window.partitionBy(F.abs(F.col("_d")))
    ranked = diffs.select(
        "_d",
        (F.rank().over(wr).cast("long") * 2 + F.count(F.lit(1)).over(wt) - 1)
        .cast("decimal(19,0)")
        .alias("r2"),
        F.count(F.lit(1)).over(wt).cast("long").alias("t"),
    )
    agg = ranked.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("_d") > 0, F.col("r2"))).cast("decimal(38,0)").alias("w2plus"),
        F.sum((F.col("t").cast("decimal(19,0)") * F.col("t") - 1).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("tie3"),
    )
    n = F.col("n_pairs").cast("double")
    wplus = F.coalesce(F.col("w2plus").cast("double"), F.lit(0.0)) / 2.0
    mu = n * (n + 1.0) / 4.0
    var = n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - F.col("tie3").cast("double") / 48.0
    z = F.when(var > 0, grid_round((wplus - mu) / F.sqrt(var), scale))
    return agg.select(
        "n_pairs",
        # W+ is exact in half-units ((int)/2 — exact double), emitted raw
        wplus.alias("w_plus"),
        z.alias("z_score"),
    )


def friedman_test_by_block(
    df: DataFrame,
    block_col: str = "user_id",
    treatment_col: str = "event_type",
    value_col: str = "value",
    scale: int = 6,
) -> DataFrame:
    """Friedman rank test for k treatments over matched blocks (Friedman
    1937, public): rank each block's per-treatment mean WITHIN the block,
    test whether treatment rank sums differ — the repeated-measures
    complement of Kruskal-Wallis (which ignores the block pairing). Only
    blocks observing EVERY treatment enter (the classic complete-block
    requirement).

    Exactness: per-(block, treatment) means are grid-9 rationals of
    exact decimal sums; within-block ranks use the doubled-midrank
    identity (the within-block window is k-sized); rank sums and the
    per-block tie term Σ(t³−t) accumulate as exact DECIMALs; the
    tie-corrected statistic is one IEEE expression on the 1e-6 grid.

    Shape: one (block, treatment) combinable aggregate, one k-row window
    per block, one k-row reduce. Nothing is corpus-scale after the first
    aggregate."""
    per = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(block_col).alias("_b"), F.col(treatment_col).alias("_t"))
        .agg(
            F.sum(grid_round(F.col(value_col), 6).cast("decimal(18,6)")).alias("_s"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
        .select(
            "_b",
            "_t",
            grid_round(F.col("_s").cast("double") / F.col("_n").cast("double"), 9).alias("_m"),
        )
    )
    # per feeds the k-count AND the complete-block filter; ranked (below)
    # feeds the treatment rollup AND the tie term — unpinned, each
    # reference re-ran the corpus aggregate (+ the block windows for
    # ranked; r12 plan sweep: 10 scan copies). Both frames are
    # blocks×k narrow rows.
    from ..session import lineage_pin

    per = lineage_pin(per)
    # k as a 1-row broadcast aggregate INSIDE the plan (r11 review: the
    # old driver-side distinct().count() ran a full scan at plan-BUILD
    # time and baked a stale literal into the plan — the registry's only
    # non-lazy operator)
    kf = per.groupBy().agg(F.count_distinct(F.col("_t")).cast("long").alias("_kt"))
    wb = Window.partitionBy("_b")
    complete = (
        per.withColumn("_kb", F.count(F.lit(1)).over(wb))
        .crossJoin(F.broadcast(kf))
        .where(F.col("_kb") == F.col("_kt"))
    )
    wr = Window.partitionBy("_b").orderBy("_m")
    wt = Window.partitionBy("_b", "_m")
    ranked = complete.select(
        "_b",
        "_t",
        "_kt",
        (F.rank().over(wr).cast("long") * 2 + F.count(F.lit(1)).over(wt) - 1)
        .cast("decimal(19,0)")
        .alias("r2"),
        F.count(F.lit(1)).over(wt).cast("long").alias("tt"),
    )
    ranked = lineage_pin(ranked)
    per_treat = ranked.groupBy("_t").agg(
        F.sum("r2").cast("decimal(38,0)").alias("r2sum"),
    )
    # per-block tie term distributes row-additively as (tt² − 1) per row
    ties = ranked.groupBy().agg(
        F.sum((F.col("tt").cast("decimal(19,0)") * F.col("tt") - 1).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("tie3"),
        # coalesce to 0: with NO complete block the ranked frame is empty,
        # max(_kt) is NULL and 0/NULL would emit NULL where the oracle's
        # integer COUNT(*)//kt (and the pre-refactor literal k) compute 0
        # (review-confirmed cross-engine bug)
        F.coalesce((F.count(F.lit(1)) / F.max("_kt")).cast("long"), F.lit(0).cast("long")).alias(
            "n_blocks"
        ),
    )
    termj = grid_round(
        (F.col("r2sum").cast("double") / 2.0)
        * (F.col("r2sum").cast("double") / 2.0),
        2,
    ).cast("decimal(38,2)")
    red = (
        per_treat.groupBy()
        .agg(F.sum(termj).alias("_sq"))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(kf))
    )
    nb = F.col("n_blocks").cast("double")
    kk = F.col("_kt").cast("double")
    # tie-corrected Friedman: chi2 = (12·ΣR_j² − 3·n²k(k+1)²) /
    #   (n·k(k+1) − tie3/(k−1))   [Conover 1999 form]
    num = 12.0 * F.col("_sq").cast("double") - 3.0 * nb * nb * kk * (kk + 1.0) * (kk + 1.0)
    den = nb * kk * (kk + 1.0) - F.col("tie3").cast("double") / (kk - 1.0)
    return red.select(
        F.col("_kt").alias("n_treatments"),
        F.col("n_blocks"),
        F.when((F.col("n_blocks") > 0) & (den > 0), grid_round(num / den, scale)).alias(
            "friedman_chi2"
        ),
    )


def cuped_adjusted_ab(
    df: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    scale: int = 6,
) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker,
    WSDM 2013, public): per user, the PRE-period covariate (chronological
    first-half mean) adjusts the post-period metric (second-half mean) by
    Y' = Y − θ·(X − X̄) with θ = cov(X, Y)/var(X) pooled across variants —
    the industry-standard experiment sensitivity boost, typically cutting
    metric variance 30-60% when pre-period behavior predicts post.

    Output: one row with per-variant adjusted means, the adjusted
    difference, θ, and the variance-reduction ratio
    var(Y')/var(Y) ∈ (0, 1].

    Exactness: half means are GRID-6 rationals of exact decimal sums
    (the welch input discipline — a scale-d double→decimal cast is only
    engine-exact while |x|·10^d ≤ 2^53, so grid 6 covers the full 1e9
    mean contract where grid 9 diverged past ~9e6; caught by the r11
    magnitude sweep); every covariance/variance comes from exact DECIMAL
    sufficient statistics of those grid-fixed user rows (the
    pairwise_correlations discipline); θ, means and the ratio are single
    IEEE expressions on the 1e-6 grid. Shape: one per-user window split
    + combinable sums, then ONE 1-row reduce over user rows — no joins.

    Contract: users whose |half mean| ≥ 1e9 are EXCLUDED — consistently,
    from every sum (r11 review: the old form silently dropped only the
    out-of-range user's product terms via the cast's NULL while the
    linear sums kept them, mixing populations); a metric at that
    magnitude should be rescaled before CUPED."""
    pre6 = grid_round(F.col("s1").cast("double") / F.col("n1").cast("double"), 6)
    post6 = grid_round(F.col("s2").cast("double") / F.col("n2").cast("double"), 6)
    per = (
        _user_half_sums(
            df,
            user_col,
            value_col,
            ts_col,
            tiebreak_col,
            extra_cols=((F.col(user_col) % 2).cast("int").alias("_v"),),
        )
        .where((F.col("n1") > 0) & (F.col("n2") > 0))
        .where((F.abs(pre6) < 1e9) & (F.abs(post6) < 1e9))
        .select(
            "_v",
            pre6.cast("decimal(28,6)").alias("_pre"),
            post6.cast("decimal(28,6)").alias("_post"),
        )
    )
    # (18,6) product operands: a wide-decimal product CLAMPS the scale
    # (the pairwise_correlations class) while (18,6)x(18,6) -> (37,12) is
    # exact — the welch operand discipline; the DuckDB oracle widens
    # operands to (28,6) instead (int64-storage product overflow, the
    # gumbel lesson). The |half mean| < 1e9 filter above makes the
    # (18,6) casts total.
    p18 = F.col("_pre").cast("decimal(18,6)")
    q18 = F.col("_post").cast("decimal(18,6)")
    red = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("_pre").cast("decimal(38,6)").alias("sx"),
        F.sum("_post").cast("decimal(38,6)").alias("sy"),
        F.sum((p18 * q18).cast("decimal(38,12)")).alias("sxy"),
        F.sum((p18 * p18).cast("decimal(38,12)")).alias("sxx"),
        F.sum((q18 * q18).cast("decimal(38,12)")).alias("syy"),
        F.sum(F.when(F.col("_v") == 1, F.col("_post"))).cast("decimal(38,6)").alias("sy1"),
        F.sum(F.when(F.col("_v") == 1, F.col("_pre"))).cast("decimal(38,6)").alias("sx1"),
        F.sum(F.when(F.col("_v") == 1, 1).otherwise(0)).cast("long").alias("m1"),
        F.sum(F.when(F.col("_v") == 0, F.col("_post"))).cast("decimal(38,6)").alias("sy0"),
        F.sum(F.when(F.col("_v") == 0, F.col("_pre"))).cast("decimal(38,6)").alias("sx0"),
        F.sum(F.when(F.col("_v") == 0, 1).otherwise(0)).cast("long").alias("m0"),
    )
    n = F.col("n_users").cast("double")
    # dec_double, not a bare cast (r11 class fix): the (38,18)/(38,9) sums
    # pass 2^53 in scaled-integer terms, where DuckDB's two-step int128
    # cast can land an ulp off Spark's correctly-rounded BigDecimal cast
    sx, sy = dec_double(F.col("sx")), dec_double(F.col("sy"))
    sxy, sxx, syy = (
        dec_double(F.col("sxy")),
        dec_double(F.col("sxx")),
        dec_double(F.col("syy")),
    )
    cov = sxy / n - (sx / n) * (sy / n)
    varx = sxx / n - (sx / n) * (sx / n)
    vary = syy / n - (sy / n) * (sy / n)
    theta = F.when(varx > 0, cov / varx)
    xbar = sx / n
    adj1 = dec_double(F.col("sy1")) / F.col("m1").cast("double") - theta * (
        dec_double(F.col("sx1")) / F.col("m1").cast("double") - xbar
    )
    adj0 = dec_double(F.col("sy0")) / F.col("m0").cast("double") - theta * (
        dec_double(F.col("sx0")) / F.col("m0").cast("double") - xbar
    )
    # guard BOTH variances: varx = 0 with vary > 0 makes cov²/(varx·vary)
    # a 0/0 — NaN on Spark, NULL on engines that null zero-division
    ratio = F.when((varx > 0) & (vary > 0), 1.0 - (cov * cov) / (varx * vary))
    return red.select(
        "n_users",
        grid_round(theta, scale).alias("theta"),
        F.when(
            (F.col("m0") > 0) & theta.isNotNull(), grid_round(adj0, scale)
        ).alias("adj_mean_control"),
        F.when(
            (F.col("m1") > 0) & theta.isNotNull(), grid_round(adj1, scale)
        ).alias("adj_mean_treatment"),
        F.when(
            (F.col("m0") > 0) & (F.col("m1") > 0) & theta.isNotNull(),
            grid_round(adj1 - adj0, scale),
        ).alias("adj_effect"),
        grid_round(ratio, scale).alias("var_ratio"),
    )


def wasserstein_drift_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    scale: int = 6,
) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between each group's
    chronological first-half and second-half value distributions
    (Monge 1781/Kantorovich 1942 form; for 1-D, W₁ = ∫|F₁−F₂| dv) — the
    drift MAGNITUDE gauge next to the KS test's max-gap and PSI's binned
    form: W₁ is in VALUE UNITS ("the value distribution moved by ~0.8"),
    integrates the whole CDF gap, and needs no binning choice.

    Exactness: the half split is the exact order-statistic rank rule;
    per-distinct-value cumulative counts are exact integers; each
    segment term |c₁/n₁ − c₂/n₂|·Δv quantizes on the 1e-9 grid into an
    exact DECIMAL sum; the final is on the 1e-6 grid. Shape: one window
    split, one (group, value) count aggregate, one window over DISTINCT
    values per group (support-sized, not corpus-sized), one combinable
    reduce."""
    halved = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("double").alias("_v"),
            _chrono_first_half(group_col, ts_col, tiebreak_col).alias("_fh"),
        )
    )
    per_v = halved.groupBy("_g", "_v").agg(
        F.sum(F.when(F.col("_fh"), 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(~F.col("_fh"), 1).otherwise(0)).cast("long").alias("c2"),
    )
    wv = Window.partitionBy("_g").orderBy("_v")
    wgg = Window.partitionBy("_g")
    cum = per_v.select(
        "_g",
        "_v",
        F.sum("c1").over(wv).cast("long").alias("k1"),
        F.sum("c2").over(wv).cast("long").alias("k2"),
        F.sum("c1").over(wgg).cast("long").alias("n1"),
        F.sum("c2").over(wgg).cast("long").alias("n2"),
        F.lead("_v").over(wv).alias("_nv"),
    )
    seg = F.when(
        F.col("_nv").isNotNull() & (F.col("n1") > 0) & (F.col("n2") > 0),
        grid_round(
            F.abs(
                F.col("k1").cast("double") / F.col("n1").cast("double")
                - F.col("k2").cast("double") / F.col("n2").cast("double")
            )
            * (F.col("_nv") - F.col("_v")),
            9,
        ),
    ).otherwise(F.lit(0.0)).cast("decimal(28,9)")
    red = cum.groupBy("_g").agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(seg).alias("_w"),
    )
    return red.select(
        F.col("_g").alias(group_col),
        F.col("n1").alias("n_first_half"),
        F.col("n2").alias("n_second_half"),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            grid_round(F.col("_w").cast("double"), scale),
        ).alias("w1_distance"),
    )


def brown_forsythe_test(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    scale: int = 6,
) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Brown & Forsythe 1974,
    public; Levene 1960's test with median centers): one-way ANOVA F on
    the absolute deviations z = |x − median_group| — the robust "do these
    groups have the same SPREAD" companion to Kruskal-Wallis's
    same-location question, and the precondition check before any pooled-
    variance readout (welch_t exists precisely because this often fails).

    Exactness: per-group medians come from `profiling.exact_percentiles`'
    explicit order statistics (fixed IEEE interpolation, engine-identical);
    z quantizes on the 1e-6 grid into DECIMAL(18,6) so Σz and Σz² are
    exact (the (18,6)×(18,6)→(37,12) product is exact — the welch operand
    discipline; contract: |z| < 9e9, the 2^53/1e6 cast-exactness bound);
    per-group means are grid-9 finals;
    the sum-of-squares terms are normalized by the squared grand mean
    deviation (F is scale-invariant, so mg² cancels) and accumulated as
    1e-9-grid SCALED INTEGERS (DECIMAL(38,0)) — ~9 RELATIVE digits at
    any data magnitude; F is one final expression on the 1e-6 grid. The
    statistic is NULL when: the spread is zero (mg = 0 or SSW quantizes
    to 0 — F is unstable there by definition), any |deviation| ≥ 9e9
    (the scale-6 cast-exactness bound), or a normalized term exceeds the
    2^62/1e9 grid range — each NULL is DETERMINISTIC in both engines.
    Shape: one window sort for the medians (per-group partitions), one
    broadcast join of the k-row median frame, two combinable reduces and
    a k-row pass — no corpus-sized joins."""
    from .profiling import _interp_median

    meds = _interp_median(df.select(group_col, value_col), value_col, [group_col])
    # z quantizes at the 1e-6 grid into DECIMAL(18,6) — the welch/cuped
    # INPUT discipline, not grid 9: a scale-d double→decimal cast is only
    # engine-exact while |x|·10^d ≤ 2^53 (≈9e6 at d=9 but 9e9 at d=6 —
    # the parity sweep caught grid-9 z's diverging at |z| ~ 6e8)
    zraw = F.abs(F.col(value_col).cast("double") - F.col("_m"))
    # a deviation past 2^53/1e6 cannot quantize engine-exactly at scale 6
    # — pin it to 0 in the sums (ANSI would error on the cast) and COUNT
    # it, so the statistic NULLs deterministically in both engines
    # instead of silently diverging (r11 review: the old (18,9) cast at
    # least errored; the widened (18,6) cast left a silent window)
    z_oob = (zraw >= 9.0e9).cast("int")
    z6 = F.when(z_oob == 1, F.lit(0.0)).otherwise(grid_round(zraw, 6)).cast(
        "decimal(18,6)"
    )
    zrows = (
        df.where(F.col(value_col).isNotNull())
        .join(F.broadcast(meds), group_col)
        .select(F.col(group_col).alias("_g"), z6.alias("_z"), z_oob.alias("_zoob"))
    )
    per = zrows.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_z").cast("decimal(28,6)").alias("s"),
        F.sum((F.col("_z") * F.col("_z")).cast("decimal(38,12)"))
        .cast("decimal(38,12)")
        .alias("q"),
        F.sum("_zoob").cast("long").alias("zoob"),
    )
    # per feeds glob AND the ssw/ssb reduce — unpinned, each reference
    # re-ran the median window + deviation scan (r12 plan sweep). k rows.
    from ..session import lineage_pin

    per = lineage_pin(per)
    glob = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("decimal(38,6)").alias("ss"),
        F.sum("zoob").cast("long").alias("zoob"),
    )
    # dec_double, not bare casts (r11 class fix, found live by THIS
    # operator's parity harness: q's scaled integer passes 2^53, where
    # DuckDB's two-step int128 cast lands an ulp off Spark's
    # correctly-rounded BigDecimal cast — an ulp at q ~ 4e9 spans ~500
    # 1e-9 grid steps, flipping ssw between exactly-0 and ~5e-7)
    mj = grid_round(dec_double(F.col("s")) / F.col("n").cast("double"), 9)
    mg = grid_round(dec_double(F.col("ss")) / F.col("nn").cast("double"), 9)
    # SSW_j = n_j·w_j with w_j = Σz²/n − m_j², and SSB_j = n_j·b_j with
    # b_j = (m_j − m)². Because F is SCALE-INVARIANT in z, w and b are
    # NORMALIZED by mg² (the squared grand mean deviation) before
    # quantizing — dimensionless O(1)-ish quantities carry ~9 RELATIVE
    # digits on the 1e-9 scaled-integer grid at ANY data magnitude (the
    # r11 review: a fixed ABSOLUTE grid either loses small-magnitude
    # precision or overflows large magnitudes; mg² cancels in the F
    # ratio along with the 1e9 factor). Scaled integers × n in exact
    # DECIMAL(38,0) — the graph family's discipline; a
    # grid-quantized-decimal accumulation is the engine-round() class at
    # these magnitudes and long-typed floor overflows if n multiplies
    # inside the double. Contract: normalized w, b < 2^62/1e9 (relative
    # spread ≲ 6.8e4× the grand mean) — an out-of-range group, an
    # out-of-cast-range deviation (|z| ≥ 9e9), or mg = 0 NULLs the
    # statistic DETERMINISTICALLY in both engines.

    _lim = float(2**62) / 1e9

    def _si9(x):
        # in-range guard INSIDE the rounding (ANSI Spark errors on a
        # long-overflowing floor): out-of-range pins to 0 and the oob
        # flags NULL the statistic
        p = F.floor(x * 1e9 + 0.5)
        m = -F.floor(-x * 1e9 + 0.5)
        return (
            F.when(F.abs(x) >= _lim, F.lit(0))
            .otherwise(F.when(x >= 0, p).otherwise(m))
            .cast("decimal(38,0)")
        )

    # mg = 0 means every deviation is 0 (z ≥ 0): pin the normalized terms
    # to 0 — 0/0 is NaN, which would ANSI-error inside the floor cast —
    # and let the g_ss > 0 output condition return the NULL
    wj = F.when(
        mg > 0,
        (dec_double(F.col("q")) / F.col("n").cast("double") - mj * mj) / (mg * mg),
    ).otherwise(F.lit(0.0))
    bj = F.when(mg > 0, ((mj - mg) / mg) * ((mj - mg) / mg)).otherwise(F.lit(0.0))
    n19 = F.col("n").cast("decimal(19,0)")
    red = (
        per.crossJoin(F.broadcast(glob.drop("zoob")))
        .groupBy()
        .agg(
            F.max("k").alias("k"),
            F.max("nn").alias("nn"),
            F.sum(F.when(F.abs(wj) >= _lim, 1).otherwise(0)).alias("oob_w"),
            F.sum(F.when(F.abs(bj) >= _lim, 1).otherwise(0)).alias("oob_b"),
            F.sum(n19 * _si9(wj)).alias("ssw"),
            F.sum(n19 * _si9(bj)).alias("ssb"),
        )
    )
    kd = F.col("k").cast("double")
    nd = F.col("nn").cast("double")
    # scale-0 decimal→double is a SINGLE correctly-rounded conversion in
    # both engines (no 10^-scale second rounding)
    fstat = ((nd - kd) / (kd - 1.0)) * (
        F.col("ssb").cast("double") / F.col("ssw").cast("double")
    )
    gz = glob.select(F.col("zoob").alias("g_zoob"), F.col("ss").alias("g_ss"))
    return (
        red.crossJoin(F.broadcast(gz))
        .select(
            F.col("k").cast("long").alias("n_groups"),
            F.col("nn").cast("long").alias("n_total"),
            (F.col("k") - 1).cast("long").alias("df_between"),
            (F.col("nn") - F.col("k")).cast("long").alias("df_within"),
            F.when(
                (F.col("k") > 1)
                & (F.col("nn") > F.col("k"))
                & (F.col("ssw") > 0)
                & (F.col("oob_w") == 0)
                & (F.col("oob_b") == 0)
                & (F.col("g_zoob") == 0)
                & (F.col("g_ss") > 0),
                grid_round(fstat, scale),
            ).alias("bf_statistic"),
        )
    )


def log_rank_test(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    start_type: str = "signup",
    event_type: str = "purchase",
    scale: int = 6,
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966 / Peto & Peto 1972, public)
    comparing time-to-first-conversion between the deterministic 50/50
    split variant = user_id mod 2, with right-censoring at the corpus
    horizon — the SIGNIFICANCE companion to `survival_hazard_curve`'s
    descriptive KM curve and the survival-time analog of
    `two_proportion_ab_test`'s endpoint-only z: at every distinct event
    day the observed variant-1 events are compared against the
    hypergeometric expectation given both risk sets.

    Exactness: risk sets, event and censor counts are exact integers
    (same per-user collapse as survival_hazard_curve, ref
    sdl-core test queries have no analog — public construction); each
    day's E₁ = d·n₁/n and hypergeometric variance
    V = d·(n₁/n)·(n₂/n)·(n−d)/(n−1) are fixed IEEE expressions
    1e-9-quantized into exact DECIMAL sums; the final chi-square is one
    expression on the 1e-6 grid. Shape: corpus collapses to one row per
    user (combinable), then day-grain frames bounded by the observation
    window — the cumulative window runs on the day dictionary, never the
    corpus."""
    from ..session import lineage_pin

    # starts feeds the first-event join AND the per-user frame; per_user
    # (below) feeds the day rollup AND the variant totals — unpinned, each
    # reference re-ran the events scans (r12 plan sweep: 12 scan copies).
    # Both frames are user-scale narrow rows.
    starts = lineage_pin(
        df.where(F.col(type_col) == start_type)
        .groupBy(user_col)
        .agg(F.min(F.col(ts_col).cast("double")).alias("t0"))
    )
    horizon = df.agg(F.max(F.col(ts_col).cast("double")).alias("tmax"))
    first_ev = (
        df.where(F.col(type_col) == event_type)
        .select(user_col, F.col(ts_col).cast("double").alias("te"))
        .join(starts, user_col)
        .where(F.col("te") >= F.col("t0"))
        .groupBy(user_col)
        .agg(F.min("te").alias("te"))
    )
    per_user = (
        starts.join(first_ev, user_col, "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            (F.col(user_col) % 2).cast("int").alias("_v"),
            F.when(
                F.col("te").isNotNull(),
                F.floor((F.col("te") - F.col("t0")) / 86400.0),
            ).alias("event_day"),
            F.floor((F.col("tmax") - F.col("t0")) / 86400.0).alias("censor_day"),
        )
    )
    per_user = lineage_pin(per_user)
    per_day = per_user.groupBy(
        F.coalesce(F.col("event_day"), F.col("censor_day")).alias("t")
    ).agg(
        F.sum(F.when(F.col("event_day").isNotNull() & (F.col("_v") == 0), 1).otherwise(0)).alias("d0"),
        F.sum(F.when(F.col("event_day").isNotNull() & (F.col("_v") == 1), 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("event_day").isNull() & (F.col("_v") == 0), 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("event_day").isNull() & (F.col("_v") == 1), 1).otherwise(0)).alias("c1"),
    )
    totals = per_user.groupBy().agg(
        F.sum(F.when(F.col("_v") == 0, 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("_v") == 1, 1).otherwise(0)).cast("long").alias("nb"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = per_day.crossJoin(F.broadcast(totals)).select(
        "t",
        "d0",
        "d1",
        "na",
        "nb",
        (F.col("na") - F.coalesce(F.sum(F.col("d0") + F.col("c0")).over(w), F.lit(0))).alias("r0"),
        (F.col("nb") - F.coalesce(F.sum(F.col("d1") + F.col("c1")).over(w), F.lit(0))).alias("r1"),
    )
    n = (F.col("r0") + F.col("r1")).cast("double")
    d = (F.col("d0") + F.col("d1")).cast("double")
    e1 = F.when(
        (F.col("d0") + F.col("d1") > 0) & (F.col("r0") + F.col("r1") > 0),
        grid_round(d * F.col("r1").cast("double") / n, 9),
    ).otherwise(F.lit(0.0)).cast("decimal(28,9)")
    v1 = F.when(
        (F.col("d0") + F.col("d1") > 0) & (F.col("r0") + F.col("r1") > 1),
        grid_round(
            d
            * (F.col("r0").cast("double") / n)
            * (F.col("r1").cast("double") / n)
            * ((n - d) / (n - 1.0)),
            9,
        ),
    ).otherwise(F.lit(0.0)).cast("decimal(28,9)")
    red = at_risk.groupBy().agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum(e1).alias("e1"),
        F.sum(v1).alias("v1"),
    )
    diff = F.col("o1").cast("double") - F.col("e1").cast("double")
    return red.select(
        F.col("na").cast("long").alias("n_users_a"),
        F.col("nb").cast("long").alias("n_users_b"),
        F.col("o1").cast("long").alias("observed_b"),
        grid_round(F.col("e1").cast("double"), scale).alias("expected_b"),
        F.when(
            F.col("v1") > 0,
            grid_round(diff * diff / F.col("v1").cast("double"), scale),
        ).alias("logrank_chi2"),
    )


def mcnemar_paired_test(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    event_type: str = "purchase",
    scale: int = 6,
) -> DataFrame:
    """McNemar's paired-binary test (McNemar 1947, public) on the
    within-user change of a binary outcome between the user's
    chronological first and second half of activity: did the per-user
    probability of `event_type` CHANGE over each user's own timeline —
    the paired companion to `two_proportion_ab_test`'s independent-groups
    z (pairing on the user removes between-user variance). Uses the
    Edwards continuity-corrected form (|b−c|−1)²/(b+c) over the
    discordant counts, with the corrected numerator floored at 0.

    Exactness: every input is an exact integer count (the half split is
    the exact order-statistic rule shared with wilcoxon/cuped); the
    statistic is one fixed IEEE expression on the 1e-6 grid. Shape: one
    per-user window split, one combinable per-user reduce, one 1-row
    reduce — no joins."""
    wg = Window.partitionBy(user_col)
    halved = df.select(
        F.col(user_col).alias("_u"),
        (F.col(type_col) == event_type).cast("int").alias("_hit"),
        _chrono_first_half(user_col, ts_col, tiebreak_col).alias("_fh"),
        F.count(F.lit(1)).over(wg).alias("_n"),
    )
    per = (
        halved.where(F.col("_n") >= 2)
        .groupBy("_u")
        .agg(
            F.max(F.when(F.col("_fh"), F.col("_hit")).otherwise(0)).alias("p1"),
            F.max(F.when(~F.col("_fh"), F.col("_hit")).otherwise(0)).alias("p2"),
        )
    )
    red = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(((F.col("p1") == 1) & (F.col("p2") == 1)).cast("int")).cast("long").alias("n_both"),
        F.sum(((F.col("p1") == 1) & (F.col("p2") == 0)).cast("int")).cast("long").alias("n_first_only"),
        F.sum(((F.col("p1") == 0) & (F.col("p2") == 1)).cast("int")).cast("long").alias("n_second_only"),
        F.sum(((F.col("p1") == 0) & (F.col("p2") == 0)).cast("int")).cast("long").alias("n_neither"),
    )
    b = F.col("n_first_only").cast("double")
    c = F.col("n_second_only").cast("double")
    num = F.greatest(F.abs(b - c) - 1.0, F.lit(0.0))
    return red.select(
        "n_users",
        "n_both",
        "n_first_only",
        "n_second_only",
        "n_neither",
        F.when(b + c > 0, grid_round(num * num / (b + c), scale)).alias("mcnemar_chi2"),
    )


def jonckheere_terpstra_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 6,
) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend test (Terpstra 1952 /
    Jonckheere 1954, public): across groups in their natural label order,
    is the value distribution stochastically INCREASING — strictly more
    powerful than Kruskal-Wallis when the alternative is a monotone trend
    (K-W asks "any difference", J-T asks "ordered difference"). JT is the
    sum over ordered group pairs (i<j) of Mann-Whitney counts
    #{x∈Gᵢ < y∈Gⱼ} + ½·ties; the z-score uses the tie-corrected null
    variance (Hollander & Wolfe 1999 form).

    Exactness: 2·JT and 2·E[JT] are exact integers (halves only from tie
    counts); every variance ingredient (Σnᵢ(nᵢ−1)(2nᵢ+5), the pooled
    tie-count analogs) is an exact DECIMAL(38,0) integer aggregate; z is
    one final IEEE expression on the 1e-6 grid. Shape: the corpus
    collapses to a per-(group, value) dictionary; cumulative-below counts
    come from k dictionary-length window passes; the pair sum is ONE
    dictionary self-join on the value (k²/2 ordered group pairs share
    it). The dictionary is value-SUPPORT-sized — for currency/integer
    domains it is bounded by the value range regardless of corpus rows
    (the ks_statistic discipline; quantize continuous values first)."""
    from ..session import lineage_pin

    # the dictionary feeds FOUR consumers (pair-join lo/hi, per-group and
    # per-value tie stats) — pin it so each doesn't re-run the corpus
    # aggregation (lazy pin: plan building stays execution-free)
    per_gv = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .groupBy("_g", "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .transform(lineage_pin)
    )
    # (value × group) grid so cum-below is defined at EVERY support point
    vals = per_gv.select("_v").distinct()
    grps = per_gv.select("_g").distinct()
    grid = vals.crossJoin(F.broadcast(grps)).join(per_gv, ["_v", "_g"], "left").select(
        "_v", "_g", F.coalesce(F.col("_c"), F.lit(0)).alias("c")
    )
    wv = Window.partitionBy("_g").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = grid.select(
        "_v", "_g", "c", F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("lt")
    )
    # cum feeds BOTH sides of the ordered-pair join — unpinned, the
    # grid-join + window subtree ran twice (r12 plan sweep). Support×k
    # rows at any corpus scale.
    cum = lineage_pin(cum)
    lo = cum.select(
        F.col("_v").alias("v"),
        F.col("_g").alias("gi"),
        F.col("c").alias("ci"),
        F.col("lt").alias("lti"),
    )
    hi = cum.select(
        F.col("_v").alias("v"), F.col("_g").alias("gj"), F.col("c").alias("cj")
    )
    # ordered pairs share one support-sized equi-join on the value;
    # the pair terms multiply in DECIMAL(38,0), never long (2·c·lt can
    # pass 2^63 on a 100 TB corpus long before the decimal cap)
    pairs = lo.join(hi, "v").where(F.col("gi") < F.col("gj"))
    cj38 = F.col("cj").cast("decimal(38,0)")
    jt2 = pairs.groupBy().agg(
        F.sum(
            F.lit(2).cast("decimal(38,0)") * cj38 * F.col("lti")
            + F.col("ci").cast("decimal(38,0)") * cj38
        )
        .cast("decimal(38,0)")
        .alias("jt2")
    )
    per_g = per_gv.groupBy("_g").agg(F.sum("_c").cast("long").alias("n"))
    ni = F.col("n").cast("decimal(38,0)")
    gstats = per_g.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum(ni * ni).cast("decimal(38,0)").alias("sn2"),
        F.sum(ni * (ni - 1) * (2 * ni + 5)).cast("decimal(38,0)").alias("u1"),
        F.sum(ni * (ni - 1)).cast("decimal(38,0)").alias("u2"),
        F.sum(ni * (ni - 1) * (ni - 2)).cast("decimal(38,0)").alias("u3"),
    )
    per_v = per_gv.groupBy("_v").agg(F.sum("_c").cast("long").alias("t"))
    tv = F.col("t").cast("decimal(38,0)")
    tstats = per_v.groupBy().agg(
        F.sum(tv * (tv - 1) * (2 * tv + 5)).cast("decimal(38,0)").alias("w1"),
        F.sum(tv * (tv - 1)).cast("decimal(38,0)").alias("w2"),
        F.sum(tv * (tv - 1) * (tv - 2)).cast("decimal(38,0)").alias("w3"),
    )
    red = jt2.crossJoin(F.broadcast(gstats)).crossJoin(F.broadcast(tstats))
    nd = F.col("nn").cast("double")
    # E[2·JT] = (N² − Σnᵢ²)/2 — exact integer halves cancel in 2·JT − 2·E
    e2 = (
        F.col("nn").cast("decimal(38,0)") * F.col("nn") - F.col("sn2")
    ).cast("double") / 2.0
    a = nd * (nd - 1.0) * (2.0 * nd + 5.0) - F.col("u1").cast("double") - F.col(
        "w1"
    ).cast("double")
    bb = F.col("u3").cast("double") * F.col("w3").cast("double") / (
        36.0 * nd * (nd - 1.0) * (nd - 2.0)
    )
    cc = F.col("u2").cast("double") * F.col("w2").cast("double") / (
        8.0 * nd * (nd - 1.0)
    )
    var = a / 72.0 + bb + cc
    z = (F.col("jt2").cast("double") - e2) / (2.0 * F.sqrt(var))
    return red.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("nn").cast("long").alias("n_total"),
        grid_round(F.col("jt2").cast("double") / 2.0, scale).alias("jt_statistic"),
        grid_round(e2 / 2.0, scale).alias("expected_jt"),
        F.when((F.col("k") > 1) & (var > 0), grid_round(z, scale)).alias("jt_z"),
    )
