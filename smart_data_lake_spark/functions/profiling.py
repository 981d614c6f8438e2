"""Column profiling: per-column statistics in one pass over the data.

The standard data-catalog profile (count / nulls / distinct / min / max /
mean / median) computed for a set of columns in TWO aggregates — a plain
stats pass and a multi-distinct pass, cross-joined 1-row × 1-row — then
unpivoted driver-free with `stack` into the long (col_name, stat…) form.
Two passes beat one here: fusing COUNT(DISTINCT …) with the other buffers
makes Catalyst's Expand rewrite multiply every input row by the distinct
group count and drag the percentile buffers across the copies (measured 4×
slower). Each pass is one shuffle of one partial row per partition.

Numeric min/max/mean/median are reported as doubles; min/max of
non-numeric columns are reported as strings (`min_str`/`max_str`). Median is
the exact interpolated percentile (Spark `percentile`, identical definition
to ANSI `quantile_cont`/`percentile_cont` at p=0.5), NOT the approximate
sketch — at 100 TB swap in `percentile_approx` when a bounded-memory sketch
is acceptable; the exact form is the oracle-checkable contract.

Reference parity: the reference computes per-DataObject statistics through
its expectations/metrics engine (sdl-core ExpectationValidation); this is
the Spark-first equivalent of a whole-table profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_data_lake_spark.session import lineage_pin
from pyspark.sql.types import DoubleType, FloatType, NumericType

from smart_data_lake_spark.functions.numeric import grid_round


def grouped_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    z_threshold: float = 3.0,
    decimal_scale: int = 6,
) -> DataFrame:
    """Rows whose value deviates more than `z_threshold` population standard
    deviations from their group mean.

    Built for cross-engine determinism: mean and variance come from EXACT
    decimal sums (sum, sum-of-squares) with the float ops (division, sqrt)
    applied once to the reduced scalars — so the flagged set is identical on
    any engine and any partitioning, unlike stddev_pop over doubles whose
    partial-aggregation order varies. Plan: one partial-aggregated groupBy
    over the group keys + a broadcast join back — two scans, one tiny
    shuffle; group count is assumed small (dimension-like)."""
    # decimal(18,s) so the square stays within the 38-digit decimal cap that
    # both Spark and ANSI engines share (18+18 = 36 < 38); sums widen safely.
    # grid_round before the cast (r10 sweep): a bare double→DECIMAL cast
    # rounds engine-natively (Spark shortest-decimal HALF_UP vs DuckDB
    # binary — measured divergence on 16666.3333215) — the grid form fixes
    # the value with shared IEEE ops first, making the cast exact
    v_dec = grid_round(F.col(value_col), decimal_scale).cast(
        f"decimal(18,{decimal_scale})"
    )
    stats = df.groupBy(*group_cols).agg(
        F.sum(v_dec).cast("double").alias("_sum"),
        F.sum(v_dec * v_dec).cast("double").alias("_sumsq"),
        F.count(value_col).alias("_n"),
    )
    mean = F.col("_sum") / F.col("_n")
    var = F.col("_sumsq") / F.col("_n") - mean * mean
    enriched = stats.select(
        *group_cols,
        mean.alias("_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_std"),
    )
    joined = df.join(F.broadcast(enriched), on=group_cols, how="inner")
    z = (F.col(value_col) - F.col("_mean")) / F.col("_std")
    return (
        joined.where(F.col("_std") > 0)
        .where(F.abs(z) > z_threshold)
        .withColumns({"group_mean": F.col("_mean"), "group_std": F.col("_std"), "zscore": z})
        .drop("_mean", "_std")
    )


def exact_percentiles(frame, col: str, group_cols: list[str], probs):
    """Explicit order-statistics percentile_cont for EXACT-RATIONAL
    probabilities (global when ``group_cols`` is empty). ``probs`` is a
    list of (alias, num, den): position (n−1)·num/den splits into integer
    rank lo = ((n−1)·num) div den + 1 and fraction
    frac = ((n−1)·num mod den)/den — frac is ONE correctly-rounded double
    division of small integers, identical in every engine — and the value
    is v_lo + (v_hi − v_lo)·frac, one fixed IEEE expression of raw inputs
    (Spark `percentile` and DuckDB `quantile_cont` interpolate through
    DIFFERENT expression shapes — the mad_outliers/exact_quartiles r11
    lesson). One window sort serves every requested percentile. Returns
    (group_cols..., *aliases) UNROUNDED; groups with no non-null values
    are absent (callers left-join)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(F.col(col))
    wg = Window.partitionBy(*group_cols)
    ranked = (
        frame.where(F.col(col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
    )
    aggs = []
    for alias, num, den in probs:
        pos = (F.col("_n") - 1) * num
        # Exact INTEGER division for the rank (r11 ADVICE): the old
        # F.floor(pos / den) went through a double quotient, which past
        # 2^53 can floor to a different rank than the exactly-computed
        # `frac` / the oracle's integer `//`. SQL `div` is exact long
        # arithmetic — lockstep with _interp_sql's `//`.
        lo = F.expr(f"((_n - 1) * {int(num)}) div {int(den)}") + 1
        hi = F.least(lo + 1, F.col("_n"))
        frac = (pos % den).cast("double") / float(den)
        vlo = F.max(F.when(F.col("_rn") == lo, F.col(col)))
        vhi = F.max(F.when(F.col("_rn") == hi, F.col(col)))
        fr = F.max(F.when(F.col("_rn") == 1, frac))
        aggs.append((vlo + (vhi - vlo) * fr).alias(alias))
    return ranked.groupBy(*group_cols).agg(*aggs)


def _interp_median(frame, col: str, group_cols: list[str]):
    """The median instance of `exact_percentiles` (rank lo = (n−1) div 2
    + 1, frac ∈ {0, ½}); returns (group_cols..., _m)."""
    return exact_percentiles(frame, col, group_cols, [("_m", 1, 2)])


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    decimal_mean_scale: int | None = None,
    exact_median: bool = False,
) -> DataFrame:
    """One-pass profile of `cols` (default: all columns).

    Returns (col_name, n_rows, n_null, n_distinct, min_str, max_str, mean,
    median) with mean/median null for non-numeric columns, ordered by
    col_name.

    `decimal_mean_scale`: when set, the mean is computed as an exact
    decimal(28,scale) sum followed by ONE double division — order-independent
    and bit-identical across engines, unlike a plain double avg whose
    summation order varies with partitioning. Use it whenever the profile is
    compared across systems.

    `exact_median`: when set, numeric medians come from `_interp_median`'s
    explicit order statistics instead of Spark's `percentile` library — the
    cross-engine-exact form (engine percentile libraries interpolate through
    different expression shapes); the default keeps the cheap one-pass
    aggregate for local profiling. All numeric columns are MELTED into one
    (col_name, value) frame and ranked in a single window pass PARTITIONED
    by col_name (r11 ADVICE: the old form ran one unpartitioned global sort
    plus a full rescan PER numeric column — O(cols) single-partition sorts).
    Values interpolate in double (ints < 2^53 are exact); an all-null
    numeric column profiles with median NULL (the old per-column crossJoin
    emptied the whole result on that edge)."""
    cols = cols or df.columns
    by_name = {f.name: f.dataType for f in df.schema.fields}
    # Two aggregate nodes, cross-joined as 1-row × 1-row: Catalyst rewrites
    # multi-column COUNT(DISTINCT) with an Expand that multiplies input rows
    # by (n_distinct_groups + 1) and drags every other buffer (percentile!)
    # across the duplicated rows — measured 4× slower fused than split. Two
    # simple aggregates each stream the scan once with map-side partials;
    # the join is a literal 1×1 crossJoin.
    plain_aggs, distinct_aggs = [], []
    for c in cols:
        if c not in by_name:
            raise ValueError(f"unknown column {c!r}")
        numeric = isinstance(by_name[c], NumericType)
        col = F.col(c)
        if not numeric:
            mean_expr = F.lit(None).cast("double")
        elif decimal_mean_scale is not None:
            mean_expr = (
                F.sum(col.cast(f"decimal(28,{decimal_mean_scale})")).cast("double")
                / F.count(col)
            )
        else:
            mean_expr = F.avg(col.cast("double"))
        if isinstance(by_name[c], (FloatType, DoubleType)):
            # Engine-exact min/max STRINGS for binary floats (r11,
            # property-harness-found): Spark renders doubles via Java
            # Double.toString ('5.96E-8'), DuckDB via C++ shortest repr
            # ('5.96e-08') — same value, different text. Fixed-scale
            # DECIMAL renders identically in both engines ('0.000000'),
            # so float min/max quantize through the shared grid and
            # stringify as DECIMAL(38,6). TOTAL over the double domain
            # (review-found): NaN/±Infinity render as fixed literals (a
            # bare decimal cast NULLs on Spark and hard-errors on an ANSI
            # engine), and |x| past grid_round's 2^62/1e6 identity limit —
            # where the decimal cast would round engine-natively anyway —
            # falls back to the engine's native string (documented
            # residual, the pre-r11 behavior for those magnitudes).
            def _fstr(agg):
                lim = float(2**62) / 1e6
                return (
                    F.when(F.isnan(agg), F.lit("NaN"))
                    .when(agg == float("inf"), F.lit("Infinity"))
                    .when(agg == float("-inf"), F.lit("-Infinity"))
                    .when(
                        F.abs(agg) < F.lit(lim),
                        grid_round(agg, 6).cast("decimal(38,6)").cast("string"),
                    )
                    .otherwise(agg.cast("string"))
                )

            min_expr = _fstr(F.min(col))
            max_expr = _fstr(F.max(col))
        else:
            min_expr = F.min(col).cast("string")
            max_expr = F.max(col).cast("string")
        plain_aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            min_expr.alias(f"{c}__min"),
            max_expr.alias(f"{c}__max"),
            mean_expr.alias(f"{c}__mean"),
        ]
        if numeric and exact_median:
            pass  # joined below from the explicit order-statistics frame
        else:
            plain_aggs.append(
                (
                    F.expr(f"percentile({c}, 0.5D)") if numeric else F.lit(None).cast("double")
                ).alias(f"{c}__median")
            )
        distinct_aggs.append(F.countDistinct(col).alias(f"{c}__distinct"))
    one_row = df.agg(*plain_aggs).crossJoin(df.agg(*distinct_aggs))
    if exact_median:
        num_cols = [c for c in cols if isinstance(by_name[c], NumericType)]
        if num_cols:
            melt = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in num_cols)
            melted = df.select(
                F.expr(f"stack({len(num_cols)}, {melt}) AS (_pc_col, _pc_val)")
            )
            meds = (
                _interp_median(melted, "_pc_val", ["_pc_col"])
                .groupBy()
                .pivot("_pc_col", num_cols)
                .agg(F.first("_m"))
                .select(*[F.col(c).alias(f"{c}__median") for c in num_cols])
            )
            one_row = one_row.crossJoin(F.broadcast(meds))
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__distinct, {c}__min, {c}__max, {c}__mean, {c}__median"
        for c in cols
    )
    stacked = one_row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_null, n_distinct, min_str, max_str, mean, median)"
        )
    )
    return stacked.orderBy("col_name")


def mad_outliers(
    df,
    group_col: str,
    value_col: str,
    threshold: float = 3.0,
):
    """Robust (median/MAD) outlier detection per group — the
    breakdown-resistant complement to `grouped_outliers`' z-scores: one
    extreme value cannot drag the center or the spread.

    MAD = median(|v − median(v)|). Flags rows with |v − median| >
    threshold × MAD; groups with MAD = 0 report zero outliers (degenerate
    spread) rather than dividing by zero.

    Engine-exactness (r11 sweep — the exact_quartiles rework applied to
    the two medians): both medians are computed EXPLICITLY from order
    statistics — rank lo = (n−1) div 2 + 1, exact binary fraction
    frac = ((n−1) mod 2)/2 ∈ {0, ½}, result v_lo + (v_hi − v_lo)·frac —
    one fixed IEEE expression of raw doubles, bit-identical on any
    engine, instead of each engine's percentile library (Spark
    `percentile` and DuckDB `quantile_cont` interpolate through
    different expression shapes). Finals quantize through the shared
    `grid_round`, never engine round().

    Shape: one window sort per group for each median (two shuffles, same
    count as the old percentile form), broadcast joins back; at the
    100 TB tier swap in `approx_quantile_buckets`' GK sketch for the
    same contract at bounded memory — this is the audit-grade companion.
    """
    medians = _interp_median(df, value_col, [group_col]).withColumnRenamed("_m", "_med")
    # LEFT joins keep all-null groups in the output (median/mad NULL, the
    # old percentile()-based form's semantics) instead of dropping them
    with_dev = df.join(F.broadcast(medians), group_col, "left").withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mads = _interp_median(with_dev, "_adev", [group_col]).withColumnRenamed("_m", "_mad")
    return (
        with_dev.join(F.broadcast(mads), group_col, "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            grid_round(F.first("_med"), 6).alias("median_value"),
            grid_round(F.first("_mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    (F.col("_mad") > 0)
                    & (F.col("_adev") > F.lit(threshold) * F.col("_mad")),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


def pairwise_correlations(
    df,
    cols: list[str],
    group_col: str | None = None,
    decimals: int = 6,
    check_bound: bool = False,
):
    """Pearson correlations for every column pair via exact DECIMAL
    sufficient statistics — the engine/partition-order-independent
    formulation (same discipline as `grouped_outliers` and the OLS trend
    fit): values round to 1e-6 BEFORE summation, the sums are exact decimal
    arithmetic, and the final corr arithmetic is a fixed IEEE expression of
    those exact sums, so any engine computing the same formula agrees
    bit-for-bit. Built-in `corr()` is a running single-pass estimator whose
    result depends on accumulation order — fine for exploration, ungradable
    across engines.

    One map-side-combinable aggregation for ALL pairs (no per-pair scans);
    k columns → k + k(k+1)/2 sum columns in a single reduce row per group.
    Returns (group?, col_a, col_b, corr, n) for a < b pairs.

    Caller contract: |value| < 10^(12) (the decimal(18,6) integer-digit
    budget) — an out-of-contract value silently NULLs out of the Spark
    sums (non-ANSI cast) while a DECIMAL-typed engine hard-errors, so the
    failure mode is divergent, not just wrong. Opt-in ``check_bound``
    counts violations in one cheap combinable pre-aggregate and raises a
    diagnosable error naming the column (the spearman/burstiness
    `check_bound` discipline).
    """
    from pyspark.sql import functions as F

    # decimal(18,s), not (38,s): Spark's (38,s)x(38,s) product CLAMPS the
    # scale back to s (hypothesis-found live: 0.000061^2 -> 0.000000 while
    # DuckDB keeps scale 2s), so squares of sub-1e-3 values vanished on one
    # side only; (18,6)x(18,6) -> (37,12), exact — the proven
    # lagged_autocorrelation treatment.
    dec = f"decimal(18,{decimals})"
    if check_bound:
        lim = float(10 ** (18 - decimals))
        # Bound-check the QUANTIZED value, not the raw one (r11 ADVICE): a
        # raw value in [lim - 0.5·10^-d, lim) passes a raw check yet
        # grid_rounds up to exactly lim, overflowing the decimal on the
        # non-ANSI side into a silent NULL — the divergent failure mode
        # this check exists to catch.
        bad = df.agg(
            *[
                F.sum(
                    F.when(F.abs(grid_round(F.col(c), decimals)) >= lim, 1).otherwise(0)
                ).alias(c)
                for c in cols
            ]
        ).collect()[0]
        for c in cols:
            if bad[c]:
                raise ValueError(
                    f"pairwise_correlations: {bad[c]} value(s) in {c!r} exceed "
                    f"|x| < 1e{18 - decimals} (decimal(18,{decimals}) budget); "
                    "rescale the column or lower `decimals`"
                )
    # grid_round before the cast (r10/r11 sweep): the input-side
    # quantization of raw doubles is the same cross-engine class
    q = {c: grid_round(F.col(c), decimals).cast(dec) for c in cols}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(q[c]).alias(f"_s_{c}"))
        aggs.append(F.sum(q[c] * q[c]).alias(f"_ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum(q[a] * q[b]).alias(f"_sp_{a}_{b}"))
    keys = [group_col] if group_col else []
    stats = df.groupBy(*keys).agg(*aggs)

    # all pairs leave the single aggregated row via ONE explode — a union of
    # per-pair selects would carry k(k-1)/2 copies of the aggregate subplan
    # (exchange reuse is best-effort; measured 2× slower on the bench query)
    pair_structs = []
    for a, b in pairs:
        n = F.col("_n").cast("double")
        sa, sb = F.col(f"_s_{a}").cast("double"), F.col(f"_s_{b}").cast("double")
        ssa, ssb = F.col(f"_ss_{a}").cast("double"), F.col(f"_ss_{b}").cast("double")
        sp = F.col(f"_sp_{a}_{b}").cast("double")
        num = n * sp - sa * sb
        # guard each RADICAND before sqrt (the lagged_autocorrelation
        # treatment): a constant series cancels to a tiny NEGATIVE in
        # double, sqrt(negative) is NaN in Spark — and Spark's NaN > 0 is
        # TRUE (NaN sorts greatest), so the old post-sqrt den > 0 guard
        # emitted NaN where DuckDB hard-errors (hypothesis-found live)
        ra = n * ssa - sa * sa
        rb = n * ssb - sb * sb
        corr = F.when(
            (ra > 0) & (rb > 0), grid_round(num / (F.sqrt(ra) * F.sqrt(rb)), decimals)
        )
        pair_structs.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                corr.alias("corr"),
                F.col("_n").alias("n"),
            )
        )
    return stats.select(*keys, F.explode(F.array(*pair_structs)).alias("_p")).select(
        *keys, "_p.col_a", "_p.col_b", "_p.corr", "_p.n"
    )


def value_histogram(
    df,
    value_col: str,
    n_buckets: int = 20,
    group_col: str | None = None,
):
    """Equi-width histogram: one tiny min/max aggregate broadcast back, then
    a stateless bucket projection + combinable count — two scans, no sort,
    the profiling companion to `approx_quantile_buckets` (which buckets by
    equal FREQUENCY; this buckets by equal WIDTH).

    Bucket index = floor((v − min) · n / (max − min)) clamped to n−1 (the
    max value belongs to the last bucket, the standard half-open convention);
    a degenerate range (min == max) puts everything in bucket 0. Bounds are
    rounded to 1e-6 pre-bucketing so edges are engine-identical."""
    from pyspark.sql import functions as F

    keys = [group_col] if group_col else []
    # grid_round, not engine round() (r10 sweep): raw-double inputs can
    # sit on the shortest-decimal half-grid where engines' round diverges
    v = grid_round(F.col(value_col), 6)
    bounds = df.groupBy(*keys).agg(
        grid_round(F.min(value_col), 6).alias("_lo"),
        grid_round(F.max(value_col), 6).alias("_hi"),
    )
    joined = df.join(F.broadcast(bounds), keys) if keys else df.crossJoin(F.broadcast(bounds))
    bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((v - F.col("_lo")) * n_buckets / (F.col("_hi") - F.col("_lo"))).cast("int"),
        )
    )
    return (
        joined.select(*keys, bucket.alias("bucket"), "_lo", "_hi")
        .groupBy(*keys, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # lo + b·(hi−lo)/n is RATIONAL in the 1e-6-quantized bounds —
            # half-grid class → grid_round (r10 sweep)
            grid_round(
                F.first("_lo") + F.col("bucket") * (F.first("_hi") - F.first("_lo")) / n_buckets,
                6,
            ).alias("bucket_lo"),
        )
    )


def kmv_distinct(
    df,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
):
    """KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002,
    "Counting distinct elements in a data stream") with a DETERMINISTIC
    md5-derived hash, so the estimate is reproducible across engines/runs —
    unlike approx_count_distinct's HLL whose internal hashing is
    engine-specific and can't be oracle-graded.

    Estimator: with h_(k) the k-th smallest of the distinct keys' uniform
    hashes in [0,1), D̂ = (k−1)/h_(k); exact count when a group has fewer
    than k distinct keys. The sketch state is k values per group — the
    mergeable, bounded-memory shape that replaces exact distinct at 100 TB.
    Emits exact count alongside for the error audit."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    keys = [*(group_cols or [])]
    h = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast("long")
        / F.lit(float(2**32))
    )
    uniq = df.select(*keys, F.col(key_col)).distinct().withColumn("_h", h)
    w = Window.partitionBy(*keys).orderBy("_h", key_col) if keys else Window.orderBy("_h", key_col)
    ranked = uniq.withColumn("_rk", F.row_number().over(w))
    per = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("_rk") == k, F.col("_h"))).alias("_hk"),
    )
    est = F.when(F.col("n_exact") < k, F.col("n_exact").cast("double")).otherwise(
        (k - 1) / F.col("_hk")
    )
    # grid_round (r10 sweep): the estimate (k−1)·2³²/m and the relative
    # error are RATIONALS — the half-grid class where engine round()
    # diverges cross-engine
    est_r = grid_round(est, 0)
    return per.select(
        *keys,
        "n_exact",
        est_r.cast("long").alias("kmv_estimate"),
        grid_round((est_r - F.col("n_exact")) / F.col("n_exact"), 4).alias("rel_error"),
    )


def exact_quartiles(
    df,
    value_col: str,
    group_cols: list[str],
):
    """Exact linear-interpolated quartiles per group (the SQL-standard
    percentile_cont semantics), plus count. The exact form sorts each
    group once; at the 100 TB tier swap in approx_quantile_buckets (GK
    sketch) for the same contract at bounded memory — this operator is
    the audit-grade companion.

    Engine-exactness (r9 hardening — a hypothesis run caught Spark's
    `percentile` and DuckDB's `quantile_cont` diverging by one 1e-6 digit
    on a boundary series): the interpolation is computed EXPLICITLY from
    order statistics instead of each engine's library. For quartile k,
    position (n−1)·k/4 splits into an integer rank lo = ((n−1)·k) div 4
    and an EXACT binary fraction frac = ((n−1)·k mod 4)/4 ∈ {0, ¼, ½, ¾},
    and the result is v_lo + (v_hi − v_lo)·frac — one fixed IEEE
    expression of raw input doubles, bit-identical on any engine. One
    window sort per group + one combinable aggregate (same shuffle shape
    as before).

    The final 1e-6 quantization is floor(x·1e6 + 0.5)/1e6 — pure double
    arithmetic, identical in every engine — NOT the engine round():
    Spark's round() rounds the double's SHORTEST-DECIMAL representation
    HALF_UP while DuckDB rounds the binary value, and an interpolated
    quartile can land exactly on the half-grid (hypothesis constructed
    one: 0.4750075 → 0.475008 vs 0.475007)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    wg = Window.partitionBy(*group_cols)
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col))
    ranked = (
        df.where(F.col(value_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
    )

    def quartile(k: int):
        pos = (F.col("_n") - 1) * k  # quarter-units
        # exact long `div` (r11 ADVICE, the exact_percentiles treatment):
        # the double quotient can mis-floor past 2^53
        lo = F.expr(f"((_n - 1) * {int(k)}) div 4") + 1  # 1-based lower rank
        hi = F.least(lo + 1, F.col("_n"))
        frac = (pos % 4).cast("double") / 4.0  # exact: 0, .25, .5, .75
        vlo = F.max(F.when(F.col("_rn") == lo, F.col(value_col)))
        vhi = F.max(
            F.when(F.col("_rn") == hi, F.col(value_col))
        )
        # frac is constant within a group; max() just extracts it
        fr = F.max(F.when(F.col("_rn") == 1, frac))
        q = vlo + (vhi - vlo) * fr
        # engine-exact 1e-6 grid, not engine round(); r10: the shared
        # sign-symmetric form (ties away from zero — quartiles of a
        # negative-valued column hit negative ties)
        return grid_round(q, 6)

    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        quartile(1).alias("q1"),
        quartile(2).alias("median"),
        quartile(3).alias("q3"),
    )


def _chi2_stats(
    df,
    col_a: str,
    col_b: str,
    decimals: int = 6,
):
    """Pearson chi-square independence statistic for two categorical
    columns (is the language mix independent of the source?) — the
    one-number drift alarm for corpus composition audits. Shared core of
    `chi_square_independence` and `cramers_v`; returns
    (chi2, dof, n, n_rows, n_cols).

    chi2 = sum over cells of (n_ij - e_ij)^2 / e_ij with
    e_ij = row_i * col_j / N. Every count is exact; each cell's term is a
    fixed IEEE expression of exact integers (identical in any engine), and
    the CELL SUM — the only order-sensitive float reduction — rounds each
    term to 1e-6 and accumulates in exact DECIMAL, so the statistic is
    partition-order-independent and engine-exact. Shape: one (a,b) count
    aggregate (cells ≈ |A|·|B|, tiny), marginals re-aggregated FROM the
    cell frame (no second corpus scan), broadcast back."""
    from pyspark.sql import functions as F

    # the cell frame is consumed by four downstream aggregates (row/col
    # marginals, totals, the grid join); without a lineage cut Catalyst
    # re-derives it from the CORPUS SCAN each time (measured 5 scans).
    # localCheckpoint materializes the marginal-scale frame once — same
    # treatment as connected_components' iteration frames.
    # complete-case analysis: rows with a NULL category are excluded UP
    # FRONT — a NULL key would silently zero its cell in the null-unsafe
    # grid join below while still inflating the marginals and N (and both
    # engines' LEFT JOINs share the blindness, so grading couldn't catch
    # the corrupted statistic)
    obs = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cells = (
        obs.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("n_ij")).transform(lineage_pin, eager=True)
    )
    row_m = cells.groupBy(col_a).agg(F.sum("n_ij").alias("n_i"))
    col_m = cells.groupBy(col_b).agg(F.sum("n_ij").alias("n_j"))
    tot = cells.agg(
        F.sum("n_ij").alias("n"),
        F.countDistinct(col_a).alias("n_rows"),
        F.countDistinct(col_b).alias("n_cols"),
    )
    dec = f"decimal(18,{decimals})"
    # expand to the FULL category grid: an absent cell is an observation of
    # ZERO and still contributes (0 - e)^2 / e = e to the statistic —
    # joining only observed cells silently understates dependence (a fully
    # dependent 2x2 would report N/2 instead of N). The grid is
    # |A| x |B| rows — marginal-scale, not corpus-scale.
    grid = row_m.crossJoin(col_m)
    joined = (
        grid.join(cells, [col_a, col_b], "left")
        .withColumn("n_ij", F.coalesce(F.col("n_ij"), F.lit(0)))
        .crossJoin(F.broadcast(tot.select("n")))
    )
    e = F.col("n_i").cast("double") * F.col("n_j").cast("double") / F.col("n").cast("double")
    term = (F.col("n_ij").cast("double") - e) * (F.col("n_ij").cast("double") - e) / e
    # grid_round, not engine round() (r10/r11 sweep: the cell term is a
    # float rational that can land on the half-grid)
    summed = joined.select(grid_round(term, decimals).cast(dec).alias("_t")).agg(
        F.sum("_t").cast("double").alias("chi2")
    )
    return summed.crossJoin(F.broadcast(tot)).select(
        F.col("chi2"),
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).cast("long").alias("dof"),
        F.col("n").cast("long").alias("n"),
        F.col("n_rows"),
        F.col("n_cols"),
    )


def chi_square_independence(
    df,
    col_a: str,
    col_b: str,
    decimals: int = 6,
):
    """Pearson chi-square independence statistic for two categorical
    columns — see `_chi2_stats` for the full exactness/shape discussion
    (this is its public (chi2, dof, n) projection)."""
    return _chi2_stats(df, col_a, col_b, decimals).select("chi2", "dof", "n")


def cramers_v(
    df,
    col_a: str,
    col_b: str,
    decimals: int = 6,
):
    """Cramér's V association strength between two categorical columns
    (Cramér 1946, public): V = sqrt(chi2 / (N · min(r−1, c−1))) — the
    [0, 1]-normalized companion of `chi_square_independence`, comparable
    across tables of different size and shape (the raw chi2 is not). The
    corpus-audit use: a one-number "how strongly does language depend on
    source" that stays interpretable as the corpus grows.

    Exactness: chi2 comes from `_chi2_stats`' decimal-summed engine-exact
    cells; the V expression is one fixed IEEE sqrt of that plus exact
    integers, final on the shared 1e-6 grid (never engine round()).
    Shape: identical to chi2 — marginal-scale frames only. Degenerate
    tables (single row or column category) yield NULL V."""
    s = _chi2_stats(df, col_a, col_b, decimals)
    mind = F.least(F.col("n_rows") - 1, F.col("n_cols") - 1).cast("double")
    v = F.when(
        (mind > 0) & (F.col("n") > 0),
        grid_round(F.sqrt(F.col("chi2") / (F.col("n").cast("double") * mind)), decimals),
    )
    return s.select("chi2", "dof", "n", v.alias("cramers_v"))


def k_anonymity_audit(
    df,
    qi_cols: list[str],
    k: int = 5,
):
    """k-anonymity audit over a quasi-identifier column set (Sweeney 2002,
    public): every row whose QI equivalence class has fewer than ``k``
    members is re-identifiable at the k threshold. The privacy gate run
    before a table is released into a training mix: "how many rows are
    below k, and how small is the worst class".

    Returns one row: (n_rows, n_classes, min_class_size, n_rows_below_k,
    frac_rows_below_k). Rows with a NULL in any QI column form their own
    NULL-keyed classes (groupBy semantics) — a NULL quasi-identifier still
    identifies.

    Exactness: everything is exact integers except the final fraction —
    one int/int rational on the shared 1e-6 grid. Shape: one map-side
    combinable groupBy on the QI key + one 1-row reduce over class sizes;
    no joins, no windows — scan-bound at any scale, and the class-size
    frame is |distinct QI| rows, never corpus-scale."""
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("_sz"))
    return classes.agg(
        F.sum("_sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("_sz").cast("long").alias("min_class_size"),
        F.coalesce(
            F.sum(F.when(F.col("_sz") < k, F.col("_sz"))), F.lit(0)
        ).cast("long").alias("n_rows_below_k"),
        grid_round(
            F.coalesce(F.sum(F.when(F.col("_sz") < k, F.col("_sz"))), F.lit(0))
            / F.sum("_sz"),
            6,
        ).alias("frac_rows_below_k"),
    )


def chao1_vocab_richness(
    df,
    group_col: str = "source",
    text_col: str = "text",
):
    """Chao1 species-richness estimate of the TRUE vocabulary size per
    group (Chao 1984, public): the observed distinct-term count plus the
    unseen-mass correction f1·(f1−1)/(2·(f2+1)) from singleton/doubleton
    counts — the bias-corrected form, defined even when no term occurs
    exactly twice. The corpus-audit companion of `kmv_distinct`: KMV
    estimates what IS in the data; Chao1 estimates how much vocabulary the
    sample has NOT seen yet (a low chao1/observed ratio says the source is
    vocabulary-saturated; a high one says more data would keep adding
    terms).

    Exactness: term counts, f1, f2 are exact integers; the correction is
    one int-derived IEEE rational on the shared 1e-6 grid. Shape: one
    explode + (group, term) map-side-combined count, then one combinable
    per-group reduce over vocabulary-scale rows — no joins, no windows."""
    from .text import tokens

    toks = df.select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    tf = toks.groupBy(group_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
    f1 = F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).cast("double")
    f2 = F.sum(F.when(F.col("_c") == 2, 1).otherwise(0)).cast("double")
    d = F.count(F.lit(1)).cast("double")
    return tf.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_observed_terms"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).cast("long").alias("f1_singletons"),
        F.sum(F.when(F.col("_c") == 2, 1).otherwise(0)).cast("long").alias("f2_doubletons"),
        grid_round(d + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 6).alias("chao1_estimate"),
    )


def ks_statistic(
    df,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
):
    """Two-sample Kolmogorov-Smirnov statistic: D = max over x of
    |F_a(x) − F_b(x)| between the value distributions of two groups — the
    standard distribution-drift test for corpus audits ("did src7's length
    distribution shift after the recrawl?").

    Exactness: the ECDFs are ratios of exact integer cumulative counts, so
    every D_x is one fixed IEEE division/subtraction — engine-identical;
    the argmax ties break on the value. Shape: one combinable per-distinct-
    value count aggregate, then a cumulative window over the DISTINCT value
    frame — that window is a single partition by construction (KS needs the
    global value order), but it runs on the aggregated support
    (|distinct values| rows), never the corpus; for a value domain too
    large to aggregate, pre-bucket into quantile bins first."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tagged = df.where(F.col(group_col).isin(group_a, group_b)).select(
        F.col(value_col).alias("x"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("_a"),
        F.when(F.col(group_col) == group_b, 1).otherwise(0).alias("_b"),
    )
    per_x = tagged.groupBy("x").agg(
        F.sum("_a").alias("ca"), F.sum("_b").alias("cb")
    )
    totals = tagged.agg(
        F.sum("_a").alias("na"), F.sum("_b").alias("nb")
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_x.select(
        "x",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    ).crossJoin(F.broadcast(totals))
    d = F.abs(
        F.col("cum_a").cast("double") / F.col("na").cast("double")
        - F.col("cum_b").cast("double") / F.col("nb").cast("double")
    )
    pick = Window.orderBy(F.desc("_d"), F.col("x"))
    return (
        cum.select("x", "na", "nb", d.alias("_d"))
        .withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .select(
            F.col("_d").alias("ks"),
            F.col("x").alias("at_value"),
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    phi_denominator: int = 2000,
) -> DataFrame:
    """Count-Min-sketch heavy hitters over a token stream (Cormode &
    Muthukrishnan 2005, "An improved data stream summary: the count-min
    sketch and its applications") with DETERMINISTIC md5-row hashes so the
    estimates reproduce bit-identically across engines (same discipline as
    `kmv_distinct`).

    The at-scale shape — exactly TWO passes over the raw stream:
      1. one pass builds the depth×width cell counts — a map-side-combinable
         groupBy whose output is ≤ depth·width rows (4 KiB-ish),
         broadcastable anywhere;
      2. one vocabulary pass (groupBy(term).count(), combinable, output
         bounded by vocabulary) yields the per-term exact counts AND the
         term list that gets its CMS estimate via a broadcast join against
         the cells + min-over-rows. Candidates (estimate ≥
         total/phi_denominator; CMS never under-counts, so the prefilter
         has no false negatives) already carry their exact count — a third
         stream scan would be pure waste, since a distinct-terms pass pays
         the same shuffle as the counting pass (r7 review finding).
    The total-token count is recovered from the sketch itself (each row of
    cells sums to the stream length) — no extra pass. At true 100 TB point-
    query scale one would skip the vocabulary pass entirely and answer
    membership queries from the broadcast sketch alone; the heavy-hitter
    ENUMERATION graded here needs the vocabulary pass in any formulation.

    Output: (term, cms_estimate, n_exact) for terms whose EXACT count
    clears the φ-threshold; the estimate column exposes the sketch error
    for audit. Reference has no CMS; this extends the profiling family
    (SURVEY §2 additions) for 100 TB vocabularies where an unfiltered
    per-term exact count is the bottleneck.
    """
    from smart_data_lake_spark.functions.text import tokens

    toks = (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(tokens(F.col(text_col))).alias("term"))
    )

    def _bucket(j, term_col):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), term_col)), 1, 8), 16, 10)
            .cast("long") % width
        )

    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), _bucket(j, F.col("term")).alias("bucket"))
                        for j in range(depth)
                    ]
                )
            ).alias("jb")
        )
        .groupBy(F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # stream length from the sketch: any single row of cells sums to it
    total = cells.where(F.col("j") == 0).agg(F.sum("c").alias("t"))

    terms = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    # Candidate bound (r7-verdict item 5): a term's estimate is the MIN over
    # its depth cells, so estimate >= t/phi requires EVERY cell to clear the
    # threshold. Prefilter the sketch to those "hot" cells first — each
    # sketch row sums to the stream length, so at most phi_denominator cells
    # per row clear it: the join side is bounded at depth*phi_denominator
    # rows INDEPENDENT of data volume, and the join output collapses from
    # |vocab|*depth matches to hot-cell hits only. A heavy term (exact >=
    # t/phi) has every cell count >= exact >= t/phi, so all its cells are
    # hot and it matches depth times — no false negatives; survivors carry
    # the same min-over-cells estimate, so the output is bit-identical.
    hot = (
        cells.crossJoin(F.broadcast(total))
        .where(F.col("c") * phi_denominator >= F.col("t"))
        .select("j", "bucket", "c", "t")
    )
    est = (
        terms.select(
            "term",
            "n_exact",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), _bucket(j, F.col("term")).alias("bucket"))
                        for j in range(depth)
                    ]
                )
            ).alias("jb"),
        )
        .join(F.broadcast(hot), (F.col("jb.j") == hot.j) & (F.col("jb.bucket") == hot.bucket))
        .groupBy("term", "n_exact", "t")
        .agg(F.min("c").alias("cms_estimate"), F.count(F.lit(1)).alias("_hits"))
        .where(F.col("_hits") == depth)
    )
    return est.where(F.col("n_exact") * phi_denominator >= F.col("t")).select(
        "term", "cms_estimate", "n_exact"
    )


# Benford probabilities log10(1 + 1/d) as shared Python-side literals: both
# engines consume the SAME double constants, so no cross-engine log() call
# can diverge (math.log10 evaluated once, here)
BENFORD_P = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}


def benford_first_digit(
    df: DataFrame,
    value_col: str,
    cents: bool = True,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law (Newcomb 1881
    / Benford 1938, public): the classic fabricated-amounts /
    data-quality screen for financial columns.

    Exactness: values become integer cents first (round-half-up on the
    identical input double in every engine), the leading digit comes from
    the integer's decimal string — no log10 on data, no float digit
    extraction. Expected fractions are shared Python literals (BENFORD_P),
    so deviation arithmetic is identical-literal IEEE in both engines.

    Shape: one map-side-combined groupBy on a 9-value key + a 9-row
    broadcast join with the expectation table; scan-bound at any scale.

    Output: (digit, n_obs, obs_frac, benford_frac, abs_dev), digits with
    zero observations included.
    """
    scale = F.lit(100) if cents else F.lit(1)
    # grid_round, not engine round() (r10/r11 sweep): the cents
    # quantization of a raw double is the input-side half-grid class
    v = grid_round(F.col(value_col).cast("double") * scale, 0).cast("long")
    # filter on the SCALED integer, not the raw value: a value in
    # (0, 0.005) rounds to 0 cents — digit '0' has no Benford expectation
    # row, so counting it in the denominator would bias every obs_frac
    obs = (
        df.where(F.col(value_col).isNotNull())
        .where(v > 0)
        .select(F.substring(v.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spark = df.sparkSession
    expect = spark.createDataFrame(
        [(d, BENFORD_P[d]) for d in range(1, 10)], "digit int, benford_frac double"
    )
    total = obs.agg(F.sum("n_obs").alias("_tot"))
    return (
        expect.join(obs, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            grid_round(F.coalesce(F.col("n_obs"), F.lit(0)) / F.col("_tot"), 6).alias("obs_frac"),
            grid_round(F.col("benford_frac"), 6).alias("benford_frac"),
            grid_round(
                F.abs(F.coalesce(F.col("n_obs"), F.lit(0)) / F.col("_tot") - F.col("benford_frac")),
                6,
            ).alias("abs_dev"),
        )
    )


def gini_by_group(
    df,
    group_col: str,
    key_col: str,
    value_col: str,
    decimals: int = 6,
):
    """Gini concentration coefficient per group (Gini 1912, public; the
    Lorenz-curve inequality measure every revenue/workload-skew audit
    reports): G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x sorted
    ascending — 0 = perfectly even, ->1 = one key holds everything. The
    profiling answer to "how concentrated is revenue / traffic / token
    mass per group", and the quantitative precursor to the skew-join
    mitigations in functions/skew.py.

    Determinism: values accumulate as exact DECIMAL; the rank weight i
    comes from a (value, key)-ordered row_number — equal values commute in
    sum(i*x_i), so tie order cannot change the result; the final G is one
    double expression. Shape: one window sort per group + one combinable
    aggregate (same cost class as any per-group ranking)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    dec = f"decimal(18,{decimals})"
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col),
        F.col(key_col),
        F.col(value_col).cast(dec).alias("_x"),
    )
    w = Window.partitionBy(group_col).orderBy(F.asc("_x"), F.asc(key_col))
    ranked = base.select(
        group_col, "_x", F.row_number().over(w).cast("long").alias("_i")
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum((F.col("_i") * F.col("_x")).cast("decimal(38,12)")).alias("six"),
    )
    n = F.col("n").cast("double")
    sx, six = F.col("sx").cast("double"), F.col("six").cast("double")
    # r10 rounding sweep: G is RATIONAL (exact decimal sufficient
    # statistics, one double division) — the winsorized divergence class,
    # where a value exactly on the half-grid rounds differently in Spark
    # (shortest-decimal HALF_UP) and DuckDB (binary). grid_round is the
    # shared sign-symmetric IEEE form, engine-identical; ties round away
    # from zero.
    g = F.when(sx != 0, grid_round((2.0 * six - (n + 1.0) * sx) / (n * sx), decimals))
    return agg.select(
        group_col,
        F.col("n").cast("long").alias("n_keys"),
        g.alias("gini"),
    )


def fd_histogram(
    df,
    value_col: str,
    decimals: int = 6,
):
    """Equal-width histogram with the Freedman-Diaconis rule (Freedman &
    Diaconis 1981, public): bin width h = 2*IQR/n^(1/3) — the
    distribution-aware binning a profiler should default to instead of a
    fixed bucket count (robust to outliers via IQR, narrows with data).

    Two passes: one scalar aggregate for (n, min, max, q1, q3) — the IQR
    uses the SQL-standard percentile_cont interpolation both engines
    compute identically — broadcast back, then one combinable per-bin
    count. Bin edges are fixed double expressions of those scalars; the
    top edge closes on the max value (last bin is [lo, max])."""
    from pyspark.sql import functions as F

    pcts = F.percentile(F.col(value_col), F.lit([0.25, 0.75]))
    stats = df.where(F.col(value_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col(value_col).cast("double")).alias("mn"),
        F.max(F.col(value_col).cast("double")).alias("mx"),
        pcts[0].alias("q1"),
        pcts[1].alias("q3"),
    )
    raw_h = 2.0 * (F.col("q3") - F.col("q1")) / F.cbrt(F.col("n").cast("double"))
    # degenerate-IQR guard (r8 review): a zero-inflated / majority-constant
    # column has q1 == q3 -> h = 0 -> div-by-zero garbage (and NULL bins in
    # ANSI engines). Fall back to ONE bin spanning [mn, mx] — deterministic
    # in both engines; (mx - mn) can itself be 0 for a constant column, so
    # the width floor is 1.0 in that last resort.
    h = F.when(raw_h > 0, raw_h).otherwise(
        F.when(F.col("mx") > F.col("mn"), F.col("mx") - F.col("mn")).otherwise(F.lit(1.0))
    )
    # 10k-bin cap, clamped in DOUBLE before any integer cast (r11
    # property-harness-found): a pathological spread (IQR ~ 1e-175 with
    # range ~ 1) makes (mx−mn)/h ~ 1e174, where the BIGINT cast saturates
    # silently on Spark but hard-errors on an ANSI engine — a divergent
    # crash class. An FD histogram past 10k bins is not an audit anyway;
    # the cap is the max_pairs spirit. Value-identical whenever the
    # natural bin count is ≤ 10000.
    ratio = (F.col("mx") - F.col("mn")) / h
    n_bins = F.greatest(
        F.lit(1), F.ceil(F.least(ratio, F.lit(10000.0))).cast("long")
    )
    binned = (
        df.where(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(
            F.floor(
                F.least(
                    (F.col(value_col).cast("double") - F.col("mn")) / h,
                    (n_bins - 1).cast("double"),
                )
            )
            .cast("long")
            .alias("bin"),
            F.col("mn"),
            h.alias("h"),
        )
    )
    return (
        binned.groupBy("bin", "mn", "h")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("bin").cast("long").alias("bin"),
            # r11 sweep: bin edges are rational in the quantized bounds —
            # the half-grid class — so they quantize through grid_round,
            # not engine round()
            grid_round(F.col("mn") + F.col("bin") * F.col("h"), decimals).alias("bin_lo"),
            grid_round(F.col("mn") + (F.col("bin") + 1) * F.col("h"), decimals).alias("bin_hi"),
            F.col("n_rows").cast("long").alias("n_rows"),
        )
        .orderBy("bin")
    )


def theil_index_by_group(
    df,
    group_col: str,
    value_col: str,
    decimals: int = 6,
):
    """Theil T inequality index per group (Theil 1967, public):
    T = (1/n)·Σ (x_i/μ)·ln(x_i/μ) over non-negative values, with 0·ln 0
    taken as 0 — the entropy-based complement to `gini_by_group` whose
    defining property Gini lacks: T decomposes additively into
    within-group + between-group components, so per-nation readings roll
    up to a corpus total exactly.

    Exactness: μ is one rational of exact DECIMAL sums; each (x/μ)·ln(x/μ)
    term quantizes on the 1e-9 grid into an exact DECIMAL sum (the
    behavior-entropy discipline); the final is one IEEE expression on the
    shared 1e-6 grid. Shape: one combinable per-group aggregate, one
    broadcast join back, one combinable term sum — no windows.

    Contract: Theil is defined on NON-NEGATIVE values — negative rows are
    excluded (property-harness-found: a negative group sum makes x/μ
    negative, where ln() NULLs on one engine and hard-errors on another),
    and terms additionally guard on Σx > 0 so an all-zero group never
    reaches the division."""
    dec = f"decimal(18,{decimals})"
    base = df.where(F.col(value_col).isNotNull() & (F.col(value_col) >= 0)).select(
        F.col(group_col), F.col(value_col).cast(dec).alias("_x")
    )
    stats = base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("_x").alias("sx")
    )
    joined = base.join(F.broadcast(stats), group_col)
    mu = F.col("sx").cast("double") / F.col("n").cast("double")
    r = F.col("_x").cast("double") / mu
    term = F.when(
        (F.col("_x") > 0) & (F.col("sx") > 0), grid_round(r * F.log(r), 9)
    ).otherwise(F.lit(0.0)).cast("decimal(28,9)")
    agg = joined.groupBy(group_col).agg(
        F.max("n").alias("n"),
        F.max("sx").alias("_sx"),
        F.sum(term).alias("_t"),
    )
    return agg.select(
        group_col,
        F.col("n"),
        F.when(
            F.col("_sx") > 0,
            grid_round(F.col("_t").cast("double") / F.col("n").cast("double"), decimals),
        ).alias("theil_t"),
    )


def simpson_diversity(
    df,
    group_col: str = "source",
    text_col: str = "text",
    decimals: int = 6,
):
    """Simpson diversity of the token distribution per group (Simpson
    1949, public): 1 − Σ c_i(c_i−1) / (N(N−1)) — the probability two
    tokens drawn WITHOUT replacement are different types. The bounded
    [0,1] companion of the entropy/HHI family: insensitive to the long
    tail (rare types barely move it), so it isolates head-duplication —
    a boilerplate-stuffed source scores low here while still showing a
    large Chao1 vocabulary.

    Exactness: Σ c(c−1) and N are exact integers (DECIMAL-widened before
    the product); the final is ONE rational on the shared 1e-6 grid.
    Shape: chao1's — one explode + (group, term) count, one combinable
    per-group reduce."""
    from .text import tokens

    toks = df.select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    tf = toks.groupBy(group_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
    c = F.col("_c").cast("decimal(19,0)")
    agg = tf.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("_c")).cast("long").alias("n_tokens"),
        F.sum((c * (c - 1)).cast("decimal(38,0)")).cast("decimal(38,0)").alias("_rep"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        group_col,
        "n_types",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 1,
            grid_round(1.0 - F.col("_rep").cast("double") / (n * (n - 1.0)), decimals),
        ).alias("simpson_diversity"),
    )


def yules_k(
    df,
    group_col: str = "source",
    text_col: str = "text",
    decimals: int = 6,
):
    """Yule's K lexical-richness characteristic per group (Yule 1944,
    public): K = 10⁴·(Σ c_i² − N)/N² over the term-frequency spectrum —
    the classic authorship/templatedness constant, LENGTH-INVARIANT by
    construction (unlike type/token ratios, which shrink with corpus
    size), so sources of different sizes compare directly. High K =
    repetitive/templated text; ~100–200 = natural prose.

    Exactness: Σ c² and N are exact integers (DECIMAL-widened squares);
    the final is ONE rational on the shared 1e-6 grid. Shape: chao1's —
    one explode + count, one combinable reduce."""
    from .text import tokens

    toks = df.select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    tf = toks.groupBy(group_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
    c = F.col("_c").cast("decimal(19,0)")
    agg = tf.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("_c")).cast("long").alias("n_tokens"),
        F.sum((c * c).cast("decimal(38,0)")).cast("decimal(38,0)").alias("_m2"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        group_col,
        "n_types",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            grid_round(
                10000.0 * (F.col("_m2").cast("double") - n) / (n * n), decimals
            ),
        ).alias("yules_k"),
    )


def vocab_churn_by_group(
    df,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
):
    """Vocabulary churn per group: split each group's documents into
    first/second halves by id order (first half = ceil(n/2) docs — the
    exact order-statistic split, engine-identical) and report how much of
    the second half's vocabulary is NEW — the corpus-drift gauge that
    catches a recrawl changing a source's language before any
    distribution test fires. Complements `chao1_vocab_richness` (how much
    vocab is unseen) with how fast the seen vocab TURNS OVER.

    Exactness: set sizes are exact integers from distinct counts; the
    churn rate is ONE rational on the shared 1e-6 grid. Shape: one
    ranking window per group (id order), two (group, term) distincts, one
    left-anti-shaped conditional count — all combinable aggregates."""
    from pyspark.sql import Window

    from .text import tokens

    w = Window.partitionBy(group_col).orderBy(id_col)
    wg = Window.partitionBy(group_col)
    halved = df.select(
        F.col(group_col),
        F.col(id_col),
        F.col(text_col),
        (
            F.row_number().over(w) * 2 <= F.count(F.lit(1)).over(wg) + 1
        ).alias("_first"),
    )
    term_half = (
        halved.select(
            group_col, "_first", F.explode(tokens(F.col(text_col))).alias("_t")
        )
        .groupBy(group_col, "_t")
        .agg(
            F.max(F.when(F.col("_first"), 1).otherwise(0)).alias("in1"),
            F.max(F.when(~F.col("_first"), 1).otherwise(0)).alias("in2"),
        )
    )
    agg = term_half.groupBy(group_col).agg(
        F.sum("in1").cast("long").alias("v1_types"),
        F.sum("in2").cast("long").alias("v2_types"),
        F.sum(F.when((F.col("in2") == 1) & (F.col("in1") == 0), 1).otherwise(0))
        .cast("long")
        .alias("new_types"),
    )
    return agg.select(
        group_col,
        "v1_types",
        "v2_types",
        "new_types",
        F.when(
            F.col("v2_types") > 0,
            grid_round(
                F.col("new_types").cast("double") / F.col("v2_types").cast("double"),
                decimals,
            ),
        ).alias("new_type_rate"),
    )


def cohens_kappa(
    df,
    col_a: str,
    col_b: str,
    decimals: int = 6,
):
    """Cohen's κ chance-corrected agreement between two categorical
    columns (Cohen 1960, public): κ = (p_o − p_e)/(1 − p_e) with p_o the
    observed agreement and p_e the agreement expected from the marginals
    — the standard labeling-quality gate (annotator vs annotator, or
    declared label vs classifier) that raw accuracy overstates whenever
    one class dominates.

    Exactness: the confusion counts, marginals and their products are
    exact integers (DECIMAL-widened: N·Σdiag and Σr·c reach N², past
    int64 at the 100 TB tier); κ, p_o, p_e are single rationals on the
    shared 1e-6 grid. Shape: one (a, b) count aggregate, two marginal
    rollups of that small frame, one 1-row reduce — the confusion matrix
    is |categories|², never data-scale."""
    conf = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ra = conf.groupBy("_a").agg(F.sum("c").alias("r"))
    cb = conf.groupBy("_b").agg(F.sum("c").alias("k"))
    cross = ra.join(cb, ra["_a"] == cb["_b"], "full").select(
        (
            F.coalesce(F.col("r"), F.lit(0)).cast("decimal(19,0)")
            * F.coalesce(F.col("k"), F.lit(0)).cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("rc")
    )
    tot = conf.agg(
        F.sum("c").cast("decimal(19,0)").alias("nn"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("c")).otherwise(0))
        .cast("decimal(19,0)")
        .alias("diag"),
    )
    red = cross.agg(F.sum("rc").cast("decimal(38,0)").alias("src")).crossJoin(
        F.broadcast(tot)
    )
    nn = F.col("nn").cast("double")
    po = F.col("diag").cast("double") / nn
    pe = F.col("src").cast("double") / (nn * nn)
    return red.select(
        F.col("nn").cast("long").alias("n_rows"),
        grid_round(po, decimals).alias("observed_agreement"),
        grid_round(pe, decimals).alias("expected_agreement"),
        F.when(pe < 1.0, grid_round((po - pe) / (1.0 - pe), decimals)).alias("kappa"),
    )


def lorenz_curve_points(
    df,
    group_col: str,
    key_col: str,
    value_col: str,
    deciles: int = 10,
    decimals: int = 6,
):
    """Lorenz curve decile points per group (Lorenz 1905, public): the
    cumulative share of the total held by the bottom d/10 of keys,
    sorted ascending — the CURVE whose area the Gini coefficient
    summarizes to one number. gini_by_group says HOW unequal; this says
    WHERE the inequality lives ("bottom 80% of customers hold 31% of
    spend").

    Exactness: the cutoff rank for decile d is (n·d) div 10 — exact long
    arithmetic; cumulative sums are exact DECIMAL over the
    (value, key)-ordered window (equal values commute, tie order cannot
    change any cumulative READ AT a cutoff since ties share a value);
    each share is ONE rational on the shared grid. Shape: one window
    sort per group + a decile-frame join on the cutoff rank — the same
    cost class as gini itself.

    NOTE on ties at the cutoff: the share at rank r is the cumsum over
    the FIRST r rows in (value, key) order — with equal values split
    across the boundary, any r-row prefix of the tie group has the same
    sum, so the point is well-defined and engine-identical.

    Output shape is ALWAYS `deciles` rows per non-empty group (r11
    review: the old form silently dropped deciles whose cutoff rank
    (n·d) div 10 was 0 — a 6-customer nation lost its decile-1 row): a
    zero cutoff emits cum_share 0.0, which is the mathematically correct
    'bottom 0 rows hold 0' point."""
    from pyspark.sql import Window

    dec = f"decimal(18,{decimals})"
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col),
        F.col(key_col),
        F.col(value_col).cast(dec).alias("_x"),
    )
    w = Window.partitionBy(group_col).orderBy(F.asc("_x"), F.asc(key_col))
    # ONE corpus-sized window pass (rank + cumsum); group totals come from
    # a plain map-side-combinable aggregate, not a second window (r11
    # review follow-up: the first rewrite ran the per-group sort twice).
    # The rank side's group column is RENAMED so the left join below is
    # unambiguous — the first rewrite's drop(ranked[group_col]) kept the
    # RIGHT side's column, which is NULL exactly on the zero-cutoff rows
    # the rewrite existed to add (review-confirmed bug).
    ranked = base.select(
        F.col(group_col).alias("_rg"),
        F.row_number().over(w).cast("long").alias("_i"),
        F.sum("_x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_cum"),
    )
    ds = [(d,) for d in range(1, deciles + 1)]
    dfr = base.sparkSession.createDataFrame(ds, "decile int")
    groups = base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_x").alias("_tot"),
    )
    grid = groups.crossJoin(F.broadcast(dfr)).withColumn(
        "_cutoff", F.expr(f"(_n * decile) div {int(deciles)}")
    )
    cut = grid.join(
        ranked,
        (F.col(group_col) == F.col("_rg")) & (F.col("_cutoff") == F.col("_i")),
        "left",
    )
    return cut.select(
        group_col,
        F.col("decile"),
        F.col("_n").alias("n"),
        F.when(F.col("_cutoff") == 0, F.lit(0.0))
        .otherwise(
            F.when(
                F.col("_tot") > 0,
                grid_round(
                    F.col("_cum").cast("double") / F.col("_tot").cast("double"),
                    decimals,
                ),
            )
        )
        .alias("cum_share"),
    )


def bowley_moors_shape(
    df,
    group_col: str,
    value_col: str,
    decimals: int = 6,
):
    """Quantile-based distribution shape per group: Bowley's quartile
    skewness (Q1+Q3−2·Q2)/(Q3−Q1) (Bowley 1901) and Moors' octile
    kurtosis ((E7−E5)+(E3−E1))/(E6−E2) (Moors 1988) — the
    outlier-robust complements of moment skew/kurtosis (a single 1e308
    row saturates moments; octiles don't move). The distribution-shape
    audit next to the percentile family.

    Exactness: all seven octiles come from ONE `exact_percentiles` pass
    (explicit order statistics, one window sort); both shape statistics
    are single IEEE expressions on the shared grid, NULL when the
    denominator octile spread is 0 (degenerate spread)."""
    probs = [(f"_e{k}", k, 8) for k in range(1, 8)]
    oct_ = exact_percentiles(
        df.where(F.col(value_col).isNotNull()), value_col, [group_col], probs
    )
    e = {k: F.col(f"_e{k}") for k in range(1, 8)}
    bowley = (e[2] + e[6] - 2.0 * e[4]) / (e[6] - e[2])
    moors = ((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2])
    return oct_.select(
        group_col,
        grid_round(e[2], decimals).alias("q1"),
        grid_round(e[4], decimals).alias("median"),
        grid_round(e[6], decimals).alias("q3"),
        F.when(e[6] - e[2] != 0, grid_round(bowley, decimals)).alias("bowley_skew"),
        F.when(e[6] - e[2] != 0, grid_round(moors, decimals)).alias("moors_kurtosis"),
    )


def theil_decomposition(
    df,
    group_col: str,
    value_col: str,
    decimals: int = 6,
):
    """Theil T decomposition into BETWEEN-group and WITHIN-group
    inequality (Theil 1967; Shorrocks 1980 on additive decomposability):
    T_total = Σ_g (s_g/s)·ln((s_g/s)/(n_g/n)) + Σ_g (s_g/s)·T_g — the
    property that makes Theil the inequality index for mixture audits
    ("is spend inequality a nation story or a within-nation story"),
    which Gini cannot do. One row: (n, theil_total, theil_between,
    theil_within).

    Exactness: shares are rationals of exact DECIMAL sums; every log
    term quantizes on the 1e-9 grid into exact DECIMAL sums (the
    behavior-entropy discipline); finals on the 1e-6 grid. The additive
    identity holds exactly in the reals and to ~1e-9 after term
    quantization — both engines agree bit-for-bit on all three numbers.
    Non-negative contract as in `theil_index_by_group`.

    Shape: one per-group aggregate, one 1-row total, one term pass with
    broadcast joins, two small reduces — no windows."""
    dec = f"decimal(18,{decimals})"
    base = df.where(F.col(value_col).isNotNull() & (F.col(value_col) >= 0)).select(
        F.col(group_col).alias("_g"), F.col(value_col).cast(dec).alias("_x")
    )
    per_g = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("ng"), F.sum("_x").alias("sg")
    )
    # per_g feeds the 1-row total AND the broadcast term join — unpinned,
    # each reference re-ran the scan + group aggregate (r12 plan sweep).
    # k rows at any corpus scale.
    from ..session import lineage_pin

    per_g = lineage_pin(per_g)
    tot = per_g.groupBy().agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast(f"decimal(38,{decimals})").alias("s"),
    )
    joined = base.join(F.broadcast(per_g), "_g").crossJoin(F.broadcast(tot))
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    mug = F.col("sg").cast("double") / F.col("ng").cast("double")
    xd = F.col("_x").cast("double")
    t_term = F.when(
        (F.col("_x") > 0) & (F.col("s") > 0),
        grid_round((xd / mu) * F.log(xd / mu), 9),
    ).otherwise(F.lit(0.0)).cast("decimal(28,9)")
    w_term = F.when(
        (F.col("_x") > 0) & (F.col("sg") > 0),
        grid_round((xd / mug) * F.log(xd / mug), 9),
    ).otherwise(F.lit(0.0)).cast("decimal(28,9)")
    grp = joined.groupBy("_g").agg(
        F.max("ng").alias("ng"),
        F.max("sg").alias("sg"),
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.sum(t_term).alias("_tt"),
        F.sum(w_term).alias("_wt"),
    )
    share = F.col("sg").cast("double") / F.col("s").cast("double")
    popsh = F.col("ng").cast("double") / F.col("n").cast("double")
    between_term = F.when(
        (F.col("sg") > 0) & (F.col("s") > 0),
        grid_round(share * F.log(share / popsh), 9),
    ).otherwise(F.lit(0.0)).cast("decimal(28,9)")
    # T_g = _wt/ng; its share-weighted contribution = share * T_g
    within_term = F.when(
        (F.col("sg") > 0) & (F.col("s") > 0),
        grid_round(share * (F.col("_wt").cast("double") / F.col("ng").cast("double")), 9),
    ).otherwise(F.lit(0.0)).cast("decimal(28,9)")
    red = grp.groupBy().agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.sum("_tt").alias("tt"),
        F.sum(between_term).alias("bt"),
        F.sum(within_term).alias("wt"),
    )
    return red.select(
        F.col("n"),
        F.when(
            F.col("s") > 0,
            grid_round(F.col("tt").cast("double") / F.col("n").cast("double"), decimals),
        ).alias("theil_total"),
        F.when(F.col("s") > 0, grid_round(F.col("bt").cast("double"), decimals)).alias(
            "theil_between"
        ),
        F.when(F.col("s") > 0, grid_round(F.col("wt").cast("double"), decimals)).alias(
            "theil_within"
        ),
    )


def good_turing_missing_mass(
    df,
    group_col: str = "source",
    text_col: str = "text",
    decimals: int = 6,
):
    """Good-Turing estimate of the UNSEEN probability mass per group
    (Good 1953, public): P₀ = N₁/N — the probability that the next token
    drawn from the source is a type never seen in the sample — plus the
    Good-Turing adjusted count for singletons r₁* = 2·N₂/N₁. The
    training-data coverage gauge next to `chao1_vocab_richness`: Chao1
    estimates how many TYPES are missing; Good-Turing estimates how much
    PROBABILITY the missing types carry (a source can have huge unseen
    vocabulary of negligible mass, or few unseen types you will still hit
    constantly). A high missing_mass says more data from this source
    still adds information; near zero says the source is token-saturated.

    Exactness: N, N₁, N₂ are exact integer aggregates over the term-
    frequency frame; both ratios are single int-derived IEEE divisions on
    the shared 1e-6 grid. Shape: one explode + (group, term) map-side-
    combined count, then one combinable per-group reduce over
    vocabulary-scale rows — no joins, no windows (the chao1 shape)."""
    from .text import tokens

    toks = df.select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    tf = toks.groupBy(group_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
    n = F.sum("_c").cast("double")
    n1 = F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).cast("double")
    n2 = F.sum(F.when(F.col("_c") == 2, 1).otherwise(0)).cast("double")
    return tf.groupBy(group_col).agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).cast("long").alias("f1_singletons"),
        F.sum(F.when(F.col("_c") == 2, 1).otherwise(0)).cast("long").alias("f2_doubletons"),
        F.when(n > 0, grid_round(n1 / n, decimals)).alias("missing_mass"),
        F.when(n1 > 0, grid_round(2.0 * n2 / n1, decimals)).alias("r1_adjusted"),
    )


def exact_percentiles_dict(frame, col: str, group_cols: list[str], probs):
    """Dictionary-rank twin of `exact_percentiles` — bit-identical values
    from the DISTINCT-VALUE dictionary instead of a corpus-sized per-group
    sort (the `mann_whitney_u_by_variant_dict` scale path applied to the
    percentile library): per (group, value) counts, one cumulative window
    over the value SUPPORT, and the order statistic at rank r is the
    distinct value whose cumulative range covers r. The interpolation
    `v_lo + (v_hi − v_lo)·frac` and the exact-integer rank/frac arithmetic
    are the SAME expressions as `exact_percentiles`, so results are
    bit-identical (hypothesis-proven equivalence); cost drops from
    O(rows·log rows) per group to O(support·log support) after a
    map-side-combinable count — for currency/integer/quantized domains the
    support is bounded by the value RANGE regardless of corpus size. Use
    this form when rows per group is corpus-scale; `exact_percentiles`
    when the support is as large as the data anyway."""
    from pyspark.sql import Window

    per_v = (
        frame.where(F.col(col).isNotNull())
        .groupBy(*group_cols, col)
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    wv = Window.partitionBy(*group_cols).orderBy(F.col(col))
    wg = Window.partitionBy(*group_cols)
    cum = per_v.select(
        *group_cols,
        F.col(col),
        F.sum("_c").over(wv.rowsBetween(Window.unboundedPreceding, 0)).cast("long").alias("_cum"),
        F.col("_c"),
        F.sum("_c").over(wg).cast("long").alias("_n"),
    )
    aggs = [F.max("_n").alias("_n")]
    names = []
    for alias, num, den in probs:
        # identical rank arithmetic to exact_percentiles (exact integer div)
        lo = F.expr(f"((_n - 1) * {int(num)}) div {int(den)}") + 1
        hi = F.least(lo + 1, F.col("_n"))
        covers_lo = (F.col("_cum") - F.col("_c") < lo) & (lo <= F.col("_cum"))
        covers_hi = (F.col("_cum") - F.col("_c") < hi) & (hi <= F.col("_cum"))
        aggs.append(F.max(F.when(covers_lo, F.col(col))).alias(f"_vlo_{alias}"))
        aggs.append(F.max(F.when(covers_hi, F.col(col))).alias(f"_vhi_{alias}"))
        names.append((alias, num, den))
    red = cum.groupBy(*group_cols).agg(*aggs)
    outs = list(group_cols)
    for alias, num, den in names:
        pos = (F.col("_n") - 1) * num
        frac = (pos % den).cast("double") / float(den)
        outs.append(
            (F.col(f"_vlo_{alias}") + (F.col(f"_vhi_{alias}") - F.col(f"_vlo_{alias}")) * frac).alias(alias)
        )
    return red.select(*outs)
