"""Repetition / quality filters for web-scale training corpora.

Implements the Gopher-style (Rae et al. 2021, "Scaling Language Models",
§A1.1) repetition heuristics as pure Catalyst expressions: every metric is
computed WITHIN a row over the document's own token/line arrays, so the
operator is a zero-shuffle projection that runs at parquet-scan speed on a
100 TB corpus — no explode, no per-document groupBy, no Python.

The interesting trick is the most-frequent-n-gram count: instead of
`explode → groupBy(doc, ngram) → max(count)` (two shuffles, row explosion by
~|tokens|), we `array_sort` the n-gram array and fold it once with
`aggregate`, tracking the longest run of equal neighbours — identical result,
zero shuffles, O(n log n) per row inside codegen.

Reference parity: the reference framework delegates scalar feature logic to
its expression engine (smart-data-lake sdl-core ScalaClassSparkDfTransformer
surface); the metric definitions themselves follow the public Gopher paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .numeric import grid_round
from .text import tokens


def lines(col: Column) -> Column:
    """Non-empty trimmed lines of the document."""
    raw = F.split(col, r"\n")
    # NB: lambda, not bare F.trim — Spark 4's trim(col, trim=...) is a 2-arg
    # callable, which transform would call as (element, index)
    return F.filter(F.transform(raw, lambda x: F.trim(x)), lambda x: F.length(x) > 0)


def duplicate_line_fraction(col: Column) -> Column:
    """Fraction of lines that are repeats of an earlier line (Gopher A1.1)."""
    ls = lines(col)
    n = F.size(ls)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(ls))) / n
    )


def ngrams(col: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; [] when the doc is too short."""
    toks = tokens(col)
    k = F.size(toks)
    return F.when(k < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def _run_stats(sorted_arr: Column) -> Column:
    """Fold a sorted string array into (best, dup): the longest run of equal
    neighbours and the total count of elements belonging to runs of length
    >= 2. Single pass, stays in codegen."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("dup"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        # when a run reaches length 2 both members become duplicates at once;
        # each further extension adds one more
        dup = acc["dup"] + F.when(run == 2, F.lit(2)).when(run > 2, F.lit(1)).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            dup.alias("dup"),
        )

    return F.aggregate(sorted_arr, init, step)


def top_ngram_fraction(col: Column, n: int) -> Column:
    """Fraction of n-grams taken by the single most frequent n-gram."""
    grams = ngrams(col, n)
    total = F.size(grams)
    best = _run_stats(F.array_sort(grams))["best"]
    return F.when(total == 0, F.lit(0.0)).otherwise(best / total)


def duplicate_ngram_fraction(col: Column, n: int) -> Column:
    """Fraction of n-grams that occur more than once in the document."""
    grams = ngrams(col, n)
    total = F.size(grams)
    dup = _run_stats(F.array_sort(grams))["dup"]
    return F.when(total == 0, F.lit(0.0)).otherwise(dup / total)


def symbol_to_word_ratio(col: Column, symbols: str = "#…") -> Column:
    """Hash/ellipsis symbols per word (Gopher filters docs with ratio > 0.1)."""
    n_sym = F.length(col) - F.length(F.regexp_replace(col, f"[{symbols}]", ""))
    n_tok = F.size(tokens(col))
    return F.when(n_tok == 0, F.lit(0.0)).otherwise(n_sym / n_tok)


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the Gopher repetition block: dup_line_frac, top{2,3}gram_frac,
    dup_{5}gram_frac, symbol_word_ratio, plus the pass/fail verdict
    `quality_keep` with the paper's published thresholds.

    Layered projections (see text.with_text_stats) make Catalyst materialize
    the token array and each sorted n-gram array once per row.
    """
    c = F.col(text_col)
    s1 = df.withColumns({"_toks": tokens(c), "_lines": lines(c)})
    t = F.col("_toks")

    def _grams(n: int) -> Column:
        k = F.size(t)
        return F.when(k < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), k - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            )
        )

    s2 = s1.withColumns(
        {
            "_g2": F.array_sort(_grams(2)),
            "_g3": F.array_sort(_grams(3)),
            "_g5": F.array_sort(_grams(5)),
        }
    )
    s3 = s2.withColumns(
        {
            "_r2": _run_stats(F.col("_g2")),
            "_r3": _run_stats(F.col("_g3")),
            "_r5": _run_stats(F.col("_g5")),
        }
    )
    nl = F.size(F.col("_lines"))
    dup_line = F.when(nl == 0, F.lit(0.0)).otherwise(
        (nl - F.size(F.array_distinct(F.col("_lines")))) / nl
    )
    n_sym = F.length(c) - F.length(F.regexp_replace(c, "[#…]", ""))
    n_tok = F.size(t)

    def _frac(r: str, g: str, field: str) -> Column:
        total = F.size(F.col(g))
        return F.when(total == 0, F.lit(0.0)).otherwise(F.col(r)[field] / total)

    s4 = s3.withColumns(
        {
            # raw integer counts are exposed so downstream aggregations can
            # pool exactly (SUM of ints + one division) instead of averaging
            # doubles, whose summation order differs across engines
            "n_2grams": F.size(F.col("_g2")),
            "top_2gram_count": F.col("_r2")["best"],
            "n_3grams": F.size(F.col("_g3")),
            "top_3gram_count": F.col("_r3")["best"],
            "n_5grams": F.size(F.col("_g5")),
            "dup_5gram_count": F.col("_r5")["dup"],
            "dup_line_frac": dup_line,
            "top_2gram_frac": _frac("_r2", "_g2", "best"),
            "top_3gram_frac": _frac("_r3", "_g3", "best"),
            "dup_5gram_frac": _frac("_r5", "_g5", "dup"),
            "symbol_word_ratio": F.when(n_tok == 0, F.lit(0.0)).otherwise(n_sym / n_tok),
        }
    )
    keep = (
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("top_2gram_frac") <= 0.20)
        & (F.col("top_3gram_frac") <= 0.18)
        & (F.col("dup_5gram_frac") <= 0.15)
        & (F.col("symbol_word_ratio") <= 0.10)
    )
    return s4.withColumn("quality_keep", keep).drop(
        "_toks", "_lines", "_g2", "_g3", "_g5", "_r2", "_r3", "_r5"
    )


def unigram_logprob_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_scale: int = 6,
) -> DataFrame:
    """Corpus-unigram language-model quality score (the CCNet idea — Wenzek
    et al. 2020, public method — with the corpus itself as the LM): build
    the MLE unigram distribution over the whole corpus, then score every
    document by its mean token log-probability. Low scores = documents
    whose vocabulary is atypical for the corpus (boilerplate, noise,
    wrong-language shards).

    Returns (id, n_tokens, avg_logprob). Plan: one explode + token groupBy
    builds the vocabulary (map-side combined), which is broadcast back onto
    the exploded tokens (a vocabulary is small relative to any corpus — at
    100 TB it is still only |vocab| rows), then one groupBy(doc). Each
    token's logprob is rounded to ``round_scale`` BEFORE the exact decimal
    sum, so the per-document mean is independent of row order and engine
    libm differences below the rounding grain."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored_vocab = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        # grid_round, not engine round() (r10 sweep: libm log output can
        # land on the half-grid; engine round() diverges there)
        grid_round(F.log(F.col("cnt") / F.col("total")), round_scale)
        .cast("decimal(18,6)")
        .alias("logp"),
    )
    per_doc = (
        toks.join(F.broadcast(scored_vocab), "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            grid_round(
                (F.sum("logp").cast("double") / F.count(F.lit(1))), round_scale
            ).alias("avg_logprob"),
        )
    )
    return per_doc


def quantile_normalize_scores(
    df,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
):
    """Rank-based score normalization per group: percent_rank of `score_col`
    within each `group_col` — makes heterogeneous per-source quality scores
    comparable before cross-source filtering/mixing (the curation step that
    keeps one source's generous scorer from flooding the kept set).

    Ties share a percent_rank (deterministic under any shuffle order); the
    id tie-break orders only the output. Exact formulation sorts within each
    group (one shuffle; a huge skewed group sorts on one reducer) — at the
    100 TB tier substitute sketch boundaries from
    `analytics.approx_quantile_buckets` for the same normalization at
    bounded memory, same contract.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(group_col).orderBy(score_col)
    return df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(score_col),
        # rank/(n−1) is RATIONAL — half-grid cross-engine class (r10
        # sweep): grid_round, not engine round()
        grid_round(F.percent_rank().over(w), 6).alias("norm_score"),
    )


def token_entropy(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Shannon entropy (nats) of each document's token distribution — the
    classic gibberish/boilerplate signal (near-zero entropy = one token
    repeated; high entropy = diverse vocabulary). Computed via the
    sufficient-statistics identity H = ln(T) − Σ n·ln(n) / T over per-token
    counts, so both aggregation levels are combinable map-side and no
    per-document probability vector is ever materialized.

    Shape: explode → (doc, token) count → per-doc aggregate; two shuffles,
    both partial-aggregated. Zero-token documents are excluded (entropy
    undefined), matching the tokenizer's empty-text handling elsewhere."""
    from pyspark.sql import functions as F

    from .text import tokens as _tokens

    counts = (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("_tok"))
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # r10 sweep: the old raw-double Σ n·ln(n) was ORDER-SENSITIVE (float
    # addition is not associative — a different partitioning could move the
    # last ulp) and its round() final was the engine-divergent half-grid
    # class. Now each n·ln(n) term is grid-quantized to 1e-9 and summed as
    # exact DECIMAL (the next_event_conditional_entropy discipline), so the
    # entropy is partition-order-independent and engine-exact; the final
    # ln(T) − Σ/T is one double expression grid-quantized once.
    term = grid_round(
        F.col("_n").cast("double") * F.log(F.col("_n").cast("double")), 9
    ).cast("decimal(28,9)")
    return counts.groupBy(id_col).agg(
        F.sum("_n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_unique"),
        grid_round(
            F.log(F.sum("_n").cast("double"))
            - F.sum(term).cast("double") / F.sum("_n"),
            6,
        ).alias("entropy_nats"),
    )


def length_band_stats(
    df,
    len_col: str = "n_chars",
    group_col: str = "source",
    lo: float = 0.05,
    hi: float = 0.95,
    decimals: int = 6,
):
    """Percentile-band length filter audit: per group, the interpolated
    [lo, hi] percentile bounds of a length column and how much survives a
    keep-rows-inside-the-band filter — the standard "drop the truncated
    fragments and the mega-outliers" gate in corpus construction (C4 /
    Gopher both apply document-length cuts; this reports the cut's effect
    per source before committing to it).

    Exactness (r11 sweep — the percentile-library class): bounds come from
    `profiling.exact_percentiles`' explicit order statistics (exact
    rational positions via Fraction(lo/hi), one fixed IEEE interpolation
    expression) instead of each engine's percentile library, whose
    interpolation shapes differ; an ulp there could flip a band-boundary
    document. The band comparison is integer-vs-double, exact in any
    engine; bound finals quantize through the shared grid. Shape: one
    per-group window sort for both bounds (tiny result) broadcast back
    onto the scan, then one combinable rollup — two scans, no global
    sort."""
    from fractions import Fraction

    from smart_data_lake_spark.functions.profiling import exact_percentiles

    flo, fhi = Fraction(str(lo)), Fraction(str(hi))
    bounds = exact_percentiles(
        df,
        len_col,
        [group_col],
        [
            ("_plo", flo.numerator, flo.denominator),
            ("_phi", fhi.numerator, fhi.denominator),
        ],
    )
    # LEFT join: exact_percentiles omits groups whose len_col is entirely
    # NULL (its documented contract) — those groups must still report
    # (n_docs, 0 kept, NULL bounds), not vanish (r10 review)
    joined = df.join(F.broadcast(bounds), group_col, "left")
    kept = (F.col(len_col) >= F.col("_plo")) & (F.col(len_col) <= F.col("_phi"))
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        # when/otherwise, not a bare cast: a NULL-bound group must count 0
        # kept rows (matching the oracle's CASE ... ELSE 0), not NULL
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(kept, F.col(len_col)).otherwise(F.lit(0))).alias("chars_kept"),
        grid_round(F.first("_plo"), decimals).alias("p_lo"),
        grid_round(F.first("_phi"), decimals).alias("p_hi"),
    )


def bigram_logprob_score(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
):
    """Per-document average bigram log-probability under the corpus's own
    add-one-smoothed bigram LM: logp(w2|w1) = ln((c(w1,w2)+1)/(c(w1)+V)).
    The bigram upgrade of `unigram_logprob_score` — phrase-level fluency
    that a unigram model cannot see (scrambled text scores near-unigram on
    word choice but collapses on bigram logprob).

    Exactness discipline identical to the unigram scorer: per-bigram
    logprobs round to 1e-6 BEFORE the per-doc decimal sum. Shape: corpus
    bigram/unigram counts are two combinable explode-aggregates; the doc
    bigram stream joins them by key (vocab-scale join sides, key-
    partitioned); V is one scalar broadcast."""
    from pyspark.sql import functions as F

    from .text import tokens

    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t")).where(
        F.size("_t") >= 2
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_t") - 2),
        lambda i: F.struct(
            F.element_at(F.col("_t"), i + 1).alias("w1"),
            F.element_at(F.col("_t"), i + 2).alias("w2"),
        ),
    )
    doc_bi = toks.select(F.col(id_col), F.explode(grams).alias("g")).select(
        id_col, "g.w1", "g.w2"
    )
    bi_counts = doc_bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    uni_counts = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni_counts.agg(F.count(F.lit(1)).alias("v"))
    dec = f"decimal(18,{decimals})"
    # grid_round, not engine round() (r10 sweep — same class as the
    # unigram scorer: libm-log terms and the decimal-sum/count final)
    logp = grid_round(
        F.log(
            (F.col("c12") + 1.0)
            / (F.col("c1").cast("double") + F.col("v").cast("double"))
        ),
        decimals,
    ).cast(dec)
    scored = (
        doc_bi.join(bi_counts, ["w1", "w2"])
        .join(uni_counts.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), logp.alias("_lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        grid_round(F.sum("_lp").cast("double") / F.count(F.lit(1)), decimals).alias(
            "avg_bigram_logprob"
        ),
    )


def c4_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style document quality screen (Raffel et al. 2020, §2.2 public
    rules): per document — line count, lines ending in terminal punctuation,
    the "lorem ipsum" placeholder flag, the curly-brace (code) flag, and the
    keep decision: ≥3 terminal-punctuated lines, no lorem ipsum, no '{'.

    Entirely JVM-side (split + filter + size + contains) — integer and
    boolean outputs, no shuffle: a pure map over the corpus scan, the shape
    a 100 TB pre-filter must have."""
    col = F.col(text_col)
    lines_arr = F.split(col, "\n")
    non_empty = F.filter(lines_arr, lambda x: F.length(F.trim(x)) > 0)
    terminal = F.filter(
        non_empty,
        lambda x: F.rtrim(x).rlike('[.!?"]$'),
    )
    lower = F.lower(col)
    return df.select(
        "doc_id",
        F.size(non_empty).alias("n_lines"),
        F.size(terminal).alias("n_terminal_lines"),
        lower.contains("lorem ipsum").alias("has_lorem_ipsum"),
        col.contains("{").alias("has_curly_brace"),
        (
            (F.size(terminal) >= 3)
            & ~lower.contains("lorem ipsum")
            & ~col.contains("{")
        ).alias("c4_keep"),
    )
