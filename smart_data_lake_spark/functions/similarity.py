"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against a full scan of the corpus; one shuffle for the per-query top-k.
Scale path: LSH bucketing (random-hyperplane signs) cuts the candidate set
per query from N to a bucket; IVF (k-means cells) would be the next step but
needs a training pass — the bucketed variant here is training-free.

The arithmetic uses F.aggregate/F.zip_with folds (JVM, left-to-right —
deterministic and reproducible in oracle SQL's list_* folds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two array<float> columns.

    With a known static `dim`, emits an explicit left-associated add chain of
    element_at products — a plain expression tree that whole-stage codegen
    compiles, ~10× faster than the interpreted higher-order fold (and
    bit-identical to it: (0+p1)+p2+... == p1+p2+...).
    """
    if dim is not None:
        terms = [
            F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            for i in range(1, dim + 1)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def _flatten(df: DataFrame, id_alias: str, vec_col: str, prefix: str, dim: int) -> DataFrame:
    """Project array<float> into `dim` scalar double columns + a norm column.

    Joining on flattened scalars is ~4× faster than evaluating element_at
    chains on the joined rows (each array access re-deserializes the unsafe
    array); the arithmetic (cast → multiply → left-assoc add chain) is
    unchanged, so results stay bit-identical to the array form.
    """
    id_src, _, alias = id_alias.partition(" AS ")
    cols = [F.col(id_src).alias(alias or id_src)]
    cols += [F.col(vec_col).getItem(i).cast("double").alias(f"{prefix}{i}") for i in range(dim)]
    out = df.select(*cols)
    sq = [F.col(f"{prefix}{i}") * F.col(f"{prefix}{i}") for i in range(dim)]
    acc = sq[0]
    for t in sq[1:]:
        acc = acc + t
    return out.withColumn(f"{prefix}norm", F.sqrt(acc))


def _dot_cols(pa: str, pb: str, dim: int) -> Column:
    terms = [F.col(f"{pa}{i}") * F.col(f"{pb}{i}") for i in range(dim)]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × scan corpus → window top-k.

    Norms are computed once per row (not per pair) — same IEEE values, N+Q
    instead of N*Q norm folds. Ties broken by neighbor id so results are
    total-ordered and reproducible.
    """
    q = _flatten(queries, query_id_col, vec_col, "_q", dim)
    c = _flatten(corpus, f"{id_col} AS neighbor_id", vec_col, "_c", dim)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col(query_id_col) != F.col("neighbor_id"))
        .select(
            query_id_col,
            "neighbor_id",
            F.round(_dot_cols("_q", "_c", dim) / (F.col("_qnorm") * F.col("_cnorm")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy dependency in
    the plan; values are plan literals broadcast with the task binary)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bucket id: bit i = 1 iff dot(vec, plane_i) > 0.

    Computed directly on the array column as a left-associated literal
    multiply-add chain — one codegen'd projection, no flatten, and the exact
    expression is reproducible in oracle SQL by inlining the same plane
    literals (repr round-trips doubles exactly), so approximate operators are
    hash-gradeable cross-engine."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        terms = [
            F.element_at(vec, j + 1).cast("double") * F.lit(v) for j, v in enumerate(plane)
        ]
        proj = terms[0]
        for t in terms[1:]:
            proj = proj + t
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """The DuckDB-SQL twin of `lsh_bucket` for oracle queries: identical
    literals, identical left-associated evaluation order → identical IEEE
    results → identical buckets."""
    parts = []
    for i, plane in enumerate(planes):
        proj = " + ".join(f"CAST({vec_expr}[{j + 1}] AS DOUBLE) * {v!r}" for j, v in enumerate(plane))
        parts.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << i} ELSE 0 END)")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: only score candidates in the query's LSH bucket.

    At scale: corpus bucketed once (one codegen'd projection on the array —
    no column flatten), bucket column becomes a partition/cluster key; each
    query probes one bucket instead of the corpus. The candidate set after the
    bucket equi-join is tiny (N / 2^n_planes per query on average), so pair
    scoring cost is negligible; recall is tunable via n_planes (fewer planes →
    bigger buckets). Buckets and cosines are bit-reproducible in oracle SQL
    via `bucket_sql` (same literals, same evaluation order).
    """
    planes = random_hyperplanes(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        norm(F.col(vec_col), dim).alias("_cnorm"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        norm(F.col(vec_col), dim).alias("_qnorm"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "_bucket")
        .where(F.col(query_id_col) != F.col("neighbor_id"))
        .select(
            query_id_col,
            "neighbor_id",
            F.round(
                dot(F.col("_qvec"), F.col("_cvec"), dim) / (F.col("_qnorm") * F.col("_cnorm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
