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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .numeric import grid_round


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
    instead of N*Q norm folds. Pair dots go through the Arrow UDF (left-fold
    order, bit-identical to the SQL chain — see pair_dot_udf). Ties broken by
    neighbor id so results are total-ordered and reproducible.
    """
    nrm, dot_p = norm_udf(), pair_dot_udf()
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"), nrm(F.col(vec_col)).alias("_qnorm")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        nrm(F.col(vec_col)).alias("_cnorm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col(query_id_col) != F.col("neighbor_id"))
        .select(
            query_id_col,
            "neighbor_id",
            grid_round(
                dot_p(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnorm") * F.col("_cnorm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def banded_bucket_udf(planes: list[list[float]], bands: int, planes_per_band: int):
    """Arrow-vectorized banded bucketizer: per row, an array of `bands`
    sign-buckets.

    Why a Pandas UDF here: the pure-expression form of B×P×D multiply-adds
    (5 120 terms at 8×10×64) exceeds the JVM's 64 KB method limit —
    whole-stage codegen fails to compile and Spark falls back to interpreted
    per-node evaluation, ~100× slower. NumPy evaluates the same arithmetic
    vectorized over the Arrow batch. Bit-exactness with the SQL oracle is
    preserved by accumulating dimension-by-dimension in the SAME left-
    associated float64 order as the `bucket_sql` chain (never np.dot, whose
    pairwise summation rounds differently)."""
    from pyspark.sql.types import ArrayType, LongType

    plane_mat = [np.asarray(p, dtype=np.float64) for p in planes]

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        out = np.zeros((mat.shape[0], bands), dtype=np.int64)
        for b in range(bands):
            bucket = np.zeros(mat.shape[0], dtype=np.int64)
            for i in range(planes_per_band):
                plane = plane_mat[b * planes_per_band + i]
                acc = mat[:, 0] * plane[0]
                for j in range(1, plane.shape[0]):
                    acc = acc + mat[:, j] * plane[j]
                bucket += (acc > 0).astype(np.int64) << i
            out[:, b] = bucket
        return pd.Series(list(out))

    return _buckets


def pair_dot_udf():
    """Arrow-vectorized dot product of two vector columns (pair scoring).

    Same left-fold float64 accumulation order as `spark_dot_sql`'s chain —
    bit-identical results — but the plan carries one small UDF node instead of
    a 64-term expression tree, so janino never has to compile a near-64KB
    method (that compile cost, ~2-4s per distinct plan, dominated the ANN
    queries at small SF; at 100 TB the Arrow batches amortize identically)."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        acc = ma[:, 0] * mb[:, 0]
        for j in range(1, ma.shape[1]):
            acc = acc + ma[:, j] * mb[:, j]
        return pd.Series(acc)

    return _dot


def norm_udf():
    """Arrow-vectorized vector norm with the same left-fold float64 order as
    `spark_norm_expr` / the oracle's sqrt-of-chain — see banded_bucket_udf
    for why this beats the expression form."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _norm(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        acc = mat[:, 0] * mat[:, 0]
        for j in range(1, mat.shape[1]):
            acc = acc + mat[:, j] * mat[:, j]
        return pd.Series(np.sqrt(acc))

    return _norm


def kmeans_train(vectors: list[list[float]], k: int, iters: int = 5) -> list[list[float]]:
    """Deterministic Lloyd's k-means for IVF index training: init = first k
    vectors, fixed iteration count, float64. Runs OFFLINE on a sample (the
    standard IVF workflow — the index ships as centroid constants; at 100 TB
    you train on a 0.1% sample and broadcast the centroids)."""
    mat = np.asarray(vectors, dtype=np.float64)
    centroids = mat[:k].copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in centroids]


def cell_assign_udf(centroids: list[list[float]]):
    """Arrow-vectorized IVF cell assignment: argmin over squared-L2 distances
    accumulated dimension-by-dimension in the same left-associated float64
    order as the oracle's `(v[1]-c1)^2 + ...` chain; ties → lowest cell index
    (mirrors the SQL CASE with <=)."""
    from pyspark.sql.types import IntegerType

    cent = [np.asarray(c, dtype=np.float64) for c in centroids]

    @F.pandas_udf(IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        dists = []
        for c in cent:
            diff0 = mat[:, 0] - c[0]
            acc = diff0 * diff0
            for j in range(1, c.shape[0]):
                diff = mat[:, j] - c[j]
                acc = acc + diff * diff
            dists.append(acc)
        d = np.stack(dists, axis=1)
        # first-index argmin == the SQL CASE chain with <= comparisons
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return _assign


def cell_probe_udf(centroids: list[list[float]], nprobe: int):
    """Arrow-vectorized multi-probe assignment: the `nprobe` nearest centroid
    cells per vector (ordered by distance, ties → lowest index). Used on the
    query side of `ivf_topk` — the corpus side always gets exactly one cell."""
    from pyspark.sql.types import ArrayType, IntegerType

    cent = [np.asarray(c, dtype=np.float64) for c in centroids]

    @F.pandas_udf(ArrayType(IntegerType()))
    def _probe(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        dists = []
        for c in cent:
            diff0 = mat[:, 0] - c[0]
            acc = diff0 * diff0
            for j in range(1, c.shape[0]):
                diff = mat[:, j] - c[j]
                acc = acc + diff * diff
            dists.append(acc)
        d = np.stack(dists, axis=1)
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    return _probe


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    nprobe: int = 1,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k with a pre-trained coarse
    quantizer: corpus rows are assigned to their nearest centroid cell (one
    vectorized projection — at scale the cell id becomes a partition/cluster
    key), each query probes only its own cell's inverted list, candidates are
    scored exactly. nprobe=1 formulation; production multi-probe unions the
    n nearest cells."""
    assign = cell_assign_udf(centroids)
    nrm, dot_p = norm_udf(), pair_dot_udf()
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        nrm(F.col(vec_col)).alias("_cnorm"),
        assign(F.col(vec_col)).alias("_cell"),
    )
    if nprobe <= 1:
        q = queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            nrm(F.col(vec_col)).alias("_qnorm"),
            assign(F.col(vec_col)).alias("_cell"),
        )
    else:
        # multi-probe: each query searches its nprobe nearest cells; corpus
        # rows still live in exactly one cell, so candidate pairs are unique
        probe = cell_probe_udf(centroids, nprobe)
        q = queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            nrm(F.col(vec_col)).alias("_qnorm"),
            F.explode(probe(F.col(vec_col))).alias("_cell"),
        )
    scored = (
        F.broadcast(q)
        .join(c, "_cell")
        .where(F.col(query_id_col) != F.col("neighbor_id"))
        .select(
            query_id_col,
            "neighbor_id",
            grid_round(
                dot_p(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnorm") * F.col("_cnorm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def cell_distance_sqls(vec_expr: str, centroids: list[list[float]]) -> list[str]:
    """DuckDB-SQL twin of `cell_assign_udf`'s distances: per-cell squared-L2
    chains in identical float64 evaluation order (explicit (v-c)*(v-c), not
    POWER — bit parity). Compute once in a CTE, argmin over the named columns
    with `argmin_case_sql`."""
    out = []
    for c in centroids:
        terms = " + ".join(
            f"(CAST({vec_expr}[{j + 1}] AS DOUBLE) - {v!r}) * (CAST({vec_expr}[{j + 1}] AS DOUBLE) - {v!r})"
            for j, v in enumerate(c)
        )
        out.append(f"({terms})")
    return out


def argmin_case_sql(names: list[str]) -> str:
    """First-index argmin over named distance columns — identical tie
    semantics to numpy argmin (<= comparisons, first branch wins)."""
    branches = []
    for i, n in enumerate(names):
        cond = " AND ".join(f"{n} <= {m}" for j, m in enumerate(names) if j != i)
        branches.append(f"WHEN {cond} THEN {i}" if cond else "WHEN TRUE THEN 0")
    return "CAST(CASE " + " ".join(branches) + " END AS INT)"


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


def spark_dot_sql(a: str, b: str, dim: int) -> str:
    """Spark-SQL dot product of two array columns as a left-associated
    element_at chain. Building the chain as ONE parsed SQL string instead of
    ~dim×4 Column operator calls avoids thousands of py4j round-trips per
    expression — the dominant driver-side cost for wide-vector plans."""
    return " + ".join(
        f"CAST(element_at({a}, {i}) AS DOUBLE) * CAST(element_at({b}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )


def spark_norm_expr(vec: str, dim: int) -> Column:
    return F.expr(f"SQRT({spark_dot_sql(vec, vec, dim)})")


def spark_cosine_expr(a: str, b: str, norm_a: str, norm_b: str, dim: int) -> Column:
    """round(dot/(norm*norm), 6) over pre-computed norm columns — the exact
    arithmetic `_cos_sql` replicates in DuckDB."""
    return F.expr(f"ROUND(({spark_dot_sql(a, b, dim)}) / ({norm_a} * {norm_b}), 6)")


def lsh_bucket(vec: str, planes: list[list[float]]) -> Column:
    """Sign-of-projection bucket id: bit i = 1 iff dot(vec, plane_i) > 0.

    Computed directly on the array column as a left-associated literal
    multiply-add chain — one codegen'd projection, no flatten, and the exact
    expression is reproducible in oracle SQL by inlining the same plane
    literals (repr round-trips doubles exactly), so approximate operators are
    hash-gradeable cross-engine. `vec` is a column NAME (the expression is
    built as one parsed SQL string — see spark_dot_sql)."""
    return F.expr(_bucket_sql(vec, planes, spark=True))


def bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """The DuckDB-SQL twin of `lsh_bucket` for oracle queries: identical
    literals, identical left-associated evaluation order → identical IEEE
    results → identical buckets."""
    return _bucket_sql(vec_expr, planes, spark=False)


def _bucket_sql(vec_expr: str, planes: list[list[float]], spark: bool) -> str:
    # spark dialect: element_at (1-based) + D-suffixed double literals;
    # duckdb dialect: 1-based [] indexing + plain literals (decimal literals
    # convert to the identical nearest double)
    parts = []
    for i, plane in enumerate(planes):
        if spark:
            proj = " + ".join(
                f"CAST(element_at({vec_expr}, {j + 1}) AS DOUBLE) * {v!r}D" for j, v in enumerate(plane)
            )
        else:
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
    bands: int = 1,
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
    planes = random_hyperplanes(dim, n_planes * bands)
    buckets = banded_bucket_udf(planes, bands=bands, planes_per_band=n_planes)
    nrm, dot_p = norm_udf(), pair_dot_udf()
    if bands == 1:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cvec"),
            nrm(F.col(vec_col)).alias("_cnorm"),
            buckets(F.col(vec_col)).getItem(0).alias("_bucket"),
        )
        q = queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            nrm(F.col(vec_col)).alias("_qnorm"),
            buckets(F.col(vec_col)).getItem(0).alias("_bucket"),
        )
        candidates = F.broadcast(q).join(c, "_bucket")
    else:
        # OR-construction: a pair is a candidate if ANY band's bucket matches
        # (recall grows with bands, candidate set stays a bucket equi-join —
        # never all-pairs). posexplode keys the join on (band index, bucket).
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cvec"),
            nrm(F.col(vec_col)).alias("_cnorm"),
            F.posexplode(buckets(F.col(vec_col))).alias("_band", "_bucket"),
        )
        q = queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            nrm(F.col(vec_col)).alias("_qnorm"),
            F.posexplode(buckets(F.col(vec_col))).alias("_band", "_bucket"),
        )
        candidates = (
            F.broadcast(q)
            .join(c, ["_band", "_bucket"])
            .dropDuplicates([query_id_col, "neighbor_id"])
        )
    scored = (
        candidates
        .where(F.col(query_id_col) != F.col("neighbor_id"))
        .select(
            query_id_col,
            "neighbor_id",
            grid_round(
                dot_p(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnorm") * F.col("_cnorm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def kmeans_assign_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    decimals: int = 6,
) -> DataFrame:
    """One deterministic Lloyd ASSIGNMENT step: every vector assigned to its
    nearest of k seed centroids (the k smallest-id vectors — reproducible
    seeding, no RNG), reporting per-cluster size and total within-cluster
    squared distance. This is the auditable inner step of `kmeans_train` /
    `ivf_topk`'s coarse quantizer: unlike the trained centroids (float-sum
    order-dependent), a single assignment step over fixed seeds is exactly
    reproducible in any engine, so it can be oracle-graded — and it is the
    unit of work that dominates k-means cost at scale.

    Exactness: per-dimension squared differences are computed in IEEE double
    (deterministic), rounded to 1e-6, then summed in exact DECIMAL via an
    in-row left fold — distance ties across seeds break on seed id. The
    rounding scale is deliberately 6, not finer: DuckDB's round(double, s)
    is a double multiply-round (boundary error ~2^-52·x·10^s), so the
    cross-engine-safe zone shrinks as s grows; at s=6 the boundary band is
    ~1e-9 per value, the same proven margin the graded correlation/trend
    operators use.
    Shape: the k seeds broadcast (k rows); the scan is one pass, the
    distance fold is in-row (no explode — N×k rows, not N×k×dim), and the
    cluster rollup is map-side combinable. At 100 TB this is scan-bound."""
    dec = f"decimal(38,{decimals})"
    seeds = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("_seed_id"), F.col(vec_col).alias("_seed_vec"))
    )
    diffs = F.zip_with(
        F.col(vec_col),
        F.col("_seed_vec"),
        lambda a, b: grid_round(
            (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double")),
            decimals,
        ).cast(dec),
    )
    dist = F.aggregate(diffs, F.lit(0).cast(dec), lambda acc, d: acc + d)
    assigned = (
        df.crossJoin(F.broadcast(seeds))
        .select(F.col(id_col), F.col("_seed_id"), dist.alias("_dist"))
        .groupBy(id_col)
        .agg(F.min(F.struct(F.col("_dist"), F.col("_seed_id"))).alias("_best"))
        .select(F.col(id_col), F.col("_best._seed_id").alias("cluster"), F.col("_best._dist").alias("_dist"))
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        grid_round(F.sum("_dist").cast("double"), 6).alias("total_sqdist"),
    )


def _pq_seed_subvectors(df, id_col, vec_col, m, k, sub_dim):
    """k deterministic seed vectors (smallest ids — same reproducible
    seeding as kmeans_assign_stats), pre-sliced into m subvectors."""
    return (
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).alias("_seed_id"),
            *[
                F.slice(F.col(vec_col), i * sub_dim + 1, sub_dim).alias(f"_seed_sub_{i}")
                for i in range(m)
            ],
        )
    )


def _sub_sqdist(a_col, b_col, decimals):
    """Exact-decimal squared distance between two subvectors: per-dimension
    squared difference in IEEE double, rounded to 1e-6, summed in
    DECIMAL(38,6) via an in-row fold — the proven cross-engine-exact recipe
    of kmeans_assign_stats."""
    dec = f"decimal(38,{decimals})"
    diffs = F.zip_with(
        a_col,
        b_col,
        lambda a, b: grid_round(
            (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double")),
            decimals,
        ).cast(dec),
    )
    return F.aggregate(diffs, F.lit(0).cast(dec), lambda acc, d: acc + d)


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    decimals: int = 6,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization encoding (Jégou, Douze & Schmid 2011, "Product
    quantization for nearest neighbor search"): each vector splits into m
    subvectors; each subvector is coded as the id of its nearest of k seed
    centroids. dim floats compress to m small ints — the memory step that
    makes billion-vector ANN feasible; `pq_adc_topk` searches the codes.

    Determinism: seeds are the k smallest-id vectors (no RNG); per-subspace
    distances use the exact DECIMAL fold (ties break on seed id), so the
    codes — unlike trained PQ codebooks — are bit-reproducible in any
    engine and oracle-gradable.

    Shape: seeds broadcast (k rows); one scan of the vectors; the distance
    fold is in-row (the N×k cross join carries m folds per row, never
    N×k×dim exploded rows); the per-vector argmin is a combinable
    min-of-struct aggregate. Scan-bound at 100 TB.

    Output: (id, code_0..code_{m-1}, qerr) where qerr is the total
    quantization error (sum over subspaces of the winning distances).
    """
    assert dim % m == 0, "dim must divide evenly into m subspaces"
    sub = dim // m
    if seeds is None:
        seeds = _pq_seed_subvectors(df, id_col, vec_col, m, k, sub)
    with_subs = df.select(
        F.col(id_col),
        *[F.slice(F.col(vec_col), i * sub + 1, sub).alias(f"_sub_{i}") for i in range(m)],
    )
    scored = with_subs.crossJoin(F.broadcast(seeds)).select(
        F.col(id_col),
        F.col("_seed_id"),
        *[
            _sub_sqdist(F.col(f"_sub_{i}"), F.col(f"_seed_sub_{i}"), decimals).alias(f"_d_{i}")
            for i in range(m)
        ],
    )
    best = scored.groupBy(id_col).agg(
        *[
            F.min(F.struct(F.col(f"_d_{i}"), F.col("_seed_id"))).alias(f"_best_{i}")
            for i in range(m)
        ]
    )
    qerr = sum(F.col(f"_best_{i}._d_{i}") for i in range(m))
    return best.select(
        F.col(id_col),
        *[F.col(f"_best_{i}._seed_id").cast("int").alias(f"code_{i}") for i in range(m)],
        grid_round(qerr.cast("double"), decimals).alias("qerr"),
    )


def pq_adc_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    n_queries: int = 10,
    k_neighbors: int = 5,
    decimals: int = 6,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k search over PQ codes (Jégou et al.
    2011 §IV): the query stays full-precision; each database vector's
    distance is approximated from a per-query lookup table of
    query-subvector ↔ centroid distances.

    With ``centroids`` this becomes IVF-PQ (Jégou et al. 2011 §V — the
    FAISS IVFPQ shape): a coarse quantizer assigns every database vector
    to one inverted-list cell and each query scores ONLY its own cell's
    codes (the cell id joins alongside the LUT keys). Candidate work drops
    from N to N/n_cells per query — the coarse pruning that makes
    billion-vector search tractable before PQ's memory compression even
    starts. Codes are built on raw vectors, not per-cell residuals, to
    keep the exact-decimal oracle grading; residual encoding is the
    production refinement (documented trade-off: slightly looser ADC).

    Shape: the LUT is n_queries × m × k rows (tiny, broadcast); database
    vectors are touched ONLY through their m-int codes — the scan reads
    m·4 bytes per vector instead of dim·4, which is the entire point at
    100 TB. One broadcast join + one combinable sum-groupBy + per-query
    top-k window.
    """
    assert dim % m == 0
    sub = dim // m
    seeds = _pq_seed_subvectors(df, id_col, vec_col, m, k, sub)
    # pass the seeds through — encoding must not re-derive them with a
    # second orderBy+limit scan of the (100 TB) vector table
    codes = pq_encode(df, id_col, vec_col, m=m, k=k, dim=dim, decimals=decimals, seeds=seeds)
    codes_long = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), F.col(f"code_{i}").alias("code"))
                    for i in range(m)
                ]
            )
        ).alias("ic"),
    ).select("neighbor_id", F.col("ic.i").alias("i"), F.col("ic.code").alias("code"))
    join_keys = ["i", "code"]
    qcols = [
        F.col(id_col).alias("query_id"),
        *[F.slice(F.col(vec_col), i * sub + 1, sub).alias(f"_q_sub_{i}") for i in range(m)],
    ]
    if centroids is not None:
        assign = cell_assign_udf(centroids)
        cells = df.select(
            F.col(id_col).alias("neighbor_id"), assign(F.col(vec_col)).alias("_cell")
        )
        codes_long = codes_long.join(cells, "neighbor_id")
        qcols.append(assign(F.col(vec_col)).alias("_cell"))
        join_keys = ["i", "code", "_cell"]
    queries = df.where(F.col(id_col) < n_queries).select(*qcols)
    carry = ["query_id"] + (["_cell"] if centroids is not None else [])
    lut = (
        queries.crossJoin(F.broadcast(seeds))
        .select(
            *carry,
            F.col("_seed_id").alias("code"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            _sub_sqdist(
                                F.col(f"_q_sub_{i}"), F.col(f"_seed_sub_{i}"), decimals
                            ).alias("d"),
                        )
                        for i in range(m)
                    ]
                )
            ).alias("idx"),
        )
        .select(*carry, F.col("idx.i").alias("i"), F.col("code").cast("int").alias("code"), F.col("idx.d").alias("d"))
    )
    scored = (
        codes_long.join(F.broadcast(lut), join_keys)
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").alias("_adc"))
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_adc").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_neighbors)
        .select(
            "query_id",
            "neighbor_id",
            grid_round(F.col("_adc").cast("double"), decimals).alias("adc_dist"),
            "rank",
        )
    )


def hard_negative_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_queries: int = 10,
) -> DataFrame:
    """Hard-negative mining for contrastive training (public technique —
    e.g. ANCE, Xiong et al. 2021): for each anchor, the k most-similar
    vectors carrying a DIFFERENT label. These boundary-hugging negatives
    are what make contrastive/embedding training data effective; random
    negatives are trivially separable.

    Shape: the anchor set broadcasts (bounded — the training batch or a
    sampled anchor slice), the corpus streams past it once; label
    inequality filters before scoring. Exact by construction here; at
    billion-vector scale swap the scan for the IVF/PQ candidate generation
    in this module and keep the label filter — the composition is the
    documented production path.
    """
    nrm, dot_p = norm_udf(), pair_dot_udf()
    q = df.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).alias("_qvec"),
        nrm(F.col(vec_col)).alias("_qnorm"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("_cvec"),
        nrm(F.col(vec_col)).alias("_cnorm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("anchor_label") != F.col("neighbor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            "neighbor_id",
            "neighbor_label",
            grid_round(
                dot_p(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnorm") * F.col("_cnorm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
