"""Distributed graph algorithms over edge-list DataFrames.

PageRank (Page, Brin, Motwani & Winograd 1999, "The PageRank Citation
Ranking") as a fixed-iteration power method expressed with plain DataFrame
joins + aggregates — the classic Pregel-free Spark formulation: each
iteration is one join of the rank vector against the edge list, one
map-side-combinable groupBy on the destination, and one left join back to
the node set. No RDDs, no driver-side adjacency, no Python in the loop.

Determinism across engines is the interesting part: a float power method
accumulates rank in SUM(double), whose value depends on reduction order —
exactly the cross-engine hash-mismatch class this repo eliminated
elsewhere with exact DECIMAL folds. Here we go one step further and run
the whole iteration in scaled 64-bit INTEGER arithmetic: ranks are stored
as ``rank * 10^SCALE_DIGITS``, per-edge contributions use integral
division (``div``), and the damping mix is an integer multiply-divide.
Every operation is exact and order-independent, so Spark and any other
engine that runs the same recurrence produce bit-identical outputs — the
iterative-algorithm analog of the exact-decimal discipline used by
kmeans_assign_stats / rolling-z.

Dangling mass (nodes with no out-edges) is dropped rather than
redistributed — the standard simplification; noted so oracle SQL matches.

Scale shape: the rank vector and node list are O(V); each iteration
shuffles the edge list once on src (join) and once on dst (groupBy) — the
same two exchanges any distributed PageRank must pay. ``localCheckpoint``
after each iteration cuts the growing lineage so the driver does not
re-plan a 5-iteration-deep DAG per action at 100 TB. Reference framework
surface: custom iterative transformers run through
CustomDataFrameAction (sdl-core
workflow/action/CustomDataFrameAction.scala:40); the algorithm itself is
from the public paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_data_lake_spark.session import lineage_pin

SCALE_DIGITS = 12
SCALE = 10**SCALE_DIGITS


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns
    ``(node, rank_e12)`` with rank scaled by 10^12 as a BIGINT.

    ``damping_pct`` is the damping factor in percent (85 = the canonical
    0.85) so the damping mix stays in integer arithmetic.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"), w.cast("long").alias("_w")
    )
    # collapse parallel edges once so the per-iteration join is minimal —
    # and pin the collapsed frame FIRST (the HITS/markov pattern, r12):
    # nodes' two-branch union and out_w below otherwise re-execute the
    # upstream edge build (corpus tokenize + adjacency explode for the
    # terms graph) once per reference at pin time
    e = e.groupBy("_src", "_dst").agg(F.sum("_w").alias("_w")).transform(lineage_pin)
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_outw"))
    # per-edge transition numerators stay as (w, outw) pairs; the division
    # happens against the current rank each iteration: (r * w) div outw
    e = e.join(out_w, "_src").transform(lineage_pin)
    nodes = nodes.transform(lineage_pin)

    n_nodes = nodes.count()
    if n_nodes == 0:  # empty graph: empty rank vector, not a div-by-zero
        return nodes.select("node", F.lit(0).cast("long").alias("rank_e12"))
    base = (100 - damping_pct) * SCALE // (100 * n_nodes)
    init = SCALE // n_nodes
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_e12"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "_src"), "_src")
            .select(
                F.col("_dst").alias("node"),
                # rank*w is widened to DECIMAL(38,0) before the integral
                # division: rank <= 10^12 and an aggregated edge weight can
                # exceed 2^63/10^12 ~ 9.2e6 on a large corpus, so a LONG
                # multiply would overflow (ANSI error / silent wrap); the
                # quotient itself always fits a long (<= rank)
                F.expr("cast((cast(rank_e12 as decimal(38,0)) * _w) div _outw as long)").alias(
                    "_c"
                ),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_insum"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr(f"({damping_pct} * coalesce(_insum, 0L)) div 100")
            ).alias("rank_e12"),
        )
        # cut lineage so iteration k+1 does not re-plan k joins deep
        ranks = ranks.transform(lineage_pin)
    return ranks


def token_transition_edges(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Directed token-adjacency edge list of a corpus: one edge per
    occurrence of consecutive tokens (u, v), weight = occurrence count.
    One narrow explode (pairs stay on their document's partition) + one
    combinable count shuffle."""
    from .text import tokens

    toks = tokens(F.col(text_col))
    pairs = docs.select(
        F.explode(
            F.when(F.size(toks) >= 2, F.arrays_zip(
                F.slice(toks, 1, F.size(toks) - 1).alias("src"),
                F.slice(toks, 2, F.size(toks) - 1).alias("dst"),
            )).otherwise(F.array().cast("array<struct<src:string,dst:string>>"))
        ).alias("p")
    ).select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
    return pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 3,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, "Authoritative sources in a
    hyperlinked environment" — public): the mutually-recursive counterpart
    of PageRank — a node is a good AUTHORITY if good hubs point at it, a
    good HUB if it points at good authorities. Returns
    ``(node, authority_e12, hub_e12)`` scaled by 10^12 as BIGINTs.

    Same engine-exactness discipline as `pagerank`: the whole recurrence
    runs in scaled integer arithmetic — each half-iteration is one edge
    join + one map-side-combinable groupBy, then MAX-normalization
    (x * SCALE div max) instead of the float L2 norm; max-normalization is
    the standard integer-friendly variant and preserves the ranking the
    power iteration converges to. Every multiply widens to DECIMAL(38,0)
    before the integral division, so Spark and any ANSI engine running the
    same recurrence agree bit-for-bit. Per iteration: two edge shuffles
    (src-join, dst-group) — the unavoidable HITS exchange pattern — with a
    `localCheckpoint` lineage cut."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"), w.cast("long").alias("_w")
    )
    e = e.groupBy("_src", "_dst").agg(F.sum("_w").alias("_w")).transform(lineage_pin)
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        .transform(lineage_pin)
    )
    if e.limit(1).count() == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("authority_e12"),
            F.lit(0).cast("long").alias("hub_e12"),
        )
    hubs = nodes.select("node", F.lit(SCALE).cast("long").alias("h"))
    auths = nodes.select("node", F.lit(SCALE).cast("long").alias("a"))

    def _normalize(df: DataFrame, col: str) -> DataFrame:
        mx = df.agg(F.max(col).alias("_mx"))
        return df.crossJoin(F.broadcast(mx)).select(
            "node",
            F.when(
                F.col("_mx") > 0,
                F.expr(f"cast((cast({col} as decimal(38,0)) * {SCALE}) div _mx as long)"),
            )
            .otherwise(F.lit(0))
            .alias(col),
        )

    for _ in range(iterations):
        raw_a = (
            e.join(hubs.withColumnRenamed("node", "_src"), "_src")
            .select(
                F.col("_dst").alias("node"),
                F.expr("cast(cast(h as decimal(38,0)) * _w as decimal(38,0))").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").cast("decimal(38,0)").alias("_raw"))
        )
        auths = _normalize(
            nodes.join(raw_a, "node", "left").select(
                "node", F.coalesce(F.col("_raw"), F.lit(0)).alias("a")
            ),
            "a",
        ).transform(lineage_pin)
        raw_h = (
            e.join(auths.withColumnRenamed("node", "_dst"), "_dst")
            .select(
                F.col("_src").alias("node"),
                F.expr("cast(cast(a as decimal(38,0)) * _w as decimal(38,0))").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").cast("decimal(38,0)").alias("_raw"))
        )
        hubs = _normalize(
            nodes.join(raw_h, "node", "left").select(
                "node", F.coalesce(F.col("_raw"), F.lit(0)).alias("h")
            ),
            "h",
        ).transform(lineage_pin)
    return (
        auths.join(hubs, "node")
        .select(
            "node",
            F.col("a").cast("long").alias("authority_e12"),
            F.col("h").cast("long").alias("hub_e12"),
        )
    )


def markov_stationary(
    transitions: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    count_col: str = "c",
    iterations: int = 3,
) -> DataFrame:
    """Stationary distribution of a Markov chain by power iteration in
    SCALED INTEGER arithmetic — the long-run occupancy the transition
    matrix converges to (the "where do users end up" collapse of the
    per-step transition counts). Start uniform (SCALE per state), then
    iterate x ← x·P with P(i,j) = c_ij / Σ_j c_ij computed WITHOUT floats:
    contribution = x_i · c_ij div row_total_i, every multiply widened to
    DECIMAL(38,0) before the integral division — the PageRank/HITS
    engine-exactness discipline, bit-identical on any ANSI engine running
    the same unrolled recurrence. Mass is conserved up to the div
    truncation (< one unit per edge), so no per-iteration normalization is
    needed for the RANKING; scores stay on the SCALE=10^12 grid.

    States with no outgoing transitions keep their mass (self-loop
    semantics — the absorbing-state convention that avoids mass leaks).
    Per iteration: one broadcast-sized join + one combinable groupBy over
    the state-dictionary-sized edge list — never row-count-sized."""
    e = transitions.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("_dst"),
        F.col(count_col).cast("long").alias("_c"),
    )
    # NULL is not a state: drop NULL endpoints EXPLICITLY (the equi-joins
    # below would drop NULL-src edges silently while keeping NULL as a
    # phantom node — and a NULL reaching an oracle's NOT-IN empties the
    # whole sink set; r9 review #2)
    e = e.where(F.col("_src").isNotNull() & F.col("_dst").isNotNull())
    e = e.groupBy("_src", "_dst").agg(F.sum("_c").alias("_c"))
    tot = e.groupBy("_src").agg(F.sum("_c").alias("_t"))
    e = e.join(tot, "_src").transform(lineage_pin)
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        .transform(lineage_pin)
    )
    # absorbing states: nodes with no outgoing edges route mass to themselves
    sinks = nodes.join(
        e.select(F.col("_src").alias("node")).distinct(), "node", "left_anti"
    ).select("node")
    x = nodes.select("node", F.lit(SCALE).cast("decimal(38,0)").alias("x"))
    for _ in range(iterations):
        moved = (
            e.join(x.withColumnRenamed("node", "_src"), "_src")
            .select(
                F.col("_dst").alias("node"),
                F.expr("cast((cast(x as decimal(38,0)) * _c) div _t as decimal(38,0))").alias("_m"),
            )
            .groupBy("node")
            .agg(F.sum("_m").cast("decimal(38,0)").alias("_in"))
        )
        kept = sinks.join(x, "node").select("node", F.col("x").alias("_in"))
        x = (
            nodes.join(moved.unionByName(kept), "node", "left")
            .groupBy("node")
            .agg(F.coalesce(F.sum("_in"), F.lit(0)).cast("decimal(38,0)").alias("x"))
            .transform(lineage_pin)
        )
    return x.select("node", F.col("x").cast("long").alias("stationary_e12"))


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    top_k: int | None = 20,
) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED simple graph induced by
    the edge list (self-loops and duplicate/reverse edges collapsed) — the
    clustering/cohesion census (Newman 2003, public; the node-iterator++
    degree-ordered formulation is Schank & Wagner 2005 / the standard
    MapReduce triangle recipe).

    Scale shape — the part that matters at 100 TB: counting wedges naively
    joins the edge list on its hubs (a degree-d node contributes d²
    wedges). Orienting every edge from the (degree, id)-SMALLER endpoint
    to the larger one first makes the out-degree of EVERY node at most
    O(√m), so the wedge join is bounded by Σ d_out² ≤ m^1.5 — the classic
    hub-killer. Three stages, all equi-joins: orient (one degree aggregate
    + broadcast-friendly join), wedge build (oriented ⋈ oriented on the
    low endpoint), close (wedge ⋈ oriented edge set). Triangle credit is
    then propagated to all three corners via one union + combinable count.

    Returns (node, n_triangles) — `top_k` bounds the output by
    (n_triangles desc, node) for the census readout; None emits all nodes.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .distinct()
    )
    und = und.transform(lineage_pin)
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient from (degree, node)-smaller endpoint to larger: every node's
    # out-degree is O(sqrt(m)), so the wedge self-join below cannot blow up
    # on hubs
    withdeg = (
        und.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    lt = (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = withdeg.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).transform(lineage_pin)
    # wedges u -> (v, w) with v < w by the SAME orientation order are
    # closed by an oriented edge (v, w)
    e1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = (
        e1.join(e2, "u")
        .where(F.col("x") < F.col("y"))
        .select("u", "x", "y")
    )
    # the closing-edge set in NAME order is exactly `und` (orientation is a
    # bijection on the undirected pair set) — semi-join the wedges against
    # it directly, no re-normalization stage
    tris = wedges.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"], "left_semi"
    )
    corners = (
        tris.select(F.col("u").alias("node"))
        .unionAll(tris.select(F.col("x").alias("node")))
        .unionAll(tris.select(F.col("y").alias("node")))
    )
    out = corners.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    if top_k is not None:
        out = out.orderBy(F.desc("n_triangles"), F.asc("node")).limit(top_k)
    return out


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling over the undirected simple graph induced
    by the edge list (Seidman 1983, public): each round removes every node
    whose CURRENT degree is below ``k`` (and the edges it carried), the
    standard cohesion filter separating a graph's dense backbone from its
    sparse fringe — in the term-graph reading, the vocabulary that stays
    densely interconnected after boilerplate-degree terms peel away.

    Like pagerank/hits/markov here, the iteration count is FIXED
    (``rounds``), not run-to-convergence: the output after R rounds is a
    deterministic pure-integer function of the edge list, so any engine
    evaluating the same recurrence agrees bit-for-bit (the oracle unrolls
    the same R rounds as SQL CTEs). A node can survive round R and still
    leave a later round — callers wanting the true k-core raise ``rounds``
    (peeling is monotone: survivors only shrink, and on a graph of
    diameter d it converges within O(d) rounds).

    Returns (node, degree) for the survivors of ``rounds`` rounds, with
    their degree at that point (>= k unless the node exits next round).

    Scale shape: each round is one combinable degree aggregate over the
    surviving edge list + two semi/anti joins keyed on node id — never a
    wedge or pair blowup; the edge list only SHRINKS round over round.
    localCheckpoint after each round cuts the R-deep lineage (the
    pagerank treatment).
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .distinct()
        .transform(lineage_pin)
    )
    surv = und
    for _ in range(rounds):
        deg = (
            surv.select(F.col("a").alias("n"))
            .unionAll(surv.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("n")
        surv = (
            surv.join(keep.select(F.col("n").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("n").alias("b")), "b", "left_semi")
            .select("a", "b")
            .transform(lineage_pin)
        )
    final_deg = (
        surv.select(F.col("a").alias("node"))
        .unionAll(surv.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return final_deg
