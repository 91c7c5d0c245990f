"""Link-graph analytics: PageRank for domain/page authority.

Web-corpus curation weights documents by the link authority of their
host (Common Crawl releases domain-level ranks for exactly this use);
the reference pipeline has no graph stage, so this is the
training-data extension of the corpus model: an edge list
(src, dst) -> a stationary-distribution score per node.

Execution shape (the part that matters at 10^9 nodes / 10^11 edges):

- the edge list is deduped once, then persisted via localCheckpoint —
  every iteration re-reads it, and without the checkpoint each round
  re-optimizes and re-scans the whole upstream lineage.  All
  checkpoints here are LAZY (eager=False): the Catalyst plan is cut
  to a LogicalRDD leaf at build time either way, but materialization
  folds into the terminal action instead of paying one scheduled
  job per round — on a 5-round run that is ~10 fewer driver
  round-trips for an identical result;
- one iteration = one join of ranks onto edges (keyed by src, the
  natural pre-partitioning: both sides can be bucketed by node id on
  a real cluster so the join is shuffle-free after round one) and one
  groupBy dst (map-side partial sums collapse a hub's in-links per
  partition before the shuffle, so a 10^7-in-degree node moves
  O(partitions) rows, not O(in-degree));
- dangling mass (nodes with no out-links) is folded in as a broadcast
  scalar — a crossJoin of a 1-row aggregate, never a driver-side
  collect;
- ranks are rounded per iteration: the rounding is the cross-engine
  (and cross-run) determinism barrier — FP addition order inside a
  shuffle differs between runs, and without the per-round round()
  those last-ulp differences compound across iterations (same
  convention as the k-means centroids in similarity.py).

Fixed iteration count, no convergence action: PageRank converges
geometrically at rate `damping`, so callers pick iterations from the
precision they need (10 rounds ~ 0.85^10 ~ 0.2% residual); an
optional L1-delta action would add a per-round job for no planning
benefit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-iteration rounding: coarse enough that cross-engine FP
# addition-order noise (~1e-16 relative) cannot straddle a boundary
# in practice, fine enough that 5-15 iterations lose no signal
ITER_ROUND = 10


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    out_round: int = 6,
) -> DataFrame:
    """PageRank over a directed edge list.  Returns (node, rank)
    for every node appearing as a source OR destination; ranks sum
    to ~1 (exact up to rounding).

    Semantics (the standard random-surfer model):
      rank_0        = 1/N
      rank_{i+1}(v) = (1-d)/N + d * (sum_{u->v} rank_i(u)/outdeg(u)
                                     + dangling_mass_i / N)
    where dangling nodes (no out-links) spread their mass uniformly —
    dropping it (the naive formulation) leaks probability every round
    and under-ranks everything in graphs with sinks.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("od")
    )
    # (node, od|NULL) — NULL od marks a dangling node; carried on the
    # rank frame so the per-round dangling aggregate needs no join
    base = nodes.join(outdeg, "node", "left").localCheckpoint(eager=False)
    n_total = F.broadcast(base.agg(F.count(F.lit(1)).alias("_n")))
    ranks = base.crossJoin(n_total).select(
        "node",
        "od",
        F.round(F.lit(1.0) / F.col("_n"), ITER_ROUND).alias("rank"),
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = (
            e.join(
                ranks.select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("od")).alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        dangling = F.broadcast(
            ranks.filter(F.col("od").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
            )
        )
        ranks = (
            ranks.join(contrib, "node", "left")
            .crossJoin(n_total)
            .crossJoin(dangling)
            .select(
                "node",
                "od",
                F.round(
                    (1.0 - damping) / F.col("_n")
                    + damping
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("_dang") / F.col("_n")
                    ),
                    ITER_ROUND,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "node", F.round("rank", out_round).alias("rank")
    )


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    out_round: int = 6,
) -> DataFrame:
    """HITS hub/authority scores (Kleinberg 1999) over a directed
    edge list: (node, hub, authority) for every node appearing as a
    source or destination.  PageRank's complement for corpus
    curation: authority finds the heavily-cited pages, hub finds the
    directories/link farms pointing at them — a strong hub score
    with a weak authority score is itself a curation signal (link
    pages carry little training text).

    Per round, L1-normalized:
      auth'(v) = sum over u->v of hub(u);   auth = auth' / sum auth'
      hub'(u)  = sum over u->v of auth(v);  hub  = hub'  / sum hub'
    L1 rather than the textbook L2 norm: the ranking and fixed-point
    direction are identical, and a plain sum is exactly mirrorable in
    SQL while sqrt-of-sum-of-squares would compound FP-order noise
    across engines.  Per-round rounding to ITER_ROUND is the same
    determinism barrier pagerank uses.

    Scale shape mirrors pagerank: edge list deduped and checkpointed
    once; one round = two equi-joins onto the edges (src- then
    dst-keyed — on a real cluster bucket the edge list both ways) +
    two map-side-combined groupBys + two broadcast 1-row scalar
    sums; the hub frame is checkpointed per round to truncate
    lineage.  Nodes with no in-links hold authority 0 (kept, not
    dropped), symmetric for hubs."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_total = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("_n")))
    hubs = nodes.crossJoin(n_total).select(
        "node", F.round(F.lit(1.0) / F.col("_n"), ITER_ROUND).alias("hub")
    ).localCheckpoint(eager=False)
    auth = None
    for _ in range(iterations):
        araw = (
            e.join(hubs.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("_a"))
        )
        asum = F.broadcast(
            araw.agg(F.coalesce(F.sum("_a"), F.lit(0.0)).alias("_s"))
        )
        auth = (
            nodes.join(araw, "node", "left")
            .crossJoin(asum)
            .select(
                "node",
                F.round(
                    F.when(F.col("_s") > 0, F.coalesce("_a", F.lit(0.0)) / F.col("_s"))
                    .otherwise(F.lit(0.0)),
                    ITER_ROUND,
                ).alias("auth"),
            )
            .localCheckpoint(eager=False)
        )
        hraw = (
            e.join(auth.select(F.col("node").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("_h"))
        )
        hsum = F.broadcast(
            hraw.agg(F.coalesce(F.sum("_h"), F.lit(0.0)).alias("_s"))
        )
        hubs = (
            nodes.join(hraw, "node", "left")
            .crossJoin(hsum)
            .select(
                "node",
                F.round(
                    F.when(F.col("_s") > 0, F.coalesce("_h", F.lit(0.0)) / F.col("_s"))
                    .otherwise(F.lit(0.0)),
                    ITER_ROUND,
                ).alias("hub"),
            )
            .localCheckpoint(eager=False)
        )
    return hubs.join(auth, "node").select(
        "node",
        F.round("hub", out_round).alias("hub"),
        F.round("auth", out_round).alias("authority"),
    )


def weighted_pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    iterations: int = 5,
    damping: float = 0.85,
    out_round: int = 6,
) -> DataFrame:
    """PageRank over a WEIGHTED edge list — the host-graph form: when
    a page graph is contracted to its hosts (every page mapped to its
    domain, parallel edges collapsed to a count), the multiplicity IS
    the signal, and unweighted PageRank on the contracted graph would
    rank a host linked once from 10^6 pages of one domain equal to a
    host linked from 10^6 distinct domains.  Common Crawl's published
    domain ranks are computed on exactly this contracted weighted
    graph.

    Semantics: rank flows proportionally to edge weight —
      rank_{i+1}(v) = (1-d)/N + d * (sum_{u->v} rank_i(u) * w(u,v)
                                     / W(u) + dangling_mass_i / N)
    with W(u) the total out-weight of u and dangling nodes (no
    out-edges) spreading uniformly, as in `pagerank`.

    Scale shape is pagerank's exactly (per round: one src-keyed join,
    one dst-keyed map-side-combined aggregation, one broadcast
    dangling scalar, per-round round() determinism barrier,
    localCheckpoint lineage truncation) plus ONE extra build-time
    aggregation: parallel input edges are collapsed by summing their
    weights (groupBy(src,dst)), which also makes the operator
    idempotent under duplicated edge rows.  Weights are cast to
    double once at staging so the share expression (rank * w / W) is
    the same three-flop sequence the DuckDB oracle evaluates."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).alias("w"),
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("w") > 0)
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("double").alias("w"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outw = e.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").alias("ow")
    )
    base = nodes.join(outw, "node", "left").localCheckpoint(eager=False)
    n_total = F.broadcast(base.agg(F.count(F.lit(1)).alias("_n")))
    ranks = base.crossJoin(n_total).select(
        "node",
        "ow",
        F.round(F.lit(1.0) / F.col("_n"), ITER_ROUND).alias("rank"),
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = (
            e.join(
                ranks.select(
                    F.col("node").alias("src"), "rank", "ow"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.col("rank") * F.col("w") / F.col("ow")
                ).alias("contrib")
            )
        )
        dangling = F.broadcast(
            ranks.filter(F.col("ow").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
            )
        )
        ranks = (
            ranks.join(contrib, "node", "left")
            .crossJoin(n_total)
            .crossJoin(dangling)
            .select(
                "node",
                "ow",
                F.round(
                    (1.0 - damping) / F.col("_n")
                    + damping
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("_dang") / F.col("_n")
                    ),
                    ITER_ROUND,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "node", F.round("rank", out_round).alias("rank")
    )


def lpa_communities(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 4,
) -> DataFrame:
    """Synchronous label propagation (Raghavan 2007) over the
    UNDIRECTED simple graph under `edges`: (node, community) after a
    fixed number of rounds, labels initialized to node ids.  Where
    connected components answer "is there ANY path" (dedup transitive
    closure), LPA finds densely-linked regions — site sections, link
    rings, mirror families — inside one giant web component.

    Determinism: textbook LPA breaks count ties randomly and is
    therefore unreproducible; here a tie on neighbor-label count is
    broken toward the SMALLEST label, making the whole fixed-round
    run a pure function of the edge list (cross-engine value-equal —
    the DuckDB oracle unrolls the rounds with the identical
    ORDER BY cnt DESC, label ASC rule).  Synchronous updates (all
    nodes flip on round boundaries) rather than in-order sweeps, so
    partitioning cannot change results.

    Scale shape per round: one equi-join of labels onto the
    undirected edge list (bucket both by node id on a real cluster)
    + one map-side-combined groupBy(node, label) count + one argmax
    folded into a second groupBy via max(struct(cnt, -label)) — no
    windows, no collects; labels frame localCheckpointed per round to
    truncate iterative lineage.  A celebrity node's in-edges collapse
    to <= distinct-neighbor-labels rows in the partial aggregation."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
    )
    und = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = und.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        cnt = (
            und.join(
                labels.select(F.col("node").alias("dst"), "label"), "dst"
            )
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # argmax(count) with min-label tie-break, folded into the
        # aggregation itself: max(struct(cnt, -label)) — no window.
        labels = (
            cnt.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("_c"), (-F.col("label")).alias("_nl")
                    )
                ).alias("_m")
            )
            .select("node", (-F.col("_m._nl")).alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("label").alias("community"))


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle census of the UNDIRECTED simple graph under
    `edges`: one row (n_vertices, n_edges, n_wedges, n_triangles,
    clustering) where clustering = 3*triangles / wedges (the global
    clustering coefficient; 0.0 when the graph has no wedges).

    Scale shape — degree-ordered orientation, the standard trick that
    makes distributed triangle counting tractable: orient every
    canonical edge from its lower-(degree, id) endpoint to the
    higher, so each triangle is generated by exactly ONE wedge at its
    lowest-rank corner and wedge fan-out is bounded by arboricity,
    not by max degree (a celebrity vertex of degree 1e6 would
    otherwise spawn 5e11 wedges; oriented, its out-degree stays
    O(sqrt(edges))).  Plan: canonicalize+distinct, one degree
    aggregation joined back twice (degree table is vertex-sized),
    wedge self-join on the shared source, closing-edge semi-join —
    all equi-joins on ids.  Counts are integers end-to-end; only the
    final clustering ratio is FP, rounded to 6."""
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import register_persisted

    s, d = F.col(src), F.col(dst)
    und = (
        edges.select(
            F.least(s, d).alias("u"), F.greatest(s, d).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .unionAll(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranked = (
        und.join(deg.select(F.col("x").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("deg").alias("dv")), "v")
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("du")).otherwise(F.col("dv")).alias("da"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = oriented.select(
        F.col("a"), F.col("b").alias("w1"), F.col("db").alias("d1")
    )
    e2 = oriented.select(
        F.col("a"), F.col("b").alias("w2"), F.col("db").alias("d2")
    )
    wedges = e1.join(e2, "a").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("w1") < F.col("w2")))
    )
    closing = oriented.select(
        F.col("a").alias("w1"), F.col("b").alias("w2")
    )
    tri = wedges.join(closing, ["w1", "w2"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    scalars = (
        deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.sum(F.expr("deg * (deg - 1) div 2"))
            .cast("long")
            .alias("n_wedges"),
        )
        .crossJoin(
            und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        )
        .crossJoin(tri)
    )
    out = scalars.select(
        "n_vertices",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering"),
    )
    return register_persisted(out, und, deg, oriented)
