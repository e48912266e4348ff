"""Host-graph centrality: integer-exact PageRank (Page et al. 1999).

Web-corpus curation ranks hosts by link-graph authority — Common
Crawl publishes host-level harmonic centrality / PageRank, and
quality pipelines gate or weight documents by their host's rank
(e.g. seed-proximity crawls). The engine spelling is PageRank with
the one twist all integer-quantized operators here share: ranks are
integers at 1e6 scale and every per-edge contribution is floored,

    R_{k+1}(v) = floor((1e6 − d_e6)/N) + Σ_{u→v} floor(d_e6·R_k(u) /
                                                       (1e6·out(u)))

so iteration results are order-independent, engine-exact, and an
oracle can replay a fixed iteration count by unrolling. Dangling
nodes (no out-edges) simply leak their mass — the standard
simplification; redistributing it is one extra 1-row broadcast if a
probability-exact rank is ever needed (ranking order rarely moves).

Scale shape: the edge table is shuffled ONCE onto its join key
(``repartition("src")`` + persist) and every iteration reuses that
partitioning — per round it's one broadcast-or-shuffle join of ranks
(N rows, usually ≪ edges) into the co-partitioned edges, one
groupBy(dst) sum (map-side partial), one left join back onto the node
list for the teleport term. Rank lineage is truncated with
``localCheckpoint`` every ``checkpoint_every`` rounds — the
label-propagation lesson (dedup.dedup_components): without it the
logical plan grows O(iters) and analysis time dominates on deep
iteration counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000


def pagerank(edges: DataFrame, *, iters: int = 3,
             damping_e6: int = 850_000,
             checkpoint_every: int = 4) -> DataFrame:
    """(src, dst) → (node, rank_e6) after ``iters`` rounds from the
    uniform start floor(1e6/N). Parallel edges are real multi-edges
    (each contributes); self-loops are allowed."""
    edges = edges.select("src", "dst").repartition("src").persist()
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct().persist())
    n = nodes.count()
    base = (PR_SCALE - damping_e6) // n
    outdeg = edges.groupBy("src").agg(F.count("*").alias("out"))

    ranks = nodes.select(
        "node", F.lit(PR_SCALE // n).cast("long").alias("rank_e6"))
    for i in range(iters):
        contrib = (edges
                   .join(outdeg, "src")
                   .join(ranks.withColumnRenamed("node", "src"), "src")
                   .select(F.col("dst").alias("node"),
                           F.floor(F.col("rank_e6") * damping_e6
                                   / (F.lit(PR_SCALE).cast("long")
                                      * F.col("out")))
                           .cast("long").alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(summed, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.coalesce(F.col("s"), F.lit(0)))
                         .cast("long").alias("rank_e6")))
        ranks = ranks.persist()
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def hits(edges: DataFrame, *, iters: int = 2) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999): (src, dst) → (node,
    auth_e6, hub_e6) after ``iters`` mutual-reinforcement rounds.

    Where PageRank measures endorsement flow, HITS separates the two
    roles a crawl cares about: *authorities* (hosts worth fetching
    deeply) and *hubs* (directory/aggregator hosts worth mining for
    frontier links — a high-hub host's outlinks are better seeds than
    a high-authority host's). Update, integer-quantized so rounds are
    order-independent and an oracle replays them unrolled:

        a_raw(v) = Σ_{u→v} h(u);  a(v) = floor(a_raw / max a_raw · 1e6)
        h_raw(u) = Σ_{u→v} a(v);  h(u) = floor(h_raw / max h_raw · 1e6)

    starting from h = 1e6 everywhere. The max-normalization (instead
    of the textbook L2) keeps every raw sum a bounded BIGINT —
    ≤ 1e6·max-degree, int64-safe past 10^12-edge host graphs — and
    the normalizer divides BEFORE scaling (raw/max ∈ [0,1] in double,
    then ×1e6, then floor: the multiply-first spelling would overflow
    int64 at ~10^12 raw sums, and the two double ops in this order are
    bit-replayable in any engine). Nodes with no in-edges get auth 0;
    no out-edges → hub 0.
    Parallel edges are real multi-edges, as in ``pagerank``.

    Scale shape: per half-round one join of the N-row score table
    into the persisted edge table + one map-side-partial groupBy sum;
    the 1-row max joins by broadcast (the accepted scalar-stats BNLJ
    pattern). Unlike ``pagerank`` (which only ever joins on src),
    HITS alternates join keys — the auth half joins edges on src, the
    hub half on dst — so when the score table exceeds the broadcast
    threshold the hub half re-shuffles edges by dst each round; for
    host graphs the score side is host-cardinality and broadcasts, so
    the persisted src partitioning is reused. At score tables too big
    to broadcast, persist a second dst-partitioned edge copy (one
    extra shuffle total, not one per round). Score lineage is
    localCheckpoint-truncated every half-round (see the in-loop
    comment)."""
    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    edges = edges.select("src", "dst").repartition("src").persist()
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct().persist())

    def _norm(raw: DataFrame, col: str) -> DataFrame:
        # raw feeds BOTH the max-agg and the scale projection; persist
        # it (node-cardinality, tiny) or each consumer re-expands the
        # whole join subtree — for an iterative op that doubling
        # compounds per round (the label-propagation lesson).
        raw = raw.persist()
        mx = raw.agg(F.max(col).alias("_mx"))
        return (raw.join(F.broadcast(mx))
                .select("node",
                        F.when(F.col("_mx") > 0,
                               F.floor(F.col(col) / F.col("_mx")
                                       * PR_SCALE))
                        .otherwise(F.lit(0))
                        .cast("long").alias(col)))

    hubs = nodes.select(
        "node", F.lit(PR_SCALE).cast("long").alias("hub_e6"))
    auths = None
    for i in range(iters):
        a_raw = (edges
                 .join(hubs.withColumnRenamed("node", "src"), "src")
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("hub_e6").alias("a")))
        a_raw = (nodes.join(a_raw, "node", "left")
                 .select("node", F.coalesce(F.col("a"), F.lit(0))
                         .cast("long").alias("a")))
        auths = _norm(a_raw, "a").withColumnRenamed("a", "auth_e6")
        # localCheckpoint, not persist: the mutual-reinforcement plan
        # QUADRUPLES per round (_norm's two references × two
        # score-table consumers), and even a cached plan keeps its
        # full analyzed tree — at 2 rounds the plan STRING alone
        # OOM'd the driver. Truncating lineage each half-round keeps
        # the plan constant-size; the table is node-cardinality, so
        # the eager materialization is cheap.
        auths = auths.localCheckpoint()
        h_raw = (edges
                 .join(auths.withColumnRenamed("node", "dst"), "dst")
                 .groupBy(F.col("src").alias("node"))
                 .agg(F.sum("auth_e6").alias("h")))
        h_raw = (nodes.join(h_raw, "node", "left")
                 .select("node", F.coalesce(F.col("h"), F.lit(0))
                         .cast("long").alias("h")))
        hubs = _norm(h_raw, "h").withColumnRenamed("h", "hub_e6")
        hubs = hubs.localCheckpoint()
    return (auths.join(hubs, "node")
            .select("node", "auth_e6", "hub_e6"))
