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
