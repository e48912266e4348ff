"""Integer-exact PageRank (operators/graph.py:pagerank)."""


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_hand_computed_two_rounds(spark):
    from docling_spark.operators.graph import pagerank
    # 1→2, 2→1, 2→3, 3→3 (self-loop); N=3
    e = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 3)])
    out = {r["node"]: r["rank_e6"]
           for r in pagerank(e, iters=2).collect()}
    # replay by hand
    base, n = 150000 // 3, 3
    r = {1: 1000000 // 3, 2: 1000000 // 3, 3: 1000000 // 3}
    outd = {1: 1, 2: 2, 3: 1}
    for _ in range(2):
        c = {v: 0 for v in r}
        for s, d in [(1, 2), (2, 1), (2, 3), (3, 3)]:
            c[d] += (r[s] * 850000) // (1000000 * outd[s])
        r = {v: base + c[v] for v in r}
    assert out == r


def test_sink_keeps_teleport_only(spark):
    from docling_spark.operators.graph import pagerank
    # 1→2: node 2 is dangling (its mass leaks, documented)
    out = {r["node"]: r["rank_e6"] for r in
           pagerank(_edges(spark, [(1, 2)]), iters=3).collect()}
    base = 150000 // 2
    # node 1 receives nothing: teleport only after round 1
    assert out[1] == base
    # node 2 = teleport + damped share of node 1's teleport-only rank
    assert out[2] == base + (base * 850000) // 1000000


def test_multi_edges_contribute_each(spark):
    from docling_spark.operators.graph import pagerank
    out = {r["node"]: r["rank_e6"] for r in
           pagerank(_edges(spark, [(1, 2), (1, 2), (2, 1)]),
                    iters=1).collect()}
    base = 150000 // 2
    r0 = 1000000 // 2
    # node 1's out-degree is 2 (parallel edges), each contributes
    assert out[2] == base + 2 * ((r0 * 850000) // (1000000 * 2))
    assert out[1] == base + (r0 * 850000) // 1000000
