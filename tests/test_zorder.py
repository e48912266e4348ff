"""Z-order layout clustering (operators/zorder.py) — Morton math vs a
pure-Python reference, and the pruning property the layout exists for."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from docling_spark.operators.zorder import (  # noqa: E402
    zorder_file_stats, zorder_oracle_sql)


def _morton(sa: int, sb: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((sa >> i) & 1) << (2 * i + 1)
        z |= ((sb >> i) & 1) << (2 * i)
    return z


def _reference(rows, bits, n_files):
    amin = min(a for a, _ in rows)
    amax = max(a for a, _ in rows)
    bmin = min(b for _, b in rows)
    bmax = max(b for _, b in rows)
    grid = (1 << bits) - 1
    files = {}
    for a, b in rows:
        sa = (a - amin) * grid // max(amax - amin, 1)
        sb = (b - bmin) * grid // max(bmax - bmin, 1)
        fid = (_morton(sa, sb, bits) * n_files) >> (2 * bits)
        st = files.setdefault(fid, [0, a, a, b, b])
        st[0] += 1
        st[1] = min(st[1], a)
        st[2] = max(st[2], a)
        st[3] = min(st[3], b)
        st[4] = max(st[4], b)
    return {fid: tuple(v) for fid, v in files.items()}


def test_file_stats_match_python_reference(spark):
    rows = [(i * 37 % 101, (i * i) % 93) for i in range(500)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {r["file_id"]: (r["n_rows"], r["min_a"], r["max_a"],
                          r["min_b"], r["max_b"])
           for r in zorder_file_stats(df, "a", "b",
                                      bits=8, n_files=16).collect()}
    assert got == _reference(rows, bits=8, n_files=16)


def test_pruning_beats_single_column_sort(spark):
    # the property the layout pays for: a single-column sort prunes
    # perfectly on its own column and NOT AT ALL on the other; z-order
    # prunes on BOTH. So for a range predicate on b alone, files
    # sorted by a all overlap the query, while z-ordered files mostly
    # don't.
    import hashlib
    rows = [((i * 7919) % 4096,
             int.from_bytes(hashlib.md5(str(i).encode()).digest()[:2],
                            "big") % 4096)
            for i in range(4096)]
    df = spark.createDataFrame(rows, "a long, b long")
    stats = zorder_file_stats(df, "a", "b", bits=12, n_files=64).collect()
    qb = (2000, 2200)
    z_hit = sum(1 for r in stats
                if r["max_b"] >= qb[0] and r["min_b"] <= qb[1])
    # column-a sort: 64 equal row-count files by a-rank; with b
    # independent of a, every file spans ~the full b range
    srt = sorted(rows)
    per = len(srt) // 64
    a_hit = sum(
        1 for f in range(64)
        if max(c[1] for c in srt[f * per:(f + 1) * per]) >= qb[0]
        and min(c[1] for c in srt[f * per:(f + 1) * per]) <= qb[1])
    assert a_hit >= 60, a_hit          # a-sort cannot prune b at all
    assert z_hit <= a_hit // 2, (z_hit, a_hit)  # z-order prunes most


def test_oracle_sql_replays_exactly(spark):
    import duckdb
    rows = [(i % 257, (i * 31) % 199) for i in range(400)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = sorted(tuple(r) for r in
                 zorder_file_stats(df, "a", "b",
                                   bits=10, n_files=32).collect())
    sql = zorder_oracle_sql(
        "SELECT a, b FROM tbl", "a", "b", bits=10, n_files=32)
    pdf = df.toPandas()  # noqa: F841 — registered by name in duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE tbl AS SELECT * FROM pdf")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_degenerate_constant_column(spark):
    df = spark.createDataFrame([(5, i) for i in range(100)],
                               "a long, b long")
    stats = zorder_file_stats(df, "a", "b", bits=8, n_files=8).collect()
    assert sum(r["n_rows"] for r in stats) == 100
    assert all(r["min_a"] == 5 and r["max_a"] == 5 for r in stats)
