"""Z-order (Morton-curve) data-layout clustering — the lakehouse
``OPTIMIZE ZORDER BY (a, b)`` primitive: interleave the bits of two
normalized sort keys so rows close in EITHER dimension land in the
same output file, giving min/max file statistics that prune scans for
range predicates on both columns at once.

No reference counterpart (docling has no storage-layout code); the
technique is the standard Morton encoding used by Delta Lake's
OPTIMIZE ZORDER and Databricks' liquid clustering precursor (public
docs) and by every spatial index since Orenstein & Merrett 1984 ("A
class of data structures for associative searching", PODS).

Scale shape (100 TB): one single-row min/max aggregate (broadcast back
as scalar stats — the accepted 1-row pattern), then the Z-value is a
pure zero-shuffle Catalyst projection (bit arithmetic only, stays in
whole-stage codegen); the per-file stats are one hash aggregation on
``n_files`` keys. A production writer would follow with
``repartitionByRange(n_files, zval)`` + write — range boundaries from
the built-in sampling — so no global sort is ever materialized. The
linear value→grid normalization here keeps the whole pipeline
integer-exact and SQL-replayable; Delta's rank-based range IDs are the
sampling-based variant of the same normalization and slot in by
swapping ``_scale``.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interleave(sa, sb, bits: int):
    """Morton code: bit i of ``sa`` → bit 2i+1, bit i of ``sb`` →
    bit 2i (column a owns the high bit of each pair)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(
            F.shiftright(sa, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        z = z.bitwiseOR(F.shiftleft(
            F.shiftright(sb, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def zorder_file_stats(df: DataFrame, col_a: str, col_b: str, *,
                      bits: int = 16, n_files: int = 64) -> DataFrame:
    """Assign each row a Z-value over (col_a, col_b) and summarize the
    resulting ``n_files`` uniform Z-range buckets: per file, row count
    and min/max of both columns — exactly the footer statistics a
    scan planner would prune on.

    Both columns must be integral (cast upstream; timestamps →
    epoch seconds, decimals → e4 fixed-point). Normalization is linear
    min/max → [0, 2^bits); ties in degenerate ranges collapse to 0.
    Supported range: (value - min) * (2^bits - 1) is computed in
    non-ANSI long arithmetic, so the per-column spread max - min must
    stay below 2^63 / (2^bits - 1) (~1.4e14 at the default 16 bits)
    or the scaled key silently wraps; re-scale wider domains upstream.

    Output: file_id, n_rows, min_a, max_a, min_b, max_b.
    """
    a = df[col_a].cast("long")
    b = df[col_b].cast("long")
    stats = df.agg(
        F.min(a).alias("_amin"), F.max(a).alias("_amax"),
        F.min(b).alias("_bmin"), F.max(b).alias("_bmax"))
    grid = (1 << bits) - 1
    # integer DIV has no Column-API spelling, so the quotient stays in
    # F.expr — but only over internal aliases (_a/_b/_amin/...), never
    # interpolated user column names (dots/spaces would break parsing)
    scaled = (df.withColumn("_a", a).withColumn("_b", b)
              .crossJoin(F.broadcast(stats))
              .withColumn("_sa", F.expr(
                  f"(_a - _amin) * {grid} DIV "
                  f"greatest(_amax - _amin, 1)"))
              .withColumn("_sb", F.expr(
                  f"(_b - _bmin) * {grid} DIV "
                  f"greatest(_bmax - _bmin, 1)")))
    zval = _interleave(F.col("_sa"), F.col("_sb"), bits)
    with_file = scaled.withColumn(
        "file_id", F.shiftright(zval * n_files, 2 * bits).cast("int"))
    return (with_file.groupBy("file_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min(a).alias("min_a"), F.max(a).alias("max_a"),
                 F.min(b).alias("min_b"), F.max(b).alias("max_b")))


def zorder_oracle_sql(table_expr: str, col_a: str, col_b: str, *,
                      bits: int = 16, n_files: int = 64) -> str:
    """The DuckDB replay of zorder_file_stats, generated from the SAME
    bit loop so the two engines stay symmetric by construction."""
    grid = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"(((sa >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((sb >> {i}) & 1) << {2 * i})")
    z = " | ".join(terms)
    return f"""
WITH src AS ({table_expr}),
st AS (SELECT min(a) AS amin, max(a) AS amax,
              min(b) AS bmin, max(b) AS bmax FROM src),
scaled AS (
  SELECT a, b,
         (a - amin) * {grid} // greatest(amax - amin, 1) AS sa,
         (b - bmin) * {grid} // greatest(bmax - bmin, 1) AS sb
  FROM src CROSS JOIN st),
zed AS (SELECT a, b, ({z}) AS zval FROM scaled)
SELECT CAST((zval * {n_files}) >> {2 * bits} AS INT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(a) AS min_a, max(a) AS max_a,
       min(b) AS min_b, max(b) AS max_b
FROM zed GROUP BY 1
"""
