"""Point-in-time (as-of) join — the classic time-series operator Spark
has no built-in for (DuckDB: ASOF JOIN; kdb: aj; Flink: temporal
join): each left row picks the latest right row at-or-before its
timestamp within its key.

Spark-first spelling: TAG + UNION + carry-forward window — no join
node at all. Both streams union into one (key, ts)-ordered stream and
a ``last(..., ignorenulls=True)`` running window carries the most
recent right payload into every left row. ONE shuffle on the key
(the window), versus the naive range join (``l.ts >= r.ts`` then
max-per-left), which Catalyst executes as a per-key cross product —
O(L×R) per key before its filter, a scale-killer on busy keys.

Determinism: at equal timestamps the right row sorts BEFORE the left
row (``inclusive=True``; flip for strict "before"), and right rows
tied on (key, ts) resolve by the ``tie`` column — the greatest one
wins (it sorts last, and the carry takes the last seen).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *,
              on: str = "user_id", ts: str = "ts",
              tie: str = "event_id",
              right_cols: List[str],
              prefix: str = "asof_",
              inclusive: bool = True) -> DataFrame:
    """Each ``left`` row gains ``{prefix}<col>`` for every entry of
    ``right_cols``, taken from the right row with the greatest
    ``ts`` ≤ (or < when ``inclusive=False``) the left row's ``ts``
    within the same ``on`` key; NULLs when no such row exists.

    The right payload rides as ONE struct so a legitimately-NULL right
    column can never desynchronize from its siblings in the carry."""
    lt = left.withColumn("_isr", F.lit(0))
    rcols = list(dict.fromkeys([on, ts, tie, *right_cols]))
    rt = right.select(*rcols).withColumn("_isr", F.lit(1))
    u = lt.unionByName(rt, allowMissingColumns=True)
    payload = F.when(F.col("_isr") == 1,
                     F.struct(*[F.col(c) for c in right_cols]))
    # inclusive: right rows sort before left at equal ts (left sees
    # them); strict: after (left does not)
    isr_order = F.col("_isr").desc() if inclusive else F.col("_isr").asc()
    w = (Window.partitionBy(on)
         .orderBy(F.col(ts).asc(), isr_order, F.col(tie).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (u.withColumn("_r", payload)
               .withColumn("_a", F.last("_r", ignorenulls=True).over(w)))
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col("_a")[c].alias(f"{prefix}{c}") for c in right_cols]
    return carried.filter(F.col("_isr") == 0).select(*out_cols)


def range_join(points: DataFrame, intervals: DataFrame, *,
               point_col: str, start_col: str, end_col: str,
               bucket_width: float,
               end_inclusive: bool = True) -> DataFrame:
    """Interval (range) join: every point row pairs with every
    interval row containing it (``start ≤ p ≤ end``), as an EQUIJOIN.

    Catalyst executes a raw ``p BETWEEN start AND end`` join as
    BroadcastNestedLoop / cross-product-then-filter — O(P×I) per
    partition. This spelling buckets the number line with width
    ``bucket_width``: each interval explodes into the buckets it
    covers, each point maps to one bucket, and the join is a plain
    hash equijoin on the bucket id followed by the exact containment
    filter. Shuffle is keyed and linear; the only amplification is the
    interval explode factor (avg interval length / bucket_width — pick
    the width near the median interval length). Works for numeric or
    epoch-time axes; negative values bucket correctly via floor.
    ``end_inclusive=False`` gives half-open ``[start, end)`` intervals
    — the usual shape for tiling bands, and the one to prefer when
    bounds are derived arithmetic (an inclusive fractional end like
    ``lo + 19.99`` is decimal-vs-double trap territory across
    engines)."""
    iv = intervals.withColumn(
        "_b", F.explode(F.sequence(
            F.floor(F.col(start_col) / bucket_width).cast("long"),
            F.floor(F.col(end_col) / bucket_width).cast("long"))))
    pt = points.withColumn(
        "_b", F.floor(F.col(point_col) / bucket_width).cast("long"))
    upper = (F.col(point_col) <= F.col(end_col) if end_inclusive
             else F.col(point_col) < F.col(end_col))
    return (pt.join(iv, "_b")
            .filter((F.col(point_col) >= F.col(start_col)) & upper)
            .drop("_b"))
