"""Small-file compaction planning — the other half of the lakehouse
``OPTIMIZE`` pair (zorder.py is the clustering half): given a file
listing with sizes, group consecutive files of each table partition
into merge bins of ~``target_bytes`` so a rewrite job turns thousands
of small files into few large ones.

No reference counterpart (docling has no storage code). The binning
rule is offset binning: a file starting at cumulative offset ``o``
joins bin ``o // target_bytes``. This is the parallel-friendly
approximation of sequential greedy packing — identical whenever files
are small relative to the target (the compaction regime), and off by
at most one straddling file per boundary otherwise. Sequential greedy
is a prefix-dependent recurrence (each decision depends on the
running remainder), so it cannot be expressed as a window function;
offset binning is ONE cumulative-sum window per table partition —
Spark's own ``FilePartition`` packing makes the same trade.

Scale shape (100 TB): the window partitions by the TABLE partition
(thousands of independent groups), so no global sort and no skewed
single window; one shuffle for the window, one hash agg for the plan.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_bins(files: DataFrame, *, size_col: str = "bytes",
                    order_col: str = "file_id",
                    part_col: Optional[str] = None,
                    target_bytes: int = 128 * 1024 * 1024,
                    skip_at_least: int = 2) -> DataFrame:
    """Plan merge bins over a file listing.

    Output, one row per (partition, bin): n_files, total bytes,
    first/last file in the bin (rewrite job inputs), and an
    ``eligible`` flag (int 0/1, not boolean — boolean columns diverge
    between engines' result canonicalizers) — bins with fewer than
    ``skip_at_least`` files
    are already compact and the rewrite would be pure write
    amplification, so the planner marks them skipped.
    """
    part = F.col(part_col) if part_col else F.lit("")
    w = (Window.partitionBy(part).orderBy(F.col(order_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sized = (files
             .withColumn("_start",
                         F.sum(F.col(size_col).cast("long")).over(w)
                         - F.col(size_col).cast("long"))
             .withColumn("bin_id",
                         F.expr(f"_start div {int(target_bytes)}")))
    keys = ([part_col] if part_col else []) + ["bin_id"]
    return (sized.groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("long").alias("n_files"),
                 F.sum(F.col(size_col).cast("long")).alias("bytes"),
                 F.min(order_col).alias("first_file"),
                 F.max(order_col).alias("last_file"),
                 (F.count(F.lit(1)) >= skip_at_least)
                 .cast("int").alias("eligible")))
