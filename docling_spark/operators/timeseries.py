"""Time-series completion operators: gap fill, last-observation-
carried-forward, trailing moving aggregates — the TimescaleDB
`time_bucket_gapfill`/`locf`/moving-window family, batch-declarative.

Scale shape: the raw event table is reduced FIRST by one
map-side-combinable groupBy to (key, slot) granularity; every later
step (grid synthesis, LOCF window, trailing frame) runs on the
aggregated grid, whose size is keys × slots — bounded by the sketch of
the data, not the data. The per-key windows therefore order at most
`n_slots` rows regardless of event volume. Slots are integer epoch
seconds end-to-end (no timestamp-zone round-trips — a cross-engine
trap; render to timestamps at the edge if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_filled_series(events: DataFrame, *, key_col: str,
                      ts_col: str = "ts", value_col: str = "value",
                      step_s: int = 3600,
                      trailing_slots: int = 24) -> DataFrame:
    """(key, ts, value) events → a DENSE per-key slot grid:

    * ``slot_epoch`` — step-aligned epoch seconds, every slot between
      the corpus-wide min and max present for every key (gap fill);
    * ``n_events`` — events in the slot (0 for gaps);
    * ``sum_value_e2`` — slot value sum ×100 (NULL for gaps);
    * ``locf_value_e2`` — last non-empty slot's sum carried forward
      (NULL until a key's first observation);
    * ``ma_value_e2`` — trailing mean over ``trailing_slots`` slots
      (gaps count as 0), floored — integer arithmetic over the
      already-quantized slot sums, so the window math is
      order-independent and engine-exact.
    """
    us_per_slot = step_s * 1_000_000
    slot = (F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                    / F.lit(us_per_slot)) * step_s).cast("long")
    agg = (events
           .select(F.col(key_col).alias("key"), slot.alias("slot_epoch"),
                   F.col(value_col).alias("v"))
           .groupBy("key", "slot_epoch")
           .agg(F.count("*").alias("n_events"),
                F.floor(F.sum("v") * 100).cast("long")
                .alias("sum_value_e2")))

    bounds = agg.agg(F.min("slot_epoch").alias("lo"),
                     F.max("slot_epoch").alias("hi"))
    keys = agg.select("key").distinct()
    grid = (keys.crossJoin(F.broadcast(bounds))
            .select("key",
                    F.explode(F.sequence(
                        F.col("lo"), F.col("hi"),
                        F.lit(step_s).cast("long"))).alias("slot_epoch")))

    j = grid.join(agg, ["key", "slot_epoch"], "left")
    w = Window.partitionBy("key").orderBy("slot_epoch")
    locf = F.last("sum_value_e2", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    trail = w.rowsBetween(-(trailing_slots - 1), Window.currentRow)
    ma = F.floor(
        F.sum(F.coalesce("sum_value_e2", F.lit(0))).over(trail)
        / F.lit(trailing_slots)).cast("long")
    return (j.select(
        F.col("key").alias(key_col), "slot_epoch",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "sum_value_e2",
        locf.alias("locf_value_e2"),
        ma.alias("ma_value_e2")))


def flag_anomalies(grid: DataFrame, *, key_col: str,
                   trailing_slots: int = 24,
                   factor_e2: int = 200) -> DataFrame:
    """Threshold anomaly detection over a :func:`gap_filled_series`
    grid: flag a slot when its value exceeds ``factor_e2``/100 × the
    trailing mean of the PRECEDING ``trailing_slots`` slots (current
    slot excluded — a spike must not dampen its own baseline; gaps
    count as 0). All comparisons are integer cross-multiplications of
    the already-quantized slot sums, so the flags replay exactly in
    any engine. Slots with no preceding history are never flagged.

    Returns (key, slot_epoch, sum_value_e2, baseline_e2, anomaly).
    """
    w = (Window.partitionBy(key_col).orderBy("slot_epoch")
         .rowsBetween(-trailing_slots, -1))
    s = F.coalesce("sum_value_e2", F.lit(0))
    trail_sum = F.sum(s).over(w)
    trail_n = F.count(F.lit(1)).over(w)
    baseline = F.floor(trail_sum / F.greatest(trail_n, F.lit(1))) \
        .cast("long")
    # s > (factor/100)·(trail_sum/trail_n)  ⇔  100·n·s > factor·sum
    anomaly = ((trail_n > 0)
               & (s * 100 * trail_n > F.lit(factor_e2) * trail_sum))
    return grid.select(
        key_col, "slot_epoch", "sum_value_e2",
        baseline.alias("baseline_e2"),
        anomaly.cast("int").alias("anomaly"))


def interpolate_series(grid: DataFrame, *, key_col: str) -> DataFrame:
    """Linear interpolation across gaps in a :func:`gap_filled_series`
    grid — the TimescaleDB ``interpolate()`` companion to LOCF: an
    empty slot between two observed slots takes the linear blend of
    their values; slots before the first / after the last observation
    stay NULL. The blend is computed as an integer rational
    floor(prev + (next − prev)·(t − tp)/(tn − tp)) over the quantized
    slot sums, so it replays exactly in any engine.

    Two windows per key (previous/next observed slot), both over the
    aggregated grid — slot counts, not event counts.
    """
    w = Window.partitionBy(key_col).orderBy("slot_epoch")
    prev_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    next_w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_slot = F.when(F.col("sum_value_e2").isNotNull(),
                      F.col("slot_epoch"))
    pv = F.last("sum_value_e2", ignorenulls=True).over(prev_w)
    pt = F.last(obs_slot, ignorenulls=True).over(prev_w)
    nv = F.first("sum_value_e2", ignorenulls=True).over(next_w)
    nt = F.first(obs_slot, ignorenulls=True).over(next_w)
    interp = (F.when(F.col("sum_value_e2").isNotNull(),
                     F.col("sum_value_e2"))
              .when(pv.isNotNull() & nv.isNotNull(),
                    F.floor(pv + (nv - pv)
                            * (F.col("slot_epoch") - pt) / (nt - pt))
                    .cast("long")))
    return grid.select(key_col, "slot_epoch", "sum_value_e2",
                       interp.alias("interp_value_e2"))
