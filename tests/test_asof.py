"""As-of join: hand-built timelines (inclusive/strict, ties, missing
matches) and the no-join-node plan contract."""

import datetime

from pyspark.sql import functions as F

from docling_spark.operators.asof import asof_join


def _t(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(100, 1, _t(5)), (101, 1, _t(10)), (102, 1, _t(2)),
         (103, 2, _t(5))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, 1, _t(3), 30.0), (2, 1, _t(5), 50.0), (3, 1, _t(7), 70.0),
         (4, 3, _t(1), 10.0)],
        "event_id long, user_id long, ts timestamp, value double")

    out = {r["event_id"]: r for r in
           asof_join(left, right, right_cols=["event_id", "value"],
                     prefix="m_").collect()}
    # t=5: inclusive -> the t=5 right row wins over t=3
    assert out[100]["m_event_id"] == 2 and out[100]["m_value"] == 50.0
    # t=10: latest right at t=7
    assert out[101]["m_event_id"] == 3
    # t=2: no right row yet -> NULLs
    assert out[102]["m_event_id"] is None and out[102]["m_value"] is None
    # user 2 has no right rows at all -> NULLs
    assert out[103]["m_event_id"] is None

    strict = {r["event_id"]: r for r in
              asof_join(left, right, right_cols=["event_id"],
                        prefix="m_", inclusive=False).collect()}
    # strict: t=5 left must NOT see the t=5 right row
    assert strict[100]["m_event_id"] == 1


def test_asof_tie_on_right_ts_takes_greatest_tie_col(spark):
    left = spark.createDataFrame(
        [(9, 1, _t(6))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, 1, _t(4), 1.0), (2, 1, _t(4), 2.0)],
        "event_id long, user_id long, ts timestamp, value double")
    r = asof_join(left, right, right_cols=["value"]).collect()[0]
    assert r["asof_value"] == 2.0  # greatest event_id at the tied ts


def test_asof_plan_has_no_join(spark):
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("event_id", "user_id",
                  F.col("ts").cast("timestamp").alias("ts"), "value",
                  "event_type"))
    left = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    right = ev.filter(F.col("event_type") == "view").drop("event_type")
    out = asof_join(left, right, right_cols=["value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan     # union + window, never a range join
    assert "Window" in plan
    assert plan.count("Exchange") <= 2  # one per union branch at most


def test_range_join_semantics_and_overlaps(spark):
    from docling_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 25.0), (4, 99.0)],
        "pid long, v double")
    iv = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 10.0, 20.0), (2, 5.0, 30.0)],
        "band long, lo double, hi double")
    # inclusive ends: point 2 (v=10) matches bands 0, 1 AND 2
    out = range_join(points, iv, point_col="v", start_col="lo",
                     end_col="hi", bucket_width=10.0)
    got = sorted((r["pid"], r["band"]) for r in out.collect())
    assert got == [(1, 0), (1, 2), (2, 0), (2, 1), (2, 2), (3, 2)]
    # half-open: v=10 no longer matches band 0's end
    out2 = range_join(points, iv, point_col="v", start_col="lo",
                      end_col="hi", bucket_width=10.0,
                      end_inclusive=False)
    got2 = sorted((r["pid"], r["band"]) for r in out2.collect())
    assert got2 == [(1, 0), (1, 2), (2, 1), (2, 2), (3, 2)]
    # point 4 (v=99) is outside every interval in both modes


def test_range_join_is_hash_equijoin(spark):
    from docling_spark.operators.asof import range_join

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("event_id", "value"))
    nat = (spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
           .select(F.col("n_nationkey").alias("band"),
                   (F.col("n_nationkey") * 20.0).alias("lo"),
                   ((F.col("n_nationkey") + 1) * 20.0).alias("hi")))
    out = range_join(ev, nat, point_col="value", start_col="lo",
                     end_col="hi", bucket_width=20.0,
                     end_inclusive=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan  # broadcast or shuffled — but hashed
