"""User-journey transition matrix (__spark_entry__.q_event_transitions
semantics, exercised through the registry)."""

import datetime


def test_transition_counts_and_probs(spark, tmp_path):
    import pyspark.sql.functions as F  # noqa: F401
    from __spark_entry__ import queries

    base = datetime.datetime(2026, 1, 1)
    rows = []
    # user 1: view → click → view ; user 2: view → click
    for i, et in enumerate(["view", "click", "view"]):
        rows.append((i, base + datetime.timedelta(minutes=i), 1, et,
                     0.0, "{}"))
    for i, et in enumerate(["view", "click"]):
        rows.append((10 + i, base + datetime.timedelta(minutes=i), 2,
                     et, 0.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")
    out = {(r["src_type"], r["dst_type"]): (r["n"], r["p_e6"])
           for r in queries()["event_transitions"](spark, sf).collect()}
    # transitions: view→click ×2, click→view ×1
    assert out[("view", "click")] == (2, 1_000_000)
    assert out[("click", "view")] == (1, 1_000_000)
    assert len(out) == 2
