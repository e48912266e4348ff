"""Co-located bucketed joins (lake.py:BucketedTable): the written
bucket layout must eliminate the join shuffle — a plan assertion,
because at 100 TB the Exchange IS the cost. Broadcast is disabled in
these tests: at the scale this layout targets, neither side fits in a
broadcast, so SortMergeJoin-over-buckets is the plan under test."""

import shutil
import uuid
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture
def docs_pair(spark, tmp_path):
    from docling_spark.lake import BucketedTable
    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    left = base.select("doc_id", "source")
    right = base.select("doc_id", "n_chars")
    uid = uuid.uuid4().hex[:8]
    ln, rn = f"bt_left_{uid}", f"bt_right_{uid}"
    lt = BucketedTable.write(left, ln, str(tmp_path / "l"),
                             bucket_col="doc_id", n_buckets=8)
    rt = BucketedTable.write(right, rn, str(tmp_path / "r"),
                             bucket_col="doc_id", n_buckets=8)
    yield lt, rt
    for n in (ln, rn):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, docs_pair):
    lt, rt = docs_pair
    with _no_broadcast(spark):
        joined = lt.join_colocated(rt, "doc_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the scans actually use the bucket layout
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 500


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join off plain parquet reads shuffles —
    proving the bucket layout (not planner luck) removed the
    Exchange."""
    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    with _no_broadcast(spark):
        joined = (base.select("doc_id", "source")
                  .join(base.select("doc_id", "n_chars")
                        .repartition(7), "doc_id"))
        assert "Exchange" in _plan(joined)


def test_bucketed_groupby_has_no_exchange(spark, docs_pair):
    """Aggregation on the bucket key also rides the layout: partial
    and final agg collapse into one stage, no shuffle."""
    lt, _ = docs_pair
    agg = lt.read().groupBy("doc_id").agg(F.count("*").alias("n"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 500


def test_overwrite_roundtrip(spark, tmp_path, docs_pair):
    from docling_spark.lake import BucketedTable
    lt, _ = docs_pair
    df = lt.read()
    name = f"bt_ow_{uuid.uuid4().hex[:8]}"
    try:
        BucketedTable.write(df.limit(10), name, str(tmp_path / "ow"),
                            n_buckets=4, mode="overwrite")
        BucketedTable.write(df.limit(20), name, str(tmp_path / "ow2"),
                            n_buckets=4, mode="overwrite")
        assert spark.read.table(name).count() == 20
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
