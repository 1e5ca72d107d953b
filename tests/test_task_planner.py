"""S5 task planning parity with TaskConfigBuilder.buildTaskConfigs:19-46:
contiguous chunks of ceil(n/maxTasks) over the sorted stream list."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_cdc_source_connector_spark.plans.task_planner import (
    assign_tasks,
    plan_tasks,
)


def _streams(spark, ids):
    return spark.createDataFrame([(s,) for s in ids], "stream string")


def test_contiguous_chunking_matches_reference(spark):
    # 8 streams, maxTasks=3 -> partitionSize=ceil(8/3)=3 -> [3,3,2]
    plan = plan_tasks(_streams(spark, [f"s{i}" for i in range(8)]), 3)
    got = {r["stream"]: r["task_id"] for r in plan.collect()}
    assert got == {
        "s0": 0, "s1": 0, "s2": 0,
        "s3": 1, "s4": 1, "s5": 1,
        "s6": 2, "s7": 2,
    }


def test_more_tasks_than_streams(spark):
    # partitionSize=1: every stream its own task, <= maxTasks used
    plan = plan_tasks(_streams(spark, ["a", "b"]), 10)
    got = sorted(r["task_id"] for r in plan.collect())
    assert got == [0, 1]


def test_plan_is_input_order_insensitive(spark):
    shuffled = plan_tasks(_streams(spark, ["s3", "s0", "s2", "s1"]), 2)
    got = {r["stream"]: r["task_id"] for r in shuffled.collect()}
    assert got == {"s0": 0, "s1": 0, "s2": 1, "s3": 1}


def test_assign_tasks_stamps_and_repartitions(spark):
    rows = [(f"s{i % 4}", i) for i in range(40)]
    data = spark.createDataFrame(rows, "stream string, v long")
    plan = plan_tasks(data.select("stream").distinct(), 2)
    out = assign_tasks(data, plan, ["stream"], repartition=True)
    assert out.rdd.getNumPartitions() == 2
    per_task = {
        r["task_id"]: r["n"]
        for r in out.groupBy("task_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_task == {0: 20, 1: 20}
    # every row of a stream lands on exactly one task
    spread = (
        out.groupBy("stream")
        .agg(F.countDistinct("task_id").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert spread == 1
