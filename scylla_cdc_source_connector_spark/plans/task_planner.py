"""S5 task planning: deterministic assignment of CDC streams to worker
tasks, the engine-side analog of the reference's connector-master planning
(ScyllaConnector.taskConfigs:105-120 → TaskConfigBuilder.buildTaskConfigs:
19-46): the sorted stream list is chunked CONTIGUOUSLY into at most
`max_tasks` groups of ceil(n/max_tasks) streams each, so a worker owns a
contiguous, sorted slice of the stream space.

Spark-first framing: Spark's shuffle already hash-assigns partitions to
executors, so the engine does not NEED a planner for load balance — but an
explicit contiguous plan buys what the reference's buys: per-task offset
lineage that survives worker reassignment (a task's stream set is a pure
function of (stream list, max_tasks), not of cluster topology), and
co-location of adjacent streams whose cdc$time windows overlap.

Scale notes (100 TB): the PLAN is metadata — one row per (generation,
stream), ~tens of thousands of rows at 10^12-row-table scale — so the
single-reducer global sort inside `plan_tasks` is bounded and the plan is
broadcast to the data join in `assign_tasks`; the DATA never moves except
the one optional repartition to realize the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_tasks(
    streams: DataFrame, max_tasks: int, order_cols: list[str] | None = None
) -> DataFrame:
    """Chunk the (small) stream table into <= max_tasks contiguous tasks.

    streams: one row per schedulable unit (e.g. distinct (generation,
    cdc$stream_id)); extra columns ride along.  order_cols defaults to all
    of streams' columns — the reference sorts streams by their id
    (SortedSet<StreamId>, TaskConfigBuilder.java:13-17).

    Output: streams' columns + `task_id` (int, 0-based).  The global
    row_number sort runs on ONE reducer by design: the input is metadata
    (see module docstring), never the changelog itself.
    """
    if max_tasks < 1:
        raise ValueError("max_tasks must be >= 1")
    order_cols = order_cols or streams.columns
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    wn = Window.partitionBy(F.lit(1))
    ranked = streams.withColumn("__rk", F.row_number().over(w)).withColumn(
        "__n", F.count("*").over(wn)
    )
    # partitionSize = ceil(n / maxTasks); task = contiguous chunk index
    # (TaskConfigBuilder.java:38-40, Lists.partition semantics)
    part_size = F.ceil(F.col("__n") / F.lit(max_tasks))
    return ranked.withColumn(
        "task_id", F.floor((F.col("__rk") - 1) / part_size).cast("int")
    ).drop("__rk", "__n")


def assign_tasks(
    changelog: DataFrame,
    plan: DataFrame,
    on: list[str],
    repartition: bool = False,
) -> DataFrame:
    """Stamp each changelog row with its planned task_id via a broadcast
    join on the stream-identity columns `on` (the plan is metadata-sized —
    never shuffle the changelog to meet it).

    repartition=True additionally realizes the layout: one output
    partition per task, the moral equivalent of the reference handing each
    worker its serialized stream slice.  Leave False when the next
    operator shuffles anyway (Catalyst would just discard the exchange).
    """
    n_tasks = None
    if repartition:
        n_tasks = plan.agg(F.max("task_id")).first()[0]
        if n_tasks is None:
            raise ValueError("empty task plan")
    out = changelog.join(
        F.broadcast(plan.select(*on, "task_id")), on=on, how="left"
    )
    if repartition:
        out = out.repartition(int(n_tasks) + 1, "task_id")
    return out
