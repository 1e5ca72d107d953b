"""Session tuning for payload-bearing (fat binary column) tables.

Two batch-size knobs dominate single-node throughput when rows carry
~20 kB audio payloads, and both default to row counts sized for narrow
rows:

* ``spark.sql.parquet.columnarReaderBatchSize`` (default 4096): rows per
  on-heap column-vector batch in the vectorized parquet reader.  At
  4096 × 20 kB that is ~80 MB of vector churn per task; 1024 (~20 MB)
  measured 3-7× faster and stable on the 221k-row bench pipeline.
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10000): rows
  per Arrow record batch shipped to Python workers for pandas UDFs /
  mapInPandas.  At 10000 × 20 kB that is ~200 MB in flight per batch on
  BOTH sides of the socket; 1024 measured 3.2× faster on the decode+SNR
  job (interleaved A/B best-of-3: 5.0 s → 1.6 s, worst rep 20 s → 3.5 s)
  — same rows, same kernels, smaller transfer+materialization quanta.

Rule of thumb for both: ``batch_rows ≈ 16–32 MB / avg_row_bytes``.

A third, WRITER-side rule governs scan parallelism downstream: parquet
row groups must be sized by bytes (~32 MB for payload tables), never by
a row count tuned for narrow rows.  A row group is assigned entirely to
the Spark task owning its byte-range midpoint, so a file written as one
~260 MB group is scanned by ONE task regardless of
``spark.sql.files.maxPartitionBytes`` — measured 2.4× on the
micro-batched stream bench before fixture chunks switched to byte-sized
groups (``fixtures.write_changelog_chunk``).  Iceberg analog for the
production changelog table: ``write.parquet.row-group-size-bytes``.

These are advisory and session-scoped: the engine's operators never set
them behind the caller's back.  Call :func:`apply_payload_tuning` on a
session (the Arrow knob is runtime-settable; the parquet knob must be on
the builder or set before the first scan), or splice
:data:`PAYLOAD_SESSION_CONFS` into your builder.
"""

from __future__ import annotations

#: builder-level confs for payload-bearing tables (~20 kB rows)
PAYLOAD_SESSION_CONFS: dict[str, str] = {
    "spark.sql.parquet.columnarReaderBatchSize": "1024",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
}

#: writer-side row-group target for payload-bearing parquet outputs.
#: ``DataFrameWriter.option("parquet.block.size", ...)`` reaches the
#: Hadoop ParquetOutputFormat for that one write (Spark merges write
#: options into the job's Hadoop conf), so every payload-bearing output
#: the engine writes — envelopes, pending, quarantine, corpus segments,
#: the applied table — stays splittable for whoever scans it next.
PAYLOAD_ROW_GROUP_BYTES: int = 32 << 20


def payload_write_options(writer, row_group_bytes: int | None = None):
    """Stamp the writer-side payload rule onto a ``DataFrameWriter``.

    Returns the writer with ``parquet.block.size`` set (default
    :data:`PAYLOAD_ROW_GROUP_BYTES`); compose with the caller's own
    ``.mode()`` / ``.option("compression", ...)`` calls."""
    return writer.option(
        "parquet.block.size", str(row_group_bytes or PAYLOAD_ROW_GROUP_BYTES)
    )


def payload_batch_rows(avg_row_bytes: int, target_mb: int = 24) -> int:
    """batch_rows ≈ target MB / avg row bytes, floored to 128."""
    return max(128, (target_mb * 1024 * 1024) // max(avg_row_bytes, 1))


def apply_payload_tuning(spark, avg_row_bytes: int = 20_000) -> None:
    """Set the runtime-settable knobs on an existing session.

    The Arrow batch size takes effect for subsequent pandas-UDF stages;
    the parquet reader batch size is also runtime-settable in Spark 3.x+
    but only affects scans planned after the change.
    """
    rows = payload_batch_rows(avg_row_bytes)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(rows))
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", str(rows))
