"""Schema dynamism: adopt an observed changelog schema at runtime.

Reference behavior being re-expressed:
- `ScyllaSchema.updateChangeSchema` (ScyllaSchema.java:467-472): when a
  change row arrives whose `ChangeSchema` differs from the cached one,
  the connector REPLACES the cached schema with the observed one and
  recomputes the per-collection key/value schemas from it — then keeps
  emitting.
- `ScyllaInconsistentSchemaHandler.handle`
  (ScyllaInconsistentSchemaHandler.java:13-53): the inconsistency hook
  returns the recomputed schema instead of failing; only a null change
  schema (nothing to adopt) yields `Optional.empty` and the record is
  skipped.
- `ScyllaSchema.tableInformationComplete` / `isHistorized`
  (ScyllaSchema.java:474-482) are both false — no schema history store,
  the latest observed schema wins.

Spark-native analog.  A DataFrame's schema is per-plan, not per-row, so
"a row with a different schema" becomes "a file / batch / directory with
a different parquet schema" (the base table was ALTERed, so newer CDC
log segments carry added/dropped columns):

- :func:`model_from_changelog_schema` — derive a :class:`TableModel`
  from an observed changelog StructType (the adoption step);
- :func:`adopt` — updateChangeSchema itself: validate the observed
  schema against the current model's key structure and return the new
  model (latest-wins, like the reference's `cdcRowSchemas.put`);
- :func:`conform_changelog` — project ANY observed changelog DataFrame
  to a model's canonical schema: missing base columns → typed nulls
  (a row written before ALTER TABLE ADD has no value for the new
  column), safe type widenings cast, unknown extras dropped (a row
  written before ALTER TABLE DROP).  Un-adoptable differences (missing
  cdc$ metadata, PK type change, lossy cast) raise
  :class:`SchemaInconsistencyError` — the analog of the reference's
  skip-this-record `Optional.empty`, surfaced eagerly because in Spark
  the whole batch shares the bad schema.

Mixed-era directories read with `spark.read.option("mergeSchema",
"true")` then conform in one pass; a restarted stream re-derives the
model from the source directory and resumes from the same checkpoint
(tests/test_schema_evolution.py::test_stream_restart_adopts_new_schema).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import TableModel

#: the changelog metadata columns every CDC row must carry — a schema
#: without them is not a changelog at all (the reference's null
#: ChangeSchema → skip case).
META_COLUMNS = (
    "cdc$stream_id",
    "cdc$time",
    "cdc$time_us",
    "cdc$operation",
    "cdc$batch_seq_no",
    "generation",
)

_META_PREFIX = "cdc$"


class SchemaInconsistencyError(ValueError):
    """Observed changelog schema cannot be adopted or conformed."""


#: lossless atomic widenings (src → allowed dst simpleStrings).  Anything
#: else is a lossy/semantics-changing cast and raises instead of
#: silently corrupting values.
_WIDENS: dict[str, tuple[str, ...]] = {
    "tinyint": ("smallint", "int", "bigint", "double"),
    "smallint": ("int", "bigint", "double"),
    "int": ("bigint", "double"),
    "bigint": (),
    "float": ("double",),
    "date": ("timestamp",),
    # parquet naive (µs) timestamps infer as TIMESTAMP_NTZ under Spark 4;
    # the engine pins the session timezone to UTC, so the NTZ→TZ cast is a
    # pure reinterpretation of the same instant — lossless by contract
    "timestamp_ntz": ("timestamp",),
}


def _can_widen(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    return dst.simpleString() in _WIDENS.get(src.simpleString(), ())


def model_from_changelog_schema(
    schema: T.StructType,
    *,
    partition_key: tuple[str, ...] = ("clip_id",),
    clustering_key: tuple[str, ...] = (),
) -> TableModel:
    """Derive a TableModel from an observed changelog StructType.

    Inverse of TableModel.changelog_schema(): base columns are the
    non-`cdc$`, non-`generation` fields in file order; `cdc$deleted_*`
    markers are recomputed from the base shape, not read back (the
    reference likewise recomputes collection schemas from the observed
    row schema, ScyllaSchema.java:467-472).
    """
    names = {f.name for f in schema.fields}
    missing_meta = [m for m in META_COLUMNS if m not in names]
    if missing_meta:
        raise SchemaInconsistencyError(
            f"not a changelog schema: missing metadata columns {missing_meta}"
        )
    base = tuple(
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if not f.name.startswith(_META_PREFIX) and f.name != "generation"
    )
    base_names = {n for n, _ in base}
    for k in (*partition_key, *clustering_key):
        if k not in base_names:
            raise SchemaInconsistencyError(
                f"key column {k!r} absent from observed schema — a PK "
                "change is not adoptable (reference skips such rows)"
            )
    return TableModel(
        columns=base,
        partition_key=tuple(partition_key),
        clustering_key=tuple(clustering_key),
    )


def adopt(current: TableModel, observed: T.StructType) -> TableModel:
    """updateChangeSchema: replace `current` with the model derived from
    the observed changelog schema (latest observed wins), keeping the
    key structure — which must survive unchanged, types included."""
    new = model_from_changelog_schema(
        observed,
        partition_key=current.partition_key,
        clustering_key=current.clustering_key,
    )
    for k in current.pk_columns:
        if new.field_type(k) != current.field_type(k):
            raise SchemaInconsistencyError(
                f"key column {k!r} changed type "
                f"{current.field_type(k).simpleString()} → "
                f"{new.field_type(k).simpleString()} — not adoptable"
            )
    return new


def conform_changelog(df: DataFrame, model: TableModel) -> DataFrame:
    """Project an observed changelog DataFrame to `model`'s canonical
    changelog schema.

    - column present with the exact type → passed through;
    - present with a lossless widening → cast;
    - absent base / cdc$deleted_* column → typed null (pre-ALTER rows);
    - absent metadata column → SchemaInconsistencyError (not a changelog);
    - present with a lossy type difference → SchemaInconsistencyError;
    - observed columns not in the model are dropped (post-ALTER-DROP
      history; the latest schema wins, ScyllaSchema.java:469).

    One `select` — no shuffle, stays inside whole-stage codegen, and
    Catalyst still prunes the untouched columns out of the scan.
    """
    have = {f.name: f.dataType for f in df.schema.fields}
    target = model.changelog_schema()
    exprs: list[Column] = []
    for f in target.fields:
        name, want = f.name, f.dataType
        got = have.get(name)
        if got is None:
            if name in META_COLUMNS:
                raise SchemaInconsistencyError(
                    f"not a changelog: metadata column {name!r} missing"
                )
            if name in model.pk_columns:
                raise SchemaInconsistencyError(
                    f"key column {name!r} missing from input"
                )
            exprs.append(F.lit(None).cast(want).alias(name))
        elif got == want:
            exprs.append(F.col(f"`{name}`"))
        elif _can_widen(got, want):
            exprs.append(F.col(f"`{name}`").cast(want).alias(name))
        else:
            raise SchemaInconsistencyError(
                f"column {name!r}: observed {got.simpleString()} cannot "
                f"be losslessly conformed to {want.simpleString()}"
            )
    return df.select(*exprs)
