"""Iceberg REST catalog stub + catalog-bound commits
(sources/iceberg_rest_catalog.py + iceberg_meta.bind_catalog).

The catalog owns the metadata-pointer swap: every commit is a spec-shaped
commitTable call whose requirements (assert-table-uuid,
assert-ref-snapshot-id on main) are checked under the server lock — the
optimistic-concurrency contract that lets two writers share a table.
Reference analog: the connector delegates commit coordination to Kafka
Connect's offset storage (ScyllaConnectorTask.java:153-213)."""

from __future__ import annotations

import os
import threading

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from scylla_cdc_source_connector_spark.sources import iceberg_meta as im
from scylla_cdc_source_connector_spark.sources.iceberg_rest_catalog import (
    CommitConflictError,
    RestCatalog,
    RestCatalogError,
    StubRestCatalog,
)

_SCH = StructType(
    [StructField("k", IntegerType()), StructField("v", StringType())]
)


@pytest.fixture()
def catalog():
    stub = StubRestCatalog()
    try:
        yield RestCatalog(stub.url)
    finally:
        stub.close()


def _table(tmp_root, name):
    loc = f"{tmp_root}/{name}"
    os.makedirs(f"{loc}/data", exist_ok=True)
    im.create_table(loc, _SCH)
    return loc


def _chunk(loc, i, rows=10):
    p = f"{loc}/data/c{i}.parquet"
    ks = list(range(i * rows, (i + 1) * rows))
    pq.write_table(pa.table({"k": ks, "v": [f"x{j}" for j in ks]}), p)
    return p


def test_protocol_basics(tmp_root, catalog):
    c = catalog
    assert c.config() == {"defaults": {}, "overrides": {}}
    c.create_namespace("cdc", {"owner": "engine"})
    assert c.list_namespaces() == ["cdc"]
    with pytest.raises(RestCatalogError) as ei:
        c.create_namespace("cdc")
    assert ei.value.code == 409

    loc = _table(tmp_root, "cat_basics")
    with pytest.raises(RestCatalogError) as ei:
        c.register_table("nope", "t", f"{loc}/metadata/v1.metadata.json")
    assert ei.value.code == 404  # unknown namespace

    im.bind_catalog(loc, c, "cdc", "clips")
    try:
        assert c.list_tables("cdc") == ["clips"]
        assert c.table_exists("cdc", "clips")
        lt = c.load_table("cdc", "clips")
        assert lt["metadata"]["table-uuid"] == im.current_metadata(loc)[
            "table-uuid"
        ]
        with pytest.raises(RestCatalogError) as ei:
            c.register_table(
                "cdc", "clips", f"{loc}/metadata/v1.metadata.json"
            )
        assert ei.value.code == 409  # duplicate table
        c.drop_table("cdc", "clips")
        assert not c.table_exists("cdc", "clips")
        with pytest.raises(RestCatalogError) as ei:
            c.load_table("cdc", "clips")
        assert ei.value.code == 404
    finally:
        im.unbind_catalog(loc)


def test_bound_commits_advance_catalog_and_files(spark, tmp_root, catalog):
    """append/delete/compact/expire on a bound table all route through
    commitTable; catalog metadata and the file-based readers agree after
    every advance."""
    c = catalog
    loc = _table(tmp_root, "cat_bound")
    im.bind_catalog(loc, c, "cdc", "bound")
    try:
        for i in range(2):
            im.append_files(loc, [_chunk(loc, i)], timestamp_ms=i + 1)
        lt = c.load_table("cdc", "bound")
        assert lt["metadata"]["current-snapshot-id"] == 2
        assert len(lt["metadata"]["snapshots"]) == 2
        assert lt["metadata"] == im.current_metadata(loc)
        assert im.read_table(spark, loc).count() == 20

        # row-level delete + compaction, both as catalog commits
        im.delete_where(spark, loc, "k % 2 = 0", timestamp_ms=3)
        assert im.read_table(spark, loc).count() == 10
        im.compact_table(spark, loc, timestamp_ms=4, sort_by=["k"])
        lt = c.load_table("cdc", "bound")
        assert lt["metadata"]["snapshots"][-1]["summary"]["operation"] == (
            "replace"
        )
        # sorted compaction's add-sort-order/set-default-sort-order
        # round-tripped through the catalog commit
        assert lt["metadata"]["default-sort-order-id"] == 1
        assert lt["metadata"] == im.current_metadata(loc)

        # expiration -> remove-snapshots update
        im.expire_snapshots(loc, keep_last=1)
        lt = c.load_table("cdc", "bound")
        assert len(lt["metadata"]["snapshots"]) == 1
        assert lt["metadata"] == im.current_metadata(loc)
        assert im.read_table(spark, loc).count() == 10

        # schema evolution -> add-schema + set-current-schema
        new_sch = StructType(
            list(_SCH.fields) + [StructField("w", StringType())]
        )
        im.evolve_schema(loc, new_sch)
        lt = c.load_table("cdc", "bound")
        assert lt["metadata"]["current-schema-id"] == 1
        assert len(lt["metadata"]["schemas"]) == 2
        assert lt["metadata"] == im.current_metadata(loc)
    finally:
        im.unbind_catalog(loc)


def test_stale_commit_conflicts_then_retry_converges(spark, tmp_root, catalog):
    """The CAS: a commit built on a superseded base gets 409 and changes
    nothing; the standard retry (re-read, re-commit) converges with both
    writers' snapshots present."""
    c = catalog
    loc = _table(tmp_root, "cat_race")
    im.bind_catalog(loc, c, "cdc", "race")
    try:
        im.append_files(loc, [_chunk(loc, 0)], timestamp_ms=1)
        base = c.load_table("cdc", "race")["metadata"]

        # writer B lands first
        im.append_files(loc, [_chunk(loc, 1)], timestamp_ms=2)

        # writer A commits against the stale base -> 409, no change
        stale_snap = dict(base["snapshots"][-1])
        stale_snap["snapshot-id"] = 99
        stale_snap["sequence-number"] = 99
        with pytest.raises(CommitConflictError):
            c.commit_table(
                "cdc",
                "race",
                requirements=[
                    {
                        "type": "assert-ref-snapshot-id",
                        "ref": "main",
                        "snapshot-id": base["current-snapshot-id"],
                    }
                ],
                updates=[{"action": "add-snapshot", "snapshot": stale_snap}],
            )
        assert c.load_table("cdc", "race")["metadata"][
            "current-snapshot-id"
        ] == 2

        # writer A's retry re-reads fresh state and succeeds
        im.append_files(loc, [_chunk(loc, 2)], timestamp_ms=3)
        md = c.load_table("cdc", "race")["metadata"]
        assert [s["snapshot-id"] for s in md["snapshots"]] == [1, 2, 3]
        assert im.read_table(spark, loc).count() == 30
    finally:
        im.unbind_catalog(loc)


def test_concurrent_writers_no_lost_update(tmp_root, catalog):
    """Two threads appending through the catalog with the retry loop:
    every committed chunk lands exactly once, sequence numbers stay
    unique and dense — no lost update, no clobbered files."""
    c = catalog
    loc = _table(tmp_root, "cat_threads")
    im.bind_catalog(loc, c, "cdc", "threads")
    errors: list[Exception] = []

    def writer(wid: int):
        try:
            for j in range(3):
                p = _chunk(loc, wid * 10 + j)
                for _attempt in range(20):
                    try:
                        im.append_files(loc, [p], timestamp_ms=wid)
                        break
                    except CommitConflictError:
                        continue
                else:  # pragma: no cover
                    raise RuntimeError("retries exhausted")
        except Exception as ex:  # pragma: no cover
            errors.append(ex)

    try:
        ts = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        assert not errors
        md = c.load_table("cdc", "threads")["metadata"]
        seqs = sorted(s["sequence-number"] for s in md["snapshots"])
        assert seqs == list(range(1, 7))
        # every chunk referenced exactly once across all manifests
        assert len(im.live_files(loc)) == 6
        assert md == im.current_metadata(loc)
    finally:
        im.unbind_catalog(loc)


def test_catalog_bound_table_streams(spark, tmp_root, catalog):
    """A table whose commits went through the catalog drains through
    run_iceberg_meta_stream like any other — including incremental
    pickup of a post-drain catalog commit."""
    from scylla_cdc_source_connector_spark.config import (
        EngineConfig,
        IncludeMode,
    )
    from scylla_cdc_source_connector_spark.fixtures import (
        FixtureSpec,
        make_changelog,
        write_changelog_chunk,
    )
    from scylla_cdc_source_connector_spark.schemas import DEFAULT_TABLE
    from scylla_cdc_source_connector_spark.streaming import sink as sink_mod
    from scylla_cdc_source_connector_spark.streaming.engine import (
        run_iceberg_meta_stream,
    )

    c = catalog
    loc = f"{tmp_root}/cat_stream"
    os.makedirs(f"{loc}/data", exist_ok=True)
    im.create_table(loc, DEFAULT_TABLE.changelog_schema())
    im.bind_catalog(loc, c, "cdc", "stream")
    try:
        pdf = make_changelog(FixtureSpec(n_events=600, n_clips=80))
        mid = len(pdf) // 2
        p1, p2 = f"{loc}/data/s0.parquet", f"{loc}/data/s1.parquet"
        write_changelog_chunk(pdf.iloc[:mid], p1)
        im.append_files(loc, [p1], timestamp_ms=1)
        cfg = EngineConfig(
            include_before=IncludeMode.FULL,
            include_after=IncludeMode.FULL,
            checkpoint_dir=f"{tmp_root}/cat_stream_ckpt",
            output_dir=f"{tmp_root}/cat_stream_out",
            lineage_dir=f"{tmp_root}/cat_stream_lineage",
        )
        run_iceberg_meta_stream(spark, cfg, loc)
        n1 = sink_mod.read_emitted(spark, cfg).count()
        assert n1 > 0

        write_changelog_chunk(pdf.iloc[mid:], p2)
        im.append_files(loc, [p2], timestamp_ms=2)  # catalog commit
        run_iceberg_meta_stream(spark, cfg, loc)
        n2 = sink_mod.read_emitted(spark, cfg).count()
        assert n2 > n1
        assert c.load_table("cdc", "stream")["metadata"][
            "current-snapshot-id"
        ] == 2
    finally:
        im.unbind_catalog(loc)


def test_rollback_through_catalog(spark, tmp_root, catalog):
    """rollback_to on a bound table lands as a set-snapshot-ref commit:
    the catalog's pointer, history log and the file reader all agree."""
    c = catalog
    loc = _table(tmp_root, "cat_rollback")
    im.bind_catalog(loc, c, "cdc", "rollback")
    try:
        for i in range(2):
            im.append_files(loc, [_chunk(loc, i)], timestamp_ms=i + 1)
        im.rollback_to(loc, 1, timestamp_ms=9000)
        md = c.load_table("cdc", "rollback")["metadata"]
        assert md["current-snapshot-id"] == 1
        assert md["snapshot-log"][-1]["snapshot-id"] == 1
        assert md == im.current_metadata(loc)
        assert im.read_table(spark, loc).count() == 10
    finally:
        im.unbind_catalog(loc)


def test_refs_through_catalog(spark, tmp_root, catalog):
    """Tag/branch creation and drop on a bound table land as
    set-snapshot-ref / remove-snapshot-ref commits; the server refuses
    remove-snapshots that would orphan a ref-pinned snapshot."""
    c = catalog
    loc = _table(tmp_root, "cat_refs")
    im.bind_catalog(loc, c, "cdc", "refs")
    try:
        for i in range(2):
            im.append_files(loc, [_chunk(loc, i)], timestamp_ms=i + 1)
        im.create_tag(loc, "pin", snapshot_id=1)
        md = c.load_table("cdc", "refs")["metadata"]
        assert md["refs"]["pin"] == {"snapshot-id": 1, "type": "tag"}
        assert md == im.current_metadata(loc)

        # server-side guard: removing a pinned snapshot is a 400
        with pytest.raises(RestCatalogError) as ei:
            c.commit_table(
                "cdc",
                "refs",
                requirements=[],
                updates=[
                    {"action": "remove-snapshots", "snapshot-ids": [1]}
                ],
            )
        assert ei.value.code == 400 and "ref-pinned" in str(ei.value)

        im.drop_ref(loc, "pin")
        md = c.load_table("cdc", "refs")["metadata"]
        assert "pin" not in md.get("refs", {})
        assert md == im.current_metadata(loc)
    finally:
        im.unbind_catalog(loc)
