"""Puffin statistics files + distributed KMV NDV sketches, jarless.

The Iceberg spec's table-statistics side: a *Puffin* container file
(public Puffin spec, https://iceberg.apache.org/puffin-spec/) holding
per-column sketch blobs, registered in table metadata under the spec's
`statistics` field so engines can read NDV (number-of-distinct-values)
estimates for cost-based planning without scanning data.  The reference
connector has no statistics surface (it is a source connector, not a
planner); this exists because the north_rule's 10^12-clip tables make
NDV the difference between a broadcast and a sort-merge join downstream.

Container format implemented per the spec: 4-byte magic "PFA1" at file
start and at footer start, blobs back-to-back, then the footer =
Magic · FooterPayload (UTF-8 JSON) · payload-size (4-byte LE) ·
flags (4 bytes, 0 = uncompressed payload) · Magic.

Blob payloads use a documented local type ``kmv-ndv-v1`` — a sorted
little-endian uint64 array of the K smallest distinct xxhash64 values of
the column (a K-Minimum-Values / bottom-k theta sketch).  We do NOT
claim the DataSketches binary layout (`apache-datasketches-theta-v1`);
matching it bit-for-bit is out of scope here, and engines that consume
Iceberg stats (e.g. Trino) read the ``ndv`` blob *property* from the
footer metadata, which we populate per convention — so the estimate is
interoperable even where the payload is not.

Sketch math: with h_(k) the k-th smallest of the distinct 64-bit hashes
mapped to [0, 2^64), NDV ~= (k-1) * 2^64 / h_(k) (the classic KMV
estimator, Bar-Yossef et al. 2002); when fewer than K distinct hashes
exist the sketch is exhaustive and the count exact.  Merging sketches =
union, dedupe, keep K smallest — the global bottom-k is a subset of the
union of per-partition bottom-ks, which is what makes the one-pass
distributed plan below exact (not approximate) w.r.t. the single-node
sketch.

Scale shape: hashing runs JVM-side (`xxhash64`, whole-stage codegen)
over a slim projection — payload columns never enter the Arrow
boundary; one `mapInPandas` pass emits one bottom-k blob per (column,
partition); the driver merges K-sized arrays (K * n_partitions * 8
bytes — metadata-scale).  ZERO shuffles at any table size.
"""

from __future__ import annotations

import json
import os
import struct
import uuid

MAGIC = b"PFA1"
BLOB_TYPE_KMV = "kmv-ndv-v1"
DEFAULT_K = 2048

# ---------------------------------------------------------------------------
# Puffin container write / read
# ---------------------------------------------------------------------------


def write_puffin(
    path: str,
    blobs: list[dict],
    *,
    properties: dict[str, str] | None = None,
) -> dict:
    """Write a Puffin file.  Each blob dict: {type, fields: [field ids],
    snapshot_id, sequence_number, payload: bytes, properties: {str: str}}.
    Returns {file_size, footer_size} (the numbers the table-metadata
    `statistics` entry needs)."""
    meta = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        for b in blobs:
            off = f.tell()
            f.write(b["payload"])
            meta.append(
                {
                    "type": b["type"],
                    "fields": list(b["fields"]),
                    "snapshot-id": b["snapshot_id"],
                    "sequence-number": b["sequence_number"],
                    "offset": off,
                    "length": len(b["payload"]),
                    "properties": dict(b.get("properties") or {}),
                }
            )
        payload = json.dumps(
            {"blobs": meta, "properties": dict(properties or {})}
        ).encode()
        footer_start = f.tell()
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))
        f.write(struct.pack("<i", 0))  # flags: uncompressed footer
        f.write(MAGIC)
        end = f.tell()
    return {"file_size": end, "footer_size": end - footer_start}


def read_puffin(path: str) -> dict:
    """Read a Puffin file -> {blobs: [{...metadata, payload: bytes}],
    properties}.  Validates both magics and the footer frame."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != MAGIC or raw[-4:] != MAGIC:
        raise ValueError(f"not a Puffin file: {path}")
    (size,) = struct.unpack("<i", raw[-12:-8])
    (flags,) = struct.unpack("<i", raw[-8:-4])
    if flags != 0:
        raise ValueError("compressed Puffin footers not supported here")
    payload = raw[-12 - size : -12]
    if raw[-12 - size - 4 : -12 - size] != MAGIC:
        raise ValueError(f"corrupt Puffin footer frame: {path}")
    footer = json.loads(payload.decode())
    out = []
    for b in footer["blobs"]:
        out.append(
            {**b, "payload": raw[b["offset"] : b["offset"] + b["length"]]}
        )
    return {"blobs": out, "properties": footer.get("properties", {})}


# ---------------------------------------------------------------------------
# KMV sketch kernel
# ---------------------------------------------------------------------------


def kmv_merge(parts: list[bytes], k: int = DEFAULT_K) -> "np.ndarray":  # noqa: F821
    """Merge bottom-k payloads (sorted LE uint64 arrays): union, dedupe,
    keep the K smallest.  Exact w.r.t. a single global sketch."""
    import numpy as np

    if not parts:
        return np.array([], dtype=np.uint64)
    u = np.unique(np.concatenate([np.frombuffer(p, dtype="<u8") for p in parts]))
    return u[:k].astype(np.uint64)


def kmv_estimate(hashes: "np.ndarray", k: int = DEFAULT_K) -> int:  # noqa: F821
    """NDV from a merged bottom-k array; exact when the sketch is
    exhaustive (fewer than K distinct hashes seen)."""
    n = len(hashes)
    if n == 0:
        return 0
    if n < k:
        return n
    h_k = float(hashes[-1])  # arrays are sorted ascending
    if h_k == 0.0:
        return n
    return int((k - 1) * (2.0**64) / h_k + 0.5)


# ---------------------------------------------------------------------------
# distributed sketch computation + table-metadata registration
# ---------------------------------------------------------------------------


#: JVM-side stand-in for "row is NULL in this column" — int64 max, which
#: maps to the TOP of the unsigned hash range so it can never displace a
#: real bottom-k entry; removed exactly in the kernel.  Keeping the
#: projected column non-nullable is what keeps its pandas dtype int64
#: (a nullable long degrades to float64 and silently rounds hashes
#: beyond 2^53).  A real value hashing to exactly this sentinel is
#: dropped too — a 2^-64 event that perturbs the estimate by at most 1.
_NULL_SENTINEL = (1 << 63) - 1


def _kmv_partition_udf(cols: list[str], k: int):
    """mapInPandas kernel: per partition, per column, the K smallest
    DISTINCT unsigned xxhash64 values as one LE-uint64 blob row.  NULLs
    are excluded (NDV counts values, not rows); the signed JVM hash maps
    to unsigned by +2^63 so order is preserved."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        sent = np.int64(_NULL_SENTINEL)
        acc: dict[str, list] = {c: [] for c in cols}
        for pdf in batches:
            for c in cols:
                v = pdf[c].to_numpy(dtype=np.int64, copy=False)
                v = v[v != sent]
                if len(v):
                    acc[c].append(
                        v.astype(np.uint64) + np.uint64(1 << 63)
                    )
                # compress to bottom-k after EVERY batch: the bottom-k of
                # a union equals the bottom-k of per-part bottom-ks, so
                # worker memory stays O(k) per column no matter how many
                # rows the partition holds
                if len(acc[c]) > 1 or (
                    acc[c] and len(acc[c][0]) > k
                ):
                    acc[c] = [np.unique(np.concatenate(acc[c]))[:k]]
        out_c, out_b = [], []
        for c in cols:
            if acc[c]:
                u = np.unique(np.concatenate(acc[c]))[:k]
            else:
                u = np.array([], dtype=np.uint64)
            out_c.append(c)
            out_b.append(u.astype("<u8").tobytes())
        yield pd.DataFrame({"col": out_c, "sketch": out_b})

    return gen


def compute_table_stats(
    spark,
    location: str,
    *,
    columns: list[str] | None = None,
    k: int = DEFAULT_K,
) -> dict:
    """The jar's `compute_table_stats` procedure: one pass over the
    CURRENT snapshot computing a bottom-k NDV sketch per column, written
    as one Puffin file under metadata/ and registered in table metadata's
    `statistics` field (replacing any prior entry for the same snapshot;
    older-snapshot entries are kept — the spec allows one entry per
    snapshot).  Returns {snapshot_id, path, ndv: {col: estimate}}.

    Plan: JVM-side xxhash64 projection (payload bytes never reach
    Python) → one mapInPandas pass → driver-side K-sized merges.  No
    shuffle, no collect of data rows."""
    from pyspark.sql import functions as F

    from . import iceberg_meta as im

    md = im.current_metadata(location)
    if md["current-snapshot-id"] == -1:
        raise ValueError("table has no current snapshot to analyze")
    snap = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    schema = md["schemas"][md["current-schema-id"]]
    by_name = {f["name"]: f["id"] for f in schema["fields"]}
    df = im.read_table(spark, location)
    # default: every scalar column EXCEPT binary — hashing payload bytes
    # (the audio column) means reading all data bytes; ask for it
    # explicitly (columns=["bytes"]) when the exact-dup rate is wanted
    cols = columns or [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("string", "long", "integer", "short", "byte", "double",
            "float", "boolean", "date", "timestamp")
    ]
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(f"columns not in table schema: {missing}")
    hashed = df.select(
        *[
            F.when(
                F.col(f"`{c}`").isNotNull(), F.xxhash64(F.col(f"`{c}`"))
            )
            .otherwise(F.lit(_NULL_SENTINEL))
            .alias(c)
            for c in cols
        ]
    )
    rows = hashed.mapInPandas(
        _kmv_partition_udf(cols, k), "col string, sketch binary"
    ).collect()
    parts: dict[str, list[bytes]] = {c: [] for c in cols}
    for r in rows:
        parts[r["col"]].append(bytes(r["sketch"]))
    blobs, ndv = [], {}
    for c in cols:
        merged = kmv_merge(parts[c], k)
        est = kmv_estimate(merged, k)
        ndv[c] = est
        blobs.append(
            {
                "type": BLOB_TYPE_KMV,
                "fields": [by_name[c]],
                "snapshot_id": snap["snapshot-id"],
                "sequence_number": snap["sequence-number"],
                "payload": merged.astype("<u8").tobytes(),
                "properties": {"ndv": str(est), "k": str(k)},
            }
        )
    path = os.path.join(
        im._meta_dir(location),
        f"stats-{snap['snapshot-id']:020d}-{uuid.uuid4().hex[:8]}.puffin",
    )
    sizes = write_puffin(path, blobs)
    entry = {
        "snapshot-id": snap["snapshot-id"],
        "statistics-path": path,
        "file-size-in-bytes": sizes["file_size"],
        "file-footer-size-in-bytes": sizes["footer_size"],
        "blob-metadata": [
            {
                "type": b["type"],
                "snapshot-id": b["snapshot_id"],
                "sequence-number": b["sequence_number"],
                "fields": b["fields"],
                "properties": b["properties"],
            }
            for b in blobs
        ],
    }
    md2, base_v = im._load_for_update(location)
    stats = [
        e
        for e in md2.get("statistics", [])
        if e["snapshot-id"] != snap["snapshot-id"]
    ]
    stats.append(entry)
    md2["statistics"] = stats
    im._write_metadata(location, md2, base_v + 1)
    return {"snapshot_id": snap["snapshot-id"], "path": path, "ndv": ndv}


def ndv_estimates(location: str, *, strict: bool = False) -> dict:
    """Read back the current snapshot's NDV estimates from the registered
    Puffin file (footer `ndv` properties — the same field other engines
    consume; no payload parse needed).  Stats recorded for an OLDER
    snapshot are stale: returned with {"stale": True} by default, refused
    with strict=True (the caller's freshness policy, not ours)."""
    from . import iceberg_meta as im

    md = im.current_metadata(location)
    entries = md.get("statistics", [])
    if not entries:
        raise ValueError(f"no statistics recorded for {location}")
    cur = md["current-snapshot-id"]
    entry = next((e for e in entries if e["snapshot-id"] == cur), None)
    stale = entry is None
    if stale:
        if strict:
            raise ValueError(
                "statistics are stale (recorded for snapshot "
                f"{max(e['snapshot-id'] for e in entries)}, current {cur}); "
                "re-run compute_table_stats"
            )
        entry = max(entries, key=lambda e: e["snapshot-id"])
    pf = read_puffin(entry["statistics-path"])
    schema = md["schemas"][md["current-schema-id"]]
    by_id = {f["id"]: f["name"] for f in schema["fields"]}
    ndv = {}
    for b in pf["blobs"]:
        if b["type"] != BLOB_TYPE_KMV or len(b["fields"]) != 1:
            continue
        name = by_id.get(b["fields"][0])
        if name is not None:
            ndv[name] = int(b["properties"]["ndv"])
    return {
        "snapshot_id": entry["snapshot-id"],
        "stale": stale,
        "ndv": ndv,
    }
