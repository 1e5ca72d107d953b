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


BLOB_TYPE_MG = "mg-heavy-v1"
DEFAULT_MG = 64


def mg_merge(pairs_blobs: list[bytes], m: int):
    """Merge Misra-Gries summaries (LE-uint64 [hash, count] pairs): sum
    counts per hash, then one MG truncation back to capacity m.  The
    merged summary keeps the MG guarantee with additive error (classic
    mergeable-summaries result): reported count <= true count <=
    reported + total_rows/(m+1)."""
    import numpy as np

    hs, cs = [], []
    for b in pairs_blobs:
        a = np.frombuffer(b, dtype="<u8").reshape(-1, 2)
        hs.append(a[:, 0])
        cs.append(a[:, 1].astype(np.int64))
    if not hs:
        return np.zeros((0, 2), dtype=np.uint64)
    return _mg_truncate(np.concatenate(hs), np.concatenate(cs), m)


def _mg_truncate(h, c, m):
    """Sum duplicate hashes, then subtract the (m+1)-th largest count so
    at most m entries survive (the weighted Misra-Gries decrement)."""
    import numpy as np

    uh, inv = np.unique(h, return_inverse=True)
    uc = np.bincount(inv, weights=c).astype(np.int64)
    if len(uh) > m:
        thresh = np.partition(uc, len(uc) - m - 1)[len(uc) - m - 1]
        keep = uc > thresh
        uh, uc = uh[keep], uc[keep] - thresh
    order = np.argsort(uc)[::-1]
    out = np.empty((len(uh), 2), dtype=np.uint64)
    out[:, 0] = uh[order]
    out[:, 1] = uc[order].astype(np.uint64)
    return out


def _kmv_partition_udf(cols: list[str], k: int, m: int | None = None):
    """mapInPandas kernel: per partition, per column, rows
    (col, kind, sketch) with
      kind="kmv"  — the K smallest DISTINCT unsigned xxhash64 values
                    (one LE-uint64 blob),
      kind="mg"   — a capacity-m Misra-Gries heavy-hitter summary over
                    the same hashes (LE-uint64 [hash, count] pairs;
                    emitted only when m is set),
      kind="rows" — the partition's non-null row count (8-byte LE).
    NULLs are excluded (NDV counts values, not rows); the signed JVM
    hash maps to unsigned by +2^63 so order is preserved.  Everything is
    batch-vectorized (unique + bincount + partition); state per column
    is O(k + m) no matter how many rows the partition holds."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        sent = np.int64(_NULL_SENTINEL)
        acc: dict[str, list] = {c: [] for c in cols}
        mg_h = {c: np.zeros(0, dtype=np.uint64) for c in cols}
        mg_c = {c: np.zeros(0, dtype=np.int64) for c in cols}
        nrows = {c: 0 for c in cols}
        for pdf in batches:
            for c in cols:
                v = pdf[c].to_numpy(dtype=np.int64, copy=False)
                v = v[v != sent]
                if not len(v):
                    continue
                u = v.astype(np.uint64) + np.uint64(1 << 63)
                nrows[c] += len(u)
                acc[c].append(u)
                # compress to bottom-k after EVERY batch: the bottom-k of
                # a union equals the bottom-k of per-part bottom-ks, so
                # worker memory stays O(k) per column no matter how many
                # rows the partition holds
                if len(acc[c]) > 1 or len(acc[c][0]) > k:
                    acc[c] = [np.unique(np.concatenate(acc[c]))[:k]]
                if m is not None:
                    bu, binv = np.unique(u, return_inverse=True)
                    bc = np.bincount(binv).astype(np.int64)
                    merged = _mg_truncate(
                        np.concatenate([mg_h[c], bu]),
                        np.concatenate([mg_c[c], bc]),
                        m,
                    )
                    mg_h[c], mg_c[c] = (
                        merged[:, 0],
                        merged[:, 1].astype(np.int64),
                    )
        out = {"col": [], "kind": [], "sketch": []}
        for c in cols:
            u = (
                np.unique(np.concatenate(acc[c]))[:k]
                if acc[c]
                else np.array([], dtype=np.uint64)
            )
            out["col"].append(c)
            out["kind"].append("kmv")
            out["sketch"].append(u.astype("<u8").tobytes())
            out["col"].append(c)
            out["kind"].append("rows")
            out["sketch"].append(
                np.uint64(nrows[c]).astype("<u8").tobytes()
            )
            if m is not None:
                pairs = np.empty((len(mg_h[c]), 2), dtype=np.uint64)
                pairs[:, 0] = mg_h[c]
                pairs[:, 1] = mg_c[c].astype(np.uint64)
                out["col"].append(c)
                out["kind"].append("mg")
                out["sketch"].append(pairs.astype("<u8").tobytes())
        yield pd.DataFrame(out)

    return gen


def compute_table_stats(
    spark,
    location: str,
    *,
    columns: list[str] | None = None,
    k: int = DEFAULT_K,
    heavy_capacity: int | None = DEFAULT_MG,
) -> dict:
    """The jar's `compute_table_stats` procedure: one pass over the
    CURRENT snapshot computing, per column, a bottom-k NDV sketch AND a
    capacity-m Misra-Gries heavy-hitter summary (the skew detector: max
    key frequency within rows/(m+1) additive error), written as one
    Puffin file under metadata/ and registered in table metadata's
    `statistics` field (replacing any prior entry for the same snapshot;
    older-snapshot entries are kept — the spec allows one entry per
    snapshot).  Returns {snapshot_id, path, ndv: {col: estimate},
    rows: {col: non-null count}, top_count: {col: heaviest-key lower
    bound}}.  heavy_capacity=None skips the MG side.

    Plan: JVM-side xxhash64 projection (payload bytes never reach
    Python) → one mapInPandas pass → driver-side K/m-sized merges.  No
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
        _kmv_partition_udf(cols, k, heavy_capacity),
        "col string, kind string, sketch binary",
    ).collect()
    import numpy as np

    parts: dict[tuple, list[bytes]] = {}
    for r in rows:
        parts.setdefault((r["col"], r["kind"]), []).append(bytes(r["sketch"]))
    blobs, ndv, nrows, top = [], {}, {}, {}
    for c in cols:
        merged = kmv_merge(parts.get((c, "kmv"), []), k)
        est = kmv_estimate(merged, k)
        ndv[c] = est
        nrows[c] = int(
            sum(
                np.frombuffer(b, dtype="<u8")[0]
                for b in parts.get((c, "rows"), [])
            )
        )
        blobs.append(
            {
                "type": BLOB_TYPE_KMV,
                "fields": [by_name[c]],
                "snapshot_id": snap["snapshot-id"],
                "sequence_number": snap["sequence-number"],
                "payload": merged.astype("<u8").tobytes(),
                "properties": {
                    "ndv": str(est),
                    "k": str(k),
                    "rows": str(nrows[c]),
                },
            }
        )
        if heavy_capacity is not None:
            hh = mg_merge(parts.get((c, "mg"), []), heavy_capacity)
            top[c] = int(hh[0, 1]) if len(hh) else 0
            blobs.append(
                {
                    "type": BLOB_TYPE_MG,
                    "fields": [by_name[c]],
                    "snapshot_id": snap["snapshot-id"],
                    "sequence_number": snap["sequence-number"],
                    "payload": hh.astype("<u8").tobytes(),
                    "properties": {
                        "capacity": str(heavy_capacity),
                        "rows": str(nrows[c]),
                        "top_count": str(top[c]),
                    },
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
    return {
        "snapshot_id": snap["snapshot-id"],
        "path": path,
        "ndv": ndv,
        "rows": nrows,
        "top_count": top,
    }


def heavy_hitters(location: str, column: str, *, strict: bool = False) -> dict:
    """Read back a column's Misra-Gries heavy-hitter summary from the
    registered Puffin file: {snapshot_id, stale, rows, error_bound,
    hitters: [(hash, count_lower_bound), ...] sorted desc}.  True count
    of any key is within [count, count + error_bound]; a key absent from
    the summary has true count <= error_bound.  Hashes (not values) are
    reported — magnitude is what a salting decision needs."""
    import numpy as np

    entry, stale, schema = _resolve_stats_entry(location, strict)
    fid = next(
        (f["id"] for f in schema["fields"] if f["name"] == column), None
    )
    if fid is None:
        raise ValueError(f"no column {column!r} in schema")
    pf = read_puffin(entry["statistics-path"])
    blob = next(
        (
            b
            for b in pf["blobs"]
            if b["type"] == BLOB_TYPE_MG and b["fields"] == [fid]
        ),
        None,
    )
    if blob is None:
        raise ValueError(
            f"no heavy-hitter summary for {column!r} (computed with "
            "heavy_capacity=None?)"
        )
    pairs = np.frombuffer(blob["payload"], dtype="<u8").reshape(-1, 2)
    rows = int(blob["properties"]["rows"])
    m = int(blob["properties"]["capacity"])
    return {
        "snapshot_id": entry["snapshot-id"],
        "stale": stale,
        "rows": rows,
        "error_bound": rows // (m + 1),
        "hitters": [(int(h), int(c)) for h, c in pairs],
    }



def _resolve_stats_entry(location: str, strict: bool):
    """Shared staleness policy for every statistics reader: the entry for
    the CURRENT snapshot when present, else (stale) the newest recorded
    entry — newest by snapshot id, which this writer assigns sequentially
    (id == sequence number).  strict=True refuses stale.  Returns
    (entry, stale, schema-dict)."""
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
    return entry, stale, md["schemas"][md["current-schema-id"]]


def ndv_estimates(location: str, *, strict: bool = False) -> dict:
    """Read back the current snapshot's NDV estimates from the registered
    Puffin file (footer `ndv` properties — the same field other engines
    consume; no payload parse needed).  Stats recorded for an OLDER
    snapshot are stale: returned with {"stale": True} by default, refused
    with strict=True (the caller's freshness policy, not ours)."""
    entry, stale, schema = _resolve_stats_entry(location, strict)
    pf = read_puffin(entry["statistics-path"])
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
