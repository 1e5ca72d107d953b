"""Iceberg REST catalog: client protocol + an in-process HTTP stub.

The one jar-gated Iceberg surface round 4 left open was CATALOGS — the
component that owns the "current table metadata" pointer and serializes
commits (the reference connector's output lands in Kafka, but the
Iceberg-facing deployments of this engine need a catalog the moment two
writers share a table).  No Iceberg runtime or catalog service ships in
this sandbox, so — exactly like functions/schema_registry.py does for
the Confluent REST API — this module provides BOTH sides of the public
Iceberg REST Catalog API (https://iceberg.apache.org/rest-catalog-spec/
— the openapi document `rest-catalog-open-api.yaml`):

- `RestCatalog` — the client (stdlib urllib, driver-only: catalog calls
  happen once per commit/load on the driver, never per row or per
  executor — the only shape that survives 1000 executors).
- `StubRestCatalog` — a threading stdlib `http.server` implementing the
  subset the engine exercises:

    GET    /v1/config
    GET    /v1/namespaces                       list
    POST   /v1/namespaces                       create   (409 if exists)
    GET    /v1/namespaces/{ns}                  load     (404)
    GET    /v1/namespaces/{ns}/tables           list
    POST   /v1/namespaces/{ns}/register         register existing table
                                                (metadata-location)
    GET    /v1/namespaces/{ns}/tables/{t}       loadTable (metadata +
                                                metadata-location)
    HEAD   /v1/namespaces/{ns}/tables/{t}       exists
    DELETE /v1/namespaces/{ns}/tables/{t}       drop
    POST   /v1/namespaces/{ns}/tables/{t}       commitTable:
        {"requirements": [...], "updates": [...]} with the spec's
        requirement types `assert-table-uuid` and
        `assert-ref-snapshot-id` (ref "main") enforced under the server
        lock — the optimistic-concurrency CAS — and the update actions
        `add-snapshot`, `set-snapshot-ref`, `remove-snapshots`,
        `add-schema`, `set-current-schema`, `add-sort-order`,
        `set-default-sort-order`, `set-properties`.

Documented deviation from a production REST catalog: the stub applies
updates to its authoritative copy of the table metadata and PERSISTS
the result as the table's next `vN.metadata.json` + `version-hint.text`
(it shares the filesystem with the engine), so every file-based reader
in sources/iceberg_meta.py — read_table, added_files, the snapshot
stream — keeps working unchanged while the catalog owns the pointer
swap.  A production catalog writes metadata to object storage through
its own credentials; the protocol on the wire is the same.

Reference analog: the connector leaves commit coordination to Kafka
Connect's offset storage (ScyllaConnectorTask.java:153-213); here the
catalog plays that role for Iceberg-table output.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib import request as _rq
from urllib.error import HTTPError

_MAIN = "main"


class RestCatalogError(RuntimeError):
    """Non-2xx catalog response; `code` carries the HTTP status."""

    def __init__(self, code: int, message: str) -> None:
        super().__init__(f"{code}: {message}")
        self.code = code


class CommitConflictError(RestCatalogError):
    """409 CommitFailedException analog: a requirement failed — refresh
    table state and retry the commit."""


def _apply_updates(md: dict, updates: list[dict]) -> dict:
    """Apply spec update actions to a table-metadata dict (server side).
    Server-maintained fields (snapshot-log, last-sequence-number,
    last-updated-ms, last-column-id) are recomputed here, matching what
    a production catalog does on commit."""
    md = json.loads(json.dumps(md))  # deep copy
    for u in updates:
        action = u.get("action")
        if action == "add-snapshot":
            snap = u["snapshot"]
            if any(
                s["snapshot-id"] == snap["snapshot-id"] for s in md["snapshots"]
            ):
                raise ValueError(f"snapshot {snap['snapshot-id']} exists")
            md["snapshots"].append(snap)
            md["snapshot-log"].append(
                {
                    "snapshot-id": snap["snapshot-id"],
                    "timestamp-ms": snap.get("timestamp-ms", 0),
                }
            )
            md["last-sequence-number"] = max(
                md["last-sequence-number"], snap["sequence-number"]
            )
            md["last-updated-ms"] = max(
                md["last-updated-ms"], snap.get("timestamp-ms", 0)
            )
        elif action == "set-snapshot-ref":
            name = u.get("ref-name", _MAIN)
            if name == _MAIN:
                # a ref move to an already-logged snapshot (rollback)
                # gets its own history entry; add-snapshot already
                # logged new ones
                log = md["snapshot-log"]
                if not log or log[-1]["snapshot-id"] != u["snapshot-id"]:
                    log.append(
                        {
                            "snapshot-id": u["snapshot-id"],
                            "timestamp-ms": md["last-updated-ms"],
                        }
                    )
                md["current-snapshot-id"] = u["snapshot-id"]
            else:
                md.setdefault("refs", {})[name] = {
                    "snapshot-id": u["snapshot-id"],
                    "type": u.get("type", "branch"),
                }
        elif action == "remove-snapshot-ref":
            name = u["ref-name"]
            if name == _MAIN:
                raise ValueError("cannot remove the main branch")
            md.get("refs", {}).pop(name, None)
        elif action == "remove-snapshots":
            gone = set(u["snapshot-ids"])
            if md["current-snapshot-id"] in gone:
                raise ValueError("cannot remove the current snapshot")
            pinned = {
                r["snapshot-id"] for r in md.get("refs", {}).values()
            } & gone
            if pinned:
                raise ValueError(f"snapshots {sorted(pinned)} are ref-pinned")
            md["snapshots"] = [
                s for s in md["snapshots"] if s["snapshot-id"] not in gone
            ]
            md["snapshot-log"] = [
                e for e in md["snapshot-log"] if e["snapshot-id"] not in gone
            ]
        elif action == "add-schema":
            sch = u["schema"]
            if any(
                s["schema-id"] == sch["schema-id"] for s in md["schemas"]
            ):
                raise ValueError(f"schema {sch['schema-id']} exists")
            md["schemas"].append(sch)
            ids = [f["id"] for f in sch["fields"]]
            md["last-column-id"] = max(md["last-column-id"], *ids)
        elif action == "set-current-schema":
            sid = u["schema-id"]
            if not any(s["schema-id"] == sid for s in md["schemas"]):
                raise ValueError(f"no schema {sid}")
            md["current-schema-id"] = sid
        elif action == "add-sort-order":
            order = u["sort-order"]
            orders = md.setdefault("sort-orders", [])
            if any(o["order-id"] == order["order-id"] for o in orders):
                raise ValueError(f"sort order {order['order-id']} exists")
            orders.append(order)
        elif action == "set-default-sort-order":
            oid = u["sort-order-id"]
            if not any(
                o["order-id"] == oid for o in md.get("sort-orders", [])
            ):
                raise ValueError(f"no sort order {oid}")
            md["default-sort-order-id"] = oid
        elif action == "set-properties":
            md.setdefault("properties", {}).update(u["updates"])
        elif action == "set-statistics":
            # spec: one statistics-file entry per snapshot; setting
            # replaces that snapshot's entry
            entry = u["statistics"]
            sid = u.get("snapshot-id", entry["snapshot-id"])
            stats = [
                e
                for e in md.get("statistics", [])
                if e["snapshot-id"] != sid
            ]
            stats.append(entry)
            md["statistics"] = stats
        elif action == "remove-statistics":
            md["statistics"] = [
                e
                for e in md.get("statistics", [])
                if e["snapshot-id"] != u["snapshot-id"]
            ]
        else:
            raise ValueError(f"unsupported update action {action!r}")
    return md


def _check_requirements(md: dict, requirements: list[dict]) -> str | None:
    """Return an error string if any spec requirement fails."""
    for r in requirements:
        rtype = r.get("type")
        if rtype == "assert-table-uuid":
            if md["table-uuid"] != r["uuid"]:
                return (
                    f"table uuid {md['table-uuid']} != asserted {r['uuid']}"
                )
        elif rtype == "assert-ref-snapshot-id":
            if r.get("ref", _MAIN) != _MAIN:
                return "stub supports the main branch only"
            want = r.get("snapshot-id")
            cur = md["current-snapshot-id"]
            cur = None if cur == -1 else cur
            if cur != want:
                return (
                    f"branch main at snapshot {cur}, commit based on {want}"
                )
        else:
            return f"unsupported requirement type {rtype!r}"
    return None


class StubRestCatalog:
    """In-process Iceberg REST catalog (see module docstring).  Tables
    are persisted through sources/iceberg_meta's metadata files, so the
    stub's state survives as long as the table directories do."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._namespaces: dict[str, dict] = {}
        # (ns, table) -> {"location": str, "version": int, "metadata": dict}
        self._tables: dict[tuple[str, str], dict] = {}
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def _send(self, code: int, obj=None) -> None:
                body = b"" if obj is None else json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _err(self, code: int, msg: str, etype: str) -> None:
                self._send(
                    code,
                    {
                        "error": {
                            "message": msg,
                            "type": etype,
                            "code": code,
                        }
                    },
                )

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n) or b"{}")

            def _route(self):
                parts = [p for p in self.path.split("/") if p]
                # v1 / namespaces / {ns} / (tables|register) / {t}
                if not parts or parts[0] != "v1":
                    return None
                return parts[1:]

            def do_GET(self) -> None:
                p = self._route()
                with stub._lock:
                    if p == ["config"]:
                        self._send(200, {"defaults": {}, "overrides": {}})
                    elif p == ["namespaces"]:
                        self._send(
                            200,
                            {
                                "namespaces": [
                                    [ns] for ns in sorted(stub._namespaces)
                                ]
                            },
                        )
                    elif len(p) == 2 and p[0] == "namespaces":
                        ns = p[1]
                        if ns not in stub._namespaces:
                            self._err(
                                404, f"namespace {ns}", "NoSuchNamespaceException"
                            )
                        else:
                            self._send(
                                200,
                                {
                                    "namespace": [ns],
                                    "properties": stub._namespaces[ns],
                                },
                            )
                    elif len(p) == 3 and p[0] == "namespaces" and p[2] == "tables":
                        ns = p[1]
                        if ns not in stub._namespaces:
                            self._err(
                                404, f"namespace {ns}", "NoSuchNamespaceException"
                            )
                            return
                        self._send(
                            200,
                            {
                                "identifiers": [
                                    {"namespace": [n], "name": t}
                                    for (n, t) in sorted(stub._tables)
                                    if n == ns
                                ]
                            },
                        )
                    elif len(p) == 4 and p[0] == "namespaces" and p[2] == "tables":
                        ent = stub._tables.get((p[1], p[3]))
                        if ent is None:
                            self._err(
                                404, f"table {p[1]}.{p[3]}", "NoSuchTableException"
                            )
                        else:
                            self._send(
                                200,
                                {
                                    "metadata-location": ent["metadata_location"],
                                    "metadata": ent["metadata"],
                                },
                            )
                    else:
                        self._err(404, self.path, "NotFound")

            def do_HEAD(self) -> None:
                p = self._route()
                with stub._lock:
                    if (
                        p
                        and len(p) == 4
                        and p[0] == "namespaces"
                        and p[2] == "tables"
                    ):
                        ok = (p[1], p[3]) in stub._tables
                        self._send(204 if ok else 404)
                    else:
                        self._send(404)

            def do_DELETE(self) -> None:
                p = self._route()
                with stub._lock:
                    if (
                        p
                        and len(p) == 4
                        and p[0] == "namespaces"
                        and p[2] == "tables"
                    ):
                        if stub._tables.pop((p[1], p[3]), None) is None:
                            self._err(
                                404, f"table {p[1]}.{p[3]}", "NoSuchTableException"
                            )
                        else:
                            self._send(204)
                    else:
                        self._err(404, self.path, "NotFound")

            def do_POST(self) -> None:
                p = self._route()
                body = self._body()
                with stub._lock:
                    if p == ["namespaces"]:
                        ns = body["namespace"][0]
                        if ns in stub._namespaces:
                            self._err(
                                409,
                                f"namespace {ns} exists",
                                "AlreadyExistsException",
                            )
                        else:
                            stub._namespaces[ns] = body.get("properties", {})
                            self._send(
                                200,
                                {
                                    "namespace": [ns],
                                    "properties": stub._namespaces[ns],
                                },
                            )
                    elif (
                        len(p) == 3
                        and p[0] == "namespaces"
                        and p[2] == "register"
                    ):
                        ns = p[1]
                        if ns not in stub._namespaces:
                            self._err(
                                404, f"namespace {ns}", "NoSuchNamespaceException"
                            )
                            return
                        name = body["name"]
                        if (ns, name) in stub._tables:
                            self._err(
                                409,
                                f"table {ns}.{name} exists",
                                "AlreadyExistsException",
                            )
                            return
                        mloc = body["metadata-location"]
                        try:
                            with open(mloc) as fh:
                                md = json.load(fh)
                        except OSError as ex:
                            self._err(400, str(ex), "BadRequest")
                            return
                        stub._tables[(ns, name)] = {
                            "location": md["location"],
                            "metadata_location": mloc,
                            "metadata": md,
                        }
                        self._send(
                            200,
                            {"metadata-location": mloc, "metadata": md},
                        )
                    elif (
                        len(p) == 4
                        and p[0] == "namespaces"
                        and p[2] == "tables"
                    ):
                        ent = stub._tables.get((p[1], p[3]))
                        if ent is None:
                            self._err(
                                404, f"table {p[1]}.{p[3]}", "NoSuchTableException"
                            )
                            return
                        md = ent["metadata"]
                        fail = _check_requirements(
                            md, body.get("requirements", [])
                        )
                        if fail is not None:
                            self._err(409, fail, "CommitFailedException")
                            return
                        try:
                            new_md = _apply_updates(
                                md, body.get("updates", [])
                            )
                        except ValueError as ex:
                            self._err(400, str(ex), "BadRequest")
                            return
                        # persist as the table's next metadata version +
                        # pointer swap (see module docstring)
                        from scylla_cdc_source_connector_spark.sources import (
                            iceberg_meta as _im,
                        )

                        loc = ent["location"]
                        with open(_im._version_hint(loc)) as fh:
                            v = int(fh.read().strip())
                        _im._write_metadata_file(loc, new_md, v + 1)
                        mloc = os.path.join(
                            _im._meta_dir(loc), f"v{v + 1}.metadata.json"
                        )
                        ent["metadata"] = new_md
                        ent["metadata_location"] = mloc
                        self._send(
                            200,
                            {"metadata-location": mloc, "metadata": new_md},
                        )
                    else:
                        self._err(404, self.path, "NotFound")

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        self.url = f"http://127.0.0.1:{self._server.server_port}"

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)


class RestCatalog:
    """Client for the Iceberg REST Catalog API subset above."""

    def __init__(self, base_url: str) -> None:
        self.base_url = base_url.rstrip("/")

    def _call(self, method: str, path: str, body: dict | None = None):
        data = None if body is None else json.dumps(body).encode()
        req = _rq.Request(
            f"{self.base_url}/v1{path}",
            data=data,
            method=method,
            headers={"Content-Type": "application/json"},
        )
        try:
            with _rq.urlopen(req) as resp:
                raw = resp.read()
                return json.loads(raw) if raw else None
        except HTTPError as ex:
            raw = ex.read()
            try:
                msg = json.loads(raw)["error"]["message"]
            except Exception:
                msg = raw.decode(errors="replace")
            if ex.code == 409 and method == "POST" and "/tables/" in path:
                raise CommitConflictError(ex.code, msg) from None
            raise RestCatalogError(ex.code, msg) from None

    # -- namespaces -------------------------------------------------------
    def config(self) -> dict:
        return self._call("GET", "/config")

    def create_namespace(self, ns: str, properties: dict | None = None):
        return self._call(
            "POST",
            "/namespaces",
            {"namespace": [ns], "properties": properties or {}},
        )

    def list_namespaces(self) -> list[str]:
        return [
            n[0] for n in self._call("GET", "/namespaces")["namespaces"]
        ]

    # -- tables -----------------------------------------------------------
    def register_table(self, ns: str, name: str, metadata_location: str):
        return self._call(
            "POST",
            f"/namespaces/{ns}/register",
            {"name": name, "metadata-location": metadata_location},
        )

    def load_table(self, ns: str, name: str) -> dict:
        return self._call("GET", f"/namespaces/{ns}/tables/{name}")

    def table_exists(self, ns: str, name: str) -> bool:
        try:
            self.load_table(ns, name)
            return True
        except RestCatalogError as ex:
            if ex.code == 404:
                return False
            raise

    def list_tables(self, ns: str) -> list[str]:
        return [
            i["name"]
            for i in self._call("GET", f"/namespaces/{ns}/tables")[
                "identifiers"
            ]
        ]

    def drop_table(self, ns: str, name: str) -> None:
        self._call("DELETE", f"/namespaces/{ns}/tables/{name}")

    def commit_table(
        self,
        ns: str,
        name: str,
        requirements: list[dict],
        updates: list[dict],
    ) -> dict:
        """Raises CommitConflictError on a failed requirement (refresh
        and retry)."""
        return self._call(
            "POST",
            f"/namespaces/{ns}/tables/{name}",
            {"requirements": requirements, "updates": updates},
        )
