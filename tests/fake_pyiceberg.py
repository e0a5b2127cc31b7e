"""Minimal test double of the pyiceberg surface IcebergTileSink uses.

This container has no pyiceberg, so by default only the ImportError
branch of the sink ever executes.  This fake implements exactly the API
subset the sink touches — ``SqlCatalog`` (create_namespace /
load_table / create_table), ``NoSuchTableError``, table
``transaction()`` with ``add_files`` / ``set_properties``, and the
``properties`` mapping — with catalog state persisted as JSON under the
warehouse dir (durable across catalog objects, like the real SQLite
catalog), so the snapshot-commit protocol, property-carried manifests,
and manifest-cache re-derivation all run for real.  It is injected via
``sys.modules`` by tests only; the production import path is untouched.
"""

from __future__ import annotations

import json
import os
import types


class NoSuchTableError(Exception):
    pass


def _state_path(uri: str) -> str:
    # uri looks like sqlite:///<warehouse>/catalog.db
    return uri.split("sqlite:///", 1)[1] + ".fake.json"


def _load(uri: str) -> dict:
    p = _state_path(uri)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {"namespaces": [], "tables": {}}


def _save(uri: str, state: dict) -> None:
    p = _state_path(uri)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, p)


class _Transaction:
    def __init__(self, table):
        self._table = table
        self._files: list = []
        self._props: dict = {}

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            # one atomic "snapshot": files + properties land together
            self._table._commit(self._files, self._props)
        return False

    def add_files(self, file_paths):
        for f in file_paths:
            if not os.path.exists(f):
                raise FileNotFoundError(f)
        self._files.extend(file_paths)

    def set_properties(self, props: dict):
        self._props.update(props)


class _Table:
    def __init__(self, catalog, ident: str):
        self._catalog = catalog
        self._ident = ident

    @property
    def properties(self) -> dict:
        return dict(
            _load(self._catalog._uri)["tables"][self._ident]["properties"]
        )

    def transaction(self) -> _Transaction:
        return _Transaction(self)

    def _commit(self, files, props):
        state = _load(self._catalog._uri)
        t = state["tables"][self._ident]
        t["snapshots"].append({"added_files": list(files), "summary": props})
        t["properties"].update(props)
        _save(self._catalog._uri, state)


class SqlCatalog:
    def __init__(self, name: str, **kw):
        self._name = name
        self._uri = kw["uri"]

    def create_namespace(self, ns: str):
        state = _load(self._uri)
        if ns in state["namespaces"]:
            raise ValueError(f"namespace exists: {ns}")
        state["namespaces"].append(ns)
        _save(self._uri, state)

    def load_table(self, ident: str) -> _Table:
        if ident not in _load(self._uri)["tables"]:
            raise NoSuchTableError(ident)
        return _Table(self, ident)

    def create_table(self, ident: str, schema=None) -> _Table:
        state = _load(self._uri)
        state["tables"][ident] = {
            "schema": str(schema),
            "properties": {},
            "snapshots": [],
        }
        _save(self._uri, state)
        return _Table(self, ident)


def install(monkeypatch) -> None:
    """Register the fake under the pyiceberg module names."""
    import sys

    root = types.ModuleType("pyiceberg")
    catalog = types.ModuleType("pyiceberg.catalog")
    sql = types.ModuleType("pyiceberg.catalog.sql")
    exceptions = types.ModuleType("pyiceberg.exceptions")
    sql.SqlCatalog = SqlCatalog
    exceptions.NoSuchTableError = NoSuchTableError
    root.catalog = catalog
    catalog.sql = sql
    monkeypatch.setitem(sys.modules, "pyiceberg", root)
    monkeypatch.setitem(sys.modules, "pyiceberg.catalog", catalog)
    monkeypatch.setitem(sys.modules, "pyiceberg.catalog.sql", sql)
    monkeypatch.setitem(sys.modules, "pyiceberg.exceptions", exceptions)
