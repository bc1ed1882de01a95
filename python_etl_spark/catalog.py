"""Named-table catalog for the lakehouse (r12 verdict #2): a tiny
manifest-backed ``name -> table root`` mapping so SQL users (and the
``versioned_table`` read face) can address tables by NAME instead of
pasting filesystem paths into every statement.

Design: one JSON file (``{"tables": {name: root}}``) written with the
write-tmp + ``os.replace`` atomic-publish pattern every manifest in
this repo uses — readers never observe a torn file. The catalog is
METADATA ONLY: registering points a name at an existing (or future)
:class:`~python_etl_spark.sinks.table.VersionedTable` root;
unregistering forgets the name and never touches data. Mutators
serialize on an advisory flock (concurrent registers of distinct
names both land); a same-name collision is refused unless
``replace=True`` — the same posture as ``CREATE OR REPLACE``.

Resolution order for the catalog file itself (``default_path``):

1. the active session's ``spark.python_etl_spark.catalog`` conf,
2. the ``PYTHON_ETL_CATALOG`` environment variable,
3. ``<spark.sql.warehouse.dir>/_vt_catalog.json`` (file: URI stripped),
4. ``./spark-warehouse/_vt_catalog.json``.

Names are case-insensitive (stored lowercase), ``[A-Za-z_][A-Za-z0-9_]*``
— plain SQL identifiers, so the router can substitute them with a
word-boundary scan that can never split a quoted literal.

Scale posture: the catalog is O(#tables) metadata read once per
statement — never on the data path; resolution happens before Catalyst
ever sees the query.
"""

from __future__ import annotations

import json
import os
import re
import uuid

_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def default_path() -> str:
    """Resolve the catalog file location (module docstring order)."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    except Exception:  # pragma: no cover - no pyspark on path
        spark = None
    if spark is not None:
        p = spark.conf.get("spark.python_etl_spark.catalog", None)
        if p:
            return p
    env = os.environ.get("PYTHON_ETL_CATALOG")
    if env:
        return env
    wh = None
    if spark is not None:
        wh = spark.conf.get("spark.sql.warehouse.dir", None)
    if wh:
        wh = re.sub(r"^file:/{0,2}", "/", wh)
        wh = re.sub(r"^//", "/", wh)
    else:
        wh = os.path.join(os.getcwd(), "spark-warehouse")
    return os.path.join(wh, "_vt_catalog.json")


class Catalog:
    """The name -> root mapping. All mutators re-read the file, apply
    the change, and atomically replace it."""

    def __init__(self, path: str | None = None):
        self.path = path or default_path()

    # ---------------------------------------------------------- io
    def _load_doc(self) -> dict:
        try:
            with open(self.path) as f:
                doc = json.load(f)
        except FileNotFoundError:
            return {}
        except (OSError, ValueError) as e:
            raise ValueError(
                f"catalog file {self.path} is unreadable: {e}"
            ) from e
        return doc

    def _load(self) -> dict:
        return dict(self._load_doc().get("tables") or {})

    def _store(self, tables: dict, views: dict | None = None) -> None:
        if views is None:  # table-only mutator: carry views through
            views = dict(self._load_doc().get("views") or {})
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(
                {"tables": tables, "views": views},
                f, indent=1, sort_keys=True,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)

    def _locked(self):
        """Advisory flock serializing read-modify-write mutators:
        without it two concurrent registers of DIFFERENT names race
        the whole-file replace and one silently vanishes. Local-FS
        semantics (the catalog lives beside the warehouse); on a
        network FS without flock the lock degrades to best-effort —
        same posture as every local lakehouse catalog."""
        import contextlib
        import fcntl

        @contextlib.contextmanager
        def _cm():
            os.makedirs(
                os.path.dirname(self.path) or ".", exist_ok=True
            )
            fd = os.open(f"{self.path}.lock", os.O_CREAT | os.O_RDWR)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)

        return _cm()

    @staticmethod
    def _norm(name: str) -> str:
        n = name.strip().lower()
        if not _NAME.match(n):
            raise ValueError(
                f"bad table name {name!r} — catalog names are plain "
                f"SQL identifiers ([A-Za-z_][A-Za-z0-9_]*)"
            )
        return n

    # ------------------------------------------------------- verbs
    def register(
        self, name: str, root: str, replace: bool = False
    ) -> None:
        n = self._norm(name)
        with self._locked():
            doc = self._load_doc()
            tables = dict(doc.get("tables") or {})
            views = dict(doc.get("views") or {})
            if n in views:
                raise ValueError(
                    f"'{n}' is a VIEW — tables and views share one "
                    f"namespace; DROP VIEW it first"
                )
            cur = tables.get(n)
            if cur is not None and cur != root and not replace:
                raise ValueError(
                    f"table name '{n}' already points at {cur} — pass "
                    f"replace=True (SQL: CREATE OR REPLACE TABLE) to "
                    f"repoint it"
                )
            tables[n] = root
            self._store(tables, views)

    def register_view(
        self, name: str, text: str, replace: bool = False
    ) -> None:
        """Store a NAMED SQL VIEW (r13): the catalog keeps the raw
        statement text; resolution re-substitutes it at read time, so
        a view always reflects the CURRENT table snapshots (and other
        views) it references. One namespace with tables."""
        n = self._norm(name)
        if not str(text).strip():
            raise ValueError("view text is empty")
        with self._locked():
            doc = self._load_doc()
            tables = dict(doc.get("tables") or {})
            views = dict(doc.get("views") or {})
            if n in tables:
                raise ValueError(
                    f"'{n}' is a TABLE — tables and views share one "
                    f"namespace; DROP TABLE it first"
                )
            if n in views and not replace:
                raise ValueError(
                    f"view '{n}' already exists — CREATE OR REPLACE "
                    f"VIEW to redefine it"
                )
            views[n] = str(text)
            self._store(tables, views)

    def unregister_view(self, name: str) -> str:
        n = self._norm(name)
        with self._locked():
            doc = self._load_doc()
            tables = dict(doc.get("tables") or {})
            views = dict(doc.get("views") or {})
            if n not in views:
                raise KeyError(f"no view named '{n}' in {self.path}")
            text = views.pop(n)
            self._store(tables, views)
        return text

    def views(self) -> dict[str, str]:
        return dict(self._load_doc().get("views") or {})

    def unregister(self, name: str) -> str:
        n = self._norm(name)
        with self._locked():
            tables = self._load()
            if n not in tables:
                raise KeyError(f"no table named '{n}' in {self.path}")
            root = tables.pop(n)
            self._store(tables)
        return root

    def rename(self, old: str, new: str) -> None:
        o, n = self._norm(old), self._norm(new)
        with self._locked():
            tables = self._load()
            if o not in tables:
                raise KeyError(f"no table named '{o}' in {self.path}")
            if n in tables:
                raise ValueError(f"table name '{n}' already exists")
            tables[n] = tables.pop(o)
            self._store(tables)

    def resolve(self, name: str) -> str:
        n = self._norm(name)
        doc = self._load_doc()
        tables = dict(doc.get("tables") or {})
        if n not in tables:
            if n in (doc.get("views") or {}):
                raise ValueError(
                    f"'{n}' is a VIEW — views are read-only (SELECT "
                    f"position); DML/DDL needs a table"
                )
            raise KeyError(
                f"no table named '{n}' in {self.path} — register it "
                f"with CREATE TABLE {n} USING versioned_table "
                f"LOCATION '<root>'"
            )
        return tables[n]

    def names(self) -> dict[str, str]:
        return self._load()
