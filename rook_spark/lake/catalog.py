"""Multi-table catalog: ATOMIC cross-table commits over the
:mod:`~rook_spark.lake.metastore` seam.

:mod:`rook_spark.lake.consistent` restores cross-table consistency
READ-side: per-table commits can tear an epoch (crash between two
tables' commits), and the aligned read time-travels back to the
greatest common fence. This module removes the torn window WRITE-side
— the Iceberg multi-table-transaction / REST-catalog analog: N tables
share ONE pointer map (``POINTERS``: table name -> committed version),
and a group commit validates every table's CAS and flips the whole map
in ONE atomic replace. Either every table shows the epoch or none does
— the multi-table generalization of the reference's all-or-nothing
per-transaction mutation (``DefaultRowsMutationIndexer.java:44-58``
runs ALL entities' mutations inside one Hibernate transaction; the
two-phase listener delivery at ``MySQLReplicationStream.java:161-179``
exists precisely so no sink acts on a tx the others may never see).

Usage::

    cat = LakeCatalog(root); cat.init()
    eng = MultiTableCdcEngine(spark, base, tables, catalog=cat)
    eng.replay(events)        # one atomic flip covers every table

Semantics:

- **Single-table commits** through a catalog store keep the plain CAS
  contract (one-entry group: payload written and pointer entry flipped
  under the catalog lock), so every existing LakeTable operation
  (merge, rollback, rebucket, tags, WAP, compact) works unchanged on a
  catalog table.
- **Group commits** (``with catalog.group():``) stage IN MEMORY: the
  exit of the ``group()`` scope takes the catalog lock once, validates
  every staged CAS, durably writes every staged payload, and replaces
  ``POINTERS`` in one atomic rename. An exception inside the scope
  discards the staged entries — nothing was ever visible, nothing was
  ever written. (Writing payloads only under the lock is what makes
  two RACING committers safe: the loser's conflict is detected before
  it can overwrite the winner's payload bytes.)
- **Read-your-own-staged-writes**: while a group is open, reads
  THROUGH THE CATALOG'S OWN STORE INSTANCES see the staged heads and
  staged payloads, so multi-commit epochs (MERGE then WAP-publish then
  compact) chain normally and publish as one unit. External readers
  (other processes, fresh ``LakeCatalog`` objects) read the durable
  map only.
- **Physical deletes are refused inside a group** (``delete`` /
  ``delete_blob`` raise): vacuum removes bytes immediately, which
  cannot be rolled back by discarding staged pointers — run retention
  maintenance outside the group (the engine's ``vacuum_every`` cadence
  belongs between epochs for catalog deployments).
- **Crash windows**: before the flip — map unmoved, no staged snapshot
  payload on disk, nothing visible anywhere; re-delivery re-applies the
  epoch to every table (per-table watermarks never advanced). Manifest
  BLOBS are durable at stage time by the seam's own contract (they are
  content-addressed and idempotent, so there is no overwrite race); a
  discarded group leaves unreferenced blobs for vacuum's GC sweep,
  exactly like a crashed single-table committer. A crash
  BETWEEN payload writes and the flip leaves orphan payload files that
  were never visible and are safely overwritten by the next winner of
  those versions (the same contract as the single-table store). After
  the flip, every table is at the epoch. There is no state in which a
  subset is.

Single-writer per group: a ``LakeCatalog`` instance stages in-process
(one driver owns an epoch across its tables — the same deployment
shape as one foreachBatch). CONCURRENT catalogs (two drivers) contend
on the CAS like any two committers: exactly one group wins, the loser
gets :class:`~rook_spark.lake.metastore.CommitConflict` with nothing
applied — not even partially.

On-disk layout (POSIX impl)::

    catalog_root/
      POINTERS            # json {"facts": 12, "dims": 7}
      .catalog.lock       # flock for CAS + flip
      facts/              # payload files v{N}.json + manifests/
      dims/
"""

from __future__ import annotations

import json
import os
import uuid
from contextlib import contextmanager
from typing import Iterator

from rook_spark.lake.metastore import (
    CommitConflict,
    InMemoryMetadataStore,
    PosixMetadataStore,
)

__all__ = ["LakeCatalog", "InMemoryLakeCatalog"]

# a staged entry: (store, version, payload, expected_parent)
_Entry = tuple[object, int, str, int]


class _CatalogBase:
    """Group-commit protocol, shared by the POSIX and in-memory
    catalogs. Subclasses provide the storage primitives: ``_exclusive``
    (mutual exclusion among live committers), ``_read_map`` (the
    durable name->version map), ``_apply_map`` (atomically publish a
    new map), and ``store`` (a MetadataStore view over one table)."""

    def __init__(self) -> None:
        # open group: staged entries; None = no group, commits flip
        # immediately (as one-entry groups)
        self._staged: list[_Entry] | None = None
        self._stores: dict[str, object] = {}

    # ---- protocol pieces supplied by subclasses ----
    def _exclusive(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def _read_map(self) -> dict[str, int]:  # pragma: no cover - abstract
        raise NotImplementedError

    def _apply_map(self, m: dict[str, int]) -> None:  # pragma: no cover
        raise NotImplementedError

    # ------------------------------------------------------- group API

    @contextmanager
    def group(self) -> Iterator["_CatalogBase"]:
        """Atomic multi-table commit scope. Everything committed through
        this catalog's stores inside the scope publishes in ONE pointer
        flip at exit; an exception discards all of it (nothing was ever
        visible or written). Not re-entrant; one group owner at a time
        (the epoch driver)."""
        if self._staged is not None:
            raise RuntimeError("a catalog group is already open")
        self._staged = []
        try:
            yield self
        except BaseException:
            self._staged = None
            raise
        staged, self._staged = self._staged, None
        if staged:
            self._commit(staged)

    def in_group(self) -> bool:
        return self._staged is not None

    def _staged_head(self, name: str) -> int | None:
        """Newest staged version for ``name`` (read-your-own-writes
        while a group is open), or None if nothing staged for it."""
        if not self._staged:
            return None
        for store, version, _payload, _parent in reversed(self._staged):
            if store.name == name:  # type: ignore[attr-defined]
                return version
        return None

    def _staged_payload(self, name: str, version: int) -> str | None:
        if not self._staged:
            return None
        for store, v, payload, _parent in reversed(self._staged):
            if store.name == name and v == version:  # type: ignore[attr-defined]
                return payload
        return None

    def _stage_or_commit(self, entry: _Entry) -> None:
        if self._staged is not None:
            self._staged.append(entry)
        else:
            self._commit([entry])

    def _commit(self, entries: list[_Entry]) -> None:
        """Under ONE exclusive section: validate every entry's CAS
        against the durable map (chained entries for one table validate
        against the prior staged version — the view advances as entries
        apply), then durably write every payload, then publish the new
        map atomically. Raises CommitConflict on the FIRST mismatch
        with nothing written and nothing applied."""
        with self._exclusive():
            view = dict(self._read_map())
            for store, version, _payload, parent in entries:
                actual = view.get(store.name, -1)  # type: ignore[attr-defined]
                if actual != parent:
                    raise CommitConflict(parent, actual)
                view[store.name] = version  # type: ignore[attr-defined]
            for store, version, payload, _parent in entries:
                store._publish_payload(version, payload)  # type: ignore[attr-defined]
            self._apply_map(view)


class LakeCatalog(_CatalogBase):
    """POSIX multi-table catalog (see module docstring). ``store(name)``
    returns the :class:`~rook_spark.lake.metastore.MetadataStore` to
    pass into ``LakeTable``/``CdcEngine`` for that table; payload and
    manifest-blob files keep the per-table directory layout, only the
    pointer moves into the shared ``POINTERS`` map."""

    _POINTERS = "POINTERS"
    _LOCK = ".catalog.lock"

    def __init__(self, root: str):
        super().__init__()
        self.root = os.path.abspath(root)

    def init(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    def store(self, name: str) -> "CatalogTableStore":
        if not name or any(c in name for c in "/\\") or name.startswith("."):
            raise ValueError(f"invalid catalog table name {name!r}")
        s = self._stores.get(name)
        if s is None:
            s = self._stores[name] = CatalogTableStore(self, name)
        return s  # type: ignore[return-value]

    def tables(self) -> list[str]:
        return sorted(self._read_map())

    @contextmanager
    def _exclusive(self):
        import fcntl

        os.makedirs(self.root, exist_ok=True)
        fd = os.open(os.path.join(self.root, self._LOCK), os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)

    def _read_map(self) -> dict[str, int]:
        try:
            with open(os.path.join(self.root, self._POINTERS)) as f:
                return {k: int(v) for k, v in json.load(f).items()}
        except FileNotFoundError:
            return {}

    def _apply_map(self, m: dict[str, int]) -> None:
        tmp = os.path.join(self.root, f".pointers.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(m, f)
            f.flush()
            os.fsync(f.fileno())
        # the commit point for EVERY table in the group
        os.replace(tmp, os.path.join(self.root, self._POINTERS))
        fd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


class CatalogTableStore(PosixMetadataStore):
    """One table's store view over a :class:`LakeCatalog`: payloads and
    manifest blobs live under ``catalog_root/<name>/`` (the inherited
    POSIX layout), but the POINTER lives in the catalog's shared map —
    which is what makes a group of tables commit in one flip."""

    def __init__(self, catalog: LakeCatalog, name: str):
        super().__init__(os.path.join(catalog.root, name))
        self.catalog = catalog
        self.name = name

    def in_active_group(self) -> bool:
        """Protocol hook for physically-destructive table ops (vacuum):
        True while this store's catalog has an open group."""
        return self.catalog.in_group()

    def read_pointer(self) -> int:
        staged = self.catalog._staged_head(self.name)
        if staged is not None:
            return staged
        return self.catalog._read_map().get(self.name, -1)

    def commit(self, version: int, payload: str, expected_parent: int) -> None:
        self.catalog._stage_or_commit((self, version, payload, expected_parent))

    def _publish_payload(self, version: int, payload: str) -> None:
        os.makedirs(self.meta_dir, exist_ok=True)
        self._write_payload(version, payload)

    def read(self, version: int) -> str:
        staged = self.catalog._staged_payload(self.name, version)
        if staged is not None:
            return staged
        return super().read(version)

    def delete(self, version: int) -> None:
        if self.catalog.in_group():
            raise RuntimeError(
                "physical delete inside an open catalog group is not "
                "atomic (bytes cannot be un-deleted by discarding staged "
                "pointers) — run vacuum/retention outside the group"
            )
        super().delete(version)

    def delete_blob(self, key: str) -> None:
        if self.catalog.in_group():
            raise RuntimeError(
                "physical delete inside an open catalog group is not "
                "atomic — run vacuum/retention outside the group"
            )
        super().delete_blob(key)


class InMemoryLakeCatalog(_CatalogBase):
    """Process-local catalog proving the seam (the in-memory dual of
    :class:`LakeCatalog`, as ``InMemoryMetadataStore`` is of the POSIX
    store): the shared map is a dict under a lock, the per-table stores
    are in-memory. The group protocol — stage, validate all, publish
    all, flip once — is byte-for-byte the class above; a real REST/JDBC
    catalog implements ``_apply_map`` as one conditional multi-row
    write."""

    def __init__(self) -> None:
        super().__init__()
        import threading

        self._map: dict[str, int] = {}
        self._lock = threading.Lock()

    def init(self) -> None:
        pass

    def store(self, name: str) -> "_InMemoryCatalogStore":
        s = self._stores.get(name)
        if s is None:
            s = self._stores[name] = _InMemoryCatalogStore(self, name)
        return s  # type: ignore[return-value]

    def tables(self) -> list[str]:
        return sorted(self._map)

    @contextmanager
    def _exclusive(self):
        with self._lock:
            yield

    def _read_map(self) -> dict[str, int]:
        return dict(self._map)

    def _apply_map(self, m: dict[str, int]) -> None:
        self._map = dict(m)


class _InMemoryCatalogStore(InMemoryMetadataStore):
    def __init__(self, catalog: InMemoryLakeCatalog, name: str):
        super().__init__()
        self.catalog = catalog
        self.name = name

    def in_active_group(self) -> bool:
        """Protocol hook for physically-destructive table ops (vacuum):
        True while this store's catalog has an open group."""
        return self.catalog.in_group()

    def read_pointer(self) -> int:
        staged = self.catalog._staged_head(self.name)
        if staged is not None:
            return staged
        return self.catalog._read_map().get(self.name, -1)

    def commit(self, version: int, payload: str, expected_parent: int) -> None:
        self.catalog._stage_or_commit((self, version, payload, expected_parent))

    def _publish_payload(self, version: int, payload: str) -> None:
        self._snaps[version] = payload

    def read(self, version: int) -> str:
        staged = self.catalog._staged_payload(self.name, version)
        if staged is not None:
            return staged
        return super().read(version)

    def delete(self, version: int) -> None:
        if self.catalog.in_group():
            raise RuntimeError(
                "physical delete inside an open catalog group is not "
                "atomic — run vacuum/retention outside the group"
            )
        super().delete(version)

    def delete_blob(self, key: str) -> None:
        if self.catalog.in_group():
            raise RuntimeError(
                "physical delete inside an open catalog group is not "
                "atomic — run vacuum/retention outside the group"
            )
        super().delete_blob(key)
