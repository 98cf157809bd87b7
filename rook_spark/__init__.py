"""rook_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of shyiko/rook
(reference: /root/reference — a MySQL-binlog-tailing CDC toolkit,
``rook-api/.../ReplicationStream.java:24-33``) as an idiomatic Spark
engine:

- ordered change events (insert/update/delete with LSN-style offsets)
  flow through declarative DataFrame transforms (filter / project /
  key-extract — reference operators P1-P5, SURVEY.md §2.2),
- a last-writer-wins reduce by commit ordinal collapses each micro-batch
  to one surviving row per (repo, path) key (W1),
- an idempotent MERGE applies the batch into a transactional,
  bucket-partitioned lake table with snapshot isolation (K5/K6,
  mirroring ``DefaultRowsMutationIndexer.java:41-62``'s
  one-transaction-per-batch apply),
- per-partition offset watermarks stored in the *same* atomic snapshot
  commit give exactly-once table state under at-least-once replay.

Layout:
    lake/       minimal transactional table format (snapshot log + COW MERGE)
    cdc/        event schema, deterministic fixture generator, normalize,
                LWW reduce (plain + salted), batch apply, engine facade
    functions/  text analysis, dedup (minhash/simhash/...), ANN, multimodal
"""

__version__ = "0.1.0"
