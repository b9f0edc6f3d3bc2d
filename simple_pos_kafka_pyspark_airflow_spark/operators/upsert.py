"""Snapshot upsert / delete-by-absence — the heart of the reference's CDC.

The reference syncs CSV state-files into Postgres by collecting every row
to the driver and running psycopg2 ``DELETE`` + ``INSERT … ON CONFLICT DO
UPDATE`` (``POS_spark_dag.py:155-193``, products ``:235-271``, customers
``:319-354``). That funnels O(data) through one process — the single worst
scalability decision in the reference (SURVEY.md §4 anti-pattern 2).

Pure-Spark re-expression, executed entirely on executors:

    upserted  = new ∪ (old ⟕anti_pk new)     -- new wins on conflicting pk
    deleted   = old ⟕anti_pk new              -- snapshot semantics: absent = delete
    merged    = new                           -- when new is a FULL snapshot

Two modes because the reference conflates them:

- ``merge_delta``: ``new`` is a *partial* batch of upserts → keep old rows
  whose pk is untouched.
- ``apply_snapshot``: ``new`` is a *full* snapshot → result is exactly
  ``new``; ``deletes(old, new)`` reports what disappeared (the reference
  computes exactly this diff to emit DELETE statements).

Scale: both are single equi-shuffles on the pk. With the warehouse stored
bucketed by pk, the anti join is co-located and shuffle-free; with Delta or
Iceberg the same logic is ``MERGE WHEN NOT MATCHED BY SOURCE``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_delta(old: DataFrame, new: DataFrame, pk: str | list[str]) -> DataFrame:
    """Upsert a partial batch: rows of ``new`` plus rows of ``old`` whose
    primary key does not appear in ``new``. Equivalent to the reference's
    ``INSERT … ON CONFLICT (pk) DO UPDATE`` (``POS_spark_dag.py:178-193``)
    without the driver round-trip."""
    keys = [pk] if isinstance(pk, str) else list(pk)
    untouched = old.join(new.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
    return new.unionByName(untouched)


def deletes(old: DataFrame, new: DataFrame, pk: str | list[str]) -> DataFrame:
    """Delete-by-absence: old rows whose pk is missing from the new
    snapshot (``POS_spark_dag.py:155-168``)."""
    keys = [pk] if isinstance(pk, str) else list(pk)
    return old.join(new.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
