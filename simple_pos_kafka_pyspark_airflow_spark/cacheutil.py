"""Cache-lifetime discipline for long-lived sessions.

Several operators ``persist()`` frames that feed multiple consumers
inside one returned (lazy) plan — doc tables, signature tables, IVF
assignments — and iterative operators ``localCheckpoint(eager=True)``
per round to truncate lineage. Both leave blocks in the executor block
manager that only session LRU would otherwise reclaim. That is fine for
one-shot jobs (bench.py clears per query; a driver exits) but a
long-lived service accumulates dead blocks and leans on eviction
(docs/SCALE.md "cache ownership").

Two tools, matching the two ownership shapes:

- **operators that materialize internally** (iterative loops) free their
  superseded rounds THEMSELVES as soon as the next round is
  materialized — see ``llm.dedup.dedup_clusters``, which keeps at most
  one round's checkpoint alive using ``persistent_rdd_ids`` diffs;
- **operators that return lazy plans over persisted inputs** cannot know
  when the caller's action runs, so the CALLER wraps consumption in
  ``scoped_caches`` — everything persisted inside the block (by any
  operator, including localCheckpoint RDDs) is unpersisted on exit.

``scoped_caches`` must enclose the MATERIALIZATION (the action), not
just the plan construction: unpersisting before the action simply makes
the action recompute.

One asymmetry to respect: a ``persist()``-backed frame re-computes
transparently after release (blocks are an optimization), but a
``localCheckpoint``-backed frame CANNOT — its lineage was truncated at
checkpoint time (Spark logs a WARN at release), so re-collecting such a
frame after its blocks are freed raises instead of recomputing. Consume
iterative operators' results INSIDE the block (or re-build the plan),
never re-materialize them after release.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession

#: Session conf key selecting how ``materialize`` cuts lineage.
MATERIALIZE_MODE_KEY = "spark.graft.materialize"
#: Optional conf key naming the reliable-checkpoint directory (applied to
#: the SparkContext on first reliable materialize if none is set yet).
CHECKPOINT_DIR_KEY = "spark.graft.checkpoint.dir"


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize an intermediate frame and truncate its lineage — the
    single switch point for the engine's eager checkpoint sites
    (pagerank's edge list and per-iteration ranks, ``dedup_clusters``'s
    pair list and label rounds, the curation ladder's hubs, the graph
    queries' undirected edge sets).

    Default (``spark.graft.materialize`` unset or ``"local"``):
    ``localCheckpoint`` — blocks live on executors with NO lineage, so
    they are fast but not fault-tolerant: on a real cluster, losing one
    executor mid-iteration kills the job instead of recomputing. That is
    the right local/bench trade and the measured-fastest form at test
    scale.

    Cluster profile (``spark.conf.set("spark.graft.materialize",
    "reliable")``): routes to reliable ``checkpoint()`` — blocks are
    written to the checkpoint directory (set it via
    ``sc.setCheckpointDir`` or the ``spark.graft.checkpoint.dir`` conf),
    so an executor loss recomputes from storage instead of failing the
    job. At 100 TB the pagerank edge list is (nodes+edges)-sized — not
    small — and a multi-hour iterative job must survive executor churn;
    see docs/SCALE.md "Materialization fault tolerance". Reliable
    checkpoints are files, not persisted RDDs: ``release_caches`` /
    ``scoped_caches`` see nothing to free (cleanup = checkpoint-dir
    lifecycle), which is the correct ownership shape on a cluster.
    """
    spark = df.sparkSession
    mode = spark.conf.get(MATERIALIZE_MODE_KEY, "local")
    if mode == "reliable":
        sc = spark.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            ckdir = spark.conf.get(CHECKPOINT_DIR_KEY, None)
            if not ckdir:
                raise ValueError(
                    "spark.graft.materialize=reliable needs a checkpoint "
                    "directory: call sc.setCheckpointDir(...) or set "
                    f"{CHECKPOINT_DIR_KEY}"
                )
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    if mode != "local":
        raise ValueError(
            f"unknown {MATERIALIZE_MODE_KEY}={mode!r} (use 'local' or 'reliable')"
        )
    return df.localCheckpoint(eager=eager)


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently persisted in this session's block
    manager — includes DataFrame ``persist()`` plans AND the RDDs backing
    ``localCheckpoint``. Driver-side metadata only; no job runs."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release_caches(spark: SparkSession, ids: set[int], blocking: bool = False) -> int:
    """Unpersist the given RDD ids (ids already gone are skipped).
    Returns how many were released. ``blocking=False``: removal is
    async, the correctness-safe default (blocks are re-computable)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for k in jmap.keySet().toArray():
        if int(k) in ids:
            jmap.get(k).unpersist(blocking)
            released += 1
    return released


@contextlib.contextmanager
def scoped_caches(spark: SparkSession, blocking: bool = False):
    """Free every RDD persisted inside the block on exit — persist() and
    localCheckpoint alike — leaving caches that existed before the block
    untouched (unlike ``spark.catalog.clearCache()``, which would evict
    a co-tenant pipeline's warm tables too):

        with scoped_caches(spark):
            out = near_dup_pairs_minhash(docs, ...)
            result = out.collect()          # action INSIDE the block
        # signature/doc tables are unpersisted here

    Exit never raises past the user's exception (release is
    best-effort metadata cleanup)."""
    before = persistent_rdd_ids(spark)
    try:
        yield
    finally:
        with contextlib.suppress(Exception):
            release_caches(spark, persistent_rdd_ids(spark) - before, blocking)
