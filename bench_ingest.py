#!/usr/bin/env python
"""Ingest-ladder benchmark (r14, VERDICT task 5): prices the COMPOSED
corpus front door (``streaming.corpus.ingest_corpus_batch``) — the
repo's flagship pipeline, which until now had only pass/fail tests —
over real sf0.1 micro-batches, and prints ONE JSON line:

    {"metric": "ingest_ladder_docs_per_sec", "value": <all-tiers d/s>,
     "unit": "docs/sec", "configs": {...}, "sf": ...}

Three configurations, so the record carries per-tier deltas:

- ``gate_only``    — quality gate + within-batch exact dedup
  (``corpus_ingest``), no persistent state: the floor any ingest pays;
- ``minhash_only`` — the front door with just the lexical near-dup
  index (the minimum persistent configuration the API accepts);
- ``all_tiers``    — URL -> digest -> minhash -> semantic ANN -> span
  -> line -> exact-substring, the full cost-ordered ladder.

Every configuration ingests the SAME input (documents joined with their
embeddings — only the ANN tier reads the vector column, but a fair
per-tier delta requires identical input width), split into three
micro-batches by ``doc_id % 3`` and sunk to parquet exactly as a
``foreachBatch`` drain would. Index/monitor state lands in a throwaway
temp dir, fresh per run, so runs are independent and the second run
of a config prices the same work as the first.

Calibration discipline matches ``bench.py``: the frozen lineitem
groupBy probe runs at start, between configurations, and at the end;
per-config times are min-of-N with the probes recorded alongside, so a
host stall is visible in the record instead of silently inflating one
configuration's delta.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from simple_pos_kafka_pyspark_airflow_spark.session import get_session

N_BATCHES = 3
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_session("spark_graft_bench_ingest")

    from simple_pos_kafka_pyspark_airflow_spark.streaming.ann import IncrementalIvfIndex
    from simple_pos_kafka_pyspark_airflow_spark.streaming.corpus import (
        IncrementalDigestIndex,
        IncrementalLineIndex,
        IncrementalMinhashIndex,
        IncrementalSpanIndex,
        IncrementalSubstringIndex,
        IncrementalUrlIndex,
        corpus_ingest,
        ingest_corpus_batch,
    )

    # warmup: session machinery + the minhash wide-agg codegen compile
    # (see bench.py for the measured rationale)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from simple_pos_kafka_pyspark_airflow_spark.llm import dedup as _dedup

    tiny = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "one two three four five six")],
        ["doc_id", "text"],
    )
    _dedup.near_dup_pairs_minhash(tiny, "text", "doc_id").write.format("noop").mode(
        "overwrite"
    ).save()

    def calib_probe() -> float:
        c0 = time.perf_counter()
        (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_returnflag", "l_linestatus")
            .agg({"l_quantity": "sum", "l_extendedprice": "sum", "*": "count"})
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return round(time.perf_counter() - c0, 4)

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                F.col("vec_id").alias("doc_id"), "embedding"
            ),
            "doc_id",
        )
        .withColumn(
            "url",
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
                F.col("doc_id").cast("string"), F.lit("?utm_source=feed"),
            ),
        )
        .select("doc_id", "source", "url", "text", "embedding")
        .localCheckpoint(eager=True)  # price the ladder, not the scan+join
    )
    n_docs = docs.count()

    def drain(config: str, root: str) -> int:
        """Ingest the three micro-batches under ``config``; returns docs in."""
        sink = os.path.join(root, "landed")
        if config == "gate_only":
            gates = {}
            mh = None
        elif config == "minhash_only":
            mh = IncrementalMinhashIndex(spark, os.path.join(root, "mh"))
            gates = {}
        else:  # all_tiers
            mh = IncrementalMinhashIndex(spark, os.path.join(root, "mh"))
            gates = dict(
                url_index=IncrementalUrlIndex(spark, os.path.join(root, "ui")),
                digest_index=IncrementalDigestIndex(spark, os.path.join(root, "di")),
                ann_index=IncrementalIvfIndex(
                    spark, os.path.join(root, "ann"), id_col="doc_id"
                ),
                ann_threshold=0.9,
                span_index=IncrementalSpanIndex(spark, os.path.join(root, "sp")),
                line_index=IncrementalLineIndex(spark, os.path.join(root, "li")),
                substring_index=IncrementalSubstringIndex(
                    spark, os.path.join(root, "si")
                ),
            )
        for bid in range(N_BATCHES):
            batch = docs.where(F.col("doc_id") % N_BATCHES == bid)
            if config == "gate_only":
                out = corpus_ingest(batch, min_quality=0.0, min_tokens=1)
            else:
                out = ingest_corpus_batch(
                    batch, bid, mh, min_quality=0.0, min_tokens=1, **gates
                )
            out.write.mode("append").parquet(sink)
        return n_docs

    configs = ["gate_only", "minhash_only", "all_tiers"]
    calib: dict[str, float] = {"start": calib_probe()}
    results: dict[str, dict] = {}
    for config in configs:
        runs: list[float] = []
        for _ in range(N_RUNS):
            root = tempfile.mkdtemp(prefix=f"ingest_bench_{config}_")
            t0 = time.perf_counter()
            drain(config, root)
            runs.append(round(time.perf_counter() - t0, 4))
            shutil.rmtree(root, ignore_errors=True)
            spark.catalog.clearCache()
        best = min(runs)
        results[config] = {
            "sec": best,
            "runs": runs,
            "docs_per_sec": round(n_docs / best, 1),
        }
        calib[f"after_{config}"] = calib_probe()
        print(f"# {config}: {best:.2f}s min of {runs} "
              f"({results[config]['docs_per_sec']} docs/s)", file=sys.stderr)

    # per-tier deltas off the shared input/base: what each step ADDS
    deltas = {
        "persistent_minhash_over_gate": round(
            results["minhash_only"]["sec"] - results["gate_only"]["sec"], 4
        ),
        "remaining_tiers_over_minhash": round(
            results["all_tiers"]["sec"] - results["minhash_only"]["sec"], 4
        ),
    }
    payload = {
        "metric": "ingest_ladder_docs_per_sec",
        "value": results["all_tiers"]["docs_per_sec"],
        "unit": "docs/sec",
        "n_docs": n_docs,
        "n_batches": N_BATCHES,
        "configs": results,
        "deltas": deltas,
        "calibration": calib,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(payload))
    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, "docs", "bench", "ingest_r15.json")
    try:
        with open(out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"# full results -> {out}", file=sys.stderr)
    except OSError as exc:
        print(f"# could not persist: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
