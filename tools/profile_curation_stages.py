#!/usr/bin/env python
"""r14 measurement tooling: stage-split timing of the curation ladder
(q_curation_e2e / q_curation_audited, guide §1.4/§1.5).

Runs the exact `llm.curation.curate_corpus` ladder stage by stage, forcing
each stage boundary with localCheckpoint(eager=True) — the same
materialization the counts=True path pays — and prints per-stage seconds.
Measurement only; the declared queries are untouched.

Usage: python tools/profile_curation_stages.py [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_pos_kafka_pyspark_airflow_spark.catalog import table
from simple_pos_kafka_pyspark_airflow_spark.llm import curation, filtering
from simple_pos_kafka_pyspark_airflow_spark.llm import dedup as dedup_ops
from simple_pos_kafka_pyspark_airflow_spark.session import get_session


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("spark_graft_profile_curation")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    cfg = curation.CurationConfig(
        min_tokens=3,
        allowed_langs=("en", "de", "fr", "es", "zh", "und"),
        per_source_cap=40,
    )
    t, i = cfg.text_col, cfg.id_col

    for r in range(rounds):
        spark.catalog.clearCache()
        timings: list[tuple[str, float]] = []

        def stage(name: str, df):
            spark.sparkContext.setJobDescription(f"stage:{name}")
            t0 = time.perf_counter()
            out = df.localCheckpoint(eager=True)
            timings.append((name, round(time.perf_counter() - t0, 3)))
            return out

        t0_all = time.perf_counter()
        docs = table(spark, sf_dir, "documents")
        gated = stage(
            "quality_gate",
            filtering.apply_corpus_filter(
                docs, t,
                min_tokens=cfg.min_tokens, max_tokens=cfg.max_tokens,
                allowed_langs=cfg.allowed_langs,
            ).where("keep").select(*docs.columns),
        )
        exact_keep = dedup_ops.exact_dup_groups(gated, t, i).select(
            F.col("keep_id").alias(i)
        )
        exact = stage("exact_dedup", gated.join(exact_keep, i, "semi"))
        pairs = dedup_ops.near_dup_pairs_minhash(
            exact, t, i,
            n_shingle=cfg.n_shingle, jaccard_threshold=cfg.jaccard_threshold,
        )
        pairs_m = stage("lsh_pairs", pairs)
        spark.sparkContext.setJobDescription("stage:clusters")
        tc = time.perf_counter()
        drops = (
            dedup_ops.dedup_clusters(pairs_m, id_col=i)
            .where(~F.col("keep")).select(i)
        )
        drops_m = drops.localCheckpoint(eager=True)
        timings.append(("clusters", round(time.perf_counter() - tc, 3)))
        near = stage("near_anti_join", exact.join(drops_m, i, "left_anti"))
        capped = stage(
            "domain_cap",
            filtering.cap_per_group(near, cfg.source_col, cfg.per_source_cap, i),
        )
        split = stage(
            "split_assign", capped.withColumn("split", curation.split_col(i, cfg))
        )
        held_out = split.where(F.col("split") == "test")
        leaks = dedup_ops.exact_ngram_collisions(
            split.where(F.col("split") != "test"), held_out, t, i, n=cfg.leak_ngram
        ).select(i)
        out = stage("decontaminate", split.join(leaks, i, "left_anti"))
        total = round(time.perf_counter() - t0_all, 3)
        print(f"round {r}: total={total}  " +
              "  ".join(f"{n}={s}" for n, s in timings))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
