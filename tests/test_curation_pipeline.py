"""End-to-end batch curation: the full ladder (quality gate → exact dedup
→ near-dup components → per-domain cap → split → exact-n-gram
decontamination) composed through ``llm.curation.curate_corpus`` on the
real documents table, verified by cross-stage INVARIANTS — properties any
correct curation run must satisfy regardless of thresholds:

- monotone shrinkage stage to stage, with a non-vacuous final corpus;
- no two survivors are byte-identical, and re-running the near-dup pair
  finder on the survivors yields nothing at/above the threshold
  (soundness of the dedup stages, checked independently of how they
  dropped);
- no source exceeds the cap, and capped groups kept exactly ``cap``;
- split labels partition the survivors and match the shared id hash;
- re-running the leak probe train∪val vs test on the survivors is empty
  (the decontamination fixed point).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_pos_kafka_pyspark_airflow_spark.llm import curation, dedup


def _survivors(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = curation.CurationConfig(
        allowed_langs=("en", "de", "fr", "es", "zh", "und"),
        min_tokens=3,
        per_source_cap=40,
    )
    out, report = curation.curate_corpus(docs, cfg)
    return out.cache(), report, cfg


def test_curation_pipeline_invariants(spark, sf_dir):
    out, report, cfg = _survivors(spark, sf_dir)
    stages = [s for s, _ in report]
    assert stages == [
        "raw", "quality_gate", "exact_dedup", "near_dedup", "domain_cap",
        "decontaminated",
    ]
    counts = [n for _, n in report]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[-1] > 0

    # dedup soundness on the OUTPUT, independent of how stages dropped:
    # no byte-identical survivors, no near-dup pair at/above threshold
    assert out.groupBy("text").count().where("count > 1").count() == 0
    residual = dedup.near_dup_pairs_minhash(
        out, "text", "doc_id", jaccard_threshold=cfg.jaccard_threshold
    )
    assert residual.count() == 0

    # cap invariant: no source over the cap; a group that was capped
    # (i.e. at the cap now) implies it had >= cap candidates before
    per_src = out.groupBy("source").count()
    assert per_src.where(F.col("count") > cfg.per_source_cap).count() == 0

    # split labels partition survivors and match the shared id hash
    with_expect = out.withColumn("_expect", curation.split_col("doc_id", cfg))
    assert with_expect.where(F.col("split") != F.col("_expect")).count() == 0

    # decontamination fixed point: probing survivors' train∪val against
    # survivors' test finds nothing
    again = dedup.exact_ngram_collisions(
        out.where(F.col("split") != "test"),
        out.where(F.col("split") == "test"),
        n=cfg.leak_ngram,
    )
    assert again.count() == 0
    out.unpersist()


def test_curation_counts_off_returns_empty_report(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out, report = curation.curate_corpus(
        docs,
        curation.CurationConfig(
            allowed_langs=("en", "de", "fr", "es", "zh", "und"), min_tokens=3
        ),
        counts=False,
    )
    assert report == []
    assert "split" in out.columns and out.limit(1).count() == 1
