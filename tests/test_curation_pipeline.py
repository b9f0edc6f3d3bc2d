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


def test_curation_observed_report_is_exact(spark, sf_dir):
    """r15: counts=True derives the report from CollectMetrics observations
    fired inside the hub materializations (no per-stage checkpoint+count
    jobs). Pin EXACTNESS: every reported count must equal an independent
    plain recomputation of that stage, and the audited output must match
    the counts=False twin row-for-row. Guards the two observe failure
    modes — a filter pushed below an observe node (undercount) and a
    double-fired observed subtree (overcount)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = curation.CurationConfig(
        allowed_langs=("en", "de", "fr", "es", "zh", "und"),
        min_tokens=3,
        per_source_cap=40,
    )
    out, report = curation.curate_corpus(docs, cfg, counts=True)

    t, i = cfg.text_col, cfg.id_col
    from simple_pos_kafka_pyspark_airflow_spark.llm import filtering

    gated = (
        filtering.apply_corpus_filter(
            docs, t, min_tokens=cfg.min_tokens, max_tokens=cfg.max_tokens,
            allowed_langs=cfg.allowed_langs,
        )
        .where("keep")
        .select(*docs.columns)
    )
    ek = dedup.exact_dup_groups(gated, t, i).select(F.col("keep_id").alias(i))
    exact = gated.join(ek, i, "semi")
    pairs = dedup.near_dup_pairs_minhash(
        exact, t, i, n_shingle=cfg.n_shingle,
        jaccard_threshold=cfg.jaccard_threshold,
    )
    drops = dedup.dedup_clusters(pairs, id_col=i).where(~F.col("keep")).select(i)
    near = exact.join(drops, i, "left_anti")
    capped = filtering.cap_per_group(near, cfg.source_col, cfg.per_source_cap, i)
    split = capped.withColumn("split", curation.split_col(i, cfg))
    leaks = dedup.exact_ngram_collisions(
        split.where(F.col("split") != "test"),
        split.where(F.col("split") == "test"),
        t, i, n=cfg.leak_ngram,
    ).select(i)
    final = split.join(leaks, i, "left_anti")
    expect = [
        ("raw", docs.count()),
        ("quality_gate", gated.count()),
        ("exact_dedup", exact.count()),
        ("near_dedup", near.count()),
        ("domain_cap", capped.count()),
        ("decontaminated", final.count()),
    ]
    assert report == expect

    lazy_out, _ = curation.curate_corpus(docs, cfg, counts=False)
    cols = ["doc_id", "source", "split"]
    a = sorted(tuple(r) for r in out.select(*cols).collect())
    b = sorted(tuple(r) for r in lazy_out.select(*cols).collect())
    assert a == b


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


def test_drop_reasons_exercise_every_stage(spark):
    """curation_drop_reasons on a corpus planted to hit EVERY stage: a
    too-short doc (quality), a byte-copy (exact_dup), a near-dup
    (near_dup), a source over the cap (domain_cap), a train doc sharing a
    5-gram with a test doc (decontaminated), and survivors (kept). The
    reason is the FIRST dropping stage, and every input doc gets exactly
    one row."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    # find a test-split id and a train/val id deterministically
    KNUTH = 2654435761
    test_id = next(i for i in range(200, 400) if (i * KNUTH) % 100 >= 90)
    train_id = next(i for i in range(500, 700) if (i * KNUTH) % 100 < 90)
    leak_text = "the secret answer is purple exactly here now"
    rows = [
        (1, base, "s1"),
        (2, "xx", "s1"),
        (3, base, "s1"),
        (4, base + " kilo", "s1"),
        (train_id, leak_text, "s2"),
        (test_id, leak_text + " with extra trailing words appended here", "s3"),
    ]
    # overflow source s4 past the cap
    cap = 3
    for k in range(cap + 2):
        rows.append((1000 + k, f"unique{k} filler{k} pad{k} words{k} here{k}", "s4"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    cfg = curation.CurationConfig(
        min_tokens=3,
        allowed_langs=("en", "de", "fr", "es", "zh", "und"),
        per_source_cap=cap,
        jaccard_threshold=0.8,
    )
    got = {r["doc_id"]: r["stage"]
           for r in curation.curation_drop_reasons(df, cfg).collect()}
    assert len(got) == len(rows)  # one row per input doc
    assert got[2] == "quality"
    assert got[3] == "exact_dup"
    assert got[4] == "near_dup"
    assert got[1] == "kept"
    # the leak pair: the train/val doc decontaminates, the test doc stays
    assert got[train_id] == "decontaminated"
    assert got[test_id] == "kept"
    # exactly 2 of the s4 docs hit the cap
    s4 = [got[1000 + k] for k in range(cap + 2)]
    assert s4.count("domain_cap") == 2 and s4.count("kept") == cap
    assert set(got.values()) == {"quality", "exact_dup", "near_dup",
                                 "domain_cap", "decontaminated", "kept"}


def test_end_to_end_corpus_to_shards_and_index(spark, sf_dir, tmp_path):
    """The whole production story composed: curate the raw corpus, gate
    it against an eval set's Bloom bitmap, export balanced shards (one
    file each), build the persistent ANN index over the survivors'
    embeddings, and audit the index's recall — every stage consuming the
    previous stage's real output, nothing mocked."""
    import glob
    import os

    from simple_pos_kafka_pyspark_airflow_spark.llm import simsearch
    from simple_pos_kafka_pyspark_airflow_spark.streaming.ann import IncrementalIvfIndex
    from simple_pos_kafka_pyspark_airflow_spark.streaming.corpus import PersistentBloomGate

    # 1. curation ladder
    out, report, cfg = _survivors(spark, sf_dir)
    n_curated = out.count()
    assert n_curated > 0

    # 2. eval-set decontamination over the CURATED corpus: plant the
    # eval set as a slice of surviving docs so the gate provably fires
    evalset = out.select("doc_id", "text").orderBy("doc_id").limit(5)
    gate_path = str(tmp_path / "gate")
    PersistentBloomGate(spark, gate_path).fit(evalset, m_bits=1 << 20)
    clean = PersistentBloomGate(spark, gate_path).clean_batch(
        out.select("doc_id", "text", "source", "split")
    )
    n_clean = clean.count()
    assert n_clean <= n_curated - 5, "planted eval docs must be rejected"

    # 3. shard export: one file per shard, nothing lost
    n_shards = 4
    shard = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(n_shards)).cast("int")
    shard_path = str(tmp_path / "shards")
    clean.withColumn("shard", shard).repartition(n_shards, "shard").write.partitionBy(
        "shard"
    ).parquet(shard_path)
    assert spark.read.parquet(shard_path).count() == n_clean
    for d in glob.glob(os.path.join(shard_path, "shard=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1

    # 4. ANN index over the clean survivors' embeddings
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    surviving_emb = emb.join(clean.select(F.col("doc_id").alias("vec_id")), "vec_id")
    idx = IncrementalIvfIndex(spark, str(tmp_path / "ann"), n_cells=8)
    idx.fit(surviving_emb)
    idx.ingest_batch(surviving_emb)

    # 5. recall audit: probing a stored vector must return itself first
    probe_row = surviving_emb.orderBy("vec_id").first()
    got = idx.probe(list(probe_row["embedding"]), k=3, nprobe=8).collect()
    assert got[0]["vec_id"] == probe_row["vec_id"]
    assert abs(got[0]["score"] - 1.0) < 1e-6
