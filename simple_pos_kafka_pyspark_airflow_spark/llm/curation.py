"""The end-to-end batch curation pipeline: every stage a pretraining
corpus passes through between raw crawl and tokenizer, composed from the
operators this package already ships — one call, one lineage, one report.

Stage order is the standard one (public practice: C4/RefinedWeb/Gopher
pipelines) and it matters:

1. quality gate first — cheapest per-row test drops the most volume
   before anything shuffles;
2. exact dedup before near-dup — byte-identical copies are the bulk of
   duplication and cost one digest shuffle, so the quadratic-ish LSH
   stage sees the smallest possible corpus;
3. near-dup clusters keep one representative per connected component
   (min id — deterministic, chain-exact);
4. per-domain cap after dedup — capping before dedup would let a
   domain's surviving quota be eaten by duplicates;
5. split assignment is pure id arithmetic (no data movement), then
6. decontamination LAST: train docs sharing an exact n-gram with the
   held-out split are quarantined, so nothing later can reintroduce
   leakage.

Each stage's plan is the one its operator documents (see docs/SCALE.md);
composing them adds no new shuffles beyond the stages' own. The report
is a tiny driver-side list of (stage, rows). On BOTH paths the
MULTI-CONSUMER hubs (``gated``, ``exact``, ``split``) materialize
exactly once (``cacheutil.materialize`` — localCheckpoint locally,
reliable checkpoint under the cluster profile): the final action is one
job whose concurrent stages all probe those frames, so leaving them
lazy (or merely persist()-ed — blocks don't exist until the racing
stages have each already computed them) duplicates whole-stage compute;
r9/r10 measured the fully-lazy form SLOWER. Single-consumer stages
(``near``, ``capped``, the final anti-join) stay lazy.

With ``counts=True`` the per-stage row counts come from
``DataFrame.observe`` (``CollectMetrics``) nodes attached directly
below the hub materialization boundaries, so every count is computed
DURING a pass the lazy pipeline already pays — zero extra count jobs,
zero extra materializations except the final output (whose eager
materialization delivers the ``decontaminated`` count before the
report returns). Exactness: each observed subtree sits under exactly
one eager materialization and above only checkpointed inputs, so its
CollectMetrics fires exactly once — placement is load-bearing; a node
with two live consumers in one job could double-fire. (r14 and before,
counts=True instead localCheckpoint+count-ed all SEVEN stages
including the raw input — 13 actions vs the observed form's 4; the
r15 bench prices the audit at ≈ the e2e twin + one materialization.)
The near-dup component stage (``dedup.dedup_clusters``) is inherently
iterative and runs its label-propagation rounds eagerly at build time
on either path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..cacheutil import materialize
from . import dedup as dedup_ops
from . import filtering


@dataclass(frozen=True)
class CurationConfig:
    text_col: str = "text"
    id_col: str = "doc_id"
    source_col: str = "source"
    # quality gate (filtering.apply_corpus_filter thresholds)
    min_tokens: int = 10
    max_tokens: int = 100_000
    allowed_langs: tuple[str, ...] = ("en",)
    # near-dup
    jaccard_threshold: float = 0.8
    n_shingle: int = 3
    # domain cap
    per_source_cap: int = 1_000_000
    # split: (id · KNUTH) mod 100 — same hash as q_split_hash/q_pack_sequences
    train_pct: int = 80
    val_pct: int = 10
    # decontamination
    leak_ngram: int = 5


_KNUTH = 2654435761


def split_col(id_col: str, cfg: CurationConfig) -> F.Column:
    """Deterministic split assignment: pure arithmetic on the stable id,
    identical to ``q_split_hash``/``q_pack_sequences`` so every pipeline
    stage and oracle agrees on membership."""
    bucket = (F.col(id_col) * F.lit(_KNUTH)) % 100
    return (
        F.when(bucket < cfg.train_pct, "train")
        .when(bucket < cfg.train_pct + cfg.val_pct, "val")
        .otherwise("test")
    )


def curate_corpus(
    docs: DataFrame,
    cfg: CurationConfig = CurationConfig(),
    counts: bool = True,
    return_frames: bool = False,
):
    """Run the full curation ladder; returns ``(survivors, report)`` where
    survivors carry a ``split`` column and report is ``[(stage, rows)]``
    (empty when ``counts=False``). With ``return_frames=True`` a third
    element carries the intermediate stage frames
    (``gated``/``exact``/``near``/``capped``/``leak_ids``) for the
    drop-reason audit (``curation_drop_reasons``) — same single run, no
    recomputation.

    Survivor rows are a subset of input rows (original columns + split) —
    no stage rewrites text, so provenance is the id.
    """
    report: list[tuple[str, int]] = []
    observations: list[tuple[str, Observation]] = []

    def watch(stage: str, df: DataFrame) -> DataFrame:
        """Attach an exact row-count observation (CollectMetrics) for the
        audited report. Free on the pass that materializes the nearest
        downstream hub; each watched node must execute exactly once
        there (see the module docstring's placement argument)."""
        if not counts:
            return df
        obs = Observation(f"curation_{stage}")
        observations.append((stage, obs))
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    def hub(df: DataFrame) -> DataFrame:
        """Materialize a MULTI-CONSUMER stage boundary exactly once, on
        BOTH paths. A persist() is NOT enough here: the final action is
        one job whose concurrent stages (e.g. the decontamination join's
        two gram sides plus the anti-join's left) all probe the hub
        before any block exists, so each racing stage recomputes the
        full upstream chain — measured r9/r10 as the lazy form benching
        SLOWER than the then-audited form (8.9 vs 7.7s at sf0.1). The
        checkpoint also truncates lineage, keeping Catalyst's per-action
        analysis of the composed ladder bounded, and fires any pending
        observations below it. At cluster scale the same boundary is a
        reliable ``checkpoint()``/table write (cacheutil.materialize's
        cluster profile) — a frame with >1 consumer must materialize
        exactly once either way."""
        return materialize(df)

    t, i = cfg.text_col, cfg.id_col
    docs = watch("raw", docs)

    # 1. quality gate — one projection pass, bits dropped after the verdict
    gated = watch(
        "quality_gate",
        filtering.apply_corpus_filter(
            docs,
            t,
            min_tokens=cfg.min_tokens,
            max_tokens=cfg.max_tokens,
            allowed_langs=cfg.allowed_langs,
        )
        .where("keep")
        .select(*docs.columns),
    )

    # gated feeds TWO consumers (the exact-dup group build and the semi
    # join's left side) — a multi-consumer hub: materialize once (this
    # pass delivers the raw + quality_gate counts)
    gated = hub(gated)

    # 2. exact dedup — keep each byte-identical group's min id
    exact_keep = dedup_ops.exact_dup_groups(gated, t, i).select(
        F.col("keep_id").alias(i)
    )
    exact = watch("exact_dedup", gated.join(exact_keep, i, "semi"))

    # exact survivors feed three consumers (the minhash doc table, the
    # near-dedup anti-join's left side, and through it every later
    # stage) — hub (delivers the exact_dedup count)
    exact = hub(exact)

    # 3. near-dup — LSH pairs → connected components → keep the min-id
    #    representative of every component
    pairs = dedup_ops.near_dup_pairs_minhash(
        exact, t, i,
        n_shingle=cfg.n_shingle, jaccard_threshold=cfg.jaccard_threshold,
    )
    drops = (
        dedup_ops.dedup_clusters(pairs, id_col=i).where(~F.col("keep")).select(i)
    )
    near = watch("near_dedup", exact.join(drops, i, "left_anti"))

    # 4. per-domain cap — deterministic md5-rank sample within each source
    capped = watch(
        "domain_cap",
        filtering.cap_per_group(near, cfg.source_col, cfg.per_source_cap, i),
    )

    # 5. split assignment — no data movement
    split = capped.withColumn("split", split_col(i, cfg))
    # split feeds the decontamination join twice (train∪val side, test
    # side) and the final anti-join — hub (near → capped → split is one
    # single-consumer chain, so this pass delivers the near_dedup +
    # domain_cap counts)
    split = hub(split)

    # 6. decontamination — drop train/val docs sharing any exact n-gram
    #    with the held-out test split
    held_out = split.where(F.col("split") == "test")
    leaks = dedup_ops.exact_ngram_collisions(
        split.where(F.col("split") != "test"), held_out, t, i, n=cfg.leak_ngram
    ).select(i)
    out = watch(
        "decontaminated",
        split.join(leaks, i, "left_anti"),
    )
    if counts:
        # the ONE materialization the audit pays beyond the lazy twin:
        # the caller's action would fire the decontaminated count too,
        # but the report must be populated before this function returns.
        out = materialize(out)
        report.extend(
            (stage, int(obs.get["rows"])) for stage, obs in observations
        )
    if return_frames:
        frames = {
            "gated": gated, "exact": exact, "near": near,
            "capped": capped, "leak_ids": leaks,
        }
        return out, report, frames
    return out, report


#: CASE order of the drop-reason audit — a document's reason is the FIRST
#: ladder stage that dropped it (a doc dropped at the domain cap never
#: reaches decontamination, so later-stage membership is undefined for it).
DROP_STAGES = ("quality", "exact_dup", "near_dup", "domain_cap", "decontaminated")


def curation_drop_reasons(
    docs: DataFrame, cfg: CurationConfig = CurationConfig()
) -> DataFrame:
    """Per-document curation provenance: ``(id_col, stage)`` for EVERY
    input document, where ``stage`` is the first ladder stage that
    dropped it (``DROP_STAGES`` order) or ``'kept'`` — the audit table
    that answers "why did my corpus shrink 40%?" without re-running any
    stage by hand. Drop-rate-by-stage aggregates are one further
    ``groupBy(stage)``.

    Built from the ladder's own stage frames (same single run — no
    recomputation beyond id-set membership joins): five id-only left
    joins over broadcastable-or-id-shuffled marker sets, then one CASE.
    At 100 TB each marker join is keyed by the doc id — no text moves."""
    i = cfg.id_col
    _, _, fr = curate_corpus(docs, cfg, counts=False, return_frames=True)

    marked = docs.select(i)
    for name, frame in (
        ("_g", fr["gated"]), ("_e", fr["exact"]), ("_n", fr["near"]),
        ("_c", fr["capped"]), ("_l", fr["leak_ids"]),
    ):
        marked = marked.join(
            frame.select(F.col(i)).withColumn(name, F.lit(True)), i, "left"
        )
    stage = (
        F.when(F.col("_g").isNull(), "quality")
        .when(F.col("_e").isNull(), "exact_dup")
        .when(F.col("_n").isNull(), "near_dup")
        .when(F.col("_c").isNull(), "domain_cap")
        .when(F.col("_l").isNotNull(), "decontaminated")
        .otherwise("kept")
    )
    return marked.select(i, stage.alias("stage"))
