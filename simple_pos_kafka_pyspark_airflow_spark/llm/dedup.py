"""Deduplication operators for document corpora.

Four tiers, cheapest-first — the standard 100 TB dedup ladder:

1. **exact**: group by the raw text (or its hash) — one shuffle on a
   64-128 bit key; at scale hash first (``sha2``) so the shuffle key is
   fixed-width instead of document-sized.
2. **token-bag**: group by the *sorted token array* — catches reorderings
   and whitespace variants; still a single shuffle.
3. **MinHash + LSH** (``near_dup_pairs_minhash``): shingle → k independent
   min-hashes → band signatures → candidates share a band bucket →
   verified by exact Jaccard. Shuffle cost O(docs × bands), never O(docs²).
4. **embedding cosine** (see ``simsearch``): semantic near-dup.

Everything below is built-in columnar Spark (xxhash64, transform,
array ops) — no Python in any per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import tokens


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact-duplicate groups: canonical (min) id + multiplicity per
    distinct text. ``sha2`` digest as group key keeps shuffle rows small —
    the text itself never shuffles."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def token_bag_key(text: Column) -> Column:
    """Order-insensitive content key: sorted whitespace tokens re-joined.
    Catches shuffled/duplicated-with-reordering documents that exact dedup
    misses (present in the testdata: jaccard-1.0 pairs)."""
    return F.array_join(F.array_sort(tokens(text)), " ")


def token_bag_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Near-dup groups under the token-bag key; same shuffle shape as
    exact dedup."""
    return (
        df.withColumn("bag_key", token_bag_key(F.col(text_col)))
        .groupBy("bag_key")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles of the token stream (distinct)."""
    toks = tokens(F.lower(text))
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(F.array_distinct(grams))


def minhash_signature(shingle_arr: Column, num_hashes: int = 64) -> Column:
    """k independent min-hashes via seeded xxhash64 — deterministic, no
    random state, JVM-side. Returns array<long> of length ``num_hashes``."""
    return F.array(
        *[F.array_min(F.transform(shingle_arr, lambda s, i=i: F.xxhash64(s, F.lit(i)))) for i in range(num_hashes)]
    )


def lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Band the signature: array of (band_id, band_hash) structs. Two docs
    collide on a band iff their ``rows`` consecutive minhashes all match."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.array_join(F.slice(signature, b * rows + 1, rows), ",")).alias("bucket"),
        ),
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_shingle: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Candidate generation + exact verification:

    doc → shingles → 64 minhashes → 16 bands of 4 → explode bands →
    self-join on (band, bucket) → exact shingle-Jaccard filter.

    Scale analysis: the only shuffle is the band-bucket join, keyed on a
    64-bit hash with fan-out ``bands`` per doc. Hot buckets (boilerplate
    docs) are the skew risk — AQE skew-join splits them; a production run
    adds a bucket-size cap. Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), n_shingle).alias("_sh"),
    ).withColumn("_bands", lsh_bands(minhash_signature(F.col("_sh"), num_hashes), bands, rows))
    banded = base.select("_id", "_sh", F.explode("_bands").alias("b"))
    left = banded.select(
        F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), F.col("b").alias("band_a")
    )
    right = banded.select(
        F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), F.col("b").alias("band_b")
    )
    cand = (
        left.join(
            right,
            (left.band_a == right.band_b) & (left.id_a < right.id_b),
        )
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        cand.withColumn("jaccard", F.round(jac, 4))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: Column) -> Column:
    """64-bit SimHash of the token stream: per-token xxhash64, sum ±1 per
    bit position, sign → bit. Near-dups differ in few bits (Hamming).

    Columnar construction: for each bit b, count tokens with bit b set,
    compare against half the token count, OR the winning bits together.
    """
    toks = tokens(F.lower(text))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(hashes)
    bit_terms = []
    for b in range(64):
        ones = F.size(
            F.filter(hashes, lambda h, b=b: h.bitwiseAND(F.lit(1 << b if b < 63 else -(1 << 63))) != 0)
        )
        bit_terms.append(
            F.when(ones * 2 >= n, F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out.bitwiseOR(t)
    return out


def near_dup_pairs_simhash(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup: block on the 4 16-bit quarters of the simhash
    (pigeonhole: ≤3 differing bits ⇒ at least one identical quarter), then
    verify the Hamming distance exactly. Shuffle is O(docs × 4) on 16-bit
    buckets — never quadratic."""
    sh = df.select(F.col(id_col).alias("_id"), simhash64(F.col(text_col)).alias("_sim"))
    quarters = sh.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned("_sim", q * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("blk"),
    )
    a = quarters.select(F.col("_id").alias("id_a"), F.col("_sim").alias("sim_a"), "blk")
    b = quarters.select(F.col("_id").alias("id_b"), F.col("_sim").alias("sim_b"), F.col("blk").alias("blk_b"))
    cand = (
        a.join(b, (a.blk == b.blk_b) & (a.id_a < b.id_b))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, blocked)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs_blocked(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard within user-chosen blocking keys (e.g.
    same length band + language). Quadratic only *within* a block — the
    caller's blocking choice is the scale knob. Oracle-expressible, unlike
    the hash-based tiers."""
    base = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in block_cols],
        F.array_distinct(shingles(F.col(text_col), n)).alias("_sh"),
    )
    a = base.select(
        F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), *[F.col(c) for c in block_cols]
    )
    b = base.select(
        F.col("_id").alias("id_b"),
        F.col("_sh").alias("sh_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
    )
    cond = (a.id_a < b.id_b)
    for c in block_cols:
        cond = cond & (a[c] == b[f"{c}_b"])
    pairs = a.join(b, cond)
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.greatest(
        F.size(F.array_union("sh_a", "sh_b")), F.lit(1)
    )
    return (
        pairs.withColumn("jaccard", F.round(jac, 4))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
