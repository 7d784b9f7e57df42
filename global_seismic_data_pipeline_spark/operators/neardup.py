"""Near-duplicate detection at corpus scale.

Three families, all deterministic (seeded) and UDF-free:

- **n-gram Jaccard (exact)**: explode distinct shingles → self-join on
  shingle → pair-intersection counts → Jaccard ≥ τ. Exhaustive and
  oracle-checkable; the shuffle key is the shingle, so extremely common
  shingles create skew — ``max_shingle_freq`` drops them (a standard
  stop-shingle cut; at 100 TB this is the difference between a bounded
  join and a quadratic blowup).
- **MinHash + LSH**: per-doc signature of K minimums over universal-hash
  permutations of shingle hashes, banded into B buckets; candidate pairs
  collide in ≥1 band and are then verified with exact Jaccard. All
  expression-level (transform/array_min over the shingle array — no
  explode, no shuffle until the tiny candidate join).
- **SimHash**: 48-bit sign-aggregated token-hash fingerprint; candidates
  pair via band equality on 12-bit chunks, verified by Hamming distance
  (bit_count(xor)).

MinHash/SimHash hashing uses xxhash64 — JVM-side and stable — so results
are reproducible but not expressible in ANSI SQL (the driver records a
rows-only check for those; the exact-Jaccard operator is the oracle-checked
ground truth).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_shingles

HASH_PRIME = 2147483647  # 2^31 - 1; keeps a*h + b within int64


def _minhash_perms(num: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, HASH_PRIME), rng.randrange(0, HASH_PRIME))
        for _ in range(num)
    ]


def shingle_sets(
    df: DataFrame, *, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingles array<string>) with empty-shingle docs dropped."""
    return df.select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("shingles")
    ).filter(F.size("shingles") > 0)


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact all-pairs Jaccard over word n-gram shingles (≥ threshold).

    Returns (id_a, id_b, intersection, size_a, size_b, jaccard) with
    id_a < id_b. ``max_shingle_freq`` removes shingles appearing in more
    than that many docs before the self-join (skew/size control)."""
    sets = shingle_sets(df, id_col=id_col, text_col=text_col, n=n)
    sizes = sets.select(F.col(id_col).alias("sid"), F.size("shingles").alias("set_size"))
    exploded = sets.select(
        F.col(id_col).alias("doc_id_"), F.explode("shingles").alias("shingle")
    )
    if max_shingle_freq is not None:
        freq_ok = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_shingle_freq)
            .select("shingle")
        )
        exploded = exploded.join(freq_ok, "shingle")
    a = exploded.select(F.col("doc_id_").alias("id_a"), "shingle")
    b = exploded.select(F.col("doc_id_").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("sid", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("sid", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("intersection")
            / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "intersection", "size_a", "size_b", "jaccard")


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>[num_hashes]) MinHash signatures.

    Shingle → xxhash64 → fold into [0, 2^31) → K universal-hash minimums,
    computed with transform/array_min inside codegen (no explode)."""
    sets = shingle_sets(df, id_col=id_col, text_col=text_col, n=n)
    hashed = sets.withColumn(
        "hvals",
        F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(HASH_PRIME))),
    )
    def perm_min(a: int, b: int) -> Column:
        return F.array_min(
            F.transform("hvals", lambda h: F.pmod(a * h + b, F.lit(HASH_PRIME)))
        )

    sig = F.array(*[perm_min(a, b) for a, b in _minhash_perms(num_hashes, seed)])
    return hashed.select(F.col(id_col), sig.alias("sig"), F.col("shingles"))


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification.

    Signatures band into ``bands`` groups of ``num_hashes/bands`` rows;
    docs sharing any band bucket become candidates; candidates are verified
    with exact Jaccard on the shingle sets. Output matches
    ``ngram_jaccard_pairs`` columns (minus sizes) for pairs LSH recalls."""
    rows = num_hashes // bands
    sigs = minhash_signatures(
        df, id_col=id_col, text_col=text_col, n=n, num_hashes=num_hashes, seed=seed
    )
    banded = sigs.select(
        F.col(id_col),
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.element_at("sig", i * rows + j + 1).cast("string") for j in range(rows)]
                            )
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(F.col(id_col), "shingles", F.col("bb.band"), F.col("bb.bucket"))

    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"), "band", "bucket"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"), "band", "bucket"
    )
    cands = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.withColumn("intersection", inter.cast("long"))
        .withColumn("jaccard", F.col("intersection") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "intersection", "jaccard")
    )


SIMHASH_BITS = 48
SIMHASH_BANDS = 4


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Sign-aggregated token-hash fingerprint as a long (bits ≤ 62).

    For each bit j: sum over tokens of ±1 by token-hash bit j; the
    fingerprint sets bit j when the sum is positive."""
    tokens = F.array_distinct(F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " "))
    hashed = F.transform(tokens, lambda t: F.xxhash64(t))
    def bit_vote(j: int) -> Column:
        return F.aggregate(
            hashed,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(bit_vote(j) > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash banding + Hamming verification.

    The 48-bit fingerprint splits into 4 × 12-bit chunks; by pigeonhole any
    pair within Hamming distance 3 shares at least one exact chunk, so the
    band join has full recall at ≤3 and the verify step is exact."""
    chunk_bits = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << chunk_bits) - 1
    sh = df.select(F.col(id_col), simhash(F.col(text_col)).alias("sh"))
    banded = sh.select(
        F.col(id_col),
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("sh", i * chunk_bits).bitwiseAND(F.lit(mask)).alias("chunk"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(F.col(id_col), "sh", F.col("bb.band"), F.col("bb.chunk"))
    left = banded.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), "band", "chunk")
    right = banded.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), "band", "chunk")
    return (
        left.join(right, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
