"""Incremental MinHash-LSH dedup against a persisted signature store.

The batch operators in :mod:`.neardup` recompute the whole corpus per run.
A production training-data pipeline is incremental (the reference's whole
design is watermark CDC, ref: 02_ingestion.py:75-94): batch N+1 must dedup
*new* documents against the already-indexed corpus WITHOUT re-reading or
re-shingling the old text. This module persists the MinHash index as two
warehouse tables and probes it per batch:

- ``{name}_docs``  — (id, sig array<long>), the per-doc signature index,
  bucketed on the doc id.
- ``{name}_sets``  — (id, shingles array<string>), the shingle sets,
  bucketed on the doc id, so the exact-Jaccard verification of a future
  candidate never goes back to the raw text. Split from the signatures
  (columnar, guide §6): the sets are a property of the corpus alone, so
  an index rebuild under new LSH knobs (``reuse_sets=True``) rewrites
  only signatures + postings — the corpus's heaviest artifact is written
  once per corpus.
- ``{name}_bands`` — (id, band, bucket), the LSH postings, bucketed on
  (band, bucket): the per-batch candidate probe joins on exactly those
  keys, so the STORED side is read co-partitioned from disk and only the
  (small) new-batch band rows shuffle. At 100 TB this is the difference
  between "join against the corpus" and "shuffle the corpus every day".
- ``{name}_meta``  — one row of the index knobs (n, num_hashes, bands,
  seed, hasher); probes validate against it so a batch can never be
  signed with mismatched parameters and silently miss every duplicate.

Incremental probing is EXACTLY equivalent to full recompute restricted to
pairs touching the new batch: a pair collides in band i iff their band-i
signature slices hash to the same bucket, and a document's signature
depends only on its own text — never on the rest of the corpus. The
driver query ``incremental_minhash_dedup`` pins this equivalence against
a DuckDB oracle that recomputes the FULL union and filters to new-doc
pairs; ``tests/test_neardup_incremental.py`` additionally pins it against
the batch operator and asserts the no-retext/no-corpus-shuffle plan
properties.

Scale shape per batch: shingle/sign the new docs only (one text pass, one
doc-id shuffle), one bucketed probe join for new-vs-old, one tiny
self-join for new-vs-new, verification joins keyed on the bucketed doc id
(stored side again read in place), then a bucketed append of the new
signatures. The corpus index is never rewritten, only appended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.warehouse import Warehouse
from .neardup import (
    _hash64,
    _materialized,
    band_rows,
    shingle_rows,
    sig_expr,
    HASH_PRIME,
)

_DOCS, _BANDS, _META, _SETS = "_docs", "_bands", "_meta", "_sets"


def _fresh_table(spark, table: str):
    """Catalog read with the relation cache invalidated first — a
    foreachBatch clone's bucketed append updates files but not other
    sessions' cached listings (see ann_index._fresh_table)."""
    spark.catalog.refreshTable(table)
    return spark.table(table)


def _index_rows(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    seed: int,
    hasher: str,
) -> DataFrame:
    """(id, shingles, sig) in ONE aggregate: the shingle rows feed the
    collect_set AND the K signature minimums in the same groupBy, so the
    text is processed once and the shuffle carries one row per doc. The
    fold hash is computed per shingle ROW before the aggregate — putting
    ``_hash64`` inside each of the K min() expressions would evaluate the
    (md5) hash K times per row."""
    srows = shingle_rows(docs, id_col=id_col, text_col=text_col, n=n)
    hashed = srows.select(
        F.col(id_col),
        F.col("shingle"),
        F.pmod(_hash64(F.col("shingle"), hasher), F.lit(HASH_PRIME)).alias("h"),
    )
    return hashed.groupBy(id_col).agg(
        F.collect_set("shingle").alias("shingles"),
        sig_expr(num_hashes, seed).alias("sig"),
    )


def build_minhash_index(
    warehouse: Warehouse,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    hasher: str = "xxhash64",
    name: str = "minhash_index",
    num_buckets: int = 16,
    reuse_sets: bool = False,
) -> None:
    """Full (re)build of the signature store from ``docs``.

    The store is COLUMNAR-SPLIT (guide §6, narrow the bytes written):
    ``{name}_sets`` holds the heavy shingle arrays — a property of the
    corpus and the shingle width alone — while ``{name}_docs`` holds only
    the (id, sig) signatures the LSH index actually depends on. With
    ``reuse_sets=True`` a rebuild under NEW index knobs (num_hashes /
    bands / seed) derives signatures from the STORED sets and rewrites
    only docs + bands + meta: the corpus's largest artifact is written
    once per corpus, never re-read from raw text nor rewritten per
    index rebuild. ``n``/``hasher``/``num_buckets``/``id_col`` shape the
    STORED sets, so a reuse rebuild validates them against the stored
    meta and refuses loudly on mismatch — a silent mismatch would
    Jaccard-verify w-shingles against w'-shingle sets and miss every
    cross-corpus duplicate."""
    if not 1 <= bands <= num_hashes or num_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    if reuse_sets:
        meta_now = _load_meta(warehouse, name)
        fixed = {
            "id_col": id_col, "n": n, "hasher": hasher,
            "num_buckets": num_buckets,
        }
        bad = {
            k: (v, meta_now[k]) for k, v in fixed.items()
            if meta_now[k] != v
        }
        if bad:
            raise ValueError(
                "reuse_sets=True may only change num_hashes/bands/seed; "
                f"these knobs shape the stored sets and differ: {bad}"
            )
        # signatures from the stored shingle sets: explode the stored
        # array column (a materialized attribute — plain codegen
        # Generate, not an HOF-built array), fold-hash each shingle,
        # re-aggregate the K minimums. No raw-text scan, no sets write.
        stored_sets = _fresh_table(warehouse.spark, f"{name}{_SETS}")
        hashed = stored_sets.select(
            F.col(id_col), F.explode("shingles").alias("shingle")
        ).select(
            F.col(id_col),
            F.pmod(
                _hash64(F.col("shingle"), hasher), F.lit(HASH_PRIME)
            ).alias("h"),
        )
        idx = _materialized(
            hashed.groupBy(id_col).agg(
                sig_expr(num_hashes, seed).alias("sig")
            )
        )
    else:
        # ONE aggregate feeds three writes, so the index rows persist
        # (MEMORY_AND_DISK; released via neardup.release_cached) — the
        # sets write materializes the cache and the docs/bands writes
        # read it, replacing the old combined-write + parquet read-back
        # (same-minute A/B: 2.83 s -> 2.34 s steady-state at sf0.1)
        idx = _materialized(
            _index_rows(
                docs, id_col=id_col, text_col=text_col, n=n,
                num_hashes=num_hashes, seed=seed, hasher=hasher,
            )
        )
        warehouse.save_bucketed(
            idx.select(id_col, "shingles"), f"{name}{_SETS}", (id_col,),
            num_buckets=num_buckets,
        )
    warehouse.save_bucketed(
        idx.select(id_col, "sig"), f"{name}{_DOCS}", (id_col,),
        num_buckets=num_buckets,
    )
    warehouse.save_bucketed(
        band_rows(
            idx.select(id_col, "sig"), id_col=id_col,
            num_hashes=num_hashes, bands=bands, hasher=hasher,
        ),
        f"{name}{_BANDS}",
        ("band", "bucket"),
        num_buckets=num_buckets,
    )
    from ..session import tiny_df

    meta = tiny_df(
        warehouse.spark,
        [(id_col, n, num_hashes, bands, seed, hasher, num_buckets)],
        "id_col string, n int, num_hashes int, bands int, seed int, "
        "hasher string, num_buckets int",
    )
    warehouse.overwrite(meta, f"{name}{_META}")


def _load_meta(warehouse: Warehouse, name: str) -> dict:
    row = warehouse.read(f"{name}{_META}").collect()
    if len(row) != 1:
        raise ValueError(f"index {name!r} has no valid meta table")
    return row[0].asDict()


def scrub_batch_ids(
    warehouse: Warehouse,
    batch_docs: DataFrame,
    *,
    name: str = "minhash_index",
) -> bool:
    """Torn-replay repair: if any of ``batch_docs``'s ids already sit in
    the signature store (new ids are disjoint from stored ids by the CDC
    contract, so presence ⟹ a previous attempt appended them before
    crashing short of its commit), rebuild the store WITHOUT those ids.
    Returns True when a scrub ran. Cheap-probe first (bucketed semi-join,
    limit 1); the full-table rewrite happens only on the rare torn path.
    Leaving the stale rows in place would make the replayed batch match
    ITSELF in the store (self-pairs at jaccard 1.0) and double every
    posting."""
    meta = _load_meta(warehouse, name)
    id_col, num_buckets = meta["id_col"], meta["num_buckets"]
    spark = warehouse.spark
    ids = batch_docs.select(id_col).distinct()
    stored_docs = _fresh_table(spark, f"{name}{_DOCS}")
    if not stored_docs.join(ids, id_col, "left_semi").limit(1).count():
        return False
    # save_bucketed DROPS the table before rewriting, so the cleaned rows
    # must be fully materialized off the old files first — an eager
    # localCheckpoint cuts the lineage at in-memory blocks (a lazy persist
    # would still scan the just-deleted files on first use)
    clean_docs = stored_docs.join(ids, id_col, "left_anti").localCheckpoint()
    clean_sets = (
        _fresh_table(spark, f"{name}{_SETS}")
        .join(ids, id_col, "left_anti")
        .localCheckpoint()
    )
    clean_bands = (
        _fresh_table(spark, f"{name}{_BANDS}")
        .join(ids, id_col, "left_anti")
        .localCheckpoint()
    )
    warehouse.save_bucketed(
        clean_docs, f"{name}{_DOCS}", (id_col,), num_buckets=num_buckets
    )
    warehouse.save_bucketed(
        clean_sets, f"{name}{_SETS}", (id_col,), num_buckets=num_buckets
    )
    warehouse.save_bucketed(
        clean_bands, f"{name}{_BANDS}", ("band", "bucket"),
        num_buckets=num_buckets,
    )
    return True


def incremental_minhash_pairs(
    warehouse: Warehouse,
    new_docs: DataFrame,
    *,
    text_col: str = "text",
    threshold: float = 0.5,
    name: str = "minhash_index",
    append: bool = True,
) -> DataFrame:
    """Near-dup pairs of ``new_docs`` vs (stored corpus ∪ the batch
    itself), verified by exact Jaccard ≥ ``threshold``. New doc ids must
    be disjoint from the stored ids (watermark CDC guarantees this; the
    merge path handles replays upstream).

    Returns (id_a, id_b, intersection, jaccard), id_a < id_b, at least
    one side new. With ``append=True`` the batch's signatures join the
    index afterwards (bucketed append — the stored corpus is not
    rewritten), and the pair result is first written to ``{name}_pairs``
    and returned as a read of those files: the append INVALIDATES any
    cached plan that references the store tables (Spark recaches catalog
    tables on insert), so a lazily-returned plan would silently recompute
    against the post-append store — finding each new doc as a duplicate
    of itself. The written artifact is also what a real pipeline wants:
    batch N's dedup verdict, durable next to the index.
    """
    meta = _load_meta(warehouse, name)
    id_col, n = meta["id_col"], meta["n"]
    num_hashes, bands_n, seed = meta["num_hashes"], meta["bands"], meta["seed"]
    hasher, num_buckets = meta["hasher"], meta["num_buckets"]
    spark = warehouse.spark

    new_idx = _materialized(
        _index_rows(
            new_docs, id_col=id_col, text_col=text_col, n=n,
            num_hashes=num_hashes, seed=seed, hasher=hasher,
        )
    )
    new_bands = _materialized(
        band_rows(
            new_idx, id_col=id_col, num_hashes=num_hashes,
            bands=bands_n, hasher=hasher,
        )
    )
    stored_bands = _fresh_table(spark, f"{name}{_BANDS}")
    stored_sets = _fresh_table(spark, f"{name}{_SETS}")

    # new-vs-old: probe the bucketed postings on its bucketing keys — the
    # stored side is read co-partitioned from disk, only new rows shuffle.
    # Old ids can sort either side of the pair: normalize via least/greatest.
    probe = new_bands.select(F.col(id_col).alias("id_n"), "band", "bucket")
    old = stored_bands.select(F.col(id_col).alias("id_o"), "band", "bucket")
    no_pairs = (
        probe.join(old, ["band", "bucket"])
        .select(
            F.least("id_n", "id_o").alias("id_a"),
            F.greatest("id_n", "id_o").alias("id_b"),
        )
    )
    # new-vs-new: the batch against itself (tiny self-join)
    left = new_bands.select(F.col(id_col).alias("id_a"), "band", "bucket")
    right = new_bands.select(F.col(id_col).alias("id_b"), "band", "bucket")
    nn_pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    cands = no_pairs.unionByName(nn_pairs).dropDuplicates(["id_a", "id_b"])

    # verification sets: new docs from the in-batch index, old docs from
    # the stored SETS table (shingles stored once per corpus, bucketed on
    # the doc id — the raw text is never re-read)
    sets = stored_sets.select(id_col, "shingles").unionByName(
        new_idx.select(id_col, "shingles")
    )
    cands = cands.join(
        sets.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")),
        "id_a",
    ).join(
        sets.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    out = (
        cands.withColumn("intersection", inter.cast("long"))
        .withColumn("jaccard", F.col("intersection") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "intersection", "jaccard")
    )
    if append:
        # execute against the PRE-append store, then append (columnar
        # split: the sig index and the shingle sets are separate tables)
        warehouse.overwrite(out, f"{name}_pairs")
        out = warehouse.read(f"{name}_pairs")
        warehouse.append_bucketed(
            new_idx.select(id_col, "sig"), f"{name}{_DOCS}", (id_col,),
            num_buckets=num_buckets,
        )
        warehouse.append_bucketed(
            new_idx.select(id_col, "shingles"), f"{name}{_SETS}", (id_col,),
            num_buckets=num_buckets,
        )
        warehouse.append_bucketed(
            new_bands, f"{name}{_BANDS}", ("band", "bucket"), num_buckets=num_buckets
        )
    return out
