"""Incremental dedup — new batches against a persisted corpus index.

The batch dedup operators (``dedup.exact_duplicates``,
``dedup.minhash_lsh_pairs``) recompute over the WHOLE corpus; at 100 TB
the production flow is incremental: each day's crawl must be deduped
against everything already accepted without rescanning it. The trick
is that dedup never needs the accepted documents — only their
digests/signatures:

- **exact**: the index is one 16-byte content digest per accepted doc.
  A new batch is deduped intra-batch (min-id per digest), then
  anti-joined against the index — one shuffle each, both keyed on the
  digest; with the index bucketed by digest the anti-join is
  exchange-free.
- **near (MinHash)**: the index stores each accepted doc's k-long
  signature exploded into its LSH band keys. The new batch's bands
  equi-join the index bands (candidates only form inside a band
  bucket, same guarantee as the batch operator), signature agreement
  estimates Jaccard, and matches are dropped.

Survivors' digests/signatures are APPENDED to the index — the index
grows by O(new docs) per batch, is never rewritten, and is
O(corpus_docs × bytes-per-signature) total: the 100 TB corpus itself
is never rescanned. Re-ingesting the same batch drops every document
(its digests are now in the index) — replay-safe by construction.

Reference capability: this is the at-scale generalization of the
reference's id-keyed upsert idempotency (batch_processor.py:132-148),
extended from identity-by-id to identity-by-content/similarity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import dedup


def exact_dedup_incremental(
    new_docs: DataFrame,
    known_hashes: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Pure form: returns ``(survivors, new_hashes)``.

    ``known_hashes`` has one ``content_hash`` column (None → empty
    index). Survivors are intra-batch-unique (min id per digest) AND
    unseen in the index; ``new_hashes`` are exactly the survivors'
    digests, ready to append."""
    hashed = new_docs.withColumn("content_hash", F.md5(F.col(text_col)))
    w = Window.partitionBy("content_hash").orderBy(id_col)
    intra = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if known_hashes is not None:
        intra = intra.join(known_hashes, "content_hash", "left_anti")
    survivors = intra.drop("content_hash")
    new_hashes = intra.select("content_hash")
    return survivors, new_hashes


def minhash_dedup_incremental(
    new_docs: DataFrame,
    known_sigs: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Pure near-dup form: returns ``(survivors, new_sigs)``.

    ``known_sigs`` columns: ``band``, ``bkey`` (bucket hash), ``sig``
    (array of ``num_hashes`` longs) — the exploded-band layout the
    index stores. A new doc is dropped when ANY of its bands matches an
    index bucket whose signature agrees on ≥ ``min_est_jaccard`` of
    positions. Intra-batch near-dups are removed first via the batch
    LSH operator (min id survives). ``new_sigs`` holds the survivors'
    exploded bands for appending."""
    rows_per_band = num_hashes // bands
    hash_cols = [f"h{i}" for i in range(num_hashes)]
    sig = dedup.track_cache(
        dedup.minhash_signatures(new_docs, id_col, text_col, n, num_hashes)
        .select(F.col(id_col).alias("sid"), F.array(*hash_cols).alias("sig"))
        .cache()
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(
                *[
                    F.element_at("sig", b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ]
            ).alias("bkey"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "sid", "sig", F.explode(F.array(*band_structs)).alias("bb")
    ).select("sid", "sig", "bb.band", "bb.bkey")

    # intra-batch near-dups: batch LSH pairs → min-id survivor per pair set
    pairs = dedup.minhash_lsh_pairs(
        new_docs, id_col, text_col, n, num_hashes, bands, min_est_jaccard
    )
    dropped_intra = pairs.select(F.col("id_b").alias("sid")).distinct()

    if known_sigs is not None:
        agree = F.size(
            F.filter(
                F.zip_with(F.col("n.sig"), F.col("k.sig"), lambda a, b: a == b),
                lambda eq: eq,
            )
        )
        vs_index = (
            banded.alias("n")
            .join(known_sigs.alias("k"), ["band", "bkey"])
            .withColumn("est", agree / F.lit(float(num_hashes)))
            .filter(F.col("est") >= min_est_jaccard)
            .select(F.col("n.sid").alias("sid"))
            .distinct()
        )
        dropped = dropped_intra.unionByName(vs_index).distinct()
    else:
        dropped = dropped_intra
    keep_ids = sig.select("sid").join(dropped, "sid", "left_anti")
    survivors = new_docs.join(
        keep_ids.withColumnRenamed("sid", id_col), id_col, "left_semi"
    )
    new_sigs = banded.join(
        keep_ids.withColumnRenamed("sid", "sid"), "sid", "left_semi"
    ).select("band", "bkey", "sig")
    return survivors, new_sigs


def ingest_batch(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup: bool = False,
    **lsh_kwargs,
) -> DataFrame:
    """Operational form: dedup ``new_docs`` against the persisted index
    at ``index_dir`` (created on first use), APPEND the survivors'
    digests/signatures, and return the survivors.

    Layout: ``index_dir/exact`` (content_hash parquet) and, with
    ``near_dup=True``, ``index_dir/minhash`` (band, bkey, sig parquet).
    Appends are new files only — the index is never rewritten. In
    production, bucket ``exact`` by content_hash so the anti-join is
    exchange-free, and run the append inside one driver (the reference
    cadence: one ingest job per batch)."""
    exact_dir = os.path.join(index_dir, "exact")
    known = (
        spark.read.parquet(exact_dir) if os.path.isdir(exact_dir) else None
    )
    survivors, new_hashes = exact_dedup_incremental(
        new_docs, known, id_col, text_col
    )
    if near_dup:
        mh_dir = os.path.join(index_dir, "minhash")
        known_sigs = (
            spark.read.parquet(mh_dir) if os.path.isdir(mh_dir) else None
        )
        survivors, new_sigs = minhash_dedup_incremental(
            survivors, known_sigs, id_col, text_col, **lsh_kwargs
        )
        # materialize BEFORE appending: the append plans read the very
        # directories they extend, so they must be cut from lineage
        # first (an index append must never observe its own output)
        survivors = survivors.localCheckpoint(eager=True)
        new_sigs.localCheckpoint(eager=True).write.mode("append").parquet(
            mh_dir
        )
        new_hashes = survivors.select(
            F.md5(F.col(text_col)).alias("content_hash")
        )
        new_hashes.write.mode("append").parquet(exact_dir)
    else:
        survivors = survivors.localCheckpoint(eager=True)
        new_hashes.localCheckpoint(eager=True).write.mode("append").parquet(
            exact_dir
        )
    return survivors
