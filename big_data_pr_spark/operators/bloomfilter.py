"""Lossy broadcast prefilter: shrink a fact-table shuffle with a
collapsed-key digest of the dimension's surviving join keys.

Catalyst injects runtime bloom filters for some shuffle joins
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but only when
its cost model fires, and ``bloom_filter_agg`` itself is not a public
function. This operator is the EXPLICIT, Spark-native form of the same
idea: project the dimension's keys onto ``num_buckets`` hash buckets,
``distinct`` them (≤ ``num_buckets`` ints however large the dimension),
and broadcast-semi-join the fact side on its own bucketed key — an O(1)
hashed-relation probe per fact row, exactly a Bloom filter with k = 1.

Collisions (two keys in one bucket) make the filter lossy-permissive —
false POSITIVES only, never false negatives — so it is always safe as a
join prefilter: the real join afterwards removes the survivors that
collided in, and the result is provably identical to the plain join
(hash-gated by the registry oracle).

100 TB posture: the broadcast is ≤ num_buckets × 8 bytes regardless of
fact or dimension size; the dimension shuffles only its distinct
buckets; the fact table never shuffles a row the dimension cannot
match (up to FPP ≈ n_keys / num_buckets). For a 1%-selective dimension
this is a ~100× shuffle reduction the optimizer cannot always find —
e.g. when the selective set is another join's output rather than a
scan predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashset_prefilter(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str,
    num_buckets: int = 1 << 22,
) -> DataFrame:
    """Return ``big`` filtered to rows whose ``big_key`` *might* appear
    in ``keys.keys_key`` (no false negatives).

    ``num_buckets`` bounds both broadcast size (≤ 32 MiB of longs at
    the default) and the false-positive rate (≈ distinct keys /
    num_buckets).
    """
    buckets = keys.select(
        F.pmod(F.xxhash64(keys_key), F.lit(num_buckets)).alias("__bkt")
    ).distinct()
    probe = F.pmod(F.xxhash64(big_key), F.lit(num_buckets))
    return big.join(
        F.broadcast(buckets),
        probe == F.col("__bkt"),
        "left_semi",
    )
