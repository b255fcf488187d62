"""Skew mitigation for shuffle joins: key salting.

AQE's skew-join splitting (on in our session, see session.py) handles
most skew at runtime by splitting oversized partitions of a sort-merge
join. Salting is the complementary *plan-level* tool for the case AQE
cannot fix: a single hot key whose rows must still meet — e.g. 40% of
an event log under one user_id joined against a per-key dimension.

``salted_join`` explodes the small side ``n_salt`` ways and scatters
the big side's hot keys uniformly across the salt space, so the hot
key's rows land in ``n_salt`` different reducers instead of one. The
result is row-identical to the plain equi-join (asserted in
tests/test_skew.py); cost is small-side duplication ×``n_salt``, so
keep the small side genuinely small or pass an explicit hot-key list
to salt only those.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot keys spread
    over ``n_salt`` sub-partitions.

    If ``hot_keys`` is given, only those keys are salted (small side
    duplicated ×n_salt for hot keys only); otherwise every key is
    salted — simpler, right when the small side is tiny.
    """
    if hot_keys is not None:
        hot = F.col(key).isin(hot_keys)
        big_salt = F.when(
            hot, (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt)))
        ).otherwise(F.lit(0))
        salt_values: Column = F.when(
            F.col(key).isin(hot_keys),
            F.sequence(F.lit(0), F.lit(n_salt - 1)),
        ).otherwise(F.array(F.lit(0)))
    else:
        big_salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
        salt_values = F.sequence(F.lit(0), F.lit(n_salt - 1))
    b = big.withColumn("__salt", big_salt.cast("int"))
    s = small.withColumn("__salt", F.explode(salt_values)).withColumn(
        "__salt", F.col("__salt").cast("int")
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
