"""Privacy operators for training-data pipelines: ε-differential
privacy (seeded Laplace noise) and k-anonymity auditing.

Large-scale corpus work releases aggregate statistics constantly
(dataset cards, mixture reports, per-cohort counts); these operators
make the two standard disclosure-control mechanisms first-class:

- ``laplace_noise`` — the ε-DP Laplace mechanism for count/sum
  releases. Noise is DETERMINISTIC given (cell key, seed): the uniform
  draw comes from a 48-bit md5 prefix of the key, so the release is
  reproducible across engines and re-runs (re-releasing the same cell
  never spends extra privacy budget by sampling fresh noise), and the
  DuckDB oracle replays it bit-for-bit. Inverse-CDF transform:
  ``noise = -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|)``, b = sens/ε.
- k-anonymity: group sizes under a quasi-identifier tuple; cells with
  fewer than k members are the re-identification risk and get
  suppressed (the Sweeney 2002 k-anonymity model / ONS small-cell
  suppression).

Scale: both are one partial-agg shuffle to |cells| rows, then narrow
per-cell arithmetic. Nothing is per-row after the aggregate.

No reference parity — extends the hygiene family (SURVEY §2 extension
set: pii_scrub, blocklist_hit_rate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_U48 = float(1 << 48)


def hash_uniform(key: Column, seed: str = "dp1") -> Column:
    """Deterministic uniform in (0,1): 48-bit md5 prefix of key+seed,
    shifted by 0.5 so u is never exactly 0 or 0.5 (keeps ln() finite).
    Parity twin: :func:`hash_uniform_sql`."""
    h = F.conv(F.substring(F.md5(F.concat_ws("|", key, F.lit(seed))), 1, 12), 16, 10)
    return (h.cast("double") + F.lit(0.5)) / F.lit(_U48)


def hash_uniform_sql(key: str, seed: str = "dp1") -> str:
    """DuckDB twin of :func:`hash_uniform`."""
    return (
        f"((('0x' || substr(md5({key} || '|{seed}'), 1, 12))::BIGINT"
        f" + 0.5) / {_U48!r})"
    )


def laplace_noise(key: Column, scale: float, seed: str = "dp1") -> Column:
    """Seeded Laplace(0, scale) noise via inverse CDF of the hash
    uniform — the ε-DP mechanism for a release keyed by ``key``
    (scale = sensitivity / ε)."""
    u = hash_uniform(key, seed) - F.lit(0.5)
    return -F.lit(scale) * F.signum(u) * F.log(1 - 2 * F.abs(u))


def laplace_noise_sql(key: str, scale: float, seed: str = "dp1") -> str:
    """DuckDB twin of :func:`laplace_noise`."""
    u = f"({hash_uniform_sql(key, seed)} - 0.5)"
    return f"(-({scale!r}) * sign({u}) * ln(1 - 2 * abs({u})))"


def pseudonymize(key: Column, salt: str) -> Column:
    """Stable salted pseudonym for an identifier column: 16-hex-char
    md5 prefix of salt|key. Same key + salt ⇒ same pseudonym (joins
    and per-entity aggregates still work on the pseudonymized data);
    without the salt the mapping is not re-derivable from public
    identifiers. Narrow per-row expression. NOT encryption — rotate
    the salt to break linkage across releases."""
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), key.cast("string"))), 1, 16
    )


def pseudonymize_sql(key: str, salt: str) -> str:
    """DuckDB twin of :func:`pseudonymize`."""
    return f"substr(md5('{salt}' || '|' || CAST({key} AS VARCHAR)), 1, 16)"


def erase_subject(
    spark,
    table_dir: str,
    key_col: str,
    key_values: list,
    note: str = "",
) -> dict:
    """Right-to-erasure over an MVCC versioned table: commit a new
    version with every row of the subject(s) removed, then VACUUM all
    older versions so the erased rows are physically gone — time
    travel and erasure are in tension, and erasure wins by contract
    (GDPR art. 17). Returns {'version', 'rows_removed', 'vacuumed'}.

    Scale: the rewrite is one filtered scan → write (no shuffle); at
    100 TB pair it with partitioning on a subject-id prefix so the
    rewrite touches only the subject's partitions instead of the
    whole table."""
    from . import versioned  # noqa: PLC0415

    cur = versioned.read_version(spark, table_dir)
    before = cur.count()
    kept = cur.filter(~F.col(key_col).isin(key_values))
    after = kept.count()
    v = versioned.write_version(
        kept,
        table_dir,
        note=note or f"erase {key_col} x{len(key_values)}",
        extra={"erased": {key_col: [str(k) for k in key_values]}},
    )
    vacuumed = versioned.vacuum(table_dir, keep_last=1)
    return {"version": v, "rows_removed": before - after, "vacuumed": vacuumed}
