"""Pretraining-corpus build pipeline — the end-to-end composition a
training-data team runs over raw scraped documents:

    scrub PII → exact-dedup survivors → near-dup (MinHash-LSH →
    connected components) survivors → quality/repetition gate →
    benchmark decontamination → leakage-safe split → context-window
    packing → partitioned write

Every stage is one of this engine's tested operators; this module only
composes them and wires per-stage observability.

Scale design:

- **One pass, observed metrics.** Per-stage row counts come from
  ``DataFrame.observe`` (`pyspark.sql.Observation`): the counters ride
  the final action's single scan instead of issuing one count job per
  stage — at 100 TB, six extra passes is six extra hours. (The
  connected-components stage inherently runs its own bounded iterative
  jobs; everything else folds into the one pipeline pass.)
- **Stage order is cost order.** Narrow row-local gates (PII, quality,
  repetition) run BEFORE the shuffling stages so the content-hash
  window and LSH stages see only surviving rows. Exact dedup precedes
  near-dup so LSH never wastes candidates on byte-identical copies.
- **Every decision is deterministic** (content hashes, min-id
  survivors, hash splits) — a re-run over the same corpus rebuilds the
  same output, and exact duplicates can never straddle train/test.
- **Write is partitioned by split** so downstream training readers
  partition-prune their split without scanning the others.

Reference parity: the reference's pipeline surface is OHLCV ETL
(batch_processor.py); this module is the north-star training-data
composition (BASELINE.json) built from the same engine primitives.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..operators import dedup, sampling, text


@dataclass
class CorpusResult:
    """Lazy pipeline outputs + the observations that fill ``metrics``
    when an action runs over ``documents`` (or ``packs``)."""

    documents: DataFrame  # survivors: id, text(redacted), quality, split, n_tok
    packs: DataFrame  # (id, shard, n_tok, pack_id, pack_offset)
    _observations: dict[str, Observation] = field(default_factory=dict)

    def metrics(self) -> dict[str, int]:
        """Per-stage row counts. Valid after any action has executed the
        ``documents`` plan (e.g. ``write`` / ``count``); each Observation
        blocks until its values arrive."""
        return {name: obs.get["n"] for name, obs in self._observations.items()}

    def write(self, out_dir: str) -> dict[str, int]:
        """Write documents partitioned by split (+ packs alongside) and
        return the stage metrics gathered on that single pass."""
        self.documents.write.mode("overwrite").partitionBy("split").parquet(
            f"{out_dir}/documents"
        )
        self.packs.write.mode("overwrite").parquet(f"{out_dir}/packs")
        return self.metrics()


def build_pretrain_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
    quality_min: float = 0.3,
    repetition_max: float = 0.9,
    contamination_max: float = 0.5,
    contamination_n: int = 5,
    lsh_min_jaccard: float = 0.5,
    pack_capacity: int = 512,
) -> CorpusResult:
    """Compose the full corpus-cleaning pipeline lazily; see module doc.

    ``benchmark`` is the held-out eval suite for decontamination (its
    shingle set is broadcast; pass None to skip the stage).
    """
    obs: dict[str, Observation] = {}

    def observed(df: DataFrame, stage: str) -> DataFrame:
        o = Observation(stage)
        obs[stage] = o
        return df.observe(o, F.count(F.lit(1)).alias("n"))

    def narrow_stages(cur: DataFrame, mark) -> DataFrame:
        """Stages 0-3 (scrub -> gates -> exact dedup), identical for the
        observed output chain and the unobserved dedup-operator feed.
        ``mark`` is ``observed`` on the output branch and a no-op on the
        branch handed to the LSH/CC operators: those operators cache and
        run their own bounded actions, and a CollectMetrics node that
        rides into a cached subtree can be reported EMPTY by whichever
        internal action fires first (observed under
        canChangeCachedPlanOutputPartitioning=true and under an explicit
        repartition-before-cache), permanently poisoning the Observation
        ('only the result of the first action is available'). Keeping
        the observe nodes exclusive to the output branch means the first
        query-end event that mentions them is the output action itself."""
        cur = mark(cur, "00_input")

        # 1. PII scrub — narrow map; downstream stages see redacted text
        cur = (
            text.redact_pii(cur, text_col)
            .withColumn(text_col, F.col("redacted"))
            .drop("redacted", "n_phone", "n_email")
        )

        # 2. quality + repetition gates — narrow row-local filters first
        #    so the shuffling dedup stages only see plausible keepers
        cur = text.quality_score(cur, text_col).filter(
            F.col("quality") >= quality_min
        )
        toks = F.split(F.col(text_col), " ")
        n_grams = F.greatest(F.size(toks) - 2, F.lit(0))
        n_uniq = F.size(dedup.shingle_array(text_col, 3))
        cur = cur.filter(
            (n_grams == 0) | (1 - n_uniq / n_grams <= repetition_max)
        )
        cur = mark(cur, "01_quality_gate")

        # 3. exact dedup: min-id survivor per content hash (one window
        #    shuffle on the digest)
        from pyspark.sql import Window

        w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
        cur = (
            cur.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        return mark(cur, "02_exact_dedup")

    cur = narrow_stages(docs, observed)
    # unobserved twin of the same plan for the dedup operators (see
    # narrow_stages doc; same transformations, so the same rows)
    plain = narrow_stages(docs, lambda df, _stage: df)

    # 4. near-dup: LSH candidates -> connected components -> survivors.
    #    The CC iteration runs its own bounded jobs (edge-sized state,
    #    localCheckpoint-truncated lineage); the corpus side is one join
    #    against the (small) non-survivor label set.
    pairs = dedup.minhash_lsh_pairs(
        plain, id_col, text_col, min_est_jaccard=lsh_min_jaccard
    )
    clusters = dedup.dedup_clusters(plain, pairs, id_col)
    cur = (
        cur.join(
            clusters.filter(~F.col("is_survivor")).select(F.col(id_col).alias("__drop")),
            cur[id_col] == F.col("__drop"),
            "left_anti",
        )
    )
    cur = observed(cur, "03_near_dedup")

    # 5. decontamination: drop docs overlapping the benchmark too much
    #    (benchmark shingle set broadcast; corpus never shuffled by
    #    shingle)
    if benchmark is not None:
        contaminated = (
            dedup.contamination(cur, benchmark, id_col, text_col, contamination_n)
            .filter(F.col("contamination") > contamination_max)
            .select(F.col(id_col).alias("__contam"))
        )
        cur = cur.join(
            contaminated, cur[id_col] == F.col("__contam"), "left_anti"
        )
        cur = observed(cur, "04_decontaminated")

    # 6. leakage-safe split + token counts for packing
    cur = text.hash_split(cur, text_col).withColumn(
        "n_tok", text.n_tokens(F.col(text_col))
    )

    # 7. context-window packing per (split, shard): training batches
    #    never mix splits, shards pack in parallel
    packs = sampling.pack_context_windows(
        cur.withColumn(
            "__shard", F.concat_ws("/", F.col("split"), F.col(shard_col))
        ),
        pack_capacity,
        shard_col="__shard",
        id_col=id_col,
    )

    return CorpusResult(documents=cur, packs=packs, _observations=obs)
