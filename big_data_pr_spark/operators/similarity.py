"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB pipeline needs:

- **brute-force cosine top-k** — the exact baseline: broadcast the
  query vector(s), one narrow pass computing dot/norms with JVM
  higher-order functions (zip_with + aggregate), TakeOrderedAndProject
  for the top-k. Linear scan, zero shuffle besides the final k-heap
  merge; the right answer up to ~billions of rows × small k.
- **LSH-bucketed ANN** — random-hyperplane signatures (sign of dot with
  deterministic pseudo-random planes), candidates restricted to equal
  signature buckets (shuffle by bucket), exact cosine re-rank inside
  the bucket. Trades recall for a bucket-local join; the scale path
  when queries are many or k-NN graphs are built.

- **IVF (inverted-file) ANN** — coarse centroids (deterministic seed
  vectors refined by distributed Lloyd iterations), every vector
  assigned to its nearest cell in one narrow pass, search probes only
  the ``n_probe`` cells nearest the query then exact-re-ranks inside
  them. The index pass is the scan everything pays once; each query
  then touches ~``n_probe/n_list`` of the data. Centroids stay
  driver-sized (n_list × dim floats) and are broadcast.

Plane generation uses a seeded numpy RNG inside an Arrow-batched
pandas UDF (defined inline — executor-import-safe); everything else is
built-in expressions.
"""

# NOTE: no `from __future__ import annotations` here — it would turn the
# pandas-UDF type hints into strings, which PySpark's signature
# inspection rejects ([UNSUPPORTED_SIGNATURE]).
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def _vectors_to_numpy(df: DataFrame, id_col: str, vec_col: str):
    """Arrow-collect ``(id, vec)`` into ``(ids, mat)`` numpy arrays for
    the cardinality-gated driver paths. Returns ``None`` (→ caller
    falls back to the distributed plan) for ragged/null vectors, so
    the fast path never changes semantics on malformed input."""
    import numpy as np

    tbl = df.select(id_col, vec_col).toArrow()
    vc = tbl.column(vec_col).combine_chunks()
    if vc.null_count:
        return None
    try:
        offsets = vc.offsets.to_numpy(zero_copy_only=False)
        vals_arr = vc.values
    except AttributeError:  # not a list column
        return None
    if vals_arr.null_count or len(offsets) < 2:
        return None
    widths = offsets[1:] - offsets[:-1]
    if widths[0] == 0 or not (widths == widths[0]).all():
        return None
    vals = vals_arr.to_numpy(zero_copy_only=False)
    mat = vals[offsets[0] : offsets[-1]].reshape(len(widths), int(widths[0]))
    if not np.isfinite(mat).all():
        # NaN/Inf elements diverge between numpy comparisons (NaN >= t
        # is False) and Spark SQL ordering (NaN sorts greater than any
        # double), so the driver replica would change results — fall
        # through to the distributed plan, like the ragged/null guard.
        return None
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    return ids, mat


def _np_seq_norms(A):
    """Per-row L2 norm with the EXACT fold order of :func:`norm`:
    left-to-right ``acc = acc + x_d * x_d`` per dimension (elementwise
    numpy ufuncs — one product rounding, one sum rounding per step,
    no FMA, no pairwise reassociation), then sqrt. Bit-identical to
    the JVM higher-order-function fold on the same doubles."""
    import numpy as np

    s = np.zeros(len(A))
    for d in range(A.shape[1]):
        s = s + A[:, d] * A[:, d]
    return np.sqrt(s)


def _np_seq_dot_gather(NT, ia, ib):
    """Sequential-fold dot products for index pairs ``(ia[k], ib[k])``
    over a TRANSPOSED ``(dim, n)`` C-contiguous matrix: per-dimension
    1-D gathers. Exact :func:`dot` replica (same fold order / rounding
    per step as :func:`_np_seq_norms`). The transposed-gather shape is
    load-bearing: this runtime's numpy is pathologically slow at 2-D
    row gathers and Fortran copies (measured 22–56 s vs 0.27 s for
    674k pairs × 64 dims)."""
    import numpy as np

    acc = np.zeros(len(ia))
    for d in range(NT.shape[0]):
        col = NT[d]
        acc = acc + col[ia] * col[ib]
    return acc


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI divide-by-zero error) for zero vectors —
    matches DuckDB/standard-SQL double semantics; one corrupt embedding
    must not kill a corpus-wide job."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def centroids_by(
    df: DataFrame,
    key_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed per-key centroid of an embedding column: long-format
    ``(key, dim, centroid)`` rows, ``dim`` 1-based. The building block
    for class prototypes, IVF coarse-quantizer training at corpus scale
    (where :func:`ivf_centroids`'s driver-side numpy loop won't fit),
    and embedding-drift monitoring.

    Scale: ``posexplode`` fans each vector into dim rows — a narrow map
    — then ONE partially-aggregated shuffle on (key, dim): ~|keys|·dim
    final rows regardless of corpus size. Elements are cast to double
    BEFORE aggregation so accumulation-order differences stay at 1e-16
    relative — invisible at the 6-dp rounding every consumer applies.
    """
    return (
        df.select(F.col(key_col), F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(key_col, (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid"))
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the 4×
    storage/bandwidth reduction step before writing an ANN index or
    shipping vectors to a trainer. Per vector: ``scale = max|x|/127``,
    ``q_i = floor(x_i/scale + 0.5)`` (half-up quantization via floor —
    identical IEEE arithmetic across engines, unlike round()), plus the
    RMS reconstruction error ``sqrt(mean((x - q·scale)²))`` for quality
    monitoring. Zero vectors quantize to zeros with scale 0.

    Scale: narrow per-row array expressions, no shuffle, no UDF — the
    whole op fuses into the scan's codegen stage.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    absmax = F.array_max(F.transform(x, F.abs))
    safe = F.when(absmax > 0, absmax / 127.0).otherwise(F.lit(1.0))
    q = F.transform(x, lambda v: F.floor(v / safe + 0.5).cast("int"))
    err = F.sqrt(
        F.aggregate(
            F.zip_with(x, q, lambda a, b: (a - b * safe) * (a - b * safe)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / F.size(x)
    )
    out = df.withColumns(
        {
            "scale": F.round(F.when(absmax > 0, absmax / 127.0).otherwise(F.lit(0.0)), 6),
            "q_vec": q,
            "rms_err": F.round(err, 6),
        }
    )
    return out if keep_vec else out.drop(vec_col)


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single-row query DataFrame
    (broadcast — no shuffle of the big side)."""
    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q")
    )
    joined = df.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def cosine_topk_batch(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for a query TABLE in one plan: broadcast
    the (small) query side against the corpus scan, score every
    (corpus, query) pair JVM-side, keep k per query with a
    ``row_number`` window (Spark inserts WindowGroupLimit, so each
    shuffle partition retains only k rows per query before the final
    sort). Corpus scanned once for all queries — the exact-baseline
    twin of :func:`ann_ivf_topk_batch`."""
    from pyspark.sql import Window

    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q")
    )
    scored = (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_pairs: int = 50_000_000,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold over the
    self-join. Exact (O(n²)) — at scale run :func:`ann_lsh_pairs` first
    and feed only candidate buckets through this verifier.

    Per-pair work is ONE dot-product fold: each side's L2 norm is
    computed once per VECTOR before the join (same fold order as the
    per-pair recompute, so cos_sim doubles are bit-identical to the SQL
    oracle's), not O(n) times inside it — 3× less per-pair arithmetic.
    The left side is repartitioned to the cluster's parallelism so the
    broadcast nested-loop join fans out instead of running the whole
    n²/2 grid in one task (measured 45.9 s → 1.8 s warm on the 2 k ×
    2 k sf0.1 fixture).

    Cardinality gate (same pattern as connected_components'
    driver_cc_max_edges, r8 verdict #6): the all-pairs grid is
    verifier-class work that must never silently run at corpus scale.
    One count() of the input sizes the grid; above ``max_pairs``
    candidate pairs the call fails LOUDLY with the bucketed
    alternative named, instead of scheduling an n²/2 job that would
    run for days at 100 TB. Below the gate the plan is unchanged
    (oracle-identical)."""
    n = df.count()
    est_pairs = n * (n - 1) // 2
    if est_pairs > max_pairs:
        raise ValueError(
            f"cosine_pairs: {n:,} vectors -> {est_pairs:,} candidate "
            f"pairs exceeds max_pairs={max_pairs:,}. This exact "
            "verifier is for bucket-local candidate sets: run "
            "with_banded_lsh / ann_lsh_pairs first and verify "
            "per-bucket only (SCALE.md), or raise max_pairs "
            "explicitly for a deliberate exact sweep."
        )
    # r13 NOTE — driver grid MEASURED AND REJECTED: a cardinality-gated
    # driver replay of this n²/2 grid (exact sequential-fold Gram via
    # row-blocked outer-product accumulation, bit-identical output,
    # parity-verified on all three fixture SFs) timed ~2.3 s warm vs
    # 2.15 s distributed at sf0.1 — a wash at best, and the 4M-element
    # single-threaded numpy steps swing 5× under host contention while
    # the 32-core BNLJ rides through it. The same gate is a clear WIN
    # for lsh_pairs (candidate JOIN dominates there); see below.
    #
    # r14 OPT (guide §4.2/§3.1) — DISTRIBUTED Arrow grid: the BNLJ's
    # per-pair dot is an INTERPRETED HigherOrderFunction fold (zip_with
    # + aggregate never reach codegen), ~2.2 s of 32-core CPU for the
    # 2M-pair sf0.1 grid. Below the gate the vector block is broadcast
    # (ids, transposed matrix, per-row norms — n·dim doubles, 1 MB at
    # sf0.1) and each task computes its id-slice of the grid in numpy
    # with the EXACT sequential fold order of dot()/norm() (per-
    # dimension elementwise accumulation — one product rounding + one
    # sum rounding per step, no FMA/pairwise reassociation) and Spark's
    # round(double,6) replica (HALF_UP on repr — see graph.py), so
    # cos_sim doubles are bit-identical to the HOF plan (parity pinned
    # in tests/test_similarity.py). This is NOT a driver replay: the
    # grid itself runs distributed (one MapInArrow task per id slice),
    # which is why it rides through host contention where the rejected
    # driver grid swung 5×. Above the gate — where the broadcast block
    # would not fit — the BNLJ below runs unchanged; the operator's
    # true 100 TB path is LSH-bucketed verification either way.
    arrow_max = int(
        os.environ.get("SPARK_GRAFT_COSINE_ARROW_MAX_VECS", "65536")
    )
    idt = df.schema[id_col].dataType
    if n <= arrow_max and idt.typeName() in ("long", "integer"):
        got = _vectors_to_numpy(df, id_col, vec_col)
        if got is not None:
            import numpy as np

            ids_all, mat = got
            A = mat.astype(np.float64)
            nr = _np_seq_norms(A)
            if len(np.unique(ids_all)) == len(ids_all) and np.isfinite(
                nr
            ).all():
                return _cosine_grid_arrow(
                    df, ids_all, A, nr, float(threshold), id_col
                )
    par = df.sparkSession.sparkContext.defaultParallelism
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    ).repartition(par)
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.try_divide(
                    dot(F.col("va"), F.col("vb")),
                    F.col("na") * F.col("nb"),
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _cosine_grid_arrow(
    df: DataFrame,
    ids_all,
    A,
    nr,
    threshold: float,
    id_col: str,
) -> DataFrame:
    """Distributed exact-cosine grid for :func:`cosine_pairs` (r14).

    ``A`` is the full (n, dim) float64 matrix, ``nr`` its sequential-
    fold row norms. The block is broadcast; the stream side is just the
    id column fanned out to the cluster's parallelism, and each task
    evaluates its rows' half of the grid (``id_a < id_b``) in numpy
    with the bit-exact fold/round replicas described at the call site.
    ``try_divide``'s zero-norm → NULL → filtered contract is replayed
    by masking ``denom == 0`` out of the candidate set."""
    import numpy as np

    spark = df.sparkSession
    AT = np.ascontiguousarray(A.T)
    bc = spark.sparkContext.broadcast((ids_all, AT, nr))
    m = len(ids_all)
    thr = float(threshold)
    idt = df.schema[id_col].dataType
    id_sql = "long" if idt.typeName() == "long" else "int"

    def grid(batches):
        import math

        import pyarrow as pa
        from decimal import ROUND_HALF_UP, Decimal

        ids_b, AT_b, nr_b = bc.value
        index_of = {v: i for i, v in enumerate(ids_b.tolist())}
        pa_id = pa.int64() if id_sql == "long" else pa.int32()
        q6 = Decimal(1).scaleb(-6)
        # chunk rows so the (chunk, n) accumulators stay ~32 MB
        chunk = max(1, 4_000_000 // max(m, 1))
        for batch in batches:
            bids = batch.column(0).to_numpy(zero_copy_only=False)
            for c0 in range(0, len(bids), chunk):
                cb = bids[c0 : c0 + chunk]
                rows = np.fromiter(
                    (index_of[v] for v in cb.tolist()),
                    dtype=np.int64,
                    count=len(cb),
                )
                acc = np.zeros((len(cb), m))
                for d in range(AT_b.shape[0]):
                    col = AT_b[d]
                    acc = acc + col[rows][:, None] * col[None, :]
                denom = nr_b[rows][:, None] * nr_b[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    c = acc / denom
                cand = (
                    (cb[:, None] < ids_b[None, :])
                    & (denom != 0.0)
                    & (c >= thr - 1e-6)  # round(·,6) moves ≤ 5e-7
                )
                ii, jj = np.nonzero(cand)
                out_a, out_b, out_c = [], [], []
                for k in range(len(ii)):
                    x = float(c[ii[k], jj[k]])
                    # Spark round(double,6) passes ±Inf through; NaN is
                    # unreachable here (finite inputs, denom≠0 masked)
                    val = (
                        float(
                            Decimal(repr(x)).quantize(
                                q6, rounding=ROUND_HALF_UP
                            )
                        )
                        if math.isfinite(x)
                        else x
                    )
                    if val >= thr:
                        out_a.append(int(cb[ii[k]]))
                        out_b.append(int(ids_b[jj[k]]))
                        out_c.append(val)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_a, type=pa_id),
                        pa.array(out_b, type=pa_id),
                        pa.array(out_c, type=pa.float64()),
                    ],
                    names=["id_a", "id_b", "cos_sim"],
                )

    par = spark.sparkContext.defaultParallelism
    src = df.select(id_col).repartition(par)
    return src.mapInArrow(
        grid, f"id_a {id_sql}, id_b {id_sql}, cos_sim double"
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature as an int bucket id (Arrow-batched
    pandas UDF; planes re-derived deterministically on each executor from
    the seed — nothing shipped, nothing module-level)."""
    import pandas as pd

    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        import numpy as np

        planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
        mat = np.stack(vecs.to_numpy())  # (batch, dim) float32
        bits = (mat @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((bits @ weights).astype("int32"))

    return df.withColumn("lsh_bucket", bucket(F.col(vec_col)))


def with_banded_lsh(
    df: DataFrame,
    dim: int,
    n_bands: int = 96,
    planes_per_band: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """One row per (vector, band): band index + that band's hyperplane
    bucket. The OR-construction — a pair is a candidate if ANY band's
    buckets agree — lifting recall for moderate-similarity pairs that a
    single signature would split.

    Band geometry (random-hyperplane LSH): a plane agrees on a pair
    with cosine s w.p. p = 1 − arccos(s)/π, so pair-recall is
    1 − (1 − p^r)^b and random-pair candidate volume is ~b/2^r of the
    n² self-join. Defaults b=96, r=8 target the dedup threshold
    s = 0.4 (p ≈ 0.631): analytic recall ≈ 0.91 (measured 0.966 at
    sf0.01) at 0.375× brute-force candidate volume. The r5 defaults
    (b=4, r=3) sat at 0.5× volume with only 0.68 recall — strictly
    dominated. For higher thresholds raise r (finer buckets) and drop
    b: at s = 0.8, r=16/b=32 gives recall ≈ 0.94 at 0.0005× volume.
    tests/test_similarity.py::test_banded_lsh_recall_curve pins the
    band-count↔recall tradeoff."""
    import pandas as pd

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def band_buckets(vecs: pd.Series) -> pd.Series:
        import numpy as np

        planes = np.random.default_rng(seed).standard_normal(
            (n_bands * planes_per_band, dim)
        )
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ planes.T) > 0  # (batch, bands*planes)
        weights = (1 << np.arange(planes_per_band)).astype(np.int64)
        # one reshaped matmul folds every band's bits to its bucket id
        # — (batch, bands, r) @ (r,) -> (batch, bands) — instead of a
        # per-row x per-band Python loop (the loop dominated the UDF
        # at 96 bands: ~192k int() calls per 2k-row batch)
        codes = (
            bits.reshape(mat.shape[0], n_bands, planes_per_band) @ weights
        ).astype("int32")
        return pd.Series(list(codes))

    return df.select(
        "*", F.posexplode(band_buckets(F.col(vec_col))).alias("band", "bucket")
    )


def lsh_pairs(
    df: DataFrame,
    dim: int,
    threshold: float,
    n_bands: int = 96,
    planes_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs, scale path: banded LSH candidate
    generation (pair qualifies if any band bucket matches — join on
    (band, bucket), bucket-local), distinct pair set, then the exact
    cosine verifier. Output ⊆ :func:`cosine_pairs`; work is
    O(Σ bucketᵢ²) per band vs the exact join's O(n²)."""
    # r13 OPT: cardinality-gated DRIVER path (same class/gate as
    # cosine_pairs'). Below the gate the banding UDF's arithmetic is
    # replayed verbatim on the collected matrix (same float32 input,
    # same seeded planes, same matmul/sign/weight expressions), the
    # any-band-agrees candidate set built as a boolean matrix (exactly
    # the distinct of the distributed (band,bucket) self-join), and
    # the pre-normalized verify replayed with the exact sequential
    # fold + Spark-round replica (see cosine_pairs notes).
    # Rows-only output; driver-vs-distributed parity pinned in
    # tests/test_dedup_similarity.py and equality verified on all
    # three fixture SFs.
    n_vecs = df.count()
    driver_max = int(os.environ.get("SPARK_GRAFT_EMB_DRIVER_MAX_VECS", "4096"))
    if n_vecs <= driver_max:
        got = _vectors_to_numpy(df, id_col, vec_col)
        if got is not None and got[1].shape[1] == dim:
            import numpy as np

            from .graph import _round_half_up

            ids, mat = got
            planes = np.random.default_rng(seed).standard_normal(
                (n_bands * planes_per_band, dim)
            )
            # explicit upcast: bitwise-equal to the UDF's mixed-dtype
            # `mat @ planes.T` (verified np.array_equal on the fixture)
            # and 2x faster through this runtime's BLAS
            bits = (mat.astype(np.float64) @ planes.T) > 0
            weights = (1 << np.arange(planes_per_band)).astype(np.int64)
            codes = (
                bits.reshape(mat.shape[0], n_bands, planes_per_band) @ weights
            ).astype("int32")
            m = len(ids)
            cand = np.zeros((m, m), dtype=bool)
            for bnd in range(n_bands):
                cb = codes[:, bnd]
                cand |= cb[:, None] == cb[None, :]
            cand &= ids[:, None] < ids[None, :]
            iu, ju = np.nonzero(cand)
            A = mat.astype(np.float64)
            nr = _np_seq_norms(A)
            with np.errstate(divide="ignore", invalid="ignore"):
                NV = A / nr[:, None]
            NT = np.ascontiguousarray(NV.T)
            rows = []
            chunk = 400_000
            for c0 in range(0, len(iu), chunk):
                ii, jj = iu[c0 : c0 + chunk], ju[c0 : c0 + chunk]
                with np.errstate(invalid="ignore"):
                    acc = _np_seq_dot_gather(NT, ii, jj)
                    keep = np.nonzero(acc >= threshold - 1e-6)[0]
                for k in keep.tolist():
                    val = _round_half_up(float(acc[k]), 6)
                    if val >= threshold:
                        rows.append(
                            (ids[ii[k]].item(), ids[jj[k]].item(), val)
                        )
            idt = df.schema[id_col].dataType
            out_schema = StructType(
                [
                    StructField("id_a", idt),
                    StructField("id_b", idt),
                    StructField("cos_sim", DoubleType()),
                ]
            )
            return df.sparkSession.createDataFrame(rows, out_schema)
    b = with_banded_lsh(df, dim, n_bands, planes_per_band, seed, vec_col)
    a_side = b.select(
        F.col("band").alias("__na"),
        F.col("bucket").alias("__ba"),
        F.col(id_col).alias("id_a"),
    )
    b_side = b.select(
        F.col("band").alias("__nb"),
        F.col("bucket").alias("__bb"),
        F.col(id_col).alias("id_b"),
    )
    cand = (
        a_side.join(
            b_side,
            (F.col("__na") == F.col("__nb"))
            & (F.col("__ba") == F.col("__bb"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()  # a pair may match in several bands — verify once
    )
    # verify with PRE-NORMALIZED vectors (r13): at threshold 0.4 the
    # band geometry intentionally passes ~1/3 of all pairs (recall
    # 0.91 needs it — docstring above), so the exact-cosine verify
    # dominates the operator. cosine() recomputes BOTH norms per
    # candidate pair; normalizing once per VECTOR (n ops, not |cand|)
    # leaves one dot product per pair — measured 4.5 → 2.6 s warm at
    # sf0.1. try_divide keeps the zero-vector contract: null elements
    # → null dot → dropped by the threshold filter, exactly as
    # cosine()'s null. cos_sim can differ from the divide-last form in
    # the last ulp; output is rows-only and the subset/recall pins in
    # tests/test_dedup_similarity.py hold.
    nv = df.select(
        F.col(id_col).alias("__nid"),
        F.col(vec_col).alias("__v"),
        norm(F.col(vec_col)).alias("__n"),  # own projection: one eval
    ).select(
        "__nid",
        F.transform(
            F.col("__v"), lambda x: F.try_divide(x.cast("double"), F.col("__n"))
        ).alias("__nvec"),
    )
    va = nv.select(F.col("__nid").alias("id_a"), F.col("__nvec").alias("va"))
    vb = nv.select(F.col("__nid").alias("id_b"), F.col("__nvec").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index
# ---------------------------------------------------------------------------


def _assign_cell_udf(centroids):
    """pandas UDF assigning each vector to its max-cosine centroid.

    ``centroids`` is a (n_list, dim) float64 numpy array, L2-normalized —
    captured in the closure, shipped once per executor (KB-sized)."""
    import pandas as pd

    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        import numpy as np

        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mat @ centroids.T, axis=1).astype("int32"))

    return cell


def ivf_centroids(
    df: DataFrame,
    n_list: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Coarse IVF centroids: deterministic seeds (the ``n_list`` lowest
    ids) refined by ``iters`` distributed Lloyd iterations.

    Each iteration is one narrow assignment pass plus one aggregation:
    posexplode to (cell, dim-position, value) and average per (cell,
    pos) — a single shuffle whose output is n_list × dim rows, which is
    driver-sized at any data scale. No vector data is ever collected
    beyond the seed rows and that aggregate."""
    import numpy as np

    seeds = (
        df.orderBy(id_col).limit(n_list).select(vec_col).collect()
    )
    cents = np.stack([np.asarray(r[0], dtype=np.float64) for r in seeds])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        assigned = df.withColumn("__cell", _assign_cell_udf(cents)(F.col(vec_col)))
        means = (
            assigned.select("__cell", F.posexplode(vec_col).alias("__pos", "__v"))
            .groupBy("__cell", "__pos")
            .agg(F.avg("__v").alias("__m"))
            .collect()
        )
        new = cents.copy()  # cells that lost all members keep their centroid
        by_cell: dict[int, list] = {}
        for r in means:
            by_cell.setdefault(r["__cell"], []).append((r["__pos"], r["__m"]))
        for c, pv in by_cell.items():
            vec = np.zeros(cents.shape[1])
            for p, v in pv:
                vec[p] = v
            n = np.linalg.norm(vec)
            if n > 1e-12:
                new[c] = vec / n
        cents = new
    return cents


def ann_ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_list: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` cells whose
    centroids are most cosine-similar to the query, exact re-rank
    inside them. Search work ≈ ``n_probe / n_list`` of the brute scan;
    at scale the assignment pass is amortized by writing ``__cell`` as
    a partition column of the stored index."""
    import numpy as np

    cents = ivf_centroids(df, n_list, iters, id_col, vec_col)
    assigned = df.withColumn("__cell", _assign_cell_udf(cents)(F.col(vec_col)))
    qrows = query_df.select(id_col, vec_col).collect()
    out = None
    for qid, qvec in [(r[0], np.asarray(r[1], dtype=np.float64)) for r in qrows]:
        qn = qvec / max(np.linalg.norm(qvec), 1e-12)
        probe = [int(c) for c in np.argsort(-(cents @ qn))[:n_probe]]
        q = F.lit([float(x) for x in qvec])
        scored = (
            assigned.filter(F.col("__cell").isin(probe) & (F.col(id_col) != qid))
            .select(
                F.lit(qid).alias("query_id"),
                id_col,
                F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
            )
            .orderBy(F.desc("cos_sim"), F.asc(id_col))
            .limit(k)
        )
        out = scored if out is None else out.unionByName(scored)
    return out


def ann_ivf_topk_batch(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_list: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k for a query TABLE, as one join — no
    driver-side loop over query rows (round-4 advice on
    :func:`ann_ivf_topk`, which stays for the handful-of-ad-hoc-queries
    case).

    Shape: each query row computes its ``n_probe`` nearest centroid
    cells in an Arrow-batched pass (centroids are driver-sized and ship
    inside the UDF closure), explodes to (query, probe_cell), and the
    query side — the small side — broadcast-joins the cell-assigned
    corpus on cell id. Exact cosine re-rank inside the probed cells,
    then one ``row_number`` window per query keeps k. Per-query work is
    ~``n_probe/n_list`` of the corpus and the corpus is scanned ONCE
    for all queries (the loop form scans it once per query); with the
    at-rest index (operators/ann_index.py) the cell equi-join becomes a
    partition-pruned scan."""
    from pyspark.sql import Window

    cents = ivf_centroids(df, n_list, iters, id_col, vec_col)
    assigned = df.withColumn("__cell", _assign_cell_udf(cents)(F.col(vec_col)))
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__q"),
        F.explode(
            _probe_cells_udf(cents, n_probe)(F.col(vec_col))
        ).alias("__cell"),
    )
    scored = (
        assigned.join(F.broadcast(q), "__cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _probe_cells_udf(centroids, n_probe: int):
    """Arrow-batched: the ``n_probe`` cell ids whose centroids are most
    cosine-similar to each vector (centroids pre-normalized)."""
    import pandas as pd

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        import numpy as np

        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        idx = np.argsort(-(mat @ centroids.T), axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return probes


def ann_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict the exact cosine scan to the query's
    LSH bucket. Recall < 1 by construction (bucket boundary losses);
    multi-probe (flip one bit) is the standard extension."""
    base = with_lsh_bucket(df, dim, n_planes, seed, vec_col)
    q = with_lsh_bucket(query_df, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__q"),
        F.col("lsh_bucket").alias("__qb"),
    )
    joined = (
        base.join(F.broadcast(q), base["lsh_bucket"] == F.col("__qb"))
        .filter(F.col(id_col) != F.col("query_id"))
    )
    return (
        joined.select(
            "query_id",
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _sq_dist_to_literal(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a DRIVER-HELD centroid, as a pure column
    expression: Σ (xᵢ−cᵢ)² folded left-to-right in double — the same
    element order DuckDB's ``list_sum(list_transform(...))`` uses, so
    iteration-1 distances (raw-vector centroids) are bit-identical
    across engines."""
    lit = F.expr("array(" + ",".join(_sql_double(c) for c in centroid) + ")")
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sql_double(x: float) -> str:
    """A Python float as an EXACT Spark SQL double literal: ``repr``
    is the shortest decimal that round-trips, and both Java's
    ``Double.parseDouble`` (Spark's ``...D`` literal) and Python's
    ``float`` parse it back to the identical bits."""
    return repr(float(x)) + "D"


def _sql_matrix(cents: list[list[float]]) -> str:
    """A driver-held centroid table as SQL array-of-array text. Parsed
    once by the JVM (`F.expr`) this costs ~0.7 ms vs ~90 ms for the
    equivalent ``F.lit(nested)``, which desugars to one py4j call per
    element (r13 measurement: the literal-centroid query family was
    DRIVER-bound on expression construction + analysis, not on
    execution — see OPTIMIZATION_r13.md)."""
    return (
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(x) for x in c) + ")" for c in cents
        )
        + ")"
    )


def _lit_matrix(cents: list[list[float]]) -> Column:
    """One nested-array literal Column for a driver-held table."""
    return F.expr(_sql_matrix(cents))


def _sq_dist_structs(vec_sql: str, cents: list[list[float]]) -> Column:
    """``array<struct<dist,cid>>`` of squared L2 distances from the
    vector SQL expression ``vec_sql`` to every centroid, as ONE parsed
    expression. Per element the fold is the identical left-to-right
    double accumulation of :func:`_sq_dist_to_literal`, and ``cid`` is
    the 0-based centroid index, so ``array_min``/``array_sort`` over
    the result reproduce the old per-centroid ``F.array(struct(dist,
    lit(cid)))`` argmin bit-for-bit (callers with non-contiguous
    cluster ids map the index back through an ``element_at`` on the
    sorted id list, which preserves the tie-break order). Building the
    whole thing as SQL text costs one parser call instead of ~k
    zip_with/aggregate trees worth of py4j round-trips."""
    return F.expr(
        f"transform({_sql_matrix(cents)}, (c, i) -> named_struct("
        f"'dist', aggregate(zip_with({vec_sql}, c, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0.0D, "
        "(acc, x) -> acc + x), 'cid', i))"
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Deterministic Lloyd k-means over an embedding column; returns
    (assignment DataFrame incl. the vector column, final centroid dict)
    — corpus clustering for mixture balancing / semantic sharding of
    training data.

    Deterministic by construction (no RNG): init centroids are the k
    lowest-``id`` vectors; ties in the nearest-centroid argmin break to
    the lowest cluster id — so the whole run is SQL-expressible and the
    cluster DECISION is oracle-checkable (``kmeans_assign`` in the
    registry), unlike seeded samplers.

    Scale shape: centroids are a driver-sized k×dim artifact (exactly
    like ``ivf_centroids``); each ASSIGN pass is a zero-shuffle narrow
    map against k literal arrays (k·dim constants folded into codegen);
    each RECOMPUTE is ``posexplode`` + ONE partially-aggregated shuffle
    on (cluster, dim) → k·dim rows back to the driver. Rows never move
    between executors; at 100 TB the only growth is scan time.
    """
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents: dict[int, list[float]] = {
        i: [float(x) for x in r[0]] for i, r in enumerate(init)
    }

    def assign(c: dict[int, list[float]]) -> DataFrame:
        # one transform over a nested-array literal; cids ascend, so the
        # (dist, index) argmin tie-break equals the old (dist, cid) one
        # and element_at maps the index back to the (possibly
        # non-contiguous after a cluster drop) cluster id
        cids = sorted(c)
        best = F.array_min(_sq_dist_structs(f"`{vec_col}`", [c[i] for i in cids]))
        return df.select(
            id_col,
            vec_col,
            F.element_at(F.lit(cids), best["cid"] + 1).alias("cluster"),
            best["dist"].alias("dist"),
        )

    assigned = assign(cents)
    for _ in range(iters - 1):
        rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("v"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(r["v"])
        # a cluster that captured no vectors DROPS OUT (same semantics
        # as the SQL oracle, where its recomputed centroid is absent)
        cents = {
            cid: [dims[p] for p in sorted(dims)] for cid, dims in by_cluster.items()
        }
        assigned = assign(cents)
    return assigned, cents


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``kmeans_fit`` returning only the assignment (the registry's
    oracle-checked surface)."""
    assigned, _ = kmeans_fit(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    return assigned.drop(vec_col)


def lsh_bucket_expr(vec_sql: str, planes: list[list[float]]) -> Column:
    """Hyperplane-LSH bucket as a PURE column expression (no Python):
    bit i is set iff plane_i · x > 0, dot folded left-to-right in
    double — the same element order as DuckDB ``list_sum``, so the
    bucket decision is engine-portable when the planes are literal
    constants. One zip_with over (plane table, bit weights) + one int
    fold — identical left-to-right bit accumulation to the old
    per-plane chain, built as SQL text so construction is one parser
    call (r13). ``vec_sql`` is the vector column as a SQL expression.
    Use for the oracle-certified LSH path (the pandas-UDF
    `with_lsh_bucket` remains the at-scale batch variant with numpy
    dot)."""
    weights = "array(" + ",".join(str(1 << i) for i in range(len(planes))) + ")"
    return F.expr(
        f"aggregate(zip_with({_sql_matrix(planes)}, {weights}, "
        f"(p, w) -> CASE WHEN aggregate(zip_with({vec_sql}, p, "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x) > 0 "
        "THEN w ELSE 0 END), 0, (acc, x) -> acc + x)"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — vector compression for billion-scale ANN
# ---------------------------------------------------------------------------


def _sq_dist_slice_to_literal(
    vec: Column, start: int, length: int, centroid: list[float]
) -> Column:
    """Squared L2 distance of vec[start : start+length] (0-based) to a
    driver-held sub-centroid; same left-to-right double fold as
    :func:`_sq_dist_to_literal` so oracles replay it bit-identically."""
    sub = F.slice(vec, start + 1, length)  # F.slice is 1-based
    lit = F.expr("array(" + ",".join(_sql_double(c) for c in centroid) + ")")
    return F.aggregate(
        F.zip_with(
            sub, lit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_init_codebooks(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic UNREFINED PQ codebooks: for each of ``m``
    subspaces, the sub-slices of the ``k`` lowest-id vectors (the same
    deterministic-init convention as kmeans_lloyd / ann_ivf_topk_lit,
    which makes the encode DECISION SQL-replayable). Returns
    ``codebooks[j][c]`` = centroid c of subspace j (each dim/m wide)."""
    dsub = dim // m
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    vecs = [[float(x) for x in r[0]] for r in init]
    return [
        [v[j * dsub : (j + 1) * dsub] for v in vecs] for j in range(m)
    ]


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Lloyd-refined PQ codebooks: per subspace, k-means over the
    sub-slices (deterministic init = :func:`pq_init_codebooks`).

    Scale shape: ONE pass per iteration for ALL subspaces jointly —
    assign each row's m sub-slices to their nearest sub-centroids
    (narrow map against m·k literal arrays), posexplode to
    (subspace, cluster, dim, x) and partially aggregate to m·k·dsub
    rows back to the driver. Rows never move between executors; the
    codebook artifact is driver-sized (m·k·dsub floats — the point of
    PQ: 100 TB of float vectors served by a KB-scale table)."""
    dsub = dim // m
    books = pq_init_codebooks(df, dim, m, k, id_col, vec_col)
    for _ in range(max(0, iters - 1)):
        codes = df.select(
            vec_col,
            *[
                _pq_subspace_code(f"`{vec_col}`", j, dsub, books[j]).alias(
                    f"__c{j}"
                )
                for j in range(m)
            ],
        )
        # joint recompute: explode every subspace's dims in one pass
        parts = codes.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("sub"),
                            F.col(f"__c{j}").alias("cl"),
                            F.slice(F.col(vec_col), j * dsub + 1, dsub).alias(
                                "v"
                            ),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("s")
        ).select(
            F.col("s.sub").alias("sub"),
            F.col("s.cl").alias("cl"),
            F.posexplode("s.v").alias("pos", "x"),
        )
        rows = (
            parts.groupBy("sub", "cl", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("mu"))
            .collect()
        )
        new = [[list(c) for c in book] for book in books]
        for r in rows:
            new[r["sub"]][r["cl"]][r["pos"]] = float(r["mu"])
        books = new
    return books


def _pq_subspace_code(
    vec_sql: str, j: int, dsub: int, book: list[list[float]]
) -> Column:
    """argmin over the subspace-j codebook (ties → lowest code id)."""
    # SQL slice is 1-based, same as F.slice
    sub = f"slice({vec_sql}, {j * dsub + 1}, {dsub})"
    return F.array_min(_sq_dist_structs(sub, book))["cid"]


def pq_encode(
    df: DataFrame,
    dim: int,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` small codes (column ``codes``:
    array<int>) — dim·4 bytes → m bytes per vector. Pure narrow map
    against literal codebooks; zero shuffle."""
    m = len(codebooks)
    dsub = dim // m
    return df.select(
        id_col,
        vec_col,
        F.array(
            *[
                _pq_subspace_code(f"`{vec_col}`", j, dsub, codebooks[j])
                for j in range(m)
            ]
        ).alias("codes"),
    )


def pq_adc_topk(
    df: DataFrame,
    dim: int,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: the query stays full-precision; per
    subspace a driver-computed table of ``sqdist(query_sub, code)``
    turns each row's distance into m table lookups + adds (the
    IVF-ADC scan of Jégou et al. 2011). Returns (vec_id, adc_dist)
    ordered ascending; at scale this runs over the m-byte codes —
    the full vectors are never read after encode.

    ``rerank=N`` adds the standard exact re-rank stage: take the top-N
    ADC candidates, read ONLY their full vectors back (broadcast
    semi-join on the N-row candidate set — never a second full scan of
    the float column at the driver), and return the exact-L2 top-k
    among them. On weakly-clustered embeddings raw ADC recall is
    capped by quantization error (measured 0.4 → 0.8 with N=5k on the
    fixtures); production ANN stacks always re-rank."""
    m = len(codebooks)
    dsub = dim // m
    enc = pq_encode(df, dim, codebooks, id_col, vec_col)
    # per-subspace ADC lookup tables, computed on the driver with the
    # same left-to-right fold as the SQL replay; the m lookups + adds
    # fold left-to-right exactly like the old lit(0.0)+t0+...+t{m-1}
    # chain, as one zip_with over (table matrix, codes)
    tables = [
        [
            sum(
                (q - c) * (q - c)
                for q, c in zip(query_vec[j * dsub : (j + 1) * dsub], code)
            )
            for code in codebooks[j]
        ]
        for j in range(m)
    ]
    dist = F.expr(
        f"aggregate(zip_with({_sql_matrix(tables)}, codes, "
        "(t, code) -> element_at(t, code + 1)), 0.0D, (acc, x) -> acc + x)"
    )
    adc = (
        enc.select(id_col, F.round(dist, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(rerank if rerank is not None else k)
    )
    if rerank is None:
        return adc
    cand = df.join(F.broadcast(adc.select(id_col)), id_col)
    return (
        cand.select(
            id_col,
            F.round(
                _sq_dist_to_literal(F.col(vec_col), query_vec), 6
            ).alias("adc_dist"),
        )
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def pq_sample_codebooks_md5(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic PSEUDO-RANDOM PQ init: the ``k`` vectors with the
    smallest ``md5(cast(id as string))`` (ties → lowest id) seed the
    codebooks — the md5-keyed sampling convention of dedup_minhash_md5,
    replayable verbatim in DuckDB (``ORDER BY md5(CAST(vec_id AS
    VARCHAR)), vec_id LIMIT k``). Unlike :func:`pq_init_codebooks`'s
    lowest-id convention this is an unbiased sample of the corpus, so
    the certified twin exercises the production path's *trained-like*
    codebook quality, not just the decision plumbing."""
    dsub = dim // m
    init = (
        df.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .select(vec_col)
        .collect()
    )
    vecs = [[float(x) for x in r[0]] for r in init]
    return [[v[j * dsub : (j + 1) * dsub] for v in vecs] for j in range(m)]


def pq_refine_round(
    df: DataFrame,
    dim: int,
    books: list[list[list[float]]],
    decimals: int = 6,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """ONE Lloyd refinement iteration with the new centroids ROUNDED to
    ``decimals`` places — the oracle-replayable form of
    :func:`pq_train`: rounding happens JVM-side (``F.round``, HALF_UP)
    inside the partial aggregate so DuckDB's ``round(avg(x), 6)``
    reproduces the exact doubles, and every downstream encode/ADC
    decision is then computed from bit-identical centroid literals on
    both engines. Empty clusters keep their (rounded) init centroid.

    Same scale shape as pq_train: assignment is a zero-shuffle narrow
    map against m·k literal arrays; the recompute is one posexplode
    partial-agg returning m·k·dsub rows to the driver."""
    from decimal import ROUND_HALF_UP, Decimal  # noqa: PLC0415

    def _r(x: float) -> float:
        # Spark F.round parity: BigDecimal.valueOf(double) == repr(x)
        q = Decimal(1).scaleb(-decimals)
        return float(Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP))

    m = len(books)
    dsub = dim // m
    codes = df.select(
        vec_col,
        *[
            _pq_subspace_code(f"`{vec_col}`", j, dsub, books[j]).alias(
                f"__c{j}"
            )
            for j in range(m)
        ],
    )
    parts = codes.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.col(f"__c{j}").alias("cl"),
                        F.slice(F.col(vec_col), j * dsub + 1, dsub).alias("v"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s")
    ).select(
        F.col("s.sub").alias("sub"),
        F.col("s.cl").alias("cl"),
        F.posexplode("s.v").alias("pos", "x"),
    )
    rows = (
        parts.groupBy("sub", "cl", "pos")
        .agg(F.round(F.avg(F.col("x").cast("double")), decimals).alias("mu"))
        .collect()
    )
    new = [[[_r(x) for x in c] for c in book] for book in books]
    for r in rows:
        new[r["sub"]][r["cl"]][r["pos"]] = float(r["mu"])
    return new


# ---------------------------------------------------------------------------
# Spherical k-means (cosine Lloyd) — direction clustering for embeddings
# ---------------------------------------------------------------------------


def _unit(v: list[float]) -> list[float]:
    """Driver-side L2 normalization with a SEQUENTIAL square-sum fold
    (python sum == DuckDB list_sum fold order, NOT numpy's pairwise
    sum) so the SQL oracle replays the exact same doubles."""
    import math

    n = math.sqrt(sum(float(x) * float(x) for x in v))
    return [float(x) / n for x in v] if n > 0 else [float(x) for x in v]


def spherical_kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic spherical k-means (Dhillon & Modha 2001): cluster
    by DIRECTION — assignment is max cosine (equivalently max dot
    against unit centroids; the row's own norm is a positive constant,
    so it cannot change the argmax), update renormalizes the member
    mean. The standard clustering for embedding spaces where magnitude
    is nuisance (semantic sharding, SemDeDup-style bucketing).

    Determinism mirrors :func:`kmeans_fit`: first-k init (driver-
    normalized), ties break to the lowest cluster id. Scale shape is
    identical — assign is a zero-shuffle narrow map against k×dim
    literals, update one posexplode partial-agg returning k·dim rows.

    Returns (id, cluster, cos) where cos = dot(x, c_unit) / ||x||.
    """
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents: dict[int, list[float]] = {
        i: _unit([float(x) for x in r[0]]) for i, r in enumerate(init)
    }

    def assign(c: dict[int, list[float]]) -> DataFrame:
        # same transform-over-literal compaction as kmeans_fit.assign
        # (ascending cids ⇒ (negdot, index) argmin == (negdot, cid))
        cids = sorted(c)
        structs = F.expr(
            f"transform({_sql_matrix([c[i] for i in cids])}, "
            "(cent, i) -> named_struct("
            f"'negdot', -aggregate(zip_with(`{vec_col}`, cent, "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x), "
            "'cid', i))"
        )
        best = F.array_min(structs)  # max dot, ties -> lowest cid
        return df.select(
            id_col,
            vec_col,
            F.element_at(F.lit(cids), best["cid"] + 1).alias("cluster"),
            (-best["negdot"]).alias("dot"),
        )

    assigned = assign(cents)
    for _ in range(iters - 1):
        rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("v"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(
                r["v"]
            )
        cents = {
            cid: _unit([dims[p] for p in sorted(dims)])
            for cid, dims in by_cluster.items()
        }
        assigned = assign(cents)
    sq = F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double"))
    norm = F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x))
    return assigned.select(
        id_col,
        "cluster",
        F.round(F.col("dot") / norm, 4).alias("cos"),
    )
