"""Vector similarity search over embedding columns (north-star J3).

Three tiers, all pure DataFrame plans:

- brute-force cosine top-k: the correctness baseline. Dot products run
  as JVM higher-order functions (zip_with + aggregate) — no Python.
- IVF (inverted-file) top-k: coarse-quantize vectors to deterministic
  centroids once; probe only the nprobe nearest cells at query time.
  The scan prunes from O(N) to O(N * nprobe / ncells) — the 100 TB
  path, where cells map to partition pruning on a ``cell`` column.
- random-hyperplane LSH bucketing: sign-bit sketch for approximate
  candidate generation / near-dup blocking on embeddings.

Determinism: centroids/hyperplanes derive from fixed seeds; cosine
outputs are rounded (9 dp) — see plans/testbed.py module docstring.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, functions as F

from dex_data_ingestor_spark.functions.scalars import round_ieee


def _as_double_array(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    """Sequential-fold dot product of two double arrays (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def usable_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Hygiene gate for every cosine-scoring path: rows with a USABLE
    vector — non-NULL and nonzero norm. A failed encoder emits NULL or
    all-zero vectors at any real corpus scale; unguarded, a zero norm
    is an ANSI divide-by-zero in Spark while DuckDB returns NULL/inf,
    so the same row crashes one engine and silently ranks in the
    other. Oracles mirror with
    ``WHERE embedding IS NOT NULL AND list_dot_product(CAST(embedding
    AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0`` (the q_embed_auc
    convention). Narrow filter, pushed to the scan."""
    v = _as_double_array(F.col(vec_col))
    return df.filter(F.col(vec_col).isNotNull() & (dot(v, v) > 0))


def _query_lit(query_vec: list[float]):
    # One SQL-parsed literal array instead of len(vec) F.lit round
    # trips; repr() round-trips doubles exactly.
    return F.expr(
        "array(" + ",".join(f"{float(x)!r}D" for x in query_vec) + ")"
    )


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    round_dp: int = 9,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    v = _as_double_array(F.col(vec_col))
    q = _query_lit(query_vec)
    cos = round_ieee(cosine(v, q), round_dp).alias("cos_sim")
    return (
        df.select(F.col(id_col), cos)
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def seeded_centroids(dim: int, ncells: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-norm centroids from a fixed RNG seed.

    (K-means would give tighter cells; fixed seeds keep the index
    byte-reproducible, which the engine values over recall here. A
    kmeans_refine step can be layered on without changing the search.)
    """
    rng = random.Random(seed)
    cents = []
    for _ in range(ncells):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([x / n for x in v])
    return cents


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    cell_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (one narrow pass).

    At scale, write the result partitioned by ``cell`` so a probe scan
    prunes to the probed cells' files only.
    """
    v = _as_double_array(F.col(vec_col))
    nv = norm(v)
    # zero-norm / NULL embeddings (failed encoders) quarantine to a
    # NULL cell instead of raising ANSI DIVIDE_BY_ZERO mid-job: the
    # denominator substitutes 1.0 for the degenerate norm (masked out
    # below, so the value never surfaces), and the cell is NULL —
    # downstream same-cell pair stages then never compare these rows
    # (a NULL block key joins nothing), which is the usable_embeddings
    # quarantine semantics applied at the operator boundary.
    nv_safe = F.when(nv > 0, nv).otherwise(F.lit(1.0))
    scored = None
    for i, c in enumerate(centroids):
        # full cosine: centroids are NOT assumed unit-norm (k-means
        # means are not); |c| is a plan-time constant.
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        s = dot(v, _query_lit(c)) / (nv_safe * F.lit(cn))
        scored = (
            F.struct(s.alias("score"), F.lit(i).alias("cell"))
            if scored is None
            else F.greatest(
                scored, F.struct(s.alias("score"), F.lit(i).alias("cell"))
            )
        )
    usable = F.col(vec_col).isNotNull() & (nv > 0)
    return df.withColumn(cell_col, F.when(usable, scored["cell"]))


def ivf_topk(
    indexed: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    cell_col: str = "cell",
    round_dp: int = 9,
) -> DataFrame:
    """Probe the nprobe closest cells, then brute-force within them.

    Probe scoring divides by BOTH norms — the same full cosine
    ivf_assign uses for assignment. Scoring cells by raw dot (the
    query norm alone is a constant) disagrees with cosine assignment
    whenever centroids are not unit-norm (k-means means are not): the
    cell the true neighbors were assigned to by cosine may then never
    be probed. Identical for unit centroids (seeded_centroids)."""
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    sims = [
        (
            i,
            sum(a * b for a, b in zip(c, query_vec))
            / (qn * (math.sqrt(sum(x * x for x in c)) or 1.0)),
        )
        for i, c in enumerate(centroids)
    ]
    probe_cells = [i for i, _ in sorted(sims, key=lambda t: -t[1])[:nprobe]]
    pruned = indexed.filter(F.col(cell_col).isin(probe_cells))
    return cosine_topk(pruned, id_col, vec_col, query_vec, k, round_dp)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, nplanes: int, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nplanes)
    ]


def lsh_bucket(
    df: DataFrame,
    vec_col: str,
    planes: list[list[float]],
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Sign-bit sketch: bucket = sum(2^j * [dot(v, plane_j) > 0])."""
    v = _as_double_array(F.col(vec_col))
    acc = F.lit(0).cast("bigint")
    for j, p in enumerate(planes):
        bit = F.when(dot(v, _query_lit(p)) > 0, F.lit(1)).otherwise(F.lit(0))
        acc = acc + bit.cast("bigint") * F.lit(2**j).cast("bigint")
    return df.withColumn(bucket_col, acc)


def _py_dot(a: list[float], b: list[float]) -> float:
    """Sequential left-fold dot product — the same addition order as
    the engine's aggregate-based :func:`dot`, so the driver-side probe
    set agrees bit-for-bit with the executor-side bucket assignment.
    NOTE: DuckDB's list_dot_product is NOT this fold (it differs in
    the last ULPs — measured, see tests/test_vector_text.py
    test_lsh_probe_sign_decisions_match_duckdb); cross-engine
    agreement rests on sign decisions having margins far above
    accumulation noise, not on bit-identical dots."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def lsh_probe_buckets(
    query_vec: list[float],
    planes: list[list[float]],
    hamming_probe: int = 1,
) -> list[int]:
    """The multi-probe bucket set for a query: its own sign-bit bucket
    plus every bucket within Hamming distance ``hamming_probe`` of it
    (only 0 and 1 supported — distance-1 probing is the standard
    recall/cost point; each flipped bit crosses exactly one
    hyperplane). Pure driver-side arithmetic on the plane literals —
    O(nplanes * dim), no Spark job."""
    if hamming_probe not in (0, 1):
        raise ValueError("hamming_probe must be 0 or 1")
    qb = sum(
        2**j for j, p in enumerate(planes) if _py_dot(query_vec, p) > 0
    )
    probes = [qb]
    if hamming_probe == 1:
        probes += [qb ^ (2**j) for j in range(len(planes))]
    return probes


def lsh_ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    hamming_probe: int = 1,
    round_dp: int = 9,
) -> DataFrame:
    """Hyperplane-LSH approximate nearest neighbors (north-star J3's
    LSH-bucketed scale path, beside the IVF variant): vectors are
    sign-bit-bucketed once, the query probes its own bucket plus the
    Hamming-distance-1 neighbors (multi-probe — each flip crosses one
    hyperplane, the most likely quantization errors), and brute-force
    cosine runs only inside the probed buckets. With P planes the scan
    fraction is ~(P + 1) / 2^P of the corpus. At 100 TB ``lsh_bucket``
    is a partition/cluster key, making the probe filter partition
    pruning rather than a scan — and unlike IVF there is no centroid
    model state at all; the index is pure arithmetic on fixed plane
    literals, so the incremental path needs no refit."""
    probes = lsh_probe_buckets(query_vec, planes, hamming_probe)
    bucketed = lsh_bucket(df, vec_col, planes)
    pruned = bucketed.filter(F.col("lsh_bucket").isin(probes))
    return cosine_topk(pruned, id_col, vec_col, query_vec, k, round_dp)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_col: str | None = None,
    round_dp: int = 9,
    allow_cross: bool = False,
) -> DataFrame:
    """Pairs with cosine >= threshold; the blocking column keeps the
    self-join sub-quadratic (block by LSH bucket or IVF cell at scale —
    only same-block pairs are compared).

    ``block_col=None`` means an all-pairs crossJoin — O(n^2) rows and
    a certain job-killer on any large table, so it must be requested
    EXPLICITLY with ``allow_cross=True`` (intended for small
    validation universes only); omitting the block column alone raises
    instead of silently planning a quadratic join."""
    if block_col is None and not allow_cross:
        raise ValueError(
            "embedding_neardup_pairs without block_col plans an O(n^2) "
            "crossJoin; pass block_col (LSH bucket / IVF cell / label) "
            "or opt in explicitly with allow_cross=True on a small "
            "universe"
        )
    # Precompute each row's norm ONCE before the join: higher-order
    # folds are interpreted (not codegen), so evaluating 1 dot per pair
    # instead of 3 is a ~3x win on the quadratic stage. The arithmetic
    # (sqrt -> multiply -> divide) is unchanged, so results are
    # bit-identical to the inline-cosine form.
    cols = [
        F.col(id_col),
        _as_double_array(F.col(vec_col)).alias("__v"),
    ]
    if block_col is not None:
        cols.append(F.col(block_col))
    base = df.select(*cols).withColumn("__n", norm(F.col("__v")))
    a = base.select(
        *[F.col(c).alias(f"a_{c}") for c in (id_col, "__v", "__n")],
        *([F.col(block_col).alias("__blk")] if block_col else []),
    )
    b = base.select(
        *[F.col(c).alias(f"b_{c}") for c in (id_col, "__v", "__n")],
        *([F.col(block_col).alias("__blk")] if block_col else []),
    )
    joined = (
        a.join(b, on="__blk") if block_col else a.crossJoin(b)
    ).filter(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
    cos = round_ieee(
        dot(F.col("a___v"), F.col("b___v")) / (F.col("a___n") * F.col("b___n")),
        round_dp,
    )
    return (
        joined.select(
            F.col(f"a_{id_col}").alias("a_id"),
            F.col(f"b_{id_col}").alias("b_id"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def l2_normalize(vec_col: str, out_col: str = "unit_vec"):
    """Unit-normalize an embedding column (narrow transform)."""
    v = _as_double_array(F.col(vec_col))
    n = norm(v)
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v).alias(
        out_col
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float,
    cell_col: str = "cell",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embeddings with a coarse quantizer,
    then drop within-cluster near-duplicates — pairs whose cosine
    similarity reaches ``threshold`` — keeping each duplicate group's
    lowest id (the same deterministic survivor rule as the MinHash-LSH
    curation stage). Returns the survivor rows with their cluster id
    attached.

    Scale shape: the clustering is exactly what bounds the pairwise
    stage — only same-cell pairs are ever compared (sub-quadratic by
    construction; at web scale K is chosen so cells hold ~10^2-10^3
    vectors and the per-cell all-pairs is embarrassingly parallel
    after ONE shuffle on the cell key). Assignment itself is a narrow
    pass against broadcast plan-time centroid literals; refine them
    first with :func:`kmeans_refine` if seeded planes are too coarse.
    The min-id survivor makes the output byte-reproducible across
    runs and partitionings — auditable training data.

    Hot-cell caveat (the analog of the LSH hot-bucket problem, but
    WITHOUT a cap): within-cell comparison is all-pairs, so one
    degenerate cell holding 10^6 vectors is a quadratic stage. Unlike
    lsh_candidate_pairs, a sub-bucket tiling cap here would CHANGE
    results (pairs are cosine-verified, so the b-side set is not
    cap-invariant) — the correct lever is K: size the quantizer so
    cells hold ~10^2-10^3 vectors (K ≈ n/500, the SemDeDup paper's
    regime) and kmeans_refine to balance them; audit cell sizes
    before the pair stage on unfamiliar corpora."""
    indexed = ivf_assign(df, vec_col, centroids, cell_col)
    pairs = embedding_neardup_pairs(
        indexed, id_col, vec_col, threshold, block_col=cell_col
    )
    losers = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return indexed.join(losers, id_col, "left_anti")


def semantic_dedup_fast(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float,
    cell_col: str = "cell",
) -> DataFrame:
    """:func:`semantic_dedup` through the BLAS pair kernel — the
    production path for the within-cell stage (one cosine matmul per
    cell under applyInPandas instead of the interpreted per-pair HOF
    fold). The survivor SET is identical to the expression form: the
    assignment pass is the same ivf_assign, and the pair kernel
    rounds to 9 dp before the threshold compare, mirroring the HOF
    form's round-then-filter rule (see embedding_neardup_pairs_fast's
    round_dp note for the measure-zero tie caveat). Keep the
    expression form as the no-Python plan-asserted baseline; use this
    when cells are dense-embedding-sized."""
    indexed = ivf_assign(df, vec_col, centroids, cell_col)
    pairs = embedding_neardup_pairs_fast(
        indexed, id_col, vec_col, threshold, block_col=cell_col,
        round_dp=9,
    )
    losers = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return indexed.join(losers, id_col, "left_anti")


def kmeans_refine(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    iterations: int = 2,
) -> list[list[float]]:
    """Lloyd iterations over the IVF coarse quantizer.

    Each round: assign (narrow) -> per-cell mean via posexplode +
    (cell, dim) aggregate (one shuffle) -> collect K x dim floats to
    the driver (model state, O(K*dim), never data). Seeded centroids
    keep the index reproducible; refinement tightens cells for recall.
    """
    dim = len(centroids[0])
    current = centroids
    for _ in range(iterations):
        assigned = ivf_assign(df, vec_col, current)
        sums = (
            assigned.select(
                "cell", F.posexplode(_as_double_array(F.col(vec_col)))
            )
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("mean"))
            .collect()
        )
        table: dict[int, list[float]] = {}
        for row in sums:
            table.setdefault(row.cell, [0.0] * dim)[row.pos] = row.mean
        # empty cells keep their previous centroid
        current = [table.get(i, current[i]) for i in range(len(current))]
    return current


def embedding_neardup_pairs_fast(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_col: str,
    round_dp: int | None = None,
) -> DataFrame:
    """Vectorized near-dup pairs: per-block cosine matrix via numpy
    under applyInPandas (Arrow batches, one BLAS matmul per block).

    ~10-100x the interpreted higher-order-function form on dense
    embeddings — the production path when blocks (LSH bucket / IVF
    cell / label) fit executor memory; the HOF form
    (embedding_neardup_pairs) stays the bit-reproducible oracle
    baseline, and a tolerance test asserts both agree. Output:
    (a_id, b_id, cos_sim float64 — unrounded when ``round_dp`` is
    None).

    ``round_dp`` mirrors the HOF form's round-before-threshold rule
    so the PAIR SET (the part consumers like semantic dedup read)
    matches it: BLAS pairwise-summation dots differ from the fold in
    the last ULPs (~1e-16 relative — the measured DuckDB
    list_dot_product band), and rounding to ``round_dp`` before the
    compare absorbs that noise everywhere except a half-way tie at
    exactly the threshold digit — measure-zero on real cosines, the
    same argument the 9-dp discipline already rests on. Note
    ``np.round`` is half-even while Spark's ``round`` is HALF_UP;
    the emitted cos_sim value can therefore differ on a tie digit —
    round_dp guards the DECISION, not value-level parity."""
    from collections import Counter

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("a_id", T.LongType()),
            T.StructField("b_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # ok-mask (the pq_encode_fast pattern): a NULL or odd-length
        # vector would crash np.stack and kill the whole job, where
        # the HOF twin computes a NULL cosine and drops the pair at
        # the threshold filter — dropping the rows up front yields
        # exactly the twin's pair set, keeping the documented
        # "survivor SET is identical" contract on dirty blocks.
        vecs = list(pdf[vec_col])
        lens = [len(v) for v in vecs if v is not None]
        # modal length = the corpus dim; a lone longer/shorter corrupt
        # vector must not outvote the block
        want = Counter(lens).most_common(1)[0][0] if lens else 0
        ok = np.array(
            [v is not None and len(v) == want for v in vecs], dtype=bool
        )
        pdf = pdf[ok]
        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "a_id": pd.Series([], dtype="int64"),
                    "b_id": pd.Series([], dtype="int64"),
                    "cos_sim": pd.Series([], dtype="float64"),
                }
            )
        ids = pdf[id_col].to_numpy()
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cos = unit @ unit.T
        if round_dp is not None:
            cos = np.round(cos, round_dp)
        ai, bi = np.triu_indices(len(ids), k=1)
        mask = cos[ai, bi] >= threshold
        ai, bi = ai[mask], bi[mask]
        vals = cos[ai, bi]
        a, b = ids[ai], ids[bi]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"a_id": a2, "b_id": b2, "cos_sim": vals})

    return (
        df.select(F.col(id_col), F.col(vec_col), F.col(block_col))
        .groupBy(block_col)
        .applyInPandas(kernel, out_schema)
    )


def _make_np_quantizer(dim: int):
    """Build the numpy micro-unit quantizer as a CLOSURE — the ONE
    numpy copy of the exactness-critical floor(x*1e6 + 0.5) rule
    shared by gram_matrix_fast and pq_encode_fast. It must be a
    closure, not a module-level function: the Arrow kernels capture
    it, and cloudpickle ships closures BY VALUE while module-level
    functions ship by reference (module + qualname) — a by-reference
    kernel helper makes every fast twin crash with
    ModuleNotFoundError on any executor whose PYTHONPATH lacks this
    package (found by a clean-worker driver-sim; pinned in
    tests/test_worker_env.py). Every other kernel in this repo is
    already a self-contained closure for the same reason.

    The returned quantizer raises on wrong-length rows (a silent
    top-left block labeled as the full result is the failure mode)
    and on non-finite elements (np.floor(NaN).astype(int64) is
    UNDEFINED — typically INT64_MIN — and would overflow-wrap the
    integer matmuls into garbage with no error; callers either
    pre-quarantine such rows or want the loud failure)."""
    import numpy as np

    def quantize(values):
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in values])
        if mat.shape[1] != dim:
            raise ValueError(
                f"vector length {mat.shape[1]} != declared dim {dim}"
            )
        if not np.isfinite(mat).all():
            raise ValueError(
                "non-finite (NaN/Inf/NULL-element) vector components — "
                "quantization is undefined; filter or quarantine upstream"
            )
        return np.floor(mat * 1e6 + 0.5).astype(np.int64)

    return quantize


def gram_matrix_fast(
    df: DataFrame, vec_col: str, dim: int
) -> DataFrame:
    """Exact integer gram matrix via per-batch BLAS — the scale twin
    of the q_embed_gram nested-transform explode: each Arrow batch
    quantizes to micro-unit int64 (``floor(x*1e6 + 0.5)`` — equal to
    the expression form's DECIMAL(18,6) cast for any value that is
    not a 6-dp repr tie, which float32-origin embeddings cannot be;
    equality is pinned by test at two SFs) and folds to its LOCAL
    ``U.T @ U`` (one exact int64 matmul), so only d(d+1)/2 cells per
    batch reach the (i, j) exchange — same shuffle story as the
    explode form, but the 104M per-cell multiplies run as ONE BLAS
    call per batch instead of 104M Catalyst struct allocations:
    measured 0.36 s vs 6.6 s at sf0.1 (18x).

    This is the sanctioned-kernel case (the multimodal codecs / the
    blocked cosine kernel): a dense matrix product is where columnar
    expression evaluation genuinely loses two orders of magnitude to
    BLAS. Exactness bounds: per-product ≤ ~2^42 micro-unit²; a batch
    (and the int64 partial sums) overflow only past ~5.7e7 rows per
    batch — far above any Arrow batch size; the GLOBAL sums aggregate
    in DECIMAL(38,0), and the final double conversion is exact while
    |cell| < 2^53 scaled units (the q_embed_gram bound — q+r like
    q_twap beyond)."""
    import numpy as np
    import pandas as pd

    quantize = _make_np_quantizer(dim)

    def kernel(batches):
        iu = np.triu_indices(dim)
        for pdf in batches:
            if pdf.empty:
                continue
            units = quantize(pdf[vec_col])
            gram = units.T @ units
            yield pd.DataFrame(
                {
                    "i": iu[0] + 1,
                    "j": iu[1] + 1,
                    "n": np.full(len(iu[0]), len(pdf), dtype=np.int64),
                    "s_units": gram[iu],
                }
            )

    cells = df.select(F.col(vec_col)).mapInPandas(
        kernel, "i long, j long, n long, s_units long"
    )
    return cells.groupBy("i", "j").agg(
        F.sum("n").cast("bigint").alias("n"),
        (
            F.sum(F.col("s_units").cast("decimal(38,0)"))
            .cast("double")
            / F.lit(1e12)
        ).alias("gram"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): codebook compression + ADC search
# ---------------------------------------------------------------------------


def quantize_units(x: float) -> int:
    """The PQ component quantization: pure-IEEE
    ``floor(x * 1e6 + 0.5)`` — the q_twap rule. Python floats ARE
    IEEE doubles, so this is bit-identical to Spark's
    ``F.floor(x * 1e6 + 0.5)`` and DuckDB's
    ``FLOOR(x * 1000000.0 + 0.5)`` with no cast-semantics caveat.
    (A DECIMAL(18,6) cast is NOT used here: Spark rounds the
    shortest-decimal repr HALF_UP, so e.g. the double nearest
    0.1234565 casts to 123457 in Spark but 123456 under true-value
    rounding — the r7 q_twap lesson, pinned in
    tests/test_vector_text.py.)

    Input domain (documented precondition, like q_twap's value >= 0):
    the exact-integer pipelines downstream — PQ sub-unit squared-L2
    sums, the gram-matrix micro-unit products, the JL projection
    accumulators — assume unit-scale embedding components (|x| up to
    ~1e3 keeps every int64 product exact). A garbage row with |x|
    ~1e30 fails LOUDLY under ANSI mode (long overflow / DECIMAL range
    error) rather than silently corrupting the index — the intended
    behavior; clean such rows upstream (the usable_embeddings gate
    removes NULL/zero-norm rows, not magnitude outliers)."""
    return math.floor(x * 1e6 + 0.5)


def pq_codebooks(
    dim: int, m: int, k: int, seed: int = 11
) -> list[list[list[int]]]:
    """m per-subspace codebooks of k centroids each, in integer
    MICRO-UNITS (``dim % m == 0``). Seeded like the IVF centroids
    (byte-reproducible index over recall; a k-means refinement can be
    layered on without changing the search), then quantized once so
    the entire PQ pipeline — encode argmin AND ADC ranking — is exact
    integer arithmetic with no cross-engine float caveat at all,
    unlike the IVF/LSH argmax which rests on score margins."""
    sub = dim // m
    if sub * m != dim:
        raise ValueError(
            f"dim={dim} must divide evenly into m={m} subspaces — "
            "trailing components would be silently dropped from every "
            "distance, including the exact re-rank"
        )
    return [
        [
            [quantize_units(x) for x in c]
            for c in seeded_centroids(sub, k, seed=seed + 97 * s)
        ]
        for s in range(m)
    ]


def _unit_lit(vals: list[int]):
    return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")


def _sub_units(v, s: int, sub: int):
    """Slice subspace s of a float-array column and quantize each
    component to exact micro-unit longs via the pure-IEEE
    floor(x*1e6 + 0.5) rule (see quantize_units)."""
    return F.transform(
        F.slice(v, s * sub + 1, sub),
        lambda x: F.floor(x.cast("double") * 1000000.0 + F.lit(0.5)),
    )


def _sq_l2_units(sub_units, code_units: list[int]):
    """Exact squared L2 between a micro-unit long array column and a
    literal micro-unit codeword: components ≤ ~2^21, squares ≤ 2^42,
    8-term sums ≤ 2^45 — exact longs throughout."""
    return F.aggregate(
        F.zip_with(
            sub_units, _unit_lit(code_units), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[int]]],
    codes_col: str = "codes",
) -> DataFrame:
    """Assign each subspace its nearest codeword (exact integer
    squared-L2 argmin, ties to the LOWEST code index via
    least(struct)) — one narrow pass, dim doubles -> m small ints per
    row (~32x smaller index at m=8 codes vs 64 doubles). At scale the
    codes table is the only thing the search tier stores.

    Expression-form note (both alternatives were built and measured
    at sf0.1 before keeping this one): (a) materializing the
    quantized subspaces as projected array columns and indexing them
    with getItem doubled the runtime — the optimizer inlines the
    alias and the transform re-evaluates per reference; (b) fully
    FLAT per-component arithmetic (factored sum(x²)-2·sum(c·x)+
    sum(c²), no arrays at all) OOMs janino — ~m·k·sub inlined
    subtrees per generated function. The zip_with+aggregate HOF form
    keeps the generated code linear in m·k, and encode is an
    index-BUILD cost paid once per corpus, not per query."""
    v = F.col(vec_col)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    code_exprs = []
    for s in range(m):
        su = _sub_units(v, s, sub)
        best = None
        for ci, c in enumerate(codebooks[s]):
            st = F.struct(
                _sq_l2_units(su, c).alias("d"), F.lit(ci).alias("c")
            )
            best = st if best is None else F.least(best, st)
        code_exprs.append(best["c"])
    return df.withColumn(codes_col, F.array(*code_exprs))


def pq_encode_fast(
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[int]]],
    codes_col: str = "codes",
) -> DataFrame:
    """BLAS twin of :func:`pq_encode` (the gram_matrix_fast
    precedent): per Arrow batch, quantize to micro-unit int64 with
    the SAME floor(x*1e6 + 0.5) rule (numpy float64 is IEEE — bit-
    identical to the expression form) and compute every codeword
    distance in one ``X @ C.T`` matmul per subspace via the exact
    integer factorization ``|x|² - 2x·c + |c|²``; ``argmin`` takes
    the first occurrence, which IS the lowest code index — the
    least(struct) tie-break. Codes are therefore equal row-for-row
    to pq_encode (pinned by test); use this form for bulk index
    builds (measured 5x at sf0.1: 0.22 s vs 1.10 s for the m=8/k=16
    encode), the expression form where a no-Python plan is wanted.
    NULL / wrong-dimension / non-finite-element vectors quarantine to
    NULL codes (a NaN component would make the integer distances
    undefined — the expression form's own behavior on NaN is not a
    contract worth reproducing); an existing ``codes_col`` is
    REPLACED, matching withColumn semantics."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    m = len(codebooks)
    sub = len(codebooks[0][0])
    dim = m * sub
    cb = np.array(codebooks, dtype=np.int64)  # m x k x sub
    if codes_col in df.columns:
        df = df.drop(codes_col)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(codes_col, T.ArrayType(T.IntegerType()))]
    )

    quantize = _make_np_quantizer(dim)

    def kernel(batches):
        for pdf in batches:
            vals = pdf[vec_col]
            ok = np.array(
                [
                    v is not None
                    and len(v) == dim
                    and np.isfinite(
                        np.asarray(v, dtype=np.float64)
                    ).all()
                    for v in vals
                ]
            )
            codes: list = [None] * len(pdf)
            idx = np.where(ok)[0]
            if len(idx):
                units = quantize(vals.iloc[idx])
                cs = np.empty((len(idx), m), dtype=np.int32)
                for s in range(m):
                    x = units[:, s * sub : (s + 1) * sub]
                    c = cb[s]
                    d = (
                        (x * x).sum(1)[:, None]
                        - 2 * (x @ c.T)
                        + (c * c).sum(1)[None, :]
                    )
                    cs[:, s] = np.argmin(d, axis=1)
                for row_i, i in enumerate(idx):
                    codes[i] = cs[row_i].tolist()
            out = pdf.copy()
            out[codes_col] = pd.Series(codes, index=pdf.index, dtype=object)
            yield out

    return df.mapInPandas(kernel, out_schema)


def pq_adc_topk(
    encoded: DataFrame,
    id_col: str,
    codebooks: list[list[list[int]]],
    query_vec: list[float],
    k: int = 10,
    codes_col: str = "codes",
) -> DataFrame:
    """Asymmetric-distance top-k: the query is quantized once on the
    driver, the per-subspace lookup table of exact squared distances
    (micro-unit² longs) is embedded as literals, and each row's
    approximate distance is m table lookups + an exact integer sum —
    no per-row vector math at query time, THE property that makes PQ
    the RAM-bound billion-vector search layout. Ranking is fully
    deterministic (integer distance, id tie-break)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    qu = [quantize_units(x) for x in query_vec]
    dist = None
    for s in range(m):
        qs = qu[s * sub : (s + 1) * sub]
        lut = [
            sum((a - b) * (a - b) for a, b in zip(qs, c))
            for c in codebooks[s]
        ]
        term = F.element_at(_unit_lit(lut), F.col(codes_col)[s] + 1)
        dist = term if dist is None else dist + term
    return (
        encoded
        # pq_encode_fast quarantines bad vectors to NULL codes; their
        # NULL distances would sort FIRST ascending and displace true
        # neighbors from the top-k — quarantined rows are not
        # candidates, so they are excluded before ranking
        .filter(F.col(codes_col).isNotNull())
        .select(F.col(id_col), dist.alias("approx_dist_units"))
        .orderBy("approx_dist_units", id_col)
        .limit(k)
    )


def pq_rerank_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[int]]],
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
) -> DataFrame:
    """The production two-stage PQ search: ADC shortlist (codes-only,
    constant work per row) -> exact integer-L2 re-rank of the
    shortlist against the raw vectors. At 100 TB the shortlist stage
    touches ONLY the compressed codes table; the raw-vector page-in is
    `shortlist` rows per query, so the expensive exact metric runs on
    a candidate set that no longer depends on corpus size. Both
    stages are exact integer arithmetic in micro-units, so ranking —
    including every tie-break — is engine-portable.

    Plan shape: encode is a narrow map, the shortlist is a
    TakeOrdered, the re-rank is a second TakeOrdered over <= shortlist
    rows joined back to their vectors (broadcast-sized by
    construction)."""
    sub = len(codebooks[0][0])
    m = len(codebooks)
    v = F.col(vec_col)
    encoded = pq_encode(df, vec_col, codebooks)
    short = pq_adc_topk(
        encoded, id_col, codebooks, query_vec, k=shortlist
    )
    qu = [quantize_units(x) for x in query_vec]
    vu = F.flatten(
        F.array(*[_sub_units(v, s, sub) for s in range(m)])
    )
    exact = F.aggregate(
        F.zip_with(vu, _unit_lit(qu), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        df.join(F.broadcast(short.select(id_col)), id_col, "inner")
        .select(F.col(id_col), exact.alias("dist_units"))
        .orderBy("dist_units", id_col)
        .limit(k)
    )


def pq_train_codebooks(
    df: DataFrame,
    vec_col: str,
    dim: int,
    m: int,
    k: int,
    iterations: int = 3,
    seed: int = 11,
) -> list[list[list[int]]]:
    """L2 Lloyd training of the per-subspace codebooks — the real PQ
    fit (seeded random codewords are reproducible but loose; k-means
    sub-codebooks are what gives PQ its recall). Distributed shape:
    every iteration is ONE Spark job over ALL subspaces at once (each
    row explodes into its m sub-vectors tagged by subspace), the
    assignment is the same exact integer argmin pq_encode uses (so
    training and encoding can never disagree on a boundary), and only
    the (s, code, pos) means — O(m·k·sub) floats, model state, never
    data — come back to the driver. Means are re-quantized to
    micro-units each round, keeping every assignment deterministic;
    empty codes keep their previous codeword."""
    sub = dim // m
    cbs = pq_codebooks(dim, m, k, seed=seed)
    v = F.col(vec_col)
    parts = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"), _sub_units(v, s, sub).alias("su")
            )
            for s in range(m)
        ]
    )
    subs = (
        df.filter(v.isNotNull())
        .select(F.explode(parts).alias("p"))
        .select("p.s", "p.su")
    )
    for _ in range(iterations):
        code = None
        for ci in range(k):
            # per-subspace codeword ci as a 2-level literal indexed by s
            cw = F.expr(
                "array("
                + ",".join(
                    "array(" + ",".join(f"{u}L" for u in cbs[s][ci]) + ")"
                    for s in range(m)
                )
                + ")"
            )
            d = F.aggregate(
                F.zip_with(
                    F.col("su"),
                    F.element_at(cw, F.col("s") + 1),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            st = F.struct(d.alias("d"), F.lit(ci).alias("c"))
            code = st if code is None else F.least(code, st)
        means = (
            subs.withColumn("c", code["c"])
            .select("s", "c", F.posexplode("su"))
            .groupBy("s", "c", "pos")
            .agg(F.avg("col").alias("mu"))
            .collect()
        )
        table: dict[tuple[int, int], list[int]] = {}
        for r in means:
            # r.mu is ALREADY a micro-unit mean: round it to the
            # nearest unit directly (a /1e6 then *1e6 round-trip
            # through quantize_units adds two IEEE roundings that can
            # flip an exact .5 mean by one unit)
            table.setdefault((r.s, r.c), [0] * sub)[r.pos] = math.floor(
                r.mu + 0.5
            )
        cbs = [
            [table.get((s, ci), cbs[s][ci]) for ci in range(k)]
            for s in range(m)
        ]
    return cbs


# ---------------------------------------------------------------------------
# Dimensionality reduction: seeded random projection (JL) + corpus PCA
# ---------------------------------------------------------------------------


def projection_matrix_units(
    dim: int, out_dim: int, seed: int = 29
) -> list[list[int]]:
    """``out_dim`` seeded unit-norm Gaussian rows over ``dim``,
    quantized once to integer MICRO-UNITS by the ``quantize_units``
    rule — the Johnson–Lindenstrauss projection as a pure literal.

    Integer quantization is what makes the projection an EXACT
    operator: every projected component is a sum of int64 products
    (|u| ~ 1e6-scale units x |r| <= 1e6 units over ``dim`` terms —
    bounded far under 2^63), so engine and oracle agree bit-for-bit
    with no dot-product ULP caveat (the PQ discipline, not the
    IVF/LSH margin argument). Shared verbatim with the generated
    oracle SQL, like the IVF centroid literals."""
    return [
        [quantize_units(x) for x in row]
        for row in seeded_centroids(dim, out_dim, seed=seed)
    ]


def random_project(
    df: DataFrame,
    vec_col: str,
    matrix_units: list[list[int]],
    id_cols: tuple[str, ...] = ("vec_id",),
) -> DataFrame:
    """Project each vector onto the rows of ``matrix_units``
    (:func:`projection_matrix_units` output) — the scale path for
    squeezing a wide embedding column before LSH/clustering when no
    trained codebook exists (JL preserves pairwise distances within
    1±eps at out_dim = O(log n / eps^2); for a data-adapted basis see
    :func:`pca_fit` / :func:`pca_project`).

    Long-form output (id_cols..., comp 1-based, proj_units BIGINT,
    proj DOUBLE): ``proj_units`` is the exact integer micro^2-unit
    dot product; ``proj`` its exact double (|units| < 2^53 holds for
    unit-norm rows against micro-unit embeddings until |v| ~ 1e3 —
    far beyond normalized-embedding norms).

    Plan: entirely narrow — quantize once to a projected column (HOF
    lambdas re-evaluate argument expressions per element, the r1
    lesson), one zip_with/aggregate per component, posexplode. Zero
    shuffles at any corpus size; wrong-length vectors are dropped
    (callers quarantine upstream if they need the rows)."""
    dim = len(matrix_units[0])
    ids = [F.col(c) for c in id_cols]
    base = (
        df.filter(F.col(vec_col).isNotNull())
        .select(*ids, F.col(vec_col).cast("array<double>").alias("__v"))
        .filter(F.size("__v") == dim)
        .select(
            *ids,
            F.expr(
                "transform(__v, e -> "
                "CAST(FLOOR(e * 1000000.0D + 0.5D) AS BIGINT))"
            ).alias("__u"),
        )
    )
    comps = []
    for row in matrix_units:
        lit = "array(" + ",".join(f"{v}L" for v in row) + ")"
        comps.append(
            f"aggregate(zip_with(__u, {lit}, (x, y) -> x * y), "
            "0L, (a, b) -> a + b)"
        )
    arr = "array(" + ",".join(comps) + ")"
    return base.select(
        *ids, F.posexplode(F.expr(arr)).alias("__pos", "proj_units")
    ).select(
        *id_cols,
        (F.col("__pos") + 1).alias("comp"),
        "proj_units",
        (F.col("proj_units").cast("double") / F.lit(1e12)).alias("proj"),
    )


def pca_fit(
    df: DataFrame, vec_col: str, dim: int, out_dim: int
) -> tuple[list[list[int]], list[float]]:
    """Fit a PCA basis from the corpus: exact integer gram matrix
    (:func:`gram_matrix_fast` — one d(d+1)/2-cell shuffle regardless
    of corpus size), mean-centered covariance and its
    eigendecomposition on the DRIVER (a dim x dim symmetric eigh —
    O(dim^3) once, model state O(out_dim x dim), never data), top
    ``out_dim`` eigenvectors quantized to micro-units.

    Returns ``(components_units, explained_variance)`` with
    eigenvalues descending. The quantized basis is deliberately NOT
    re-orthonormalized after rounding (error <= 5e-7 per component —
    property-tested); :func:`pca_project` applies it through the same
    exact-integer path as :func:`random_project`, so train once,
    project anywhere, byte-reproducibly.

    Data-derived model => no static cross-engine oracle (the IVF
    literals are data-independent; these are not) — correctness is
    pinned by pytest properties (orthonormality, descending
    eigenvalues, exact-projection equality vs numpy, variance
    capture >= JL) instead of a DuckDB twin."""
    import numpy as np

    cells = gram_matrix_fast(df, vec_col, dim).collect()
    if not cells:
        raise ValueError("pca_fit: empty corpus")
    n = cells[0]["n"]
    gram = np.zeros((dim, dim))
    mean_units = np.zeros(dim)
    for r in cells:
        gram[r["i"] - 1, r["j"] - 1] = r["gram"]
        gram[r["j"] - 1, r["i"] - 1] = r["gram"]
    # column means from the diagonal pass would need a separate sum;
    # one tiny extra agg keeps the fit exact
    sums = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).cast("array<double>").alias("__v"))
        .filter(F.size("__v") == dim)
        .select(
            F.posexplode(
                F.expr(
                    "transform(__v, e -> "
                    "CAST(FLOOR(e * 1000000.0D + 0.5D) AS BIGINT))"
                )
            ).alias("pos", "u")
        )
        .groupBy("pos")
        .agg(F.sum("u").alias("s"))
        .collect()
    )
    for r in sums:
        mean_units[r["pos"]] = r["s"] / n
    mu = mean_units / 1e6
    cov = gram / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:out_dim]
    comps = [
        [quantize_units(float(x)) for x in evecs[:, k]] for k in order
    ]
    return comps, [float(evals[k]) for k in order]


def pca_project(
    df: DataFrame,
    vec_col: str,
    components_units: list[list[int]],
    id_cols: tuple[str, ...] = ("vec_id",),
) -> DataFrame:
    """Project the corpus onto a fitted PCA basis — identical exact-
    integer engine as :func:`random_project` (the basis is just
    data-adapted instead of seeded). Projections are of the UNCENTERED
    vectors; subtract the component-projected mean downstream when a
    centered score is needed (centering inside the integer path would
    make every projection depend on a float mean and forfeit
    exactness)."""
    return random_project(df, vec_col, components_units, id_cols=id_cols)


def mmr_greedy_units(
    candidates: list[tuple[int, int]],
    sims: dict[tuple[int, int], int],
    k: int,
    lam10: int = 7,
) -> list[tuple[int, int, int]]:
    """Greedy maximal-marginal-relevance selection over a BOUNDED
    shortlist, entirely in exact integers: lambda is carried as
    tenths (lam10=7 is the classic 0.7) so the marginal score
    ``lam10*rel_units - (10-lam10)*max_sim_units`` is a BIGINT and
    ties break on the smaller id — a DuckDB oracle unrolling the same
    k argmax steps is bit-identical (Carbonell & Goldstein 1998 with
    the PQ/twap integer discipline).

    ``candidates`` is [(id, rel_units)], ``sims`` maps (a, b) ordered
    pairs to quantized similarity units (looked up in both orders;
    missing pairs count as similarity 0). The first pick maximizes
    ``lam10*rel_units`` alone (the empty-set convention). Returns
    [(sel_rank, id, mmr_units)] with sel_rank starting at 1.

    This is DRIVER-side on purpose: the input is the O(depth) +
    O(depth^2) shortlist, corpus-size-independent (the same bounded-
    model-state argument as the collected IVF centroids) — the
    corpus-scale work (scoring + top-depth cut + pairwise sims) stays
    distributed in the caller.
    """
    remaining = dict(candidates)
    selected: list[tuple[int, int, int]] = []
    while remaining and len(selected) < k:
        best = None
        for cid, rel in remaining.items():
            if selected:
                max_sim = max(
                    sims.get((cid, sid), sims.get((sid, cid), 0))
                    for _, sid, _ in selected
                )
                score = lam10 * rel - (10 - lam10) * max_sim
            else:
                score = lam10 * rel
            if best is None or (score, -cid) > (best[1], -best[0]):
                best = (cid, score)
        selected.append((len(selected) + 1, best[0], best[1]))
        del remaining[best[0]]
    return selected


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    lo: int,
    hi: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """Distributed EXACT exclusive prefix sum of ``value_col`` in
    ``order_col`` order — the two-level (range-bucketed) form of the
    classic single-partition running-total window, for tables whose
    row count outgrows one partition.

    Level 1 assigns each row a range bucket by pure integer division
    of ``order_col`` (values must be distinct BIGINTs in [lo, hi] —
    with duplicates the within-bucket order would be ambiguous);
    level 2 runs the running total WITHIN each bucket (parallel,
    partitioned window) and adds each bucket's broadcast offset (the
    prefix over the n_buckets-row bucket-total table — the only
    single-partition window left, bounded by n_buckets rows however
    large the input). All sums are exact BIGINTs, so the result is
    bit-identical to the global-window form (property-tested).
    """
    from pyspark.sql import Window

    span = hi - lo + 1
    width = max(1, -(-span // n_buckets))
    b = df.withColumn(
        "__bucket",
        F.expr(f"CAST((CAST({order_col} AS BIGINT) - ({lo})) "
               f"DIV {width} AS BIGINT)"),
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = b.withColumn(
        "__within",
        F.coalesce(F.sum(value_col).over(w_in), F.lit(0)).cast("long"),
    )
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        b.groupBy("__bucket")
        .agg(F.sum(value_col).cast("long").alias("__btotal"))
        .select(
            "__bucket",
            F.coalesce(F.sum("__btotal").over(w_off), F.lit(0))
            .cast("long")
            .alias("__offset"),
        )
    )
    return (
        within.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            out_col, (F.col("__offset") + F.col("__within")).cast("long")
        )
        .drop("__bucket", "__within", "__offset")
    )
