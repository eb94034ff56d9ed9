"""Similarity search over embedding columns (``array<float>``).

* **Brute-force cosine top-k** — the exact baseline: one narrow pass
  computing dot products against a broadcast query vector (``F.aggregate``
  + ``zip_with``, all JVM-side), then TakeOrdered for top-k. At 100 TB the
  scan dominates; no shuffle until the final k-row reduction.
* **Random-hyperplane LSH** — the scale path: H sign-bits bucket each
  vector; candidates share the query's bucket, exact cosine re-ranks only
  those. Hyperplanes come from a fixed LCG so the bucketing is
  reproducible across engines (oracle-checkable).

Math notes: accumulation is sequential left-to-right in DOUBLE on both
engines, so scores are bit-comparable after rounding; the driver fixture's
embeddings are unit-normalized (checked), so cosine == dot product — norms
are still computed for generality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "cosine_top_k",
    "HYPERPLANES",
    "hyperplane_bucket",
    "lsh_top_k",
    "embedding_near_dup_pairs",
    "ivf_assign",
    "ivf_top_k",
    "pq_sub_dist2",
    "pq_encode",
    "pq_adc_dist",
    "kcenter_greedy",
    "JL_SIGNS",
    "JL_K",
    "jl_project",
]


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_top_k(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    The query vector rides into the plan as a literal array (broadcast by
    value); ordering carries an id tiebreak so the selected set is
    deterministic.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --------------------------------------------------------------- LSH path
_N_PLANES = 8
_DIM = 64


def _lcg_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5)."""
    planes, state = [], 2026
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append(state / float(2**31) - 0.5)
        planes.append(row)
    return planes


HYPERPLANES: list[list[float]] = _lcg_planes(_N_PLANES, _DIM)


def hyperplane_bucket(vec_col: str = "embedding") -> Column:
    """LSH bucket id: integer of the 8 sign bits of plane dot products.

    Takes the vector COLUMN NAME and builds one generated-SQL expression:
    the 8x64 plane literals cost ~500 py4j round-trips through the Column
    API, a parsed string is one call. Double math is identical to the
    Column form (sequential zip/fold, plane lits already double)."""
    terms = []
    for i, plane in enumerate(HYPERPLANES):
        lits = ", ".join(f"{float(v)!r}D" for v in plane)
        d = (
            f"aggregate(zip_with({vec_col}, array({lits}), "
            f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
        )
        terms.append(
            f"CASE WHEN {d} > 0 THEN CAST({2**i} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END"
        )
    return F.expr("CAST(0 AS BIGINT) + " + " + ".join(terms))


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    Candidate pairs share a random-hyperplane bucket (identical vectors
    always collide), then exact cosine keeps pairs at/above ``threshold``.
    The self-join shuffles both sides on the bucket key only — candidate
    volume is the sum of per-bucket squares, never n^2. At 100 TB recall
    is widened with multiple bucket tables (band OR-ing) and skewed
    buckets are split by salting; single-table here to stay
    oracle-checkable.
    """
    # repartition: a compact parquet source gives few splits, serializing
    # the 8 plane dot-products; persist: the self-join reads buckets twice
    b = (
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col(id_col),
            F.col(vec_col),
            hyperplane_bucket(vec_col).alias("bucket"),
        )
        .persist()
    )
    lhs, rhs = b.alias("a"), b.alias("b")
    return (
        lhs.join(
            rhs,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_top_k(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank restricted to the query's
    LSH bucket. Recall trades against the 2^8 bucketing; at scale, multiple
    tables (band OR-ing) would widen recall — single-table here."""
    import math

    qb = 0
    for i, plane in enumerate(HYPERPLANES):
        d = 0.0
        for x, y in zip(query_vec, plane):
            d += float(x) * y
        if d > 0:
            qb += 2**i
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.withColumn("bucket", hyperplane_bucket(vec_col))
        .filter(F.col("bucket") == qb)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --------------------------------------------------------------- IVF path
def ivf_assign(
    df: DataFrame,
    centroid_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse assignment: each vector joins its nearest centroid.

    The centroid table is tiny by construction (the coarse quantizer always
    is), so the assignment is a broadcast nested-loop over k centroids —
    one narrow pass over the corpus, no shuffle of the vectors. Centroids
    here are picked deterministically by id (a production build replaces
    this with k-means; the assignment/probe mechanics are identical).
    Ties break toward the lowest centroid id.
    """
    centroids = df.filter(F.col(id_col).isin([int(c) for c in centroid_ids])).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    # r14 (guide §2.4): per-row argmax over the (metadata-scale) centroid
    # array instead of a row_number() window partitioned by the vector id
    # — the window exchanged and sorted the ENTIRE corpus by vec_id where
    # zero shuffles are needed. The centroid set rides in as one
    # broadcast single-row array; ties break identically (max by c_sim,
    # then lowest cid, via the struct ordering).
    cents = centroids.agg(
        F.collect_list(F.struct("cid", "cvec")).alias("cents")
    )
    best = F.array_max(
        F.transform(
            "cents",
            lambda c: F.struct(
                cosine(F.col(vec_col), c["cvec"]).alias("s"),
                (-c["cid"]).alias("nc"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return (
        df.crossJoin(F.broadcast(cents))
        .select(F.col(id_col), F.col(vec_col), best["cid"].alias("cid"))
    )


def ivf_top_k(
    df: DataFrame,
    query_vec: list[float],
    centroid_vecs: dict[int, list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """IVF probe: exact cosine top-k restricted to the ``nprobe`` inverted
    lists whose centroids are nearest the query.

    Probe selection runs driver-side over the metadata-scale centroid set;
    the corpus-side work is a partition-pruned scan of the probed lists
    (at scale the assignment is materialized partitioned BY cid, so
    non-probed lists are never read) + TakeOrdered.
    """

    def _cos(a: list[float], b: list[float]) -> float:
        dp = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) * float(x) for x in a) ** 0.5
        nb = sum(float(y) * float(y) for y in b) ** 0.5
        return dp / (na * nb)

    ranked = sorted(
        centroid_vecs.items(), key=lambda kv: (-_cos(query_vec, kv[1]), kv[0])
    )
    probe_cids = [cid for cid, _ in ranked[:nprobe]]

    assigned = ivf_assign(df, list(centroid_vecs.keys()), id_col, vec_col)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cand = assigned.filter(F.col("cid").isin(probe_cids))
    if exclude_ids:
        cand = cand.filter(~F.col(id_col).isin([int(i) for i in exclude_ids]))
    return (
        cand.select(
            F.col(id_col),
            F.col("cid"),
            F.round(cosine(F.col(vec_col), q), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ------------------------------------------------- product quantization (PQ)
#
# PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
# TPAMI 2011) is the standard way to fit a web-scale embedding corpus in
# memory: split each D-dim vector into M subvectors, quantize each against
# a K-entry per-subspace codebook, and answer queries with asymmetric
# distance computation (ADC) — a sum of M table lookups instead of a D-term
# dot product. At 100 TB the corpus shrinks ~D*4/M bytes per vector and the
# scan becomes integer-code lookups; the codebook is metadata-scale (M*K
# subvectors) and rides to every executor as plan literals, so encoding is
# one narrow pass with NO shuffle and NO Python.
#
# Determinism contract (oracle-checkable): per-subspace squared distances
# are sequential double folds (same order both engines), rounded to 6 dp
# BEFORE the argmin so a last-ulp wobble can't flip code assignment; ties
# break toward the lowest code via struct (dist, code) min.

def pq_sub_dist2(a: Column, b: Column, m: int, sub: int) -> Column:
    """Squared L2 distance over subspace ``m`` (dims m*sub .. (m+1)*sub-1)
    of two float arrays, accumulated sequentially in DOUBLE."""
    return F.aggregate(
        F.zip_with(
            F.slice(a, m * sub + 1, sub),
            F.slice(b, m * sub + 1, sub),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    df: DataFrame,
    codebook: list[list[float]],
    n_sub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to ``n_sub`` uint8-ish codes (columns
    ``code_0..code_{n_sub-1}``) against a shared codebook.

    ``codebook`` is K full-dimension vectors (the per-subspace codebooks are
    their slices — "shared coarse training set" flavor); it is always
    metadata-scale, so each centroid subvector becomes a literal array in
    the plan. One narrow projection pass; no shuffle, no Python.
    """
    # The plan is assembled as ONE generated SQL expression per code column
    # (F.expr), not nested Column calls: n_sub*K centroid literal arrays
    # built element-wise through the Column API cost thousands of py4j
    # round-trips (~1.5s of driver time per query build); a parsed string
    # is one call. Semantics are identical — same HOFs, same double math.
    dim = len(codebook[0])
    sub = dim // n_sub
    out = df
    for m in range(n_sub):
        cands = []
        for k, cent in enumerate(codebook):
            lits = ", ".join(f"{float(v)!r}D" for v in cent[m * sub : (m + 1) * sub])
            d = (
                f"round(aggregate(zip_with("
                f"slice({vec_col}, {m * sub + 1}, {sub}), array({lits}), "
                f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
                f"0.0D, (acc, v) -> acc + v), 6)"
            )
            cands.append(f"named_struct('d', {d}, 'c', {k})")
        out = out.withColumn(
            f"code_{m}", F.expr(f"array_min(array({', '.join(cands)})).c")
        )
    return out


def pq_adc_dist(
    query_vec: list[float],
    codebook: list[list[float]],
    n_sub: int = 4,
) -> Column:
    """ADC distance column over ``code_0..code_{n_sub-1}``.

    The M×K distance table is computed driver-side from the query and
    codebook (plain sequential Python-double sums — bit-identical to the
    engine folds) and baked into the plan as literal arrays; the per-row
    cost is M ``element_at`` lookups + an M-term sum. Unrounded — callers
    round the final output."""
    dim = len(codebook[0])
    sub = dim // n_sub
    terms = []
    for m in range(n_sub):
        lo, hi = m * sub, (m + 1) * sub
        table = [
            sum(
                (float(q) - float(c)) * (float(q) - float(c))
                for q, c in zip(query_vec[lo:hi], cent[lo:hi])
            )
            for cent in codebook
        ]
        lits = ", ".join(f"{v!r}D" for v in table)
        terms.append(f"element_at(array({lits}), code_{m} + 1)")
    # single generated-SQL expression (see pq_encode: py4j chattiness)
    return F.expr("0.0D + " + " + ".join(terms))


# ------------------------------------------ k-center greedy coreset (FPS)
def kcenter_greedy(
    df: DataFrame,
    k: int = 5,
    start_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center / farthest-point sampling (Gonzalez 1985): the
    classic 2-approximation coreset — pick the seed, then repeatedly the
    point FARTHEST from everything selected so far. The standard recipe
    for a small diverse subset of a huge training corpus (anchor sets,
    eval probes, cluster seeding).

    Scale shape: k-1 rounds, each ONE narrow map (min-distance against
    <=k broadcast literal vectors) + a single struct-min reduction —
    no shuffle of the corpus, no pairwise joins, driver state is k
    vectors (metadata). Distances are 6dp-rounded before the argmax and
    ties break toward the lowest id, so selection is deterministic and
    oracle-checkable.

    Returns (step, <id_col>, dist): selection order, chosen id, and the
    chosen point's distance to the previously-selected set (NULL for the
    seed) — the trace of coverage radii, which is also the k-center
    cost curve.
    """
    spark = df.sparkSession
    seed = df.filter(F.col(id_col) == start_id).select(id_col, vec_col).head()
    picked = [(1, int(seed[0]), None)]
    vecs = [[float(x) for x in seed[1]]]
    dim = len(vecs[0])
    for step in range(2, k + 1):
        dists = [
            pq_sub_dist2(
                F.col(vec_col), F.array(*[F.lit(x) for x in v]), 0, dim
            )
            for v in vecs
        ]
        d = F.round(F.least(*dists) if len(dists) > 1 else dists[0], 6)
        top = (
            df.filter(~F.col(id_col).isin([p[1] for p in picked]))
            .select(
                F.min(
                    F.struct(
                        (-d).alias("nd"),
                        F.col(id_col).alias("vid"),
                        F.col(vec_col).alias("vec"),
                    )
                ).alias("m")
            )
            .head()["m"]
        )
        picked.append((step, int(top["vid"]), -float(top["nd"])))
        vecs.append([float(x) for x in top["vec"]])
    return spark.createDataFrame(
        picked, f"step int, {id_col} long, dist double"
    )


def lsh_multiprobe_top_k(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., VLDB'07): besides the query's own
    bucket, probe the buckets reached by flipping the ``nprobe - 1``
    hyperplane bits with the SMALLEST |margin| — the planes the query sits
    closest to, where a true neighbor most likely landed on the other
    side. Recall rises toward exact without any extra hash tables; the
    probe-set computation touches only the query vector (driver-side
    metadata), and the scan stays one bucket-membership filter + exact
    re-rank over ~nprobe/2^planes of the corpus. Deterministic: margin
    ties break by plane index."""
    margins = []
    qb = 0
    for i, plane in enumerate(HYPERPLANES):
        d = 0.0
        for x, y in zip(query_vec, plane):
            d += float(x) * y
        if d > 0:
            qb += 2**i
        margins.append((abs(d), i))
    flips = [i for _, i in sorted(margins)[: max(0, nprobe - 1)]]
    probes = [qb] + [qb ^ (1 << i) for i in flips]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.withColumn("bucket", hyperplane_bucket(vec_col))
        .filter(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --------------------------------- Johnson-Lindenstrauss random projection
JL_K = 16


def _lcg_signs(k: int, dim: int) -> list[list[float]]:
    """Deterministic Rademacher (+1/-1) projection matrix, k rows x dim cols.

    Bit 16 of the LCG state drives the sign — the low bit of a power-of-two
    modulus LCG alternates and would give a striped (useless) matrix."""
    rows, state = [], 7707
    for _ in range(k):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append(1.0 if (state >> 16) & 1 else -1.0)
        rows.append(row)
    return rows


JL_SIGNS: list[list[float]] = _lcg_signs(JL_K, _DIM)
_JL_SCALE = JL_K**0.5


def jl_project(vec_col: str = "embedding") -> Column:
    """Project a 64-dim vector to JL_K dims with the Rademacher sign matrix
    (Achlioptas 2003: +-1 entries satisfy the JL lemma at the same k as
    Gaussians). One generated-SQL expression — k zip_with/aggregate dot
    products over sign literals, scaled 1/sqrt(k); stays inside whole-stage
    codegen, zero shuffle, and cuts downstream distance math + memory 4x,
    which at 100 TB is the difference between an in-memory re-rank tier
    and a spill."""
    dims = []
    for row in JL_SIGNS:
        lits = ", ".join(f"{float(v)!r}D" for v in row)
        dims.append(
            f"(aggregate(zip_with({vec_col}, array({lits}), "
            f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v) "
            f"/ {_JL_SCALE!r}D)"
        )
    return F.expr("array(" + ", ".join(dims) + ")")
