"""Vector scoring + similarity search (SURVEY.md §2.4 J4; engine additions).

The reference scores 1024-d embeddings inside OpenSearch kNN
(services/search.py:27-30, correlations.py:92-96). Here scoring is a
JVM-side expression over array<float>: zip_with product + aggregate sum —
no Python, stays in codegen. Brute-force cosine top-k is the exact
baseline; LSH-bucketed ANN (random-hyperplane SimHash of the embedding)
is the 100TB scale path: candidates are co-bucketed so the similarity join
degrades from O(N·Q) to O(N·Q / 2^bits) with a hash-partitioned join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """dot(a, b) via zip_with + aggregate — built-in, vectorized, codegen."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(ca, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_with_query(vec_col: Column | str, query: Sequence[float]) -> Column:
    """Score against a constant query vector (broadcast as a literal array —
    the reference's single query embedding, correlations.py:92)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return dot(vec_col, q)


def cosine_topk(
    df: DataFrame, vec_col: str, query: Sequence[float], k: int,
    id_col: str = "vec_id", normalized: bool = True, score_name: str = "score",
) -> DataFrame:
    """Exact brute-force top-k by cosine (dot product if inputs normalized).

    Plans as scan → project(score) → TakeOrderedAndProject: one pass, no
    shuffle of the table, k·P rows to the driver-side merge.
    """
    score = dot_with_query(vec_col, query)
    if not normalized:
        qn = sum(float(x) * float(x) for x in query) ** 0.5
        score = score / (norm(vec_col) * F.lit(qn))
    return (
        df.withColumn(score_name, score.cast("double"))
        .orderBy(F.col(score_name).desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplane_signature(
    vec_col: Column | str, planes: Sequence[Sequence[float]]
) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(dot(v, plane_i)).
    Returned as a long (bits packed little-endian)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = (dot(c, F.array(*[F.lit(float(x)) for x in p])) > 0).cast("long")
        sig = sig + (bit * F.lit(2**i).cast("long"))
    return sig


def lsh_candidate_topk(
    df: DataFrame, vec_col: str, query: Sequence[float],
    planes: Sequence[Sequence[float]], k: int, id_col: str = "vec_id",
    score_name: str = "score",
) -> DataFrame:
    """ANN: filter to the query's LSH bucket, then exact top-k inside it.

    At scale, signature is precomputed+partitioned at write time so the
    filter becomes partition pruning; here it is computed on the fly.
    Recall < 1 by construction; the bench compares against cosine_topk.
    """
    qsig_val = 0
    for i, p in enumerate(planes):
        d = sum(float(x) * float(y) for x, y in zip(query, p))
        qsig_val += (1 if d > 0 else 0) * 2**i
    cand = df.filter(hyperplane_signature(vec_col, planes) == F.lit(qsig_val))
    return cosine_topk(cand, vec_col, query, k, id_col=id_col, score_name=score_name)


def make_planes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no model; hermetic)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


# ---------- IVF (inverted-file) ANN — the coarse-quantizer scale path ----------

def make_centroids(dim: int, n_cells: int, seed: int = 17) -> list[list[float]]:
    """Deterministic unit-norm coarse-quantizer centroids. A production
    deployment would k-means these on a sample; random unit centroids keep
    the engine hermetic while exercising the identical plan shape."""
    import numpy as np

    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_cells, dim))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return c.tolist()


def ivf_cell(vec_col: Column | str, centroids: Sequence[Sequence[float]]) -> Column:
    """Cell id = argmax over centroids of dot(v, centroid) — JVM expressions
    only; the per-centroid dot array is let-bound so it computes once."""
    from transcript_cdc.functions.expr import bind

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    dots = F.array(
        *[dot(c, F.array(*[F.lit(float(x)) for x in cent])) for cent in centroids]
    )
    return bind(dots, lambda d: F.array_position(d, F.array_max(d)) - 1)


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    centroids: Sequence[Sequence[float]],
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    score_name: str = "score",
) -> DataFrame:
    """IVF ANN: search only the `nprobe` cells nearest the query, exact
    top-k inside them.

    The query→cell ranking is a driver-side O(n_cells·dim) loop (constant).
    At 100 TB the cell id is computed at WRITE time and used as a partition
    column, so this filter becomes partition pruning — zero I/O outside the
    probed cells; here it is computed on the fly (same plan shape, scan +
    filter). Recall grows with nprobe; the bench compares to cosine_topk.
    """
    scored_cells = sorted(
        range(len(centroids)),
        key=lambda i: -sum(float(a) * float(b) for a, b in zip(query, centroids[i])),
    )
    probes = scored_cells[:nprobe]
    cand = df.filter(ivf_cell(vec_col, centroids).isin([int(p) for p in probes]))
    return cosine_topk(cand, vec_col, query, k, id_col=id_col, score_name=score_name)


def hash_embed(col: Column | str, dim: int = 16, hash_fn: str = "xx64") -> Column:
    """Deterministic hash-based feature vector for text — the hermetic
    stand-in for the reference's SentenceTransformers embedder
    (pipeline.py:47-50): token → hash bucket → L2-normalized counts.
    Pure built-ins: split/hash/aggregate, no Python, no model.
    hash_fn="md5" selects the portable hash (functions.portable) whose
    DuckDB/Python twins make hash-embedding queries oracle-verifiable."""
    from transcript_cdc.functions.expr import bind
    from transcript_cdc.functions.portable import portable_hash32

    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.lower(F.trim(c)), r"\s+")
    tok_hash = portable_hash32 if hash_fn == "md5" else F.xxhash64
    # let-bind twice: the token-bucket array is evaluated once (not once per
    # output dimension), and the unnormalized count vector once (not once
    # per element during normalization).
    buckets = F.transform(words, lambda w: F.pmod(tok_hash(w), F.lit(dim)))

    def body(bk: Column) -> Column:
        def bucket_count(i: int):
            # closure capture: a 2-arg lambda would receive the array index
            return F.size(F.filter(bk, lambda b: b == i)).cast("double")

        return F.array(*[bucket_count(i) for i in range(dim)])

    arr = bind(buckets, body)

    def normalize(a: Column) -> Column:
        return bind(
            F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)),
            lambda n: F.transform(a, lambda v: v / F.greatest(n, F.lit(1e-12))),
        )

    return bind(arr, normalize)
