"""ANN + embedding near-dup semantics on a clustered fixture.

Random-uniform vectors can't meaningfully test LSH (everything is equally
far); a clustered fixture — base centers plus tiny-noise copies — gives
ground-truth near neighbors, so recall and pair-finding are real assertions.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from transcript_cdc.functions.dedup_text import embedding_near_dup_pairs
from transcript_cdc.functions.vectors import cosine_topk, lsh_candidate_topk, make_planes

DIM = 16
N_CLUSTERS = 30
PER_CLUSTER = 5


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(21)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for ci in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[ci] + 0.02 * rng.standard_normal(DIM)
            v /= np.linalg.norm(v)
            rows.append((vid, ci, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<float>")
    return {"df": df.cache(), "centers": centers}


def test_exact_topk_returns_own_cluster(clustered):
    q = [float(x) for x in clustered["centers"][3]]
    top = cosine_topk(clustered["df"], "embedding", q, PER_CLUSTER, id_col="vec_id")
    got = {r.cluster for r in top.collect()}
    assert got == {3}


def test_lsh_topk_recall_on_clusters(clustered):
    planes = make_planes(DIM, 6, seed=5)
    recalls = []
    for ci in [0, 7, 19]:
        q = [float(x) for x in clustered["centers"][ci]]
        exact = {r.vec_id for r in cosine_topk(clustered["df"], "embedding", q, PER_CLUSTER, id_col="vec_id").collect()}
        approx = {r.vec_id for r in lsh_candidate_topk(clustered["df"], "embedding", q, planes, PER_CLUSTER, id_col="vec_id").collect()}
        recalls.append(len(exact & approx) / len(exact))
    # tight clusters share hyperplane signs with their center almost always
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_lsh_candidates_scored_identically_to_exact(clustered):
    q = [float(x) for x in clustered["centers"][11]]
    planes = make_planes(DIM, 6, seed=5)
    approx = lsh_candidate_topk(clustered["df"], "embedding", q, planes, 3, id_col="vec_id").collect()
    exact = {
        r.vec_id: r.score
        for r in cosine_topk(clustered["df"], "embedding", q, 10**6, id_col="vec_id").collect()
    }
    for r in approx:
        assert abs(r.score - exact[r.vec_id]) < 1e-6


def test_embedding_near_dup_finds_clusters_only(clustered):
    planes = make_planes(DIM, 6, seed=5)
    pairs = embedding_near_dup_pairs(
        clustered["df"], "embedding", "vec_id", planes=planes, cosine_threshold=0.98
    ).collect()
    assert len(pairs) > 0
    id2c = {r.vec_id: r.cluster for r in clustered["df"].collect()}
    for p in pairs:
        assert id2c[p.id_a] == id2c[p.id_b], "cross-cluster pair above 0.98"


def test_ivf_topk_recall_on_clusters(clustered):
    from transcript_cdc.functions.vectors import ivf_topk, make_centroids

    cents = make_centroids(DIM, 8, seed=3)
    recalls = []
    for ci in [2, 9, 21]:
        q = [float(x) for x in clustered["centers"][ci]]
        exact = {r.vec_id for r in cosine_topk(clustered["df"], "embedding", q, PER_CLUSTER, id_col="vec_id").collect()}
        approx = {r.vec_id for r in ivf_topk(clustered["df"], "embedding", q, cents, PER_CLUSTER, nprobe=2, id_col="vec_id").collect()}
        recalls.append(len(exact & approx) / len(exact))
    # a tight cluster lands in one cell; the query probes that cell
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_full_probe_equals_exact(clustered):
    """nprobe = n_cells degenerates to the exact scan."""
    from transcript_cdc.functions.vectors import ivf_topk, make_centroids

    cents = make_centroids(DIM, 4, seed=3)
    q = [float(x) for x in clustered["centers"][5]]
    exact = [(r.vec_id, round(r.score, 6)) for r in cosine_topk(clustered["df"], "embedding", q, 10, id_col="vec_id").collect()]
    full = [(r.vec_id, round(r.score, 6)) for r in ivf_topk(clustered["df"], "embedding", q, cents, 10, nprobe=4, id_col="vec_id").collect()]
    assert exact == full
