"""Per-group representative selection via density clustering (M6/W4/W5).

Reference: dataset_construction/clustering/cluster.py — per triplet, DBSCAN
over image features (cosine metric, eps=0.25, min_samples=1,
cluster.py:84-91,136), keep the best-scored image per cluster
(cluster.py:110-117), order clusters by score (cluster.py:167).

Spark shape: ``groupBy(s,p,o).applyInPandas(...)`` — each group is one
triplet's images (small by construction: top-K bounded upstream), so the
per-group numpy DBSCAN is O(k²) with k ≤ topK.  Determinism: rows are
sorted (score desc, tiebreak id) before clustering and DBSCAN with
min_samples=1 on a fixed row order yields a unique labeling — results are
partitioning- and seed-invariant (SURVEY.md §7 hard part 2).

sklearn is deliberately not required: DBSCAN with min_samples=1 reduces to
connected components of the eps-neighborhood graph, implemented in ~20
lines of numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _cosine_dist_matrix(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    u = x / norms
    return 1.0 - u @ u.T


def _dbscan_min1(dist: np.ndarray, eps: float) -> np.ndarray:
    """DBSCAN(min_samples=1) == connected components of the eps-graph.
    Deterministic label ids: component of row i gets the smallest row index
    it contains."""
    n = dist.shape[0]
    labels = np.arange(n)
    adj = dist <= eps
    # label propagation to fixed point (n small: ≤ topK)
    changed = True
    while changed:
        changed = False
        for i in range(n):
            m = labels[adj[i]].min()
            if m < labels[i]:
                labels[i] = m
                changed = True
    return labels


def _silhouette_euclidean(x: np.ndarray, labels: np.ndarray) -> float | None:
    """Mean silhouette coefficient (euclidean), sklearn-convention: size-1
    clusters contribute 0; returns None when the labeling is degenerate
    (one cluster, or every point its own cluster) — exactly the reference's
    guard at cluster.py:115-119 before calling sklearn silhouette_score."""
    n = x.shape[0]
    uniq = np.unique(labels)
    if uniq.size <= 1 or uniq.size >= n:
        return None
    diff = x[:, None, :] - x[None, :, :]
    dist = np.sqrt((diff * diff).sum(-1))
    s = np.zeros(n)
    for i in range(n):
        same = labels == labels[i]
        n_same = same.sum()
        if n_same <= 1:
            continue  # sklearn: silhouette of a size-1 cluster is 0
        a = dist[i][same].sum() / (n_same - 1)
        b = min(
            dist[i][labels == c].mean() for c in uniq if c != labels[i]
        )
        denom = max(a, b)
        s[i] = 0.0 if denom == 0 else (b - a) / denom
    return float(s.mean())


def cluster_representatives(
    groundings: DataFrame,
    features: DataFrame,
    keys: list[str] = ("s", "p", "o"),
    id_col: str = "media_ref",
    feature_col: str = "features",
    score_col: str = "score",
    eps: float = 0.25,
) -> DataFrame:
    """One representative image per visual cluster per triplet, with the
    reference's per-triplet diagnostics (A10).

    ``groundings``: (keys..., media_ref, score); ``features``:
    (media_ref, features array<float>).  → groundings rows of the kept
    representatives + cluster_id + cluster_size + per-triplet diagnostics:
    n_clusters, n_deleted (= images - clusters, cluster.py:169-182 return
    ``len(visit) - n_clusters``), silhouette (euclidean mean, NULL when the
    labeling is degenerate — cluster.py:115-124 skips the score then; the
    per-group NaN becomes SQL NULL at the Arrow boundary).
    """
    keys = list(keys)
    joined = groundings.join(features, id_col, "inner")

    out_schema = (
        ", ".join(f"{k} string" for k in keys)
        + f", {id_col} string, {score_col} double, cluster_id int,"
        " cluster_size int, n_clusters int, n_deleted int, silhouette double"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # W5: best-scored first; stable tiebreak on id for determinism
        pdf = pdf.sort_values(
            [score_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        feats = np.vstack(pdf[feature_col].to_numpy()).astype("float64")
        labels = _dbscan_min1(_cosine_dist_matrix(feats), eps)
        n_clusters = int(np.unique(labels).size)
        sil = _silhouette_euclidean(feats, labels)
        pdf = pdf.assign(cluster_id=labels.astype("int32"))
        sizes = pdf.groupby("cluster_id")[id_col].transform("size")
        pdf = pdf.assign(
            cluster_size=sizes.astype("int32"),
            n_clusters=np.int32(n_clusters),
            n_deleted=np.int32(len(pdf) - n_clusters),
            silhouette=np.nan if sil is None else sil,
        )
        # W4: first (= best-scored) row per cluster
        keep = pdf.groupby("cluster_id", as_index=False).head(1)
        return keep[
            keys
            + [id_col, score_col, "cluster_id", "cluster_size",
               "n_clusters", "n_deleted", "silhouette"]
        ]

    return joined.groupBy(*keys).applyInPandas(per_group, schema=out_schema)
