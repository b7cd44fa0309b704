"""Similarity search over an embedding column (list<float>).

- brute_force_knn: the baseline — broadcast the (q x dim) query matrix via
  ray.put once; each batch computes a (batch x q) cosine matmul and emits
  its local top-k per query (the per-batch partial); the driver merges the
  tiny (n_batches x k x q) partials. No shuffle at all.
- ivf_knn: the scale path — k-means-ish coarse centroids (sampled + a few
  Lloyd iterations on the driver over a sample), every vector assigned to
  its nearest centroid inside map_batches; a query probes only the nprobe
  nearest centroid partitions.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_knn(
    emb: rd.Dataset, queries: np.ndarray, k: int = 10
) -> pd.DataFrame:
    """Exact cosine top-k. Returns (query_idx, vec_id, score) sorted by
    (query_idx, -score, vec_id)."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(q)

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        m = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float32))
        sims = m @ qm.T  # (batch, q)
        ids = batch["vec_id"].to_numpy()
        rows = {"query_idx": [], "vec_id": [], "score": []}
        kk = min(k, len(ids))
        for qi in range(qm.shape[0]):
            top = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            rows["query_idx"].extend([qi] * kk)
            rows["vec_id"].extend(ids[top].tolist())
            rows["score"].extend(sims[top, qi].tolist())
        return pd.DataFrame(rows)

    partials = emb.map_batches(_partial, batch_format="pandas", batch_size=4096).to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        top = heapq.nsmallest(
            k, g.itertuples(index=False), key=lambda r: (-r.score, r.vec_id)
        )
        out.extend(top)
    df = pd.DataFrame(out, columns=["query_idx", "vec_id", "score"])
    return df.sort_values(
        ["query_idx", "score", "vec_id"], ascending=[True, False, True]
    ).reset_index(drop=True)


def _train_centroids(emb: rd.Dataset, n_centroids: int, seed: int = 7, iters: int = 5) -> np.ndarray:
    """Coarse centroids from a CONTENT-KEYED sample: each row is admitted by
    a splitmix-style hash of its vec_id, so the sample (and therefore the
    trained centroids, assignments, and final top-k) is a pure function of
    the data + seed — independent of block layout / parallelism, unlike
    Dataset.random_sample whose per-block RNG changes with num_blocks. The
    driver pull is bounded at ~50 rows per centroid."""
    frac = min(1.0, max(0.01, (n_centroids * 50) / max(1, emb.count())))
    mod = np.uint64(1) << np.uint64(32)
    thresh = np.uint64(int(float(mod) * frac))
    mix = np.uint64(0x9E3779B97F4A7C15)
    sseed = np.uint64(seed)

    def _admit(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["vec_id"].to_numpy().astype(np.uint64)
        h = (v + sseed) * mix
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(32)
        return batch[(h % mod) < thresh]

    sample = (
        emb.map_batches(_admit, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id", kind="mergesort")
        .reset_index(drop=True)
    )
    m = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float32))
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_knn(
    emb: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 7,
) -> pd.DataFrame:
    """Approximate cosine top-k: vectors partitioned by nearest centroid;
    each query scans only its nprobe closest partitions."""
    cent = _train_centroids(emb, n_centroids, seed)
    cent_ref = ray.put(cent)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (q, nprobe)
    probe_sets = [set(row.tolist()) for row in probe]
    q_ref = ray.put(q)
    probe_ref = ray.put(probe_sets)

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        qm, centm, probes = ray.get(q_ref), ray.get(cent_ref), ray.get(probe_ref)
        m = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float32))
        assign = (m @ centm.T).argmax(axis=1)
        ids = batch["vec_id"].to_numpy()
        rows = {"query_idx": [], "vec_id": [], "score": []}
        for qi, pset in enumerate(probes):
            mask = np.isin(assign, list(pset))
            if not mask.any():
                continue
            sims = m[mask] @ qm[qi]
            sel_ids = ids[mask]
            kk = min(k, len(sel_ids))
            top = np.argpartition(-sims, kk - 1)[:kk]
            rows["query_idx"].extend([qi] * kk)
            rows["vec_id"].extend(sel_ids[top].tolist())
            rows["score"].extend(sims[top].tolist())
        return pd.DataFrame(rows)

    partials = emb.map_batches(_partial, batch_format="pandas", batch_size=4096).to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        top = heapq.nsmallest(
            k, g.itertuples(index=False), key=lambda r: (-r.score, r.vec_id)
        )
        out.extend(top)
    df = pd.DataFrame(out, columns=["query_idx", "vec_id", "score"])
    return df.sort_values(
        ["query_idx", "score", "vec_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
