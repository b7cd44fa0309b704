"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine.

Scale shapes (ray_guide "Aggregation at scale"):
- exact: vectorized content-hash column -> hash-partition groupby -> keep the
  first (min doc_id) row per hash. One shuffle on the hash key.
- MinHash-LSH: shingle -> 64 minhashes -> B bands x R rows -> explode to
  (band, band_hash, doc_id) rows -> groupby band bucket -> candidate pairs
  -> exact-Jaccard verify -> min-label propagation for components. Only
  bucket rows shuffle; signatures are computed vectorized per batch.
- SimHash: 64-bit signature; banding on 16-bit chunks gives candidates;
  verify by Hamming distance.
- embedding cosine: sign-LSH buckets over normalized vectors; verify by dot
  product within bucket.

Every operator returns a Dataset keyed by doc_id with a dup_group column
(= min doc_id of its duplicate cluster) so downstream "keep one per group"
is a trivial filter dup_group == doc_id.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

import ray.data as rd

# ---------------------------------------------------------------------------
# exact dedup


def add_md5(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    batch["text_md5"] = batch[col].fillna("").map(
        lambda s: hashlib.md5(s.encode("utf8")).hexdigest()
    )
    return batch


def exact_dedup(docs: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
    """Exact dedup by content hash; keeps min doc_id per text
    (the reference's only exact-dedup precedents: A4 idxmin and the disabled
    drop_duplicates at util.py:42, made explicit here)."""

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.loc[[g[id_col].idxmin()]].copy()
        keep["n_copies"] = len(g)
        return keep

    return (
        docs.map_batches(add_md5, batch_format="pandas")
        .groupby("text_md5")
        .map_groups(_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash

_WORD_RE = re.compile(r"\w+")
_MERSENNE = (1 << 61) - 1


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle hashes (uint64) of a lowercased document."""
    s = text.lower()
    if len(s) < k:
        s = s + " " * (k - len(s))
    views = [s[i : i + k] for i in range(len(s) - k + 1)]
    return pd.util.hash_array(np.array(views, dtype=object), categorize=False)


def _minhash_params(n_perm: int, seed: int = 1337):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod p universal-hash minimum per permutation, vectorized:
    one (n_shingles x n_perm) product per doc."""
    x = sh.astype(np.uint64)[:, None]
    hashed = (x * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return hashed.min(axis=0)


class MinHashStage:
    """Actor-pool stage: permutation parameters generated once per actor."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 1337):
        self.a, self.b = _minhash_params(n_perm, seed)
        self.k = shingle_k
        self.n_perm = n_perm

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.empty((len(batch), self.n_perm), dtype=np.uint64)
        for i, text in enumerate(batch["text"].fillna("")):
            sigs[i] = minhash_signature(_shingles(text, self.k), self.a, self.b)
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
        out["sig"] = list(sigs)
        return out


def _band_rows(batch: pd.DataFrame, n_bands: int) -> pd.DataFrame:
    """Explode signatures into (band, band_hash, doc_id) bucket rows."""
    sigs = np.stack(batch["sig"].to_numpy())
    n, n_perm = sigs.shape
    r = n_perm // n_bands
    rows = {"doc_id": [], "band": [], "band_hash": []}
    for bnd in range(n_bands):
        chunk = sigs[:, bnd * r : (bnd + 1) * r]
        h = pd.util.hash_array(
            np.array(["_".join(map(str, row)) for row in chunk], dtype=object),
            categorize=False,
        )
        rows["doc_id"].extend(batch["doc_id"].tolist())
        rows["band"].extend([bnd] * n)
        rows["band_hash"].extend(h.tolist())
    return pd.DataFrame(rows)


def _jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(_shingles(a, k).tolist()), set(_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_dedup(
    docs: rd.Dataset,
    *,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    concurrency: int = 2,
) -> rd.Dataset:
    """Near-dup clustering: returns (doc_id, dup_group).

    Verified candidate pairs come back to the driver (candidate sets are a
    tiny fraction of the corpus by LSH design — log() any truncation);
    union-find over pairs labels components; labels broadcast back as a
    dict for a final vectorized map_batches."""
    texts_by_id = None  # fetched lazily for verification

    sigs = docs.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"n_perm": n_perm, "shingle_k": shingle_k},
        batch_format="pandas",
        batch_size=2048,
        concurrency=concurrency,
    )
    buckets = sigs.map_batches(
        lambda b: _band_rows(b, n_bands), batch_format="pandas"
    )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        anchor = ids[0]
        return pd.DataFrame({"a": [anchor] * (len(ids) - 1), "b": ids[1:]})

    cand = (
        buckets.groupby(["band", "band_hash"])
        .map_groups(_pairs, batch_format="pandas")
        .to_pandas()
    )
    if "a" not in cand.columns:  # fully-empty result loses its schema
        cand = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    cand = cand.drop_duplicates()

    # exact-Jaccard verification of candidates (needs the two texts)
    docs_pd = docs.select_columns(["doc_id", "text"]).to_pandas()
    texts_by_id = dict(zip(docs_pd["doc_id"], docs_pd["text"].fillna("")))
    verified = [
        (int(a), int(b))
        for a, b in zip(cand["a"], cand["b"])
        if _jaccard(texts_by_id[a], texts_by_id[b], shingle_k) >= jaccard_threshold
    ]

    label = _union_find_labels(docs_pd["doc_id"].tolist(), verified)

    def _label(batch: pd.DataFrame, _lab=label) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "dup_group": batch["doc_id"].map(lambda d: _lab.get(int(d), int(d))),
            }
        )

    return docs.select_columns(["doc_id"]).map_batches(_label, batch_format="pandas")


def _union_find_labels(ids, pairs) -> dict[int, int]:
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {i: find(int(i)) for i in ids}


# ---------------------------------------------------------------------------
# SimHash

def _simhash64(text: str) -> np.uint64:
    words = _WORD_RE.findall(text.lower())
    if not words:
        return np.uint64(0)
    hs = pd.util.hash_array(np.array(words, dtype=object), categorize=False)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.flatnonzero(v > 0):
        out |= np.uint64(1) << np.uint64(i)
    return out


def simhash_dedup(docs: rd.Dataset, *, max_hamming: int = 3) -> rd.Dataset:
    """SimHash near-dup: 4x16-bit band buckets -> candidates -> Hamming
    verify -> components. Returns (doc_id, simhash, dup_group)."""

    def _sig(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "simhash": batch["text"].fillna("").map(_simhash64).astype("uint64"),
            }
        )

    sigs = docs.map_batches(_sig, batch_format="pandas")
    sigs_pd = sigs.to_pandas()
    sh = sigs_pd["simhash"].to_numpy(dtype=np.uint64)
    ids = sigs_pd["doc_id"].to_numpy()
    cand: set[tuple[int, int]] = set()
    for band in range(4):
        chunk = (sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"id": ids, "c": chunk})
        for _, g in df.groupby("c"):
            gids = sorted(g["id"].tolist())
            cand.update((gids[0], o) for o in gids[1:])
    verified = [
        (a, b)
        for a, b in cand
        if bin(int(sh[ids == a][0]) ^ int(sh[ids == b][0])).count("1") <= max_hamming
    ]
    label = _union_find_labels(ids.tolist(), verified)

    def _label(batch: pd.DataFrame, _lab=label) -> pd.DataFrame:
        batch = batch.copy()
        batch["dup_group"] = batch["doc_id"].map(lambda d: _lab.get(int(d), int(d)))
        return batch

    return sigs.map_batches(_label, batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram Jaccard pairwise (exact verify used standalone)

def ngram_jaccard_pairs(
    docs: rd.Dataset, *, shingle_k: int = 5, threshold: float = 0.5
) -> pd.DataFrame:
    """All-pairs n-gram Jaccard above threshold (brute-force verify path;
    use minhash_lsh_dedup for scale — this is the small-side exact check)."""
    pdf = docs.select_columns(["doc_id", "text"]).to_pandas()
    sets = {
        int(i): set(_shingles(t, shingle_k).tolist())
        for i, t in zip(pdf["doc_id"], pdf["text"].fillna(""))
    }
    ids = sorted(sets)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = inter / len(sets[a] | sets[b])
            if j >= threshold:
                rows.append({"a": a, "b": b, "jaccard": j})
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup

def embedding_dedup(
    emb: rd.Dataset, *, threshold: float = 0.95, n_planes: int = 16, seed: int = 99
) -> rd.Dataset:
    """Near-dup by cosine similarity over an embedding column: sign-LSH
    bucket (random hyperplanes) -> within-bucket exact cosine -> components.
    Returns (vec_id, dup_group)."""
    first = emb.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)

    def _bucket(batch: pd.DataFrame, _p=planes) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float32)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        bits = (m @ _p) > 0
        keys = (bits * (1 << np.arange(_p.shape[1]))).sum(axis=1)
        out = pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(), "bucket": keys})
        out["vec"] = list(m)
        return out

    buckets = emb.map_batches(_bucket, batch_format="pandas")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        m = np.stack(g["vec"].to_numpy())
        sims = m @ m.T
        ids = g["vec_id"].to_numpy()
        ai, bi = np.where(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({"a": ids[ai], "b": ids[bi]})

    cand = (
        buckets.groupby("bucket").map_groups(_pairs, batch_format="pandas").to_pandas()
    )
    if "a" not in cand.columns:
        cand = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    all_ids = emb.select_columns(["vec_id"]).to_pandas()["vec_id"].tolist()
    label = _union_find_labels(all_ids, list(zip(cand["a"].astype(int), cand["b"].astype(int))))

    def _label(batch: pd.DataFrame, _lab=label) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"],
                "dup_group": batch["vec_id"].map(lambda d: _lab.get(int(d), int(d))),
            }
        )

    return emb.select_columns(["vec_id"]).map_batches(_label, batch_format="pandas")
