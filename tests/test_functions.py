"""Scale operators: dedup family, similarity search, text analysis,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from outage_data_scraper_ray.functions.dedup import (
    embedding_dedup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from outage_data_scraper_ray.functions.multimodal import (
    DecodeStage,
    decode_media,
    media_features,
    synth_media,
)
from outage_data_scraper_ray.functions.simsearch import brute_force_knn, ivf_knn
from outage_data_scraper_ray.functions.text import text_features, token_counts


BASE = (
    "The power outage affected the county and the crews worked to restore "
    "service to the affected customers in the region for hours. "
) * 3


def _docs_with_dupes():
    rng = np.random.default_rng(42)
    words = [f"w{j}" for j in range(500)]
    rows = []
    for i in range(20):
        text = " ".join(rng.choice(words, size=60, replace=True))
        rows.append({"doc_id": i, "text": f"doc {i}: " + text})
    # exact duplicate pair
    rows.append({"doc_id": 100, "text": BASE})
    rows.append({"doc_id": 101, "text": BASE})
    # near-duplicate (small edit)
    rows.append({"doc_id": 102, "text": BASE + " extra tail."})
    return pd.DataFrame(rows)


def test_exact_dedup(ray_session):
    out = exact_dedup(rd.from_pandas(_docs_with_dupes())).to_pandas()
    assert 100 in set(out["doc_id"]) and 101 not in set(out["doc_id"])
    assert out.loc[out["doc_id"] == 100, "n_copies"].iloc[0] == 2


def test_minhash_lsh_finds_near_dupes(ray_session):
    out = minhash_lsh_dedup(
        rd.from_pandas(_docs_with_dupes()), jaccard_threshold=0.7
    ).to_pandas()
    lab = dict(zip(out["doc_id"], out["dup_group"]))
    assert lab[100] == lab[101] == lab[102] == 100
    # distinct docs stay singletons
    assert lab[0] == 0 and lab[1] == 1


def test_simhash_dedup(ray_session):
    out = simhash_dedup(rd.from_pandas(_docs_with_dupes()), max_hamming=3).to_pandas()
    lab = dict(zip(out["doc_id"], out["dup_group"]))
    assert lab[100] == lab[101]


def test_ngram_jaccard_pairs(ray_session):
    pairs = ngram_jaccard_pairs(rd.from_pandas(_docs_with_dupes()), threshold=0.7)
    keyset = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (100, 101) in keyset


def test_embedding_dedup(ray_session):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    vecs[21] = vecs[20] + 1e-4  # planted near-dup
    df = pd.DataFrame({"vec_id": range(30), "embedding": list(vecs)})
    out = embedding_dedup(rd.from_pandas(df), threshold=0.99).to_pandas()
    lab = dict(zip(out["vec_id"], out["dup_group"]))
    assert lab[21] == lab[20] == 20


def test_knn_brute_force_and_ivf(ray_session):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(300), "embedding": list(vecs)})
    emb = rd.from_pandas(df)
    q = vecs[:3]
    bf = brute_force_knn(emb, q, k=5)
    # a vector is its own nearest neighbour
    for qi in range(3):
        top = bf[bf["query_idx"] == qi].iloc[0]
        assert top["vec_id"] == qi and top["score"] == pytest.approx(1.0)
    approx = ivf_knn(emb, q, k=5, n_centroids=8, nprobe=4)
    # recall@5 of the probed IVF against brute force should be high
    rec = 0
    for qi in range(3):
        b = set(bf[bf["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        rec += len(a & b) / 5
    assert rec / 3 >= 0.6


def test_text_features_langid(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox and the lazy dog in the yard for a while",
                "der hund und die katze ist nicht in das haus zu sehen",
                "le chat est dans la maison et les chiens pour une heure",
            ],
        }
    )
    out = text_features(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist() == ["en", "de", "fr"]
    assert (out["token_count"] > 5).all()


def test_token_counts(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b  c", ""]})
    out = token_counts(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out["token_count"].tolist() == [3, 0]


def test_media_decode_roundtrip(ray_session):
    media = rd.from_arrow(synth_media(50, 7))
    out = decode_media(media).to_pandas()
    assert (out["width"] == out["width_meta"]).all()
    assert (out["height"] == out["height_meta"]).all()
    assert out["decoded_ok"].all()


def test_media_decode_real_codec_stubbed():
    # the real slot with NO codec still refuses honestly
    with pytest.raises(NotImplementedError):
        DecodeStage(fake=False)


def _ppm_media(n: int, seed: int) -> "pa.Table":
    """Media table whose payloads are real P6 PPM images (pure-python
    codec territory — no synthetic header)."""
    import pyarrow as pa

    from outage_data_scraper_ray.functions.multimodal import PPMCodec

    rng = np.random.default_rng(seed)
    codec = PPMCodec()
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w, h = int(rng.integers(8, 128)), int(rng.integers(8, 128))
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        ids.append(f"p{i:04d}")
        payloads.append(codec.encode(arr))
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, type=pa.binary()),
            "width_meta": pa.array(ws, type=pa.int32()),
            "height_meta": pa.array(hs, type=pa.int32()),
        }
    )


def test_media_decode_real_codec_injected(ray_session):
    """VERDICT r4 #6: the fake=False slot runs green with an injected
    pure-python codec — real decode path, real dims."""
    from outage_data_scraper_ray.functions.multimodal import PPMCodec

    media = rd.from_arrow(_ppm_media(30, 5))
    out = decode_media(media, fake=False, codec=PPMCodec()).to_pandas()
    assert out["decoded_ok"].all()
    assert (out["width"] == out["width_meta"]).all()
    assert (out["height"] == out["height_meta"]).all()


def test_media_resize_real_codec_injected(ray_session):
    """Real resize path: decode -> nearest-neighbor resample -> re-encode;
    the output payload is itself decodable and matches the index-sampled
    pixel grid exactly."""
    from outage_data_scraper_ray.functions.multimodal import (
        PPMCodec,
        resize_media,
    )

    codec = PPMCodec()
    table = _ppm_media(20, 9)
    out = resize_media(
        rd.from_arrow(table), max_side=32, fake=False, codec=codec
    ).to_pandas()
    src = {m: p for m, p in zip(table["media_id"].to_pylist(),
                                table["payload"].to_pylist())}
    assert (out[["width", "height"]].max(axis=1) <= 32).all()
    for _, r in out.iterrows():
        arr = codec.decode(r["payload"])
        assert arr.shape[:2] == (r["height"], r["width"])
        orig = codec.decode(src[r["media_id"]])
        h, w = orig.shape[:2]
        rows = (np.arange(r["height"]) * h // r["height"]).astype(np.intp)
        cols = (np.arange(r["width"]) * w // r["width"]).astype(np.intp)
        assert np.array_equal(arr, orig[rows][:, cols])


def test_ppm_codec_roundtrip():
    from outage_data_scraper_ray.functions.multimodal import PPMCodec

    codec = PPMCodec()
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert np.array_equal(codec.decode(codec.encode(arr)), arr)
    with pytest.raises(ValueError):
        codec.decode(b"JUNKPAYLOAD")


def test_media_features_shape(ray_session):
    out = media_features(rd.from_arrow(synth_media(20, 3))).to_pandas()
    assert len(out) == 20
    assert all(len(f) == 8 for f in out["features"])
    sums = np.array([np.sum(f) for f in out["features"]])
    assert np.allclose(sums, 1.0, atol=1e-3)


def test_near_dedup_no_driver_corpus_materialization(ray_session, monkeypatch):
    """Scale contract: on the forced-distributed path (driver_threshold=0)
    the near-dedup family may bring only PAIR-sized frames to the driver —
    never corpus text, signatures, shingle arrays, or embedding vectors.
    (Under default thresholds the verify steps may pull candidate members'
    shingle rows ('sh') / normalized vectors ('vec'), bounded by 2 rows per
    candidate pair up to _VERIFY_DRIVER_PAIRS_MAX — that fast-path contract
    is asserted separately below.)"""
    heavy = {"text", "sig", "sh", "vec", "embedding", "simhash_full"}
    orig = rd.Dataset.to_pandas

    def guarded(self, *a, **k):
        df = orig(self, *a, **k)
        bad = heavy & set(df.columns)
        assert not bad, f"driver materialized heavy columns: {bad}"
        return df

    monkeypatch.setattr(rd.Dataset, "to_pandas", guarded)
    docs = rd.from_pandas(_docs_with_dupes())
    out = minhash_lsh_dedup(
        docs, jaccard_threshold=0.7, driver_threshold=0
    ).to_pandas()
    lab = dict(zip(out["doc_id"], out["dup_group"]))
    assert lab[100] == lab[101] == lab[102] == 100

    out = simhash_dedup(docs, max_hamming=3).to_pandas()
    lab = dict(zip(out["doc_id"], out["dup_group"]))
    assert lab[100] == lab[101]

    pairs = ngram_jaccard_pairs(docs, threshold=0.7, driver_threshold=0)
    assert (100, 101) in {(a, b) for a, b in zip(pairs["a"], pairs["b"])}

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    vecs[21] = vecs[20] + 1e-4
    df = pd.DataFrame({"vec_id": range(30), "embedding": list(vecs)})
    # driver_threshold=0 forces the distributed cosine verify — no 'vec'
    # pull may reach the driver on the forced path
    out = embedding_dedup(
        rd.from_pandas(df), threshold=0.99, driver_threshold=0
    ).to_pandas()
    lab = dict(zip(out["vec_id"], out["dup_group"]))
    assert lab[21] == lab[20] == 20


def test_verify_fast_path_pull_is_pair_bounded(ray_session, monkeypatch):
    """Under default thresholds the exact-Jaccard verify may pull shingle
    rows to the driver, but never more than 2 rows per candidate pair."""
    pulled = []
    orig = rd.Dataset.to_pandas

    def recording(self, *a, **k):
        df = orig(self, *a, **k)
        if "sh" in df.columns:
            pulled.append(len(df))
        return df

    monkeypatch.setattr(rd.Dataset, "to_pandas", recording)
    docs = rd.from_pandas(_docs_with_dupes())
    out = minhash_lsh_dedup(docs, jaccard_threshold=0.7).to_pandas()
    lab = dict(zip(out["doc_id"], out["dup_group"]))
    assert lab[100] == lab[101] == lab[102] == 100
    assert pulled, "expected the driver verify fast path on a tiny corpus"
    n_pairs = len(_docs_with_dupes()) ** 2  # generous upper bound
    assert all(n <= 2 * n_pairs for n in pulled)


def test_embedding_dedup_recall_vs_bruteforce(ray_session):
    """Planted near-dup pairs at cosine >= 0.95: multi-table sign-LSH must
    recover >= 90% of what brute-force all-pairs cosine finds."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, 32)).astype(np.float32)
    planted = base[:20] + rng.standard_normal((20, 32)).astype(np.float32) * 0.01
    vecs = np.vstack([base, planted])
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": list(vecs)})

    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    ai, bi = np.where(np.triu(sims >= 0.95, k=1))
    want_pairs = {(int(a), int(b)) for a, b in zip(ai, bi)}
    assert len(want_pairs) >= 20

    out = embedding_dedup(rd.from_pandas(df), threshold=0.95).to_pandas()
    lab = dict(zip(out["vec_id"], out["dup_group"]))
    got = sum(1 for a, b in want_pairs if lab[a] == lab[b])
    assert got / len(want_pairs) >= 0.9


def test_embedding_dedup_high_dim_margin(ray_session):
    """ADVICE r4 (medium): at dim=1024 the worst-case f16 unit-dot error
    (~sqrt(dim)*2^-11 ~= 0.016) exceeds the old fixed 0.01 margin, so the
    'sure' f16 accept could admit sub-threshold pairs and the candidate cut
    could drop true pairs. With the dim-scaled margin, borderline pairs on
    BOTH sides of the threshold land in the exact-fp32 verify band and must
    be decided correctly."""
    dim, threshold = 1024, 0.95
    rng = np.random.default_rng(11)

    def _pair(c: float) -> tuple[np.ndarray, np.ndarray]:
        v = rng.standard_normal(dim).astype(np.float32)
        v /= np.linalg.norm(v)
        u = rng.standard_normal(dim).astype(np.float32)
        u -= (u @ v) * v
        u /= np.linalg.norm(u)
        return v, (c * v + np.sqrt(1 - c * c) * u).astype(np.float32)

    vecs, below, above = [], [], []
    for i in range(10):  # exact cosine 0.93 — must NOT merge
        a, b = _pair(0.93)
        below.append((len(vecs), len(vecs) + 1))
        vecs += [a, b]
    for i in range(10):  # exact cosine 0.97 — must merge
        a, b = _pair(0.97)
        above.append((len(vecs), len(vecs) + 1))
        vecs += [a, b]
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": list(vecs)})
    # 8 planes x 8 tables: near-certain bucket collision for 0.97-cosine
    # pairs, so any miss below is a MARGIN bug, not LSH recall variance
    out = embedding_dedup(
        rd.from_pandas(df), threshold=threshold, n_planes=8, n_tables=8
    ).to_pandas()
    lab = dict(zip(out["vec_id"], out["dup_group"]))
    assert all(lab[a] != lab[b] for a, b in below)  # precision
    merged = sum(1 for a, b in above if lab[a] == lab[b])
    assert merged / len(above) >= 0.9  # recall


def test_exact_dedup_distributed_path(ray_session):
    """Force the hash-partitioned keep-min path (broadcast_threshold=0) and
    require identical keepers to the broadcast path."""
    docs = rd.from_pandas(_docs_with_dupes())
    a = exact_dedup(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        exact_dedup(docs, broadcast_threshold=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["n_copies"].tolist() == b["n_copies"].tolist()
    assert set(a.columns) == set(b.columns)


def test_lsh_candidates_distributed_path(ray_session):
    """Force the hash-partitioned candidate branch (driver_threshold=0) and
    require identical clusters / pairs to the driver-combine branch — for
    both pair modes (anchor via minhash_lsh_dedup, all via ngram_jaccard)."""
    docs = rd.from_pandas(_docs_with_dupes())

    a = minhash_lsh_dedup(docs, jaccard_threshold=0.7).to_pandas()
    b = minhash_lsh_dedup(
        docs, jaccard_threshold=0.7, driver_threshold=0
    ).to_pandas()
    assert dict(zip(a["doc_id"], a["dup_group"])) == dict(
        zip(b["doc_id"], b["dup_group"])
    )

    pa_ = ngram_jaccard_pairs(docs, threshold=0.7)
    pb_ = ngram_jaccard_pairs(docs, threshold=0.7, driver_threshold=0)
    key = lambda df: sorted(zip(df["a"].tolist(), df["b"].tolist()))  # noqa: E731
    assert key(pa_) == key(pb_) and len(pa_) > 0


def test_asof_join_distributed_path(ray_session):
    """Force the co-partitioned distributed as-of (right_broadcast_threshold=0)
    and require row-identical output to the broadcast path."""
    from outage_data_scraper_ray.functions.relational import asof_join

    sf = "/root/testdata/sf0.001"
    key = ["event_id"]
    a = asof_join(sf).to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        asof_join(sf, right_broadcast_threshold=0)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_media_resize_and_frame_sample(ray_session):
    from outage_data_scraper_ray.functions.multimodal import (
        decode_media,
        frame_sample,
        resize_media,
        synth_media,
    )

    media = rd.from_arrow(synth_media(60, 42))
    resized = resize_media(media, max_side=64).to_pandas()
    assert (resized[["width", "height"]].max(axis=1) <= 64).all()
    # aspect preserved within integer truncation (resize keeps the original
    # meta columns alongside the new dims)
    big = resized[resized[["width_meta", "height_meta"]].max(axis=1) > 64]
    assert len(big) > 0
    ratio_in = big["width_meta"] / big["height_meta"]
    ratio_out = big["width"] / big["height"]
    assert (np.abs(ratio_in - ratio_out) / ratio_in).max() < 0.2  # relative
    # resized payloads still decode through the same stage
    dec = decode_media(rd.from_pandas(resized[["media_id", "kind", "payload"]])).to_pandas()
    assert dec["decoded_ok"].all()

    frames = frame_sample(media, every=4).to_pandas()
    assert (frames["frame_idx"] % 4 == 0).all()
    assert frames.groupby("media_id").size().min() >= 1
    # every frame is a bounded slice
    assert frames["frame"].map(len).max() <= 256


def test_exact_dedup_string_doc_ids(ray_session):
    """Regression: the crawl's docs carry STRING doc_ids ('d<hash hex>');
    exact_dedup must handle them on both retrieval paths."""
    df = pd.DataFrame(
        {
            "doc_id": [f"d{i:03x}" for i in range(8)] + ["dfff"],
            "text": ["same"] * 3 + [f"uniq{i}" for i in range(5)] + ["same"],
        }
    )
    for thresh in (1_000_000, 0):  # broadcast path and join path
        out = exact_dedup(rd.from_pandas(df), broadcast_threshold=thresh).to_pandas()
        keep = out[out["n_copies"] == 4]
        assert len(keep) == 1 and keep["doc_id"].iloc[0] == "d000"
        assert len(out) == 6  # 1 keeper + 5 uniques


def test_ngram_jaccard_lsh_reports_non_anchor_pairs(ray_session):
    """Regression: pair ENUMERATION must include pairs between non-anchor
    bucket members — (101,102) and not just the anchor pairs (100,10x)."""
    pairs = ngram_jaccard_pairs(rd.from_pandas(_docs_with_dupes()), threshold=0.7)
    keyset = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (100, 101) in keyset and (100, 102) in keyset and (101, 102) in keyset


def test_label_map_exact_for_large_int_ids(ray_session):
    """Regression: labels must not round-trip through float64 (ids >= 2^53
    would silently corrupt)."""
    big = 2**53 + 1
    df = pd.DataFrame(
        {"doc_id": [big, big + 2, 7], "text": [BASE, BASE, "tiny other"]}
    )
    for forced in (
        {},  # broadcast branch
        {"label_broadcast_threshold": 0},  # distributed-join branch
        {"label_broadcast_threshold": 0, "pair_graph_driver_max": 0},  # propagation
    ):
        out = minhash_lsh_dedup(
            rd.from_pandas(df), jaccard_threshold=0.8, **forced
        ).to_pandas()
        lab = dict(zip(out["doc_id"], out["dup_group"]))
        assert set(lab) == {big, big + 2, 7}, forced
        assert lab[big] == lab[big + 2] == big, forced
        assert lab[7] == 7, forced


def test_simhash_pairs_block_mixed_bucket():
    """Regression: a bucket holding SEVERAL duplicate groups must connect all
    of them — the old one-anchor-per-bucket enumeration only connected the
    anchor's own group (57% recall at 500k docs in the forced rehearsal)."""
    from outage_data_scraper_ray.functions.dedup import _simhash_pairs_block

    far = np.uint64(0xFFFF_FFFF_FFFF_0000)  # Hamming 48 from 0 outside chunk 0
    block = pd.DataFrame(
        {
            # one bucket (chunk_key 8): groups {1,2} at hash 0, {5,6} at far
            "chunk_key": [8, 8, 8, 8],
            "doc_id": [1, 2, 5, 6],
            "simhash": np.array([0, 0, far, far], dtype=np.uint64),
        }
    )
    pairs = _simhash_pairs_block(block, _maxh=3)
    keyset = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (1, 2) in keyset
    assert (5, 6) in keyset, "non-anchor group lost in a mixed bucket"
    # the far-apart representatives must NOT pair (Hamming 48 > 3)
    assert (1, 5) not in keyset and (1, 6) not in keyset
    # cross-hash near pair within the bucket still enumerates + verifies
    block2 = pd.DataFrame(
        {
            "chunk_key": [8, 8, 8],
            "doc_id": [1, 2, 3],
            "simhash": np.array([0, 1 << 20, far], dtype=np.uint64),
        }
    )
    pairs2 = _simhash_pairs_block(block2, _maxh=3)
    assert (1, 2) in {(a, b) for a, b in zip(pairs2["a"], pairs2["b"])}


def test_simhash_dedup_matches_bruteforce(ray_session):
    """Hamming <= max_hamming < n_bands pairs ALWAYS share a 16-bit band
    bucket (pigeonhole), so the distributed label set must equal a
    brute-force union-find over the full Hamming<=3 pair graph."""
    from outage_data_scraper_ray.functions.dedup import (
        _simhash64,
        _union_find_labels,
    )

    rng = np.random.default_rng(11)
    texts, ids = [], []
    words = [f"tok{i}" for i in range(400)]
    for g in range(40):
        body = " ".join(rng.choice(words, size=24))
        for r in range(int(rng.integers(1, 4))):  # 1-3 exact copies
            ids.append(g * 10 + r)
            texts.append(body)
    df = pd.DataFrame({"doc_id": ids, "text": texts})

    out = simhash_dedup(rd.from_pandas(df), max_hamming=3).to_pandas()
    got = dict(zip(out["doc_id"], out["dup_group"]))

    sh = {i: _simhash64(t) for i, t in zip(ids, texts)}
    pairs = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = bin(int(sh[ids[x]]) ^ int(sh[ids[y]])).count("1")
            if d <= 3:
                pairs.append((ids[x], ids[y]))
    want = _union_find_labels(sorted(ids), pairs)
    assert got == want


def test_label_apply_gated_branches_equal(ray_session):
    """Forced-branch equivalence: broadcast / distributed-join / propagation
    label application produce identical dup_group columns (VERDICT r3 #1 —
    the label broadcast was the only dedup driver term sized by the dup
    count; the join + propagation branches bound it)."""
    docs = rd.from_pandas(_docs_with_dupes())

    def canon(ds):
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return df[["doc_id", "dup_group"]]

    a = canon(minhash_lsh_dedup(docs, jaccard_threshold=0.7))
    b = canon(minhash_lsh_dedup(docs, jaccard_threshold=0.7,
                                label_broadcast_threshold=0))
    c = canon(minhash_lsh_dedup(docs, jaccard_threshold=0.7,
                                label_broadcast_threshold=0,
                                pair_graph_driver_max=0))
    assert a.equals(b) and a.equals(c)
    assert (a["doc_id"] != a["dup_group"]).sum() >= 2  # dups actually labeled

    sa = canon(simhash_dedup(docs))
    sb = canon(simhash_dedup(docs, label_broadcast_threshold=0))
    sc = canon(simhash_dedup(docs, label_broadcast_threshold=0,
                             pair_graph_driver_max=0))
    assert sa.equals(sb) and sa.equals(sc)

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    vecs[21] = vecs[20] + 1e-4
    emb = rd.from_pandas(pd.DataFrame({"vec_id": range(30), "embedding": list(vecs)}))

    def canonv(ds):
        df = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
        return df[["vec_id", "dup_group"]]

    ea = canonv(embedding_dedup(emb, threshold=0.99))
    eb = canonv(embedding_dedup(emb, threshold=0.99, label_broadcast_threshold=0))
    ec = canonv(embedding_dedup(emb, threshold=0.99, label_broadcast_threshold=0,
                                pair_graph_driver_max=0))
    assert ea.equals(eb) and ea.equals(ec)


def test_label_propagation_chain_component(ray_session):
    """Min-label propagation on a pure chain (worst-case diameter for its
    size): every member must converge to the chain minimum, string ids
    included."""
    from outage_data_scraper_ray.functions.dedup import (
        _apply_labels_join,
        _labels_by_propagation,
    )

    n = 12
    pairs = pd.DataFrame(
        {"a": [f"d{i:03d}" for i in range(n - 1)],
         "b": [f"d{i + 1:03d}" for i in range(n - 1)]}
    )
    labels = _labels_by_propagation(rd.from_pandas(pairs)).to_pandas()
    assert set(labels["__lab"].unique()) == {"d000"}
    assert len(labels) == n - 1  # non-identity rows only

    ids = rd.from_pandas(
        pd.DataFrame({"doc_id": [f"d{i:03d}" for i in range(n)] + ["zzz"]})
    )
    out = _apply_labels_join(
        ids, "doc_id",
        rd.from_pandas(labels.rename(columns={"node": "__lab_id"}))
        if "node" in labels.columns else rd.from_pandas(labels),
    ).to_pandas()
    lab = dict(zip(out["doc_id"], out["dup_group"]))
    assert all(lab[f"d{i:03d}"] == "d000" for i in range(n))
    assert lab["zzz"] == "zzz"  # unlabeled rows coalesce to self


def test_battery_trio_forced_distributed_matches_driver(ray_session):
    """_gated_grouped combine sites: forcing the hash-shuffle branch
    (driver_threshold=0) must reproduce the driver branch bit-exactly."""
    from outage_data_scraper_ray.functions.relational import (
        minidx_dedup,
        outage_metrics,
        window_end_ts,
    )

    sf = "/root/testdata/sf0.001"
    for fn, key in (
        (window_end_ts, ["event_id"]),
        (minidx_dedup, ["event_id"]),
        (outage_metrics, ["user_id"]),
    ):
        a = fn(sf).to_pandas().sort_values(key).reset_index(drop=True)
        b = fn(sf, driver_threshold=0).to_pandas().sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True
        )


def test_hash_join_broadcast_matches_distributed(ray_session):
    from outage_data_scraper_ray.functions.relational import hash_join

    sf = "/root/testdata/sf0.001"
    key = ["o_orderkey"]
    a = hash_join(sf).to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        hash_join(sf, build_broadcast_threshold=0)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a.sort_index(axis=1), b.sort_index(axis=1))


def test_hash_partitioned_chain_composes(ray_session):
    """shuffle.py downstream contract: chaining a SECOND
    hash_partitioned_map_batches (plus unions/map_batches) on a shuffled
    plan works — the pattern the dedup label-propagation loop relies on.
    (A sort-based groupby downstream of the same plan is documented as
    unsupported; see shuffle.py.)"""
    from outage_data_scraper_ray.shuffle import hash_partitioned_map_batches

    df = pd.DataFrame({"k": np.arange(500) % 7, "j": np.arange(500) % 3,
                       "v": np.arange(500)})
    first = hash_partitioned_map_batches(
        rd.from_pandas(df), ["k"],
        lambda b: b.assign(kmax=b.groupby("k")["v"].transform("max")),
    )
    second = hash_partitioned_map_batches(
        first, ["j"],
        lambda b: b.assign(jmin=b.groupby("j")["v"].transform("min")) if len(b) else b,
    )
    out = second.to_pandas()
    assert len(out) == 500
    want_k = df.groupby("k")["v"].max()
    want_j = df.groupby("j")["v"].min()
    assert (out["kmax"].to_numpy() == want_k.loc[out["k"]].to_numpy()).all()
    assert (out["jmin"].to_numpy() == want_j.loc[out["j"]].to_numpy()).all()


def test_grouped_topk_forced_distributed_matches_driver(ray_session):
    from outage_data_scraper_ray.functions.relational import grouped_topk

    sf = "/root/testdata/sf0.001"
    key = ["o_custkey", "o_orderkey"]
    a = grouped_topk(sf).to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        grouped_topk(sf, driver_threshold=0)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a.sort_index(axis=1), b.sort_index(axis=1))
    # every group contributes at most k rows
    assert a.groupby("o_custkey").size().max() <= 3


def test_decontaminate_broadcast_matches_distributed(ray_session):
    """Both decontamination paths — broadcast eval-hash set and the
    forced tagged-union hash-shuffle anti-join — drop exactly the train
    docs whose text appears in eval."""
    from outage_data_scraper_ray.functions.dedup import decontaminate

    texts = [f"document body {i}" for i in range(40)]
    train = pd.DataFrame({"doc_id": range(40), "text": texts})
    # eval contains copies of train texts 3, 7, 11 plus unrelated docs
    eval_df = pd.DataFrame(
        {"doc_id": [100, 101, 102, 103],
         "text": [texts[3], texts[7], texts[11], "unrelated"]}
    )
    want_ids = set(range(40)) - {3, 7, 11}
    a = decontaminate(rd.from_pandas(train), rd.from_pandas(eval_df)).to_pandas()
    b = decontaminate(
        rd.from_pandas(train), rd.from_pandas(eval_df), broadcast_threshold=0
    ).to_pandas()
    assert set(a["doc_id"]) == want_ids
    assert set(b["doc_id"]) == want_ids
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True).sort_index(axis=1),
        b.sort_values("doc_id").reset_index(drop=True).sort_index(axis=1),
    )


def test_phash_dedup_broadcast_matches_distributed(ray_session):
    """Both phash-dedup paths — driver min-merge + broadcast labels, and
    the forced hash-shuffle per-block min — produce identical groups, and
    byte-identical payload copies land in their original's group."""
    import pyarrow as pa

    from outage_data_scraper_ray.functions.multimodal import (
        phash_dedup, synth_media,
    )

    base = synth_media(60, 7)
    dup = base.take([0, 10, 20]).set_column(
        0, "media_id", pa.array(["z000000", "z000010", "z000020"])
    )
    media = pa.concat_tables([base, dup])
    a = phash_dedup(rd.from_arrow(media), media_rows=63).to_pandas()
    b = phash_dedup(
        rd.from_arrow(media), media_rows=63, driver_threshold=0
    ).to_pandas()
    for df in (a, b):
        s = df.set_index("media_id")["dup_group"]
        assert s["z000000"] == s["m000000"] == "m000000"
        assert s["z000010"] == s["m000010"] == "m000010"
        assert s["z000020"] == s["m000020"] == "m000020"
    pd.testing.assert_frame_equal(
        a.sort_values("media_id").reset_index(drop=True).sort_index(axis=1),
        b.sort_values("media_id").reset_index(drop=True).sort_index(axis=1),
    )


def test_cms_upper_bound_property(ray_session, tmp_path):
    """Count-Min invariant: every point lookup is >= the true count
    (counters only ever over-count via collisions), and total mass per
    depth equals the corpus word count exactly (sum-merge loses nothing)."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from outage_data_scraper_ray.functions.relational import (
        cms_counts, cms_lookup,
    )

    rng = np.random.default_rng(23)
    vocab = [f"term{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(500)]
    df = pd.DataFrame({"doc_id": range(500), "text": texts})
    sf = str(tmp_path)
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    f"{sf}/documents.parquet")
    sketch = cms_counts(sf)
    words = pd.Series(" ".join(texts).split(" "))
    true = words.value_counts()
    assert sketch.groupby("depth")["n"].sum().eq(len(words)).all()
    import math

    eps_bound = math.e / 256 * len(words)  # CMS guarantee: over <= e/w * N
    for w, t in true.items():
        est = cms_lookup(sketch, w)
        assert est >= t
        assert est - t <= eps_bound


def test_hll_estimate_accuracy(ray_session, tmp_path):
    """HLL sketch over 10k rows with exactly 1,000 distinct texts: the
    register merge is associative (partials from any batching agree) and
    the estimate lands within 3 standard errors (3 * 1.04/sqrt(64) = 39%)
    of the truth."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from outage_data_scraper_ray.functions.relational import (
        hll_estimate, hll_registers,
    )

    rng = np.random.default_rng(11)
    texts = [f"distinct document body number {i}" for i in range(1000)]
    df = pd.DataFrame(
        {"doc_id": range(10_000),
         "text": [texts[i] for i in rng.integers(0, 1000, 10_000)]}
    )
    sf = str(tmp_path)
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    f"{sf}/documents.parquet")
    regs = hll_registers(sf)
    assert regs["register"].tolist() == list(range(64))
    exact = df["text"].nunique()
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.39


def test_text_ops_degenerate_doc_lengths(ray_session, tmp_path):
    """Edge docs the sf corpora never produce: empty text, single word,
    fewer words than the n-gram/bigram width. repetition_filter must not
    divide by zero (no-bigram docs get frac 0.0 and survive on the
    top-word rule alone), ngram_decontaminate must keep sub-width docs
    with n_grams=0, chunk_documents must emit exactly one empty chunk for
    an empty doc, and token_percentiles stays exact on a 4-row input."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from outage_data_scraper_ray.functions.dedup import ngram_decontaminate
    from outage_data_scraper_ray.functions.relational import (
        chunk_documents, repetition_filter, token_percentiles,
    )

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3],
         "text": ["", "word", "a b c", "x y z w v u t s r q p o"]}
    )
    sf = str(tmp_path)
    _pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    f"{sf}/documents.parquet")

    rep = repetition_filter(sf).to_pandas().set_index("doc_id")
    # docs 0/1 (one word, frac 1.0) and 2 (1/3 > 0.10) are dropped; doc 3
    # (12 distinct words, 1/12) survives with a defined 0.0 bigram frac
    assert set(rep.index) == {3}
    assert rep.loc[3, "dup_bigram_frac"] == 0.0

    surv = (
        ngram_decontaminate(rd.from_pandas(df), rd.from_pandas(df.iloc[:0]))
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert set(surv.index) == {0, 1, 2, 3}
    assert surv["n_grams"].tolist() == [0, 0, 0, 8]

    ch = chunk_documents(sf).to_pandas()
    assert len(ch[ch["doc_id"] == 0]) == 1
    assert ch.loc[ch["doc_id"] == 0, "chunk"].iloc[0] == ""

    pct = token_percentiles(sf)
    # word counts sorted: [1, 1, 3, 12]; rank ceil(p*4/100) = 2, 4, 4
    assert pct.iloc[0].tolist() == [4, 1, 12, 12]


def test_ngram_decontaminate_broadcast_matches_distributed(ray_session):
    """Both paths — broadcast eval-gram set and the forced gram-shuffle
    hit-id collection — drop exactly the train docs sharing ANY word
    5-gram with eval, including an eval doc that only EMBEDS a train
    excerpt (the case exact-hash decontamination misses)."""
    from outage_data_scraper_ray.functions.dedup import ngram_decontaminate

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(30)]
    train = pd.DataFrame({"doc_id": range(30), "text": texts})
    # eval doc 100 embeds a 5-word excerpt of train doc 4 mid-sentence;
    # eval doc 101 is an exact copy of train doc 9; 102 is unrelated
    excerpt = " ".join(texts[4].split(" ")[6:11])
    eval_df = pd.DataFrame(
        {"doc_id": [100, 101, 102],
         "text": [f"intro words here {excerpt} closing words", texts[9],
                  "completely unrelated words only"]}
    )
    want_ids = set(range(30)) - {4, 9}
    a = ngram_decontaminate(
        rd.from_pandas(train), rd.from_pandas(eval_df)
    ).to_pandas()
    b = ngram_decontaminate(
        rd.from_pandas(train), rd.from_pandas(eval_df), broadcast_threshold=0
    ).to_pandas()
    assert set(a["doc_id"]) == want_ids
    assert set(b["doc_id"]) == want_ids
    assert (a["n_grams"] == 16).all()  # 20 words -> 16 five-grams
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True).sort_index(axis=1),
        b.sort_values("doc_id").reset_index(drop=True).sort_index(axis=1),
    )


def test_pack_shards_forced_distributed_matches_driver(ray_session):
    """Distributed prefix-sum path (sort + pinned blocks + two-phase scan)
    must reproduce the driver cumsum bit-exactly, and pack token sums must
    respect the budget rule (a pack's pre-assigned mass < budget)."""
    from outage_data_scraper_ray.functions.relational import pack_shards

    sf = "/root/testdata/sf0.001"
    a = pack_shards(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        pack_shards(sf, driver_threshold=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a.sort_index(axis=1), b.sort_index(axis=1))
    # invariant: packs are contiguous in doc_id order and nonempty
    assert (a["pack_id"].diff().fillna(0) >= 0).all()
    # each doc's pack = floor(tokens-before / budget)
    cum_before = a["token_count"].cumsum().shift(1, fill_value=0)
    assert (a["pack_id"] == cum_before // 2048).all()


def test_stratified_sample_parallelism_independent(ray_session):
    """The sample is a pure function of the data: repartitioning the input
    must not change which doc_ids are sampled (content-keyed hash rank)."""
    from outage_data_scraper_ray.functions.relational import (
        _SAMPLE_A,
        _SAMPLE_B,
        stratified_sample,
    )

    sf = "/root/testdata/sf0.001"
    out = stratified_sample(sf, k=5)
    assert out.groupby("lang").size().max() <= 5
    # ground truth by direct computation
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "lang"])
    h = docs["doc_id"].to_numpy().astype(np.uint64) * _SAMPLE_A + _SAMPLE_B
    want = (
        docs.assign(_h=h)
        .sort_values(["lang", "_h", "doc_id"])
        .groupby("lang", sort=False)
        .head(5)
    )
    assert set(map(tuple, out[["lang", "doc_id"]].to_numpy())) == set(
        map(tuple, want[["lang", "doc_id"]].to_numpy())
    )


def test_sliding_window_covers_tumbling(ray_session):
    """Every 600s sliding window's sum equals the sum of its two 300s
    tumbling halves — the structural invariant of the width=2*step shape."""
    from outage_data_scraper_ray.functions.relational import (
        sliding_window,
        tumbling_window,
    )

    sf = "/root/testdata/sf0.001"
    t = tumbling_window(sf).set_index("window_start")
    s = sliding_window(sf)
    for _, r in s.iterrows():
        w0 = r["window_start"]
        halves = [w0, w0 + pd.Timedelta(seconds=300)]
        want = sum(float(t.loc[h, "sum_value"]) for h in halves if h in t.index)
        assert abs(float(r["sum_value"]) - want) < 1e-9, w0


def test_membership_join_forced_distributed_matches_broadcast(ray_session):
    """semi/anti join: the Bloom-prefilter + tagged-shuffle exact-verify
    path must return exactly the broadcast pc.is_in rows (Bloom false
    positives removed by the verify, no false negatives by construction)."""
    from outage_data_scraper_ray.functions.relational import anti_join, semi_join

    sf = "/root/testdata/sf0.001"

    def _canon(ds):
        return (
            ds.to_pandas()
            .sort_values(["o_orderkey"], kind="mergesort")
            .reset_index(drop=True)
        )

    for fn in (semi_join, anti_join):
        broad = _canon(fn(sf))
        dist = _canon(fn(sf, broadcast_threshold=0))
        pd.testing.assert_frame_equal(broad, dist)
    n_orders = 1500
    semi_n = len(_canon(semi_join(sf)))
    anti_n = len(_canon(anti_join(sf)))
    assert semi_n + anti_n == n_orders and 0 < semi_n < n_orders


def test_mg_summary_merge_keeps_heavy_hitters():
    """Misra-Gries mergeability (Agarwal et al. 2012): under ANY split of
    the stream into blocks, per-block summaries merged with s-counter
    compression retain every item with true freq > N/(s+1)."""
    from outage_data_scraper_ray.functions.relational import _mg_compress

    rng = np.random.default_rng(7)
    s = 40
    for trial in range(5):
        # zipf-ish stream: a few heavy words over a long tail
        words = np.concatenate(
            [np.repeat(f"hot{j}", 400 - 50 * j) for j in range(4)]
            + [rng.choice([f"t{j}" for j in range(3000)], size=4000)]
        )
        rng.shuffle(words)
        n = len(words)
        cuts = np.sort(rng.choice(np.arange(1, n), size=17, replace=False))
        parts = []
        for chunk in np.split(words, cuts):
            vc = pd.Series(chunk).value_counts()
            parts.append(
                _mg_compress(
                    pd.DataFrame({"word": vc.index, "cnt": vc.to_numpy()}), s
                )
            )
        merged = _mg_compress(pd.concat(parts, ignore_index=True), s)
        exact = pd.Series(words).value_counts()
        heavy = set(exact[exact * (s + 1) > n].index)
        assert heavy <= set(merged["word"]), (trial, heavy - set(merged["word"]))


def test_range_join_bucket_boundary_edges(ray_session, tmp_path):
    """Points exactly at an interval's start are matched, at start+W are
    not, and an interval replicated across its two buckets never produces
    a duplicate pair."""
    import duckdb

    from outage_data_scraper_ray.functions.relational import (
        _RANGE_WINDOW_US,
        RANGE_JOIN_SQL,
        range_join,
    )

    W = _RANGE_WINDOW_US
    base = pd.Timestamp("1995-06-01")
    rows = []
    # interval (status F) starting mid-bucket so it spans two buckets
    rows.append((1000, 7, base + pd.Timedelta(microseconds=W // 2), "F"))
    # points (status O) sharing jk=7: at start, inside both halves,
    # at the exclusive end, far away
    for i, off in enumerate([W // 2, W // 2 + 5, W + W // 2 - 1, W + W // 2, 5 * W]):
        rows.append((2000 + i, 107, base + pd.Timedelta(microseconds=off), "O"))
    # same timestamps but a non-matching key
    rows.append((3000, 8, base + pd.Timedelta(microseconds=W // 2), "O"))
    df = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"]
    )
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    df["o_totalprice"] = 1.0
    df.to_parquet(tmp_path / "orders.parquet")
    got = range_join(str(tmp_path))
    assert got["point_key"].tolist() == [2000, 2001, 2002]
    assert (got["interval_key"] == 1000).all()
    assert not got.duplicated().any()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet')"
    )
    want = con.sql(RANGE_JOIN_SQL).df()
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_range_join_forced_distributed_matches_broadcast(ray_session):
    from outage_data_scraper_ray.functions.relational import range_join

    sf = "/root/testdata/sf0.001"
    broad = range_join(sf)
    dist = range_join(sf, interval_broadcast_threshold=0)
    pd.testing.assert_frame_equal(broad, dist)
    assert len(broad) > 0


def test_grouped_percentiles_forced_distributed_matches_driver(ray_session):
    from outage_data_scraper_ray.functions.relational import grouped_percentiles

    sf = "/root/testdata/sf0.001"
    driver = grouped_percentiles(sf)
    dist = grouped_percentiles(sf, driver_threshold=0)
    pd.testing.assert_frame_equal(driver, dist)
    # per-source medians must straddle the global corpus: each p50 <= p90 <= p99
    assert (driver["p50"] <= driver["p90"]).all()
    assert (driver["p90"] <= driver["p99"]).all()


def test_fingerprint_overlap_planted_duplicates(ray_session, tmp_path):
    """An exact duplicate shares all 4 winnowed window hashes; an unrelated
    doc shares none. Both combine paths agree with the DuckDB oracle."""
    import duckdb

    from outage_data_scraper_ray.functions.relational import (
        FINGERPRINT_OVERLAP_SQL,
        fingerprint_overlap,
    )

    rng = np.random.default_rng(3)
    words = [f"tok{j}" for j in range(200)]
    base = " ".join(rng.choice(words, size=50))
    other = " ".join(rng.choice(words, size=50))
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [base, base, other],
            "source": "s", "lang": "en", "n_chars": 0,
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    got = fingerprint_overlap(str(tmp_path))
    dist = fingerprint_overlap(str(tmp_path), driver_threshold=0)
    pd.testing.assert_frame_equal(got, dist)
    dup = got[(got["a"] == 1) & (got["b"] == 2)]
    assert len(dup) == 1 and int(dup["shared"].iloc[0]) == 4
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(FINGERPRINT_OVERLAP_SQL).df()
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )


# ---------------------------------------------------------------------------
# round-5 close-out relational additions


def _frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> None:
    a = a.sort_index(axis=1)
    b = b.sort_index(axis=1)
    cols = list(a.columns)
    a = a.sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def _as_pd(res):
    return res.to_pandas() if isinstance(res, rd.Dataset) else res


def test_left_outer_join_broadcast_matches_distributed(ray_session):
    from outage_data_scraper_ray.functions.relational import left_outer_join

    sf = "/root/testdata/sf0.001"
    a = left_outer_join(sf).to_pandas()
    b = left_outer_join(sf, build_broadcast_threshold=0).to_pandas()
    _frames_equal(a, b)
    # the filtered dimension side must actually produce unmatched rows,
    # and both branches spell them '' (never NaN)
    assert (a["c_name"] == "").any()
    assert a["c_name"].notna().all() and b["c_name"].notna().all()


def test_per_key_sample_forced_distributed_matches_driver(ray_session):
    from outage_data_scraper_ray.functions.relational import per_key_sample

    sf = "/root/testdata/sf0.001"
    a = _as_pd(per_key_sample(sf))
    b = _as_pd(per_key_sample(sf, driver_threshold=0))
    _frames_equal(a, b)
    assert (a.groupby("event_type").size() == 5).all()


def test_cum_window_forced_distributed_matches_driver(ray_session):
    from outage_data_scraper_ray.functions.relational import cum_window

    sf = "/root/testdata/sf0.001"
    a = _as_pd(cum_window(sf))
    b = _as_pd(cum_window(sf, driver_threshold=0))
    _frames_equal(a, b)
    # sequential re-derivation for one user: integer-cents running sum
    ev = pd.read_parquet(f"{sf}/events.parquet")
    uid = int(ev["user_id"].iloc[0])
    mine = (
        a[a["user_id"] == uid]
        .merge(ev[["event_id", "ts", "value"]], on="event_id")
        .sort_values(["ts", "event_id"])
    )
    want = np.round(mine["value"].to_numpy() * 100.0).astype("int64").cumsum()
    assert (mine["cum_cents"].to_numpy() == want).all()
    assert mine["prev_event_id"].iloc[0] == -1
    assert (
        mine["prev_event_id"].to_numpy()[1:] == mine["event_id"].to_numpy()[:-1]
    ).all()


def test_rollup_sum_levels_consistent(ray_session):
    from outage_data_scraper_ray.functions.relational import rollup_sum

    out = rollup_sum("/root/testdata/sf0.001")
    fine = out[(out["l_returnflag"] != "ALL") & (out["l_linestatus"] != "ALL")]
    lvl1 = out[(out["l_returnflag"] != "ALL") & (out["l_linestatus"] == "ALL")]
    total = out[(out["l_returnflag"] == "ALL") & (out["l_linestatus"] == "ALL")]
    assert len(total) == 1
    assert total["sum_qty_c"].iloc[0] == fine["sum_qty_c"].sum()
    got = lvl1.set_index("l_returnflag")["sum_qty_c"]
    want = fine.groupby("l_returnflag")["sum_qty_c"].sum()
    assert got.sort_index().equals(want.sort_index())


def test_approx_quantiles_within_sketch_error(ray_session):
    from outage_data_scraper_ray.functions.relational import approx_quantiles

    sf = "/root/testdata/sf0.001"
    out = approx_quantiles(sf).set_index("p")["approx"]
    ev = pd.read_parquet(f"{sf}/events.parquet")
    cents = np.sort(np.round(ev["value"].to_numpy() * 100.0).astype("int64"))
    cents = cents[cents >= 1]
    n = len(cents)
    for p in (50, 90, 99):
        exact = cents[(p * n + 99) // 100 - 1]
        # 2-significant-digit truncation: approx in (0.9 * exact-ish, exact]
        assert out[p] <= exact
        assert out[p] > exact * 0.88  # truncation plus rank-ties slack
    assert (approx_quantiles(sf)["n"] == n).all()


def test_pagerank_forced_distributed_matches_driver(ray_session):
    from outage_data_scraper_ray.functions.graph import pagerank

    sf = "/root/testdata/sf0.001"
    a = pagerank(sf)
    b = pagerank(sf, driver_threshold=0)
    _frames_equal(a, b)
    # mass sanity: every rank >= the base term, and total mass <= 1
    # (dangling supplier mass is dropped by the documented variant)
    n = len(a)
    assert (a["pr"] >= 0.15 / n - 5e-7).all()  # 6dp rounding slack
    assert 0.15 < a["pr"].sum() <= 1.0 + 1e-6
    # suppliers (offset ids) must out-rank parts on this bipartite graph:
    # every supplier has ~600 in-edges, parts have none
    supp = a[a["node"] >= 1_000_000_000]["pr"]
    part = a[a["node"] < 1_000_000_000]["pr"]
    assert supp.min() > part.max()


def test_connected_components_forced_propagation_matches_driver(ray_session):
    from outage_data_scraper_ray.functions.relational import connected_components

    sf = "/root/testdata/sf0.001"
    a = connected_components(sf).to_pandas()
    b = connected_components(sf, pair_graph_driver_max=0).to_pandas()
    _frames_equal(a, b)
    # component labels are component minima: every label is a member id
    # and <= every member
    assert (a["component"] <= a["vec_id"]).all()
    assert set(a["component"]).issubset(set(a["vec_id"]))


def test_pivot_sum_forced_distributed_matches_driver(ray_session):
    from outage_data_scraper_ray.functions.relational import pivot_sum

    sf = "/root/testdata/sf0.001"
    a = _as_pd(pivot_sum(sf))
    b = _as_pd(pivot_sum(sf, driver_threshold=0))
    _frames_equal(a, b)
    # wide total reconciles with the raw integer-cents total
    ev = pd.read_parquet(f"{sf}/events.parquet")
    total = np.round(ev["value"].to_numpy() * 100.0).astype("int64").sum()
    wide_cols = [c for c in a.columns if c.endswith("_c")]
    assert a[wide_cols].to_numpy().sum() == total
    assert len(a) == ev["user_id"].nunique()


def test_full_outer_join_preserves_both_sides(ray_session):
    from outage_data_scraper_ray.functions.relational import full_outer_join

    sf = "/root/testdata/sf0.001"
    out = full_outer_join(sf).to_pandas()
    # left-only rows (order kept, no qualifying customer) and right-only
    # rows (customer kept, no qualifying order) must both be present
    assert (out["o_orderkey"] == -1).any()
    assert ((out["o_orderkey"] != -1) & (out["c_name"] == "")).any()
    assert out["c_name"].notna().all()
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    assert (out["o_orderkey"] != -1).sum() == int(
        (orders["o_totalprice"] > 300000).sum()
    )


def test_grouped_stats_matches_sequential_moments(ray_session):
    from outage_data_scraper_ray.functions.relational import grouped_stats

    sf = "/root/testdata/sf0.001"
    out = grouped_stats(sf).set_index("event_type")
    ev = pd.read_parquet(f"{sf}/events.parquet")
    c = np.round(ev["value"].to_numpy() * 100.0).astype("int64")
    for t, grp in pd.DataFrame({"t": ev["event_type"], "c": c}).groupby("t"):
        v = grp["c"].to_numpy()
        assert out.loc[t, "n"] == len(v)
        assert out.loc[t, "sum_c"] == v.sum()
        assert out.loc[t, "min_c"] == v.min()
        assert out.loc[t, "max_c"] == v.max()
        n, s, ssq = float(len(v)), float(v.sum()), float((v * v).sum())
        assert out.loc[t, "var_c"] == np.round((n * ssq - s * s) / (n * n), 6)


def test_grouped_hll_consistent_with_global(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        _HLL_M,
        grouped_hll,
        hll_estimate,
        hll_registers,
    )

    sf = "/root/testdata/sf0.001"
    g = grouped_hll(sf)
    glob = hll_registers(sf)
    # per-register max over sources == the global register (merge law)
    m = g.groupby("register")["max_rho"].max()
    assert (m.sort_index().to_numpy() == glob.sort_values("register")["max_rho"].to_numpy()).all()
    # grid shape: every (source, register) cell present
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    assert len(g) == docs["source"].nunique() * _HLL_M
    # per-source estimates land within the 64-register error band
    for src, grp in g.groupby("source"):
        est = hll_estimate(grp.rename(columns={"max_rho": "max_rho"}))
        true = docs.loc[docs["source"] == src, "text"].nunique()
        assert abs(est - true) / max(true, 1) < 0.45


def test_grouped_distinct_exact_vs_pandas(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        grouped_distinct_exact,
    )

    sf = "/root/testdata/sf0.001"
    out = grouped_distinct_exact(sf).set_index("source")["n_distinct"]
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    want = docs.groupby("source")["text"].nunique()
    assert out.sort_index().equals(want.sort_index().astype("int64"))


def test_windowed_distinct_vs_pandas(ray_session):
    from outage_data_scraper_ray.functions.relational import windowed_distinct

    sf = "/root/testdata/sf0.001"
    out = windowed_distinct(sf).set_index("window_start")["n_users"]
    ev = pd.read_parquet(f"{sf}/events.parquet")
    want = ev.groupby(ev["ts"].dt.floor("h"))["user_id"].nunique()
    assert out.sort_index().to_numpy().tolist() == want.sort_index().to_numpy().tolist()


def test_funnel_stages_forced_distributed_and_sequential(ray_session):
    from outage_data_scraper_ray.functions.relational import funnel_stages

    sf = "/root/testdata/sf0.001"
    a = _as_pd(funnel_stages(sf))
    b = _as_pd(funnel_stages(sf, driver_threshold=0))
    _frames_equal(a, b)
    # sequential per-user re-derivation of the ordered-funnel rule
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(["ts", "event_id"])
    got = dict(zip(a["user_id"], a["funnel_stage"]))
    for uid, grp in ev.groupby("user_id"):
        stage, prev = 0, None
        for want_ev in ("view", "click", "purchase"):
            rows = grp[grp["event_type"] == want_ev]
            if prev is not None:
                rows = rows[rows["ts"] > prev]
            if not len(rows):
                break
            stage += 1
            prev = rows["ts"].min()
        assert got[uid] == stage, (uid, got[uid], stage)
    assert set(a["funnel_stage"]) <= {0, 1, 2, 3}
    assert (a["funnel_stage"] >= 1).any()


def test_normalize_text_properties(ray_session):
    from outage_data_scraper_ray.functions.relational import normalize_text

    sf = "/root/testdata/sf0.001"
    out = _as_pd(normalize_text(sf))
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    assert len(out) == len(docs)
    nt = out["norm_text"]
    assert not nt.str.contains("  ", regex=False).any()
    assert (nt == nt.str.strip()).all()
    assert (nt == nt.str.lower()).all()
    assert (out["n_chars_norm"] == nt.str.len()).all()
    # idempotent: normalizing the normalized text is a fixpoint
    import unicodedata

    renorm = nt.map(lambda s: " ".join(unicodedata.normalize("NFC", s).split()))
    assert (renorm == nt).all()


def test_inverted_index_vs_pandas(ray_session):
    from outage_data_scraper_ray.functions.relational import inverted_index

    sf = "/root/testdata/sf0.001"
    a = inverted_index(sf)
    b = inverted_index(sf, driver_threshold=0)  # forced distributed top-k
    pd.testing.assert_frame_equal(
        a.sort_values(["n_docs", "term"], ascending=[False, True]).reset_index(drop=True),
        b.sort_values(["n_docs", "term"], ascending=[False, True]).reset_index(drop=True),
    )
    # postings are ascending, consistent with n_docs, and match a pandas build
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    words = docs["text"].fillna("").str.lower().str.findall(r"\w+")
    e = docs[["doc_id"]].join(words.rename("term")).explode("term").dropna()
    e = e.drop_duplicates()
    want = e.groupby("term")["doc_id"].agg(
        lambda s: ",".join(map(str, sorted(s)))
    )
    for _, row in a.iterrows():
        ids = row["postings"].split(",")
        assert ids == sorted(ids, key=int)
        assert len(ids) == row["n_docs"]
        assert want[row["term"]] == row["postings"]


def test_quality_model_score_bit_exact(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        quality_model_score,
        _QMS_THRESHOLD,
    )

    sf = "/root/testdata/sf0.001"
    out = _as_pd(quality_model_score(sf)).sort_values("doc_id").reset_index(drop=True)
    docs = pd.read_parquet(f"{sf}/documents.parquet").sort_values("doc_id")
    txt = docs["text"].fillna("")
    n = txt.str.len().to_numpy(np.float64)
    a = txt.str.count(r"[a-zA-Z]").to_numpy(np.float64)
    d = txt.str.count(r"[0-9]").to_numpy(np.float64)
    s = txt.str.count(r"\ ").to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        want = 0.5 * np.where(n > 0, a / n, 0.0) + (-0.25) * np.where(
            n > 0, d / n, 0.0
        ) + 0.25 * np.where(n > 0, s / n, 0.0)
    assert (out["score"].to_numpy() == want).all()  # bit-exact, not approx
    assert (out["keep"].to_numpy() == (want >= _QMS_THRESHOLD)).all()
    assert out["keep"].any() and (~out["keep"]).any()  # the filter bites


def test_url_canonicalize_uses_crawl_kernel(ray_session):
    from outage_data_scraper_ray.functions.relational import url_canonicalize
    from outage_data_scraper_ray.synth import canonical_url

    sf = "/root/testdata/sf0.001"
    out = _as_pd(url_canonicalize(sf)).sort_values("doc_id").reset_index(drop=True)
    # vectorized hot-path kernel == scalar reference, per row
    assert (out["canon_url"] == out["url"].map(canonical_url)).all()
    c = out["canon_url"]
    assert c.str.startswith("http://").all()
    assert not c.str.contains("#").any()
    assert not c.str.endswith("/").any()
    host = c.str.split("://").str[1].str.partition("/")[0]
    assert (host == host.str.lower()).all()
    # path case is PRESERVED (canonicalization only touches scheme/host)
    assert c.str.contains("/Page/", regex=False).all()


def test_skewed_join_forced_salted_matches_broadcast(ray_session):
    from outage_data_scraper_ray.functions.relational import skewed_join

    sf = "/root/testdata/sf0.001"
    a = skewed_join(sf)                           # broadcast branch
    b = skewed_join(sf, broadcast_threshold=0)    # forced salted distributed
    pd.testing.assert_frame_equal(a, b)
    c = skewed_join(sf, broadcast_threshold=0, salts=1)  # naive ablation path
    pd.testing.assert_frame_equal(a, c)
    # skew mapping concentrates rows: key cardinality after mapping is small
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_suppkey", "l_quantity"])
    sup = pd.read_parquet(f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    k = li["l_suppkey"].to_numpy()
    jk = np.where(k % 4 != 0, (k % 40) + 1, k)
    want = (
        pd.DataFrame({"jk": jk, "l_quantity": li["l_quantity"].to_numpy(np.int64)})
        .merge(sup, left_on="jk", right_on="s_suppkey")
        .groupby("s_nationkey", as_index=False)
        .agg(n_rows=("jk", "size"), sum_qty=("l_quantity", "sum"))
        .astype({"s_nationkey": "int64", "n_rows": "int64", "sum_qty": "int64"})
        .sort_values("s_nationkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, want)


def test_ntile_buckets_forced_distributed_matches_driver(ray_session):
    from outage_data_scraper_ray.functions.relational import ntile_buckets

    sf = "/root/testdata/sf0.001"
    a = _as_pd(ntile_buckets(sf)).sort_values("o_orderkey").reset_index(drop=True)
    b = (
        _as_pd(ntile_buckets(sf, driver_threshold=0))  # distributed cut-point path
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # NTILE invariants: 1..4 present, sizes differ by at most 1,
    # bucket order respects the (price, key) total order
    sizes = a["bucket"].value_counts()
    assert set(sizes.index) == {1, 2, 3, 4}
    assert sizes.max() - sizes.min() <= 1
    orders = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    m = orders.merge(a, on="o_orderkey").sort_values(
        ["o_totalprice", "o_orderkey"], kind="mergesort"
    )
    assert (np.diff(m["bucket"].to_numpy()) >= 0).all()


def test_ohlc_window_forced_distributed_and_sequential(ray_session):
    from outage_data_scraper_ray.functions.relational import ohlc_window

    sf = "/root/testdata/sf0.001"
    a = ohlc_window(sf)
    b = ohlc_window(sf, driver_threshold=0)  # forced one-hash-shuffle merge
    pd.testing.assert_frame_equal(a, b)
    # sequential re-derivation per window
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    w = ev["ts"].dt.floor("h")
    g = ev.groupby(w)
    assert (a.set_index("window_start")["open"] == g["value"].first()).all()
    assert (a.set_index("window_start")["close"] == g["value"].last()).all()
    assert (a.set_index("window_start")["high"] == g["value"].max()).all()
    assert (a.set_index("window_start")["low"] == g["value"].min()).all()
    assert (a["low"] <= a[["open", "close", "high"]].min(axis=1)).all()


def test_clip_outliers_exact_p99(ray_session):
    from outage_data_scraper_ray.functions.relational import clip_outliers

    sf = "/root/testdata/sf0.001"
    out = _as_pd(clip_outliers(sf)).sort_values("doc_id").reset_index(drop=True)
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    tc = docs["text"].fillna("").str.split(" ").str.len()
    n = len(tc)
    rank = (99 * n + 99) // 100
    cut = int(np.sort(tc.to_numpy())[rank - 1])
    want = docs.loc[tc <= cut, "doc_id"].sort_values()
    assert out["doc_id"].tolist() == want.tolist()
    assert len(out) < n  # the clip provably bites
    assert (out["token_count"] <= cut).all()


def test_table_checksum_order_independent(ray_session):
    import hashlib

    from outage_data_scraper_ray.functions.relational import table_checksum

    sf = "/root/testdata/sf0.001"
    out = table_checksum(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    s = 0
    for did, t in zip(docs["doc_id"], docs["text"].fillna("")):
        s += int.from_bytes(
            hashlib.md5((str(int(did)) + "|" + t).encode("utf8")).digest()[8:16],
            "little",
        )
    assert int(out["checksum"].iloc[0]) == s % (2**63 - 1)
    assert int(out["n_rows"].iloc[0]) == len(docs)


def test_rolling_window_forced_distributed_and_sequential(ray_session):
    from outage_data_scraper_ray.functions.relational import rolling_window

    sf = "/root/testdata/sf0.001"
    a = _as_pd(rolling_window(sf)).sort_values("event_id").reset_index(drop=True)
    b = (
        _as_pd(rolling_window(sf, driver_threshold=0))
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # sequential re-derivation: pandas groupby.rolling
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    ev["cents"] = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
    want = (
        ev.groupby("user_id", sort=False)["cents"]
        .rolling(4, min_periods=1)
        .sum()
        .reset_index(drop=True)
        .astype("int64")
    )
    got = a.set_index("event_id").loc[ev["event_id"], "roll_cents"].reset_index(drop=True)
    assert (got == want).all()


def test_percent_rank_forced_distributed_matches_driver(ray_session):
    from outage_data_scraper_ray.functions.relational import percent_rank

    sf = "/root/testdata/sf0.001"
    a = _as_pd(percent_rank(sf)).sort_values("o_orderkey").reset_index(drop=True)
    b = (
        _as_pd(percent_rank(sf, driver_threshold=0))  # range-partitioned path
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # rank order respects the composite total order; endpoints exact
    orders = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    m = orders.merge(a, on="o_orderkey").sort_values(
        ["o_totalprice", "o_orderkey"], kind="mergesort"
    )
    pr = m["pr"].to_numpy()
    assert (np.diff(pr) > 0).all()
    assert pr[0] == 0.0 and pr[-1] == 1.0


def test_kmeans_clusters_matches_sequential(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        kmeans_clusters,
        _km_quant,
        _km_assign,
        _trunc_div,
        _KM_K,
        _KM_ITERS,
    )

    sf = "/root/testdata/sf0.001"
    out = _as_pd(kmeans_clusters(sf)).sort_values("vec_id").reset_index(drop=True)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    ids, q = _km_quant(emb)
    cents = q[: _KM_K].copy()
    for _ in range(_KM_ITERS):
        a = _km_assign(q, cents)
        for cid in range(_KM_K):
            m = a == cid
            if m.sum():
                cents[cid] = _trunc_div(q[m].sum(axis=0), int(m.sum()))
    want = _km_assign(q, cents)
    assert out["vec_id"].tolist() == ids.tolist()
    assert out["cluster"].tolist() == want.tolist()
    assert out["cluster"].nunique() > 1  # clustering provably partitions


def test_json_extract_props_matches_parser(ray_session):
    import json

    from outage_data_scraper_ray.functions.relational import json_extract_props

    sf = "/root/testdata/sf0.001"
    out = _as_pd(json_extract_props(sf)).sort_values("event_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values("event_id")
    want = ev["props"].map(
        lambda s: json.loads(s).get("k", -1) if isinstance(s, str) and s else -1
    )
    assert out["k"].tolist() == [int(x) for x in want]


def test_q3_revenue_matches_pandas(ray_session):
    from outage_data_scraper_ray.functions.relational import q3_revenue

    sf = "/root/testdata/sf0.001"
    out = q3_revenue(sf)
    forced = q3_revenue(sf, driver_threshold=0)  # distributed-join path
    pd.testing.assert_frame_equal(out, forced)
    cut = pd.Timestamp("1995-03-15")
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    ck = cust.loc[cust["c_nationkey"] < 5, "c_custkey"]
    od = orders[(orders["o_orderdate"] < cut) & orders["o_custkey"].isin(ck)]
    m = li[(li["l_shipdate"] > cut) & li["l_orderkey"].isin(od["o_orderkey"])].copy()
    m["rev"] = (
        np.round(m["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        * (100 - np.round(m["l_discount"].to_numpy() * 100.0).astype(np.int64))
    )
    want = (
        m.groupby("l_orderkey", as_index=False)["rev"].sum()
        .sort_values(["rev", "l_orderkey"], ascending=[False, True], kind="mergesort")
        .head(10)
    )
    assert out["l_orderkey"].tolist() == want["l_orderkey"].tolist()
    assert out["revenue_e4"].tolist() == want["rev"].tolist()
    assert 0 < len(out) <= 10 and len(out) == len(want)


def test_triangle_count_matches_bruteforce(ray_session):
    from itertools import combinations

    from outage_data_scraper_ray.functions.relational import (
        triangle_count,
        _TRI_MOD,
    )

    sf = "/root/testdata/sf0.001"
    out = triangle_count(sf)
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    pk = li["l_partkey"].to_numpy(np.int64) % _TRI_MOD
    sk = li["l_suppkey"].to_numpy(np.int64) % _TRI_MOD
    edges = {(min(a, b), max(a, b)) for a, b in zip(pk, sk) if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if c > b  # each triangle once: a < b < c
    )
    assert int(out["n_edges"].iloc[0]) == len(edges)
    assert int(out["n_triangles"].iloc[0]) == tri
    assert tri > 0


def test_corpus_shuffle_forced_distributed_and_bijective(ray_session):
    from outage_data_scraper_ray.functions.relational import corpus_shuffle

    sf = "/root/testdata/sf0.001"
    a = _as_pd(corpus_shuffle(sf)).sort_values("doc_id").reset_index(drop=True)
    b = (
        _as_pd(corpus_shuffle(sf, driver_threshold=0))  # range-rank path
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    n = len(a)
    # a permutation: every position exactly once, and NOT the identity
    assert sorted(a["shuffle_pos"].tolist()) == list(range(n))
    assert (a["shuffle_pos"].to_numpy() != np.arange(n)).any()


def test_url_dedup_forced_distributed_and_bites(ray_session):
    from outage_data_scraper_ray.functions.relational import url_dedup

    sf = "/root/testdata/sf0.001"
    a = _as_pd(url_dedup(sf)).sort_values("canon").reset_index(drop=True)
    b = (
        _as_pd(url_dedup(sf, driver_threshold=0))
        .sort_values("canon")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    assert a["n_dups"].sum() == len(docs)  # every doc accounted for
    assert (a["n_dups"] > 1).any()  # the dedup provably bites
    # keeper is the min doc_id of its 5-block page group
    assert (a["keeper"] % 5 == 0).all()
    assert len(a) < len(docs)


def test_bm25_topk_matches_sequential(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        bm25_topk,
        _BM25_QUERY,
        _BM25_K1,
        _BM25_B,
    )

    sf = "/root/testdata/sf0.001"
    out = bm25_topk(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet").sort_values("doc_id")
    toks = docs["text"].fillna("").str.split(" ")
    dl = toks.str.len().to_numpy(np.int64).astype(np.float64)
    N = len(docs)
    avgdl = float(dl.sum()) / N
    score = np.zeros(N)
    for t in _BM25_QUERY:
        tf = toks.map(lambda ws, _t=t: ws.count(_t)).to_numpy(np.int64).astype(np.float64)
        dfn = int((tf > 0).sum())
        if dfn == 0:
            continue
        score = score + (N / dfn) * (
            (tf * (_BM25_K1 + 1.0))
            / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * (dl / avgdl)))
        )
    want = (
        pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(np.int64), "score": score})
        .sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert (out["score"].to_numpy() == want["score"].to_numpy()).all()  # bit-exact
    assert (out["score"] > 0).any()  # the query terms actually hit


def _canon_frame(res) -> pd.DataFrame:
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_lag_features_paths_and_values(ray_session):
    from outage_data_scraper_ray.functions.relational import lag_features

    sf = "/root/testdata/sf0.001"
    driver = _canon_frame(lag_features(sf))
    dist = _canon_frame(lag_features(sf, driver_threshold=0))
    pd.testing.assert_frame_equal(driver, dist)  # bit-exact across paths

    # hand re-derivation for one user with >= 2 events
    ev = pd.read_parquet(f"{sf}/events.parquet")
    uid = ev["user_id"].value_counts().idxmax()
    mine = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
    got = (
        driver[driver["user_id"] == uid]
        .set_index("event_id")
        .loc[mine["event_id"].tolist()]
    )
    ts_us = mine["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    want_gap = np.concatenate([[-1], np.diff(ts_us)])
    assert got["prev_gap_us"].tolist() == want_gap.tolist()
    assert got["is_first"].tolist() == [True] + [False] * (len(mine) - 1)
    assert got["next_type"].tolist() == mine["event_type"].tolist()[1:] + [""]


def test_group_concat_ordered(ray_session):
    from outage_data_scraper_ray.functions.relational import group_concat

    sf = "/root/testdata/sf0.001"
    driver = _canon_frame(group_concat(sf))
    dist = _canon_frame(group_concat(sf, driver_threshold=0))
    pd.testing.assert_frame_equal(driver, dist)

    ev = pd.read_parquet(f"{sf}/events.parquet")
    uid = ev["user_id"].value_counts().idxmax()
    mine = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
    row = driver[driver["user_id"] == uid].iloc[0]
    assert row["type_seq"] == ",".join(mine["event_type"])
    assert row["n_events"] == len(mine)


def test_char_entropy_filter_values(ray_session):
    from collections import Counter

    from outage_data_scraper_ray.functions.relational import (
        _ENTROPY_MIN,
        char_entropy_filter,
    )

    sf = "/root/testdata/sf0.001"
    out = char_entropy_filter(sf).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    n_pass = 0
    for _, r in docs.iterrows():
        c = np.array(list(Counter(r["text"]).values()), dtype=np.float64)
        p = c / c.sum()
        ent = float(-(p * np.log2(p)).sum())
        if ent >= _ENTROPY_MIN:
            n_pass += 1
            assert abs(out.loc[r["doc_id"], "entropy"] - ent) < 1e-9
        else:
            assert r["doc_id"] not in out.index
    assert n_pass == len(out)
    assert 0 < len(out) < len(docs)  # the gate actually separates


def test_line_dedup_planted(ray_session):
    from outage_data_scraper_ray.functions.relational import line_dedup
    import outage_data_scraper_ray.functions.relational as R

    shared = " ".join(f"s{i}" for i in range(8))  # exactly one segment
    a_rest = " ".join(f"a{i}" for i in range(8))
    b_rest = " ".join(f"b{i}" for i in range(8))
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                shared + " " + a_rest,     # doc1: keeps both segments
                shared + " " + b_rest,     # doc2: loses the shared segment
                shared,                    # doc3: loses everything -> dropped
            ],
        }
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        driver = _canon_frame(line_dedup(d))
        dist = _canon_frame(line_dedup(d, driver_threshold=0))
    pd.testing.assert_frame_equal(driver, dist)
    got = driver.set_index("doc_id")
    assert got.loc[1, "new_text"] == shared + " " + a_rest
    assert got.loc[1, "n_kept"] == 2
    assert got.loc[2, "new_text"] == b_rest
    assert got.loc[2, "n_kept"] == 1
    assert 3 not in got.index


def test_merge_intervals_planted(ray_session):
    import os
    import tempfile

    from outage_data_scraper_ray.functions.relational import merge_intervals

    base = pd.Timestamp("2024-01-01")
    # user 1: [0,10s], [5s,12s] overlap; [12s,15s] touches -> ONE island;
    # [100s,101s] separate. user 2: single event.
    df = pd.DataFrame(
        {
            "event_id": range(5),
            "user_id": [1, 1, 1, 1, 2],
            "ts": [
                base,
                base + pd.Timedelta(seconds=5),
                base + pd.Timedelta(seconds=12),
                base + pd.Timedelta(seconds=100),
                base,
            ],
            "event_type": ["a"] * 5,
            "value": [0.10, 0.07, 0.03, 0.01, 0.02],  # cents = duration sec
            "props": [""] * 5,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        driver = _canon_frame(merge_intervals(d))
        dist = _canon_frame(merge_intervals(d, driver_threshold=0))
    pd.testing.assert_frame_equal(driver, dist)
    u1 = driver[driver["user_id"] == 1].sort_values("island_start_us")
    assert u1["n_events"].tolist() == [3, 1]
    s0 = int(base.value // 1000)
    assert u1["island_start_us"].tolist() == [s0, s0 + 100_000_000]
    assert u1["island_end_us"].tolist() == [s0 + 15_000_000, s0 + 101_000_000]
    assert len(driver[driver["user_id"] == 2]) == 1


def test_grouped_mode_matches_pandas(ray_session):
    from outage_data_scraper_ray.functions.relational import grouped_mode

    sf = "/root/testdata/sf0.001"
    driver = _canon_frame(grouped_mode(sf))
    dist = _canon_frame(grouped_mode(sf, driver_threshold=0))
    pd.testing.assert_frame_equal(driver, dist)

    ev = pd.read_parquet(f"{sf}/events.parquet")
    want = (
        ev.groupby(["user_id", "event_type"], as_index=False)
        .size()
        .sort_values(
            ["user_id", "size", "event_type"], ascending=[True, False, True]
        )
        .drop_duplicates("user_id")
    )
    got = driver.sort_values("user_id").reset_index(drop=True)
    assert got["mode_type"].tolist() == want["event_type"].tolist()
    assert got["mode_n"].tolist() == want["size"].tolist()


def test_pmi_collocations_rederived(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        _PMI_K,
        _PMI_MIN_COUNT,
        pmi_collocations,
    )

    sf = "/root/testdata/sf0.001"
    out = pmi_collocations(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    uni: dict = {}
    bi: dict = {}
    n_uni = n_bi = 0
    for t in docs["text"].fillna(""):
        ws = t.split(" ")
        n_uni += len(ws)
        n_bi += max(0, len(ws) - 1)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(ws, ws[1:]):
            bi[(x, y)] = bi.get((x, y), 0) + 1
    rows = []
    for (x, y), c in bi.items():
        if c >= _PMI_MIN_COUNT:
            score = c * float(n_uni) / float(n_bi) * float(n_uni) / uni[x] / uni[y]
            rows.append((x, y, c, score))
    want = (
        pd.DataFrame(rows, columns=["w1", "w2", "pair_n", "score"])
        .sort_values(
            ["score", "w1", "w2"], ascending=[False, True, True], kind="mergesort"
        )
        .head(_PMI_K)
        .reset_index(drop=True)
    )
    assert len(out) == len(want) > 0
    assert out["w1"].tolist() == want["w1"].tolist()
    assert out["w2"].tolist() == want["w2"].tolist()
    assert (out["score"].to_numpy() == want["score"].to_numpy()).all()  # bit-exact


def test_levenshtein_matches_duckdb():
    import random
    import string

    import duckdb

    from outage_data_scraper_ray.functions.relational import _levenshtein

    rng = random.Random(7)
    words = ["", "a", "ab", "small ring", "red widget", "levenshtein",
             "levenshtien"]
    words += [
        "".join(rng.choices(string.ascii_lowercase + " ", k=rng.randint(0, 15)))
        for _ in range(20)
    ]
    con = duckdb.connect()
    for a in words:
        for b in words:
            want = con.sql("select levenshtein(?::VARCHAR, ?::VARCHAR)"
                           .replace("?", "$x", 1).replace("?", "$y", 1),
                           params={"x": a, "y": b}).fetchone()[0]
            assert _levenshtein(a, b) == want, (a, b)


def test_fuzzy_join_paths_and_values(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        _FUZZY_MAX_DIST,
        _levenshtein,
        fuzzy_join,
    )

    sf = "/root/testdata/sf0.001"
    driver = _canon_frame(fuzzy_join(sf))
    dist = _canon_frame(fuzzy_join(sf, driver_threshold=0))
    pd.testing.assert_frame_equal(driver, dist)

    part = pd.read_parquet(f"{sf}/part.parquet")
    j = part.merge(part, on=["p_brand", "p_type"], suffixes=("_a", "_b"))
    j = j[j["p_partkey_a"] < j["p_partkey_b"]]
    d = j.apply(lambda r: _levenshtein(r["p_name_a"], r["p_name_b"]), axis=1)
    want = j[d <= _FUZZY_MAX_DIST]
    assert len(driver) == len(want) > 0
    wk = set(zip(want["p_partkey_a"], want["p_partkey_b"]))
    assert set(zip(driver["part_a"], driver["part_b"])) == wk


def test_batch1_r5b_forced_distributed_matches_driver(ray_session):
    """snapshot_diff / ngram_lm_score gated combine sites: the forced
    hash-shuffle branch must reproduce the driver branch bit-exactly."""
    from outage_data_scraper_ray.functions.relational import (
        ngram_lm_score,
        snapshot_diff,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    for fn, key in ((snapshot_diff, ["doc_id"]), (ngram_lm_score, ["doc_id"])):
        a = _pd(fn(sf)).sort_values(key).reset_index(drop=True)
        b = _pd(fn(sf, driver_threshold=0)).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True
        )


def test_histogram_bins_block_split_invariant(ray_session):
    """Equi-width histogram: pure-integer binning must be identical at any
    parallelism; partials only ever carry bin-grain rows."""
    import ray.data as rd
    from outage_data_scraper_ray.functions.relational import histogram_bins

    sf = "/root/testdata/sf0.001"
    out = histogram_bins(sf)
    assert out["n"].sum() == 6000  # sf0.001 lineitem row count
    assert (out["bin"] >= 0).all() and (out["bin"] < 20).all()
    # bins partition the rows exactly once
    assert out["bin"].is_unique


def test_zscore_normalize_moments(ray_session):
    """Global z-scores: mean ~0, sd ~1 over the emitted column (sanity on
    the broadcast-moments arithmetic)."""
    from outage_data_scraper_ray.functions.relational import zscore_normalize

    sf = "/root/testdata/sf0.001"
    z = zscore_normalize(sf).to_pandas()["z"].to_numpy()
    assert abs(z.mean()) < 1e-9
    assert abs(z.std() - 1.0) < 1e-6


def test_batch2_r5b_forced_distributed_matches_driver(ray_session):
    """priority_dedup / decayed_sum gated combine sites: forced hash-shuffle
    branch must reproduce the driver branch bit-exactly (decayed_sum's
    dyadic weights make even the doubles order-independent)."""
    from outage_data_scraper_ray.functions.relational import (
        decayed_sum,
        priority_dedup,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    for fn, key in ((priority_dedup, ["doc_id"]), (decayed_sum, ["event_id"])):
        a = _pd(fn(sf)).sort_values(key).reset_index(drop=True)
        b = _pd(fn(sf, driver_threshold=0)).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True
        )


def test_keyword_tag_hand_check(ray_session):
    """Tags come back in fixed keyword order and match a per-doc set
    re-derivation."""
    import re as _re

    from outage_data_scraper_ray.functions.relational import (
        _TAG_KEYWORDS,
        keyword_tag,
    )

    sf = "/root/testdata/sf0.001"
    got = keyword_tag(sf).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rx = _re.compile(r"\w+")
    for _, row in docs.head(50).iterrows():
        ws = set(rx.findall((row["text"] or "").lower()))
        want = [k for k in _TAG_KEYWORDS if k in ws]
        if not want:
            assert row["doc_id"] not in got.index
        else:
            assert got.loc[row["doc_id"], "tags"] == ",".join(want)
            assert got.loc[row["doc_id"], "n_tags"] == len(want)


def test_decayed_sum_hand_check(ray_session):
    """First two events of one user: decayed = x1 + 0.5*x0 exactly."""
    from outage_data_scraper_ray.functions.relational import decayed_sum

    sf = "/root/testdata/sf0.001"
    got = decayed_sum(sf)
    got = (got if isinstance(got, pd.DataFrame) else got.to_pandas()).set_index(
        "event_id"
    )["decayed"]
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ev["x_c"] = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
    u = ev[ev["user_id"] == ev["user_id"].iloc[0]].sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    assert got[u["event_id"].iloc[0]] == float(u["x_c"].iloc[0])
    assert got[u["event_id"].iloc[1]] == float(u["x_c"].iloc[1]) + 0.5 * float(
        u["x_c"].iloc[0]
    )


def test_grouped_corr_matches_pandas(ray_session):
    """corr per flag within 1e-9 of pandas' own Pearson on the same integer
    units (different formula arrangement, same math)."""
    from outage_data_scraper_ray.functions.relational import grouped_corr

    sf = "/root/testdata/sf0.001"
    got = grouped_corr(sf).set_index("flag")["corr"]
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    li["x"] = np.round(li["l_quantity"] * 100).astype("int64") // 100
    li["y"] = np.round(li["l_extendedprice"] * 100).astype("int64") // 100
    for flag, grp in li.groupby("l_returnflag"):
        assert abs(got[flag] - grp["x"].corr(grp["y"])) < 1e-9


def test_gapfill_days_forced_distributed_and_values(ray_session):
    """gapfill: forced hash-shuffle branch bit-exact vs driver; every user's
    day range is dense with zero-filled gaps and counts re-derive."""
    from outage_data_scraper_ray.functions.relational import gapfill_days

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    a = _pd(gapfill_days(sf)).sort_values(["user_id", "day"]).reset_index(drop=True)
    b = _pd(gapfill_days(sf, driver_threshold=0)).sort_values(
        ["user_id", "day"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    want = ev.groupby(["user_id", "day"]).size()
    for uid, grp in a.groupby("user_id"):
        days = grp["day"].to_numpy()
        assert (np.diff(days) == 1).all()  # dense
        for _, r in grp.iterrows():
            assert r["n_events"] == want.get((uid, r["day"]), 0)
        if len(grp) > 300:
            break


def test_embedding_quantize_bounds_roundtrip(ray_session):
    """Quantized levels are in [0,255], per-dim max hits 255 and min hits 0,
    and dequantizing recovers each value within one level width."""
    from outage_data_scraper_ray.functions.relational import embedding_quantize

    sf = "/root/testdata/sf0.001"
    q = embedding_quantize(sf).to_pandas()
    assert q["q"].between(0, 255).all()
    per_dim = q.groupby("dim")["q"].agg(["min", "max"])
    assert (per_dim["min"] == 0).all()
    assert (per_dim["max"] == 255).all()
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mn, mx = m.min(axis=0), m.max(axis=0)
    width = (mx - mn) / 255.0
    deq = mn[q["dim"]] + (q["q"].to_numpy() + 0.5) * width[q["dim"]]
    orig = m[emb["vec_id"].to_numpy().argsort()][q["vec_id"], q["dim"]]
    assert np.abs(deq - orig).max() <= width.max() * 0.5 + 1e-12


def test_cube_sum_sets(ray_session):
    """CUBE emits all four grouping sets and each coarser set sums the
    finest grain exactly."""
    from outage_data_scraper_ray.functions.relational import cube_sum

    out = cube_sum("/root/testdata/sf0.001")
    fine = out[(out["l_returnflag"] != "ALL") & (out["l_linestatus"] != "ALL")]
    tot = out[(out["l_returnflag"] == "ALL") & (out["l_linestatus"] == "ALL")]
    assert len(tot) == 1
    assert tot["sum_qty_c"].iloc[0] == fine["sum_qty_c"].sum()
    by_flag = out[(out["l_returnflag"] != "ALL") & (out["l_linestatus"] == "ALL")]
    assert (
        by_flag.set_index("l_returnflag")["sum_qty_c"]
        == fine.groupby("l_returnflag")["sum_qty_c"].sum()
    ).all()


def test_batch4_r5b_forced_distributed_matches_driver(ray_session):
    """event_sessions / brand_cooccurrence / cumulative_users gated sites:
    forced hash-shuffle branch bit-exact vs driver branch."""
    from outage_data_scraper_ray.functions.relational import (
        brand_cooccurrence,
        cumulative_users,
        event_sessions,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    for fn, key in (
        (event_sessions, ["user_id", "session_start_us"]),
        (brand_cooccurrence, ["brand_a", "brand_b"]),
        (cumulative_users, ["day"]),
    ):
        a = _pd(fn(sf)).sort_values(key).reset_index(drop=True)
        b = _pd(fn(sf, driver_threshold=0)).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True
        )


def test_event_sessions_gap_semantics(ray_session):
    """Within a session consecutive gaps are <= 30 min; across consecutive
    sessions of one user the gap is > 30 min; event counts conserve."""
    from outage_data_scraper_ray.functions.relational import event_sessions

    sf = "/root/testdata/sf0.001"
    out = event_sessions(sf)
    out = (out if isinstance(out, pd.DataFrame) else out.to_pandas()).sort_values(
        ["user_id", "session_start_us"]
    )
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    assert out["n_events"].sum() == len(ev)
    gap = 30 * 60 * 1_000_000
    for uid, grp in out.groupby("user_id"):
        s = grp["session_start_us"].to_numpy()
        e = grp["session_end_us"].to_numpy()
        assert (e >= s).all()
        if len(grp) > 1:
            assert (s[1:] - e[:-1] > gap).all()


def test_train_test_split_fractions(ray_session):
    """Deterministic assignment, same on re-run, roughly 80/10/10."""
    from outage_data_scraper_ray.functions.relational import train_test_split

    sf = "/root/testdata/sf0.001"
    a = train_test_split(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = train_test_split(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    frac = a["split"].value_counts(normalize=True)
    assert 0.6 < frac["train"] < 0.95
    assert set(frac.index) <= {"train", "val", "test"}


def test_batch5_r5b_forced_distributed_matches_driver(ray_session):
    """tokenize_ids / degree_histogram / user_entropy gated sites: forced
    hash-shuffle branch bit-exact vs driver branch."""
    from outage_data_scraper_ray.functions.relational import (
        degree_histogram,
        tokenize_ids,
        user_entropy,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    for fn, key in (
        (tokenize_ids, ["doc_id"]),
        (degree_histogram, ["degree"]),
        (user_entropy, ["user_id"]),
    ):
        a = _pd(fn(sf)).sort_values(key).reset_index(drop=True)
        b = _pd(fn(sf, driver_threshold=0)).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True
        )


def test_span_mask_semantics(ray_session):
    """Masked input has <X> exactly at pos%7==3; target re-derives; token
    counts conserve."""
    import re as _re

    from outage_data_scraper_ray.functions.relational import span_mask

    sf = "/root/testdata/sf0.001"
    got = span_mask(sf).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rx = _re.compile(r"\w+")
    for _, row in docs.head(30).iterrows():
        toks = rx.findall((row["text"] or "").lower())
        if not toks:
            assert row["doc_id"] not in got.index
            continue
        r = got.loc[row["doc_id"]]
        inp = r["masked_input"].split(" ")
        assert len(inp) == len(toks)
        # "<X>" cannot be a \w+ token, so sentinel positions identify masks
        want_mask = [i % 7 == 3 for i in range(len(toks))]
        assert [w == "<X>" for w in inp] == want_mask
        assert r["n_masked"] == sum(want_mask)
        assert r["target"] == " ".join(
            t for i, t in enumerate(toks) if i % 7 == 3
        )


def test_user_entropy_rederived(ray_session):
    """Entropy matches a scipy-free re-derivation per user."""
    from outage_data_scraper_ray.functions.relational import user_entropy

    sf = "/root/testdata/sf0.001"
    got = user_entropy(sf)
    got = (got if isinstance(got, pd.DataFrame) else got.to_pandas()).set_index(
        "user_id"
    )
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "event_type"])
    for uid, grp in list(ev.groupby("user_id"))[:25]:
        c = grp["event_type"].value_counts().to_numpy().astype(float)
        n = c.sum()
        want = np.log(n) - (c * np.log(c)).sum() / n
        assert abs(got.loc[uid, "entropy"] - want) < 1e-9
        assert got.loc[uid, "n"] == int(n)


def test_batch6_r5b_forced_distributed_matches_driver(ray_session):
    """profile_columns / cohort_retention gated sites: forced hash-shuffle
    branch bit-exact vs driver branch."""
    from outage_data_scraper_ray.functions.relational import (
        cohort_retention,
        profile_columns,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    for fn, key in (
        (profile_columns, ["col"]),
        (cohort_retention, ["cohort_day", "offset"]),
    ):
        a = _pd(fn(sf)).sort_values(key).reset_index(drop=True)
        b = _pd(fn(sf, driver_threshold=0)).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True
        )


def test_mixture_report_shares_sum_to_one(ray_session):
    from outage_data_scraper_ray.functions.relational import mixture_report

    out = mixture_report("/root/testdata/sf0.001")
    assert abs(out["token_share"].sum() - 1.0) < 1e-9
    assert (out["n_docs"] > 0).all()


def test_chi_square_matches_scipy_free_rederivation(ray_session):
    from outage_data_scraper_ray.functions.relational import chi_square

    sf = "/root/testdata/sf0.001"
    got = chi_square(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "source"])
    ct = pd.crosstab(docs["lang"], docs["source"])
    o = ct.to_numpy().astype(float)
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / o.sum()
    want = ((o - e) ** 2 / e)[o > 0].sum()  # engine sums observed cells only
    assert abs(got["chi2"].iloc[0] - want) < 1e-6
    assert got["n_cells"].iloc[0] == int((o > 0).sum())


def test_cohort_retention_offset_zero_is_one(ray_session):
    from outage_data_scraper_ray.functions.relational import cohort_retention

    out = cohort_retention("/root/testdata/sf0.001")
    z = out[out["offset"] == 0]
    assert (z["retention"] == 1.0).all()
    assert (out["retention"] <= 1.0).all() and (out["retention"] > 0).all()


def test_batch7_r5b_forced_distributed_matches_driver(ray_session):
    """max_concurrency / q5_nation_revenue / ooo_events: forced distributed
    branches (hash shuffle / Dataset.join chain) bit-exact vs driver."""
    from outage_data_scraper_ray.functions.relational import (
        max_concurrency,
        ooo_events,
        q5_nation_revenue,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    for fn, key in (
        (max_concurrency, ["day"]),
        (q5_nation_revenue, ["n_name"]),
        (ooo_events, ["user_id"]),
    ):
        a = _pd(fn(sf)).sort_values(key).reset_index(drop=True)
        b = _pd(fn(sf, driver_threshold=0)).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True
        )


def test_max_concurrency_brute_force(ray_session):
    """Sweep result equals an O(n^2)-ish brute force on the raw intervals."""
    from outage_data_scraper_ray.functions.relational import max_concurrency

    sf = "/root/testdata/sf0.001"
    got = max_concurrency(sf).set_index("day")["max_concurrent"]
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts", "value"])
    s = ev["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    e = s + np.round(ev["value"].to_numpy() * 100).astype(np.int64) * 1_000_000
    t = np.concatenate([s, e])
    d = np.concatenate([np.ones(len(s), int), -np.ones(len(s), int)])
    order = np.lexsort((d, t))
    conc = np.cumsum(d[order])
    day = t[order] // 86_400_000_000
    want = pd.DataFrame({"day": day, "conc": conc}).groupby("day")["conc"].max()
    pd.testing.assert_series_equal(
        got.sort_index(), want.sort_index(), check_names=False
    )


def test_ooo_events_planted(ray_session):
    """A hand-built series with known inversions reports the exact late
    count through the block kernel."""
    from outage_data_scraper_ray.functions.relational import _ooo_block

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "event_id": [1, 2, 3, 4, 1, 2],
            # user1: 10, 5 (late), 20, 15 (late); user2: 7, 7 (not late)
            "ts_us": [10, 5, 20, 15, 7, 7],
        }
    )
    out = _ooo_block(df).set_index("user_id")
    assert out.loc[1, "n_late"] == 2 and out.loc[1, "n_events"] == 4
    assert out.loc[2, "n_late"] == 0 and out.loc[2, "n_events"] == 2


def test_sorted_neighborhood_forced_distributed(ray_session):
    """Distributed path (global sort + local pairs + edge stitching) must
    equal the driver path exactly — including pairs that CROSS sorted-block
    boundaries (the override forces many small blocks)."""
    from outage_data_scraper_ray.functions.relational import sorted_neighborhood

    sf = "/root/testdata/sf0.001"
    a = sorted_neighborhood(sf)
    b = sorted_neighborhood(sf, driver_threshold=0)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert len(a) > 0


def test_sorted_neighborhood_matches_bruteforce(ray_session):
    from outage_data_scraper_ray.functions.relational import sorted_neighborhood

    sf = "/root/testdata/sf0.001"
    got = sorted_neighborhood(sf)
    part = pd.read_parquet(f"{sf}/part.parquet", columns=["p_partkey", "p_name"])
    part = part.sort_values(["p_name", "p_partkey"]).reset_index(drop=True)
    want = []
    for w in (1, 2):
        for i in range(len(part) - w):
            if part["p_name"].iloc[i][:6] == part["p_name"].iloc[i + w][:6]:
                want.append(
                    (part["p_partkey"].iloc[i], part["p_partkey"].iloc[i + w], w)
                )
    want_df = pd.DataFrame(
        want, columns=["part_a", "part_b", "rank_dist"]
    ).sort_values(["part_a", "part_b", "rank_dist"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want_df.astype("int64"), check_exact=True
    )


def test_batch8_r5b_forced_distributed_matches_driver(ray_session):
    """cdc_merge / window_pair_join / merge_join gated sites: forced
    hash-shuffle branch bit-exact vs driver branch."""
    from outage_data_scraper_ray.functions.relational import (
        cdc_merge,
        merge_join,
        window_pair_join,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    for fn, key in (
        (cdc_merge, ["user_id"]),
        (window_pair_join, ["type_a", "type_b"]),
        (merge_join, ["o_orderkey"]),
    ):
        a = _pd(fn(sf)).sort_values(key).reset_index(drop=True)
        b = _pd(fn(sf, driver_threshold=0)).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True
        )


def test_cdc_merge_semantics(ray_session):
    """Planted changelog: last op wins in (ts, id) order; trailing delete
    removes the key."""
    from outage_data_scraper_ray.functions.relational import _cdc_pick_block

    log = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts_us": [10, 20, 30, 10, 20, 10],
            "event_id": [1, 2, 3, 4, 5, 6],
            "value_c": [100, 200, 300, 400, 500, 600],
            # user1 ends on upsert(300); user2 ends on delete; user3 upsert
            "op": [0, 1, 0, 0, 1, 0],
        }
    )
    out = _cdc_pick_block(log).set_index("user_id")
    assert list(out.index) == [1, 3]
    assert out.loc[1, "value_c"] == 300
    assert out.loc[3, "value_c"] == 600


def test_window_pair_join_planted(ray_session):
    """Hand-built series: only same-user pairs within 300 s with different
    types count, unordered."""
    from outage_data_scraper_ray.functions.relational import _window_join_block

    us = 1_000_000
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_id": [1, 2, 3, 4, 5],
            "ts_us": [0, 100 * us, 500 * us, 0, 400 * us],
            "event_type": ["a", "b", "a", "a", "b"],
        }
    )
    out = _window_join_block(df).set_index(["type_a", "type_b"])
    # user1: (a@0, b@100) within; (b@100, a@500) outside (400s); (a@0,a@500) same type+outside
    # user2: (a@0, b@400) outside
    assert out.loc[("a", "b"), "n"] == 1
    assert len(out) == 1


def test_batch9_r5b_forced_distributed_matches_driver(ray_session):
    """stratified_split / mad_outliers gated sites: forced hash-shuffle
    branch bit-exact vs driver branch."""
    from outage_data_scraper_ray.functions.relational import (
        mad_outliers,
        stratified_split,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    for fn, key in ((stratified_split, ["doc_id"]), (mad_outliers, ["event_type"])):
        a = _pd(fn(sf)).sort_values(key).reset_index(drop=True)
        b = _pd(fn(sf, driver_threshold=0)).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True
        )


def test_stratified_split_exact_fractions(ray_session):
    """Each source gets exactly floor(0.8n)/floor(0.9n)-floor(0.8n)/rest."""
    from outage_data_scraper_ray.functions.relational import stratified_split

    sf = "/root/testdata/sf0.001"
    out = stratified_split(sf)
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "source"])
    j = out.merge(docs, on="doc_id")
    for src, grp in j.groupby("source"):
        n = len(grp)
        vc = grp["split"].value_counts()
        assert vc.get("train", 0) == n * 80 // 100
        assert vc.get("val", 0) == n * 90 // 100 - n * 80 // 100
        assert vc.get("test", 0) == n - n * 90 // 100


def test_mad_outliers_rederived(ray_session):
    """Median / MAD / outlier counts re-derive from raw values with the
    same ceil-rank convention."""
    from outage_data_scraper_ray.functions.relational import mad_outliers

    sf = "/root/testdata/sf0.001"
    got = mad_outliers(sf)
    got = (got if isinstance(got, pd.DataFrame) else got.to_pandas()).set_index(
        "event_type"
    )
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "value"])
    ev["x"] = np.round(ev["value"] * 100).astype("int64")
    for et, grp in ev.groupby("event_type"):
        v = np.sort(grp["x"].to_numpy())
        n = len(v)
        med = int(v[(50 * n + 99) // 100 - 1])
        ad = np.sort(np.abs(grp["x"].to_numpy() - med))
        mad = int(ad[(50 * n + 99) // 100 - 1])
        assert got.loc[et, "med_c"] == med
        assert got.loc[et, "mad_c"] == mad
        assert got.loc[et, "n_outliers"] == int(
            (np.abs(grp["x"].to_numpy() - med) > 5 * mad).sum()
        )


def test_batch10_r5b_forced_distributed_matches_driver(ray_session):
    """daily_percentiles / attribution gated sites: forced hash-shuffle
    branch bit-exact vs driver branch."""
    from outage_data_scraper_ray.functions.relational import (
        attribution,
        daily_percentiles,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    for fn, key in ((daily_percentiles, ["day"]), (attribution, ["user_id"])):
        a = _pd(fn(sf)).sort_values(key).reset_index(drop=True)
        b = _pd(fn(sf, driver_threshold=0)).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True
        )


def test_attribution_rederived(ray_session):
    from outage_data_scraper_ray.functions.relational import attribution

    sf = "/root/testdata/sf0.001"
    got = attribution(sf)
    got = (got if isinstance(got, pd.DataFrame) else got.to_pandas()).set_index(
        "user_id"
    )
    ev = pd.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).sort_values(["user_id", "ts", "event_id"])
    for uid, grp in list(ev.groupby("user_id"))[:25]:
        assert got.loc[uid, "first_type"] == grp["event_type"].iloc[0]
        assert got.loc[uid, "last_type"] == grp["event_type"].iloc[-1]
        assert got.loc[uid, "n"] == len(grp)


def test_referential_report_planted(ray_session):
    """Synthetic data has full integrity both directions at sf0.001."""
    from outage_data_scraper_ray.functions.relational import referential_report

    out = referential_report("/root/testdata/sf0.001")
    assert out["n_orphan_lineitems"].iloc[0] == 0
    assert out["n_orders"].iloc[0] > 0 and out["n_lineitems"].iloc[0] > 0


def test_referential_report_forced_distributed(ray_session):
    """Tagged-union shuffle path equals the broadcast path exactly."""
    from outage_data_scraper_ray.functions.relational import referential_report

    sf = "/root/testdata/sf0.001"
    a = referential_report(sf)
    b = referential_report(sf, driver_threshold=0)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_batch11_r5b_forced_distributed_matches_driver(ray_session):
    """dsir_scores / dedup_rate_report gated sites: forced branch equality."""
    from outage_data_scraper_ray.functions.relational import (
        dedup_rate_report,
        dsir_scores,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    for fn, key in ((dsir_scores, ["doc_id"]), (dedup_rate_report, ["n_docs"])):
        a = _pd(fn(sf)).sort_values(key).reset_index(drop=True)
        b = _pd(fn(sf, driver_threshold=0)).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.sort_index(axis=1), b.sort_index(axis=1), check_exact=True,
            atol=0, rtol=0,
        )


def test_dsir_scores_direction(ray_session):
    """English docs should on average score higher under the en-target LM
    than non-English docs (the whole point of DSIR)."""
    from outage_data_scraper_ray.functions.relational import dsir_scores

    sf = "/root/testdata/sf0.001"
    got = dsir_scores(sf)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "lang"])
    j = got.merge(docs, on="doc_id")
    en = j.loc[j["lang"] == "en", "dsir"].mean()
    rest = j.loc[j["lang"] != "en", "dsir"].mean()
    assert en > rest


def test_skyline_parts_dominance(ray_session):
    """No kept point is strictly dominated; every dropped point is
    dominated by some kept point (spot check) — and the two-level
    local-then-global kernel equals a single global pass."""
    from outage_data_scraper_ray.functions.relational import (
        _skyline_kernel,
        skyline_parts,
    )

    sf = "/root/testdata/sf0.001"
    got = skyline_parts(sf)
    part = pd.read_parquet(
        f"{sf}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    )
    b = pd.DataFrame(
        {
            "p_partkey": part["p_partkey"].astype("int64"),
            "x": part["p_size"].astype("int64"),
            "y": np.round(part["p_retailprice"] * 100).astype("int64"),
        }
    )
    want = _skyline_kernel(b).sort_values("p_partkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    kept = got[["x", "y"]].to_numpy()
    for x, y in kept[:50]:
        dom = (b["x"] > x) & (b["y"] > y)
        assert not dom.any()


def test_twap_forced_and_hand_check(ray_session):
    from outage_data_scraper_ray.functions.relational import _twap_block, twap

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    a = _pd(twap(sf)).sort_values("user_id").reset_index(drop=True)
    b = _pd(twap(sf, driver_threshold=0)).sort_values("user_id").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    # hand check: value 100 for 10s then 200 for 30s -> twap 175
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "event_id": [1, 2, 3],
            "ts_us": [0, 10_000_000, 40_000_000],
            "x_c": [100, 200, 999],
        }
    )
    out = _twap_block(df).set_index("user_id")
    assert out.loc[1, "total_s"] == 40
    assert out.loc[1, "twap_c"] == (100 * 10 + 200 * 30) / 40


def test_autocorr_lag1_paths_and_pandas(ray_session):
    from outage_data_scraper_ray.functions.relational import autocorr_lag1

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    a = _pd(autocorr_lag1(sf)).sort_values("user_id").reset_index(drop=True)
    b = _pd(autocorr_lag1(sf, driver_threshold=0)).sort_values(
        "user_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).sort_values(["user_id", "ts", "event_id"])
    ev["x"] = np.round(ev["value"] * 100).astype("int64")
    g = a.set_index("user_id")
    for uid, grp in list(ev.groupby("user_id"))[:20]:
        x = grp["x"].to_numpy()
        if len(x) < 3:
            continue
        want = np.corrcoef(x[:-1], x[1:])[0, 1]
        assert abs(g.loc[uid, "acf1"] - want) < 1e-9


def test_global_sample_k_deterministic(ray_session):
    from outage_data_scraper_ray.functions.relational import global_sample_k

    sf = "/root/testdata/sf0.001"
    a = global_sample_k(sf)
    b = global_sample_k(sf)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 100
    assert a["doc_id"].is_unique


def test_markov_transitions_rows_sum(ray_session):
    """Each row of the transition matrix sums to 1; paths bit-exact."""
    from outage_data_scraper_ray.functions.relational import markov_transitions

    sf = "/root/testdata/sf0.001"
    a = markov_transitions(sf)
    b = markov_transitions(sf, driver_threshold=0)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    rs = a.groupby("type_a")["p"].sum()
    assert np.allclose(rs.to_numpy(), 1.0, atol=1e-12)


def test_label_centroids_rederived(ray_session):
    from outage_data_scraper_ray.functions.relational import label_centroids

    sf = "/root/testdata/sf0.001"
    got = label_centroids(sf)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    s = np.round(m * 1e6).astype(np.int64)
    for lab in sorted(emb["label"].unique())[:3]:
        mask = (emb["label"] == lab).to_numpy()
        want = s[mask].sum(axis=0).astype(np.float64) / mask.sum() / 1e6
        g = got[got["label"] == lab].sort_values("dim")["centroid"].to_numpy()
        assert np.array_equal(g, want)


def test_label_silhouette_bounds(ray_session):
    """Silhouette values live in [-1, 1]; per-label means match a numpy
    re-derivation."""
    from outage_data_scraper_ray.functions.relational import label_silhouette

    sf = "/root/testdata/sf0.001"
    got = label_silhouette(sf).set_index("label")
    assert got["mean_sil"].between(-1, 1).all()
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labs = emb["label"].to_numpy()
    uniq = np.sort(np.unique(labs))
    s = np.round(m * 1e6).astype(np.int64)
    C = np.stack(
        [s[labs == l].sum(axis=0).astype(np.float64) / (labs == l).sum() / 1e6
         for l in uniq]
    )
    dist = np.sqrt(((m[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
    li = np.searchsorted(uniq, labs)
    a = dist[np.arange(len(m)), li]
    masked = dist.copy()
    masked[np.arange(len(m)), li] = np.inf
    b = masked.min(axis=1)
    sil = (b - a) / np.maximum(a, b)
    for i, l in enumerate(uniq[:4]):
        want = sil[labs == l].mean()
        assert abs(got.loc[l, "mean_sil"] - want) < 1e-9


def test_attribution_interleaved_partials_regression(ray_session):
    """Combine must pick last-touch by LAST-event coords: partials from
    batches whose time ranges interleave (real with out-of-order data)
    previously selected the wrong last event."""
    from outage_data_scraper_ray.functions.relational import _attribution_block

    partials = pd.DataFrame(
        {
            # batch A partial: first ts=1, last ts=100
            # batch B partial: first=last=ts=50 (late-arriving event)
            "user_id": [1, 1],
            "ts_us": [1, 50],
            "event_id": [1, 3],
            "first_type": ["A_first", "B_only"],
            "last_ts_us": [100, 50],
            "last_event_id": [2, 3],
            "last_type": ["A_last", "B_only"],
            "n": [2, 1],
        }
    )
    out = _attribution_block(partials).set_index("user_id")
    assert out.loc[1, "first_type"] == "A_first"
    assert out.loc[1, "last_type"] == "A_last"  # ts=100 beats ts=50
    assert out.loc[1, "n"] == 3


def test_span_mask_unsorted_batch_regression(ray_session):
    """n_masked must align with masked_input when batch rows are NOT in
    doc_id order (previous kernel zipped a sorted count vector against
    appearance-ordered strings)."""
    from outage_data_scraper_ray.functions.relational import _span_mask_batch

    df = pd.DataFrame(
        {
            "doc_id": [5, 2],
            "text": ["a b c d e f g h i j", "x y z"],
        }
    )
    out = _span_mask_batch(df).set_index("doc_id")
    # doc 5 has 10 tokens -> pos 3 masked (1); doc 2 has 3 tokens -> none
    assert out.loc[5, "n_masked"] == 1
    assert out.loc[2, "n_masked"] == 0
    assert out.loc[5, "masked_input"].split(" ")[3] == "<X>"
    assert out.loc[5, "target"] == "d"
    assert out.loc[2, "target"] == ""


def test_knuth_hash_sql_full_range(ray_session):
    """The HUGEINT oracle hash must agree with the numpy uint64 hash out to
    the 32-bit residue boundary (the old BIGINT SQL overflowed there)."""
    import duckdb

    from outage_data_scraper_ray.functions.relational import _knuth_hash_u32

    ids = np.array(
        [0, 1, 2654435761, 3470000000, 4294967295, 4294967296,
         10_000_000_000, 2**62], dtype=np.int64
    )
    want = _knuth_hash_u32(ids)
    con = duckdb.connect()
    got = con.execute(
        "SELECT CAST((CAST(i % 4294967296 AS HUGEINT) * 2654435761)"
        " % 4294967296 AS BIGINT) FROM (SELECT unnest(?) AS i)",
        [ids.tolist()],
    ).df().iloc[:, 0].to_numpy(np.uint64)
    assert np.array_equal(got, want)


def test_max_drawdown_hand_and_paths(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        _drawdown_block,
        max_drawdown,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    a = _pd(max_drawdown(sf)).sort_values("user_id").reset_index(drop=True)
    b = _pd(max_drawdown(sf, driver_threshold=0)).sort_values(
        "user_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    # hand: 100 -> 150 -> 120 -> 90 -> 140: peak 150, trough 90 -> dd 60
    df = pd.DataFrame(
        {
            "user_id": [1] * 5 + [2] * 2,
            "event_id": range(7),
            "ts_us": range(7),
            # user 2 is monotone rising: dd 0 (also guards segment bleed)
            "x_c": [100, 150, 120, 90, 140, 10, 20],
        }
    )
    out = _drawdown_block(df).set_index("user_id")
    assert out.loc[1, "max_drawdown_c"] == 60
    assert out.loc[2, "max_drawdown_c"] == 0


def test_longest_streak_hand_and_paths(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        _streak_block,
        longest_streak,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    a = _pd(longest_streak(sf)).sort_values("user_id").reset_index(drop=True)
    b = _pd(longest_streak(sf, driver_threshold=0)).sort_values(
        "user_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    # days 1,2,3, 7,8 -> longest 3; duplicate day rows must not inflate
    df = pd.DataFrame(
        {"user_id": [1] * 6, "day": [1, 2, 3, 7, 8, 8]}
    )
    out = _streak_block(df).set_index("user_id")
    assert out.loc[1, "streak_days"] == 3


def test_weighted_median_hand_and_paths(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        _wmedian_block,
        weighted_median,
    )

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    a = _pd(weighted_median(sf)).sort_values("flag").reset_index(drop=True)
    b = _pd(weighted_median(sf, driver_threshold=0)).sort_values(
        "flag"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    # hand: values 10(w=1), 20(w=2), 30(w=1): W=4, target 2 -> med 20
    df = pd.DataFrame(
        {"flag": ["x"] * 3, "v": [10, 20, 30], "w": [1, 2, 1]}
    )
    out = _wmedian_block(df).set_index("flag")
    assert out.loc["x", "wmedian"] == 20
    assert out.loc["x", "total_w"] == 4


def test_time_to_convert_hand_and_paths(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        _ttc_block,
        time_to_convert,
    )

    sf = "/root/testdata/sf0.001"
    a = time_to_convert(sf)
    b = time_to_convert(sf, driver_threshold=0)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    hr = 3_600_000_000
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_id": [1, 2, 3, 4, 5],
            "ts_us": [0, 2 * hr, 3 * hr, 0, 1 * hr],
            # user1: view@0 -> purchase@2h (bucket 2); view@3h no purchase
            # user2: view@0 -> NO purchase of their own (user1's must not leak)
            "event_type": ["view", "purchase", "view", "view", "click"],
        }
    )
    out = _ttc_block(df)
    assert out.set_index("hour")["n"].to_dict() == {2: 1}


def test_basket_lift_forced_and_rederived(ray_session):
    from outage_data_scraper_ray.functions.relational import basket_lift

    sf = "/root/testdata/sf0.001"
    a = basket_lift(sf)
    b = basket_lift(sf, driver_threshold=0)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    # re-derive one pair's lift from raw tables
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    part = pd.read_parquet(f"{sf}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    d = li.merge(part, left_on="l_partkey", right_on="p_partkey")[
        ["l_orderkey", "p_brand"]
    ].drop_duplicates()
    n_orders = li["l_orderkey"].nunique()
    row = a.iloc[0]
    na = (d["p_brand"] == row["brand_a"]).sum()
    nb = (d["p_brand"] == row["brand_b"]).sum()
    m = d.merge(d, on="l_orderkey")
    nab = (
        (m["p_brand_x"] == row["brand_a"]) & (m["p_brand_y"] == row["brand_b"])
    ).sum()
    want = nab * float(n_orders) / na / nb
    assert abs(row["lift"] - want) < 1e-9
    assert row["n_pairs"] == nab


def test_activity_profile_conserves(ray_session):
    from outage_data_scraper_ray.functions.relational import activity_profile

    sf = "/root/testdata/sf0.001"
    out = activity_profile(sf)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts"])
    assert out["n"].sum() == len(ev)
    assert out["dow"].between(0, 6).all()
    assert out["hour"].between(0, 23).all()


def test_rfm_cells_forced_and_totals(ray_session):
    from outage_data_scraper_ray.functions.relational import rfm_cells

    sf = "/root/testdata/sf0.001"
    a = rfm_cells(sf)
    b = rfm_cells(sf, driver_threshold=0)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "event_type"])
    n_buyers = ev.loc[ev["event_type"] == "purchase", "user_id"].nunique()
    assert a["n_users"].sum() == n_buyers
    assert a[["r", "f", "m"]].min().min() >= 1
    assert a[["r", "f", "m"]].max().max() <= 5


def test_new_vs_returning_conserves(ray_session):
    from outage_data_scraper_ray.functions.relational import new_vs_returning

    sf = "/root/testdata/sf0.001"
    a = new_vs_returning(sf)
    b = new_vs_returning(sf, driver_threshold=0)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    n_user_days = len(ev[["user_id", "day"]].drop_duplicates())
    assert (a["n_new"] + a["n_returning"]).sum() == n_user_days
    assert a["n_new"].sum() == ev["user_id"].nunique()


def test_session_duration_pctl_paths(ray_session):
    from outage_data_scraper_ray.functions.relational import (
        session_duration_pctl,
    )

    sf = "/root/testdata/sf0.001"
    a = session_duration_pctl(sf)
    b = session_duration_pctl(sf, driver_threshold=0)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert a["p95_min"].iloc[0] >= a["p50_min"].iloc[0] >= 0
    assert a["n_sessions"].iloc[0] > 0


def test_anomalous_days_zscores(ray_session):
    from outage_data_scraper_ray.functions.relational import anomalous_days

    out = anomalous_days("/root/testdata/sf0.001")
    assert (np.abs(out["z"]) > 2.0).all()


def test_pareto_users_hand_and_paths(ray_session):
    from outage_data_scraper_ray.functions.relational import pareto_users

    sf = "/root/testdata/sf0.001"
    a = pareto_users(sf)
    b = pareto_users(sf, driver_threshold=0)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    u = ev.groupby("user_id").size().sort_values(ascending=False)
    target = (len(ev) * 80 + 99) // 100
    want = int(np.searchsorted(u.cumsum().to_numpy(), target)) + 1
    assert a["n_users_80"].iloc[0] == want
    assert a["total_users"].iloc[0] == len(u)


def test_normalized_dedup_collapses_replicas(ray_session):
    from outage_data_scraper_ray.functions.relational import normalized_dedup

    sf = "/root/testdata/sf0.001"

    def _pd(res):
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    a = _pd(normalized_dedup(sf)).sort_values("doc_id").reset_index(drop=True)
    b = _pd(normalized_dedup(sf, driver_threshold=0)).sort_values(
        "doc_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    # every planted replica (doc_id%4==0) collapses onto the base id
    planted = (docs["doc_id"] % 4 == 0).sum()
    assert (a["n_copies"] >= 2).sum() >= planted
    assert not a["doc_id"].ge(2_000_000).any()  # replicas never win keep-min


def test_grouped_skew_matches_scipy_free(ray_session):
    from outage_data_scraper_ray.functions.relational import grouped_skew

    sf = "/root/testdata/sf0.001"
    got = grouped_skew(sf).set_index("event_type")
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "value"])
    ev["x"] = np.round(ev["value"] * 100).astype("int64") // 100
    for et, grp in ev.groupby("event_type"):
        x = grp["x"].to_numpy().astype(float)
        m = x.mean()
        want = ((x - m) ** 3).mean() / (x.std() ** 3)
        assert abs(got.loc[et, "skew"] - want) < 1e-9
