"""Driver contract for the Ray-Data-native crawl/outage engine.

``entry()``   — flagship pipeline on /root/testdata/sf0.001: builds
                interleaved span docs from the documents table, runs the
                text-feature actor stage and exact dedup, returns the
                analyzed span table.
``queries()`` — one callable per implemented operator family from
                SURVEY.md section 2 plus the scale operators (dedup /
                similarity / text / multimodal / crawl / sessionize).
``oracle_sql()`` — DuckDB equivalents for every SQL-expressible query
                (column names match exactly; 25 value-oracles, all strictly
                bit-exact at sf0.01). Non-SQL-expressible entries (stateful
                crawl, sessionization, LSH sketches, stubs) are
                intentionally absent -> the driver records rows-only checks.

Ray is initialised by the driver before import; nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

SF001 = "/root/testdata/sf0.001"


def _docs_as_span_table(sf_dir: str):
    """Reshape the driver documents table into the interleaved-span doc
    shape of BASELINE.json input_hint (one text span per sentence, a media
    span per 'img:' marker-free doc boundary)."""
    import ray.data as rd

    from outage_data_scraper_ray.schemas import SPAN_STRUCT

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))

    def _to_spans(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        all_spans = []
        for did, text in zip(ids, texts):
            parts = [p.strip() for p in (text or "").split(".") if p.strip()]
            spans = [
                {"kind": "text", "text": p, "media_ref": "", "offset": i}
                for i, p in enumerate(parts)
            ]
            spans.append(
                {
                    "kind": "media_tile",
                    "text": "",
                    "media_ref": f"https://tiles.synthgrid.example/{did}.png",
                    "offset": len(spans),
                }
            )
            all_spans.append(spans)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "spans": pa.array(all_spans, type=pa.list_(SPAN_STRUCT)),
            }
        )

    return docs.map_batches(_to_spans, batch_format="pyarrow")


def entry() -> Any:
    """Flagship: documents -> interleaved span docs -> explode -> per-kind
    counts joined with text features, on sf0.001."""
    import ray.data as rd

    from outage_data_scraper_ray.functions.text import text_features

    span_docs = _docs_as_span_table(SF001)

    def _explode(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "kind": [], "n_spans": [], "n_media": []}
        for did, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            rows["doc_id"].append(did)
            rows["kind"].append("doc")
            rows["n_spans"].append(len(spans))
            rows["n_media"].append(sum(1 for s in spans if s["media_ref"]))
        return pa.table(rows)

    counts = span_docs.map_batches(_explode, batch_format="pyarrow")
    feats = text_features(
        rd.read_parquet(os.path.join(SF001, "documents.parquet"))
    ).select_columns(["doc_id", "token_count", "lang_pred", "quality_score"])
    # distributed hash join (no driver-side merge — the flagship sets the
    # pattern for every downstream join)
    joined = counts.join(
        feats, join_type="inner", num_partitions=4, on=("doc_id",)
    ).select_columns(
        ["doc_id", "kind", "n_spans", "n_media",
         "token_count", "lang_pred", "quality_score"]
    )
    return joined.to_pandas().sort_values("doc_id").reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from outage_data_scraper_ray.functions.relational import SQL_QUERIES

    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in SQL_QUERIES.items()
    }

    # ---- non-SQL-expressible operators (rows-only driver check) ----
    def crawl_docs(sf_dir: str):
        import shutil

        from outage_data_scraper_ray.pipelines.crawl import CrawlConfig, CrawlJob

        workdir = "/tmp/odsr_gate_crawl"
        shutil.rmtree(workdir, ignore_errors=True)
        job = CrawlJob(
            CrawlConfig(
                n_seeds=24, workdir=workdir, max_epochs=8,
                politeness_rate=16.0, politeness_burst=16.0, failure_rate=0.02,
            )
        )
        job.run()
        docs = job.docs_dataset().to_pandas()
        docs["n_spans"] = docs["spans"].map(len)
        return docs[["doc_id", "url", "layout", "epoch", "status", "n_spans"]]

    def sessionize_threshold(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.pipelines.sessionize import sessionize
        from outage_data_scraper_ray.synth import synth_pous

        return sessionize(
            rd.from_pandas(synth_pous(10, 40, 42)), method="threshold",
            threshold=0.1, abs_diff=0.0,
        )

    def sessionize_ganz(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.pipelines.sessionize import sessionize
        from outage_data_scraper_ray.synth import synth_pous

        return sessionize(
            rd.from_pandas(synth_pous(10, 40, 42)), method="ganz", threshold=0.0005
        )

    def standardize_16col(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.pipelines.standardize import (
            standardize_ga1tx8,
            synth_accumulated,
            synth_zip_county_map,
        )

        acc = synth_accumulated(40, 5, 42)
        return standardize_ga1tx8(
            rd.from_pandas(acc), utility_provider="Washington EMC", state="ga",
            zip_county=synth_zip_county_map(sorted(acc["zip"].unique())),
        )

    def minhash_dedup(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.functions.dedup import minhash_lsh_dedup

        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return minhash_lsh_dedup(docs, jaccard_threshold=0.8)

    def simhash_dedup_q(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.functions.dedup import simhash_dedup

        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        out = simhash_dedup(docs).to_pandas()
        out["simhash"] = out["simhash"].astype("uint64").astype(str)
        return out

    def embedding_dedup_q(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.functions.dedup import embedding_dedup

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        return embedding_dedup(emb, threshold=0.95)

    def ngram_jaccard_q(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.functions.dedup import ngram_jaccard_pairs

        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return ngram_jaccard_pairs(docs, threshold=0.5)

    def ivf_knn_q(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.functions.simsearch import ivf_knn

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        queries_m = np.stack([r["embedding"] for r in emb.take(2)])
        return ivf_knn(emb, queries_m, k=5)

    # lang_id moved to relational.SQL_QUERIES — it now carries a full DuckDB
    # value-oracle (stopword-argmax CASE + rounded quality_score).

    def fingerprints_q(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.functions.text import fingerprints

        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return fingerprints(docs)

    def media_decode(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.functions.multimodal import decode_media, synth_media

        media = rd.from_arrow(synth_media(200, 42))
        return decode_media(media)

    def media_features_q(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.functions.multimodal import media_features, synth_media

        media = rd.from_arrow(synth_media(200, 42))
        return media_features(media)

    def media_resize(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.functions.multimodal import resize_media, synth_media

        return resize_media(rd.from_arrow(synth_media(200, 42)), max_side=64).drop_columns(
            ["payload"]
        )

    def media_frames(sf_dir: str):
        import ray.data as rd

        from outage_data_scraper_ray.functions.multimodal import frame_sample, synth_media

        out = frame_sample(rd.from_arrow(synth_media(200, 42)), every=4).to_pandas()
        out["frame_len"] = out["frame"].map(len)
        return out[["media_id", "frame_idx", "frame_len"]]

    def span_explode(sf_dir: str):
        from outage_data_scraper_ray.pipelines.accumulate import explode_spans

        return explode_spans(_docs_as_span_table(sf_dir)).select_columns(
            ["doc_id", "kind", "text", "media_ref", "offset"]
        )

    def crawl_level_table(sf_dir: str):
        import shutil

        from outage_data_scraper_ray.pipelines.accumulate import (
            explode_spans,
            level_table,
        )
        from outage_data_scraper_ray.pipelines.crawl import CrawlConfig, CrawlJob

        workdir = "/tmp/odsr_gate_level"
        shutil.rmtree(workdir, ignore_errors=True)
        job = CrawlJob(
            CrawlConfig(n_seeds=90, workdir=workdir, max_epochs=6,
                        politeness_rate=16.0, politeness_burst=16.0, failure_rate=0.0)
        )
        job.run()
        return level_table(explode_spans(job.docs_dataset()), "nisc", "per_outage")

    def flagship_outage_e2e(sf_dir: str):
        from outage_data_scraper_ray.pipelines.poll import flagship_outage_pipeline

        return flagship_outage_pipeline("/tmp/odsr_gate_flagship", n_seeds=90, rounds=3)

    out.update(
        {
            "flagship_outage_e2e": flagship_outage_e2e,
            "span_explode": span_explode,
            "crawl_level_table": crawl_level_table,
            "crawl_docs": crawl_docs,
            "sessionize_threshold": sessionize_threshold,
            "sessionize_ganz": sessionize_ganz,
            "standardize_16col": standardize_16col,
            "minhash_dedup": minhash_dedup,
            "simhash_dedup": simhash_dedup_q,
            "embedding_dedup": embedding_dedup_q,
            "ngram_jaccard": ngram_jaccard_q,
            "ivf_knn": ivf_knn_q,
            "fingerprints": fingerprints_q,
            "media_decode": media_decode,
            "media_features": media_features_q,
            "media_resize": media_resize,
            "media_frames": media_frames,
        }
    )
    return out


# span_explode over _docs_as_span_table is deterministic from documents.text
# (sentence split on '.', one trailing media_tile span per doc), so it gets a
# full DuckDB value-oracle instead of the rows-only check.
SPAN_EXPLODE_SQL = """
WITH parts AS (
    SELECT doc_id,
           list_filter(list_transform(string_split(COALESCE(text, ''), '.'),
                                      s -> trim(s)), s -> s <> '') AS ps
    FROM documents
)
SELECT doc_id, 'text' AS kind, unnest(ps) AS text, '' AS media_ref,
       CAST(generate_subscripts(ps, 1) - 1 AS INTEGER) AS "offset"
FROM parts
UNION ALL
SELECT doc_id, 'media_tile', '',
       'https://tiles.synthgrid.example/' || doc_id || '.png',
       CAST(len(ps) AS INTEGER)
FROM parts
"""


def oracle_sql() -> dict[str, str]:
    from outage_data_scraper_ray.functions.relational import SQL_QUERIES

    out = {name: sql for name, (_fn, sql) in SQL_QUERIES.items()}
    out["span_explode"] = SPAN_EXPLODE_SQL
    return out
