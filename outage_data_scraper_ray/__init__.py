"""Ray-Data-native crawl + outage-data processing engine.

From-scratch re-expression of the capabilities of
Urban-Research-Group/outage-data-scraper (reference read-only at
/root/reference) as idiomatic Ray Data pipelines:

- ``synth``        deterministic synthetic seed registry + fixture web
                   (replaces the live utility endpoints; no network).
- ``kernels``      pure parse kernels ``bytes -> spans`` for every payload
                   family the reference parses (SURVEY.md section 2.3).
- ``state``        sharded cuckoo-filter URL-seen actors, per-host
                   politeness token buckets, counters.
- ``pipelines``    the crawl loop (frontier -> gate -> fetch -> parse ->
                   interleaved-span docs, checkpoint/resume), the
                   standardize pipeline (app/pipeline/pipeline.py) and the
                   bluefire sessionizers (scripts/bluefire/).
- ``functions``    scale operators: dedup (exact/minhash/simhash/jaccard/
                   embedding), similarity search, text analysis,
                   multimodal stubs, relational query battery.

Nothing here calls ``ray.init``; callers own the Ray session.
"""

__version__ = "0.1.0"
