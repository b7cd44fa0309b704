"""Arrow schemas for every logical table in the engine.

Derived from the reference's data model (SURVEY.md section 1, FIXTURES.md):
- seeds / frontier: the crawl registry (reference: events/<state>/layout_<id>.json,
  consumed at app/main.py:14-21).
- docs: interleaved text+media span documents — the authoritative input_hint
  shape from BASELINE.json.
- standardized: the 16-column unified outage schema
  (reference app/pipeline/pipeline.py:64-68).
- pous: bluefire sessionization input (scripts/bluefire/step1_threshold.py:17-21).
- failures: app/main.py:19.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SEEDS = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("emc", pa.string()),
        ("state", pa.string()),
        ("layout", pa.string()),  # payload-family name, e.g. "nisc", "kubra"
        ("seed_index", pa.int32()),
        ("utility_tier", pa.int32()),
        ("refresh_deadline", pa.timestamp("ms")),
    ]
)

# frontier = seeds + lineage/priority columns; children discovered mid-crawl
# (S9/S10 semantics, ga_scraper.py:405-435) get depth > 0.
FRONTIER = pa.schema(
    list(SEEDS)
    + [
        ("depth", pa.int32()),
        ("parent_doc_id", pa.string()),
        ("crawl_key", pa.int64()),  # deterministic global priority/order key
        ("canonical_hash", pa.uint64()),
    ]
)

DOCS = pa.schema(
    [
        ("doc_id", pa.string()),
        # the URL's canonical 64-bit hash carried through from the frontier:
        # the commit pass routes seen-marks straight off this uint64 column
        # (doc_id == f"d{canonical_hash:016x}" — no per-row hex re-parse)
        ("canonical_hash", pa.uint64()),
        ("url", pa.string()),
        ("emc", pa.string()),
        ("state", pa.string()),
        ("layout", pa.string()),
        ("crawl_key", pa.int64()),
        ("utility_tier", pa.int32()),
        ("refresh_deadline", pa.timestamp("ms")),
        ("status", pa.int32()),
        ("reason", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("n_spans", pa.int32()),  # len(spans): lets counters/commit passes
        # prune the heavy spans column at the read
        ("child_urls", pa.list_(pa.string())),
        ("epoch", pa.int32()),
    ]
)

FAILURES = pa.schema(
    [
        ("state", pa.string()),
        ("layout", pa.string()),
        ("emc", pa.string()),
        ("reason", pa.string()),
        ("timestamp", pa.string()),
    ]
)

STANDARDIZED_COLUMNS = [
    "utility_provider",
    "state",
    "county",
    "zipcode",
    "outage_id",
    "start_time",
    "end_time",
    "lat",
    "lng",
    "duration",
    "duration_max",
    "duration_mean",
    "customer_affected_mean",
    "total_customer_outage_time",
    "total_customer_outage_time_max",
    "total_customer_outage_time_mean",
]

POUS = pa.schema(
    [
        ("UtilityName", pa.string()),
        ("StateName", pa.string()),
        ("CountyName", pa.string()),
        ("CityName", pa.string()),
        ("CountyFIPS", pa.string()),
        ("CustomersTracked", pa.int64()),
        ("CustomersOut", pa.int64()),
        ("RecordDateTime", pa.timestamp("s")),
    ]
)
