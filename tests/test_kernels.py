"""Per-row span-sequence equality: distributed kernels vs the pandas oracle.

This is the north_rule invariant — for every payload family, the kernel's
spans (kind, text, media_ref, order) must equal the reference-semantics
re-derivation (pipelines/oracle_sim.oracle_parse) on the same bytes.
"""

import pytest

from outage_data_scraper_ray.kernels import KERNELS
from outage_data_scraper_ray.pipelines.oracle_sim import oracle_parse
from outage_data_scraper_ray.stages.fetch import VIRTUAL_SCRAPE_TS
from outage_data_scraper_ray.synth import (
    FETCH_PLANS,
    SyntheticWeb,
    child_urls_for,
    make_seed_registry,
)

FAMILIES = [f for f in FETCH_PLANS if f != "kubra_report"]


def _urls_for_family(family, n=8):
    seeds = make_seed_registry(600, 42).to_pylist()
    rows = [s for s in seeds if s["layout"] == family][:n]
    assert rows, f"no seeds with family {family}"
    return rows


@pytest.mark.parametrize("family", FAMILIES)
def test_span_equality(family):
    web = SyntheticWeb(seed=42, max_rows=12, failure_rate=0.0)
    for row in _urls_for_family(family):
        bodies = web.fetch(row["url"], family)
        got, kids_got = KERNELS[family](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
        want, kids_want = oracle_parse(bodies, family, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
        assert kids_got == kids_want
        assert got == want, f"span mismatch for {family} at {row['url']}"


def test_kubra_children_span_equality():
    web = SyntheticWeb(seed=42, max_rows=12, failure_rate=0.0)
    for row in _urls_for_family("kubra", n=6):
        for cu in child_urls_for(row["url"], "kubra", 42):
            bodies = web.fetch(cu, "kubra_report")
            got, _ = KERNELS["kubra_report"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, cu)
            want, _ = oracle_parse(bodies, "kubra_report", row["emc"], VIRTUAL_SCRAPE_TS, cu)
            assert got == want, f"span mismatch for kubra child {cu}"


def test_media_spans_present():
    """Interleaved docs must carry media spans (per_media with media_ref)."""
    web = SyntheticWeb(seed=42, max_rows=8, failure_rate=0.0)
    found = 0
    for row in _urls_for_family("kubra", n=10):
        for cu in child_urls_for(row["url"], "kubra", 42):
            bodies = web.fetch(cu, "kubra_report")
            spans, _ = KERNELS["kubra_report"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, cu)
            for s in spans:
                if s["kind"] == "per_media":
                    assert s["media_ref"]
                    assert s["text"] == ""
                    found += 1
    assert found > 0


def test_offsets_are_sequential():
    web = SyntheticWeb(seed=7, max_rows=12, failure_rate=0.0)
    for family in FAMILIES:
        for row in _urls_for_family(family, n=3):
            bodies = web.fetch(row["url"], family)
            spans, _ = KERNELS[family](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
            assert [s["offset"] for s in spans] == list(range(len(spans)))
