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


# ---------------------------------------------------------------------------
# parse_html_table robustness: property-fuzz messy markup (the tag soup the
# reference tolerates through bs4, ga_scraper.py:614-645) and require the
# original cell matrix back. bs4 itself is absent in this sandbox; the
# reader is built on the same stdlib html.parser engine bs4's default
# backend uses.

from hypothesis import given, settings
from hypothesis import strategies as st

from outage_data_scraper_ray.kernels.common import parse_html_table

_cell_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
    ),
    min_size=1,
    max_size=8,
)


def _render_messy(matrix, rng):
    """Render a cell matrix as deliberately messy HTML: random attributes
    (with quoted '>'), missing </td>/</tr>, th/td mixing, comments,
    inline markup and whitespace padding inside cells."""
    parts = ["<table class='x'>"]
    for ri, row in enumerate(matrix):
        attr = " data-x=\"a>b\"" if rng.random() < 0.3 else ""
        parts.append(f"<tr{attr}>")
        for ci, cell in enumerate(row):
            tag = "th" if ri == 0 and rng.random() < 0.5 else "td"
            inner = cell
            if rng.random() < 0.3:
                inner = f"<b>{inner}</b>"
            if rng.random() < 0.3:
                inner = f"  {inner}\n"
            if rng.random() < 0.2:
                parts.append(f"<!-- c{ci} -->")
            parts.append(f"<{tag}>{inner}")
            if rng.random() < 0.5:  # often unclosed
                parts.append(f"</{tag}>")
        if rng.random() < 0.5:  # often unclosed row
            parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(
    matrix=st.lists(
        st.lists(_cell_text, min_size=1, max_size=5),
        min_size=1,
        max_size=6,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_parse_html_table_recovers_messy_matrix(matrix, seed):
    import random

    width = len(matrix[0])
    matrix = [row[:width] + [""] * (width - len(row)) for row in matrix]
    html = _render_messy(matrix, random.Random(seed))
    header, body = parse_html_table(html)
    got = [header] + body
    want = [[c.strip() for c in row] for row in matrix]
    assert got == want, f"html={html!r}"


def test_parse_html_table_wellformed_unchanged():
    """The regular fixtures' shape keeps parsing exactly as before."""
    html = (
        "<table><tr><th>ZIP</th><th>Out</th></tr>"
        "<tr><td>30030</td><td>5</td></tr>"
        "<tr><td>30031</td><td>0</td></tr></table>"
    )
    header, body = parse_html_table(html)
    assert header == ["ZIP", "Out"]
    assert body == [["30030", "5"], ["30031", "0"]]


def test_parse_html_table_entities_and_empty():
    header, body = parse_html_table(
        "<table><tr><th>A&amp;B</th></tr><tr><td></td></tr></table>"
    )
    assert header == ["A&B"]
    assert body == [[""]]
    assert parse_html_table("no tables here") == ([], [])
