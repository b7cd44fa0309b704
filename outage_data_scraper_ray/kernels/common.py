"""Shared helpers for parse kernels.

Spans are the interleaved-document unit from BASELINE.json input_hint:
(kind, text, media_ref, offset). ``text`` is the compact JSON of one
normalized record with keys in the reference's column order — timestamp and
EMC always appended last, mirroring the reference's
``df["timestamp"] = ...; df["EMC"] = ...`` pattern
(ga_scraper.py:231-232 and everywhere else).
"""

from __future__ import annotations

import json
import re
from typing import Any

from ..synth import hash64

SCRAPE_TS_FORMAT = "%m-%d-%Y %H:%M:%S"  # reference util.py:92-93


def span(kind: str, record: dict[str, Any] | None, offset: int, media_ref: str = "") -> dict:
    return {
        "kind": kind,
        "text": "" if record is None else json.dumps(record, separators=(",", ":"), default=str),
        "media_ref": media_ref,
        "offset": offset,
    }


def finish(record: dict[str, Any], ts: str, emc: str) -> dict[str, Any]:
    """Append scrape timestamp + EMC columns (M1/M2, util.py:92-93)."""
    out = dict(record)
    out["timestamp"] = ts
    out["EMC"] = emc
    return out


def synth_zipcode(lat: float, lng: float) -> str:
    """Deterministic stand-in for the reference's Nominatim reverse geocode
    (ga_scraper.py:107-116). Pure function of the coordinates so both the
    distributed kernel and the sequential oracle agree."""
    return str(30000 + hash64(f"{lat:.4f},{lng:.4f}") % 2000)


ZIP_SENTINEL = "Outage scale too large to extract zipcodes"  # ga_scraper.py:247


def zips_for_points(points: list[tuple[float, float]]) -> list[str]:
    """Guarded geocode: only if < 10 rows, else sentinel (ga_scraper.py:241-249)."""
    if len(points) < 10:
        return [synth_zipcode(lat, lng) for lat, lng in points]
    return [ZIP_SENTINEL] * len(points)


def epoch_ms_to_str(ms: int) -> str:
    """pd.to_datetime(unit='ms') rendering (M8, ga_scraper.py:449-451) without
    paying for pandas in the hot kernel."""
    import datetime as _dt

    dt = _dt.datetime.fromtimestamp(ms / 1000, tz=_dt.timezone.utc).replace(tzinfo=None)
    return str(dt)


def strip_jsonp(body: str) -> str:
    """JSONP unwrap (M13, tx_scraper.py:258-261)."""
    if not body.startswith("{") and not body.startswith("["):
        return body[body.index("(") + 1 : body.rindex(")")]
    return body


_TABLE_ROW = re.compile(r"<tr>(.*?)</tr>", re.S)
_TABLE_CELL = re.compile(r"<t[hd][^>]*>(.*?)</t[hd]>", re.S)
_TAG = re.compile(r"<[^>]+>")


def parse_html_table(html: str) -> tuple[list[str], list[list[str]]]:
    """Minimal DOM-table reader (M11, ga_scraper.py:614-645): header = th
    cells, body rows = td cells, cell text stripped. bs4 is not available in
    this sandbox; the synthetic HTML is regular enough for a regex reader."""
    rows = _TABLE_ROW.findall(html)
    if not rows:
        return [], []
    header = [_TAG.sub("", c).strip() for c in _TABLE_CELL.findall(rows[0])]
    body = [[_TAG.sub("", c).strip() for c in _TABLE_CELL.findall(r)] for r in rows[1:]]
    return header, body


_XML_TAG = re.compile(r"<(\w+)>(.*?)</\1>", re.S)


def xml_records(xml: str, item_tag: str) -> list[dict[str, str]]:
    """xmltodict-style extraction of repeated simple-element records (M12,
    ga_scraper.py:339-347). All values are strings, as xmltodict yields."""
    items = re.findall(rf"<{item_tag}>(.*?)</{item_tag}>", xml, re.S)
    return [{k: v for k, v in _XML_TAG.findall(it)} for it in items]
