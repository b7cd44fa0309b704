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


from html.parser import HTMLParser as _HTMLParser


class _TableReader(_HTMLParser):
    """Tolerant table reader on the stdlib HTML tokenizer: survives the
    real-world tag soup the reference absorbs through bs4
    (ga_scraper.py:614-645) — unclosed <tr>/<td>, attributes (quoted '>'
    included), comments, inline markup inside cells, entity references.
    A new <tr>/<td> implicitly closes the previous one, as browsers do.
    Nested tables are flattened into the row stream (same behavior as
    bs4's find_all('tr') on the document)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.rows: list[list[str]] = []
        self._cells: list[str] | None = None
        self._buf: list[str] | None = None

    def _close_cell(self) -> None:
        if self._buf is not None and self._cells is not None:
            self._cells.append("".join(self._buf).strip())
        self._buf = None

    def _close_row(self) -> None:
        self._close_cell()
        if self._cells is not None:
            self.rows.append(self._cells)
        self._cells = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "tr":
            self._close_row()
            self._cells = []
        elif tag in ("td", "th"):
            self._close_cell()
            if self._cells is None:  # td outside any tr: implicit row
                self._cells = []
            self._buf = []

    def handle_endtag(self, tag: str) -> None:
        if tag in ("td", "th"):
            self._close_cell()
        elif tag == "tr":
            self._close_row()

    def handle_data(self, data: str) -> None:
        if self._buf is not None:
            self._buf.append(data)

    def finish(self) -> list[list[str]]:
        self.close()
        self._close_row()
        return self.rows


def parse_html_table(html: str) -> tuple[list[str], list[list[str]]]:
    """DOM-table reader (M11, ga_scraper.py:614-645): header = first row's
    cells, body = remaining rows, cell text stripped. Built on the stdlib
    html.parser tokenizer (the same engine behind bs4's 'html.parser'
    backend), so malformed markup degrades the way a browser would instead
    of silently dropping rows; fuzz-tested in test_kernels.py."""
    p = _TableReader()
    p.feed(html)
    rows = p.finish()
    if not rows:
        return [], []
    return rows[0], rows[1:]


_XML_TAG = re.compile(r"<(\w+)>(.*?)</\1>", re.S)


def xml_records(xml: str, item_tag: str) -> list[dict[str, str]]:
    """xmltodict-style extraction of repeated simple-element records (M12,
    ga_scraper.py:339-347). All values are strings, as xmltodict yields."""
    items = re.findall(rf"<{item_tag}>(.*?)</{item_tag}>", xml, re.S)
    return [{k: v for k, v in _XML_TAG.findall(it)} for it in items]
