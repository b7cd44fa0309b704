"""Deterministic synthetic seed registry + fixture web.

The reference crawls ~285 live utility endpoints listed in
events/<state>/layout_<id>.json (app/main.py:14-21). This sandbox has no
network, so the engine crawls a *deterministic synthetic web*: every URL's
payload is a pure function of (global_seed, url), generated to match the
payload families the reference parses (FIXTURES.md section F3, SURVEY.md
section 2.1). Any worker can "fetch" any URL without shared state, which is
what makes the fetch stage an embarrassingly parallel actor-pool
``map_batches`` at 10^10-frontier scale.

Payload families (reference provenance in kernels/__init__.py):
nisc, wov, asmx, kubra (parent deck -> child reports, the discovery
precedent of ga_scraper.py:405-435), epochms, polygons, shellout, domtable,
arcgis (+JSONP), prejson, eshits, regionsets, incidents, alloutages,
singlevalue.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

import numpy as np
import pyarrow as pa

from .schemas import SEEDS

# ---------------------------------------------------------------------------
# hashing

def hash64(s: str) -> int:
    """Stable 64-bit hash of a string (canonical-URL hash basis)."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def canonical_url(url: str) -> str:
    """Canonicalize: lowercase scheme+host, strip trailing slash + fragment.
    Scalar reference implementation — the crawl's hot paths use the
    vectorized ``canonical_urls`` below (equivalence property-tested)."""
    url = url.split("#", 1)[0]
    if "://" in url:
        scheme, rest = url.split("://", 1)
        host, _, path = rest.partition("/")
        url = scheme.lower() + "://" + host.lower() + ("/" + path if path else "")
    return url.rstrip("/")


# non-greedy scheme = everything before the FIRST "://" (matches the scalar
# split); host = up to the next "/"; path = the rest including its slash.
# (?s) so '.' crosses newlines: without it a URL containing '\n' extracts
# all-NaN and every such URL collapses to ONE shared canonical hash
_CANON_RE = r"(?s)^(.*?)://([^/]*)(.*)$"


def canonical_urls(urls) -> "pd.Series":
    """Vectorized canonical_url over a sequence: one C-speed regex extract +
    string kernels instead of a Python call per URL (the crawl stamps every
    frontier/children row, so this sits on the widest pass of each epoch)."""
    import pandas as pd

    s = pd.Series(urls, dtype=object).str.split("#", n=1).str[0]
    m = s.str.contains("://", regex=False)
    if bool(m.any()):
        ex = s[m].str.extract(_CANON_RE, expand=True)
        canon = ex[0].str.lower() + "://" + ex[1].str.lower() + ex[2]
        s = s.copy()
        s[m] = canon
    return s.str.rstrip("/")


def host_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    return rest.partition("/")[0].lower()


# ---------------------------------------------------------------------------
# seed registry

# (state, family) cells mirroring the reference's states x layout spread
# (events/ has 12 states; ga alone has 11 layouts). Family weights skew the
# host sizes so the skew/salting path is exercised.
_CELLS: list[tuple[str, str]] = [
    ("ga", "nisc"), ("ga", "wov"), ("ga", "asmx"), ("ga", "kubra"),
    ("ga", "epochms"), ("ga", "polygons"), ("ga", "shellout"), ("ga", "domtable"),
    ("ca", "arcgis"), ("ca", "epochms"), ("ca", "arcgis"),
    ("tx", "domtable"), ("tx", "kubra"), ("tx", "arcgis"), ("tx", "prejson"),
    ("fl", "prejson"), ("fl", "eshits"), ("fl", "regionsets"),
    ("il", "kubra"), ("il", "shellout"),
    ("ny", "domtable"), ("ny", "kubra"),
    ("tn", "domtable"), ("tn", "incidents"),
    ("nc", "domtable"), ("sc", "nisc"), ("al", "asmx"),
    ("la", "alloutages"), ("ms", "polygons"), ("ms", "singlevalue"),
    ("ga", "shellout11"), ("tx", "shellout11"),
    ("fl", "summarytotals"), ("fl", "prejson_list"), ("tn", "outagedetails"),
    ("il", "kubra_nested"),
    ("tx", "dtable"), ("tx", "outagelst"), ("tx", "affectedcount"),
    ("ny", "ny_report"), ("ny", "ny_kubra_val"), ("ny", "ny_iframe"),
    ("fl", "duke"), ("nc", "duke"), ("nc", "treegrid"),
    ("tx", "tx_report_table"), ("tx", "tx_suffixjson"),
    ("tx", "tx_kubra_sniff"), ("tx", "tx_envelope"),
    ("il", "il_kubra_val"), ("il", "il_numoutages"), ("il", "il_areasummary"),
    ("fl", "fl_pretag7"), ("fl", "fl_pretag8"),
    ("ga", "ga_arcgis10"), ("tn", "tn_reportlevels"), ("la", "la_plainjson"),
]


def make_seed_registry(n_seeds: int = 285, seed: int = 42) -> pa.Table:
    """Deterministic seed table shaped like the reference's EMC registry.

    seed_index preserves the reference's crawl-order precedent (the dict
    insertion order of the event file, app/main.py:21). utility_tier and
    refresh_deadline are the scheduler priority keys from the north_star.
    """
    rng = np.random.default_rng(seed)
    idx = np.arange(n_seeds)
    cell = idx % len(_CELLS)
    states = np.array([c[0] for c in _CELLS])[cell]
    families = np.array([c[1] for c in _CELLS])[cell]
    # np.char.zfill allocates exactly `width` chars and TRUNCATES longer
    # inputs — at n_seeds > 100_000 a fixed width of 5 would silently
    # collide idx 100000 with 10000 (duplicate seed URLs). Width follows
    # the largest index; 5 keeps every historical <=100k URL byte-stable.
    slug_width = max(5, len(str(max(n_seeds - 1, 0))))
    slugs = np.char.zfill(idx.astype(str), slug_width)
    urls = np.char.add(
        np.char.add("https://outage.emc", slugs),
        np.char.add(np.char.add(".", states), ".synthgrid.example"),
    )
    hosts = np.char.replace(urls.astype(str), "https://", "")
    emcs = np.char.add(np.char.add(np.char.upper(states), " EMC "), slugs)
    t = pa.table(
        {
            "url": pa.array(urls.tolist(), pa.string()),
            "host": pa.array(hosts.tolist(), pa.string()),
            "emc": pa.array(emcs.tolist(), pa.string()),
            "state": pa.array(states.tolist(), pa.string()),
            "layout": pa.array(families.tolist(), pa.string()),
            "seed_index": pa.array(idx.astype(np.int32)),
            "utility_tier": pa.array(rng.integers(0, 3, size=n_seeds).astype(np.int32)),
            "refresh_deadline": pa.array(
                1_700_000_000_000 + rng.integers(0, 3600, size=n_seeds) * 1000,
                pa.timestamp("ms"),
            ),
        }
    )
    return t.cast(SEEDS)


# ---------------------------------------------------------------------------
# fetch plans: which sub-requests one seed implies (the reference's fetch()
# methods issue 1-3 GETs per EMC, e.g. ga_scraper.py:256-266 does two).

FETCH_PLANS: dict[str, list[tuple[str, str]]] = {
    "nisc": [("per_county", "data/boundaries.json"), ("per_outage", "data/outages.json")],
    "wov": [("per_outage", "api/weboutageviewer/get_live_data")],
    "asmx": [
        ("per_county", "MobileMap/OMSMobileService.asmx/GetAllCounties"),
        ("per_outage", "MobileMap/OMSMobileService.asmx/GetAllOutages"),
    ],
    "kubra": [("deck", "data/deck.json")],
    "kubra_report": [("report", "")],
    "kubra_nested": [
        ("per_county", "resources/reports/report_county.json"),
        ("per_zipcode", "resources/reports/report_zip.json"),
    ],
    "epochms": [("per_outage", "outages")],
    "polygons": [("per_outage", "report.json")],
    "shellout": [("shellout", "ShellOut.aspx")],
    "shellout11": [
        ("per_substation", "ajax/ajaxShellOut.php?target=cfa_substation_data"),
        ("per_county", "ajax/ajaxShellOut.php?target=cfa_county_data"),
        ("per_outage", "ajax/ajaxShellOut.php?target=cfa_device_markers"),
    ],
    "domtable": [("per_county", "outages/table")],
    "arcgis": [("per_outage", "FeatureServer/0/query")],
    "prejson": [("per_county", "outages.json")],
    "summarytotals": [("per_city", "summary.json")],
    "prejson_list": [("per_outage", "outages_list.json")],
    "eshits": [("per_outage", "es/_search")],
    "regionsets": [("per_region", "regions.json")],
    "incidents": [("incidents", "incidents")],
    "outagedetails": [("per_outage", "electric-outage-details")],
    "alloutages": [("per_outage", "alloutages")],
    "dtable": [("per_outage", "Outage.asmx/loadLatLongOuterOutage")],
    "outagelst": [("per_outage", "api/outagelist")],
    "affectedcount": [("per_outage", "outages/affected")],
    "singlevalue": [("per_emc", "")],
    "ny_report": [
        ("per_borough_new_york", "resources/reports/report_nyc.json"),
        ("per_area_westchester", "resources/reports/report_westchester.json"),
    ],
    "ny_kubra_val": [
        ("per_town", "resources/reports/report_town.json"),
        ("per_county", "resources/reports/report_county.json"),
    ],
    "ny_iframe": [("per_county", "iframe/outage_central.html")]
    + [(f"town_{c}", f"iframe/outage_central_{c}.html") for c in
       ("APPLING", "BACON", "BAKER", "BALDWIN")],
    "duke": [("per_county", "outage-maps/summary-table")],
    "treegrid": [("per_county", "summary/county-muni")],
    "tx_report_table": [
        ("per_county", "?report=report-panel-county"),
        ("per_zipcode", "?report=report-panel-zip"),
    ],
    "tx_suffixjson": [("per_zip", "zip"), ("per_county", "county")],
    "tx_kubra_sniff": [
        ("per_zipcode", "resources/reports/report_zip.json"),
        ("per_county", "resources/reports/report_county.json"),
        ("per_city", "resources/reports/report_city.json"),
        ("per_region", "resources/reports/report_region.json"),
    ],
    "tx_envelope": [("per_outage", "FeatureServer/0/query?geometryType=esriGeometryEnvelope")],
    "il_kubra_val": [
        ("per_county", "resources/reports/report_county.json"),
        ("per_city_town_village", "resources/reports/report_ctv.json"),
        ("per_chicago_ward", "resources/reports/report_ward.json"),
    ],
    "il_numoutages": [
        ("per_city", "api/CityOutageData"),
        ("per_county", "api/CountyInfo"),
        ("per_metro", "api/GetAllMetroOutages"),
    ],
    "il_areasummary": [("areasummary", "api/AreaSummary")],
    "fl_pretag7": [("per_outage", "data/outages.json")],
    "fl_pretag8": [("per_outage", "data/outages_plain.json")],
    "ga_arcgis10": [("per_county", "arcgis/rest/services/counties/FeatureServer/0/query")],
    "tn_reportlevels": [
        ("per_District", "report?level=District"),
        ("per_County", "report?level=County"),
    ],
    "la_plainjson": [("per_outage", "api/outages")],
}

KUBRA_REPORT_TITLES = ["county", "zip", "MEDIA", "city", "ctv", "ward"]
# upper bound on discovery fan-out per fetched doc — crawl sizing (frontier
# row bounds) derives from this, so keep it tied to the actual generator
MAX_CHILDREN_PER_DOC = len(KUBRA_REPORT_TITLES)


def fetch_plan(url: str, layout: str) -> list[tuple[str, str]]:
    base = url.rstrip("/")
    return [(key, base + ("/" + rel if rel else "")) for key, rel in FETCH_PLANS[layout]]


def child_urls_for(url: str, layout: str, seed: int) -> list[str]:
    """Discovery: a kubra parent deck yields child report URLs
    (the reference sniffs these from XHR traffic, ga_scraper.py:405-435;
    il_scraper.py:199-219)."""
    if layout != "kubra":
        return []
    rng = _rng_for(url + "#deck", seed)
    n = int(rng.integers(2, len(KUBRA_REPORT_TITLES) + 1))
    return [f"{url.rstrip('/')}/reports/{t}/report.json" for t in KUBRA_REPORT_TITLES[:n]]


def _rng_for(key: str, seed: int) -> np.random.Generator:
    return np.random.default_rng((seed * 0x9E3779B97F4A7C15 ^ hash64(key)) % (2**63))


# ---------------------------------------------------------------------------
# payload synthesis

_COUNTIES = ["APPLING", "BACON", "BAKER", "BALDWIN", "BANKS", "BARROW", "BARTOW", "CLARKE"]
_CITIES = ["Milledgeville", "Sandersville", "Tennille", "Deepstep", "Irwinton", "Gordon"]
_CAUSES = ["Tree on line", "Equipment failure", "Weather", "Planned", "Animal", "Unknown"]


def robots_rules(host: str, seed: int) -> tuple[str, ...]:
    """Deterministic synthetic robots.txt for a host: () = allow all,
    ('/reports/',) = no report scraping, ('/',) = disallow everything.
    Pure function of (host, seed) so the 'robots fetch' any shard performs
    yields identical rules everywhere."""
    r = _rng_for("robots:" + host, seed).random()
    if r < 0.02:
        return ("/",)
    if r < 0.08:
        return ("/reports/",)
    return ()


def robots_allows(url: str, rules: tuple[str, ...]) -> bool:
    path = "/" + url.split("://", 1)[-1].partition("/")[2]
    return not any(path.startswith(p) for p in rules)


def failure_for(url: str, seed: int, rate: float = 0.02) -> str | None:
    """Deterministic transient-failure injection (reference logs failures and
    continues, app/main.py:32-41). Returns a reason string or None."""
    r = _rng_for(url + "#fail", seed).random()
    if r < rate / 2:
        return "Request timed out"
    if r < rate:
        return "HTTP Error 503: Service Unavailable"
    return None


def synth_body(url: str, layout: str, key: str, seed: int, max_rows: int = 8) -> bytes:
    """Deterministic payload bytes for one sub-request URL."""
    rng = _rng_for(url, seed)
    n = int(rng.integers(0, max_rows + 1))

    def county(i: int) -> str:
        return _COUNTIES[int(rng.integers(0, len(_COUNTIES)))]

    if layout == "nisc":
        if key == "per_county":
            items = []
            for _ in range(max(1, n // 3)):
                bnds = [
                    {
                        "boundaryName": county(0),
                        "customersAffected": int(rng.integers(0, 3) * rng.integers(0, 40)),
                        "customersOutNow": int(rng.integers(0, 3) * rng.integers(0, 30)),
                        "customersServed": int(rng.integers(500, 20000)),
                    }
                    for _ in range(int(rng.integers(1, 4)))
                ]
                items.append({"boundaries": bnds})
            return json.dumps(items).encode()
        # per_outage
        out = [
            {
                "outageRecID": f"O{int(rng.integers(10**6, 10**7))}",
                "outagePoint": {
                    "lat": round(30 + 5 * rng.random(), 6),
                    "lng": round(-85 + 4 * rng.random(), 6),
                },
                "outageStartTime": f"2023-10-0{int(rng.integers(1,9))} "
                f"{int(rng.integers(0,24)):02d}:{int(rng.integers(0,60)):02d}:00",
                "customersOutNow": int(rng.integers(1, 200)),
                "cause": _CAUSES[int(rng.integers(0, len(_CAUSES)))],
            }
            for _ in range(n)
        ]
        return json.dumps(out).encode()

    if layout == "wov":
        outs = [
            {
                "OutageID": int(rng.integers(10**5, 10**6)),
                "OutageLocation": {
                    "X": round(-85 + 4 * rng.random(), 6),
                    "Y": round(30 + 5 * rng.random(), 6),
                },
                "CustomersAffected": int(rng.integers(1, 300)),
                "Cause": _CAUSES[int(rng.integers(0, len(_CAUSES)))],
            }
            for _ in range(n)
        ]
        return json.dumps({"Outages": outs}).encode()

    if layout == "asmx":
        if key == "per_county":
            rows = "".join(
                "<MobileCounty>"
                f"<CountyName>{county(0)}</CountyName>"
                f"<CustomersAffected>{int(rng.integers(0, 3) * rng.integers(0, 50))}</CustomersAffected>"
                f"<CustomersServed>{int(rng.integers(500, 9000))}</CustomersServed>"
                "<Shape>poly</Shape>"
                "</MobileCounty>"
                for _ in range(max(1, n // 2))
            )
            return f"<ArrayOfMobileCounty>{rows}</ArrayOfMobileCounty>".encode()
        rows = "".join(
            "<MobileOutage>"
            f"<OutageID>{int(rng.integers(10**5, 10**6))}</OutageID>"
            f"<CustomersOut>{int(rng.integers(1, 120))}</CustomersOut>"
            f"<X>{round(-85 + 4 * rng.random(), 6)}</X>"
            f"<Y>{round(30 + 5 * rng.random(), 6)}</Y>"
            "</MobileOutage>"
            for _ in range(n)
        )
        return f"<MobileOutageInfo><Outages>{rows}</Outages></MobileOutageInfo>".encode()

    if layout in ("kubra", "kubra_report"):
        if key == "deck":
            return json.dumps({"decks": child_urls_for(url.rsplit("/data/", 1)[0], "kubra", seed)}).encode()
        title = url.rsplit("/reports/", 1)[-1].split("/", 1)[0]
        if title == "MEDIA":
            tile = f"https://tiles.synthgrid.example/{hash64(url) % 10**8}/cluster.png"
            return json.dumps({"file_title": "MEDIA", "tile": tile}).encode()
        areas = [
            {
                "name": f"{title}-{int(rng.integers(1, 999))}",
                "cust_a": {"val": int(rng.integers(0, 3) * rng.integers(0, 80))},
                "percent_cust_a": {"val": round(rng.random(), 4)},
                "n_out": int(rng.integers(0, 4)),
                "cust_s": int(rng.integers(100, 50000)),
                "gotoMap": {"zoom": 9},
            }
            for _ in range(n)
        ]
        return json.dumps({"file_title": f"public/{title}-1", "file_data": {"areas": areas}}).encode()

    if layout == "kubra_nested":
        groups = []
        for _g in range(int(rng.integers(1, 4))):
            rows_n = [
                {
                    "name": f"{key}-{int(rng.integers(1, 999))}",
                    "cust_a": {"val": int(rng.integers(0, 3) * rng.integers(0, 70))},
                    "percent_cust_a": {"val": round(rng.random(), 4)},
                    "n_out": int(rng.integers(0, 4)),
                    "cust_s": int(rng.integers(100, 40000)),
                }
                for _ in range(int(rng.integers(1, 5)))
            ]
            groups.append({"areas": rows_n})
        return json.dumps({"file_data": {"areas": [{"areas": groups}]}}).encode()

    if layout == "epochms":
        base_ms = 1_696_000_000_000
        out = [
            {
                "id": int(rng.integers(10**5, 10**6)),
                "startTime": base_ms + int(rng.integers(0, 10**6)) * 1000,
                "lastUpdatedTime": base_ms + int(rng.integers(10**6, 2 * 10**6)) * 1000,
                "latitude": round(30 + 5 * rng.random(), 6),
                "longitude": round(-85 + 4 * rng.random(), 6),
                "numPeople": int(rng.integers(1, 150)),
            }
            for _ in range(n)
        ]
        return json.dumps(out).encode()

    if layout == "polygons":
        reports = []
        for rid in ("County", "Zip"):
            polys = [
                {
                    "name": county(0) if rid == "County" else str(int(rng.integers(30000, 32000))),
                    "affected": int(rng.integers(0, 3) * rng.integers(0, 60)),
                    "served": int(rng.integers(200, 9000)),
                }
                for _ in range(max(1, n // 2))
            ]
            reports.append({"id": rid, "polygons": polys})
        outages = [
            {
                "id": f"G{int(rng.integers(10**5, 10**6))}",
                "numPeople": int(rng.integers(1, 80)),
                "latitude": round(30 + 5 * rng.random(), 6),
                "longitude": round(-85 + 4 * rng.random(), 6),
            }
            for _ in range(n)
        ]
        return json.dumps(
            {"reportData": {"reports": reports}, "outageData": {"outages": outages}}
        ).encode()

    if layout == "shellout":
        markers = [
            {
                "lat": round(30 + 5 * rng.random(), 6),
                "lon": round(-85 + 4 * rng.random(), 6),
                "outages": int(rng.integers(1, 9)),
            }
            for _ in range(n)
        ]
        return json.dumps(
            {
                "isHighTraffic": bool(rng.random() < 0.1),
                "areas": {
                    "markers": markers,
                    "service_index_name": "district_a",
                    "outages": len(markers),
                    "stats": {"NumConsumers": int(rng.integers(1000, 90000))},
                },
            }
        ).encode()

    if layout == "shellout11":
        if key == "per_substation":
            subs = [
                {
                    "SubName": f"SUB-{int(rng.integers(1, 99))}",
                    "SubTotalConsumersOut": int(rng.integers(0, 3) * rng.integers(0, 60)),
                    "SubTotalMetersAffectedByDeviceOutages": int(
                        rng.integers(0, 2) * rng.integers(0, 20)
                    ),
                }
                for _ in range(max(1, n // 2))
            ]
            return json.dumps({"rows": {"subs": subs}}).encode()
        if key == "per_county":
            rows_ = [
                {
                    "name": county(0),
                    "out": int(rng.integers(0, 3) * rng.integers(0, 40)),
                    "served": int(rng.integers(200, 9000)),
                }
                for _ in range(max(1, n // 2))
            ]
            return json.dumps({"rows": rows_}).encode()
        # per_outage: dict areas; the reference keeps the LAST area with
        # markers (ga_scraper.py:792 overwrites per_outage_df per loop)
        payload: dict[str, Any] = {
            "isHighTraffic": bool(rng.random() < 0.1),
            "timestamp": "2023-10-05T07:55:00",
        }
        for j in range(int(rng.integers(1, 3))):
            markers = [
                {
                    "lat": round(30 + 5 * rng.random(), 6),
                    "lon": round(-85 + 4 * rng.random(), 6),
                }
                for _ in range(int(rng.integers(0, max(2, n))))
            ]
            payload[f"area{j}"] = {
                "markers": markers,
                "service_index_name": f"district_{j}",
                "outages": len(markers),
                "stats": {"NumConsumers": int(rng.integers(1000, 90000))},
            }
        return json.dumps(payload).encode()

    if layout == "domtable":
        hdr = "<tr><th>County</th><th># Out</th><th>Served</th><th></th></tr>"
        body = "".join(
            f"<tr><td> {county(0)} </td><td>{int(rng.integers(0, 3) * rng.integers(0, 70))}</td>"
            f"<td>{int(rng.integers(100, 8000))}</td><td>x</td></tr>"
            for _ in range(n)
        )
        return f"<html><body><table>{hdr}{body}</table></body></html>".encode()

    if layout == "arcgis":
        feats = [
            {
                "attributes": {
                    "OBJECTID": int(rng.integers(1, 10**6)),
                    "StartDate": 1_696_000_000_000 + int(rng.integers(0, 10**6)) * 1000,
                    "EstimatedRestoreDate": 1_697_000_000_000 + int(rng.integers(0, 10**6)) * 1000,
                    "ImpactedCustomers": int(rng.integers(1, 400)),
                    "Cause": _CAUSES[int(rng.integers(0, len(_CAUSES)))],
                },
                "geometry": {
                    "x": round(-120 + 4 * rng.random(), 6),
                    "y": round(33 + 5 * rng.random(), 6),
                },
            }
            for _ in range(n)
        ]
        payload = json.dumps({"features": feats})
        if rng.random() < 0.3:  # JSONP wrapper variant (tx_scraper.py:258-261)
            payload = f"jsonpcb({payload});"
        return payload.encode()

    if layout == "prejson":
        outs = [
            {
                "Outage ID": f"P{int(rng.integers(10**5, 10**6))}",
                "Customers Out": str(int(rng.integers(0, 3) * rng.integers(0, 50))),
                "County": county(0),
            }
            for _ in range(n)
        ]
        return json.dumps({"outages": outs}).encode()

    if layout == "summarytotals":
        totals = {
            "total_cust_s": int(rng.integers(10_000, 90_000)),
            "total_outages": int(rng.integers(0, 40)),
            "total_cust_a": {"val": int(rng.integers(0, 900))},
        }
        return json.dumps(
            {
                "summaryFileData": {
                    "totals": [totals],
                    "date_generated": "2023-10-05T07:59:00",
                }
            }
        ).encode()

    if layout == "prejson_list":
        outs = [
            {
                "id": f"L{int(rng.integers(10**5, 10**6))}",
                "createdDate": "2023-10-05T06:00:00",
                "lastUpdated": "2023-10-05T07:30:00",
                "startDate": "2023-10-05T05:45:00",
                "numPeople": int(rng.integers(0, 3) * rng.integers(0, 40)),
                "latitude": round(27 + 3 * rng.random(), 6),
                "longitude": round(-82 + 2 * rng.random(), 6),
            }
            for _ in range(n)
        ]
        return json.dumps(outs).encode()

    if layout == "eshits":
        objs = []
        for _ in range(int(rng.integers(1, 4))):  # several sniffed XHRs
            hits = [
                {
                    "_id": f"E{int(rng.integers(10**5, 10**6))}",
                    "_source": {
                        "customerCount": int(rng.integers(1, 80)),
                        "estimatedTimeOfRestoration": "2023-10-05T10:00:00",
                        "reason": _CAUSES[int(rng.integers(0, len(_CAUSES)))],
                        "status": "Crew dispatched",
                        "updateTime": "2023-10-05T08:00:00",
                    },
                }
                for _ in range(int(rng.integers(0, max(2, n // 2))))
            ]
            objs.append({"hits": {"hits": hits}})
        return json.dumps(objs).encode()

    if layout == "regionsets":
        set_ids = ["county", "zone"][: int(rng.integers(1, 3))]
        sets = [
            {
                "id": sid,
                "regions": [
                    {"name": _CITIES[int(rng.integers(0, len(_CITIES)))],
                     "numberOut": int(rng.integers(0, 3) * rng.integers(0, 40)),
                     "served": int(rng.integers(100, 4000))}
                    for _ in range(int(rng.integers(1, 5)))
                ],
            }
            for sid in set_ids
        ]
        return json.dumps({"regionDataSets": sets}).encode()

    if layout == "incidents":
        dm = []
        for j in range(max(1, n // 2)):
            item = {"district": f"D{j}"}
            if rng.random() > 0.2:  # some districts report nothing
                item["outage_reported"] = {
                    "customer_qty": int(rng.integers(0, 200)),
                    "incident_qty": int(rng.integers(0, 9)),
                }
            dm.append(item)
        pts = [
            {
                "incident_id": f"P{int(rng.integers(10**5, 10**6))}",
                "lat": round(35 + 2 * rng.random(), 6),
                "lng": round(-86 + 2 * rng.random(), 6),
                "customer_qty": int(rng.integers(1, 60)),
            }
            for _ in range(n)
        ]
        return json.dumps({"district_metrics": dm, "outage_points": pts}).encode()

    if layout == "outagedetails":
        det = [
            {
                "id": f"I{int(rng.integers(10**5, 10**6))}",
                "county": county(0),
                "zipcode": str(int(rng.integers(30000, 32000))),
                "customerCount": int(rng.integers(1, 90)),
            }
            for _ in range(n)
        ]
        return json.dumps({"electricOutageDetails": det}).encode()

    if layout == "alloutages":
        data = [
            {
                "id": int(rng.integers(10**5, 10**6)),
                "numPeople": int(rng.integers(1, 60)),
                "cause": _CAUSES[int(rng.integers(0, len(_CAUSES)))],
                "extension": {"x": 1},
                "affectedAreas": [county(0)],
            }
            for _ in range(n)
        ]
        return json.dumps({"data": data}).encode()

    if layout == "dtable":
        rows_ = []
        for _ in range(n):
            r = {
                "OutageId": int(rng.integers(10**5, 10**6)),
                "Latitude": round(29 + 4 * rng.random(), 6),
                "Longitude": round(-99 + 4 * rng.random(), 6),
                "CustomersOut": int(rng.integers(1, 90)),
            }
            if rng.random() < 0.2:  # ragged row -> NaN -> reference dropna
                del r["CustomersOut"]
            rows_.append(r)
        inner = json.dumps({"Table": rows_})
        return json.dumps({"d": inner}).encode()

    if layout == "outagelst":
        lst = [
            {
                "outageId": f"T{int(rng.integers(10**5, 10**6))}",
                "lat": round(29 + 4 * rng.random(), 6),
                "lon": round(-99 + 4 * rng.random(), 6),
                "numPeople": int(rng.integers(1, 70)),
                "status": "Active" if rng.random() < 0.8 else "Restored",
            }
            for _ in range(n)
        ]
        return json.dumps({"outageLst": lst}).encode()

    if layout == "affectedcount":
        lst = [
            {
                "outageId": f"A{int(rng.integers(10**5, 10**6))}",
                "affectedCount": int(rng.integers(0, 3) * rng.integers(0, 50)),
                "cause": _CAUSES[int(rng.integers(0, len(_CAUSES)))],
            }
            for _ in range(n)
        ]
        return json.dumps(lst).encode()

    if layout == "singlevalue":
        return (
            f'<html><span id="currentOutages">{int(rng.integers(0, 500))}</span>'
            f'<span id="lastUpdated">10-05-2023 08:{int(rng.integers(0,60)):02d}:00</span></html>'
        ).encode()

    if layout == "ny_report":
        groups = []
        for _g in range(max(1, n // 3)):
            rows_n = []
            for _ in range(int(rng.integers(1, 5))):
                cust = int(rng.integers(0, 3) * rng.integers(0, 60))
                # cust_a is always a {val:...} dict when present — the
                # reference's `"val" in row["cust_a"]` (ny_scraper.py:45-51)
                # raises on plain ints, so real payloads never carry them
                row_rec = {
                    "name": f"{key}-{int(rng.integers(1, 999))}",
                    "cust_a": {"val": cust},
                    "cust_s": int(rng.integers(100, 30000)),
                    "etr": f"2023-10-0{int(rng.integers(1, 9))}T0{int(rng.integers(0, 9))}:00",
                }
                rows_n.append(row_rec)
            groups.append({"areas": rows_n})
        return json.dumps({"file_data": {"areas": [{"areas": groups}]}}).encode()

    if layout in ("ny_kubra_val", "tx_kubra_sniff", "il_kubra_val"):
        areas = [
            {
                "name": f"{key}-{int(rng.integers(1, 999))}",
                "cust_a": {"val": int(rng.integers(0, 3) * rng.integers(0, 80))},
                "percent_cust_a": {"val": round(rng.random(), 4)},
                "n_out": int(rng.integers(0, 4)),
                "cust_s": int(rng.integers(100, 50000)),
                "gotoMap": {"zoom": 9},
            }
            for _ in range(n)
        ]
        return json.dumps({"file_title": f"public/{key}-1", "file_data": {"areas": areas}}).encode()

    if layout == "ny_iframe":
        if key == "per_county":
            hdr = "<tr><th>County</th><th>Customers Affected</th><th>Customers Served</th></tr>"
            body = "".join(
                f"<tr><td>{c}</td><td>{int(rng.integers(0, 90))}</td>"
                f"<td>{int(rng.integers(500, 20000))}</td></tr>"
                for c in ("APPLING", "BACON", "BAKER", "BALDWIN")
            )
            body += "<tr><td>Total</td><td>-</td><td>-</td></tr>"  # trimmed by tr[1:-1]
        else:
            hdr = "<tr><th>Town</th><th>Customers Affected</th></tr>"
            body = "".join(
                f"<tr><td>{key.split('_', 1)[1]}-{i}</td><td>{int(rng.integers(0, 50))}</td></tr>"
                for i in range(int(rng.integers(1, 5)))
            )
            body += "<tr><td>Total</td><td>-</td></tr>"
        return f"<html><body><table>{hdr}{body}</table></body></html>".encode()

    if layout == "duke":
        n = max(1, n)
        return json.dumps(
            {
                "Location": [county(0).title() for _ in range(n)],
                "Number of Outages": [str(int(rng.integers(0, 3) * rng.integers(0, 9))) for _ in range(n)],
                "Affected Customers": [str(int(rng.integers(0, 400))) for _ in range(n)],
                "Percentage Affected": [f"{rng.random() * 4:.1f}%" for _ in range(n)],
                "Last Updated": [f"0{int(rng.integers(1, 9))}/15/2023 10:0{int(rng.integers(0, 9))} PM" for _ in range(n)],
            }
        ).encode()

    if layout == "treegrid":
        n = max(1, n)
        return json.dumps(
            {
                "area_name": [county(0).title() for _ in range(n)],
                "cust_a": [str(int(rng.integers(0, 3) * rng.integers(0, 70))) for _ in range(n)],
                "cust_s": [str(int(rng.integers(500, 40000))) for _ in range(n)],
            }
        ).encode()

    if layout == "tx_report_table":
        loc_val = (lambda: county(0)) if "county" in url else (
            lambda: str(75000 + int(rng.integers(0, 900)))
        )
        hdr = (
            "<tr><th>expand</th><th>loc</th><th>out</th><th>served</th><th>pct</th></tr>"
            "<tr><td colspan=5>summary</td></tr>"
        )
        body = "".join(
            f"<tr><td>+</td><td>{loc_val()}</td>"
            f"<td>{int(rng.integers(0, 3) * rng.integers(0, 50))}</td>"
            f"<td>{int(rng.integers(100, 9000))}</td><td>{rng.random() * 3:.2f}%</td></tr>"
            for _ in range(n)
        )
        return f"<html><body><table class=\"report-table tree\">{hdr}{body}</table></body></html>".encode()

    if layout == "tx_suffixjson":
        base_ms = 1_696_100_000_000
        out = [
            {
                "areaName": (county(0) if key == "per_county" else str(75000 + int(rng.integers(0, 900)))),
                "customersAffected": int(rng.integers(0, 3) * rng.integers(0, 120)),
                "customersServed": int(rng.integers(200, 30000)),
                "lastUpdatedTime": base_ms + int(rng.integers(0, 10**6)) * 1000,
            }
            for _ in range(n)
        ]
        return json.dumps(out).encode()

    if layout == "tx_envelope":
        feats = [
            {
                "attributes": {
                    "OBJECTID": int(rng.integers(1, 10**6)),
                    "BEGINTIME": 1_696_200_000_000 + int(rng.integers(0, 10**6)) * 1000,
                    "ESTIMATEDTIMERESTORATION": 1_697_200_000_000 + int(rng.integers(0, 10**6)) * 1000,
                    "CUSTOMERSAFFECTED": int(rng.integers(1, 500)),
                    "CAUSE": _CAUSES[int(rng.integers(0, len(_CAUSES)))],
                },
                "geometry": {
                    "x": round(-99 + 4 * rng.random(), 6),
                    "y": round(29 + 5 * rng.random(), 6),
                },
            }
            for _ in range(n)
        ]
        payload = json.dumps({"features": feats})
        if rng.random() < 0.3:
            payload = f"esricb({payload});"
        return payload.encode()

    if layout == "il_numoutages":
        out = [
            {
                "Name": (county(0).title() if key != "per_metro" else f"Metro-{int(rng.integers(1, 40))}"),
                "NumOutages": int(rng.integers(0, 3) * rng.integers(0, 9)),
                "NumCustomersAffected": int(rng.integers(0, 600)),
            }
            for _ in range(n)
        ]
        return json.dumps(out).encode()

    if layout == "il_areasummary":
        def _areas(prefix):
            m = int(rng.integers(0, max(1, n)))
            return [
                {
                    "Name": f"{prefix}-{int(rng.integers(1, 200))}",
                    "Out": int(rng.integers(0, 3) * rng.integers(0, 50)),
                    "Served": int(rng.integers(100, 20000)),
                }
                for _ in range(m)
            ]
        return json.dumps(
            {
                "zipCodeAreas": _areas("z"),
                "countyAreas": _areas("c"),
                "districtAreas": _areas("d"),
            }
        ).encode()

    if layout == "fl_pretag7":
        rows = [
            {
                "OBJECTID": int(rng.integers(1, 10**5)),
                "PHASE": int(rng.integers(1, 4)),
                "CUSTOMERS": int(rng.integers(1, 300)),
                "OUTAGETIME": f"2023-10-0{int(rng.integers(1, 9))} 0{int(rng.integers(0, 9))}:30:00",
            }
            for _ in range(n)
        ]
        return json.dumps({"returndata": rows}).encode()

    if layout == "fl_pretag8":
        rows = [
            {
                "id": int(rng.integers(1, 10**5)),
                "numCustomers": int(rng.integers(1, 250)),
                "startTime": f"2023-10-0{int(rng.integers(1, 9))}T0{int(rng.integers(0, 9))}:15:00",
                "cause": _CAUSES[int(rng.integers(0, len(_CAUSES)))],
            }
            for _ in range(n)
        ]
        return json.dumps(rows).encode()

    if layout == "ga_arcgis10":
        feats = [
            {
                "attributes": {
                    "OBJECTID": int(rng.integers(1, 10**6)),
                    "County_Nam": county(0).title(),
                    "CONT_SUM": str(int(rng.integers(0, 3) * rng.integers(0, 90))),
                }
            }
            for _ in range(n)
        ]
        return json.dumps({"features": feats}).encode()

    if layout == "la_plainjson":
        rows = [
            {
                "outageId": int(rng.integers(1, 10**6)),
                "numCustomersAffected": int(rng.integers(0, 400)),
                "cause": _CAUSES[int(rng.integers(0, len(_CAUSES)))],
                "startTime": f"2023-10-0{int(rng.integers(1, 9))}T1{int(rng.integers(0, 9))}:00:00",
            }
            for _ in range(n)
        ]
        return json.dumps(rows).encode()

    if layout == "tn_reportlevels":
        hdr = "<tr><th></th><th>Area</th><th>Aff</th><th>Served</th></tr>"
        rows_html = []
        for _ in range(n):
            if rng.random() < 0.15:  # short row -> dropna victim
                rows_html.append(
                    f"<tr><td>+</td><td>{county(0).title()}</td>"
                    f"<td>{int(rng.integers(0, 60))}</td></tr>"
                )
            else:
                rows_html.append(
                    f"<tr><td>+</td><td>{county(0).title()}</td>"
                    f"<td>{int(rng.integers(0, 3) * rng.integers(0, 60))}</td>"
                    f"<td>{int(rng.integers(200, 9000))}</td></tr>"
                )
        return (
            f"<html><body><table id=\"reportTable\">{hdr}{''.join(rows_html)}</table></body></html>"
        ).encode()

    raise ValueError(f"unknown layout family: {layout}")


def synth_pous(n_groups: int = 12, n_rows: int = 40, seed: int = 42):
    """Deterministic POUS-style CustomersOut series (FIXTURES.md F5):
    plateaus, ramps crossing / not crossing thresholds, zero-returns (group
    breaks, step1_threshold.py:23-24) and duplicate (keys, RecordDateTime)
    rows with differing CustomersOut to exercise the idxmin dedup
    (step1_threshold.py:385-388). Returns a pandas DataFrame."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    utilities = ["GVEC", "NGEMC", "SCE"]
    counties = ["GONZALES", "WILSON", "KERN", "FRESNO"]
    rows = []
    base = 1_690_000_000
    for gi in range(n_groups):
        util = utilities[gi % len(utilities)]
        county = counties[(gi // len(utilities)) % len(counties)]
        city = f"CITY{gi % 5}"
        tracked = int(rng.integers(5_000, 60_000))
        fips = str(48000 + gi)
        t = base + gi * 100_000
        out = 0
        for _ in range(n_rows):
            t += int(rng.integers(1, 4)) * 900  # 15-min-ish cadence
            move = rng.random()
            if move < 0.15:
                out = 0  # zero return -> session break
            elif move < 0.45:
                out += int(rng.integers(0, max(2, out // 10 + 2)))  # small drift
            elif move < 0.7:
                out += int(rng.integers(50, 400))  # big jump (case B)
            else:
                out = max(0, out - int(rng.integers(40, 300)))  # big drop (case D)
            rows.append(
                {
                    "UtilityName": util,
                    "StateName": "Texas",
                    "CountyName": county,
                    "CityName": city,
                    "CountyFIPS": fips,
                    "CustomersTracked": tracked,
                    "CustomersOut": int(out),
                    "RecordDateTime": pd.Timestamp(t, unit="s"),
                }
            )
            if rng.random() < 0.07:  # duplicate timestamp, different value
                rows.append({**rows[-1], "CustomersOut": int(out) + int(rng.integers(1, 30))})
    return pd.DataFrame(rows)


class SyntheticWeb:
    """The fixture 'internet': deterministic fetches, no network, no state."""

    def __init__(self, seed: int = 42, max_rows: int = 8, failure_rate: float = 0.02):
        self.seed = seed
        self.max_rows = max_rows
        self.failure_rate = failure_rate

    def fetch(self, url: str, layout: str) -> dict[str, bytes]:
        """All sub-request bodies for one frontier row, keyed like the
        reference's raw_data dict (ga_scraper.py:41-51).
        Raises RuntimeError on injected failure."""
        reason = failure_for(url, self.seed, self.failure_rate)
        if reason is not None:
            raise RuntimeError(reason)
        out = {}
        for key, sub in fetch_plan(url, layout):
            out[key] = synth_body(sub, layout, key, self.seed, self.max_rows)
        return out
