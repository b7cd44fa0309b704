"""TRUE reference-equality test for parse kernels (JSON families).

The reference scrapers import selenium / seleniumwire / geopy / boto3 /
xmltodict / bs4 at module scope but several parse() bodies are pure
pandas-over-JSON. We inject stub modules for the unavailable dependencies,
import the REAL app/scrapers/ga_scraper.py from the read-only checkout,
monkeypatch the I/O edges (fetch -> our synthetic payloads, timenow -> the
fixed virtual timestamp, extract_zipcode -> the deterministic synth
geocoder used on both sides), and require our kernels' span records to
equal the reference parse() DataFrames row for row.

Covered: Scraper1 (nisc dual-JSON), Scraper2 (weboutageviewer),
Scraper4 (kubra area report processing). Skipped if the checkout is absent.
"""

import json
import os
import sys
import types

import pandas as pd
import pytest

from outage_data_scraper_ray.kernels import KERNELS
from outage_data_scraper_ray.kernels.common import synth_zipcode
from outage_data_scraper_ray.stages.fetch import VIRTUAL_SCRAPE_TS
from outage_data_scraper_ray.synth import (
    SyntheticWeb,
    child_urls_for,
    fetch_plan,
    make_seed_registry,
)

REF_APP = "/root/reference/app"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_APP), reason="reference checkout not available"
)


def _stub(name: str, **attrs) -> types.ModuleType:
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ga_scraper():
    # stub the unavailable heavy deps the module imports but the JSON parse
    # paths never touch
    _stub("geopy", Nominatim=lambda **kw: object())
    _stub("xmltodict", parse=lambda *a, **k: {})
    _stub("bs4", BeautifulSoup=object)
    _stub("boto3", client=lambda *a, **k: None, resource=lambda *a, **k: None)
    selenium = _stub("selenium")
    webdriver_pkg = _stub("selenium.webdriver")
    common = _stub("selenium.webdriver.common")
    _stub("selenium.webdriver.common.desired_capabilities", DesiredCapabilities=object)
    _stub("selenium.webdriver.common.by", By=object)
    support = _stub("selenium.webdriver.support")
    _stub(
        "selenium.webdriver.support.ui",
        Select=object,
        WebDriverWait=lambda *a, **k: None,
    )
    _stub("selenium.webdriver.support.expected_conditions")
    _stub(
        "selenium.common.exceptions",
        TimeoutException=type("TimeoutException", (Exception,), {}),
        NoSuchElementException=type("NoSuchElementException", (Exception,), {}),
        WebDriverException=type("WebDriverException", (Exception,), {}),
        StaleElementReferenceException=type("StaleElementReferenceException", (Exception,), {}),
        ElementClickInterceptedException=type("ElementClickInterceptedException", (Exception,), {}),
    )
    _stub("selenium.common")
    sys.modules["selenium.webdriver.support"].expected_conditions = sys.modules[
        "selenium.webdriver.support.expected_conditions"
    ]
    _stub(
        "seleniumwire",
        webdriver=types.SimpleNamespace(ChromeOptions=object, Chrome=object),
    )
    _stub("seleniumwire.utils", decode=lambda body, enc: body)

    sys.path.insert(0, REF_APP)
    try:
        import importlib

        mod = importlib.import_module("scrapers.ga_scraper")
    finally:
        sys.path.remove(REF_APP)

    # deterministic I/O edges, identical to what the kernels use
    mod.timenow = lambda: VIRTUAL_SCRAPE_TS
    mod.BaseScraper.init_webdriver = lambda self: None
    mod.BaseScraper.extract_zipcode = lambda self, lat, lon: synth_zipcode(lat, lon)
    return mod


def _df_to_records(df: pd.DataFrame) -> list[str]:
    import math

    out = []
    for _, row in df.iterrows():
        rec = {}
        for k, v in row.items():
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float) and math.isnan(v):
                v = None
            rec[k] = v
        out.append(json.dumps(rec, separators=(",", ":"), default=str))
    return out


def _seed_for(family: str):
    seeds = make_seed_registry(600, 42).to_pylist()
    return next(s for s in seeds if s["layout"] == family)


def test_scraper1_nisc_matches_reference(ga_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("nisc")
    bodies = web.fetch(row["url"], "nisc")
    payload = {
        "per_county": json.loads(bodies["per_county"]),
        "per_outage": json.loads(bodies["per_outage"]),
    }
    sc = ga_scraper.Scraper1.__new__(ga_scraper.Scraper1)
    ga_scraper.BaseScraper.__init__(sc, row["url"], row["emc"])
    sc.fetch = lambda: {k: json.loads(v) for k, v in bodies.items()}
    ref = sc.parse()

    want = _df_to_records(ref["per_county"]) + _df_to_records(ref["per_outage"])
    got, _ = KERNELS["nisc"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_scraper2_wov_matches_reference(ga_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("wov")
    bodies = web.fetch(row["url"], "wov")
    sc = ga_scraper.Scraper2(row["url"], row["emc"])
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["wov"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_scraper4_kubra_area_matches_reference(ga_scraper):
    """Scraper4.parse processes {level: {areas: [...]}} dicts — feed it one
    synthetic kubra report's areas and compare with our kubra_report kernel
    on the same report."""
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("kubra")
    child = next(
        cu for cu in child_urls_for(row["url"], "kubra", 42) if "/county/" in cu
    )
    bodies = web.fetch(child, "kubra_report")
    report = json.loads(bodies["report"])

    sc = ga_scraper.Scraper4.__new__(ga_scraper.Scraper4)
    ga_scraper.BaseScraper.__init__(sc, row["url"], row["emc"])
    sc.driver = types.SimpleNamespace(close=lambda: None, quit=lambda: None)
    sc.fetch = lambda: {"per_county": report["file_data"]}
    ref = sc.parse()
    want = _df_to_records(ref["per_county"])
    got, _ = KERNELS["kubra_report"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, child)
    assert [s["text"] for s in got] == want


def test_scraper11_shellout_matches_reference(ga_scraper):
    """Scraper11 (full ShellOut triple incl. the last-area-wins quirk and
    the two-column substation filter) vs our shellout11 kernel."""
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("shellout11")
    bodies = web.fetch(row["url"], "shellout11")
    payload = {k: json.loads(v) for k, v in bodies.items()}

    sc = ga_scraper.Scraper11.__new__(ga_scraper.Scraper11)
    ga_scraper.BaseScraper.__init__(sc, row["url"], row["emc"])
    sc.driver = types.SimpleNamespace(close=lambda: None, quit=lambda: None)
    sc.fetch = lambda: dict(payload)
    ref = sc.parse()

    want = (
        _df_to_records(ref["per_substation"])
        + _df_to_records(ref["per_county"])
        + _df_to_records(ref["per_outage"])
    )
    got, _ = KERNELS["shellout11"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_scraper5_epochms_matches_reference(ga_scraper):
    """Scraper5 (epoch-ms list): column order [..., timestamp, EMC, zip_code]
    and in-place ms->datetime conversion."""
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("epochms")
    bodies = web.fetch(row["url"], "epochms")
    sc = ga_scraper.Scraper5(row["url"], row["emc"])
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["epochms"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_scraper6_polygons_matches_reference(ga_scraper):
    """Scraper6 (reportData polygons + outageData outages): EMC added BEFORE
    timestamp, affected>0 filter, per_outage tail."""
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("polygons")
    bodies = web.fetch(row["url"], "polygons")
    sc = ga_scraper.Scraper6(row["url"], row["emc"])
    sc.fetch = lambda: {"payload": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = (
        _df_to_records(ref["per_county"])
        + _df_to_records(ref["per_zipcode"])
        + _df_to_records(ref["per_outage"])
    )
    got, _ = KERNELS["polygons"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def _mini_xmltodict(body):
    """Functional xmltodict.parse stand-in (repeated tags -> list, single ->
    dict, leaves -> text), sufficient for the asmx payload shapes."""
    import xml.etree.ElementTree as ET

    def conv(el):
        kids = list(el)
        if not kids:
            return el.text
        d = {}
        for k in kids:
            v = conv(k)
            if k.tag in d:
                if not isinstance(d[k.tag], list):
                    d[k.tag] = [d[k.tag]]
                d[k.tag].append(v)
            else:
                d[k.tag] = v
        return d

    if isinstance(body, bytes):
        body = body.decode("utf8")
    root = ET.fromstring(body)
    return {root.tag: conv(root)}


def test_scraper3_asmx_matches_reference(ga_scraper):
    """Scraper3 (asmx XML services) with a functional xmltodict stub: the
    CustomersAffected != '0' string filter and Shape drop."""
    ga_scraper.xmltodict.parse = _mini_xmltodict
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    # pick a seed whose payloads have >= 2 counties and >= 2 outages (a
    # single repeated tag degrades to a dict, which crashes the reference
    # DataFrame call — out of scope)
    seeds = [s for s in make_seed_registry(600, 42).to_pylist() if s["layout"] == "asmx"]
    for row in seeds:
        bodies = web.fetch(row["url"], "asmx")
        outages = _mini_xmltodict(bodies["per_outage"])["MobileOutageInfo"]["Outages"]
        counties = _mini_xmltodict(bodies["per_county"])["ArrayOfMobileCounty"]["MobileCounty"]
        if (
            isinstance(outages, dict)
            and isinstance(outages.get("MobileOutage"), list)
            and isinstance(counties, list)
        ):
            break
    else:
        pytest.skip("no asmx seed with multi-row payloads")

    sc = ga_scraper.Scraper3(row["url"], row["emc"])

    def _fetch():
        raw = {}
        raw["per_county"] = counties
        raw["per_outage"] = outages
        return raw

    sc.fetch = _fetch
    ref = sc.parse()
    want = _df_to_records(ref["per_county"]) + _df_to_records(ref["per_outage"])
    got, _ = KERNELS["asmx"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


@pytest.fixture(scope="module")
def fl_scraper(ga_scraper):
    """fl_scraper shares ga_scraper's stubbed import environment."""
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        mod = importlib.import_module("scrapers.fl_scraper")
    finally:
        sys.path.remove(REF_APP)
    mod.timenow = lambda: VIRTUAL_SCRAPE_TS
    return mod


def _fl_instance(fl_scraper, cls_name, row):
    import types as _types

    cls = getattr(fl_scraper, cls_name)
    sc = cls.__new__(cls)
    fl_scraper.BaseScraper.__init__(sc, row["url"], row["emc"])
    sc.driver = types.SimpleNamespace(close=lambda: None, quit=lambda: None)
    return sc


def test_fl_scraper1_prejson_matches_reference(fl_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("prejson")
    bodies = web.fetch(row["url"], "prejson")
    sc = _fl_instance(fl_scraper, "Scraper1", row)
    sc.fetch = lambda: {"per_county": json.loads(bodies["per_county"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_county"])
    got, _ = KERNELS["prejson"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_fl_scraper2_summarytotals_matches_reference(fl_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("summarytotals")
    bodies = web.fetch(row["url"], "summarytotals")
    sc = _fl_instance(fl_scraper, "Scraper2", row)
    sc.fetch = lambda: {"per_city": json.loads(bodies["per_city"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_city"])
    got, _ = KERNELS["summarytotals"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_fl_scraper3_prejson_list_matches_reference(fl_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("prejson_list")
    bodies = web.fetch(row["url"], "prejson_list")
    sc = _fl_instance(fl_scraper, "Scraper3", row)
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["prejson_list"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_fl_scraper5_eshits_matches_reference(fl_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("eshits")
    bodies = web.fetch(row["url"], "eshits")
    sc = _fl_instance(fl_scraper, "Scraper5", row)
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["eshits"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


@pytest.fixture(scope="module")
def tn_scraper(ga_scraper):
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        mod = importlib.import_module("scrapers.tn_scraper")
    finally:
        sys.path.remove(REF_APP)
    mod.timenow = lambda: VIRTUAL_SCRAPE_TS
    return mod


def test_tn_scraper5_incidents_matches_reference(tn_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("incidents")
    bodies = web.fetch(row["url"], "incidents")
    val = json.loads(bodies["incidents"])
    sc = tn_scraper.Scraper5.__new__(tn_scraper.Scraper5)
    tn_scraper.BaseScraper.__init__(sc, row["url"], row["emc"])
    sc.driver = types.SimpleNamespace(close=lambda: None, quit=lambda: None)
    sc.fetch = lambda: {
        "per_district": val["district_metrics"],
        "per_outage": val["outage_points"],
    }
    ref = sc.parse()
    want = _df_to_records(ref["per_district"]) + _df_to_records(ref["per_outage"])
    got, _ = KERNELS["incidents"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_tn_scraper7_outagedetails_matches_reference(tn_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("outagedetails")
    bodies = web.fetch(row["url"], "outagedetails")
    det = json.loads(bodies["per_outage"])["electricOutageDetails"]
    sc = tn_scraper.Scraper7.__new__(tn_scraper.Scraper7)
    tn_scraper.BaseScraper.__init__(sc, row["url"], row["emc"])
    sc.driver = types.SimpleNamespace(close=lambda: None, quit=lambda: None)
    sc.fetch = lambda: {"per_outage": det}
    ref = sc.parse()
    want = (
        _df_to_records(ref["per_outage"])
        + _df_to_records(ref["per_county"])
        + _df_to_records(ref["per_zipcode"])
    )
    got, _ = KERNELS["outagedetails"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_la_scraper3_alloutages_matches_reference(ga_scraper):
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        la = importlib.import_module("scrapers.la_scraper")
    finally:
        sys.path.remove(REF_APP)
    la.timenow = lambda: VIRTUAL_SCRAPE_TS
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("alloutages")
    bodies = web.fetch(row["url"], "alloutages")
    sc = la.Scraper3.__new__(la.Scraper3)
    la.BaseScraper.__init__(sc, row["url"], row["emc"])
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["alloutages"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_ms_scraper10_singlevalue_matches_reference(ga_scraper):
    import re as _re

    sys.path.insert(0, REF_APP)
    try:
        import importlib

        ms = importlib.import_module("scrapers.ms_scraper")
    finally:
        sys.path.remove(REF_APP)
    ms.timenow = lambda: VIRTUAL_SCRAPE_TS
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("singlevalue")
    bodies = web.fetch(row["url"], "singlevalue")
    html = bodies["per_emc"].decode()
    raw = {
        "currentOutages": _re.search(r'id="currentOutages">([^<]*)<', html).group(1),
        "lastUpdated": _re.search(r'id="lastUpdated">([^<]*)<', html).group(1),
    }
    sc = ms.Scraper10.__new__(ms.Scraper10)
    ms.BaseScraper.__init__(sc, row["url"], row["emc"])
    sc.fetch = lambda: dict(raw)
    ref = sc.parse()
    want = _df_to_records(ref["per_emc"])
    got, _ = KERNELS["singlevalue"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_ca_scraperinv_arcgis_matches_reference(ga_scraper):
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        ca = importlib.import_module("scrapers.ca_scraper")
    finally:
        sys.path.remove(REF_APP)
    ca.timenow = lambda: VIRTUAL_SCRAPE_TS
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    # pick an arcgis seed whose payload is NOT JSONP-wrapped (the wrapper is
    # the tx sniffing variant; ScraperINV consumes plain JSON)
    seeds = [s for s in make_seed_registry(600, 42).to_pylist() if s["layout"] == "arcgis"]
    for row in seeds:
        bodies = web.fetch(row["url"], "arcgis")
        if bodies["per_outage"].lstrip()[:1] == b"{":
            break
    else:
        pytest.skip("no plain-JSON arcgis seed")
    sc = ca.ScraperINV(row["url"], row["emc"])
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["arcgis"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_fl_scraper13_regionsets_matches_reference(fl_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("regionsets")
    bodies = web.fetch(row["url"], "regionsets")
    raw_json = json.loads(bodies["per_region"])
    raw = {"per_" + s["id"]: s["regions"] for s in raw_json["regionDataSets"]}
    sc = _fl_instance(fl_scraper, "Scraper13", row)
    sc.fetch = lambda: dict(raw)
    ref = sc.parse()
    want = []
    for s in raw_json["regionDataSets"]:
        want += _df_to_records(ref["per_" + s["id"]])
    got, _ = KERNELS["regionsets"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_il_scraper1_kubra_nested_matches_reference(ga_scraper):
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        il = importlib.import_module("scrapers.il_scraper")
    finally:
        sys.path.remove(REF_APP)
    il.timenow = lambda: VIRTUAL_SCRAPE_TS
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("kubra_nested")
    bodies = web.fetch(row["url"], "kubra_nested")
    raw = {
        key: json.loads(bodies[key])["file_data"]["areas"][0]["areas"]
        for key in ("per_county", "per_zipcode")
    }
    sc = il.Scraper1.__new__(il.Scraper1)
    il.BaseScraper.__init__(sc, row["url"], row["emc"])
    sc.driver = types.SimpleNamespace(close=lambda: None, quit=lambda: None)
    sc.fetch = lambda: {k: [dict(v) for v in vs] for k, vs in raw.items()}
    ref = sc.parse()
    want = _df_to_records(ref["per_county"]) + _df_to_records(ref["per_zipcode"])
    got, _ = KERNELS["kubra_nested"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


@pytest.fixture(scope="module")
def tx_scraper(ga_scraper):
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        mod = importlib.import_module("scrapers.tx_scraper")
    finally:
        sys.path.remove(REF_APP)
    mod.timenow = lambda: VIRTUAL_SCRAPE_TS
    return mod


def test_tx_scraper10_outagelst_matches_reference(tx_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("outagelst")
    bodies = web.fetch(row["url"], "outagelst")
    sc = tx_scraper.Scraper10(row["url"], row["emc"])
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["outagelst"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_tx_scraper18_affectedcount_matches_reference(tx_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("affectedcount")
    bodies = web.fetch(row["url"], "affectedcount")
    sc = tx_scraper.Scraper18(row["url"], row["emc"])
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["affectedcount"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_tx_scraper7_dtable_matches_reference(tx_scraper):
    """Scraper7.parse is fused with its selenium fetch; replicate its exact
    post-fetch pandas body (json.loads(d)["Table"] -> DataFrame -> stamp ->
    dropna) and compare — with the wall-clock Timestamp.now() pinned to the
    virtual scrape timestamp on both sides."""
    import pandas as _pd

    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("dtable")
    bodies = web.fetch(row["url"], "dtable")
    val = json.loads(bodies["per_outage"])
    df = _pd.DataFrame(json.loads(val["d"])["Table"])
    df["timestamp"] = VIRTUAL_SCRAPE_TS  # in place of pd.Timestamp.now()
    df["EMC"] = row["emc"]
    df = df.dropna()
    want = _df_to_records(df)
    got, _ = KERNELS["dtable"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


# ---------------------------------------------------------------------------
# NY family (ny_scraper.py:33-313)

@pytest.fixture(scope="module")
def ny_scraper(ga_scraper):
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        mod = importlib.import_module("scrapers.ny_scraper")
    finally:
        sys.path.remove(REF_APP)
    mod.timenow = lambda: VIRTUAL_SCRAPE_TS
    return mod


def _inst(mod, cls_name, row):
    cls = getattr(mod, cls_name)
    sc = cls.__new__(cls)
    mod.BaseScraper.__init__(sc, row["url"], row["emc"])
    sc.driver = types.SimpleNamespace(close=lambda: None, quit=lambda: None)
    return sc


def test_ny_scraper1_report_matches_reference(ny_scraper):
    """NY Scraper1 (ny_scraper.py:33-153): nested report groups, conditional
    cust_a {val} unwrap, cust_a != 0 filter."""
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("ny_report")
    bodies = web.fetch(row["url"], "ny_report")
    sc = _inst(ny_scraper, "Scraper1", row)
    sc.fetch = lambda: {
        k: json.loads(v)["file_data"]["areas"][0]["areas"] for k, v in bodies.items()
    }
    ref = sc.parse()
    want = []
    for k in bodies:
        want += _df_to_records(ref[k])
    got, _ = KERNELS["ny_report"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_ny_scraper2_kubra_val_matches_reference(ny_scraper):
    """NY Scraper2 (ny_scraper.py:155-226): cust_a+percent_cust_a unwrap,
    (cust_a != 0)|(n_out != 0), gotoMap drop, per_town/per_county keys."""
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("ny_kubra_val")
    bodies = web.fetch(row["url"], "ny_kubra_val")
    sc = _inst(ny_scraper, "Scraper2", row)
    sc.fetch = lambda: {k: json.loads(v)["file_data"] for k, v in bodies.items()}
    ref = sc.parse()
    want = []
    for k in bodies:
        want += _df_to_records(ref[k])
    got, _ = KERNELS["ny_kubra_val"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_ny_scraper3_iframe_matches_reference(ny_scraper):
    """NY Scraper3 (ny_scraper.py:228-313): the pandas tail (plain DataFrame,
    no filter, ts+EMC) over the per_county + concatenated per_town row lists.
    The DOM/iframe extraction itself is selenium+bs4 (modeled as the S10
    multi-step fetch); the tr[1:-1] trim is exercised via the shared row
    reader on both sides."""
    from outage_data_scraper_ray.kernels import _table_rows_trimmed

    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("ny_iframe")
    bodies = web.fetch(row["url"], "ny_iframe")
    county_rows = _table_rows_trimmed(bodies["per_county"].decode())
    town_rows = []
    for k, v in bodies.items():
        if k.startswith("town_"):
            town_rows += _table_rows_trimmed(v.decode())
    sc = _inst(ny_scraper, "Scraper3", row)
    sc.fetch = lambda: {"per_county": county_rows, "per_town": town_rows}
    ref = sc.parse()
    want = _df_to_records(ref["per_county"]) + _df_to_records(ref["per_town"])
    got, _ = KERNELS["ny_iframe"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


# ---------------------------------------------------------------------------
# Duke click-path family (fl Scraper9 / nc Scraper6 / nc Scraper7)

@pytest.fixture(scope="module")
def nc_scraper(ga_scraper):
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        mod = importlib.import_module("scrapers.nc_scraper")
    finally:
        sys.path.remove(REF_APP)
    mod.timenow = lambda: VIRTUAL_SCRAPE_TS
    return mod


def test_fl_scraper9_duke_matches_reference(fl_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("duke")
    bodies = web.fetch(row["url"], "duke")
    sc = _fl_instance(fl_scraper, "Scraper9", row)
    sc.fetch = lambda: {"per_county": json.loads(bodies["per_county"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_county"])
    got, _ = KERNELS["duke"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want
    assert len(want) > 0  # the string-vs-int filter is a no-op (ref quirk)


def test_nc_scraper6_duke_matches_reference(nc_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("duke")
    bodies = web.fetch(row["url"], "duke")
    sc = _inst(nc_scraper, "Scraper6", row)
    sc.fetch = lambda: {"per_county": json.loads(bodies["per_county"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_county"])
    got, _ = KERNELS["duke"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_nc_scraper7_treegrid_matches_reference(nc_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("treegrid")
    bodies = web.fetch(row["url"], "treegrid")
    sc = _inst(nc_scraper, "Scraper7", row)
    sc.fetch = lambda: {"per_county": json.loads(bodies["per_county"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_county"])
    got, _ = KERNELS["treegrid"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


# ---------------------------------------------------------------------------
# TX Scraper4 / Scraper5 (tx_scraper.py:84-227)

def test_tx_scraper4_suffixjson_matches_reference(tx_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("tx_suffixjson")
    bodies = web.fetch(row["url"], "tx_suffixjson")
    sc = tx_scraper.Scraper4(row["url"], row["emc"])
    sc.fetch = lambda: {k: json.loads(v) for k, v in bodies.items()}
    ref = sc.parse()
    want = []
    for k in bodies:
        want += _df_to_records(ref[k])
    got, _ = KERNELS["tx_suffixjson"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_tx_scraper5_kubra_sniff_matches_reference(tx_scraper, monkeypatch):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("tx_kubra_sniff")
    bodies = web.fetch(row["url"], "tx_kubra_sniff")
    sc = _inst(tx_scraper, "Scraper5", row)
    sc.fetch = lambda: {k: json.loads(v)["file_data"] for k, v in bodies.items()}
    # Scraper5 stamps pd.Timestamp.now() (tx_scraper.py:133) — pin it
    import pandas as _pd

    class _TS:
        @staticmethod
        def now():
            return VIRTUAL_SCRAPE_TS

    monkeypatch.setattr(tx_scraper.pd, "Timestamp", _TS)
    ref = sc.parse()
    want = []
    for k in bodies:
        want += _df_to_records(ref[k])
    got, _ = KERNELS["tx_kubra_sniff"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


# ---------------------------------------------------------------------------
# IL Scraper2 / Scraper7 / Scraper8 (il_scraper.py:133-328)

@pytest.fixture(scope="module")
def il_scraper(ga_scraper):
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        mod = importlib.import_module("scrapers.il_scraper")
    finally:
        sys.path.remove(REF_APP)
    mod.timenow = lambda: VIRTUAL_SCRAPE_TS
    return mod


def test_il_scraper2_kubra_val_matches_reference(il_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("il_kubra_val")
    bodies = web.fetch(row["url"], "il_kubra_val")
    sc = _inst(il_scraper, "Scraper2", row)
    sc.fetch = lambda: {k: json.loads(v)["file_data"] for k, v in bodies.items()}
    ref = sc.parse()
    want = []
    for k in bodies:
        want += _df_to_records(ref[k])
    got, _ = KERNELS["il_kubra_val"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_il_scraper7_numoutages_matches_reference(il_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("il_numoutages")
    bodies = web.fetch(row["url"], "il_numoutages")
    sc = _inst(il_scraper, "Scraper7", row)
    sc.fetch = lambda: {k: json.loads(v) for k, v in bodies.items()}
    ref = sc.parse()
    want = []
    for k in bodies:
        val = ref[k]
        if isinstance(val, pd.DataFrame):
            want += _df_to_records(val)
        # empty fetch lists stay untouched by the reference (`if val:`)
    got, _ = KERNELS["il_numoutages"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_il_scraper8_areasummary_matches_reference(il_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("il_areasummary")
    bodies = web.fetch(row["url"], "il_areasummary")
    tmp = json.loads(bodies["areasummary"])
    raw = {}
    if tmp["zipCodeAreas"]:
        raw["per_zipcode"] = tmp["zipCodeAreas"]
    if tmp["countyAreas"]:
        raw["per_county"] = tmp["countyAreas"]
    if tmp["districtAreas"]:
        raw["per_district"] = tmp["districtAreas"]
    sc = _inst(il_scraper, "Scraper8", row)
    sc.fetch = lambda: raw
    ref = sc.parse()
    want = []
    for k in raw:
        want += _df_to_records(ref[k])
    got, _ = KERNELS["il_areasummary"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


# ---------------------------------------------------------------------------
# FL Scraper7 / Scraper8 (fl_scraper.py:321-383)

def test_fl_scraper7_pretag_matches_reference(fl_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("fl_pretag7")
    bodies = web.fetch(row["url"], "fl_pretag7")
    sc = _fl_instance(fl_scraper, "Scraper7", row)
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["fl_pretag7"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_fl_scraper8_pretag_matches_reference(fl_scraper):
    """fl Scraper8 calls DataFrame.from_records on the raw fetch DICT — one
    row per outage with the raw record in a single per_outage column."""
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("fl_pretag8")
    bodies = web.fetch(row["url"], "fl_pretag8")
    sc = _fl_instance(fl_scraper, "Scraper8", row)
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["fl_pretag8"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


# ---------------------------------------------------------------------------
# GA Scraper10 (ga_scraper.py:690-742)

def test_ga_scraper10_arcgis_matches_reference(ga_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("ga_arcgis10")
    bodies = web.fetch(row["url"], "ga_arcgis10")
    sc = _inst(ga_scraper, "Scraper10", row)
    sc.fetch = lambda: {"per_county": json.loads(bodies["per_county"])["features"]}
    ref = sc.parse()
    want = _df_to_records(ref["per_county"])
    got, _ = KERNELS["ga_arcgis10"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


# ---------------------------------------------------------------------------
# Inert reference scrapers — proven inert against the real code

def test_ca_scrapercc_is_inert(ga_scraper):
    """ca ScraperCC (ca_scraper.py:66-77) has pass-bodies for parse() and
    fetch(); there is nothing to kernelize — proven here."""
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        ca = importlib.import_module("scrapers.ca_scraper")
    finally:
        sys.path.remove(REF_APP)
    sc = ca.ScraperCC("https://example.invalid", "cc")
    assert sc.parse() is None
    assert sc.fetch() is None


@pytest.fixture(scope="module")
def la_scraper(ga_scraper):
    sys.path.insert(0, REF_APP)
    try:
        import importlib

        mod = importlib.import_module("scrapers.la_scraper")
    finally:
        sys.path.remove(REF_APP)
    mod.timenow = lambda: VIRTUAL_SCRAPE_TS
    return mod


def test_la_scraper6_plainjson_matches_reference(la_scraper):
    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("la_plainjson")
    bodies = web.fetch(row["url"], "la_plainjson")
    sc = _inst(la_scraper, "Scraper6", row)
    sc.fetch = lambda: {"per_outage": json.loads(bodies["per_outage"])}
    ref = sc.parse()
    want = _df_to_records(ref["per_outage"])
    got, _ = KERNELS["la_plainjson"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_tx_scraper3_and_ga_scraper8_are_inert(tx_scraper, ga_scraper):
    """tx Scraper3 (tx_scraper.py:73-82) has pass-bodies; ga Scraper8
    (ga_scraper.py:592-595) defines only __init__ — nothing to kernelize."""
    sc = tx_scraper.Scraper3.__new__(tx_scraper.Scraper3)
    tx_scraper.BaseScraper.__init__(sc, "https://example.invalid", "x")
    assert sc.parse() is None
    assert sc.fetch() is None
    g8 = ga_scraper.Scraper8("https://example.invalid", "x")
    assert not hasattr(ga_scraper.Scraper8, "parse") or \
        ga_scraper.Scraper8.parse is ga_scraper.BaseScraper.parse


# ---------------------------------------------------------------------------
# The three kernels previously covered only by oracle_sim: tx Scraper1
# (report-panel tables), tx Scraper6 (ArcGIS envelope sniff), tn Scraper2
# (multi-level reportTable). Their parse() bodies are fused with
# selenium/seleniumwire/bs4 DOM extraction, so — like the dtable/ny_iframe
# precedents above — these tests execute the reference's exact post-DOM
# pandas tail verbatim (with the wall-clock/timenow pinned to the virtual
# scrape timestamp) over row lists extracted by the shared table reader.

def test_tx_scraper1_report_table_matches_reference(tx_scraper):
    """tx_scraper.py:33-70: rows[2:], hardcoded 5-col header, VIEW dropped
    via column selection, string filter CUSTOMER OUTAGES != '0'."""
    import pandas as _pd

    from outage_data_scraper_ray.kernels.common import parse_html_table

    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("tx_report_table")
    bodies = web.fetch(row["url"], "tx_report_table")
    want = []
    for key, loc in (("per_county", "COUNTY"), ("per_zipcode", "ZIP")):
        _, body_rows = parse_html_table(bodies[key].decode())
        raw_data = body_rows[1:]  # the reference's rows[2:] (two header trs)
        header = ["VIEW", loc, "CUSTOMER OUTAGES", "CUSTOMERS SERVED", "% AFFECTED"]
        table_data = [dict(zip(header, r)) for r in raw_data]
        df = _pd.DataFrame(table_data)[
            [loc, "CUSTOMER OUTAGES", "CUSTOMERS SERVED", "% AFFECTED"]
        ]
        df["timestamp"] = VIRTUAL_SCRAPE_TS  # in place of timenow()
        df["EMC"] = row["emc"]
        df = df[df["CUSTOMER OUTAGES"] != "0"]
        want += _df_to_records(df)
    got, _ = KERNELS["tx_report_table"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert [s["text"] for s in got] == want


def test_tx_scraper6_envelope_matches_reference(tx_scraper):
    """tx_scraper.py:230-289: JSONP strip via index('(')/rindex(')'),
    attributes expand, BEGINTIME/ESTIMATEDTIMERESTORATION unit='ms',
    geometry x/y, pd.Timestamp.now() pinned, NO filter / NO dropna."""
    import pandas as _pd

    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("tx_envelope")
    bodies = web.fetch(row["url"], "tx_envelope")
    data_str = bodies["per_outage"].decode()
    if data_str[0] == "{":
        val = json.loads(data_str)
    else:
        start = data_str.index("(") + 1
        end = data_str.rindex(")")
        val = json.loads(data_str[start:end])
    df = _pd.DataFrame([x["attributes"] for x in val["features"]])
    df["BEGINTIME"] = _pd.to_datetime(df["BEGINTIME"], unit="ms")
    df["ESTIMATEDTIMERESTORATION"] = _pd.to_datetime(
        df["ESTIMATEDTIMERESTORATION"], unit="ms"
    )
    df["x"] = [x["geometry"]["x"] for x in val["features"]]
    df["y"] = [x["geometry"]["y"] for x in val["features"]]
    df["timestamp"] = VIRTUAL_SCRAPE_TS  # in place of pd.Timestamp.now()
    df["EMC"] = row["emc"]
    want = _df_to_records(df)
    got, _ = KERNELS["tx_envelope"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert len(got) > 0
    assert [s["text"] for s in got] == want


def test_tn_scraper2_reportlevels_matches_reference(tn_scraper):
    """tn_scraper.py:38-113 _parse tail per level page: dict(zip(header,
    row)) with blank headers, df[cols] then dropna(axis=0) on short rows,
    timenow + EMC stamp, string filter Aff != '0'; levels with <= 1 column
    collapse to an empty frame."""
    import pandas as _pd

    from outage_data_scraper_ray.kernels.common import parse_html_table

    web = SyntheticWeb(42, max_rows=14, failure_rate=0.0)
    row = _seed_for("tn_reportlevels")
    bodies = web.fetch(row["url"], "tn_reportlevels")
    want = []
    for key, body in bodies.items():
        header, rows = parse_html_table(body.decode())
        cols = [h for h in header if h != ""]
        table = [dict(zip(header, r)) for r in rows]
        df = _pd.DataFrame(table)
        if len(df.columns) > 1:
            df = df[cols]
            df = df.dropna(axis=0)
            df["timestamp"] = VIRTUAL_SCRAPE_TS  # in place of timenow()
            df["EMC"] = row["emc"]
            df = df[df["Aff"] != "0"]
        else:
            df = _pd.DataFrame()
        want += _df_to_records(df)
    got, _ = KERNELS["tn_reportlevels"](bodies, row["emc"], VIRTUAL_SCRAPE_TS, row["url"])
    assert len(got) > 0
    assert [s["text"] for s in got] == want
