"""Parse kernels: pure ``dict[key, bytes] -> (spans, child_urls)`` functions.

One kernel per payload family the reference parses (SURVEY.md section 2.3,
FIXTURES.md section F3). Each re-derives the reference's transform semantics
— nonzero filters (M3), {val:...} unwraps (M4), list-of-struct flattens (M5),
column drops (M6), epoch-ms conversion (M8), keyword classification (M14),
guarded geocode (M15) — from scratch, vectorizable and pandas-free so they
run cheaply inside ``map_batches`` on Arrow batches.

Returned spans follow the interleaved-doc model: one span per normalized
record, kind = the reference's level key (per_outage / per_county / ...),
media spans carry media_ref and empty text.
"""

from __future__ import annotations

import json
from typing import Callable

from .common import (
    ZIP_SENTINEL,
    epoch_ms_to_str,
    finish,
    parse_html_table,
    span,
    strip_jsonp,
    synth_zipcode,
    xml_records,
    zips_for_points,
)

Kernel = Callable[[dict[str, bytes], str, str, str], tuple[list[dict], list[str]]]
# signature: (bodies, emc, ts, url) -> (spans, child_urls)


def parse_nisc(bodies, emc, ts, url):
    """NISC dual-JSON layout (ga_scraper.py:210-266): boundaries flatten +
    nonzero filter; outages with guarded zip extraction."""
    spans, off = [], 0
    cty = json.loads(bodies["per_county"].decode("utf8"))
    for item in cty:
        for b in item["boundaries"]:
            if b["customersAffected"] != 0 or b["customersOutNow"] != 0:
                spans.append(span("per_county", finish(b, ts, emc), off))
                off += 1
    out = json.loads(bodies["per_outage"].decode("utf8"))
    pts = [(o["outagePoint"]["lat"], o["outagePoint"]["lng"]) for o in out]
    zips = zips_for_points(pts)
    for o, z in zip(out, zips):
        rec = dict(o)
        rec["zip"] = z
        spans.append(span("per_outage", finish(rec, ts, emc), off))
        off += 1
    return spans, []


def parse_wov(bodies, emc, ts, url):
    """weboutageviewer JSON (ga_scraper.py:273-297): no filter."""
    val = json.loads(bodies["per_outage"].decode("utf8"))
    spans = []
    for i, o in enumerate(val["Outages"]):
        spans.append(span("per_outage", finish(o, ts, emc), i))
    return spans, []


def parse_asmx(bodies, emc, ts, url):
    """asmx XML services (ga_scraper.py:300-348): CustomersAffected string
    compare != "0" (M3 string variant), Shape column dropped (M6)."""
    spans, off = [], 0
    for rec in xml_records(bodies["per_county"].decode("utf8"), "MobileCounty"):
        if rec.get("CustomersAffected") != "0":
            rec = {k: v for k, v in rec.items() if k != "Shape"}
            spans.append(span("per_county", finish(rec, ts, emc), off))
            off += 1
    for rec in xml_records(bodies["per_outage"].decode("utf8"), "MobileOutage"):
        spans.append(span("per_outage", finish(rec, ts, emc), off))
        off += 1
    return spans, []


_KUBRA_KIND = {
    "zip": "per_zipcode",
    "county": "per_county",
    "city": "per_city",
    "ctv": "per_town",
    "ward": "per_ward",
    "MEDIA": "per_media",
}


def parse_kubra_deck(bodies, emc, ts, url):
    """Kubra stormcenter parent: the discovery fetch. The reference discovers
    report.json URLs by sniffing XHR traffic (ga_scraper.py:405-435,
    il_scraper.py:199-219); here the deck lists them -> child frontier rows."""
    deck = json.loads(bodies["deck"].decode("utf8"))
    return [], list(deck["decks"])


def parse_kubra_report(bodies, emc, ts, url):
    """One kubra report: {val:...} unwrap (M4, ga_scraper.py:362-364),
    nonzero filter cust_a|n_out (M3), drop gotoMap (M6), keyword kind
    classification (M14, ga_scraper.py:417-434). MEDIA reports become pure
    media spans (per_media, ga_scraper.py:432-434)."""
    val = json.loads(bodies["report"].decode("utf8"))
    title = url.rsplit("/reports/", 1)[-1].split("/", 1)[0]
    kind = _KUBRA_KIND.get(title, "per_outage")
    if title == "MEDIA":
        return [span("per_media", None, 0, media_ref=val["tile"])], []
    spans, off = [], 0
    for a in val["file_data"]["areas"]:
        rec = dict(a)
        rec["cust_a"] = rec["cust_a"]["val"]
        rec["percent_cust_a"] = rec["percent_cust_a"]["val"]
        if rec["cust_a"] != 0 or rec["n_out"] != 0:
            rec.pop("gotoMap", None)
            spans.append(span(kind, finish(rec, ts, emc), off))
            off += 1
    return spans, []


def parse_kubra_nested(bodies, emc, ts, url):
    """Nested kubra reports (il Scraper1, il_scraper.py:37-131): the M4
    in-place variant — ONLY cust_a is unwrapped (percent_cust_a stays a
    nested {val} struct), no gotoMap drop, filter only cust_a != 0; rows
    come from concatenating every nested area group."""
    spans, off = [], 0
    for key in ("per_county", "per_zipcode"):
        val = json.loads(bodies[key].decode("utf8"))["file_data"]["areas"][0]["areas"]
        for group in val:
            for row in group["areas"]:
                rec = dict(row)
                if isinstance(rec.get("cust_a"), dict) and "val" in rec["cust_a"]:
                    rec["cust_a"] = rec["cust_a"]["val"]
                if rec["cust_a"] != 0:
                    spans.append(span(key, finish(rec, ts, emc), off))
                    off += 1
    return spans, []


def parse_epochms(bodies, emc, ts, url):
    """Epoch-ms outage list (Scraper5, ga_scraper.py:443-479): ms -> datetime
    strings (M8), guarded zip extraction (M15). Column order follows the
    reference exactly: [...original, timestamp, EMC, zip_code]."""
    out = json.loads(bodies["per_outage"].decode("utf8"))
    pts = [(o["latitude"], o["longitude"]) for o in out]
    zips = zips_for_points(pts)
    spans = []
    for i, (o, z) in enumerate(zip(out, zips)):
        rec = dict(o)
        rec["timestamp"] = ts
        rec["startTime"] = epoch_ms_to_str(rec["startTime"])
        rec["lastUpdatedTime"] = epoch_ms_to_str(rec["lastUpdatedTime"])
        rec["EMC"] = emc
        rec["zip_code"] = z
        spans.append(span("per_outage", rec, i))
    return spans, []


def parse_polygons(bodies, emc, ts, url):
    """reportData polygons + outageData outages (Scraper6,
    ga_scraper.py:486-510; ms_scraper.py:65-74): affected > 0 filter, report
    id -> level classification. The reference appends EMC BEFORE timestamp
    here (ga_scraper.py:494-495) — preserved exactly."""
    val = json.loads(bodies["per_outage"].decode("utf8"))
    spans, off = [], 0

    def _emc_first(rec):
        rec["EMC"] = emc
        rec["timestamp"] = ts
        return rec

    for report in val["reportData"]["reports"]:
        kind = "per_county" if report["id"] == "County" else "per_zipcode"
        for p in report["polygons"]:
            if p["affected"] > 0:
                spans.append(span(kind, _emc_first(dict(p)), off))
                off += 1
    for o in val["outageData"]["outages"]:
        spans.append(span("per_outage", _emc_first(dict(o)), off))
        off += 1
    return spans, []


def parse_shellout(bodies, emc, ts, url):
    """ShellOut markers (ga_scraper.py:518-589): marker rows with outages != 0
    -> per_outage; service-area stats -> one per_emc summary span."""
    val = json.loads(bodies["shellout"].decode("utf8"))
    area = val["areas"]
    spans, off = [], 0
    for m in area["markers"]:
        if m["outages"] != 0:
            spans.append(span("per_outage", finish(dict(m), ts, emc), off))
            off += 1
    summary = {
        "service_index_name": area["service_index_name"],
        "outages": area["outages"],
        "NumConsumers": area["stats"]["NumConsumers"],
    }
    spans.append(span("per_emc", finish(summary, ts, emc), off))
    return spans, []


def parse_shellout11(bodies, emc, ts, url):
    """Full ShellOut triple (Scraper11, ga_scraper.py:742-804):
    per_substation rows.subs with the two-column nonzero filter,
    per_county rows with out != 0, per_outage markers of the LAST area dict
    that has any (the reference overwrites per_outage_df per loop
    iteration), guarded zip extraction, isHighTraffic/updateTime carried
    onto every marker row."""
    spans, off = [], 0
    subs = json.loads(bodies["per_substation"].decode("utf8"))["rows"]["subs"]
    for rec in subs:
        if (
            rec["SubTotalConsumersOut"] != 0
            or rec["SubTotalMetersAffectedByDeviceOutages"] != 0
        ):
            spans.append(span("per_substation", finish(dict(rec), ts, emc), off))
            off += 1
    rows_ = json.loads(bodies["per_county"].decode("utf8"))["rows"]
    for rec in rows_:
        if rec["out"] != 0:
            spans.append(span("per_county", finish(dict(rec), ts, emc), off))
            off += 1
    val = json.loads(bodies["per_outage"].decode("utf8"))
    last = None
    for k, v in val.items():
        if isinstance(v, dict) and v["markers"]:
            last = v
    if last is not None:
        pts = [(m["lat"], m["lon"]) for m in last["markers"]]
        zips = zips_for_points(pts)
        for m, z in zip(last["markers"], zips):
            rec = dict(m)
            rec["service_index_name"] = last["service_index_name"]
            rec["outages"] = last["outages"]
            rec["NumConsumers"] = last["stats"]["NumConsumers"]
            rec["zip_code"] = z
            rec["isHighTraffic"] = val["isHighTraffic"]
            rec["updateTime"] = val["timestamp"]
            spans.append(span("per_outage", finish(rec, ts, emc), off))
            off += 1
    return spans, []


def parse_domtable(bodies, emc, ts, url):
    """DOM HTML table (M11/M16, ga_scraper.py:614-645): blank-header columns
    dropped, rows with empty cells dropped, '# Out' != '0' string filter."""
    header, rows = parse_html_table(bodies["per_county"].decode("utf8"))
    keep = [i for i, h in enumerate(header) if h]
    spans, off = [], 0
    for r in rows:
        if len(r) < len(header) or any(not r[i] for i in keep):
            continue  # dropna (ga_scraper.py:638)
        rec = {header[i]: r[i] for i in keep}
        if rec.get("# Out") == "0":
            continue
        spans.append(span("per_county", finish(rec, ts, emc), off))
        off += 1
    return spans, []


def parse_arcgis(bodies, emc, ts, url):
    """ArcGIS FeatureServer (ca ScraperINV, ca_scraper.py:14-64): JSONP
    strip (M13, the tx variant, tx_scraper.py:258-261), attributes+geometry
    flatten (M5), epoch-ms dates (M8). Faithful to the reference: column
    order [attributes..., x, y, timestamp] and NO EMC column
    (ScraperINV adds only timestamp)."""
    body = strip_jsonp(bodies["per_outage"].decode("utf8"))
    val = json.loads(body)
    spans = []
    for i, f in enumerate(val["features"]):
        rec = dict(f["attributes"])
        rec["x"] = f["geometry"]["x"]
        rec["y"] = f["geometry"]["y"]
        rec["timestamp"] = ts
        for c in ("StartDate", "EstimatedRestoreDate"):
            if c in rec:
                rec[c] = epoch_ms_to_str(rec[c])
        spans.append(span("per_outage", rec, i))
    return spans, []


def parse_prejson(bodies, emc, ts, url):
    """pre-tag JSON (fl Scraper1, fl_scraper.py:29-53): per_county rows with
    the 'Customers Out' != '0' string filter (M3 string variant)."""
    val = json.loads(bodies["per_county"].decode("utf8"))
    spans, off = [], 0
    for o in val["outages"]:
        if o["Customers Out"] != "0":
            spans.append(span("per_county", finish(dict(o), ts, emc), off))
            off += 1
    return spans, []


def parse_summarytotals(bodies, emc, ts, url):
    """Summary totals (M18, fl Scraper2, fl_scraper.py:56-102): one per_city
    row projected+renamed from summaryFileData.totals[0] with the
    total_cust_a {val:...} unwrap."""
    val = json.loads(bodies["per_city"].decode("utf8"))
    sfd = val["summaryFileData"]
    t = sfd["totals"][0]
    rec = {
        "total_customers_served": t["total_cust_s"],
        "total_outages": t["total_outages"],
        "total_customers_affected": t["total_cust_a"]["val"],
        "data_generated": sfd["date_generated"],
    }
    return [span("per_city", finish(rec, ts, emc), 0)], []


def parse_prejson_list(bodies, emc, ts, url):
    """pre-tag JSON list (fl Scraper3, fl_scraper.py:104-158): explicit
    column projection with numPeople -> peopleAffected rename and the
    peopleAffected != 0 int filter."""
    val = json.loads(bodies["per_outage"].decode("utf8"))
    spans, off = [], 0
    for o in val:
        rec = {
            "id": o["id"],
            "createdDate": o["createdDate"],
            "lastUpdated": o["lastUpdated"],
            "startDate": o["startDate"],
            "peopleAffected": o["numPeople"],
            "latitude": o["latitude"],
            "longitude": o["longitude"],
        }
        if rec["peopleAffected"] != 0:
            spans.append(span("per_outage", finish(rec, ts, emc), off))
            off += 1
    return spans, []


def parse_eshits(bodies, emc, ts, url):
    """Elasticsearch hits (fl Scraper5, fl_scraper.py:208-259): every
    sniffed response object contributes hits.hits[*], projected to the
    reference's fixed field subset."""
    val = json.loads(bodies["per_outage"].decode("utf8"))
    spans, off = [], 0
    for obj in val:
        for h in obj["hits"]["hits"]:
            src = h["_source"]
            rec = {
                "id": h["_id"],
                "customerCount": src["customerCount"],
                "estimatedTimeOfRestoration": src["estimatedTimeOfRestoration"],
                "reason": src["reason"],
                "status": src["status"],
                "updateTime": src["updateTime"],
            }
            spans.append(span("per_outage", finish(rec, ts, emc), off))
            off += 1
    return spans, []


def parse_regionsets(bodies, emc, ts, url):
    """regionDataSets (fl Scraper13, fl_scraper.py:488-518): each data set
    becomes its own level key per_<id> (the reference's dynamic key,
    fl_scraper.py:516-518), rows filtered on numberOut != 0."""
    val = json.loads(bodies["per_region"].decode("utf8"))
    spans, off = [], 0
    for s in val["regionDataSets"]:
        kind = "per_" + s["id"]
        for r in s["regions"]:
            if r["numberOut"] != 0:
                spans.append(span(kind, finish(dict(r), ts, emc), off))
                off += 1
    return spans, []


def parse_incidents(bodies, emc, ts, url):
    """TN incidents (tn Scraper5, tn_scraper.py:113-172): district reshape
    (M17) skipping districts without outage_reported, plus raw
    outage_points rows."""
    val = json.loads(bodies["incidents"].decode("utf8"))
    spans, off = [], 0
    for d in val["district_metrics"]:
        if "outage_reported" not in d:
            continue
        rec = {
            "district": d["district"],
            "custom_qty": d["outage_reported"].get("customer_qty", 0),
            "incident_qty": d["outage_reported"].get("incident_qty", 0),
        }
        spans.append(span("per_district", finish(rec, ts, emc), off))
        off += 1
    for o in val["outage_points"]:
        spans.append(span("per_outage", finish(dict(o), ts, emc), off))
        off += 1
    return spans, []


def parse_outagedetails(bodies, emc, ts, url):
    """TN electric-outage-details (tn Scraper7, tn_scraper.py:175-227):
    detail rows + derived per_county / per_zipcode customerCount rollups
    (A3; pandas groupby default sort -> sorted keys)."""
    det = json.loads(bodies["per_outage"].decode("utf8"))["electricOutageDetails"]
    spans, off = [], 0
    for o in det:
        spans.append(span("per_outage", finish(dict(o), ts, emc), off))
        off += 1
    county_sum: dict[str, int] = {}
    zip_sum: dict[str, int] = {}
    for o in det:
        county_sum[o["county"]] = county_sum.get(o["county"], 0) + o["customerCount"]
        zip_sum[o["zipcode"]] = zip_sum.get(o["zipcode"], 0) + o["customerCount"]
    for c in sorted(county_sum):
        spans.append(span("per_county", finish({"county": c, "customerCount": county_sum[c]}, ts, emc), off))
        off += 1
    for z in sorted(zip_sum):
        spans.append(span("per_zipcode", finish({"zipcode": z, "customerCount": zip_sum[z]}, ts, emc), off))
        off += 1
    return spans, []


def parse_alloutages(bodies, emc, ts, url):
    """alloutages (la_scraper.py:40-74): extension / affectedAreas removed."""
    val = json.loads(bodies["per_outage"].decode("utf8"))
    spans = []
    for i, d in enumerate(val["data"]):
        rec = {k: v for k, v in d.items() if k not in ("extension", "affectedAreas")}
        spans.append(span("per_outage", finish(rec, ts, emc), i))
    return spans, []


def parse_dtable(bodies, emc, ts, url):
    """Stringified nested payload (tx Scraper7, tx_scraper.py:288-323):
    json.loads(val["d"])["Table"] -> rows, then pandas-style dropna across
    the union of keys (M16). The reference stamps pd.Timestamp.now(); this
    engine injects the virtual scrape timestamp like every other kernel."""
    val = json.loads(bodies["per_outage"].decode("utf8"))
    rows_ = json.loads(val["d"])["Table"]
    all_keys = []
    for r in rows_:
        for k in r:
            if k not in all_keys:
                all_keys.append(k)
    # a column that is missing anywhere becomes float64 in the reference's
    # DataFrame (NaN promotion) — mirror that for surviving int values
    nan_cols = {k for k in all_keys if any(k not in r for r in rows_)}
    spans, off = [], 0
    for r in rows_:
        if any(k not in r for k in all_keys):  # dropna
            continue
        rec = dict(r)
        for k in nan_cols:
            if isinstance(rec[k], int) and not isinstance(rec[k], bool):
                rec[k] = float(rec[k])
        spans.append(span("per_outage", finish(rec, ts, emc), off))
        off += 1
    return spans, []


def parse_outagelst(bodies, emc, ts, url):
    """outageLst (tx Scraper10, tx_scraper.py:326-343): the UNCONDITIONAL
    per-row geocode variant of M15 (no <10-row guard)."""
    lst = json.loads(bodies["per_outage"].decode("utf8"))["outageLst"]
    spans = []
    for i, o in enumerate(lst):
        rec = dict(o)
        rec["zip"] = synth_zipcode(rec["lat"], rec["lon"])
        spans.append(span("per_outage", finish(rec, ts, emc), i))
    return spans, []


def parse_affectedcount(bodies, emc, ts, url):
    """Plain list with affectedCount != 0 filter (tx Scraper18,
    tx_scraper.py:346-361)."""
    lst = json.loads(bodies["per_outage"].decode("utf8"))
    spans, off = [], 0
    for o in lst:
        if o["affectedCount"] != 0:
            spans.append(span("per_outage", finish(dict(o), ts, emc), off))
            off += 1
    return spans, []


def parse_singlevalue(bodies, emc, ts, url):
    """Single-value DOM scrape (ms Scraper10, ms_scraper.py:85-103): two
    text nodes -> one-row table. NOTE the reference uses lowercase "emc"
    here (the M2 lowercase variant, SURVEY.md M2)."""
    import re

    html = bodies["per_emc"].decode("utf8")
    cur = re.search(r'id="currentOutages">([^<]*)<', html).group(1)
    upd = re.search(r'id="lastUpdated">([^<]*)<', html).group(1)
    rec = {"currentOutages": cur, "lastUpdated": upd, "timestamp": ts, "emc": emc}
    return [span("per_emc", rec, 0)], []


def parse_ny_report(bodies, emc, ts, url):
    """NY report-button family (ny Scraper1, ny_scraper.py:33-153): each
    sniffed report contributes file_data.areas[0].areas — a list of nested
    groups whose rows are concatenated; cust_a unwrapped ONLY when it is a
    {val:...} dict; filter cust_a != 0; no column drops."""
    spans, off = [], 0
    for key, body in bodies.items():
        val = json.loads(body.decode("utf8"))["file_data"]["areas"][0]["areas"]
        for group in val:
            for row in group["areas"]:
                rec = dict(row)
                if "cust_a" in rec and "val" in rec["cust_a"]:
                    rec["cust_a"] = rec["cust_a"]["val"]
                if rec["cust_a"] != 0:
                    spans.append(span(key, finish(rec, ts, emc), off))
                    off += 1
    return spans, []


def parse_kubra_val_levels(bodies, emc, ts, url):
    """Shared kubra {val:...} multi-level parse used verbatim by ny Scraper2
    (ny_scraper.py:160-226), il Scraper2 (il_scraper.py:133-221) and tx
    Scraper5 (tx_scraper.py:117-227): per level, unwrap cust_a AND
    percent_cust_a, filter (cust_a != 0) | (n_out != 0), drop gotoMap.
    The level keys differ per state and come from the fetch plan."""
    spans, off = [], 0
    for key, body in bodies.items():
        val = json.loads(body.decode("utf8"))["file_data"]
        for row in val["areas"]:
            rec = dict(row)
            rec["cust_a"] = rec["cust_a"]["val"]
            rec["percent_cust_a"] = rec["percent_cust_a"]["val"]
            if rec["cust_a"] != 0 or rec["n_out"] != 0:
                rec.pop("gotoMap", None)
                spans.append(span(key, finish(rec, ts, emc), off))
                off += 1
    return spans, []


def _table_rows_trimmed(html: str) -> list[dict[str, str]]:
    """ny Scraper3._fetch semantics (ny_scraper.py:256-276): columns from
    row 0 (th or td), data = rows[1:-1] — the LAST row (totals) is dropped."""
    header, rows = parse_html_table(html)
    return [
        {header[i]: r[i] for i in range(len(header))}
        for r in rows[:-1]
    ]


def parse_ny_iframe(bodies, emc, ts, url):
    """NY iframe DOM-table family (ny Scraper3, ny_scraper.py:229-313):
    per_county table + one table per county's town page concatenated into
    per_town; NO filter; plain timestamp+EMC."""
    spans, off = [], 0
    for rec in _table_rows_trimmed(bodies["per_county"].decode("utf8")):
        spans.append(span("per_county", finish(rec, ts, emc), off))
        off += 1
    for key, body in bodies.items():
        if not key.startswith("town_"):
            continue
        for rec in _table_rows_trimmed(body.decode("utf8")):
            spans.append(span("per_town", finish(rec, ts, emc), off))
            off += 1
    return spans, []


def parse_duke(bodies, emc, ts, url):
    """Duke Energy outage-summary click path (fl Scraper9,
    fl_scraper.py:357-485; nc Scraper6, nc_scraper.py:23-148): the modeled
    S10 multi-step fetch yields the summary table as column lists. The
    reference filters `Number of Outages != 0` against the INT zero while
    the cells are strings — a faithful no-op preserved here."""
    cols = json.loads(bodies["per_county"].decode("utf8"))
    spans, off = [], 0
    names = list(cols.keys())
    for vals in zip(*cols.values()):
        rec = dict(zip(names, vals))
        if rec["Number of Outages"] != 0:  # str != int: always true (ref quirk)
            spans.append(span("per_county", finish(rec, ts, emc), off))
            off += 1
    return spans, []


def parse_treegrid(bodies, emc, ts, url):
    """Duke treegrid summary (nc Scraper7, nc_scraper.py:151-259):
    area_name/cust_a/cust_s column lists, STRING filter cust_a != "0"."""
    cols = json.loads(bodies["per_county"].decode("utf8"))
    spans, off = [], 0
    names = list(cols.keys())
    for vals in zip(*cols.values()):
        rec = dict(zip(names, vals))
        if rec["cust_a"] != "0":
            spans.append(span("per_county", finish(rec, ts, emc), off))
            off += 1
    return spans, []


def parse_tx_report_table(bodies, emc, ts, url):
    """Oncor-style report-panel tables (tx Scraper1, tx_scraper.py:33-70):
    two suffixed pages (county/zip), rows[2:], hardcoded 5-column header,
    VIEW column dropped, string filter CUSTOMER OUTAGES != "0"."""
    spans, off = [], 0
    for key, loc in (("per_county", "COUNTY"), ("per_zipcode", "ZIP")):
        header = ["VIEW", loc, "CUSTOMER OUTAGES", "CUSTOMERS SERVED", "% AFFECTED"]
        _, rows = parse_html_table(bodies[key].decode("utf8"))
        for r in rows[1:]:  # reference slices tr[2:]: two header rows
            rec = dict(zip(header, r))
            rec.pop("VIEW", None)
            if rec["CUSTOMER OUTAGES"] != "0":
                spans.append(span(key, finish(rec, ts, emc), off))
                off += 1
    return spans, []


def parse_tx_suffixjson(bodies, emc, ts, url):
    """Suffixed zip/county JSON (tx Scraper4, tx_scraper.py:84-114):
    customersAffected != 0 int filter, lastUpdatedTime epoch-ms -> datetime
    in place."""
    spans, off = [], 0
    for key, body in bodies.items():
        for o in json.loads(body.decode("utf8")):
            if o["customersAffected"] != 0:
                rec = dict(o)
                rec["lastUpdatedTime"] = epoch_ms_to_str(rec["lastUpdatedTime"])
                spans.append(span(key, finish(rec, ts, emc), off))
                off += 1
    return spans, []


def parse_tx_envelope(bodies, emc, ts, url):
    """TX ArcGIS envelope sniff (tx Scraper6, tx_scraper.py:230-289): JSONP
    strip, attributes flatten, BEGINTIME / ESTIMATEDTIMERESTORATION epoch-ms
    -> datetime, x/y from geometry, no filter / no dropna (commented out in
    the reference)."""
    body = strip_jsonp(bodies["per_outage"].decode("utf8"))
    val = json.loads(body)
    spans = []
    for i, f in enumerate(val["features"]):
        rec = dict(f["attributes"])
        rec["BEGINTIME"] = epoch_ms_to_str(rec["BEGINTIME"])
        rec["ESTIMATEDTIMERESTORATION"] = epoch_ms_to_str(rec["ESTIMATEDTIMERESTORATION"])
        rec["x"] = f["geometry"]["x"]
        rec["y"] = f["geometry"]["y"]
        spans.append(span("per_outage", finish(rec, ts, emc), i))
    return spans, []


def parse_il_numoutages(bodies, emc, ts, url):
    """IL POST endpoints (il Scraper7, il_scraper.py:224-280): per
    city/county/metro lists with the NumOutages != 0 int filter."""
    spans, off = [], 0
    for key, body in bodies.items():
        for o in json.loads(body.decode("utf8")):
            if o["NumOutages"] != 0:
                spans.append(span(key, finish(dict(o), ts, emc), off))
                off += 1
    return spans, []


def parse_il_areasummary(bodies, emc, ts, url):
    """IL AreaSummary (il Scraper8, il_scraper.py:283-328): one payload
    fans out to zip/county/district levels, each included only when
    non-empty, filter Out != 0."""
    val = json.loads(bodies["areasummary"].decode("utf8"))
    levels = [
        ("zipCodeAreas", "per_zipcode"),
        ("countyAreas", "per_county"),
        ("districtAreas", "per_district"),
    ]
    spans, off = [], 0
    for src, kind in levels:
        if not val.get(src):
            continue
        for o in val[src]:
            if o["Out"] != 0:
                spans.append(span(kind, finish(dict(o), ts, emc), off))
                off += 1
    return spans, []


def parse_fl_pretag7(bodies, emc, ts, url):
    """FL pre-tag returndata (fl Scraper7, fl_scraper.py:321-353): rows from
    payload["returndata"], no filter."""
    val = json.loads(bodies["per_outage"].decode("utf8"))
    spans = []
    for i, o in enumerate(val["returndata"]):
        spans.append(span("per_outage", finish(dict(o), ts, emc), i))
    return spans, []


def parse_fl_pretag8(bodies, emc, ts, url):
    """FL pre-tag list (fl Scraper8, fl_scraper.py:355-383): the reference
    calls DataFrame.from_records on the raw_data DICT, producing one row per
    outage whose single 'per_outage' column holds the raw record dict —
    preserved faithfully."""
    val = json.loads(bodies["per_outage"].decode("utf8"))
    spans = []
    for i, o in enumerate(val):
        spans.append(span("per_outage", finish({"per_outage": o}, ts, emc), i))
    return spans, []


def parse_ga_arcgis10(bodies, emc, ts, url):
    """GA ssemc ArcGIS variant (ga Scraper10, ga_scraper.py:690-742):
    attributes expand, columns LOWERCASED, cont_sum -> 'Members Affected'
    rename (M7), STRING filter != "0"."""
    feats = json.loads(bodies["per_county"].decode("utf8"))["features"]
    spans, off = [], 0
    for f in feats:
        # pandas rename keeps the column POSITION — rebuild in place
        rec = {
            ("Members Affected" if k.lower() == "cont_sum" else k.lower()): v
            for k, v in f["attributes"].items()
        }
        if rec["Members Affected"] != "0":
            spans.append(span("per_county", finish(rec, ts, emc), off))
            off += 1
    return spans, []


def parse_la_plainjson(bodies, emc, ts, url):
    """LA plain-JSON list (la Scraper6, la_scraper.py:77-102): rows straight
    from the payload, no filter."""
    val = json.loads(bodies["per_outage"].decode("utf8"))
    return [
        span("per_outage", finish(dict(o), ts, emc), i) for i, o in enumerate(val)
    ], []


def parse_tn_reportlevels(bodies, emc, ts, url):
    """TN multi-level reportTable (tn Scraper2, tn_scraper.py:38-113): one
    DOM table per select-menu level; blank-header columns dropped, short
    rows dropped (dropna), STRING filter Aff != "0"."""
    spans, off = [], 0
    for key, body in bodies.items():
        header, rows = parse_html_table(body.decode("utf8"))
        cols = [h for h in header if h]
        if len(cols) <= 1:
            continue
        for r in rows:
            rec_full = dict(zip(header, r))
            if any(c not in rec_full for c in cols):
                continue  # dropna (tn_scraper.py:81)
            rec = {c: rec_full[c] for c in cols}
            if rec["Aff"] != "0":
                spans.append(span(key, finish(rec, ts, emc), off))
                off += 1
    return spans, []


KERNELS: dict[str, Kernel] = {
    "nisc": parse_nisc,
    "wov": parse_wov,
    "asmx": parse_asmx,
    "kubra": parse_kubra_deck,
    "kubra_report": parse_kubra_report,
    "kubra_nested": parse_kubra_nested,
    "epochms": parse_epochms,
    "polygons": parse_polygons,
    "shellout": parse_shellout,
    "shellout11": parse_shellout11,
    "domtable": parse_domtable,
    "arcgis": parse_arcgis,
    "prejson": parse_prejson,
    "summarytotals": parse_summarytotals,
    "prejson_list": parse_prejson_list,
    "eshits": parse_eshits,
    "regionsets": parse_regionsets,
    "incidents": parse_incidents,
    "outagedetails": parse_outagedetails,
    "alloutages": parse_alloutages,
    "dtable": parse_dtable,
    "outagelst": parse_outagelst,
    "affectedcount": parse_affectedcount,
    "singlevalue": parse_singlevalue,
    "ny_report": parse_ny_report,
    "ny_kubra_val": parse_kubra_val_levels,
    "ny_iframe": parse_ny_iframe,
    "duke": parse_duke,
    "treegrid": parse_treegrid,
    "tx_report_table": parse_tx_report_table,
    "tx_suffixjson": parse_tx_suffixjson,
    "tx_kubra_sniff": parse_kubra_val_levels,
    "tx_envelope": parse_tx_envelope,
    "il_kubra_val": parse_kubra_val_levels,
    "il_numoutages": parse_il_numoutages,
    "il_areasummary": parse_il_areasummary,
    "fl_pretag7": parse_fl_pretag7,
    "fl_pretag8": parse_fl_pretag8,
    "ga_arcgis10": parse_ga_arcgis10,
    "tn_reportlevels": parse_tn_reportlevels,
    "la_plainjson": parse_la_plainjson,
}

# Reference scrapers that are themselves inert or broken — documented, not
# kernelized: ca ScraperCC (ca_scraper.py:66-77) and tx Scraper3
# (tx_scraper.py:73-82) have pass-bodies for both parse() and fetch();
# ga Scraper8 (ga_scraper.py:592-595) defines only __init__; fl Scraper6
# (fl_scraper.py:262-290) calls find_all on a bs4 ResultSet and raises
# AttributeError before producing data. Tests in
# tests/test_kernels_reference.py prove these facts against the real code.
