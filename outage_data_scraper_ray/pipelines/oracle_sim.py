"""Sequential oracle: reference-semantics simulator for conformance tests.

The reference cannot run here (selenium, live endpoints), so the north_rule's
"matches the reference's crawl ordering / URL-seen set / span sequence"
checks compare the distributed engine against THIS module: an independent,
single-process, pandas-based re-derivation of the reference's behavior
(SURVEY.md section 5) on the same synthetic web:

- parse: DataFrame-shaped transforms exactly like the reference scrapers
  (pd.DataFrame -> boolean-mask filters -> applymap unwraps -> column drops),
  emitted as spans. The distributed kernels build records directly from
  JSON; agreement between the two proves the kernels preserve reference
  semantics.
- crawl: the sequential loop of app/main.py:21 under the same virtual-clock
  politeness budgets and priority order as the distributed scheduler.
"""

from __future__ import annotations

import json
import math
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd

from ..state.politeness import VirtualBudgets
from ..synth import SyntheticWeb, canonical_url, fetch_plan, host_of
from ..kernels.common import SCRAPE_TS_FORMAT, ZIP_SENTINEL, synth_zipcode


def _py(v: Any) -> Any:
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _df_spans(df: pd.DataFrame, kind: str, out: list[dict]) -> None:
    for _, row in df.iterrows():
        rec = {k: _py(v) for k, v in row.items()}
        out.append(
            {
                "kind": kind,
                "text": json.dumps(rec, separators=(",", ":"), default=str),
                "media_ref": "",
                "offset": len(out),
            }
        )


def _guarded_zips(points: list[tuple[float, float]]) -> list[str]:
    if len(points) < 10:
        return [synth_zipcode(a, b) for a, b in points]
    return [ZIP_SENTINEL] * len(points)


def oracle_parse(bodies: dict[str, bytes], layout: str, emc: str, ts: str, url: str):
    """pandas re-derivation of each scraper's parse(); returns (spans, children)."""
    spans: list[dict] = []

    if layout == "nisc":
        val = json.loads(bodies["per_county"].decode())
        flat = [b for item in val for b in item["boundaries"]]
        df = pd.DataFrame(flat)
        if len(df):
            df = df[(df["customersAffected"] != 0) | (df["customersOutNow"] != 0)]
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_county", spans)
        out = json.loads(bodies["per_outage"].decode())
        df = pd.DataFrame(out)
        if len(df):
            pts = [(p["lat"], p["lng"]) for p in df["outagePoint"]]
            df["zip"] = _guarded_zips(pts)
            df["timestamp"] = ts
            df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "wov":
        val = json.loads(bodies["per_outage"].decode())
        df = pd.DataFrame(val["Outages"])
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "asmx":
        root = ET.fromstring(bodies["per_county"].decode())
        recs = [
            {el.tag: el.text for el in item} for item in root.iter("MobileCounty")
        ]
        df = pd.DataFrame(recs)
        if len(df):
            df = df[df["CustomersAffected"] != "0"]
            df["timestamp"] = ts
            df["EMC"] = emc
            df = df.drop(columns=["Shape"])
            # reference drops Shape then timestamp/EMC are already added
            df = df[[c for c in recs[0] if c != "Shape"] + ["timestamp", "EMC"]]
        _df_spans(df, "per_county", spans)
        root = ET.fromstring(bodies["per_outage"].decode())
        recs = [{el.tag: el.text for el in item} for item in root.iter("MobileOutage")]
        df = pd.DataFrame(recs)
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "kubra":
        deck = json.loads(bodies["deck"].decode())
        return [], list(deck["decks"])

    if layout == "kubra_report":
        val = json.loads(bodies["report"].decode())
        title = url.rsplit("/reports/", 1)[-1].split("/", 1)[0]
        if title == "MEDIA":
            return [{"kind": "per_media", "text": "", "media_ref": val["tile"], "offset": 0}], []
        kind = {
            "zip": "per_zipcode", "county": "per_county", "city": "per_city",
            "ctv": "per_town", "ward": "per_ward",
        }.get(title, "per_outage")
        df = pd.DataFrame(val["file_data"]["areas"])
        if len(df):
            df[["cust_a", "percent_cust_a"]] = df[["cust_a", "percent_cust_a"]].map(
                lambda x: x["val"]
            )
            df = df[(df["cust_a"] != 0) | (df["n_out"] != 0)]
            df = df.drop(columns=["gotoMap"])
            df["timestamp"] = ts
            df["EMC"] = emc
        _df_spans(df, kind, spans)
        return spans, []

    if layout == "kubra_nested":
        for key in ("per_county", "per_zipcode"):
            val = json.loads(bodies[key].decode())["file_data"]["areas"][0]["areas"]
            df = pd.DataFrame()
            for v in val:
                for i in range(len(v["areas"])):
                    if "cust_a" in v["areas"][i] and "val" in v["areas"][i]["cust_a"]:
                        v["areas"][i]["cust_a"] = v["areas"][i]["cust_a"]["val"]
                df = pd.concat([df, pd.DataFrame(v["areas"])], ignore_index=True)
            df = df[df["cust_a"] != 0]
            df["timestamp"] = ts
            df["EMC"] = emc
            _df_spans(df, key, spans)
        return spans, []

    if layout == "epochms":
        out = json.loads(bodies["per_outage"].decode())
        df = pd.DataFrame(out)
        if len(df):
            df["timestamp"] = ts
            df[["startTime", "lastUpdatedTime"]] = df[
                ["startTime", "lastUpdatedTime"]
            ].apply(pd.to_datetime, unit="ms").astype(str)
            df["EMC"] = emc
            pts = list(zip(df["latitude"], df["longitude"]))
            df["zip_code"] = _guarded_zips(pts)
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "polygons":
        val = json.loads(bodies["per_outage"].decode())
        for report in val["reportData"]["reports"]:
            kind = "per_county" if report["id"] == "County" else "per_zipcode"
            df = pd.DataFrame(report["polygons"])
            if len(df):
                df["EMC"] = emc
                df["timestamp"] = ts
                df = df[df["affected"] > 0]
            _df_spans(df, kind, spans)
        odf = pd.DataFrame(val["outageData"]["outages"])
        if len(odf):
            odf["EMC"] = emc
            odf["timestamp"] = ts
        _df_spans(odf, "per_outage", spans)
        return spans, []

    if layout == "shellout":
        val = json.loads(bodies["shellout"].decode())
        area = val["areas"]
        df = pd.DataFrame(area["markers"])
        if len(df):
            df = df[df["outages"] != 0]
            df["timestamp"] = ts
            df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        sdf = pd.DataFrame(
            [{
                "service_index_name": area["service_index_name"],
                "outages": area["outages"],
                "NumConsumers": area["stats"]["NumConsumers"],
            }]
        )
        sdf["timestamp"] = ts
        sdf["EMC"] = emc
        _df_spans(sdf, "per_emc", spans)
        return spans, []

    if layout == "shellout11":
        subs = json.loads(bodies["per_substation"].decode())["rows"]["subs"]
        df = pd.DataFrame(subs)
        df["timestamp"] = ts
        df["EMC"] = emc
        df = df[
            (df["SubTotalConsumersOut"] != 0)
            | (df["SubTotalMetersAffectedByDeviceOutages"] != 0)
        ]
        _df_spans(df, "per_substation", spans)
        rows_ = json.loads(bodies["per_county"].decode())["rows"]
        df = pd.DataFrame(rows_)
        df["timestamp"] = ts
        df["EMC"] = emc
        df = df[df["out"] != 0]
        _df_spans(df, "per_county", spans)
        val = json.loads(bodies["per_outage"].decode())
        per_outage = pd.DataFrame()
        for _k, v in val.items():
            if isinstance(v, dict) and v["markers"]:
                df = pd.DataFrame(v["markers"])
                df["service_index_name"] = v["service_index_name"]
                df["outages"] = v["outages"]
                df["NumConsumers"] = v["stats"]["NumConsumers"]
                if len(df["lat"]) < 10:
                    df["zip_code"] = df.apply(
                        lambda r: synth_zipcode(r["lat"], r["lon"]), axis=1
                    )
                else:
                    df["zip_code"] = ZIP_SENTINEL
                per_outage = df
        if len(per_outage):
            per_outage["isHighTraffic"] = val["isHighTraffic"]
            per_outage["updateTime"] = val["timestamp"]
            per_outage["timestamp"] = ts
            per_outage["EMC"] = emc
        _df_spans(per_outage, "per_outage", spans)
        return spans, []

    if layout == "domtable":
        html = bodies["per_county"].decode()
        root = ET.fromstring(html)
        table = root.find(".//table")
        rows = table.findall("tr")
        header = ["".join(c.itertext()).strip() for c in rows[0]]
        data = [["".join(c.itertext()).strip() for c in r] for r in rows[1:]]
        df = pd.DataFrame(data, columns=header)
        df = df.drop(columns=[c for c in df.columns if not c])
        df = df.replace("", np.nan).dropna(axis=0)
        if len(df):
            df = df[df["# Out"] != "0"]
            df["timestamp"] = ts
            df["EMC"] = emc
        _df_spans(df, "per_county", spans)
        return spans, []

    if layout == "arcgis":
        body = bodies["per_outage"].decode()
        if not body.startswith("{") and not body.startswith("["):
            body = body[body.index("(") + 1 : body.rindex(")")]
        val = json.loads(body)
        recs = []
        for f in val["features"]:
            rec = dict(f["attributes"])
            rec["x"] = f["geometry"]["x"]
            rec["y"] = f["geometry"]["y"]
            recs.append(rec)
        df = pd.DataFrame(recs)
        if len(df):
            df["timestamp"] = ts
            df[["StartDate", "EstimatedRestoreDate"]] = df[
                ["StartDate", "EstimatedRestoreDate"]
            ].apply(pd.to_datetime, unit="ms").astype(str)
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "prejson":
        val = json.loads(bodies["per_county"].decode())
        df = pd.DataFrame(val["outages"])
        if len(df):
            df = df[df["Customers Out"] != "0"]
            df["timestamp"] = ts
            df["EMC"] = emc
        _df_spans(df, "per_county", spans)
        return spans, []

    if layout == "summarytotals":
        val = json.loads(bodies["per_city"].decode())
        sfd = val["summaryFileData"]
        df = pd.DataFrame(
            [
                [
                    sfd["totals"][0]["total_cust_s"],
                    sfd["totals"][0]["total_outages"],
                    sfd["totals"][0]["total_cust_a"]["val"],
                    sfd["date_generated"],
                ]
            ],
            columns=[
                "total_customers_served", "total_outages",
                "total_customers_affected", "data_generated",
            ],
        )
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_city", spans)
        return spans, []

    if layout == "prejson_list":
        val = json.loads(bodies["per_outage"].decode())
        rows_ = [
            [o["id"], o["createdDate"], o["lastUpdated"], o["startDate"],
             o["numPeople"], o["latitude"], o["longitude"]]
            for o in val
        ]
        df = pd.DataFrame(
            rows_,
            columns=["id", "createdDate", "lastUpdated", "startDate",
                     "peopleAffected", "latitude", "longitude"],
        )
        if len(df):
            df = df[df["peopleAffected"] != 0]
            df["timestamp"] = ts
            df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "eshits":
        val = json.loads(bodies["per_outage"].decode())
        recs = []
        for obj in val:
            for h in obj["hits"]["hits"]:
                recs.append(
                    {
                        "id": h["_id"],
                        "customerCount": h["_source"]["customerCount"],
                        "estimatedTimeOfRestoration": h["_source"]["estimatedTimeOfRestoration"],
                        "reason": h["_source"]["reason"],
                        "status": h["_source"]["status"],
                        "updateTime": h["_source"]["updateTime"],
                    }
                )
        df = pd.DataFrame.from_records(recs)
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "regionsets":
        val = json.loads(bodies["per_region"].decode())
        for s in val["regionDataSets"]:
            df = pd.DataFrame(s["regions"])
            df = df[df["numberOut"] != 0]
            df["timestamp"] = ts
            df["EMC"] = emc
            _df_spans(df, "per_" + s["id"], spans)
        return spans, []

    if layout == "incidents":
        val = json.loads(bodies["incidents"].decode())
        new_val = []
        for item in val["district_metrics"]:
            if "outage_reported" not in item:
                continue
            new_val.append(
                {
                    "district": item["district"],
                    "custom_qty": item.get("outage_reported", {}).get("customer_qty", 0),
                    "incident_qty": item.get("outage_reported", {}).get("incident_qty", 0),
                }
            )
        df = pd.DataFrame(new_val)
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_district", spans)
        pdf = pd.DataFrame(val["outage_points"])
        pdf["timestamp"] = ts
        pdf["EMC"] = emc
        _df_spans(pdf, "per_outage", spans)
        return spans, []

    if layout == "outagedetails":
        det = json.loads(bodies["per_outage"].decode())["electricOutageDetails"]
        df = pd.DataFrame(det)
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        base = pd.DataFrame(det)
        if len(base):
            cs = base.groupby("county", as_index=False)["customerCount"].sum()
            cs["timestamp"] = ts
            cs["EMC"] = emc
            _df_spans(cs, "per_county", spans)
            zs = base.groupby("zipcode", as_index=False)["customerCount"].sum()
            zs["timestamp"] = ts
            zs["EMC"] = emc
            _df_spans(zs, "per_zipcode", spans)
        return spans, []

    if layout == "alloutages":
        val = json.loads(bodies["per_outage"].decode())
        df = pd.DataFrame(val["data"])
        if len(df):
            df = df.drop(columns=["extension", "affectedAreas"])
            df["timestamp"] = ts
            df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "dtable":
        val = json.loads(bodies["per_outage"].decode())
        df = pd.DataFrame(json.loads(val["d"])["Table"])
        df["timestamp"] = ts
        df["EMC"] = emc
        df = df.dropna()
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "outagelst":
        lst = json.loads(bodies["per_outage"].decode())["outageLst"]
        df = pd.DataFrame(lst)
        if len(df):
            df["zip"] = df.apply(lambda r: synth_zipcode(r["lat"], r["lon"]), axis=1)
            df["timestamp"] = ts
            df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "affectedcount":
        lst = json.loads(bodies["per_outage"].decode())
        df = pd.DataFrame(lst)
        if len(df):
            df["timestamp"] = ts
            df["EMC"] = emc
            df = df[df["affectedCount"] != 0]
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "singlevalue":
        html = bodies["per_emc"].decode()
        cur = re.search(r'id="currentOutages">([^<]*)<', html).group(1)
        upd = re.search(r'id="lastUpdated">([^<]*)<', html).group(1)
        df = pd.DataFrame([{"currentOutages": cur, "lastUpdated": upd}])
        df["timestamp"] = ts
        df["emc"] = emc
        _df_spans(df, "per_emc", spans)
        return spans, []

    if layout == "ny_report":
        for key, body in bodies.items():
            val = json.loads(body.decode())["file_data"]["areas"][0]["areas"]
            df = pd.DataFrame()
            for v in val:
                for i in range(len(v["areas"])):
                    if "cust_a" in v["areas"][i] and "val" in v["areas"][i]["cust_a"]:
                        v["areas"][i]["cust_a"] = v["areas"][i]["cust_a"]["val"]
                df = pd.concat([df, pd.DataFrame(v["areas"])], ignore_index=True)
            df = df[df["cust_a"] != 0]
            df["timestamp"] = ts
            df["EMC"] = emc
            _df_spans(df, key, spans)
        return spans, []

    if layout in ("ny_kubra_val", "tx_kubra_sniff", "il_kubra_val"):
        for key, body in bodies.items():
            val = json.loads(body.decode())["file_data"]
            df = pd.DataFrame(val["areas"])
            if len(df):
                df[["cust_a", "percent_cust_a"]] = df[["cust_a", "percent_cust_a"]].map(
                    lambda x: x["val"]
                )
                df = df[(df["cust_a"] != 0) | (df["n_out"] != 0)]
                df["timestamp"] = ts
                df["EMC"] = emc
                df = df.drop(columns=["gotoMap"])
            _df_spans(df, key, spans)
        return spans, []

    if layout == "ny_iframe":
        from ..kernels import _table_rows_trimmed

        county_rows = _table_rows_trimmed(bodies["per_county"].decode())
        town_rows: list[dict] = []
        for key, body in bodies.items():
            if key.startswith("town_"):
                town_rows += _table_rows_trimmed(body.decode())
        for kind, rows_ in (("per_county", county_rows), ("per_town", town_rows)):
            df = pd.DataFrame(rows_)
            df["timestamp"] = ts
            df["EMC"] = emc
            _df_spans(df, kind, spans)
        return spans, []

    if layout == "duke":
        table_data = json.loads(bodies["per_county"].decode())
        df = pd.DataFrame(table_data)
        df = df[df["Number of Outages"] != 0]  # str column: faithful no-op
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_county", spans)
        return spans, []

    if layout == "treegrid":
        df = pd.DataFrame(json.loads(bodies["per_county"].decode()))
        df = df[df["cust_a"] != "0"]
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_county", spans)
        return spans, []

    if layout == "tx_report_table":
        from ..kernels.common import parse_html_table

        for key, loc in (("per_county", "COUNTY"), ("per_zipcode", "ZIP")):
            header = ["VIEW", loc, "CUSTOMER OUTAGES", "CUSTOMERS SERVED", "% AFFECTED"]
            _, rows_ = parse_html_table(bodies[key].decode())
            table = [dict(zip(header, r)) for r in rows_[1:]]
            df = pd.DataFrame(table)
            if len(df):
                df = df[[loc, "CUSTOMER OUTAGES", "CUSTOMERS SERVED", "% AFFECTED"]]
                df["timestamp"] = ts
                df["EMC"] = emc
                df = df[df["CUSTOMER OUTAGES"] != "0"]
            _df_spans(df, key, spans)
        return spans, []

    if layout == "tx_suffixjson":
        for key, body in bodies.items():
            df = pd.DataFrame(json.loads(body.decode()))
            if len(df):
                df = df[df["customersAffected"] != 0]
                df["lastUpdatedTime"] = df["lastUpdatedTime"].apply(
                    pd.to_datetime, unit="ms"
                )
                df["timestamp"] = ts
                df["EMC"] = emc
            _df_spans(df, key, spans)
        return spans, []

    if layout == "tx_envelope":
        body = bodies["per_outage"].decode()
        if body[0] != "{":
            body = body[body.index("(") + 1 : body.rindex(")")]
        val = json.loads(body)
        df = pd.DataFrame([x["attributes"] for x in val["features"]])
        if len(df):
            df["BEGINTIME"] = pd.to_datetime(df["BEGINTIME"], unit="ms")
            df["ESTIMATEDTIMERESTORATION"] = pd.to_datetime(
                df["ESTIMATEDTIMERESTORATION"], unit="ms"
            )
            df["x"] = [x["geometry"]["x"] for x in val["features"]]
            df["y"] = [x["geometry"]["y"] for x in val["features"]]
            df["timestamp"] = ts
            df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "il_numoutages":
        for key, body in bodies.items():
            df = pd.DataFrame(json.loads(body.decode()))
            if len(df):
                df = df[df["NumOutages"] != 0]
                df["timestamp"] = ts
                df["EMC"] = emc
            _df_spans(df, key, spans)
        return spans, []

    if layout == "il_areasummary":
        tmp = json.loads(bodies["areasummary"].decode())
        raw = {}
        if tmp["zipCodeAreas"]:
            raw["per_zipcode"] = tmp["zipCodeAreas"]
        if tmp["countyAreas"]:
            raw["per_county"] = tmp["countyAreas"]
        if tmp["districtAreas"]:
            raw["per_district"] = tmp["districtAreas"]
        for key, val in raw.items():
            df = pd.DataFrame(val)
            df = df[df["Out"] != 0]
            df["timestamp"] = ts
            df["EMC"] = emc
            _df_spans(df, key, spans)
        return spans, []

    if layout == "fl_pretag7":
        val = json.loads(bodies["per_outage"].decode())
        df = pd.DataFrame.from_records(val["returndata"])
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "fl_pretag8":
        val = json.loads(bodies["per_outage"].decode())
        df = pd.DataFrame.from_records({"per_outage": val})
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "ga_arcgis10":
        feats = json.loads(bodies["per_county"].decode())["features"]
        if feats == []:
            return spans, []
        df = pd.DataFrame(feats)
        df.rename(columns={"attributes": "data"}, inplace=True)
        df = pd.concat([df.drop(["data"], axis=1), df["data"].apply(pd.Series)], axis=1)
        df.columns = df.columns.str.lower()
        df.rename(columns={"cont_sum": "Members Affected"}, inplace=True)
        df["timestamp"] = ts
        df["EMC"] = emc
        df = df[df["Members Affected"] != "0"]
        _df_spans(df, "per_county", spans)
        return spans, []

    if layout == "la_plainjson":
        df = pd.DataFrame(json.loads(bodies["per_outage"].decode()))
        df["timestamp"] = ts
        df["EMC"] = emc
        _df_spans(df, "per_outage", spans)
        return spans, []

    if layout == "tn_reportlevels":
        from ..kernels.common import parse_html_table

        for key, body in bodies.items():
            header, rows_ = parse_html_table(body.decode())
            cols = [h for h in header if h != ""]
            table = [dict(zip(header, r)) for r in rows_]
            df = pd.DataFrame(table)
            if len(df.columns) > 1:
                df = df[cols]
                df = df.dropna(axis=0)
                df["timestamp"] = ts
                df["EMC"] = emc
                df = df[df["Aff"] != "0"]
            else:
                df = pd.DataFrame()
            _df_spans(df, key, spans)
        return spans, []

    raise ValueError(layout)


@dataclass
class SimDoc:
    url: str
    emc: str
    layout: str
    epoch: int
    crawl_key: int
    status: int
    reason: str
    spans: list[dict]
    children: list[str] = field(default_factory=list)


@dataclass
class SimResult:
    docs: list[SimDoc]                 # in the deterministic crawl order
    seen_hashes: set[int]
    admitted_per_epoch: list[list[str]]


def simulate_crawl(
    seeds: pd.DataFrame,
    *,
    seed: int = 42,
    max_rows: int = 8,
    failure_rate: float = 0.02,
    politeness_rate: float = 64.0,
    politeness_burst: float = 64.0,
    politeness_dt: float = 1.0,
    max_epochs: int = 50,
    ts: str = "10-05-2023 08:00:00",
    epoch_capacity: int | None = None,
) -> SimResult:
    """Sequential crawl under the same politeness budgets + priority order as
    the distributed job. Crawl order within an epoch = sort by
    (utility_tier, refresh_deadline, crawl_key) — the engine's deterministic
    generalization of the reference's seed-dict order (app/main.py:21)."""
    from ..synth import robots_allows, robots_rules

    web = SyntheticWeb(seed=seed, max_rows=max_rows, failure_rate=failure_rate)
    vb = VirtualBudgets(politeness_rate, politeness_burst, politeness_dt)
    robots: dict[str, tuple[str, ...]] = {}

    def _allowed(p: dict) -> bool:
        rules = robots.get(p["host"])
        if rules is None:
            rules = robots[p["host"]] = robots_rules(p["host"], seed)
        return robots_allows(p["url"], rules)

    pending: list[dict] = []
    for _, r in seeds.iterrows():
        d = r.to_dict()
        d["crawl_key"] = int(d["seed_index"])
        d["depth"] = 0
        pending.append(d)

    # Frontier-uniqueness invariant at the seed boundary (mirrors
    # CrawlJob._initial_frontier): duplicate seed URLs collapse to the
    # min-(tier, deadline, crawl_key) row BEFORE any politeness accounting,
    # so duplicates neither consume budget nor re-fetch.
    best: dict[int, tuple[tuple, dict]] = {}
    for d in pending:
        h64 = int(
            pd.util.hash_array(
                np.array([canonical_url(d["url"])], dtype=object), categorize=False
            )[0]
        )
        k = (d["utility_tier"], d["refresh_deadline"], d["crawl_key"])
        cur = best.get(h64)
        if cur is None or k < cur[0]:
            best[h64] = (k, d)
    pending = [d for _, d in best.values()]

    docs: list[SimDoc] = []
    seen: set[int] = set()
    admitted_log: list[list[str]] = []

    for epoch in range(max_epochs):
        pending = [p for p in pending if _allowed(p)]  # robots gate
        if not pending:
            break
        hosts = [p["host"] for p in pending]
        budgets = vb.epoch_budgets(hosts)
        by_host: dict[str, list[dict]] = {}
        for p in pending:
            by_host.setdefault(p["host"], []).append(p)
        for rows in by_host.values():
            rows.sort(key=lambda p: (p["utility_tier"], p["refresh_deadline"], p["crawl_key"]))
        eff_budgets = {h: min(len(r), budgets.get(h, 0)) for h, r in by_host.items()}
        if epoch_capacity is not None:
            # priority heap: hosts served by their best pending priority
            order = sorted(
                by_host,
                key=lambda h: (
                    by_host[h][0]["utility_tier"],
                    by_host[h][0]["refresh_deadline"],
                    by_host[h][0]["crawl_key"],
                ),
            )
            remaining = epoch_capacity
            for h in order:
                take = min(eff_budgets[h], remaining)
                eff_budgets[h] = take
                remaining -= take
        admitted: list[dict] = []
        deferred: list[dict] = []
        consumed: dict[str, int] = {}
        for h, rows in by_host.items():
            b = eff_budgets.get(h, 0)
            admitted.extend(rows[:b])
            deferred.extend(rows[b:])
            if rows[:b]:
                consumed[h] = len(rows[:b])
        vb.consume(consumed)
        admitted.sort(key=lambda p: (p["utility_tier"], p["refresh_deadline"], p["crawl_key"]))
        admitted_log.append([p["url"] for p in admitted])

        children_rows: list[dict] = []
        for p in admitted:
            h64 = int(pd.util.hash_array(np.array([canonical_url(p["url"])], dtype=object),
                                         categorize=False)[0])
            if h64 in seen:
                continue
            seen.add(h64)
            try:
                bodies = web.fetch(p["url"], p["layout"])
                spans, children = oracle_parse(bodies, p["layout"], p["emc"], ts, p["url"])
                doc = SimDoc(p["url"], p["emc"], p["layout"], epoch, p["crawl_key"],
                             200, "", spans, children)
            except RuntimeError as e:
                doc = SimDoc(p["url"], p["emc"], p["layout"], epoch, p["crawl_key"],
                             500, str(e), [], [])
            docs.append(doc)
            for j, cu in enumerate(doc.children):
                children_rows.append(
                    {
                        "url": cu,
                        "host": host_of(cu),
                        "emc": p["emc"],
                        "state": p["state"],
                        "layout": "kubra_report",
                        "seed_index": -1,
                        "utility_tier": p["utility_tier"],
                        "refresh_deadline": p["refresh_deadline"],
                        "depth": 1,
                        "crawl_key": (1 << 40) + p["crawl_key"] * 64 + j,
                    }
                )
        pending = deferred + children_rows

    return SimResult(docs, seen, admitted_log)
