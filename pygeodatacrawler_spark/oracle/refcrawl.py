"""Sequential in-memory oracle for the crawl spec (SURVEY.md §5).

Implements the exact same crawl semantics as plans/crawl.py — same
canonicalizer, same extractor, same politeness rules, same ordering
keys — as one single-threaded Python loop, the way the reference
processes its directory tree (/root/reference/geodatacrawler/
metadata.py:96-461: recursive traversal + "sidecar exists" seen check).

Parity tests assert the distributed engine reproduces, row for row:
- visit order  (round, rank_in_round, canon_url),
- URL-seen membership (the set of canonical URLs ever enqueued),
- extracted text sha256 per url (byte-identical invariant).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

import pandas as pd

from pygeodatacrawler_spark.functions.robots import robots_allowed_py
from pygeodatacrawler_spark.functions.text import extract_links_py, extract_text_py
from pygeodatacrawler_spark.functions.urls import (
    canonicalize_url_py,
    registered_domain_py,
)


@dataclass
class OracleResult:
    visits: list[dict] = field(default_factory=list)  # canon_url, round, rank_in_round
    seen: set = field(default_factory=set)  # canonical URLs ever enqueued
    text_sha: dict = field(default_factory=dict)  # canon_url -> sha256 hex
    fetched: int = 0


def crawl_oracle(
    pages: pd.DataFrame,
    seeds: pd.DataFrame,
    robots: pd.DataFrame | None = None,
    host_budget: int = 100,
    max_rounds: int = 100,
) -> OracleResult:
    page_html = dict(zip(pages["url"], pages["html"]))
    rules: dict[str, dict] = {}
    if robots is not None:
        has_allow = "allow_rules" in robots.columns
        for _, r in robots.iterrows():
            rules[r["registered_domain"]] = {
                "skip": r["skip_pattern"],
                "no_recurse": r["no_recurse_prefix"],
                "max_pages": r["max_pages"],
                # RFC 9309 longest-match structs (robots.txt-derived
                # tables only; folder-config tables have no Allow)
                "disallow_rules": (
                    list(r["disallow_rules"] or []) if has_allow else None
                ),
                "allow_rules": (
                    list(r["allow_rules"] or []) if has_allow else None
                ),
            }

    # frontier entry: (canon_url, url, domain, depth, discovery_round)
    frontier: dict[str, dict] = {}
    res = OracleResult()

    def enqueue(url: str, depth: int, disc: int) -> None:
        cu = canonicalize_url_py(url)
        if cu in frontier:
            return
        frontier[cu] = {
            "canon_url": cu,
            "url": url,
            "domain": registered_domain_py(cu),
            "depth": depth,
            "disc": disc,
            "state": "pending",
        }
        res.seen.add(cu)

    for _, s in seeds.iterrows():
        enqueue(s["url"], int(s["depth"]), 0)

    for round_no in range(max_rounds):
        pending = [e for e in frontier.values() if e["state"] == "pending"]
        # politeness filter
        eligible = []
        for e in pending:
            rule = rules.get(e["domain"])
            if rule:
                if rule["skip"] is not None and re.search(rule["skip"], e["canon_url"]):
                    if rule.get("disallow_rules") is None:
                        continue  # Disallow-only table (folder-config)
                    # RFC 9309 §2.2.2: longest matching rule wins,
                    # Allow on ties — same helper the engine mirrors
                    if not robots_allowed_py(
                        e["canon_url"],
                        rule["disallow_rules"],
                        rule["allow_rules"],
                    ):
                        continue
                if rule["no_recurse"] is not None and e["canon_url"].startswith(
                    rule["no_recurse"]
                ):
                    continue
            eligible.append(e)
        # per-host priority rank + budget
        batch = []
        by_host: dict[str, list] = {}
        for e in eligible:
            by_host.setdefault(e["domain"], []).append(e)
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (e["depth"], e["disc"], e["canon_url"]))
            rule = rules.get(host) or {}
            cap = rule.get("max_pages")
            budget = min(host_budget, int(cap)) if cap is not None and not pd.isna(cap) else host_budget
            batch.extend(entries[:budget])
        if not batch:
            break
        # visit order within the round
        batch.sort(key=lambda e: (e["depth"], e["canon_url"]))
        for rank, e in enumerate(batch, start=1):
            res.visits.append(
                {
                    "canon_url": e["canon_url"],
                    "round": round_no,
                    "rank_in_round": rank,
                }
            )
            e["state"] = "fetched"
            res.fetched += 1
            html = page_html.get(e["canon_url"])
            text = extract_text_py(html)
            res.text_sha[e["canon_url"]] = hashlib.sha256(
                (text or "").encode("utf-8")
            ).hexdigest()
            for link in extract_links_py(html, e["canon_url"]):
                enqueue(link, e["depth"] + 1, round_no + 1)
    return res
