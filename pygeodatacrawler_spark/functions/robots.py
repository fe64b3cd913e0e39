"""robots.txt and sitemap.xml parsing — the production crawl inputs.

The reference is a filesystem crawler: its politeness rules come from
per-folder config (``skip-files`` / ``skip-subfolders``,
/root/reference/geodatacrawler/metadata.py:117-129), which the engine
models as the broadcast robots table (registered_domain, skip_pattern,
no_recurse_prefix, crawl_delay, max_pages). A WEB deployment of the
same loop gets those rules from ``/robots.txt`` — this module turns
fetched robots.txt bytes into exactly that table (RFC 9309 subset:
group selection by longest user-agent match with ``*`` fallback,
Disallow with ``*``/``$`` wildcards, Crawl-delay, global Sitemap
lines), and sitemap.xml / sitemap-index documents into seed rows.

Parsing runs where the fetch runs: an Arrow-batched pandas pass over
the (domain, robots_bytes) dimension table — one small row per domain,
never per URL. URL-level enforcement stays in
operators/frontier.apply_robots as a broadcast join + JVM regex.
"""

from __future__ import annotations

import re
from xml.etree import ElementTree as ET

DEFAULT_UA = "pygeodatacrawler"


# RFC 9309 §2.5: crawlers MUST parse at least 500 KiB; we parse
# exactly that and ignore the rest (a complete rule line never spans
# the boundary silently — the partial trailing line is dropped)
ROBOTS_PARSE_LIMIT = 500 * 1024


def parse_robots_py(
    text: str | bytes | None, user_agent: str = DEFAULT_UA
) -> dict:
    """robots.txt -> {disallow, allow, crawl_delay, sitemaps}.

    Group selection per RFC 9309: the group whose ``User-agent`` line
    is the LONGEST match of ``user_agent`` (case-insensitive substring
    product-token match) wins; ``*`` is the fallback; multiple UA lines
    may share one group. ``Sitemap`` is global (outside groups).
    Total: None/undecodable input -> empty rules. Input beyond the
    RFC's 500 KiB parse limit is ignored (the cut falls on the last
    line boundary inside the limit).
    """
    out = {"disallow": [], "allow": [], "crawl_delay": None, "sitemaps": []}
    if text is None:
        return out
    if isinstance(text, bytes):
        if len(text) > ROBOTS_PARSE_LIMIT:
            text = text[:ROBOTS_PARSE_LIMIT]
            text = text[: text.rfind(b"\n") + 1 or 0]
        text = text.decode("utf-8", "replace")
    elif len(text) > ROBOTS_PARSE_LIMIT:
        text = text[:ROBOTS_PARSE_LIMIT]
        text = text[: text.rfind("\n") + 1 or 0]
    ua = user_agent.lower()

    groups: list[tuple[list[str], dict]] = []  # (agents, rules)
    agents: list[str] = []
    rules: dict | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if rules is not None:  # a rule line closed the UA run
                groups.append((agents, rules))
                agents, rules = [], None
            agents.append(val.lower())
        elif key == "sitemap":
            if val:
                out["sitemaps"].append(val)
        elif key in ("disallow", "allow", "crawl-delay"):
            if not agents:
                continue  # rules before any user-agent: ignored
            if rules is None:
                rules = {"disallow": [], "allow": [], "crawl_delay": None}
            if key == "crawl-delay":
                try:
                    rules["crawl_delay"] = float(val)
                except ValueError:
                    pass
            elif val:  # empty Disallow == allow everything
                rules[key].append(val)
            elif key == "disallow":
                pass
    if agents and rules is not None:
        groups.append((agents, rules))

    best_len, best = -1, None
    for agts, r in groups:
        for a in agts:
            if a == "*":
                match_len = 0
            elif a and a in ua:
                match_len = len(a)
            else:
                continue
            if match_len > best_len:
                best_len, best = match_len, r
    if best is not None:
        out["disallow"] = best["disallow"]
        out["allow"] = best["allow"]
        out["crawl_delay"] = best["crawl_delay"]
    return out


def _path_rule_to_regex(rule: str) -> str:
    """RFC 9309 path rule -> regex fragment: ``*`` matches any run,
    trailing ``$`` anchors, everything else literal."""
    anchored = rule.endswith("$")
    if anchored:
        rule = rule[:-1]
    frag = ".*".join(re.escape(p) for p in rule.split("*"))
    return frag + ("$" if anchored else "")


# every per-rule regex is anchored at the end of the URL authority, so
# rules match the path exactly like RFC 9309 matches request paths
_URL_HEAD = r"^[a-z][a-z0-9+.-]*://[^/]*"


def _combined_pattern(rules: list[str]) -> str | None:
    if not rules:
        return None
    alts = "|".join(_path_rule_to_regex(d) for d in rules)
    return _URL_HEAD + "(?:" + alts + ")"


def _rule_structs(rules: list[str]) -> list[dict]:
    """Per-rule (regex, priority) pairs for RFC 9309 §2.2.2
    longest-match resolution. Priority is the OCTET LENGTH OF THE RULE
    ITSELF (not the matched span): that is what "the match that has
    the most octets" means in the RFC and what Google's open-source
    parser implements (priority = pattern length), and it keeps ties
    deterministic under ``*`` wildcards where greedy spans differ.
    Octets, not characters: a multibyte path like ``/café`` counts its
    UTF-8 bytes, matching RFC-conformant parsers on i18n rules."""
    return [
        {
            "rx": _URL_HEAD + "(?:" + _path_rule_to_regex(r) + ")",
            "prio": len(r.encode("utf-8")),
        }
        for r in rules
    ]


def match_prio_py(canon_url: str, rules: list[dict]) -> int:
    """Longest-match priority of ``canon_url`` against rule structs
    (-1 = no rule matches). Python twin of the JVM-side aggregate in
    operators/frontier.apply_robots; also drives the oracle."""
    best = -1
    for r in rules:
        if r["prio"] > best and re.search(r["rx"], canon_url):
            best = r["prio"]
    return best


def robots_allowed_py(
    canon_url: str,
    disallow_rules: list[dict],
    allow_rules: list[dict],
) -> bool:
    """RFC 9309 §2.2.2 verdict for one URL: the matching rule with the
    most octets wins; on a tie the least restrictive (Allow) wins; no
    matching rule means allowed."""
    dis = match_prio_py(canon_url, disallow_rules or [])
    if dis < 0:
        return True
    return match_prio_py(canon_url, allow_rules or []) >= dis


def robots_rules_row(
    registered_domain: str,
    text: str | bytes | None,
    user_agent: str = DEFAULT_UA,
    max_pages: int | None = None,
) -> dict:
    """One robots table row (the apply_robots/pick_batch schema) from
    one domain's robots.txt.

    Two-tier representation so URL-level enforcement stays JVM-side:
    ``skip_pattern`` / ``allow_pattern`` fold all Disallow / Allow
    rules into ONE anchored alternation regex each (a single ``rlike``
    answers "does ANY rule match"), while ``disallow_rules`` /
    ``allow_rules`` keep the per-rule (regex, octet-priority) structs
    that apply_robots aggregates ONLY on the rare rows where both a
    Disallow and an Allow match and RFC 9309 §2.2.2 longest-match must
    break the tie."""
    r = parse_robots_py(text, user_agent)
    return {
        "registered_domain": registered_domain,
        "skip_pattern": _combined_pattern(r["disallow"]),
        "no_recurse_prefix": None,
        "crawl_delay": r["crawl_delay"] or 0.0,
        "max_pages": max_pages,
        "allow_pattern": _combined_pattern(r["allow"]),
        "disallow_rules": _rule_structs(r["disallow"]),
        "allow_rules": _rule_structs(r["allow"]),
        "sitemaps": r["sitemaps"],
    }


def disallow_all_row(
    registered_domain: str, max_pages: int | None = None
) -> dict:
    """The RFC 9309 §2.3.1.4 "assume complete disallow" row — used
    when a domain's robots.txt answers with a server error (5xx)."""
    row = robots_rules_row(
        registered_domain, "User-agent: *\nDisallow: /\n",
        max_pages=max_pages,
    )
    return row


RULE_STRUCTS_TYPE = "array<struct<rx:string,prio:int>>"

ROBOTS_TABLE_SCHEMA = (
    "registered_domain string, skip_pattern string, "
    "no_recurse_prefix string, crawl_delay double, max_pages int, "
    f"allow_pattern string, disallow_rules {RULE_STRUCTS_TYPE}, "
    f"allow_rules {RULE_STRUCTS_TYPE}, sitemaps array<string>"
)

ROBOTS_TABLE_COLS = [
    "registered_domain", "skip_pattern", "no_recurse_prefix",
    "crawl_delay", "max_pages", "allow_pattern", "disallow_rules",
    "allow_rules", "sitemaps",
]


def robots_table(df, domain_col: str = "registered_domain",
                 text_col: str = "robots_txt",
                 user_agent: str = DEFAULT_UA):
    """(domain, robots_txt) -> the engine's broadcast robots table.

    One Arrow pass over the per-domain dimension (small by
    construction); the output drops straight into CrawlEngine(robots=).
    """
    import pandas as pd

    def _parse(pdf_iter):
        for pdf in pdf_iter:
            rows = [
                robots_rules_row(d, t, user_agent)
                for d, t in zip(pdf[domain_col], pdf[text_col])
            ]
            yield pd.DataFrame(rows, columns=ROBOTS_TABLE_COLS)

    return df.select(domain_col, text_col).mapInPandas(
        _parse, schema=ROBOTS_TABLE_SCHEMA
    )


# -- sitemaps ---------------------------------------------------------------

def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap_py(payload: str | bytes | None) -> dict:
    """sitemap.xml -> {kind: 'urlset'|'sitemapindex'|None, urls:
    [(loc, lastmod|None)], sitemaps: [loc]}. Namespace-tolerant, total
    on malformed XML. Gzip payloads (the sitemaps.org ``.xml.gz``
    convention — most large sites ship compressed sitemaps) are
    transparently decompressed, detected by magic bytes, total on
    truncated streams."""
    out = {"kind": None, "urls": [], "sitemaps": []}
    if not payload:
        return out
    if isinstance(payload, bytes) and payload[:2] == b"\x1f\x8b":
        import gzip

        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError):
            return out
    try:
        root = ET.fromstring(payload)
    except ET.ParseError:
        return out
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return out
    out["kind"] = kind
    for child in root:
        if _local(child.tag) not in ("url", "sitemap"):
            continue
        loc, lastmod = None, None
        for field in child:
            if _local(field.tag) == "loc":
                loc = (field.text or "").strip() or None
            elif _local(field.tag) == "lastmod":
                lastmod = (field.text or "").strip() or None
        if loc is None:
            continue
        if kind == "urlset":
            out["urls"].append((loc, lastmod))
        else:
            out["sitemaps"].append(loc)
    return out


SEEDS_SCHEMA = "url string, depth int, lastmod string"


def seeds_from_sitemaps(df, payload_col: str = "sitemap_xml"):
    """(.., sitemap_xml) -> seed rows (url, depth=0, lastmod) ready for
    CrawlEngine.init_from_seeds / the streaming seed merge. Index
    documents contribute their child sitemap locations as depth-0 URLs
    too (the fetch loop resolves them like any seed)."""
    import pandas as pd

    def _parse(pdf_iter):
        for pdf in pdf_iter:
            urls, depths, mods = [], [], []
            for xml in pdf[payload_col]:
                r = parse_sitemap_py(xml)
                for loc, lastmod in r["urls"]:
                    urls.append(loc); depths.append(0); mods.append(lastmod)
                for loc in r["sitemaps"]:
                    urls.append(loc); depths.append(0); mods.append(None)
            yield pd.DataFrame(
                {"url": urls, "depth": depths, "lastmod": mods}
            )

    return df.select(payload_col).mapInPandas(_parse, schema=SEEDS_SCHEMA)
