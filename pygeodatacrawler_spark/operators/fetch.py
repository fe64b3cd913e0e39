"""Real HTTP fetch (S7): a mapInPandas body with fetchUrl semantics.

Replicates the reference's ``fetchUrl`` (/root/reference/
geodatacrawler/utils.py:852-863) behind the CrawlEngine ``fetch_fn``
interface (url batch in -> (url, html) batch out):

- User-Agent ``pyGeoDataCrawler {version};  (mailto:{contact})``
  (two spaces after the ';' — byte parity with the reference's
  f-string), contact defaulting from the ``pgdc_contact`` env var;
- 5 s timeout;
- ``raise_for_status`` — non-2xx responses are dropped, which the
  engine turns into a null-text record (the 404 analog);
- on ``requests.exceptions.SSLError``: one retry with ``verify=False``.

Scale shape: one ``requests.Session`` per Arrow batch (connection
pooling per task — at 10^10 URLs, per-request TCP+TLS setup would
dominate), rows processed in URL order within the batch. Per-host
politeness (``crawl_delay`` from the robots table) is enforced
in-task: batches arrive host-co-located (the engine repartitions on
(registered_domain, salt)), so a driver-side dict of delays and a
per-task last-hit clock give each host its spacing without any
cross-task coordination. A salted heavy host is spread over
``salt_buckets`` tasks, so its effective rate is buckets/delay — salt
only activates above the heavy threshold where the operator's intent
is throughput, matching the budget scheduler's semantics.

The fetch body itself is plain-Python-per-URL because HTTP I/O is; it
runs inside the engine's fused fetch+extract mapInPandas stage, so
html bytes still die in the task that fetched them.
"""

from __future__ import annotations

import os

from pygeodatacrawler_spark.functions.urls import host_registered_domain_py


def default_user_agent(version: str = "", contact: str | None = None) -> str:
    """The reference's UA template (utils.py:855-856)."""
    if contact is None:
        contact = os.getenv("pgdc_contact") or ""
    return f"pyGeoDataCrawler {version};  (mailto:{contact})"


def make_http_fetch_fn(
    version: str = "",
    contact: str | None = None,
    timeout: float = 5.0,
    crawl_delays: dict[str, float] | None = None,
    user_agent: str | None = None,
):
    """Build a CrawlEngine ``fetch_fn`` that does real HTTP GETs.

    ``crawl_delays`` maps registered_domain -> seconds between requests
    (the robots table's ``crawl_delay`` column, collected driver-side:
    one small row per domain, same size class as the broadcast robots
    join). Failures of any kind (HTTP error status, timeout, connection
    refused, bad URL) drop the row — the engine records them as
    null-text fetches, like the reference logging and moving on.
    """
    ua = user_agent or default_user_agent(version, contact)
    delays = dict(crawl_delays or {})

    def _fetch(pdf_iter):
        import time  # noqa: PLC0415 (executor-side)
        from urllib.parse import urlparse  # noqa: PLC0415

        import pandas as pd  # noqa: PLC0415
        import requests  # noqa: PLC0415

        hdr = {"User-Agent": ua}
        last_hit: dict[str, float] = {}
        with requests.Session() as session:
            for pdf in pdf_iter:
                out_urls, out_html = [], []
                for url in pdf["url"]:
                    host = urlparse(url).hostname or ""
                    # delays are keyed on registered_domain (public-
                    # suffix aware, functions/urls.py); fall back to
                    # the full hostname for localhost-style keys
                    reg = host_registered_domain_py(host)
                    delay = delays.get(host, delays.get(reg, 0.0))
                    if delay > 0:
                        wait = last_hit.get(host, -delay) + delay - time.monotonic()
                        if wait > 0:
                            time.sleep(wait)
                        last_hit[host] = time.monotonic()
                    try:
                        try:
                            r = session.get(url, headers=hdr, timeout=timeout)
                            r.raise_for_status()
                        except requests.exceptions.SSLError:
                            # retry without cert validation (utils.py:861-863)
                            r = session.get(
                                url, headers=hdr, verify=False, timeout=timeout
                            )
                            r.raise_for_status()
                    except requests.exceptions.RequestException:
                        continue  # 404/timeout/etc -> null-text record
                    out_urls.append(url)
                    out_html.append(r.content)
                yield pd.DataFrame({"url": out_urls, "html": out_html})

    return _fetch


def fetch_robots_table(
    urls_df,
    url_col: str = "url",
    user_agent: str | None = None,
    version: str = "",
    contact: str | None = None,
    timeout: float = 5.0,
    max_pages: int | None = None,
    scope: str = "domain",
):
    """Seed/frontier URLs -> the engine's broadcast robots table, by
    fetching ``scheme://host/robots.txt`` ONCE per registered domain
    (``scope="domain"``, default) or ONCE per hostname
    (``scope="host"`` — the RFC 9309 §2.3 per-authority scope).

    The domain dimension is broadcast-sized by definition (one row per
    domain), but the fetch still runs executor-side as one Arrow pass
    — no driver-side HTTP loop.

    Status semantics (RFC 9309 §2.3.1): 200 -> parse; 4xx (and network
    errors) -> "unavailable", crawl is unrestricted; 5xx -> "assume
    complete disallow" (the domain row blocks every path until a later
    refresh succeeds).

    APPROXIMATION (``scope="domain"``, documented): RFC 9309 scopes
    robots.txt per authority (scheme://host), but the engine's
    politeness table — like its crawl-delay budget and host salting —
    is keyed on registered_domain, so ONE host's rules govern the
    whole domain. The host is chosen deterministically: https over
    http, the apex host (host == registered_domain) over subdomains,
    then shortest host, then lexicographic — so
    ``https://example.org/robots.txt`` is preferred over
    ``http://api.example.org/robots.txt`` regardless of frontier
    order.

    ``scope="host"`` removes the approximation: one robots.txt fetch
    per hostname (https preferred when both schemes appear), the key
    column is ``host``, and ``apply_robots`` joins frontier URLs on
    their hostname so every subdomain is governed by its own rules.
    The table is one row per host — still dimension-class (hosts per
    domain is a small constant even at 10^10 URLs), still broadcast.
    In-task crawl-delay pacing picks the host key up unchanged
    (``make_http_fetch_fn`` looks delays up host-first).

    Output columns drop straight into ``CrawlEngine(robots=...)``
    (+ ``allow_pattern``/rule structs for RFC precedence and a
    ``sitemaps`` array for functions.robots.seeds_from_sitemaps).
    """
    import pyspark.sql.functions as F

    from pygeodatacrawler_spark.functions.robots import (
        DEFAULT_UA,
        ROBOTS_TABLE_COLS,
        ROBOTS_TABLE_SCHEMA,
        disallow_all_row,
        robots_rules_row,
    )
    from pygeodatacrawler_spark.functions.urls import registered_domain

    if scope not in ("domain", "host"):
        raise ValueError(f"scope must be 'domain' or 'host', got {scope!r}")
    ua = user_agent or default_user_agent(version, contact) or DEFAULT_UA
    head = F.regexp_extract(
        F.col(url_col), r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1
    )
    host = F.lower(F.regexp_extract(head, r"://(?:[^/@]*@)?([^/:]+)", 1))
    key = "registered_domain" if scope == "domain" else "host"
    dim = (
        urls_df.select(
            registered_domain(F.col(url_col)).alias("registered_domain"),
            F.concat(head, F.lit("/robots.txt")).alias("robots_url"),
            host.alias("host"),
        )
        .filter(F.col("robots_url") != "/robots.txt")
        .groupBy(key)
        .agg(
            F.min(
                F.struct(
                    F.when(
                        F.col("robots_url").startswith("https://"), 0
                    ).otherwise(1).alias("p_scheme"),
                    F.when(
                        F.col("host") == F.col("registered_domain"), 0
                    ).otherwise(1).alias("p_apex")
                    if scope == "domain"
                    else F.lit(0).alias("p_apex"),
                    F.length("host").alias("p_len"),
                    F.col("robots_url").alias("robots_url"),
                )
            ).alias("s")
        )
        .select(
            F.col(key).alias("registered_domain"),
            F.col("s.robots_url").alias("robots_url"),
        )
    )

    def _fetch_parse(pdf_iter):
        import pandas as pd  # noqa: PLC0415 (executor-side)
        import requests  # noqa: PLC0415

        hdr = {"User-Agent": ua}
        with requests.Session() as session:
            for pdf in pdf_iter:
                rows = []
                for dom, rurl in zip(
                    pdf["registered_domain"], pdf["robots_url"]
                ):
                    text, server_error = None, False
                    try:
                        r = session.get(rurl, headers=hdr, timeout=timeout)
                        if r.status_code == 200:
                            text = r.text
                        elif r.status_code >= 500:
                            server_error = True
                    except (
                        requests.exceptions.Timeout,
                        requests.exceptions.ConnectionError,
                    ):
                        # RFC 9309 §2.3.1.4: UNREACHABLE robots.txt
                        # (server or NETWORK errors — timeout, refused,
                        # DNS) MUST be treated as complete disallow,
                        # same as 5xx (round-6 advice fix; previously
                        # network errors fell through to unrestricted)
                        server_error = True
                    except requests.exceptions.RequestException:
                        text = None  # unavailable (4xx-class) -> unrestricted
                    rows.append(
                        disallow_all_row(dom, max_pages=max_pages)
                        if server_error
                        else robots_rules_row(dom, text, ua, max_pages=max_pages)
                    )
                yield pd.DataFrame(rows, columns=ROBOTS_TABLE_COLS)

    out = dim.mapInPandas(_fetch_parse, schema=ROBOTS_TABLE_SCHEMA)
    if scope == "host":
        # key column is the hostname: apply_robots joins on it per
        # RFC 9309 §2.3 authority scope (and must not collide with the
        # frontier's own registered_domain column)
        out = out.withColumnRenamed("registered_domain", "host")
    return out
