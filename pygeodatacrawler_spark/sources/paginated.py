"""Paginated source (S8): the harvestCSW page loop
(/root/reference/geodatacrawler/utils.py:374-414) as a driver loop that
unions one DataFrame per page, capped by maxrecords (O2), with the
CSW constraint semantics (property-equals filters) pushed into every
page request.

The page fetcher is injected (in production an HTTP GetRecords call per
page inside mapInPandas; in tests a slice of a DataFrame), so the
pagination/caps/filter logic is testable without a network.

Note on the reference's filter path (utils.py:391-397): it maps the
filter dict through ``filterMapping`` and builds ``PropertyIsEqualTo``
constraints, but calls ``constraints.push(...)`` (a JS-ism —
AttributeError on a Python list) and never passes ``constraints`` to
``getrecords2``, so the reference crashes on any non-empty filter.
This module implements the INTENDED semantics and does not replicate
the bug.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

# utils.py:385-390 — shorthand filter keys -> CSW queryable properties;
# unknown keys pass through verbatim (filterMapping.get(f, f))
CSW_FILTER_MAPPING = {
    "any": "csw:AnyText",
    "title": "dc:title",
    "keyword": "dc:subject",
    "type": "dc:type",
}


def map_csw_filters(filters: dict[str, str] | None) -> list[tuple[str, str]]:
    """filter dict -> [(queryable, value)] PropertyIsEqualTo pairs."""
    if not filters:
        return []
    return [
        (CSW_FILTER_MAPPING.get(k, k), v) for k, v in filters.items()
    ]


def read_paginated(
    fetch_page: Callable[..., DataFrame | None],
    pagesize: int = 50,
    maxrecords: int = 250,
    filters: dict[str, str] | None = None,
) -> DataFrame | None:
    """fetch_page(start, pagesize[, constraints]) -> DataFrame or None
    when exhausted.

    Mirrors the reference loop state (start=1-based nextrecord,
    utils.py:399-403): stop when a page is empty/None or maxrecords
    reached; trim the final page to the cap. ``filters`` is the
    reference's shorthand dict; its mapped PropertyIsEqualTo pairs are
    passed to EVERY page request (server-side selection — the filter
    prunes pages at the source, it is not a client-side post-filter).
    """
    constraints = map_csw_filters(filters)
    out: DataFrame | None = None
    start = 1
    fetched = 0
    while fetched < maxrecords:
        page = (
            fetch_page(start, pagesize, constraints)
            if constraints
            else fetch_page(start, pagesize)
        )
        if page is None:
            break
        n = page.count()
        if n == 0:
            break
        if fetched + n > maxrecords:
            page = page.limit(maxrecords - fetched)
            n = maxrecords - fetched
        out = page if out is None else out.unionByName(page)
        fetched += n
        start += pagesize
        if n < pagesize:
            break
    return out
