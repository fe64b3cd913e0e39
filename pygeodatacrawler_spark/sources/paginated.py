"""Paginated source (S8): the harvestCSW page loop
(/root/reference/geodatacrawler/utils.py:374-414) as a driver loop that
unions one DataFrame per page, capped by maxrecords (O2).

The page fetcher is injected (in production an HTTP GetRecords call per
page inside mapInPandas; in tests a slice of a DataFrame), so the
pagination/caps logic is testable without a network.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def read_paginated(
    fetch_page: Callable[[int, int], DataFrame | None],
    pagesize: int = 50,
    maxrecords: int = 250,
) -> DataFrame | None:
    """fetch_page(start, pagesize) -> DataFrame or None when exhausted.

    Mirrors the reference loop state (start=1-based nextrecord,
    utils.py:399-403): stop when a page is empty/None or maxrecords
    reached; trim the final page to the cap.
    """
    out: DataFrame | None = None
    start = 1
    fetched = 0
    while fetched < maxrecords:
        page = fetch_page(start, pagesize)
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
