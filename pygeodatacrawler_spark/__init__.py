"""pygeodatacrawler_spark — a PySpark-native distributed crawl-and-index engine.

A from-scratch rebuild of the capabilities of pvgenuchten/pyGeoDataCrawler
(reference at /root/reference, read-only) as a distributed URL-frontier +
fetch scheduler over snapshot tables of Common-Crawl-style web pages:

- ``functions/``  — pure-Column scalar functions (URL canonicalization,
  safe filenames, portable hashes, text quality metrics) plus the
  vectorized pandas/Arrow UDF surface (text/link extraction, metadata
  sniffing). No per-row Python in any hot path.
- ``operators/``  — composed DataFrame operators: dedup family (exact,
  MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
  search (brute-force + LSH-bucketed ANN), window-based schedulers
  (first-match-wins, per-host top-k, token budgets), the partitioned
  bloom-filter seen-set.
- ``plans/``      — the crawl loop itself: round-based frontier expansion
  with politeness, skew salting, per-round snapshots and lineage.
- ``sources/``    — batch sources/sinks (parquet tables, CSV dialects,
  paginated sources).
- ``streaming/``  — Structured-Streaming analogs of the round loop.
- ``oracle/``     — a tiny sequential Python implementation of the same
  crawl spec (reference semantics: traversal order, URL-seen membership,
  byte-identical extraction) used by parity tests.

Everything is DataFrame-first: Catalyst handles pruning/pushdown/codegen;
Python appears only inside Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
