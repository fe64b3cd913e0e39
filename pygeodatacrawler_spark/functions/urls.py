"""URL canonicalization, registered-domain, depth, safe-filename.

Reimplements the reference's service-URL canonicalizer and filename
sanitizer as pure Catalyst Column expressions (JVM-side, codegen'd):

- canonicalize: strip fragment + the OWS-ish query params the reference
  drops (``request service version layers typeNames exceptions
  outputFormat``, see /root/reference/geodatacrawler/utils.py:274-285),
  lowercase scheme+host, default empty path to ``/``.
- safe_filename: strip ``()[]{}&~%+,`` and map ``# !/\\:;`` to ``-``
  (utils.py:865-874); the reference's unidecode ASCII-folding step is
  out of scope for the synthetic ASCII corpus and would be a pandas UDF.

Every function has a ``*_py`` twin with byte-identical semantics used by
the sequential oracle (oracle/refcrawl.py) and the fixture generator, so
crawl-ordering and URL-seen parity are testable per row.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
import pyspark.sql.functions as F

# Query params the reference strips when canonicalizing a service URL
# (utils.py:274-285 keeps e.g. `map=` but drops the OWS protocol params).
_STRIP_PARAMS = r"(?i:request|service|version|layers|typenames|exceptions|outputformat)"

# chars deleted / mapped to '-' by safeFileName (utils.py:865-874).
# '+' is in the reference's FIRST (delete) loop, so although it also
# appears in the dash list it is already gone by then — net effect:
# deleted. Apostrophe is untouched by the reference.
_DELETE_CHARS = "()[]{}&~%+,"
_DASH_CHARS = "# !/\\:;"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL as a single Column expression.

    Pipeline (mirrored exactly by :func:`canonicalize_url_py`):
      1. drop ``#fragment``
      2. ``?`` -> ``?&`` so every param is &-prefixed, drop stripped
         params, ``?&`` -> ``?``, drop trailing ``?``/``&``
      3. lowercase the ``scheme://host`` head (path/query untouched)
      4. empty path before ``?`` or end -> ``/``
    """
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, r"\?", "?&")
    u = F.regexp_replace(u, r"&(?:" + _STRIP_PARAMS + r")=[^&]*", "")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1))
    tail = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", "")
    tail = F.when(tail == "", F.lit("/")).when(
        tail.startswith("?"), F.concat(F.lit("/"), tail)
    ).otherwise(tail)
    return F.when(head == "", u).otherwise(F.concat(head, tail))


def canonicalize_url_py(url: str) -> str:
    """Sequential twin of :func:`canonicalize_url` (same regex pipeline)."""
    u = re.sub(r"#.*$", "", url)
    u = re.sub(r"\?", "?&", u)
    u = re.sub(r"&(?:" + _STRIP_PARAMS + r")=[^&]*", "", u)
    u = re.sub(r"\?&", "?", u)
    u = re.sub(r"[?&]+$", "", u)
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", u)
    if not m:
        return u
    head = m.group(1).lower()
    tail = u[m.end() :]
    if tail == "":
        tail = "/"
    elif tail.startswith("?"):
        tail = "/" + tail
    return head + tail


def registered_domain(url: Column) -> Column:
    """Last two host labels (two-label public-suffix simplification).

    A real deployment swaps this for a public-suffix-list pandas UDF;
    the synthetic corpus only uses ``*.example.org``-shaped hosts.
    """
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def registered_domain_py(url: str) -> str:
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", url)
    host = (m.group(1) if m else "").lower()
    host = host.split("@")[-1].split(":")[0]
    m2 = re.search(r"([^.]+\.[^.]+)$", host)
    return m2.group(1) if m2 else host


def url_depth(url: Column) -> Column:
    """Number of non-empty path segments (crawl depth analog)."""
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    return F.size(F.filter(F.split(path, "/"), lambda x: x != ""))


def url_depth_py(url: str) -> int:
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", url)
    path = m.group(1) if m else ""
    return len([s for s in path.split("/") if s])


def safe_filename(name: Column) -> Column:
    """safeFileName semantics (utils.py:865-874) as translate() exprs.

    translate() maps positionally and deletes chars past the end of the
    replacement string — so the dash-mapped chars come first. '+' is
    deleted (reference's first loop wins); apostrophes pass through.
    """
    return F.translate(name, _DASH_CHARS + _DELETE_CHARS, "-" * len(_DASH_CHARS))


def safe_filename_py(name: str) -> str:
    return name.translate(
        str.maketrans(
            {**{c: None for c in _DELETE_CHARS}, **{c: "-" for c in _DASH_CHARS}}
        )
    )


def ascii_fold_py(s: str) -> str:
    """NFKD transliteration to ASCII — the stdlib core of the
    reference's unidecode step (utils.py:874). Covers Latin accent
    folding ('Páblito' -> 'Pablito'); unidecode's wider tables (CJK
    romanization etc.) are out of scope, documented as such."""
    import unicodedata

    return (
        unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")
    )


def ascii_fold(name: Column) -> Column:
    """Arrow-batched twin of :func:`ascii_fold_py` (no built-in Spark
    transliteration). Cold-path only — filenames at sink time, never in
    per-row crawl logic."""
    import pandas as pd  # noqa: F401  (Arrow batch type)
    from pyspark.sql.functions import pandas_udf

    # note: no parameter annotations — `from __future__ import
    # annotations` stringifies them, which breaks eval-type inference
    def _fold_impl(s):
        return s.map(lambda x: ascii_fold_py(x) if x is not None else None)

    _fold = pandas_udf(_fold_impl, "string")
    return _fold(name)


def url_hash(canon_url: Column) -> Column:
    """64-bit key of a canonical URL — the frontier/seen join key.

    xxhash64 is stable across Spark versions and partitions; the oracle
    keeps the canonical string itself so membership parity is exact.
    """
    return F.xxhash64(canon_url)
