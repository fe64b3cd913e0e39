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
from functools import lru_cache

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


# Multi-label public suffixes (a curated subset of the Mozilla Public
# Suffix List's most-registered two-label suffixes: ccTLD second-level
# registries plus the common CentralNic private ones). A host ending in
# one of these registers at the THIRD label (www.example.co.uk ->
# example.co.uk); anything else registers at the second label. The
# high-traffic THREE-label suffixes (act.edu.au, k12.ca.us, ...) have
# their own table below; anything rarer (wildcarded *.sch.uk, the JP
# geographic scheme) falls back, documented here.
PSL_MULTI_SUFFIXES: tuple[str, ...] = (
    # United Kingdom / Ireland
    "co.uk", "org.uk", "me.uk", "net.uk", "ac.uk", "gov.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "police.uk", "mod.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz", "mil.nz",
    # Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za", "edu.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "info.ke",
    "me.ke", "mobi.ke",
    "co.tz", "or.tz", "ne.tz", "go.tz", "ac.tz", "sc.tz",
    "co.ug", "or.ug", "ne.ug", "go.ug", "ac.ug", "sc.ug",
    "com.gh", "org.gh", "gov.gh", "edu.gh",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "sch.ng",
    "name.ng", "mobi.ng",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg",
    "co.ma", "net.ma", "org.ma", "gov.ma", "ac.ma", "press.ma",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "blog.br", "eco.br", "adv.br", "ind.br", "inf.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "mil.ar", "tur.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co", "nom.co",
    "mil.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "mil.pe",
    "nom.pe",
    "gob.cl", "gov.cl", "mil.cl",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "mil.ve",
    "com.ec", "net.ec", "org.ec", "gob.ec", "edu.ec", "mil.ec",
    "fin.ec", "med.ec", "pro.ec", "info.ec",
    "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy", "mil.uy",
    "com.bo", "net.bo", "org.bo", "gob.bo", "edu.bo", "mil.bo",
    "com.py", "net.py", "org.py", "gov.py", "edu.py", "mil.py",
    "com.gt", "net.gt", "org.gt", "gob.gt", "edu.gt", "mil.gt",
    "com.do", "net.do", "org.do", "gob.do", "edu.do", "mil.do",
    "web.do", "art.do",
    "com.sv", "gob.sv", "org.sv", "edu.sv", "red.sv",
    "com.pa", "net.pa", "org.pa", "gob.pa", "edu.pa", "ac.pa",
    "co.cr", "fi.cr", "go.cr", "or.cr", "sa.cr", "ac.cr", "ed.cr",
    "com.ni", "gob.ni", "edu.ni", "org.ni", "net.ni",
    "com.hn", "net.hn", "org.hn", "gob.hn", "edu.hn", "mil.hn",
    "gc.ca",
    # Asia
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "ms.kr", "es.kr", "hs.kr", "sc.kr", "kg.kr", "mil.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "mil.cn", "ah.cn", "bj.cn", "gd.cn", "sh.cn", "tj.cn", "zj.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "game.tw", "club.tw", "ebiz.tw", "mil.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "gov.in", "ac.in", "edu.in", "res.in", "nic.in", "mil.in",
    "co.th", "net.th", "or.th", "go.th", "ac.th", "in.th", "mi.th",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "co.id", "net.id", "or.id", "go.id", "ac.id", "sch.id", "web.id",
    "my.id", "biz.id", "desa.id", "ponpes.id", "mil.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "mil.ph", "i.ph",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "fam.pk",
    "web.pk", "biz.pk", "gok.pk", "gop.pk", "gos.pk", "gob.pk",
    "com.bd", "net.bd", "org.bd", "gov.bd", "edu.bd", "ac.bd",
    "mil.bd",
    "com.lk", "net.lk", "org.lk", "gov.lk", "edu.lk", "sch.lk",
    "ac.lk", "int.lk", "ngo.lk", "soc.lk", "web.lk",
    "com.np", "net.np", "org.np", "gov.np", "edu.np", "mil.np",
    "aero.np",
    "co.ir", "net.ir", "org.ir", "gov.ir", "ac.ir", "id.ir", "sch.ir",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa",
    "sch.sa", "pub.sa",
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae", "mil.ae",
    "com.kw", "net.kw", "org.kw", "gov.kw", "edu.kw", "ind.kw",
    "com.qa", "net.qa", "org.qa", "gov.qa", "edu.qa", "mil.qa",
    "name.qa", "sch.qa",
    "com.bh", "net.bh", "org.bh", "gov.bh", "edu.bh",
    "com.om", "net.om", "org.om", "gov.om", "edu.om", "med.om",
    "museum.om", "pro.om",
    "com.jo", "net.jo", "org.jo", "gov.jo", "edu.jo", "mil.jo",
    "name.jo", "sch.jo",
    "com.lb", "net.lb", "org.lb", "gov.lb", "edu.lb",
    "com.kz", "org.kz", "edu.kz", "gov.kz", "mil.kz", "net.kz",
    "com.uz", "co.uz", "net.uz", "org.uz",
    # Europe
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "kiev.ua", "kyiv.ua", "lviv.ua", "odessa.ua", "kharkov.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "info.pl", "biz.pl", "mil.pl",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "gen.tr",
    "bel.tr", "web.tr", "av.tr", "dr.tr", "k12.tr", "name.tr",
    "pol.tr", "mil.tr", "tsk.tr", "bbs.tr", "biz.tr", "info.tr",
    "tel.tr", "tv.tr",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il",
    "k12.il", "idf.il",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru", "int.ru",
    "gouv.fr", "asso.fr", "com.fr", "nom.fr", "prd.fr", "tm.fr",
    "avocat.fr", "aeroport.fr",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
    "co.at", "or.at", "gv.at", "ac.at", "priv.at",
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
    "2000.hu", "agrar.hu", "bolt.hu", "city.hu", "film.hu",
    "forum.hu", "games.hu", "hotel.hu", "news.hu", "shop.hu",
    "suli.hu", "sex.hu", "szex.hu", "media.hu", "lakas.hu",
    "ingatlan.hu", "konyvelo.hu", "erotica.hu", "erotika.hu",
    "casino.hu", "jogasz.hu", "reklam.hu", "tozsde.hu", "utazas.hu",
    "video.hu",
    "ac.be", "gov.it", "edu.it", "co.nl",
    "co.gg", "net.gg", "org.gg", "co.je", "net.je", "org.je",
    "co.im", "net.im", "org.im", "ac.im", "com.im", "tt.im", "tv.im",
    # CentralNic-style private second-level registries
    "uk.com", "us.com", "eu.com", "de.com", "gb.net", "uk.net",
    "se.net", "jpn.com", "za.com", "br.com", "cn.com", "hu.com",
    "no.com", "qc.com", "sa.com", "ru.com", "uy.com", "ar.com",
    "gr.com", "kr.com", "us.org", "co.com", "mex.com", "web.com",
    "africa.com", "in.net",
)

# Three-label public suffixes (the high-traffic subset the 2-label
# table above cannot express): Australian state education/government
# registries (schools register at the fourth label: name.act.edu.au)
# and the US locality scheme's k12/cc/lib second-level-per-state
# registries (school.k12.ca.us). Generated from their published
# systematic schemes, like the PSL lists them.
_AU_STATES = ("act", "nsw", "nt", "qld", "sa", "tas", "vic", "wa")
_US_STATES = (
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy",
)
PSL_THREE_LABEL_SUFFIXES: tuple[str, ...] = tuple(
    f"{st}.{kind}.au" for st in _AU_STATES for kind in ("edu", "gov")
) + tuple(
    f"{kind}.{st}.us" for st in _US_STATES for kind in ("k12", "cc", "lib")
)

# the US geographic 2-label suffixes (ca.us, ny.us, ...) ride the same
# systematic scheme — city.berkeley.ca.us registers at the third label
_PSL_SET = frozenset(
    PSL_MULTI_SUFFIXES + tuple(f"{st}.us" for st in _US_STATES)
)
_PSL3_SET = frozenset(PSL_THREE_LABEL_SUFFIXES)
_TWO_RE = r"([^.]+\.[^.]+)$"
_THREE_RE = r"([^.]+\.[^.]+\.[^.]+)$"
_FOUR_RE = r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$"


def registered_domain(url: Column) -> Column:
    """Registered (registrable) domain of the URL's host.

    Public-suffix aware: a host whose last THREE labels form a known
    3-label suffix (``PSL_THREE_LABEL_SUFFIXES`` — act.edu.au,
    k12.ca.us, ...) keeps FOUR labels; else a host whose last TWO
    labels form a known multi-label suffix (``PSL_MULTI_SUFFIXES`` —
    co.uk, com.au, co.jp, ...) keeps THREE; every other host keeps
    two. The suffix tests are ``isin`` over literal sets — Catalyst
    compiles them to O(1) InSet hash probes, NOT regex alternations —
    so this stays cheap on the crawl expand hot path. Suffixes outside
    the curated subsets fall back to fewer labels.
    """
    return host_registered_domain(F.try_parse_url(url, F.lit("HOST")))


def host_registered_domain(host: Column) -> Column:
    """Registered domain of a bare hostname Column (same PSL logic as
    ``registered_domain``, for inputs that are already hosts — e.g.
    PageRank's host-keyed output mapped onto the politeness key). A
    host with no dot (or empty/NULL) passes through unchanged, like
    the ``host_registered_domain_py`` twin."""
    host = F.lower(host)
    two = F.regexp_extract(host, _TWO_RE, 1)
    three = F.regexp_extract(host, _THREE_RE, 1)
    four = F.regexp_extract(host, _FOUR_RE, 1)
    return (
        F.when(three.isin(*_PSL3_SET) & (four != ""), four)
        .when(two.isin(*_PSL_SET) & (three != ""), three)
        .when(two == "", host)
        .otherwise(two)
    )


def host_registered_domain_py(host: str) -> str:
    host = (host or "").lower()
    parts = host.rsplit(".", 4)
    if len(parts) >= 4 and ".".join(parts[-3:]) in _PSL3_SET:
        return ".".join(parts[-4:])
    if len(parts) >= 3 and ".".join(parts[-2:]) in _PSL_SET:
        return ".".join(parts[-3:])
    m2 = re.search(_TWO_RE, host)
    return m2.group(1) if m2 else host


@lru_cache(maxsize=64)
def canonicalize_url_named(col_name: str) -> Column:
    """Memoized ``canonicalize_url(F.col(col_name))``.

    Building these expressions is driver-side py4j work — the
    registered-domain PSL ``isin`` sets alone marshal ~800 literals per
    call, measured at ~0.5 s per (canonicalize + registered_domain)
    construction. The crawl loop builds the same three expressions
    every round (guide §7.3 driver-side overhead); an unresolved Column
    keyed by input column NAME is immutable and session-independent, so
    one instance serves every round and every query. Cached per name,
    not per Column, because Column objects don't hash."""
    return canonicalize_url(F.col(col_name))


@lru_cache(maxsize=64)
def registered_domain_named(col_name: str) -> Column:
    """Memoized ``registered_domain(F.col(col_name))`` (see above)."""
    return registered_domain(F.col(col_name))


def registered_domain_py(url: str) -> str:
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", url)
    host = (m.group(1) if m else "").lower()
    host = host.split("@")[-1].split(":")[0]
    return host_registered_domain_py(host)


def url_host(url: Column) -> Column:
    """Lowercased hostname of the URL (no port, no userinfo) — the
    per-authority key RFC 9309 §2.3 scopes robots.txt by."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_host_py(url: str) -> str:
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", url)
    host = (m.group(1) if m else "").lower()
    return host.split("@")[-1].split(":")[0]


def url_depth(url: Column) -> Column:
    """Number of non-empty path segments (crawl depth analog)."""
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
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


def url_template(url: Column) -> Column:
    """Structural URL template for crawl-trap detection: host + path
    with variable parts collapsed — hex/uuid-ish runs (>=8 chars,
    incl. dashed UUIDs) -> ``~h``, digit runs -> ``~d`` — and the
    query reduced to its sorted parameter NAMES (values are the
    variable part; the name set is the structure). Calendar traps
    (``/2024/01/02/``), session-id mills (``?sid=...``), and
    faceted-search explosions all collapse onto one template while
    genuinely distinct pages keep distinct templates. Pure column
    exprs — JVM-side, zero-UDF.

    TOTAL on any non-NULL string: host/path/query come from the same
    regexes as ``url_template_py`` (not try_parse_url, whose NULL on a
    java.net.URI-rejected URL would both lump every malformed URL
    under one NULL template and make the trap anti-join — null never
    equals — unable to drop them)."""
    raw_host = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1
    )
    host = F.split(
        F.element_at(F.split(F.lower(raw_host), "@"), -1), ":"
    ).getItem(0)
    path = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(path, r"[0-9a-fA-F-]{8,}", "~h")
    path = F.regexp_replace(path, r"[0-9]+", "~d")
    query = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*[^?#]*\?([^#]*)", 1
    )
    names = F.array_sort(
        F.filter(
            F.transform(
                F.split(query, "&"),
                lambda kv: F.split(kv, "=").getItem(0),
            ),
            lambda k: k != "",
        )
    )
    return F.concat(
        host,
        path,
        F.when(F.size(names) > 0, F.concat(F.lit("?"), F.array_join(names, "&")))
        .otherwise(F.lit("")),
    )


def url_template_py(url: str) -> str:
    """Driver-side twin of url_template (tests/oracles)."""
    host = url_host_py(url)
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", url)
    path = m.group(1) if m else ""
    path = re.sub(r"[0-9a-fA-F-]{8,}", "~h", path)
    path = re.sub(r"[0-9]+", "~d", path)
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*[^?#]*\?([^#]*)", url)
    query = m.group(1) if m else ""
    names = sorted(
        n for n in (kv.split("=")[0] for kv in query.split("&")) if n
    )
    return host + path + ("?" + "&".join(names) if names else "")
