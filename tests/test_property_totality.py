"""Property-based totality + parity for the round-5 surfaces.

Two contracts, checked on adversarial inputs rather than fixtures:

1. **url_template parity** — the JVM column expression and its
   driver-side ``url_template_py`` twin must agree byte-for-byte on
   fuzzed URLs (the trap detector and its oracle both depend on the
   template function collapsing identically on both sides).
2. **WARC/WET parser totality** — ``iter_warc_records`` /
   ``iter_warc_typed`` / ``_gzip_members`` never raise on garbage,
   truncated, or bit-flipped archives (executor-side decode of
   untrusted Common-Crawl-shaped bytes must be total: a poison record
   may yield nothing, never kill the task), and a mutated-but-valid
   prefix still yields every intact record before the corruption.
"""

from __future__ import annotations

import gzip

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from pygeodatacrawler_spark.functions.urls import url_template, url_template_py
from pygeodatacrawler_spark.sources.warc import (
    _gzip_members,
    iter_warc_conversions,
    iter_warc_records,
    iter_warc_typed,
    write_warc_file,
)
from pygeodatacrawler_spark.sources.wet import _render_wet_record

# -- url_template parity ------------------------------------------------

_HOST = st.from_regex(r"[a-z]{1,6}(\.[a-z]{1,6}){1,2}", fullmatch=True)
# path segments that exercise every collapse rule: digit runs, hex/uuid
# runs, percent-escapes, dots, and plain words
_SEG = st.sampled_from(
    [
        "posts", "2024", "01", "a1b2c3d4e5f6", "deadbeef-dead-beef",
        "x", "%41%42", "v1.2.3", "index.html", "0", "~user",
        "ABCDEF1234", "café",
    ]
)
_PATH = st.lists(_SEG, min_size=0, max_size=4).map(
    lambda segs: "".join("/" + s for s in segs)
)
# query pairs including the adversarial shapes: empty names (?=5),
# empty values, doubled separators, names without '='
_PAIR = st.sampled_from(
    [
        "a=1", "sid=ABC123", "b=", "=5", "c", "", "a=x=y", "A=2",
        "page=999", "utm_source=x",
    ]
)
_QUERY = st.lists(_PAIR, min_size=0, max_size=4).map(
    lambda ps: "?" + "&".join(ps) if ps else ""
)
_FRAG = st.sampled_from(["", "#f", "#x?y=1"])


@st.composite
def _urls(draw):
    return (
        draw(st.sampled_from(["http", "https"]))
        + "://" + draw(_HOST) + draw(_PATH) + draw(_QUERY) + draw(_FRAG)
    )


@settings(max_examples=8, deadline=None)
@given(st.lists(_urls(), min_size=1, max_size=50))
def _check_templates(spark, batch):
    df = spark.createDataFrame([(u,) for u in batch], "url string")
    rows = df.select(url_template(F.col("url")).alias("t")).collect()
    for u, r in zip(batch, rows):
        assert r["t"] == url_template_py(u), u


def test_url_template_parity_property(spark):
    _check_templates(spark)


def test_url_template_parity_malformed(spark):
    """Parity must hold on URLs java.net.URI would reject too — the
    template function is regex-total on both sides, so malformed
    frontier URLs group under real templates (never NULL) and the
    trap anti-join can drop them."""
    bad = [
        "http://exa mple.com/x",
        "not-a-url",
        "http://",
        "http:///path/only",
        "http://h.org/a b/99999999?x=1&=2",
        "ftp://user@h.org:21/dir/12345678abc/",
        "http://h.org/%zz/2024?",
        "//scheme.less/path",
        "",
        "http://[::1]:8080/p/1",
    ]
    df = spark.createDataFrame([(u,) for u in bad], "url string")
    rows = df.select(url_template(F.col("url")).alias("t")).collect()
    for u, r in zip(bad, rows):
        assert r["t"] == url_template_py(u), repr(u)
        assert r["t"] is not None, repr(u)


# -- WARC parser totality -----------------------------------------------

_TS = "2024-01-02T03:04:05Z"


def _consume_all(data: bytes):
    """Run every parser over the bytes; totality = no exception."""
    out = list(iter_warc_records(data))
    list(iter_warc_typed(data, "conversion"))
    list(iter_warc_conversions(data))
    list(_gzip_members(data))
    return out


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_warc_parsers_total_on_garbage(data):
    _consume_all(data)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_warc_parsers_total_on_warc_prefixed_garbage(tail):
    # bytes that LOOK like a record start but lie about everything
    _consume_all(b"WARC/1.0\r\n" + tail)
    _consume_all(b"WARC/1.0\r\nContent-Length: 999999\r\n\r\n" + tail)
    _consume_all(
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: not-a-number\r\n\r\n" + tail
    )


_BODY = st.binary(min_size=0, max_size=200)


@st.composite
def _archives(draw):
    """A valid multi-record archive built by the fixture writer."""
    n = draw(st.integers(min_value=1, max_value=4))
    records = [
        (
            f"http://h{i}.org/p{i}",
            _TS,
            draw(st.sampled_from([200, 301, 404, 500])),
            draw(st.sampled_from(["text/html", "text/plain", ""])),
            draw(_BODY),
        )
        for i in range(n)
    ]
    return records


@settings(max_examples=25, deadline=None)
@given(_archives(), st.data())
def test_warc_truncation_yields_prefix(tmp_path_factory, records, data):
    """Cutting a valid archive at ANY byte offset yields a (possibly
    empty) prefix of the full record list and never raises."""
    import io

    buf = tmp_path_factory.mktemp("warc") / "a.warc"
    write_warc_file(records, str(buf))
    full = buf.read_bytes()
    whole = _consume_all(full)
    assert len(whole) == len(records)
    for (url, _, status, _, body), got in zip(records, whole):
        assert got[0] == url and got[2] == body and got[3] == status
    cut = data.draw(st.integers(min_value=0, max_value=len(full)))
    part = _consume_all(full[:cut])
    assert len(part) <= len(whole)
    for exp, got in zip(whole, part):
        # every record the truncated parse DOES yield is intact or a
        # clean prefix-truncated payload of the true record (a cut
        # inside the last record's body yields best-effort bytes);
        # URL and timestamp come from headers and must match exactly
        assert got[0] == exp[0]
        assert exp[1] == got[1]
        assert exp[2].startswith(got[2])


@settings(max_examples=25, deadline=None)
@given(_archives(), st.data())
def test_warc_bitflip_total(tmp_path_factory, records, data):
    buf = tmp_path_factory.mktemp("warc") / "a.warc"
    write_warc_file(records, str(buf))
    full = bytearray(buf.read_bytes())
    if full:
        i = data.draw(st.integers(min_value=0, max_value=len(full) - 1))
        full[i] ^= data.draw(st.integers(min_value=1, max_value=255))
    _consume_all(bytes(full))


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_gzip_members_total_on_corrupt_members(data):
    """Concatenated gzip members with one corrupted: every member
    before the corruption still decompresses; nothing raises."""
    texts = data.draw(
        st.lists(st.binary(min_size=0, max_size=100), min_size=1, max_size=4)
    )
    members = [gzip.compress(t) for t in texts]
    k = data.draw(st.integers(min_value=0, max_value=len(members) - 1))
    bad = bytearray(members[k])
    if len(bad) > 10:
        bad[10] ^= 0xFF
    members[k] = bytes(bad)
    out = list(_gzip_members(b"".join(members)))
    assert out[:k] == texts[:k]


@settings(max_examples=40, deadline=None)
@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
    )
)
def test_wet_record_roundtrip_any_text(text):
    """WET conversion render -> parse recovers the exact text for any
    unicode payload (the WET sink's byte contract)."""
    rec = _render_wet_record("http://h.org/x", _TS, text.encode("utf-8"))
    rows = list(iter_warc_conversions(rec))
    assert len(rows) == 1
    assert rows[0][0] == "http://h.org/x"
    assert rows[0][2] == text
