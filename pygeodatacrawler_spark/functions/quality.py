"""Text-analysis column functions for training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, whole-stage-codegen'd) with exact
DuckDB-SQL twins so the driver oracle can value-hash them. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

from pygeodatacrawler_spark.functions.hashes import md5_long

# Tiny per-language stopword inventories for the n-gram/stopword
# heuristic language classifier. Order = deterministic tie-break order.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "los", "las"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "les", "des", "et", "est", "une"],
}

PUNCT_RE = r"[^\w\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count_from_tokens(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda x: F.lower(x).isin(words)))


def stopword_count(text: Column, lang: str) -> Column:
    return stopword_count_from_tokens(tokens(text), lang)


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hit counts, tie-break en>es>de>fr.

    Tokenizes ONCE for all four languages (the split is the expensive
    part; counting hits against a ~20-word broadcast list is cheap).
    """
    return lang_id_from_tokens(tokens(text))


def lang_id_from_tokens(toks: Column) -> Column:
    # bind the token array to a single evaluation so the 4 per-language
    # counts share one split (transform's lambda variable is evaluated
    # once per row, unlike repeating the split expression 4x)
    def _pick(t: Column) -> Column:
        en = stopword_count_from_tokens(t, "en")
        es = stopword_count_from_tokens(t, "es")
        de = stopword_count_from_tokens(t, "de")
        fr = stopword_count_from_tokens(t, "fr")
        return (
            F.when((en >= es) & (en >= de) & (en >= fr), F.lit("en"))
            .when((es >= de) & (es >= fr), F.lit("es"))
            .when(de >= fr, F.lit("de"))
            .otherwise(F.lit("fr"))
        )

    return F.element_at(F.transform(F.array(toks), _pick), 1)


# GPT2-shaped pretokenizer, restricted to the syntax BOTH engines'
# regex dialects share (Java util.regex for Spark codegen, RE2 for the
# DuckDB oracle — RE2 has no lookahead, so the \s+(?!\S) tail rule is
# folded into plain \s+; on space-separated corpora the counts agree
# with the full pattern). Groups: contractions, ' ?'-prefixed letter
# runs, digit runs, punctuation runs, whitespace runs.
BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT2-style pretokenizer
    regex, minus pure-whitespace matches (whitespace merges into the
    following token in real BPE; counting it would double-count)."""
    toks = F.regexp_extract_all(text, F.lit(f"({BPE_RE})"), 1)
    return F.size(F.filter(toks, lambda t: ~t.rlike(r"^\s+$")))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0)) / n.cast("double")
    )


def stopword_ratio(text: Column) -> Column:
    nt = token_count(text)
    return F.when(nt == 0, F.lit(0.0)).otherwise(
        stopword_count(text, "en") / nt.cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length, stopwords, punctuation.

    Mirrors the shape of published web-text quality filters (length &
    symbol ratios a la C4/Gopher rules) without any model dependency.
    Like ``lang_id``, the token array is bound once via a transform
    lambda so the stopword-ratio term does not re-split the text.
    """

    def _score(t: Column) -> Column:
        nt = F.size(t)
        sw = stopword_count_from_tokens(t, "en")
        swr = F.when(nt == 0, F.lit(0.0)).otherwise(sw / nt.cast("double"))
        length_term = F.least(F.lit(1.0), F.length(text) / F.lit(500.0))
        return F.round(
            F.lit(0.3) * length_term
            + F.lit(0.4) * F.least(F.lit(1.0), F.lit(4.0) * swr)
            + F.lit(0.3)
            * (F.lit(1.0) - F.least(F.lit(1.0), F.lit(4.0) * punct_ratio(text))),
            4,
        )

    return F.element_at(F.transform(F.array(tokens(text)), _score), 1)


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """n-grams from an ALREADY MATERIALIZED token array column.

    Callers should project the token array first (one regex split per
    row) and pass the column reference here: inlining tokens(text) into
    the gram lambda makes Catalyst re-evaluate the split per element_at
    — measured 10x slower on the shingle pipeline.
    """
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    # sequence(0, k) with k<0 counts DOWN — guard short texts explicitly
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(grams)


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams (shingles)."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    # sequence(0, k) with k<0 counts DOWN — guard short texts explicitly
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(grams)


def fingerprint_from_tokens(toks: Column, n: int = 3) -> Column:
    """Fingerprint from a materialized token array column (fast path)."""
    grams = ngrams_from_tokens(toks, n)
    return F.array_min(F.transform(grams, lambda g: md5_long(g)))


def fingerprint(text: Column, n: int = 3) -> Column:
    """Rolling-hash document fingerprint: min md5-hash over word n-grams.

    A 1-permutation MinHash — stable under token reordering-free edits,
    portable to the SQL oracle via md5_long. Prefer the two-step
    tokens() + fingerprint_from_tokens() in hot paths (see
    ngrams_from_tokens for why).
    """
    grams = word_ngrams(text, n)
    return F.array_min(F.transform(grams, lambda g: md5_long(g)))


def dup_line_fraction(text: Column) -> Column:
    """Fraction of a doc's non-empty lines that are duplicates of an
    earlier line — the Gopher repetition rule (Rae et al. 2021, A.1.1
    "duplicate line fraction"). 0.0 for empty/single-line docs.

    Pure array ops (split/trim/filter/array_distinct): no shuffle, no
    UDF — the whole signal computes inside whole-stage codegen.
    """
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )
    n = F.size(lines)
    return F.when(n > 0, F.lit(1.0) - F.size(F.array_distinct(lines)) / n.cast("double")).otherwise(F.lit(0.0))


def top_ngram_count_from_tokens(toks: Column, n: int = 2) -> Column:
    """Occurrence count of the MOST FREQUENT word n-gram of the doc —
    the per-doc half of Gopher's "top n-gram character fraction" rule.

    Zero-shuffle construction: sort the n-gram array, then one
    ``aggregate`` pass tracks the longest equal-run (struct accumulator
    prev/run/best). Equivalent to explode+groupBy+max but stays inside
    the row — at 100 TB this is the difference between a map-only
    column and two extra exchanges per quality pass.
    """
    grams = F.array_sort(ngrams_from_tokens(toks, n))

    def _run(acc: Column, x: Column) -> Column:
        return F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))

    return F.aggregate(
        grams,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            _run(acc, x).alias("run"),
            F.greatest(acc["best"], _run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


# C4 line-level cleaning heuristics (Raffel et al. 2020, §2.2): keep
# only lines that end in terminal punctuation AND contain >= min_words
# words AND carry neither "lorem ipsum" nor a curly brace; a page
# survives if >= 3 lines remain. All pure array exprs — the whole
# filter is map-only at any scale.
_C4_TERMINAL = r'[.!?"”]$'


def _c4_lines(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )


def c4_keep_lines(text: Column, min_words: int = 5) -> Column:
    """Array of lines surviving the C4 line filters."""
    return F.filter(
        _c4_lines(text),
        lambda ln: ln.rlike(_C4_TERMINAL)
        & (F.size(F.split(ln, r"\s+")) >= min_words)
        & ~F.lower(ln).contains("lorem ipsum")
        & ~ln.contains("{"),
    )


def c4_kept_fraction(text: Column, min_words: int = 5) -> Column:
    """Fraction of non-empty lines the C4 filters keep (0.0 for empty
    docs) — a per-doc cleanliness signal."""
    n = F.size(_c4_lines(text))
    return F.when(
        n > 0, F.size(c4_keep_lines(text, min_words)) / n.cast("double")
    ).otherwise(F.lit(0.0))


def c4_filtered_text(text: Column, min_words: int = 5) -> Column:
    """The document's text after C4 line filtering (kept lines joined
    with newlines) — what a C4-style corpus build would emit."""
    return F.array_join(c4_keep_lines(text, min_words), "\n")


def c4_keep_doc(text: Column, min_words: int = 5, min_lines: int = 3) -> Column:
    """C4's page gate: true iff >= min_lines lines survive."""
    return F.size(c4_keep_lines(text, min_words)) >= min_lines
