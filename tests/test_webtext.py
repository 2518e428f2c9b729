"""Webtext layer: deterministic web-page synthesis + extractor invariant.

Pins the input_hint contract (BASELINE.json:15): table shape
(url, warc_ts, html, text, lang), byte-identical extracted text per url,
determinism across runs and parallelism levels (SURVEY §5.7).
"""

import os

import pytest

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from sketchlib.extract import extract_text, extracted_text_col
from sketchlib.webtext import CANON_COLS, webpages


# ---------------------------------------------------------------------------
# pure-python extractor: golden cases, no Spark
# ---------------------------------------------------------------------------

GOLDEN = [
    # (html, expected_text)
    ('<html><head><title>T</title></head><body><p>hello</p></body></html>',
     "hello"),
    # escaped entities round-trip
    ('<html><body><p>a &amp; b &lt;tag&gt; c</p></body></html>',
     "a & b <tag> c"),
    # script/style content must not leak
    ('<html><body><script>var x=1;</script><p>kept</p>'
     '<style>p{}</style></body></html>', "kept"),
    # head content (title) must not leak
    ('<html><head><title>skip me</title></head><body>body text</body></html>',
     "body text"),
    # nothing outside body
    ('<html>stray<body>inner</body>trailing</html>', "inner"),
    # bytes input + utf-8
    ('<html><body><p>café — über</p></body></html>',
     "café — über"),
]


@pytest.mark.parametrize("html,expected", GOLDEN)
def test_extract_golden(html, expected):
    assert extract_text(html) == expected
    assert extract_text(html.encode("utf-8")) == expected


def test_extract_null_and_empty():
    assert extract_text(None) == ""
    assert extract_text("") == ""
    assert extract_text(b"") == ""


def test_extract_deterministic_repeat():
    html = GOLDEN[1][0]
    assert len({extract_text(html) for _ in range(50)}) == 1


# ---------------------------------------------------------------------------
# vectorized tier (extract_series): elementwise == extract_text, fast path
# actually engaged for conforming pages, parser only for the rest
# ---------------------------------------------------------------------------

def _conforming(body, lang="en", title="Doc 1"):
    return (f'<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8">'
            f'<title>{title}</title><style>p{{margin:0}}</style></head>'
            f'<body><article><p>{body}</p></article>'
            f'<script>/* tracking stub, must not leak into text */</script>'
            f'</body></html>')


_SERIES_CASES = [
    _conforming("plain words here"),
    _conforming("a &amp; b &lt;tag&gt; c"),       # fast, entities decoded
    _conforming("foreign &copy; entity"),          # round-trip check -> parser
    _conforming("bare & ampersand"),               # -> parser
    _conforming("numeric &#65; ref"),              # -> parser
    _conforming("multi\nline\ntext"),
    _conforming(""),
    GOLDEN[0][0],                                  # nonconforming skeleton
    GOLDEN[4][0],
    None,
]


@pytest.mark.parametrize("as_bytes", [False, True])
def test_extract_series_elementwise_equals_parser(as_bytes):
    import pandas as pd

    from sketchlib.extract import extract_series

    vals = [c.encode("utf-8") if as_bytes and isinstance(c, str) else c
            for c in _SERIES_CASES]
    got = extract_series(pd.Series(vals, dtype=object)).tolist()
    assert got == [extract_text(c) for c in _SERIES_CASES]


def test_extract_series_fast_path_engaged(monkeypatch):
    """Conforming pages must NOT reach the per-document parser; only the
    structurally-odd / foreign-entity rows fall back."""
    import pandas as pd

    import sketchlib.extract as ex

    calls = []
    real = ex.extract_text
    monkeypatch.setattr(ex, "extract_text",
                        lambda v: (calls.append(v), real(v))[1])
    conforming = pd.Series([_conforming(f"words {i} &amp; more")
                            for i in range(100)], dtype=object)
    out = ex.extract_series(conforming)
    assert calls == []  # every row took the vectorized tier
    assert out.iloc[3] == "words 3 & more"
    mixed = pd.Series([_conforming("ok &amp; fine"),
                       _conforming("foreign &copy; entity"),
                       GOLDEN[0][0]], dtype=object)
    ex.extract_series(mixed)
    assert len(calls) == 2  # exactly the two non-fast rows


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=120))
def test_extract_series_fast_matches_parser_any_body(body):
    """Property: for ANY body text escaped into the conforming template,
    the vectorized tier returns the original text byte-for-byte (whether
    it used the fast path or fell back)."""
    import html as html_mod

    import pandas as pd

    from sketchlib.extract import extract_series

    page = _conforming(html_mod.escape(body, quote=False))
    got = extract_series(pd.Series([page], dtype=object)).iloc[0]
    assert got == body == extract_text(page)


# ---------------------------------------------------------------------------
# Spark: table shape, synthesis determinism, byte-identity at scale
# ---------------------------------------------------------------------------

def test_webpages_schema(spark, sf_smoke):
    wp = webpages(spark, sf_smoke, canon_only=True)
    assert [f.name for f in wp.schema.fields] == CANON_COLS
    types = {f.name: f.dataType.simpleString() for f in wp.schema.fields}
    assert types == {"url": "string", "warc_ts": "timestamp",
                     "html": "binary", "text": "string", "lang": "string"}


def test_webpages_deterministic_across_sessions(spark, sf_smoke):
    a = sorted((r["url"], bytes(r["html"])) for r in
               webpages(spark, sf_smoke).collect())
    b = sorted((r["url"], bytes(r["html"])) for r in
               webpages(spark, sf_smoke).collect())
    assert a == b
    # urls are unique (one page per doc)
    assert len({u for u, _ in a}) == len(a)


def test_extract_byte_identity_all_rows(spark, sf_test):
    wp = webpages(spark, sf_test)
    bad = (wp.withColumn("ext", extracted_text_col("html"))
           .where(F.col("ext") != F.col("text")).count())
    assert bad == 0


def test_extract_invariant_under_repartition(spark, sf_test):
    """Parallelism-level independence: extraction after an 11-way round-robin
    repartition produces the identical url->text mapping."""
    wp = webpages(spark, sf_test)
    base = {r["url"]: r["t"] for r in
            wp.select("url", extracted_text_col("html").alias("t")).collect()}
    repart = {r["url"]: r["t"] for r in
              wp.repartition(11)
              .select("url", extracted_text_col("html").alias("t")).collect()}
    assert base == repart


def test_extract_project_fused(spark, sf_test):
    """Fused extract+verify+project pass agrees with the column-UDF path."""
    from sketchlib.extract import extract_project

    wp = webpages(spark, sf_test)
    flat = extract_project(wp).cache()
    assert flat.where(~F.col("ok")).count() == 0
    assert flat.count() == wp.count()
    got = {r["url"]: r["n_chars"] for r in flat.collect()}
    want = {r["url"]: len(r["text"]) for r in
            wp.select("url", "text").collect()}
    assert got == want
    flat.unpersist()


def test_host_skew_present(spark, sf_test):
    """The deliberate Zipf head: host 0 owns ~40% of pages (webtext.py)."""
    wp = webpages(spark, sf_test)
    total = wp.count()
    top = wp.groupBy("host_id").count().orderBy(F.desc("count")).first()
    assert top["host_id"] == 0
    assert 0.35 <= top["count"] / total <= 0.45


def test_shingle_bloom_sized_within_4x_of_tight(spark, sf_test):
    """webtext_shingle_bloom sizes its filter from an HLL estimate of the
    true distinct-shingle count (round-3 verdict finding #1: the previous
    parquet-footer bound was 53x over at sf0.1).  Pin the sizing to within
    4x of the tight m derived from the EXACT distinct count, and the gate
    itself to fn_ok=true."""
    from sketchlib.params import BloomParams
    from sketchlib.queries import (SHINGLE_SIZE_PAD, QUERIES)
    from sketchlib.textops import shingles_col, tokens_col

    wp = webpages(spark, sf_test)
    sh = wp.select(
        F.explode(F.array_distinct(shingles_col(tokens_col("text"), 3)))
        .alias("s"))
    truth = sh.distinct().count()
    est = sh.agg(F.approx_count_distinct("s", 0.05).alias("d")
                 ).collect()[0]["d"]
    m_tight = BloomParams.from_np(max(64, truth), 0.01).m_bits
    m_sized = BloomParams.from_np(
        max(64, int(est * SHINGLE_SIZE_PAD)), 0.01).m_bits
    assert m_sized <= 4 * m_tight, (m_sized, m_tight, est, truth)

    row = QUERIES["webtext_shingle_bloom"](spark, sf_test).collect()[0]
    assert row["fn_ok"] is True
    assert row["n_shingle_rows"] > 0
