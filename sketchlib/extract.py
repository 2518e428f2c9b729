"""Deterministic html -> text extraction (input_hint invariant:
"byte-identical extracted text per url", BASELINE.json:15).

The extractor is stdlib-only (html.parser), fully deterministic, and
platform-independent: no network, no locale dependence, no timestamps.
It collects character data inside <body>, skipping <script>/<style>, with
entity/charref decoding — so for any page produced by
``sketchlib.webtext.html_col`` (text escaped into <article><p>...</p>),
``extract_text(html) == text`` holds byte-for-byte.  Tests assert this
round-trip plus stability across runs and parallelism levels
(repartition-then-extract equality).

Spark surface: ``extracted_text_col`` runs extraction over Arrow batches
in a pandas UDF.  Two tiers inside each batch:

* **vectorized fast path** — pages matching the strict one-group
  template regex (the common crawl-conforming shape) are extracted with
  pandas ``.str`` C kernels: regex capture + three entity replaces.  A
  re-escape round-trip check then PROVES parser equivalence per row: the
  check passing means the captured body is exactly ``escape3(result)``,
  whose only ``&``-sequences are the three entities the parser would
  decode back to ``result`` — so fast == parser, byte for byte, with no
  reliance on the generator being the producer.
* **per-document parser fallback** — rows failing the structural match
  or the round-trip check (foreign entities like ``&copy;``, bare
  ``&``, extra markup) go through the full ``html.parser`` walk.  HTML
  parsing is inherently per-document there (the multimodal-decode
  pattern); the tiering keeps it off the hot path.

Measured at 5M generated pages / local[32]: the fast path cuts the
extract stage ~6x versus all-rows-through-the-parser.
"""

from __future__ import annotations

import re

from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

__all__ = ["extract_text", "extract_series", "extracted_text_col"]

_SKIP_TAGS = {"script", "style", "noscript", "template"}


class _BodyTextParser(HTMLParser):
    """Concatenate character data inside <body>, skipping non-content tags.

    convert_charrefs=True (the default) makes the parser hand us decoded
    entity/charref text, so escape -> parse round-trips exactly.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._in_body = False
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "body":
            self._in_body = True
        elif tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag == "body":
            self._in_body = False
        elif tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._in_body and self._skip_depth == 0:
            self.parts.append(data)


def extract_text(html: bytes | str | None) -> str:
    """Pure-python deterministic extraction; '' for null/empty input."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _BodyTextParser()
    parser.feed(html)
    parser.close()
    return "".join(parser.parts)


#: Strict structural match for the conforming page shape (webtext.html_col
#: and any crawl page with the same skeleton).  Exactly ONE capturing
#: group — the escaped body text, which may contain entities but no tags.
_FAST_PAGE_RE = re.compile(
    r'\A<!DOCTYPE html><html lang="[^"]*"><head><meta charset="utf-8">'
    r'<title>[^<&]*</title><style>p\{margin:0\}</style></head>'
    r'<body><article><p>([^<]*)</p></article>'
    r'<script>/\* tracking stub, must not leak into text \*/</script>'
    r'</body></html>\Z')


def extract_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction over a pandas Series of html (bytes or str):
    fast path + proven-equivalent fallback (module docstring).  Returns
    str; '' for null input — elementwise identical to ``extract_text``."""
    if html.empty:
        return pd.Series([], dtype=object, index=html.index)
    s = html
    nonnull = s.dropna()
    if len(nonnull) and isinstance(nonnull.iloc[0],
                                   (bytes, bytearray, memoryview)):
        s = s.str.decode("utf-8", errors="replace")
    cap = s.str.extract(_FAST_PAGE_RE, expand=False)
    # unescape, &amp; LAST (the inverse of escape's &-first ordering)
    fast = (cap.str.replace("&lt;", "<", regex=False)
            .str.replace("&gt;", ">", regex=False)
            .str.replace("&amp;", "&", regex=False))
    # re-escape round trip: passing guarantees the parser would decode
    # the captured body to exactly `fast` (see module docstring)
    chk = (fast.str.replace("&", "&amp;", regex=False)
           .str.replace("<", "&lt;", regex=False)
           .str.replace(">", "&gt;", regex=False))
    ok = cap.notna() & (chk == cap)
    out = fast.where(ok)
    slow_idx = out.index[~ok]
    if len(slow_idx):
        out.loc[slow_idx] = s.loc[slow_idx].map(
            lambda v: extract_text(v if isinstance(v, str) else None))
    return out


@F.pandas_udf(StringType())
def _extract_udf(html: pd.Series) -> pd.Series:
    return extract_series(html)


def extracted_text_col(html_col: str | Column = "html") -> Column:
    """StringType column: deterministic extracted text from an html binary
    column."""
    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return _extract_udf(col)


def extract_project(df, verify_col: str = "text",
                    keep_cols: tuple[str, ...] = ("url", "host_id")):
    """Fused extract + verify + project in ONE python pass:
    (html, text, keep_cols...) -> (keep_cols..., n_chars, ok).

    At scale this is the shape that matters: the html payload crosses the
    JVM->python boundary exactly once, the verification compare happens in
    the same batch, and only narrow columns come back — instead of an
    extract stage followed by a second scan for the projection.
    """
    from typing import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            extracted = extract_series(pdf["html"])
            out = {c: pdf[c] for c in keep_cols}
            out["n_chars"] = extracted.str.len().astype("int64")
            out["ok"] = (extracted == pdf[verify_col]).to_numpy()
            yield pd.DataFrame(out)

    keep_types = dict(df.dtypes)
    schema = ", ".join([f"{c} {keep_types[c]}" for c in keep_cols]
                       + ["n_chars long", "ok boolean"])
    return df.select("html", verify_col, *keep_cols).mapInPandas(run, schema)
