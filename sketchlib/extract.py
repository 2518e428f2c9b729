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

Spark surface: ``extracted_text_col`` runs the parser over Arrow batches in
a pandas UDF.  HTML parsing is inherently per-document work (like any
decode UDF); the batch boundary is Arrow-vectorized, the parse itself is
the unavoidable per-element step — this is the multimodal-decode pattern,
not a hot-path sketch kernel.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

__all__ = ["extract_text", "extracted_text_col"]

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


@F.pandas_udf(StringType())
def _extract_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


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
            extracted = pdf["html"].map(extract_text)
            out = {c: pdf[c] for c in keep_cols}
            out["n_chars"] = extracted.str.len().astype("int64")
            out["ok"] = (extracted == pdf[verify_col]).to_numpy()
            yield pd.DataFrame(out)

    keep_types = dict(df.dtypes)
    schema = ", ".join([f"{c} {keep_types[c]}" for c in keep_cols]
                       + ["n_chars long", "ok boolean"])
    return df.select("html", verify_col, *keep_cols).mapInPandas(run, schema)
