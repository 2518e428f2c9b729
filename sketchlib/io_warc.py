"""WARC (Web ARChive, ISO 28500) ingest — the container format
Common-Crawl ships crawls in.

The reference has no file-format layer (SURVEY §2.4: its only I/O is an
ifstream text read); this source exists for the north_star's
"Common-Crawl-style web pages" payload so the engine can ingest real
crawl archives, not just parquet.

Format (public spec, warc/1.0 / 1.1): a WARC file is a concatenation of
records, each
    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of payload>\r\n\r\n

Parallelism model: record framing is inherently sequential WITHIN a file
(each record's start depends on the previous Content-Length), so the
scan parallelizes across FILES — exactly how crawl pipelines shard work
(Common Crawl ships ~64k ~1 GB WARC files per crawl; one file = one
task).  Per-record python here is per-RECORD (a record is a whole web
page, ~100 KB median), not per-row-of-a-column; everything downstream of
framing (hashing, sketching, extraction) is vectorized over record
batches.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

__all__ = ["synth_warc_bytes", "parse_warc_bytes", "read_warc", "write_warc",
           "write_wet"]

_CRLF = b"\r\n"

_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _utc_date_str(ts_col):
    """Render a timestamp instant as its UTC wall-clock string (the 'Z'
    suffix is then truthful per ISO 28500).  date_format alone renders in
    the SESSION time zone — with a non-UTC session that would emit shifted
    timestamps under a Z suffix that external WARC consumers trust."""
    from pyspark.sql import functions as F

    return F.date_format(
        F.to_utc_timestamp(ts_col, F.current_timezone()), _DATE_FMT)


def _utc_date_parse(str_col):
    """Inverse of _utc_date_str: interpret the archived wall string as UTC
    regardless of the reader session's time zone."""
    from pyspark.sql import functions as F

    return F.from_utc_timestamp(F.to_timestamp(str_col, _DATE_FMT),
                                F.current_timezone())


def synth_warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    """Serialize (url, iso_date, payload) triples as a valid WARC stream —
    deterministic, used by tests/gates and as the writer half of the
    round-trip contract."""
    out = []
    for url, date, payload in records:
        header = (b"WARC/1.0" + _CRLF
                  + b"WARC-Type: response" + _CRLF
                  + b"WARC-Target-URI: " + url.encode() + _CRLF
                  + b"WARC-Date: " + date.encode() + _CRLF
                  + b"Content-Length: " + str(len(payload)).encode() + _CRLF
                  + _CRLF)
        out.append(header + payload + _CRLF + _CRLF)
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> list[tuple[str, str, bytes]]:
    """Frame one WARC file into (url, date, payload) records.  Sequential
    by necessity (see module docstring); tolerant of trailing garbage —
    a malformed header ends the scan rather than corrupting records."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        headers = {}
        for line in data[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            break
        body_start = head_end + 4
        if body_start + clen > n:
            break  # truncated payload — drop the incomplete record
        payload = data[body_start:body_start + clen]
        records.append((headers.get(b"warc-target-uri", b"").decode(),
                        headers.get(b"warc-date", b"").decode(),
                        payload))
        pos = body_start + clen + 4  # skip record-terminating CRLF CRLF
    return records


def write_wet(df: DataFrame, path: str, text_col: str = "text") -> int:
    """WET-style sink (WARC conversion records — what Common Crawl ships
    as the extracted-text companion of each WARC): one .wet file per
    partition, records framed exactly like read_warc expects, so
    write_wet -> read_warc round-trips byte-identically.

    Executors write their partition's file directly (local FS here, a
    mounted distributed FS at scale — the same pattern real crawl
    pipelines use for archive outputs, which are files, not tables).
    Returns the number of records written."""
    import os

    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)
    sel = df.select(
        F.col("url"),
        _utc_date_str(F.col("warc_ts")).alias("__d"),
        F.col(text_col).alias("__t"))

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs = []
        for pdf in batches:
            for url, date, text in zip(pdf["url"], pdf["__d"], pdf["__t"]):
                recs.append((url, date,
                             (text or "").encode("utf-8")))
        if recs:
            with open(os.path.join(path, f"part-{pid:05d}.wet"), "wb") as f:
                f.write(synth_warc_bytes(recs))
        yield pd.DataFrame({"n": [len(recs)]})

    counts = sel.mapInPandas(write_part, "n long").collect()
    return sum(int(r["n"]) for r in counts)


def write_warc(df: DataFrame, path: str, shards: int | None = None,
               html_col: str = "html") -> int:
    """Distributed WARC sink: executors serialize their partition's pages
    into one .warc file each (proper ISO 28500 record framing via
    synth_warc_bytes), so a crawl re-shard never materializes the corpus
    on the driver — the write side of the Common-Crawl one-file-per-task
    model that read_warc consumes.  ``shards`` repartitions first (round
    robin) to pick the output file count; records are framed in url order
    within a shard for deterministic bytes.  Returns records written.

    Round-trips byte-exactly with read_warc (gated by warc_ingest and
    tests/test_io_warc.py)."""
    import os

    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)
    sel = df.select(
        F.col("url"),
        _utc_date_str(F.col("warc_ts")).alias("__d"),
        F.col(html_col).alias("__h"))
    if shards is not None:
        sel = sel.repartition(shards)

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs = []
        for pdf in batches:
            for url, date, payload in zip(pdf["url"], pdf["__d"], pdf["__h"]):
                recs.append((url, date, bytes(payload)))
        if recs:
            recs.sort(key=lambda r: r[0])
            with open(os.path.join(path, f"part-{pid:05d}.warc"), "wb") as f:
                f.write(synth_warc_bytes(recs))
        yield pd.DataFrame({"n": [len(recs)]})

    counts = sel.mapInPandas(write_part, "n long").collect()
    return sum(int(r["n"]) for r in counts)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame(url string, warc_ts timestamp, html binary) from a
    directory of .warc files.  One file = one input row of the binaryFile
    source = one framing task; downstream stages see ordinary columns."""
    files = spark.read.format("binaryFile").load(path)

    def frame(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, dates, payloads = [], [], []
            for blob in pdf["content"]:
                for url, date, payload in parse_warc_bytes(bytes(blob)):
                    urls.append(url)
                    dates.append(date)
                    payloads.append(payload)
            yield pd.DataFrame({"url": urls, "warc_date": dates,
                                "html": payloads})

    from pyspark.sql import functions as F

    framed = files.select("content").mapInPandas(
        frame, "url string, warc_date string, html binary")
    return framed.select(
        "url",
        _utc_date_parse(F.col("warc_date")).alias("warc_ts"),
        "html")
