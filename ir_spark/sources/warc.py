"""WARC (Web ARChive, ISO 28500) source — the container format Common
Crawl actually ships.

``read_warc`` turns a directory of WARC files into the engine's input
table shape (url, warc_ts, html): one Spark task per WARC file via the
built-in ``binaryFile`` source, record parsing in an Arrow-batched
``mapInPandas`` kernel.  That per-file granularity is exactly how
Common Crawl is processed at scale — a crawl ships ~90k files of ~1 GB
each, so file-level parallelism saturates any cluster and no
within-file split is needed (WARC's gzip-member-per-record variant
exists precisely because the format is NOT byte-splittable; this
reader handles both plain and gzipped files).

Writer/parsers are pure functions, property-tested by roundtrip; the
gate proves synth -> write -> read_warc reproduces the documents table
byte-for-byte (html md5 + url + timestamp against a SQL oracle that
recomputes the synthesis formula).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = "url string, warc_ts timestamp, html binary"
_HTTP_PREFIX = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"


def synth_warc(records: list[tuple[str, str, bytes]], *,
               gzip_file: bool = False) -> bytes:
    """Write (url, iso8601_ts, html) triples as WARC/1.0 response
    records (HTTP response payload), optionally gzipping the whole
    file (the non-splittable transport variant)."""
    out = bytearray()
    for url, ts, html in records:
        http = _HTTP_PREFIX + html
        hdr = ("WARC/1.0\r\n"
               "WARC-Type: response\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {ts}\r\n"
               "Content-Type: application/http; msgtype=response\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode()
        out += hdr + http + b"\r\n\r\n"
    if gzip_file:
        import gzip

        return gzip.compress(bytes(out))
    return bytes(out)


def parse_warc(payload: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, iso8601_ts, html) from WARC bytes: response records
    only, HTTP headers stripped.  Accepts plain files and gzip files
    (whole-file or concatenated per-record members — zlib consumes
    successive members from the same stream)."""
    if payload[:2] == b"\x1f\x8b":
        import zlib

        chunks, data = [], payload
        while data:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            chunks.append(d.decompress(data))
            data = d.unused_data
        payload = b"".join(chunks)
    pos = 0
    n = len(payload)
    while pos < n:
        head_end = payload.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = payload[pos:head_end].decode("utf-8", "replace")
        if not head.startswith("WARC/"):
            break
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", "0"))
        body = payload[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length + 4  # trailing \r\n\r\n
        if fields.get("warc-type") != "response":
            continue
        http_end = body.find(b"\r\n\r\n")
        html = body[http_end + 4:] if http_end >= 0 else body
        yield (fields.get("warc-target-uri", ""),
               fields.get("warc-date", ""), html)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of .warc / .warc.gz files ->
    (url, warc_ts, html).  One task per file; only the binary content
    column crosses into the Python worker (Arrow)."""
    import pandas as pd
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path).select("content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf["content"]:
                for url, ts, html in parse_warc(bytes(payload)):
                    rows.append((url, ts, html))
            yield pd.DataFrame(rows, columns=["url", "_ts", "html"])

    raw = files.mapInPandas(kernel, "url string, _ts string, html binary")
    return raw.select(
        "url",
        F.to_timestamp("_ts", "yyyy-MM-dd'T'HH:mm:ssX").alias("warc_ts"),
        "html",
    )


def write_warc(df: DataFrame, out_dir: str, *,
               gzip_files: bool = False, overwrite: bool = False) -> dict:
    """Distributed WARC sink — the inverse of :func:`read_warc`, so a
    curated corpus can ship back out in the container the crawl world
    exchanges (takedown-filtered recrawl handoffs, dataset releases).

    One WARC file per partition (mirroring Common Crawl's ~1 GB-file
    granularity: repartition upstream to set the file size), written
    executor-side; records within a file follow the partition's row
    order, so ``df.repartitionByRange('url').sortWithinPartitions(
    'url')`` gives a deterministic, resumable export.  Timestamps are
    serialized as UTC ISO-8601 Zulu — exactly what ``read_warc``
    parses — and the roundtrip is property-tested.

    POSIX/shared-fs path handling (executor ``open()``): correct on
    local mode and NFS-like stores; an object-store deployment would
    swap the two ``open`` calls for the Hadoop FileSystem API — noted
    rather than abstracted, to keep the seam visible.

    A record with a NULL ``warc_ts`` fails the export loudly (WARC-Date
    is mandatory per ISO 28500; silently inventing one would corrupt
    the crawl record) — filter or repair upstream.  An ``out_dir``
    already holding .warc files is refused unless ``overwrite=True``
    (which removes them first): a re-export with fewer partitions must
    not leave stale part files mixed into the output.

    Returns {"n_files", "n_records", "bytes"}."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_files else ".warc"
    stale = [f for f in os.listdir(out_dir)
             if f.endswith((".warc", ".warc.gz"))]
    if stale:
        if not overwrite:
            raise ValueError(
                f"{out_dir} already holds {len(stale)} WARC file(s); "
                "pass overwrite=True to replace them")
        for f in stale:
            os.remove(os.path.join(out_dir, f))
    cols = df.select("url", "warc_ts", "html")

    def part_writer(pid: int, it):
        from datetime import timezone

        def iso_utc(r):
            ts = r["warc_ts"]
            if ts is None:
                raise ValueError(
                    f"null warc_ts for url={r['url']!r}: WARC-Date is "
                    "mandatory — filter or repair upstream")
            # Spark's row conversion yields NAIVE datetimes in the
            # OS-local zone (TimestampType.fromInternal uses
            # datetime.fromtimestamp); astimezone(utc) converts the
            # instant correctly regardless of host TZ, so the 'Z'
            # suffix is honest
            return ts.astimezone(timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%SZ")

        recs = [(r["url"], iso_utc(r), bytes(r["html"])) for r in it]
        if not recs:
            return iter(())
        payload = synth_warc(recs, gzip_file=gzip_files)
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        with open(path, "wb") as fh:
            fh.write(payload)
        return iter([(pid, len(recs), len(payload))])

    stats = cols.rdd.mapPartitionsWithIndex(part_writer).collect()
    return {"n_files": len(stats),
            "n_records": int(sum(s[1] for s in stats)),
            "bytes": int(sum(s[2] for s in stats))}
