"""WARC (Web ARChive, ISO 28500) source: the ingestion format of web
crawls (Common Crawl et al.) — the front door of a web-scale LLM data
pipeline.

Pure-stdlib parsing over Spark's ``binaryFile`` source: each WARC file
becomes one input row, and an Arrow-batched ``mapInPandas`` walks its
records (WARC headers → Content-Length-delimited block, per the spec),
emitting one row per selected record with the HTTP payload split from
its headers and an optional crude HTML→text extraction (tag strip —
real pipelines plug a proper extractor in the same slot).

Gzip handling: both whole-file gzip and the Common-Crawl layout
(each record its own gzip MEMBER) decompress through one zlib
multi-member loop.

Scale shape: parallelism is per FILE (binaryFile gives one row per
file) — exactly how crawl corpora ship (thousands of ~1 GB segment
files); a single file decompresses
member-by-member and emits rows in bounded batches — O(record) task
memory for the per-record-member crawl layout (plus the compressed
file bytes the binaryFile source hands over).  Downstream, the emitted (url, text)
table feeds the existing corpus operators (gopher rules, dedup,
contamination, chunking) unchanged.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "http_status int, payload binary, text string"
)


def _iter_decompressed(data: bytes):
    """Yield decompressed gzip MEMBERS one at a time (the Common Crawl
    layout stores each record as its own member, so peak memory is one
    record, not the whole file) — or the input unchanged if it isn't
    gzip."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        yield d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def _gunzip_members(data: bytes) -> bytes:
    """Whole-buffer convenience wrapper over :func:`_iter_decompressed`
    (tests / small fixtures)."""
    return b"".join(_iter_decompressed(data))


def _split_records(data: bytes):
    """Yield (warc_headers: dict, block: bytes) per record, walking
    Content-Length boundaries as the spec requires (never regex over
    payloads, which may contain anything)."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", "replace")
        if not head.startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}")
        headers = {}
        for line in head.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError as exc:
            raise ValueError(f"record at {pos} lacks Content-Length") from exc
        block_start = head_end + 4
        block = data[block_start : block_start + length]
        if len(block) != length:
            raise ValueError("truncated WARC record block")
        yield headers, block
        pos = block_start + length


def _split_http(block: bytes):
    """(status, content_type, payload) from an HTTP response block."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block[:5].startswith(b"HTTP/"):
        return None, None, block
    head = block[:sep].decode("utf-8", "replace")
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split(" ")[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        if line.lower().startswith("content-type:"):
            ctype = line.split(":", 1)[1].strip()
            break
    return status, ctype, block[sep + 4 :]


_TAG_RE = re.compile(
    rb"<script[\s\S]*?</script>|<style[\s\S]*?</style>|<[^>]+>"
)


def html_to_text(payload: bytes) -> str:
    """Crude tag-strip extraction — deterministic and dependency-free;
    swap in a real extractor (trafilatura-class) at the same call
    site in production."""
    txt = _TAG_RE.sub(b" ", payload)
    return re.sub(r"\s+", " ", txt.decode("utf-8", "replace")).strip()


_COLS = (
    "warc_file", "record_id", "warc_type", "target_uri",
    "warc_date", "content_type", "http_status", "payload", "text",
)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple = ("response",),
    extract_text: bool = True,
    batch_records: int = 256,
) -> DataFrame:
    """WARC files at ``path`` → one row per selected record:
    (warc_file, record_id, warc_type, target_uri, warc_date,
    content_type, http_status, payload, text).

    Memory per task: the COMPRESSED file bytes (the ``binaryFile``
    source contract) plus one decompressed gzip member at a time and
    at most ``batch_records`` parsed rows — for the Common Crawl
    per-record-member layout that is O(record), for a whole-file-gzip
    WARC it is O(decompressed file) for the member (unavoidable
    without a seekable source)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    want = tuple(t.lower() for t in record_types)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = {k: [] for k in _COLS}

        def flush():
            out = pd.DataFrame({k: rows[k] for k in _COLS})
            for k in _COLS:
                rows[k] = []
            return out

        for pdf in it:
            for _, row in pdf.iterrows():
                # records never span gzip members (each CC record is
                # its own member; a whole-file gzip is one member)
                for member in _iter_decompressed(bytes(row["content"])):
                    for headers, block in _split_records(member):
                        wtype = headers.get("warc-type", "")
                        if want and wtype.lower() not in want:
                            continue
                        status, ctype, payload = _split_http(block)
                        rows["warc_file"].append(row["path"])
                        rows["record_id"].append(
                            headers.get("warc-record-id", "")
                        )
                        rows["warc_type"].append(wtype)
                        rows["target_uri"].append(
                            headers.get("warc-target-uri", "")
                        )
                        rows["warc_date"].append(headers.get("warc-date", ""))
                        rows["content_type"].append(
                            ctype or headers.get("content-type", "")
                        )
                        rows["http_status"].append(status)
                        rows["payload"].append(payload)
                        rows["text"].append(
                            html_to_text(payload) if extract_text else ""
                        )
                        if len(rows["warc_file"]) >= batch_records:
                            yield flush()
        if rows["warc_file"]:
            yield flush()

    return files.mapInPandas(parse, WARC_SCHEMA)


def write_warc(records: list[dict]) -> bytes:
    """Serialize (target_uri, payload[, warc_type, content_type])
    dicts to conformant WARC/1.0 bytes — each record its own gzip
    member (the Common Crawl layout).  Used by tests and by pipelines
    that need round-trip fixtures; deterministic given its input."""
    out = []
    for i, rec in enumerate(records):
        payload = rec["payload"]
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + rec.get("content_type", "text/html").encode()
            + b"\r\nContent-Length: "
            + str(len(payload)).encode()
            + b"\r\n\r\n"
            + payload
        )
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec.get('warc_type', 'response')}\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
            f"WARC-Target-URI: {rec['target_uri']}\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        member = head + http + b"\r\n\r\n"
        gz = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        out.append(gz.compress(member) + gz.flush())
    return b"".join(out)
