"""WARC source (sources/warc.py): conformant record walking
(Content-Length boundaries, gzip members), HTTP payload split, HTML
text extraction, and the Spark read path end-to-end."""

import pytest

from meteaudata_spark.sources.warc import (
    _gunzip_members,
    _split_records,
    html_to_text,
    read_warc,
    write_warc,
)

_HTML = (
    b"<html><head><title>T</title><style>body{x}</style></head>"
    b"<body><h1>Hello</h1><script>evil()</script><p>world of text</p>"
    b"</body></html>"
)


def _fixture_records():
    return [
        {"target_uri": "https://a.example/1", "payload": _HTML},
        {"target_uri": "https://b.example/2", "payload": b"<p>second doc</p>"},
        {
            "target_uri": "https://a.example/meta",
            "payload": b"{}",
            "warc_type": "metadata",
            "content_type": "application/json",
        },
    ]


def test_warc_round_trip_record_walk():
    raw = _gunzip_members(write_warc(_fixture_records()))
    recs = list(_split_records(raw))
    assert len(recs) == 3
    headers, block = recs[0]
    assert headers["warc-type"] == "response"
    assert headers["warc-target-uri"] == "https://a.example/1"
    assert block.endswith(_HTML)


def test_html_to_text_strips_script_style_tags():
    txt = html_to_text(_HTML)
    assert txt == "T Hello world of text"
    assert "evil" not in txt and "body{x}" not in txt


def test_payload_containing_fake_warc_header_is_not_split():
    """Content-Length walking must not be confused by record-like
    bytes INSIDE a payload."""
    tricky = b"<p>WARC/1.0\r\nContent-Length: 9</p>"
    raw = _gunzip_members(
        write_warc([{"target_uri": "x", "payload": tricky}])
    )
    recs = list(_split_records(raw))
    assert len(recs) == 1
    assert recs[0][1].endswith(tricky)


def test_truncated_warc_raises():
    raw = _gunzip_members(write_warc(_fixture_records()))
    with pytest.raises(ValueError):
        list(_split_records(raw[: len(raw) - 30]))


def test_read_warc_through_spark(spark, tmp_path):
    p = tmp_path / "seg-00000.warc.gz"
    p.write_bytes(write_warc(_fixture_records()))
    out = read_warc(spark, str(tmp_path)).toPandas()
    # default record_types keeps only the two responses
    assert len(out) == 2
    by_uri = {r["target_uri"]: r for _, r in out.iterrows()}
    assert by_uri["https://a.example/1"]["text"] == "T Hello world of text"
    assert by_uri["https://a.example/1"]["http_status"] == 200
    assert by_uri["https://a.example/1"]["content_type"] == "text/html"
    assert bytes(by_uri["https://b.example/2"]["payload"]) == b"<p>second doc</p>"

    # metadata records come back when asked for
    meta = read_warc(
        spark, str(tmp_path), record_types=("metadata",), extract_text=False
    ).toPandas()
    assert len(meta) == 1 and meta["warc_type"][0] == "metadata"


def test_warc_feeds_existing_corpus_operators(spark, tmp_path):
    """The emitted (url, text) table plugs into the corpus ops
    unchanged — pin one composition (chunking over WARC text)."""
    from pyspark.sql import functions as F

    from meteaudata_spark.ext.corpus_ops import chunk_text

    p = tmp_path / "seg.warc.gz"
    p.write_bytes(write_warc(_fixture_records()))
    docs = (
        read_warc(spark, str(tmp_path))
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("text"),
        )
    )
    chunks = chunk_text(docs, window=3, stride=2).collect()
    assert len(chunks) >= 2
    assert all(r["n_chunk_words"] >= 1 for r in chunks)
