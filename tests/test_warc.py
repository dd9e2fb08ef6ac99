"""WARC archive writer/reader (sources/warc.py): build → shard → parse
roundtrips, framing robustness, and byte determinism.

The reference discards response bodies after link extraction
(src/index.ts fetch path); archive persistence is crawl-tier surface.
Format per ISO 28500 (WARC 1.0/1.1) as implemented publicly by
warcio/pywb/Heritrix.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkinator_spark.sources import warc as W


@pytest.fixture(scope="module")
def captures(spark):
    rows = [
        # (url, fetch_ts, status, content_type, body)
        ("http://a.example/", 1700000001, 200, "text/html",
         "<a href='/x'>x</a>"),
        ("http://a.example/x", 1700000002, 404, "text/html", "gone"),
        ("http://b.example/u", 1700000003, 301, "text/plain", "moved"),
        # multi-byte body: octet_length must count UTF-8 bytes
        ("http://b.example/v", 1700000004, 200, "text/plain; charset=utf-8",
         "café ☃"),
        # poison body: contains a fake WARC header — Content-Length
        # framing must not split on it
        ("http://b.example/w", 1700000005, 200, "text/plain",
         "WARC/1.0\r\nWARC-Type: response\r\n\r\nnot a record"),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts long, status int, content_type string, "
              "body string")
    return df.withColumn(
        "shard", F.regexp_extract("url", "http://([a-z]+)", 1))


def _roundtrip(captures, gz):
    recs = W.build_warc_records(captures)
    files = W.warc_files(recs, gzip_records=gz)
    return W.parse_warc_files(files).toPandas()


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_fields(spark, captures, gz):
    out = _roundtrip(captures, gz)
    resp = out[out.warc_type == "response"].sort_values("target_uri")
    src = captures.toPandas().sort_values("url")
    assert list(resp.target_uri) == list(src.url)
    assert list(resp.http_status) == list(src.status)
    assert list(resp.content_type) == list(src.content_type)
    assert list(resp.payload) == list(src.body)
    # dates render the pinned-UTC epoch
    assert (resp[resp.target_uri == "http://a.example/"].warc_date
            .iloc[0] == "2023-11-14T22:13:21Z")


@pytest.mark.parametrize("gz", [False, True])
def test_warcinfo_leads_each_shard(spark, captures, gz):
    out = _roundtrip(captures, gz)
    infos = out[out.warc_type == "warcinfo"]
    assert set(infos.shard) == {"a", "b"}
    assert all(infos.rec_index == 0)
    # responses follow in (ts, url) order
    b = out[(out.shard == "b") & (out.warc_type == "response")]
    assert list(b.sort_values("rec_index").target_uri) == [
        "http://b.example/u", "http://b.example/v", "http://b.example/w"]


def test_poison_body_framing(spark, captures):
    out = _roundtrip(captures, gz=False)
    w = out[out.target_uri == "http://b.example/w"]
    assert len(w) == 1
    assert w.payload.iloc[0].startswith("WARC/1.0")
    # exactly 5 responses + 2 warcinfo — the poison did not fork a record
    assert len(out) == 7


def test_multibyte_content_length(spark, captures):
    recs = W.build_warc_records(captures).filter(
        F.col("url") == "http://b.example/v").collect()[0]
    body = "café ☃"
    assert f"Content-Length: {len(body.encode())}\r\n\r\n{body}" in (
        recs.http_block)
    assert recs.content_length == len(recs.http_block.encode())


def test_deterministic_bytes(spark, captures):
    for gz in (False, True):
        a = {r["shard"]: bytes(r["warc_file"])
             for r in W.warc_files(W.build_warc_records(captures),
                                   gzip_records=gz).collect()}
        b = {r["shard"]: bytes(r["warc_file"])
             for r in W.warc_files(
                 W.build_warc_records(captures.orderBy(F.rand(7))),
                 gzip_records=gz).collect()}
        assert a == b
    assert bytes(a["a"][:2]) == b"\x1f\x8b"


def test_record_ids_stable_and_unique(spark, captures):
    recs = W.build_warc_records(captures).select("record_id").collect()
    ids = [r.record_id for r in recs]
    assert len(set(ids)) == len(ids)
    again = [r.record_id for r in
             W.build_warc_records(captures).select("record_id").collect()]
    assert sorted(ids) == sorted(again)


def test_cross_archive_ingest(spark, captures):
    """An archive written by another tool (here: hand-built warcio-style
    bytes with extra headers and \\r\\n variations) parses correctly."""
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/x\r\n\r\nhello"
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Record-ID: <urn:uuid:1234>\r\n"
           b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
           b"WARC-Target-URI: http://ext.example/\r\n"
           b"WARC-IP-Address: 203.0.113.7\r\n"   # header we don't emit
           b"Content-Type: application/http;msgtype=response\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n"
           b"\r\n" + body + b"\r\n\r\n")
    files = spark.createDataFrame(
        pd.DataFrame({"shard": ["ext"], "warc_file": [rec]}))
    out = W.parse_warc_files(files).toPandas()
    assert len(out) == 1
    assert out.target_uri.iloc[0] == "http://ext.example/"
    assert out.http_status.iloc[0] == 200
    assert out.payload.iloc[0] == "hello"
