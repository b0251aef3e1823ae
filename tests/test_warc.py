"""WARC source (sources/warc.py): writer/parser round trips over both
layouts (plain + multi-member gzip), HTTP payload split, typed
errors, and the distributed read_warc reader."""

from __future__ import annotations

import pytest

from vearch_spark.sources.warc import (
    http_response_bytes,
    parse_http_response,
    parse_warc,
    read_warc,
    warc_gz_bytes,
    warc_record_bytes,
)


def _pair(body=b"hello crawl", url="https://x.test/a"):
    http = http_response_bytes(body, "text/html; charset=utf-8")
    r1 = warc_record_bytes(
        "response", http, target_uri=url,
        content_type="application/http; msgtype=response",
    )
    r2 = warc_record_bytes("metadata", b"k: v", target_uri=url)
    return r1, r2, body


def test_plain_and_gz_round_trip():
    r1, r2, body = _pair()
    for blob in (r1 + r2, warc_gz_bytes([r1, r2])):
        recs = parse_warc(blob)
        assert [r["warc_type"] for r in recs] == ["response", "metadata"]
        assert recs[0]["target_uri"] == "https://x.test/a"
        st, hdr, got = parse_http_response(recs[0]["payload"])
        assert st == 200 and got == body
        assert hdr["content-type"].startswith("text/html")
        assert recs[1]["payload"] == b"k: v"


def test_binary_payload_survives_framing():
    """Payloads containing CRLF pairs and WARC/ magic must frame by
    Content-Length, not by delimiter search."""
    evil = b"\r\n\r\nWARC/1.0\r\n\x00\xff" * 3
    r = warc_record_bytes("resource", evil)
    recs = parse_warc(r)
    assert len(recs) == 1 and recs[0]["payload"] == evil
    recs2 = parse_warc(warc_gz_bytes([r, r]))
    assert len(recs2) == 2 and recs2[1]["payload"] == evil


def test_typed_errors():
    r1, _, _ = _pair()
    with pytest.raises(ValueError, match="not a WARC"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="truncated WARC payload"):
        parse_warc(r1[:-10])
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(warc_gz_bytes([r1])[:-6])
    with pytest.raises(ValueError, match="HTTP"):
        parse_http_response(b"nothttp")


def test_header_case_insensitive_and_404():
    raw = (
        b"WARC/1.0\r\n"
        b"warc-type: response\r\n"
        b"CONTENT-LENGTH: 5\r\n"
        b"Warc-Target-Uri: u\r\n"
        b"\r\nabcde\r\n\r\n"
    )
    recs = parse_warc(raw)
    assert recs[0]["warc_type"] == "response"
    assert recs[0]["target_uri"] == "u"
    st, _, body = parse_http_response(
        http_response_bytes(b"gone", status=404)
    )
    assert st == 404 and body == b"gone"


def test_read_warc_distributed(spark, tmp_path):
    """read_warc: one row per record across multiple .warc.gz files,
    payloads intact; plan is scan + mapInPandas, no shuffle."""
    import vearch_spark.plans.explain as X

    for f in range(3):
        recs = []
        for k in range(4):
            body = f"file {f} rec {k}".encode()
            recs.append(
                warc_record_bytes(
                    "response",
                    http_response_bytes(body),
                    target_uri=f"https://t/{f}/{k}",
                )
            )
        (tmp_path / f"part-{f}.warc.gz").write_bytes(warc_gz_bytes(recs))
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    assert X.count_exchanges(df) == 0
    rows = df.collect()
    assert len(rows) == 12
    uris = {r.target_uri for r in rows}
    assert uris == {f"https://t/{f}/{k}" for f in range(3) for k in range(4)}
    one = [r for r in rows if r.target_uri == "https://t/1/2"][0]
    st, _, body = parse_http_response(bytes(one.payload))
    assert st == 200 and body == b"file 1 rec 2"
