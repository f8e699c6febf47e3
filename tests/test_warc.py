"""WARC source (sources/warc.py): record framing, per-record gzip
members, HTTP parsing incl. chunked coding, malformed-record
quarantine, type filtering, and the documents-shape projection."""

from __future__ import annotations

import gzip
import hashlib

import pytest

from distributed_mapreduce__spark.sources.warc import (
    _dechunk,
    _gzip_members,
    read_warc,
    warc_documents,
)


def _record(wtype: str, payload: bytes, uri: str | None = None, rid: str = "<urn:uuid:1>") -> bytes:
    headers = [
        b"WARC/1.0",
        f"WARC-Type: {wtype}".encode(),
        f"WARC-Record-ID: {rid}".encode(),
        b"WARC-Date: 2026-08-14T00:00:00Z",
    ]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}".encode())
    headers.append(f"Content-Length: {len(payload)}".encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html", chunked: bool = False) -> bytes:
    head = [f"HTTP/1.1 {status} OK".encode(), f"Content-Type: {ctype}".encode()]
    if chunked:
        head.append(b"Transfer-Encoding: chunked")
        mid = len(body) // 2
        body = (
            f"{mid:x}\r\n".encode() + body[:mid] + b"\r\n"
            + f"{len(body) - mid:x}\r\n".encode() + body[mid:] + b"\r\n"
            + b"0\r\n\r\n"
        )
    else:
        head.append(f"Content-Length: {len(body)}".encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + body


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    records = [
        _record(b"warcinfo".decode(), b"software: test\r\n", rid="<urn:uuid:info>"),
        _record("request", b"GET / HTTP/1.1\r\n\r\n", uri="http://a.example/", rid="<urn:uuid:req>"),
        _record("response", _http(b"<html>hello A</html>"), uri="http://a.example/", rid="<urn:uuid:a>"),
        _record(
            "response",
            _http("café ☃ B".encode(), ctype="text/html; charset=utf-8", chunked=True),
            uri="http://b.example/page",
            rid="<urn:uuid:b>",
        ),
        _record("response", _http(b"gone", status=404), uri="http://c.example/", rid="<urn:uuid:c>"),
    ]
    # plain .warc: records concatenated
    (d / "plain.warc").write_bytes(b"".join(records))
    # .warc.gz: one gzip MEMBER per record (the Common Crawl layout)
    (d / "member.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in records)
    )
    # a file whose second record is truncated mid-payload
    good = _record("response", _http(b"ok doc"), uri="http://d.example/", rid="<urn:uuid:d>")
    bad = _record("response", _http(b"x" * 100), uri="http://e.example/", rid="<urn:uuid:e>")[:-60]
    (d / "trunc.warc").write_bytes(good + bad)
    return str(d)


def test_gzip_member_iteration():
    parts = [b"alpha", b"beta", b"gamma"]
    blob = b"".join(gzip.compress(p) for p in parts)
    assert list(_gzip_members(blob)) == parts
    assert list(_gzip_members(b"plain bytes")) == [b"plain bytes"]


def test_dechunk():
    assert _dechunk(b"3\r\nabc\r\n4\r\ndefg\r\n0\r\n\r\n") == b"abcdefg"


def test_reads_responses_from_both_layouts(spark, warc_dir):
    for fname in ("plain.warc", "member.warc.gz"):
        df = read_warc(spark, f"{warc_dir}/{fname}")
        rows = {r.record_id: r for r in df.collect()}
        assert set(rows) == {"<urn:uuid:a>", "<urn:uuid:b>", "<urn:uuid:c>"}, fname
        a = rows["<urn:uuid:a>"]
        assert a.warc_type == "response"
        assert a.target_uri == "http://a.example/"
        assert a.http_status == 200
        assert bytes(a.body) == b"<html>hello A</html>"
        # chunked body reassembled, multi-byte UTF-8 intact
        assert bytes(rows["<urn:uuid:b>"].body) == "café ☃ B".encode()
        assert rows["<urn:uuid:c>"].http_status == 404
        assert all(r.error is None for r in rows.values())


def test_record_type_filter_and_unfiltered(spark, warc_dir):
    all_types = {
        r.warc_type
        for r in read_warc(spark, f"{warc_dir}/plain.warc", record_types=None).collect()
    }
    assert all_types == {"warcinfo", "request", "response"}
    req = read_warc(spark, f"{warc_dir}/plain.warc", record_types=("request",)).collect()
    assert [r.warc_type for r in req] == ["request"]


def test_malformed_tail_is_quarantined_not_dropped(spark, warc_dir):
    rows = read_warc(spark, f"{warc_dir}/trunc.warc", record_types=None).collect()
    by_type = {r.warc_type: r for r in rows}
    assert bytes(by_type["response"].body) == b"ok doc"  # good record survives
    bad = by_type["_malformed"]
    assert "truncated" in bad.error
    assert bad.warc_file.endswith("trunc.warc")
    # the type FILTER never hides corruption
    filtered = read_warc(spark, f"{warc_dir}/trunc.warc", record_types=("response",)).collect()
    assert {r.warc_type for r in filtered} == {"response", "_malformed"}


def test_documents_projection(spark, warc_dir):
    docs = warc_documents(spark, f"{warc_dir}/plain.warc").collect()
    by_url = {r.url: r for r in docs}
    # 404 excluded by the status gate
    assert set(by_url) == {"http://a.example/", "http://b.example/page"}
    assert by_url["http://a.example/"].text == "<html>hello A</html>"
    assert by_url["http://b.example/page"].text == "café ☃ B"
    # doc_id is the content-addressed md5 of the record id
    expect = int(hashlib.md5(b"<urn:uuid:a>").hexdigest()[:15], 16)
    assert by_url["http://a.example/"].doc_id == expect
    assert by_url["http://a.example/"].fetch_time == "2026-08-14T00:00:00Z"


def test_documents_feed_curation_pipeline(spark, warc_dir):
    """The projection plugs straight into strip_html — the intended
    WARC → curation hand-off."""
    from distributed_mapreduce__spark.operators.lines import strip_html

    docs = warc_documents(spark, f"{warc_dir}/plain.warc")
    out = docs.withColumn("clean", strip_html("text")).collect()
    got = {r.url: r.clean for r in out}
    assert got["http://a.example/"].strip() == "hello A"


def test_gzip_corruption_is_quarantined(spark, warc_dir, tmp_path):
    """A corrupt gzip member quarantines the file tail as _malformed
    instead of failing the task (the common real-crawl failure)."""
    import gzip as _gzip

    good = _gzip.compress(
        _record("response", _http(b"fine"), uri="http://ok.example/", rid="<urn:uuid:ok>")
    )
    bad = bytearray(
        _gzip.compress(
            _record("response", _http(b"broken"), uri="http://bad.example/", rid="<urn:uuid:bad>")
        )
    )
    bad[15] ^= 0xFF  # flip a deflate byte -> zlib.error on decompress
    p = tmp_path / "corrupt.warc.gz"
    p.write_bytes(good + bytes(bad))
    rows = read_warc(spark, str(p), record_types=None).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.warc_type, []).append(r)
    assert [r.record_id for r in by_type["response"]] == ["<urn:uuid:ok>"]
    assert len(by_type["_malformed"]) == 1
    assert "zlib.error" in by_type["_malformed"][0].error


def test_warc_to_training_shards_end_to_end(spark, tmp_path):
    """The README pipeline: warc_documents → build_training_set —
    crawl bytes in, deduped deterministic shards + funnel report out."""
    import gzip as _gzip

    from distributed_mapreduce__spark.operators.corpus import (
        build_training_set,
    )

    body = (
        "<html><body><p>The quick brown fox jumps over the lazy dog "
        "and the weather is fine today.</p><p>A second sentence keeps "
        "the page alive and is long enough to survive.</p>"
        "</body></html>"
    )
    records = []
    for i in range(12):
        page = body.replace("fox", f"fox{i}")  # distinct pages
        records.append(
            _record(
                "response",
                _http(page.encode()),
                uri=f"http://site{i % 3}.example/p{i}",
                rid=f"<urn:uuid:page-{i}>",
            )
        )
    # an exact duplicate page under a different record id
    records.append(
        _record(
            "response",
            _http(body.replace("fox", "fox0").encode()),
            uri="http://mirror.example/copy",
            rid="<urn:uuid:dup>",
        )
    )
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(b"".join(_gzip.compress(r) for r in records))

    from distributed_mapreduce__spark.sources.warc import warc_documents

    docs = warc_documents(spark, str(p)).select("doc_id", "text")
    report = build_training_set(
        docs,
        str(tmp_path / "shards"),
        html=True,
        clean=True,
        clean_opts={"min_words": 3, "require_terminal_punct": True,
                    "min_lines": 1, "dedup": False},
        min_quality=0.0,
        near_dup_threshold=None,
        rows_per_shard=10,
    )
    assert report["n_input"] == 13
    # the mirror copy is an exact dup after HTML strip -> one falls
    assert report["n_after_exact_dedup"] == report["n_after_clean"] - 1
    total = sum(s["n_rows"] for s in report["splits"].values())
    assert total == report["n_after_quality"] > 0
    out = spark.read.parquet(str(tmp_path / "shards" / "train"))
    texts = [r.text for r in out.collect()]
    assert texts and all("<" not in t for t in texts)  # HTML stripped


def test_midfile_corruption_resyncs_at_next_boundary(spark, tmp_path):
    """A malformed record mid-stream must cost only the bytes up to the
    next WARC/ boundary — records AFTER it still parse (ISO 28500 files
    are concatenations; abandoning the remainder would silently unparse
    most of a ~1 GB plain .warc). The quarantine row accounts for every
    skipped byte."""
    good1 = _record("response", _http(b"doc one"), uri="http://a/", rid="<urn:uuid:r1>")
    garbage = b"WARC/1.0\r\nContent-Length: notanint\r\n\r\njunk" + b"x" * 57
    good2 = _record("response", _http(b"doc two"), uri="http://b/", rid="<urn:uuid:r2>")
    p = tmp_path / "mid.warc"
    p.write_bytes(good1 + garbage + b"\r\n" + good2)

    rows = read_warc(spark, str(p), record_types=None).collect()
    bodies = {bytes(r.body) for r in rows if r.warc_type == "response"}
    assert bodies == {b"doc one", b"doc two"}  # BOTH sides of the corruption
    bad = [r for r in rows if r.warc_type == "_malformed"]
    assert len(bad) == 1
    assert "skipped" in bad[0].error and "resynced" in bad[0].error

    # corruption with no later boundary: abandonment is explicit
    p2 = tmp_path / "tail.warc"
    p2.write_bytes(good1 + garbage)
    rows2 = read_warc(spark, str(p2), record_types=None).collect()
    bad2 = [r for r in rows2 if r.warc_type == "_malformed"]
    assert len(bad2) == 1
    assert "abandoned" in bad2[0].error


def test_oversized_file_quarantined_not_crashed(spark, tmp_path):
    """binaryFile caps a file at 2 GiB; read_warc pre-lists inputs and
    turns an over-cap file into a quarantine row instead of letting the
    scan throw mid-job (cap shrunk here so the test stays tiny)."""
    small = _record("response", _http(b"fits"), uri="http://s/", rid="<urn:uuid:s>")
    big = _record("response", _http(b"y" * 4096), uri="http://big/", rid="<urn:uuid:big>")
    (tmp_path / "small.warc").write_bytes(small)
    (tmp_path / "big.warc").write_bytes(big)

    rows = read_warc(
        spark, str(tmp_path), record_types=None, max_file_bytes=1024
    ).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.warc_file.rsplit("/", 1)[-1], []).append(r)
    assert [r.warc_type for r in by_file["small.warc"]] == ["response"]
    (bad,) = by_file["big.warc"]
    assert bad.warc_type == "_malformed"
    assert "binaryFile ceiling" in bad.error

    # every input over the cap → pure quarantine result, no scan at all
    only_bad = read_warc(
        spark, str(tmp_path / "big.warc"), record_types=None, max_file_bytes=64
    ).collect()
    assert [r.warc_type for r in only_bad] == ["_malformed"]
