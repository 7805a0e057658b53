"""WARC source/sink (sources/warc.py): record rendering, plain + gzip
multi-member parsing, warcinfo/record-type filtering, and the distributed
sink→source round-trip."""

import datetime as dt
import glob
import gzip
import hashlib

import pyarrow as pa
import pytest

from scrupyst_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    render_record,
    render_warcinfo,
    write_warc,
)


class TestRecord:
    def test_roundtrip_plain(self):
        rec = render_record(
            "http://a.example/x",
            b"<html>hi</html>",
            status=200,
            ts=dt.datetime(2025, 3, 4, 5, 6, 7),
        )
        rows = parse_warc_bytes(rec)
        assert len(rows) == 1
        r = rows[0]
        assert r["url"] == "http://a.example/x"
        assert r["http_status"] == 200
        assert r["body"] == b"<html>hi</html>"
        assert r["n_bytes"] == 15
        assert r["warc_ts"] == dt.datetime(2025, 3, 4, 5, 6, 7)
        assert r["content_type"] == "text/html"
        assert r["record_id"].startswith("<urn:uuid:")

    def test_rendering_is_deterministic(self):
        a = render_record("http://a/x", b"b", ts=dt.datetime(2025, 1, 1))
        b = render_record("http://a/x", b"b", ts=dt.datetime(2025, 1, 1))
        assert a == b

    def test_non_200_and_binary_body(self):
        body = bytes(range(256)) * 3  # includes \r\n\r\n sequences
        rec = render_record("http://a/404", body, status=404)
        r = parse_warc_bytes(rec)[0]
        assert r["http_status"] == 404
        assert r["body"] == body

    def test_warcinfo_skipped_by_default(self):
        data = render_warcinfo("f.warc") + render_record("http://a/x", b"b")
        rows = parse_warc_bytes(data)
        assert [r["url"] for r in rows] == ["http://a/x"]
        info = parse_warc_bytes(data, record_types=("warcinfo",))
        assert len(info) == 1 and info[0]["warc_type"] == "warcinfo"

    def test_gzip_multi_member(self):
        members = [
            gzip.compress(render_warcinfo("f.warc.gz"), mtime=0),
            gzip.compress(render_record("http://a/1", b"one"), mtime=0),
            gzip.compress(render_record("http://a/2", b"two"), mtime=0),
        ]
        rows = parse_warc_bytes(b"".join(members))
        assert [(r["url"], r["body"]) for r in rows] == [
            ("http://a/1", b"one"),
            ("http://a/2", b"two"),
        ]

    def test_truncated_header_raises(self):
        with pytest.raises(ValueError):
            parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response")


class TestSinkSource:
    def test_distributed_roundtrip(self, ray_session, tmp_path):
        import ray.data

        urls = [f"http://h{i % 3}.example/p/{i}" for i in range(200)]
        bodies = [f"body-{i}".encode() * (i % 7 + 1) for i in range(200)]
        t = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "body": pa.array(bodies, pa.binary()),
                "status": pa.array(
                    [200 if i % 5 else 301 for i in range(200)], pa.int32()
                ),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        out = str(tmp_path / "warc")
        manifest = write_warc(ds, out, status_col="status")
        assert manifest.num_rows >= 1
        assert sum(manifest["records"].to_pylist()) == 200
        # shard files exist and are gzip
        files = sorted(glob.glob(out + "/part-*.warc.gz"))
        assert files and open(files[0], "rb").read(2) == b"\x1f\x8b"

        back = read_warc(out)
        got = {
            r["url"]: (r["http_status"], r["body"], r["n_bytes"])
            for r in back.take_all()
        }
        assert len(got) == 200
        for i, (u, body) in enumerate(zip(urls, bodies)):
            st = 200 if i % 5 else 301
            assert got[u] == (st, body, len(body)), u

    def test_rewrite_is_byte_identical(self, ray_session, tmp_path):
        import ray.data

        t = pa.table(
            {
                "url": pa.array(["http://a/1", "http://a/2"], pa.string()),
                "body": pa.array([b"x", b"yy"], pa.binary()),
            }
        )
        out = str(tmp_path / "w")
        write_warc(ray.data.from_arrow(t), out)
        first = {
            p: hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(out + "/*.warc.gz")
        }
        write_warc(ray.data.from_arrow(t), out)
        second = {
            p: hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(out + "/*.warc.gz")
        }
        assert first == second


class TestRandomAccess:
    def test_cdx_offsets_fetch_single_records(self, ray_session, tmp_path):
        import ray.data

        from scrupyst_ray.sources.warc import fetch_record

        t = pa.table(
            {
                "url": pa.array(
                    [f"http://h.example/p/{i}" for i in range(40)],
                    pa.string(),
                ),
                "body": pa.array(
                    [f"payload-{i}".encode() * 3 for i in range(40)],
                    pa.binary(),
                ),
            }
        )
        out = str(tmp_path / "w")
        write_warc(ray.data.from_arrow(t).repartition(3), out)
        rows = read_warc(out, with_offsets=True).take_all()
        assert len(rows) == 40
        for r in rows[:10]:
            got = fetch_record(r["warc_file"], r["offset"], r["length"])
            assert got["url"] == r["url"]
            assert got["body"] == r["body"]

    def test_plain_warc_offsets(self, ray_session, tmp_path):
        import ray.data

        from scrupyst_ray.sources.warc import fetch_record

        t = pa.table(
            {
                "url": pa.array(["http://a/1", "http://a/2"], pa.string()),
                "body": pa.array([b"one", b"twotwo"], pa.binary()),
            }
        )
        out = str(tmp_path / "w")
        write_warc(ray.data.from_arrow(t), out, gzip_members=False)
        rows = read_warc(out, with_offsets=True).take_all()
        assert len(rows) == 2
        for r in rows:
            got = fetch_record(r["warc_file"], r["offset"], r["length"])
            assert (got["url"], got["body"]) == (r["url"], r["body"])


class TestWet:
    def test_conversion_record_roundtrip(self):
        from scrupyst_ray.sources.warc import render_conversion

        text = "Extracted text — π ünïcode\nline two".encode("utf-8")
        rec = render_conversion(
            "http://a.example/x",
            text,
            ts=dt.datetime(2025, 3, 4, 5, 6, 7),
            refers_to="<urn:uuid:00000000-0000-0000-0000-000000000000>",
        )
        assert b"WARC-Type: conversion" in rec
        assert b"WARC-Refers-To: <urn:uuid:" in rec
        # skipped unless asked for; carries the WARC block content type
        assert parse_warc_bytes(rec) == []
        r = parse_warc_bytes(rec, record_types=("conversion",))[0]
        assert r["warc_type"] == "conversion"
        assert r["content_type"] == "text/plain"
        assert r["body"] == text
        assert r["http_status"] == 0
        assert r["warc_ts"] == dt.datetime(2025, 3, 4, 5, 6, 7)

    def test_wet_sink_source_roundtrip(self, ray_session, tmp_path):
        import ray.data

        from scrupyst_ray.sources.warc import read_warc, write_wet

        texts = [f"doc {i} body with ünïcode №{i}" for i in range(40)]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(
                        [f"http://wet.test/{i}" for i in range(40)], pa.string()
                    ),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )
        out = str(tmp_path / "wet")
        manifest = write_wet(ds, out)
        assert manifest["records"].to_pylist() and sum(
            manifest["records"].to_pylist()
        ) == 40
        assert all(p.endswith(".warc.wet.gz") for p in manifest["path"].to_pylist())

        back = (
            read_warc(out, record_types=("conversion",))
            .sort("url")
            .to_pandas()
        )
        assert len(back) == 40
        got = {
            u: b.decode("utf-8")
            for u, b in zip(back["url"], back["body"])
        }
        assert got == {
            f"http://wet.test/{i}": texts[i] for i in range(40)
        }
        assert set(back["content_type"]) == {"text/plain"}

    def test_wet_rewrite_is_byte_identical(self, ray_session, tmp_path):
        import ray.data

        from scrupyst_ray.sources.warc import write_wet

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(["http://w/1", "http://w/2"], pa.string()),
                    "text": pa.array(["alpha", "beta"], pa.string()),
                }
            )
        )
        out = str(tmp_path / "wet")
        write_wet(ds, out)
        blobs1 = {
            p: open(p, "rb").read() for p in glob.glob(out + "/*.warc.wet.gz")
        }
        write_wet(ds, out)
        blobs2 = {
            p: open(p, "rb").read() for p in glob.glob(out + "/*.warc.wet.gz")
        }
        assert blobs1 == blobs2 and blobs1


class TestWat:
    def test_metadata_record_roundtrip(self):
        from scrupyst_ray.sources.warc import render_metadata

        payload = b'{"links":[{"href":"http://b/x"}],"url":"http://a/"}'
        rec = render_metadata(
            "http://a/", payload, ts=dt.datetime(2025, 2, 3, 4, 5, 6)
        )
        assert b"WARC-Type: metadata" in rec
        assert parse_warc_bytes(rec) == []  # skipped unless asked for
        r = parse_warc_bytes(rec, record_types=("metadata",))[0]
        assert r["warc_type"] == "metadata"
        assert r["content_type"] == "application/json"
        assert r["body"] == payload
        assert r["warc_ts"] == dt.datetime(2025, 2, 3, 4, 5, 6)

    def test_wat_sink_source_roundtrip(self, ray_session, tmp_path):
        import json

        import ray.data

        from scrupyst_ray.sources.warc import read_warc, write_wat

        docs = [
            {"url": f"http://wat.test/{i}", "links": [{"href": f"http://wat.test/{i+1}"}]}
            for i in range(20)
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([d["url"] for d in docs], pa.string()),
                    "wat_json": pa.array(
                        [json.dumps(d, sort_keys=True) for d in docs],
                        pa.string(),
                    ),
                }
            )
        )
        out = str(tmp_path / "wat")
        manifest = write_wat(ds, out)
        assert sum(manifest["records"].to_pylist()) == 20
        assert all(p.endswith(".warc.wat.gz") for p in manifest["path"].to_pylist())
        back = (
            read_warc(out, record_types=("metadata",)).sort("url").to_pandas()
        )
        assert len(back) == 20
        got = {u: json.loads(b) for u, b in zip(back["url"], back["body"])}
        assert got == {d["url"]: d for d in docs}
        assert set(back["content_type"]) == {"application/json"}
