"""Tests for feed export (S4/S5) and seed readers (S2/S3)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from scrupyst_ray.stages.export import export_dataset


@pytest.mark.usefixtures("ray_session")
class TestExport:
    def _ds(self):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "a": [1, 2, 3, 4],
                    "b": ["w", "x", "y", "z"],
                    "keep": [True, True, False, True],
                }
            )
        )

    def test_parquet_with_filter_and_fields(self, tmp_path):
        import pyarrow.parquet as pq

        out = export_dataset(
            self._ds(),
            str(tmp_path / "p"),
            fmt="parquet",
            fields=["a", "b"],
            item_filter="keep == True",
        )
        t = pq.read_table(out)
        assert t.num_rows == 3
        assert t.column_names == ["a", "b"]

    def test_jsonl(self, tmp_path):
        out = export_dataset(self._ds(), str(tmp_path / "j"), fmt="jsonl")
        rows = []
        for f in os.listdir(out):
            with open(os.path.join(out, f)) as fh:
                rows += [json.loads(line) for line in fh if line.strip()]
        assert sorted(r["a"] for r in rows) == [1, 2, 3, 4]

    def test_csv_rename(self, tmp_path):
        out = export_dataset(
            self._ds(), str(tmp_path / "c"), fmt="csv", fields={"a": "id", "b": "name"}
        )
        content = ""
        for f in sorted(os.listdir(out)):
            content += open(os.path.join(out, f)).read()
        assert content.splitlines()[0].replace('"', "") == "id,name"

    def test_json_array(self, tmp_path):
        out = export_dataset(self._ds(), str(tmp_path / "ja"), fmt="json")
        rows = json.load(open(os.path.join(out, "items.json")))
        assert len(rows) == 4

    def test_xml_nested(self, tmp_path):
        import ray.data

        ds = ray.data.from_items([{"a": 1, "tags": ["x", "y"]}])
        out = export_dataset(ds, str(tmp_path / "x"), fmt="xml")
        xml = open(os.path.join(out, "items.xml")).read()
        # reference exporters.py:203-221: lists → repeated <value> elements
        assert "<tags><value>x</value><value>y</value></tags>" in xml

    def test_pickle_stream(self, tmp_path):
        # reference PickleItemExporter: concatenated pickle.dump records
        import pickle

        out = export_dataset(self._ds(), str(tmp_path / "pk"), fmt="pickle")
        rows = []
        with open(os.path.join(out, "items.pickle"), "rb") as f:
            while True:
                try:
                    rows.append(pickle.load(f))
                except EOFError:
                    break
        assert sorted(r["a"] for r in rows) == [1, 2, 3, 4]

    def test_marshal_stream(self, tmp_path):
        import marshal

        out = export_dataset(self._ds(), str(tmp_path / "ms"), fmt="marshal")
        rows = []
        with open(os.path.join(out, "items.marshal"), "rb") as f:
            while True:
                try:
                    rows.append(marshal.load(f))
                except EOFError:
                    break
        assert sorted(r["b"] for r in rows) == ["w", "x", "y", "z"]

    def test_pprint_lines(self, tmp_path):
        out = export_dataset(self._ds(), str(tmp_path / "pp"), fmt="pprint")
        text = open(os.path.join(out, "items.pprint")).read()
        assert text.count("'a':") == 4

    def test_unknown_format(self, tmp_path):
        with pytest.raises(ValueError):
            export_dataset(self._ds(), str(tmp_path / "u"), fmt="msgpack")


@pytest.mark.usefixtures("ray_session")
class TestReaders:
    def test_parquet_seeds_passthrough(self, tmp_path):
        import pyarrow.parquet as pq

        from scrupyst_ray.sources.readers import read_seeds

        p = str(tmp_path / "seeds.parquet")
        pq.write_table(
            pa.table({"url": ["http://a/1", "http://a/2"], "seq": [0, 1]}), p
        )
        ds = read_seeds(p)
        assert ds.schema().names == ["url", "seq"]
        assert ds.count() == 2

    def test_txt_seeds_get_fifo_seq(self, tmp_path):
        from scrupyst_ray.sources.readers import read_seeds

        p = str(tmp_path / "seeds.txt")
        with open(p, "w") as f:
            f.write("http://a/1\nhttp://a/2\nhttp://a/3\n")
        rows = read_seeds(p).take_all()
        assert [r["seq"] for r in rows] == [0, 1, 2]
        assert rows[0]["url"] == "http://a/1"

    def test_txt_seeds_skip_comments_and_keep_file_order(self, tmp_path):
        from scrupyst_ray.sources.readers import read_seeds

        p = str(tmp_path / "seeds.txt")
        with open(p, "w") as f:
            f.write("http://z/1\n\n# a comment\nhttp://a/2\n  http://m/3  \n")
        rows = sorted(read_seeds(p).take_all(), key=lambda r: r["seq"])
        assert [(r["url"], r["seq"]) for r in rows] == [
            ("http://z/1", 0),
            ("http://a/2", 1),
            ("http://m/3", 2),
        ]

    def test_csv_seeds(self, tmp_path):
        from scrupyst_ray.sources.readers import read_seeds

        p = str(tmp_path / "seeds.csv")
        with open(p, "w") as f:
            f.write("url\nhttp://a/9\nhttp://a/8\n")
        rows = read_seeds(p).take_all()
        assert len(rows) == 2 and rows[0]["seq"] == 0

    def test_missing_url_column(self, tmp_path):
        import pyarrow.parquet as pq

        from scrupyst_ray.sources.readers import read_seeds

        p = str(tmp_path / "bad.parquet")
        pq.write_table(pa.table({"link": ["x"]}), p)
        with pytest.raises(ValueError):
            read_seeds(p)


class TestCsvReferenceGoldens:
    """Byte-level goldens ported from reference tests/test_exporters.py
    (TestCsvItemExporter, lines 301-381)."""

    def test_header_export_all(self):
        from scrupyst_ray.stages.export import render_csv

        assert (
            render_csv([{"age": "22", "name": "John\xa3"}])
            == b"age,name\r\n22,John\xc2\xa3\r\n"
        )

    def test_header_export_single_field(self):
        from scrupyst_ray.stages.export import render_csv

        assert (
            render_csv(
                [{"age": "22", "name": "John\xa3"}], fields_to_export=["age"]
            )
            == b"age\r\n22\r\n"
        )

    def test_header_export_two_items(self):
        from scrupyst_ray.stages.export import render_csv

        item = {"age": "22", "name": "John\xa3"}
        assert (
            render_csv([item, item])
            == b"age,name\r\n22,John\xc2\xa3\r\n22,John\xc2\xa3\r\n"
        )

    def test_no_header_line(self):
        from scrupyst_ray.stages.export import render_csv

        assert (
            render_csv([{"age": "22", "name": "John\xa3"}], include_headers_line=False)
            == b"22,John\xc2\xa3\r\n"
        )

    def test_join_multivalue(self):
        from scrupyst_ray.stages.export import render_csv

        assert (
            render_csv(
                [{"friends": ["Mary", "Paul"], "name": "John"}],
                include_headers_line=False,
            )
            == b'"Mary,Paul",John\r\n'
        )

    def test_join_multivalue_not_strings(self):
        from scrupyst_ray.stages.export import render_csv

        assert (
            render_csv(
                [{"friends": [4, 8], "name": "John"}], include_headers_line=False
            )
            == b'"[4, 8]",John\r\n'
        )

    def test_nonstring_types(self):
        import datetime

        from scrupyst_ray.stages.export import render_csv

        item = {
            "age": 22,
            "is": False,
            "pi": 3.14,
            "ts": datetime.datetime(2015, 1, 1, 1, 1, 1),
        }
        assert (
            render_csv([item], include_headers_line=False)
            == b"22,False,3.14,2015-01-01 01:01:01\r\n"
        )

    def test_errors_default_raises(self):
        import pytest as _pytest

        from scrupyst_ray.stages.export import render_csv

        with _pytest.raises(UnicodeEncodeError):
            render_csv([{"text": "Wɵ​rd"}], encoding="windows-1251")

    def test_errors_xmlcharrefreplace(self):
        from scrupyst_ray.stages.export import render_csv

        assert (
            render_csv(
                [{"text": "Wɵ​rd"}],
                include_headers_line=False,
                encoding="windows-1251",
                errors="xmlcharrefreplace",
            )
            == b"W&#629;&#8203;rd\r\n"
        )


class TestXmlReferenceGoldens:
    """Byte-level goldens ported from reference tests/test_exporters.py
    (TestXmlItemExporter, lines 418-460; whitespace-normalized)."""

    def test_simple_item(self):
        from scrupyst_ray.stages.export import _xml_bytes

        assert _xml_bytes([{"age": "22", "name": "John\xa3"}]) == (
            b'<?xml version="1.0" encoding="utf-8"?>\n'
            b"<items><item><age>22</age><name>John\xc2\xa3</name></item></items>"
        )

    def test_multivalued_fields(self):
        from scrupyst_ray.stages.export import _xml_bytes

        got = _xml_bytes([{"name": ["John\xa3", "Doe"], "age": [1, 2, 3]}])
        assert (
            b"<name><value>John\xc2\xa3</value><value>Doe</value></name>" in got
        )
        assert b"<age><value>1</value><value>2</value><value>3</value></age>" in got

    def test_nested_item(self):
        from scrupyst_ray.stages.export import _xml_bytes

        i1 = {"age": "22", "name": "foo\xa3hoo"}
        i2 = {"age": i1, "name": "bar"}
        got = _xml_bytes([{"age": i2, "name": "buz"}])
        assert (
            b"<item><age><age><age>22</age><name>foo\xc2\xa3hoo</name></age>"
            b"<name>bar</name></age><name>buz</name></item>" in got
        )

    def test_nested_list_of_dicts(self):
        from scrupyst_ray.stages.export import _xml_bytes

        i3 = {"name": "buz", "age": [{"name": "foo"}, {"name": "bar"}]}
        got = _xml_bytes([i3])
        assert (
            b"<age><value><name>foo</name></value>"
            b"<value><name>bar</name></value></age>" in got
        )


class TestExportRoundtripQueries:
    """The S4/S5 feed-export round-trip query surface (webops): filter +
    fields_to_export rename + FEED_EXPORT_BATCH_ITEM_COUNT rotation, read
    back through ray.data readers and compared to the source projection."""

    SF = "/root/testdata/sf0.001"

    def _expected(self):
        import duckdb

        return duckdb.sql(
            f"""SELECT doc_id, source, n_chars AS chars
                FROM read_parquet('{self.SF}/documents.parquet')
                WHERE n_chars >= 100 ORDER BY doc_id"""
        ).fetchall()

    def test_jsonl_roundtrip_matches_source(self):
        from scrupyst_ray.pipelines import webops

        got = [
            (r["doc_id"], r["source"], r["chars"])
            for r in webops.export_jsonl_roundtrip(self.SF).take_all()
        ]
        assert got == self._expected()

    def test_csv_roundtrip_matches_source(self):
        from scrupyst_ray.pipelines import webops

        got = [
            (r["doc_id"], r["source"], r["chars"])
            for r in webops.export_csv_roundtrip(self.SF).take_all()
        ]
        assert got == self._expected()

    def test_batch_rotation_file_count(self):
        """batch_item_count=128 over ~463 kept rows must rotate into >1
        file (reference FEED_EXPORT_BATCH_ITEM_COUNT, feedexport.py:588-652)."""
        import os

        from scrupyst_ray.pipelines import webops

        out_dir = webops._export_store(self.SF, "jsonl")
        files = [f for f in os.listdir(out_dir) if f.endswith(".json")]
        assert len(files) > 1
