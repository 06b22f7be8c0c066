"""WARC source: writer/parser round-trip, gzip layouts, HTTP
unwrapping, malformed tails, the distributed reader on the canonical
schema, and composition with the URL/domain rollup."""

import gzip

import pyarrow as pa
import pytest

from ocr_ray.sources.warc import (parse_warc_bytes, read_warc_documents,
                                  write_warc)

RECORDS = [
    {"url": "http://example.com/a", "text": "pagina unu cu text simplu"},
    {"url": "https://News.Site.co.uk/b?utm_source=x",
     "text": "second page body with more words"},
    {"url": "http://example.com/404", "text": "gone", "status": 404},
    {"url": "http://example.com/wet", "text": "wet extract text",
     "type": "conversion"},
    {"url": "", "text": "metadata", "type": "warcinfo"},
]
# expected surviving records: 2 responses (2xx) + 1 conversion
WANT_TEXTS = ["pagina unu cu text simplu",
              "second page body with more words", "wet extract text"]


class TestParser:
    @pytest.mark.parametrize("compress", [False, True, "member"])
    def test_roundtrip_all_layouts(self, tmp_path, compress):
        p = str(tmp_path / "f.warc")
        write_warc(RECORDS, p, compress=compress)
        recs = parse_warc_bytes(open(p, "rb").read(), p)
        assert [r["text"] for r in recs] == WANT_TEXTS
        assert recs[0]["url"] == "http://example.com/a"
        assert recs[0]["doc_id"].startswith("urn:uuid:rec-00000000-")

    def test_non_2xx_and_unwanted_types_skipped(self, tmp_path):
        p = str(tmp_path / "f.warc")
        write_warc(RECORDS, p)
        recs = parse_warc_bytes(open(p, "rb").read(), p)
        urls = [r["url"] for r in recs]
        assert "http://example.com/404" not in urls
        assert all(r["text"] != "metadata" for r in recs)

    def test_truncated_tail_keeps_complete_records(self, tmp_path):
        p = str(tmp_path / "f.warc")
        write_warc(RECORDS[:2], p)
        data = open(p, "rb").read()
        recs = parse_warc_bytes(data[:-20], p)  # cut into record 2
        assert [r["text"] for r in recs] == [WANT_TEXTS[0]]

    def test_garbage_never_raises(self):
        for junk in [b"", b"not a warc", b"WARC/1.0\r\nbroken",
                     b"WARC/1.0\r\nContent-Length: zzz\r\n\r\n",
                     b"\x1f\x8bbadgzip"]:
            assert parse_warc_bytes(junk, "x") == []

    def test_missing_record_id_gets_stable_hash(self):
        raw = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
               b"Content-Type: text/plain\r\nContent-Length: 4\r\n"
               b"\r\nbody\r\n\r\n")
        a = parse_warc_bytes(raw, "file1")[0]["doc_id"]
        b = parse_warc_bytes(raw, "file1")[0]["doc_id"]
        c = parse_warc_bytes(raw, "file2")[0]["doc_id"]
        assert a == b != c

    def test_utf8_with_replacement(self, tmp_path):
        p = str(tmp_path / "f.warc")
        write_warc([{"url": "u", "text": "diacritice ș ț ă"}], p)
        # corrupt one payload byte to an invalid utf-8 sequence
        data = bytearray(open(p, "rb").read())
        idx = data.find("ș".encode())
        data[idx] = 0xFF
        recs = parse_warc_bytes(bytes(data), p)
        assert len(recs) == 1 and "�" in recs[0]["text"]


class TestDistributed:
    def test_reader_on_canonical_schema(self, ray_session, tmp_path):
        from ocr_ray.schema import DOCUMENTS_SCHEMA

        d = tmp_path / "warcs"
        d.mkdir()
        write_warc(RECORDS[:2], str(d / "a.warc"))
        write_warc(RECORDS[2:], str(d / "b.warc.gz"), compress="member")
        ds = read_warc_documents(str(d))
        sch = ds.schema()
        assert sch.names == DOCUMENTS_SCHEMA.names
        assert [str(t) for t in sch.types] == \
            [str(f.type) for f in DOCUMENTS_SCHEMA]
        rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
        assert len(rows) == 3
        span_texts = sorted(r["spans"][0]["text"] for r in rows)
        assert span_texts == sorted(WANT_TEXTS)
        for r in rows:
            s = r["spans"][0]
            assert s["kind"] == "text" and s["offset"] == 0

    def test_compose_domain_rollup_from_media_ref(self, ray_session,
                                                  tmp_path):
        from ocr_ray.functions.urlnorm import domain_doc_stats

        d = tmp_path / "warcs"
        d.mkdir()
        write_warc(RECORDS, str(d / "a.warc"))
        ds = read_warc_documents(str(d))

        def url_rows(batch: pa.Table) -> pa.Table:
            urls = [spans[0]["media_ref"]
                    for spans in batch["spans"].to_pylist()]
            return pa.table({"url": pa.array(urls, pa.string())})

        stats = (domain_doc_stats(
            ds.map_batches(url_rows, batch_format="pyarrow"))
            .to_pandas().set_index("domain"))
        # example.com appears twice: the 200 response and the WET record
        assert stats.loc["example.com", "n_urls"] == 2
        assert stats.loc["example.com", "n_unique_pages"] == 2
        assert stats.loc["site.co.uk", "n_urls"] == 1


class TestGzipTruncation:
    def test_truncated_gz_member_keeps_prior_records(self, tmp_path):
        """Review finding: a truncated final gzip member must not lose
        the complete members before it."""
        p = str(tmp_path / "f.warc.gz")
        write_warc(RECORDS[:2], p, compress="member")
        data = open(p, "rb").read()
        recs = parse_warc_bytes(data[:-15], p)  # cut into member 2
        assert [r["text"] for r in recs] == [WANT_TEXTS[0]]

    def test_corrupt_gz_member_keeps_prior_records(self, tmp_path):
        p = str(tmp_path / "f.warc.gz")
        write_warc(RECORDS[:2], p, compress="member")
        data = bytearray(open(p, "rb").read())
        # find the second member's gzip magic and corrupt its deflate
        second = data.find(b"\x1f\x8b", 2)
        assert second > 0
        data[second + 12] ^= 0xFF
        recs = parse_warc_bytes(bytes(data), p)
        assert [r["text"] for r in recs] == [WANT_TEXTS[0]]


class TestCharsetDeclarations:
    @pytest.mark.parametrize("cs", ["latin-1", "cp1252"])
    def test_http_declared_8bit_charset_roundtrips(self, tmp_path, cs):
        p = str(tmp_path / "f.warc")
        txt = "café déjà vu naïveté für alle señores"
        write_warc([{"url": "u", "text": txt, "charset": cs}], p)
        # sanity: the payload really is single-byte-encoded on disk
        assert "café".encode(cs) in open(p, "rb").read()
        recs = parse_warc_bytes(open(p, "rb").read(), p)
        assert recs[0]["text"] == txt

    def test_meta_charset_when_header_silent(self):
        txt = "señora año"
        body = ('<html><head><meta charset="iso-8859-1"></head>'
                f"<body>{txt}</body></html>").encode("iso-8859-1")
        raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Type: application/http\r\n"
               b"Content-Length: " + str(len(body) + 44).encode()
               + b"\r\n\r\n"
               + b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
               + body + b"\r\n\r\n")
        recs = parse_warc_bytes(raw, "x")
        assert len(recs) == 1 and txt in recs[0]["text"]
        assert "�" not in recs[0]["text"]

    def test_lying_declaration_falls_back_to_utf8(self, tmp_path):
        # declared latin-1 but the bytes are valid UTF-8 multi-byte:
        # latin-1 decode SUCCEEDS (latin-1 never fails), producing
        # mojibake — this is the documented residual the encfix
        # operator exists for; pin the behavior chain instead
        p = str(tmp_path / "f.warc")
        write_warc([{"url": "u", "text": "plain ascii is safe",
                     "charset": "latin-1"}], p)
        recs = parse_warc_bytes(open(p, "rb").read(), p)
        assert recs[0]["text"] == "plain ascii is safe"

    def test_bogus_charset_name_ignored(self):
        body = "ok fine".encode("utf-8")
        raw = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
               b"Content-Type: text/plain; charset=not-a-charset\r\n"
               b"Content-Length: " + str(len(body)).encode()
               + b"\r\n\r\n" + body + b"\r\n\r\n")
        recs = parse_warc_bytes(raw, "x")
        assert recs[0]["text"] == "ok fine"
