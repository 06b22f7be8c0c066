"""WARC ingestion — the web-archive container format (Common-Crawl
style), read as a Ray Data source.

A WARC file is a sequence of records::

    WARC/1.0\r\n
    <name>: <value>\r\n …\r\n
    \r\n
    <Content-Length payload bytes>
    \r\n\r\n

``response`` records wrap an HTTP message (status line + headers +
body); ``conversion`` records (WET extracts) carry plain text.  Real
crawl files are per-record gzip members concatenated into one
``.warc.gz`` — Python's GzipFile reads multi-member streams natively,
so the same parser covers both.

Ray shape: ``read_binary_files`` streams one task per file (WARC files
are independently parseable, the natural parallel unit at crawl
scale); the parser is a per-file flat-map emitting one row per wanted
record.  Output lands on the canonical DOCUMENTS_SCHEMA (one text span
per record, like the CSV source) with the target URI preserved in
``media_ref`` so URL canonicalization / domain rollups
(``functions.urlnorm``) can run downstream without a side table.

Parser semantics (deterministic, never raises on malformed tails):

* records are located by their ``WARC/`` version line; headers parse
  case-insensitively up to the first blank line;
* a record missing ``Content-Length``, or whose declared payload runs
  past EOF, ends parsing of that file (the truncated-crawl case) —
  complete records before it are still returned;
* HTTP payloads are unwrapped (status+headers dropped at the first
  blank line); non-2xx responses are skipped; bodies decode per the
  DECLARED charset (HTTP Content-Type, else the page's own ``<meta
  charset>`` in the first 2 KB) with strict-UTF-8 then
  UTF-8-replacement fallback — honoring declarations keeps
  legitimately latin-1/cp1252 pages from arriving pre-mojibake'd;
* ``doc_id`` = the WARC-Record-ID urn when present, else
  ``md5(file_path:record_offset)`` — stable across re-reads.

Reference analog: S-family sources (SURVEY.md §2.1 extension —
ingestion breadth beyond parquet/Lance/JSONL/CSV).
"""
from __future__ import annotations

import gzip
import hashlib
import os
import re

import pyarrow as pa

_WANTED_DEFAULT = frozenset({"response", "conversion"})


def _maybe_gunzip(data: bytes) -> bytes:
    """Member-by-member decompress that KEEPS what decoded when a later
    member is truncated or corrupt — GzipFile.read() would raise after
    the fact and lose the complete members before the damage, breaking
    the truncated-crawl contract for .warc.gz files."""
    import zlib

    if data[:2] != b"\x1f\x8b":
        return data
    out: list[bytes] = []
    buf = data
    try:
        while buf[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            out.append(d.decompress(buf))
            if not d.eof:
                break            # truncated final member
            buf = d.unused_data
    except zlib.error:
        pass                     # corrupt member: keep prior members
    return b"".join(out)


def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
    return headers


def _unwrap_http(payload: bytes) -> tuple[bytes, str] | None:
    """HTTP message -> (body bytes, declared charset or "");
    None for non-2xx or malformed."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None
    head = payload[:sep]
    line = head.split(b"\r\n", 1)[0]
    parts = line.split()
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None
    try:
        status = int(parts[1])
    except ValueError:
        return None
    if not 200 <= status < 300:
        return None
    charset = ""
    m = _HTTP_CHARSET_RE.search(head)
    if m:
        charset = m.group(1).decode("latin-1").strip("\"' ").lower()
    return payload[sep + 4:], charset


_HTTP_CHARSET_RE = re.compile(
    rb"(?im)^content-type:[^\r\n]*charset=([^\s;\"']+|\"[^\"]+\")")
_META_CHARSET_RE = re.compile(
    rb"(?i)<meta[^>]+charset\s*=\s*[\"']?([a-z0-9_.:-]+)")


def _decode_body(body: bytes, declared: str) -> str:
    """Decode per the declared charset (HTTP header, else the page's
    own ``<meta charset>`` in the first 2 KB), falling back to strict
    UTF-8 then UTF-8-with-replacement.  Honoring declarations keeps
    legitimately latin-1/cp1252 pages from arriving pre-mojibake'd;
    a declaration that fails to decode falls through rather than
    raising (crawls lie about charsets)."""
    if not declared:
        m = _META_CHARSET_RE.search(body[:2048])
        if m:
            declared = m.group(1).decode("latin-1").lower()
    if declared and declared not in ("utf-8", "utf8"):
        try:
            return body.decode(declared, errors="strict")
        except (LookupError, UnicodeDecodeError):
            pass
    try:
        return body.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return body.decode("utf-8", errors="replace")


def parse_warc_bytes(data: bytes, file_path: str = "",
                     record_types: frozenset = _WANTED_DEFAULT
                     ) -> list[dict]:
    """All wanted records of one WARC file as
    [{doc_id, url, text}, ...]."""
    data = _maybe_gunzip(data)
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            break  # truncated record: keep what parsed so far
        rtype = headers.get("warc-type", "")
        if rtype in record_types:
            payload = data[body_start:body_end]
            ctype = headers.get("content-type", "")
            declared = ""
            if rtype == "response" or "application/http" in ctype:
                unwrapped = _unwrap_http(payload)
                payload = None if unwrapped is None else unwrapped[0]
                declared = "" if unwrapped is None else unwrapped[1]
            else:
                cm = re.search(r"charset=([^\s;\"\']+)", ctype,
                               re.IGNORECASE)
                if cm:
                    declared = cm.group(1).lower()
            if payload is not None:
                rid = headers.get("warc-record-id", "").strip("<>")
                if not rid:
                    rid = hashlib.md5(
                        f"{file_path}:{start}".encode()).hexdigest()
                out.append({
                    "doc_id": rid,
                    "url": headers.get("warc-target-uri", ""),
                    "text": _decode_body(payload, declared),
                })
        pos = body_end
    return out


def read_warc_documents(path: str,
                        record_types: frozenset = _WANTED_DEFAULT):
    """WARC file/folder -> Dataset on DOCUMENTS_SCHEMA: one text span
    per record at offset 0, target URI in ``media_ref``."""
    import ray.data as rd

    from ..schema import DOCUMENTS_SCHEMA

    def to_docs(batch: dict) -> pa.Table:
        rows = []
        for data, fp in zip(batch["bytes"], batch["path"]):
            for rec in parse_warc_bytes(bytes(data), str(fp),
                                        record_types):
                rows.append({
                    "doc_id": rec["doc_id"],
                    "spans": [{"kind": "text", "text": rec["text"],
                               "media_ref": rec["url"], "offset": 0}],
                })
        return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)

    return rd.read_binary_files(path, include_paths=True).map_batches(
        to_docs, batch_format="numpy")


def write_warc(records: list[dict], path: str,
               compress: bool | str = False) -> None:
    """Deterministic WARC/1.0 writer (fixtures + interop tests).

    ``records``: [{url, text, type?="response", status?=200}].
    ``compress``: False, True (whole-file gzip) or "member"
    (per-record gzip members, the Common-Crawl layout)."""
    chunks = []
    for i, rec in enumerate(records):
        rtype = rec.get("type", "response")
        if rtype == "response":
            cs = rec.get("charset", "UTF-8")
            body = rec["text"].encode(cs)
            status = rec.get("status", 200)
            http = (f"HTTP/1.1 {status} X\r\n"
                    f"Content-Type: text/html; charset={cs}\r\n"
                    f"\r\n").encode("latin-1") + body
            payload, ctype = http, \
                'application/http; msgtype=response'
        else:
            payload = rec["text"].encode("utf-8")
            ctype = "text/plain"
        # ids carry a (path, url, text) hash so records stay globally
        # unique across multi-file crawls — bare rec-<i> collides
        # between files, and a content-only hash still collides when
        # two shards start with the same fetched page
        chash = hashlib.md5(
            (os.path.basename(path) + "\x00" + rec.get("url", "")
             + "\x00" + rec["text"]).encode()).hexdigest()[:10]
        head = (f"WARC/1.0\r\n"
                f"WARC-Type: {rtype}\r\n"
                f"WARC-Record-ID: <urn:uuid:rec-{i:08d}-{chash}>\r\n"
                f"WARC-Target-URI: {rec.get('url', '')}\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(payload)}\r\n"
                f"\r\n").encode("latin-1")
        record = head + payload + b"\r\n\r\n"
        if compress == "member":
            record = gzip.compress(record, mtime=0)
        chunks.append(record)
    blob = b"".join(chunks)
    if compress is True:
        blob = gzip.compress(blob, mtime=0)
    with open(path, "wb") as f:
        f.write(blob)
