"""PII / pattern redaction: planted-fixture exactness, DuckDB RE2
parity, and the registry rollup oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

PLANTED = [
    ("mail me at bob.smith+x@corp.example.org or 10.0.0.1", 1, 1, 0, 0),
    ("ssn 123-45-6789 phone 555-123-4567 and 999.12.13.14", 0, 1, 1, 1),
    ("two mails a@b.io c@d.co and none else", 2, 0, 0, 0),
    ("no pii here", 0, 0, 0, 0),
    ("", 0, 0, 0, 0),
]


class TestRedactBatch:
    def test_planted_counts_and_text(self):
        from ocr_ray.functions.redact import PII_PATTERNS, redact_batch

        col = pa.array([t for t, *_ in PLANTED])
        red, counts = redact_batch(col)
        names = [n for n, _ in PII_PATTERNS]
        got = list(zip(*(counts[n].to_pylist() for n in names)))
        assert got == [tuple(c) for _, *c in PLANTED]
        assert red.to_pylist() == [
            "mail me at [PII] or [PII]",
            "ssn [PII] phone [PII] and [PII]",
            "two mails [PII] [PII] and none else",
            "no pii here",
            "",
        ]

    def test_duckdb_re2_parity(self):
        """Both engines run RE2; ordered nested regexp_replace must agree
        byte for byte — the property the SQL oracle depends on."""
        from ocr_ray.functions.redact import PII_PATTERNS, redact_batch

        texts = [t for t, *_ in PLANTED]
        red, _ = redact_batch(pa.array(texts))
        con = duckdb.connect()
        expr = "s"
        for _, p in PII_PATTERNS:
            expr = f"regexp_replace({expr}, '{p}', '[PII]', 'g')"
        duck = [r[0] for r in con.execute(
            f"SELECT {expr} FROM (SELECT unnest(?) AS s)", [texts]
        ).fetchall()]
        assert red.to_pylist() == duck


class TestRedactDataset:
    def test_redact_pii_dataset(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        from ocr_ray.functions.redact import redact_pii

        tbl = pa.table({
            "doc_id": pa.array(range(len(PLANTED)), pa.int64()),
            "text": pa.array([t for t, *_ in PLANTED]),
        })
        p = str(tmp_path / "docs.parquet")
        pq.write_table(tbl, p)
        out = redact_pii(rd.read_parquet(p)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(out.columns) == [
            "doc_id", "text", "n_email", "n_ipv4", "n_ssn", "n_phone"]
        assert out["text"].tolist()[0] == "mail me at [PII] or [PII]"
        assert out["n_email"].tolist() == [1, 0, 2, 0, 0]
        assert out["n_phone"].tolist() == [0, 1, 0, 0, 0]

    def test_props_redaction_oracle(self, ray_session):
        from tests.test_registry_extras import _check

        from ocr_ray.functions.redact import (
            PROPS_REDACTION_SQL,
            props_redaction,
        )

        _check(props_redaction("/root/testdata/sf0.001"),
               PROPS_REDACTION_SQL)


class TestPIISpans:
    def test_spans_slice_to_matches_and_splice_equals_redaction(self):
        from ocr_ray.functions.redact import (REDACTION_TOKEN,
                                              pii_spans_text,
                                              redact_batch)

        for text, *_ in PLANTED:
            spans = pii_spans_text(text)
            # offsets are into the original text and non-overlapping
            last_end = 0
            for kind, s, e in spans:
                assert 0 <= s < e <= len(text)
                assert s >= last_end
                last_end = e
            # splicing [PII] over the spans reproduces redact_batch
            out, pos = [], 0
            for _, s, e in spans:
                out.append(text[pos:s])
                out.append(REDACTION_TOKEN)
                pos = e
            out.append(text[pos:])
            red, _ = redact_batch(pa.array([text]))
            assert "".join(out) == red.to_pylist()[0]

    def test_ordered_mask_blocks_nested_rematches(self):
        from ocr_ray.functions.redact import pii_spans_text

        # an ssn-shaped substring INSIDE an email local part must not
        # double-report: email (pattern 1) masks it before ssn runs —
        # exactly redact_batch's ordered-replacement semantics
        text = "mail x123-45-6789@corp.org and bare 123-45-6789"
        spans = pii_spans_text(text)
        kinds = [k for k, *_ in spans]
        assert kinds == ["email", "ssn"]
        assert text[spans[1][1]:spans[1][2]] == "123-45-6789"
        assert spans[1][1] > spans[0][2]   # the bare one, not the nested

    def test_distributed(self, ray_session, tmp_path):
        import pyarrow.parquet as pq_

        from ocr_ray.functions.redact import pii_spans, pii_spans_text

        texts = [t for t, *_ in PLANTED]
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts)})
        pq_.write_table(tbl, str(tmp_path / "documents.parquet"))
        df = (pii_spans(str(tmp_path)).to_pandas()
              .sort_values(["doc_id", "start"]).reset_index(drop=True))
        want = [(i, k, s, e) for i, t in enumerate(texts)
                for k, s, e in pii_spans_text(t)]
        got = list(df.itertuples(index=False, name=None))
        assert got == want
