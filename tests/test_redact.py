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
