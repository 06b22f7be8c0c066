"""Substring-level passage removal (ExactSubstr semantics at token
n-gram granularity): planted-boilerplate corpora, a pure-Python
brute-force reference (fuzz parity), the fully-removed-doc edge,
two_phase equality, the survivor gate, and DuckDB SQL parity."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(path, ids, texts):
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(path / "documents.parquet"))
    return str(path)


def _brute(ids, texts, n=3, min_docs=5):
    """Pure-Python reference: gram -> distinct docs, then cover+rewrite."""
    from collections import defaultdict

    docs_of = defaultdict(set)
    for d, t in zip(ids, texts):
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            docs_of[" ".join(toks[i:i + n])].add(d)
    rep = {g for g, ds in docs_of.items() if len(ds) >= min_docs}
    out = {}
    for d, t in zip(ids, texts):
        toks = t.split(" ")
        cov = [False] * len(toks)
        for i in range(len(toks) - n + 1):
            if " ".join(toks[i:i + n]) in rep:
                for j in range(i, i + n):
                    cov[j] = True
        kept = [t_ for t_, c in zip(toks, cov) if not c]
        out[d] = (" ".join(kept), len(kept), len(toks) - len(kept))
    return out


LICENSE = "all rights reserved by the example corporation"


class TestPassageRemoval:
    def test_planted_license_removed(self, ray_session, tmp_path):
        ids = list(range(10))
        texts = [f"unique body {i} alpha beta {LICENSE} tail {i}"
                 for i in range(6)]
        texts += [f"clean doc {i} with no shared passage at all {i}"
                  for i in range(6, 10)]
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_repeated_passages
        res = {r["doc_id"]: r for r in
               remove_repeated_passages(sf, n=3, min_docs=5).take_all()}
        for i in range(6):
            # the license grams cover the license tokens (plus the
            # boundary-window spill the brute reference also marks)
            assert "rights reserved by" not in res[i]["clean_text"]
            assert res[i]["n_removed"] > 0
        for i in range(6, 10):
            assert res[i]["clean_text"] == texts[i]
            assert res[i]["n_removed"] == 0

    def test_fully_removed_doc_stays_present(self, ray_session, tmp_path):
        # one doc that IS the boilerplate: clean_text = '' and the row
        # must not drop out of the output
        ids = list(range(6))
        texts = [LICENSE] * 6
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_repeated_passages
        res = remove_repeated_passages(sf, n=3, min_docs=5).to_pandas()
        assert len(res) == 6
        assert (res.clean_text == "").all()
        assert (res.n_kept == 0).all()
        assert (res.n_removed == len(LICENSE.split(" "))).all()

    def test_fuzz_matches_bruteforce(self, ray_session, tmp_path):
        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(30)]
        shared = "x y z q"  # 4 tokens -> two overlapping 3-grams
        ids, texts = [], []
        for i in range(40):
            toks = [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
            if rng.random() < 0.5:
                pos = rng.randrange(0, len(toks) + 1)
                toks[pos:pos] = shared.split(" ")
            ids.append(i)
            texts.append(" ".join(toks))
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_repeated_passages
        got = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
               for r in remove_repeated_passages(sf, n=3,
                                                 min_docs=3).take_all()}
        assert got == _brute(ids, texts, n=3, min_docs=3)

    def test_two_phase_equals_default(self, ray_session, tmp_path):
        ids = list(range(12))
        texts = [f"doc {i} body {LICENSE} trailer {i % 3}"
                 for i in range(12)]
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_repeated_passages
        a = remove_repeated_passages(sf, n=3, min_docs=4,
                                     two_phase=False).to_pandas()
        b = remove_repeated_passages(sf, n=3, min_docs=4,
                                     two_phase=True).to_pandas()
        key = ["doc_id"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True))

    def test_survivor_gate_refuses(self, ray_session, tmp_path):
        ids = list(range(8))
        texts = [f"a b c d e f g h {i}" for i in ids]  # every gram shared
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_repeated_passages
        with pytest.raises(ValueError, match="max_survivors"):
            remove_repeated_passages(sf, n=3, min_docs=2,
                                     max_survivors=2).to_pandas()

    def test_sql_parity_sf0001(self, ray_session):
        from ocr_ray.functions.corpus_prep import (
            PASSAGE_REMOVAL_SQL, remove_repeated_passages)
        res = remove_repeated_passages("/root/testdata/sf0.001").to_pandas()
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "'/root/testdata/sf0.001/documents.parquet'")
        sql = con.execute(PASSAGE_REMOVAL_SQL).fetchdf()

        def canon(df):
            df = df[sorted(df.columns)]
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        pd.testing.assert_frame_equal(canon(res), canon(sql),
                                      check_dtype=False)
