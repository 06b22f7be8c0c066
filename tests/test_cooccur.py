"""Tag co-occurrence / exact cross-source dup matrix
(functions/cooccur.py).

Oracles: DuckDB distinct self-join parity on planted multi-source
duplicate corpora and random fuzz streams, block-layout independence,
the skew-cap refusal, and the documents-shaped concrete op.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.cooccur import (CROSS_SOURCE_DUP_SQL,
                                       cross_source_dup_matrix,
                                       tag_cooccurrence)

SF = "/root/testdata/sf0.001"


def _oracle_pairs(path):
    con = duckdb.connect()
    return con.execute(f"""
        WITH h AS (SELECT DISTINCT k, g FROM read_parquet('{path}')
                   WHERE k IS NOT NULL AND g IS NOT NULL)
        SELECT a.g AS tag_a, b.g AS tag_b, count(*) AS n_shared
        FROM h a JOIN h b ON a.k = b.k AND a.g < b.g
        GROUP BY a.g, b.g""").df()


def _cmp(mine: pd.DataFrame, oracle: pd.DataFrame):
    cols = sorted(oracle.columns)
    assert sorted(mine.columns) == cols
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = oracle[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_planted_pairs_duckdb_parity(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({
        "k": pa.array(["h1", "h1", "h1", "h2", "h2", "h3", "h3",
                       "h3", "h3", None, "h4"]),
        "g": pa.array(["s1", "s2", "s3", "s1", "s2", "s2", "s2",
                       "s3", "s4", "s1", None]),
    })
    p = tmp_path / "t.parquet"
    pq.write_table(t, p)
    out = tag_cooccurrence(rd.read_parquet(str(p)), "k", "g"
                           ).to_pandas()
    _cmp(out, _oracle_pairs(p))
    # h1 shared by {s1,s2,s3} -> 3 pairs; duplicate (h3,s2) rows
    # count once
    got = out.set_index(["tag_a", "tag_b"]).n_shared
    assert got[("s1", "s2")] == 2      # h1, h2
    assert got[("s2", "s3")] == 2      # h1, h3
    assert got[("s2", "s4")] == 1      # h3


@pytest.mark.parametrize("seed", [3, 17])
def test_fuzz_duckdb_parity_and_layout(ray_session, tmp_path, seed):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = 6_000
    t = pa.table({
        "k": pa.array([f"k{v}" for v in rng.integers(0, 800, n)]),
        "g": pa.array([f"s{v}" for v in rng.integers(0, 12, n)]),
    })
    p = tmp_path / f"f{seed}.parquet"
    pq.write_table(t, p)
    oracle = _oracle_pairs(p)
    for nblocks in (1, 9):
        out = tag_cooccurrence(
            rd.read_parquet(str(p)).repartition(nblocks), "k", "g"
        ).to_pandas()
        _cmp(out, oracle)
    assert len(oracle) > 10


def test_skew_cap_refusal(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({
        "k": pa.array(["hot"] * 40),
        "g": pa.array([f"s{i}" for i in range(40)]),
    })
    p = tmp_path / "hot.parquet"
    pq.write_table(t, p)
    with pytest.raises(Exception, match="max_tags_per_key"):
        tag_cooccurrence(rd.read_parquet(str(p)), "k", "g",
                         max_tags_per_key=10).to_pandas()
    # raising the cap (the named remedy) gives 40*39/2 pairs of 1
    out = tag_cooccurrence(rd.read_parquet(str(p)), "k", "g",
                           max_tags_per_key=64).to_pandas()
    assert len(out) == 40 * 39 // 2
    assert (out.n_shared == 1).all()


def test_cross_source_matrix_planted(ray_session, tmp_path):
    """documents-shaped corpus with planted cross-source exact dups."""
    import ray.data as rd  # noqa: F401

    texts = [f"unique document body {i}" for i in range(50)]
    rows = []
    did = 0
    for i, tx in enumerate(texts):
        rows.append({"doc_id": did, "text": tx, "lang": "en",
                     "source": f"src{i % 4}",
                     "n_chars": len(tx)})
        did += 1
    # plant: 5 texts served by BOTH src0 and src1; 2 by src2+src3
    for i in range(5):
        rows.append({"doc_id": did, "text": texts[i * 4],  # src0 texts
                     "lang": "en", "source": "src1",
                     "n_chars": len(texts[i * 4])})
        did += 1
    for i in range(2):
        rows.append({"doc_id": did, "text": texts[i * 4 + 2],  # src2
                     "lang": "en", "source": "src3",
                     "n_chars": len(texts[i * 4 + 2])})
        did += 1
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   sf / "documents.parquet")
    out = cross_source_dup_matrix(str(sf)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    _cmp(out, con.execute(CROSS_SOURCE_DUP_SQL).df())
    got = out.set_index(["tag_a", "tag_b"]).n_shared
    assert got[("src0", "src1")] == 5
    assert got[("src2", "src3")] == 2
    assert len(out) == 2


def test_sf_corpus_runs_empty(ray_session):
    """The synthetic sf corpus has no cross-source exact dups — the op
    must run clean and return the empty matrix (documented; the
    planted corpora above are the real oracles)."""
    out = cross_source_dup_matrix(SF).to_pandas()
    assert len(out) == 0


def test_cross_source_matrix_null_text(ray_session, tmp_path):
    """A NULL text row must be dropped (as the oracle's WHERE text IS
    NOT NULL does), not crash the md5 kernel (review-fix regression)."""
    import ray.data as rd  # noqa: F401

    rows = [
        {"doc_id": 0, "text": "shared body", "source": "s0"},
        {"doc_id": 1, "text": "shared body", "source": "s1"},
        {"doc_id": 2, "text": None, "source": "s0"},
        {"doc_id": 3, "text": None, "source": "s1"},
        {"doc_id": 4, "text": "lone body", "source": None},
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), sf / "documents.parquet")
    out = cross_source_dup_matrix(str(sf)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    _cmp(out, con.execute(CROSS_SOURCE_DUP_SQL).df())
    # the NULL texts must NOT have formed an (s0, s1) dup of their own
    assert out.n_shared.sum() == 1
