"""Per-doc n-gram novelty: DuckDB oracle parity (exact mode), planted
containment extremes, bloom-mode lower-bound + default-size equality,
zero-gram docs, and layout independence."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.textops import _SQL_WS

W = 4  # small window so short planted docs produce grams

NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text, {_SQL_WS})) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text, {_SQL_WS}),
                                      '[ \t\n\r\f\v]+') END AS t
  FROM {{tbl}}
),
wins AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(t[i : i + {W - 1}], ' ')) AS w
  FROM (SELECT doc_id, t,
               unnest(range(1, greatest(len(t) - {W - 1}, 0) + 1)) AS i
        FROM toks)
  WHERE len(t) >= {W}
)
SELECT * FROM wins
"""


def _oracle(eval_tbl, train_tbl):
    con = duckdb.connect()
    con.register("eval_docs", eval_tbl)
    con.register("train_docs", train_tbl)
    q = f"""
    WITH ew AS ({NOVELTY_SQL.format(tbl='eval_docs')}),
         tw AS (SELECT DISTINCT w FROM ({NOVELTY_SQL.format(tbl='train_docs')})),
         agg AS (
           SELECT ew.doc_id,
                  CAST(count(*) AS BIGINT) AS n_grams,
                  CAST(sum(CASE WHEN tw.w IS NOT NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_seen
           FROM ew LEFT JOIN tw ON ew.w = tw.w
           GROUP BY ew.doc_id)
    SELECT e.doc_id,
           coalesce(a.n_grams, 0) AS n_grams,
           coalesce(a.n_seen, 0) AS n_seen,
           CASE WHEN coalesce(a.n_grams, 0) = 0 THEN 1.0
                ELSE floor((1.0 - a.n_seen / a.n_grams) * 1e4 + 0.5) / 1e4
           END AS novelty
    FROM (SELECT DISTINCT doc_id FROM eval_docs) e
    LEFT JOIN agg a USING (doc_id)
    ORDER BY e.doc_id
    """
    return con.execute(q).fetch_arrow_table()


def _train_dir(tmp, train_tbl):
    d = tmp / "train"
    d.mkdir(exist_ok=True)
    pq.write_table(train_tbl, str(d / "documents.parquet"))
    return str(d)


TRAIN = pa.table({
    "doc_id": pa.array([0, 1, 2], pa.int64()),
    "text": pa.array([
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet ultraviolet",
    ])})

EVAL = pa.table({
    "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
    "text": pa.array([
        # fully contained in train doc 0 -> novelty 0
        "beta gamma delta epsilon zeta eta",
        # half old half new
        "alpha beta gamma delta nova stella cosmos quasar pulsar",
        # fully novel
        "completely fresh words never seen anywhere in training data",
        # too short for a 4-gram
        "tiny doc",
        # empty
        "",
    ])})


class TestExactMode:
    def test_duckdb_parity(self, ray_session, tmp_path):
        from ocr_ray.functions.novelty import ngram_novelty_scores

        got = (ngram_novelty_scores(EVAL, _train_dir(tmp_path, TRAIN),
                                    window=W)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        want = _oracle(EVAL, TRAIN).to_pandas()
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["n_grams"].tolist() == want["n_grams"].tolist()
        assert got["n_seen"].tolist() == want["n_seen"].tolist()
        assert got["novelty"].tolist() == want["novelty"].tolist()

    def test_planted_extremes(self, ray_session, tmp_path):
        from ocr_ray.functions.novelty import ngram_novelty_scores

        df = (ngram_novelty_scores(EVAL, _train_dir(tmp_path, TRAIN),
                                   window=W)
              .to_pandas().set_index("doc_id"))
        assert df.loc[10, "novelty"] == 0.0
        assert df.loc[12, "novelty"] == 1.0
        assert 0.0 < df.loc[11, "novelty"] < 1.0
        # zero-gram docs: defined novelty 1.0 with n_grams 0
        for did in (13, 14):
            assert df.loc[did, "n_grams"] == 0
            assert df.loc[did, "novelty"] == 1.0

    def test_layout_independence(self, ray_session, tmp_path):
        import ray.data as rd

        from ocr_ray.functions.novelty import ngram_novelty_scores

        tdir = _train_dir(tmp_path, TRAIN)
        a = (ngram_novelty_scores(EVAL, tdir, window=W)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (ngram_novelty_scores(rd.from_arrow(EVAL).repartition(5),
                                  tdir, window=W)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)


class TestBloomMode:
    def test_lower_bound_and_default_size_equality(self, ray_session,
                                                   tmp_path):
        from ocr_ray.functions.novelty import ngram_novelty_scores

        tdir = _train_dir(tmp_path, TRAIN)
        exact = (ngram_novelty_scores(EVAL, tdir, window=W)
                 .to_pandas().set_index("doc_id"))
        bloom = (ngram_novelty_scores(EVAL, tdir, window=W, mode="bloom")
                 .to_pandas().set_index("doc_id"))
        assert (bloom["n_grams"] == exact["n_grams"]).all()
        # FP can only RAISE n_seen (lower novelty); at default sizing on
        # this corpus the FP probability is ~0 so they are equal
        assert (bloom["n_seen"] >= exact["n_seen"]).all()
        assert (bloom["n_seen"] == exact["n_seen"]).all()

    def test_saturated_filter_sees_everything(self, ray_session, tmp_path):
        from ocr_ray.functions.novelty import ngram_novelty_scores

        tdir = _train_dir(tmp_path, TRAIN)
        # an 8-bit filter saturates -> every gram "seen" -> novelty 0
        df = (ngram_novelty_scores(EVAL, tdir, window=W, mode="bloom",
                                   m_bits=8)
              .to_pandas().set_index("doc_id"))
        has_grams = df["n_grams"] > 0
        assert (df.loc[has_grams, "novelty"] == 0.0).all()

    def test_unknown_mode_refused(self, ray_session, tmp_path):
        from ocr_ray.functions.novelty import ngram_novelty_scores

        with pytest.raises(ValueError, match="unknown mode"):
            ngram_novelty_scores(EVAL, _train_dir(tmp_path, TRAIN),
                                 mode="fuzzy")


class TestScaleShape:
    def test_sf0001_smoke_self_novelty_zero(self, ray_session):
        """Every corpus doc evaluated against its own corpus must score
        novelty 0 (all grams present) — a corpus-wide exactness sweep."""
        from ocr_ray.functions.corpus_prep import _read
        from ocr_ray.functions.novelty import ngram_novelty_scores

        sf = "/root/testdata/sf0.001"
        ev = _read(sf, ["doc_id", "text"]).limit(50)
        df = ngram_novelty_scores(ev, sf, window=8).to_pandas()
        has = df[df.n_grams > 0]
        assert len(has) > 0
        assert (has["novelty"] == 0.0).all()
        assert (has["n_seen"] == has["n_grams"]).all()
