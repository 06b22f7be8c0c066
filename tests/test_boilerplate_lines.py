"""Line-level boilerplate removal (CCNet / RefinedWeb line-wise dedup):
planted nav/footer corpora, a pure-Python brute-force reference (fuzz
parity), the fully-removed-doc edge, empty-line eligibility, the
survivor gate, and DuckDB SQL parity."""

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


def _brute(ids, texts, min_docs=5):
    """Pure-Python reference: line -> distinct docs, then rewrite."""
    from collections import defaultdict

    docs_of = defaultdict(set)
    for d, t in zip(ids, texts):
        for ln in t.split("\n"):
            docs_of[ln].add(d)
    rep = {ln for ln, ds in docs_of.items() if len(ds) >= min_docs}
    out = {}
    for d, t in zip(ids, texts):
        lines = t.split("\n")
        kept = [ln for ln in lines if ln not in rep]
        out[d] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


NAV = "home | products | about us | contact"
FOOTER = "copyright 2024 example corp - all rights reserved"


class TestBoilerplateLines:
    def test_planted_nav_footer_removed(self, ray_session, tmp_path):
        ids = list(range(10))
        texts = [f"{NAV}\nunique body {i} alpha beta\n{FOOTER}"
                 for i in range(6)]
        texts += [f"clean doc {i}\nwith its own lines {i}"
                  for i in range(6, 10)]
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_boilerplate_lines
        res = {r["doc_id"]: r for r in
               remove_boilerplate_lines(sf, min_docs=5).take_all()}
        for i in range(6):
            assert res[i]["clean_text"] == f"unique body {i} alpha beta"
            assert res[i]["n_kept"] == 1
            assert res[i]["n_removed"] == 2
        for i in range(6, 10):
            assert res[i]["clean_text"] == texts[i]
            assert res[i]["n_removed"] == 0

    def test_fully_removed_doc_stays_present(self, ray_session, tmp_path):
        # docs that ARE the boilerplate: clean_text = '' and the rows
        # must not drop out of the output
        ids = list(range(6))
        texts = [f"{NAV}\n{FOOTER}"] * 6
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_boilerplate_lines
        res = remove_boilerplate_lines(sf, min_docs=5).to_pandas()
        assert len(res) == 6
        assert (res.clean_text == "").all()
        assert (res.n_kept == 0).all()
        assert (res.n_removed == 2).all()

    def test_empty_line_is_eligible(self, ray_session, tmp_path):
        # an empty line shared by >= min_docs docs is boilerplate like
        # any other (uniform rule, matching the SQL oracle)
        ids = list(range(5))
        texts = [f"para one {i}\n\npara two {i}" for i in range(4)]
        texts.append("solo doc no blank line")
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_boilerplate_lines
        res = {r["doc_id"]: r for r in
               remove_boilerplate_lines(sf, min_docs=4).take_all()}
        for i in range(4):
            assert res[i]["clean_text"] == f"para one {i}\npara two {i}"
            assert res[i]["n_removed"] == 1
        assert res[4]["n_removed"] == 0

    def test_within_doc_repeat_counts_once(self, ray_session, tmp_path):
        # a line repeated 10x inside ONE doc has df=1, not 10 — it
        # must survive a min_docs=2 threshold
        ids = [0, 1]
        texts = ["\n".join(["echo line"] * 10), "other doc"]
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_boilerplate_lines
        res = {r["doc_id"]: r for r in
               remove_boilerplate_lines(sf, min_docs=2).take_all()}
        assert res[0]["clean_text"] == texts[0]
        assert res[0]["n_removed"] == 0

    def test_fuzz_matches_bruteforce(self, ray_session, tmp_path):
        rng = random.Random(11)
        pool = [f"line variant {i}" for i in range(12)]
        ids, texts = [], []
        for i in range(40):
            lines = [rng.choice(pool)
                     for _ in range(rng.randrange(1, 8))]
            lines.append(f"unique to doc {i}")
            rng.shuffle(lines)
            ids.append(i)
            texts.append("\n".join(lines))
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_boilerplate_lines
        got = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
               for r in remove_boilerplate_lines(sf,
                                                 min_docs=5).take_all()}
        assert got == _brute(ids, texts, min_docs=5)

    def test_survivor_gate_refuses(self, ray_session, tmp_path):
        ids = list(range(8))
        texts = ["a\nb\nc\nd"] * 8  # four lines, all df=8
        sf = _write_docs(tmp_path, ids, texts)
        from ocr_ray.functions.corpus_prep import remove_boilerplate_lines
        with pytest.raises(ValueError, match="max_survivors"):
            remove_boilerplate_lines(sf, min_docs=2,
                                     max_survivors=2).to_pandas()

    def test_sql_parity_sf0001(self, ray_session):
        from ocr_ray.functions.corpus_prep import (
            BOILERPLATE_LINES_SQL, remove_boilerplate_lines)
        res = remove_boilerplate_lines(
            "/root/testdata/sf0.001").to_pandas()
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "'/root/testdata/sf0.001/documents.parquet'")
        sql = con.execute(BOILERPLATE_LINES_SQL).fetchdf()

        def canon(df):
            df = df[sorted(df.columns)]
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        pd.testing.assert_frame_equal(canon(res), canon(sql),
                                      check_dtype=False)


class TestPerSourceScope:
    @pytest.fixture(scope="class")
    def src_dir(self, tmp_path_factory):
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("per_src")
        nav_a = "Home | About | Contact - SiteA"
        common = "posted on monday"
        rows = []
        did = 0
        for i in range(4):                      # siteA: nav in all 4
            rows.append({"doc_id": did, "source": "siteA",
                         "text": f"{nav_a}\narticle a{i} body text"})
            did += 1
        for s in ("siteB", "siteC", "siteD"):   # 'common' 2x per source
            for i in range(2):
                rows.append({"doc_id": did, "source": s,
                             "text": f"{common}\nstory {s}{i} words"})
                did += 1
        pq.write_table(pa.Table.from_pylist(rows),
                       str(d / "documents.parquet"))
        return str(d)

    def test_group_scope_vs_corpus_scope(self, ray_session, src_dir):
        from ocr_ray.functions.corpus_prep import remove_boilerplate_lines

        per_src = (remove_boilerplate_lines(src_dir, min_docs=3,
                                            group_col="source")
                   .to_pandas().set_index("doc_id"))
        # siteA's nav repeats in 4 docs of siteA -> removed
        assert all("Home | About" not in t
                   for t in per_src.loc[0:3, "clean_text"])
        # 'common' appears 6x corpus-wide but only 2x per source -> KEPT
        assert all("posted on monday" in t
                   for t in per_src.loc[4:9, "clean_text"])

        corpus = (remove_boilerplate_lines(src_dir, min_docs=3)
                  .to_pandas().set_index("doc_id"))
        # corpus-wide the same line crosses the threshold -> removed
        assert all("posted on monday" not in t
                   for t in corpus.loc[4:9, "clean_text"])

    def test_duckdb_per_group_parity(self, ray_session, src_dir):
        import duckdb
        import pyarrow.parquet as pq_

        from ocr_ray.functions.corpus_prep import remove_boilerplate_lines

        got = (remove_boilerplate_lines(src_dir, min_docs=3,
                                        group_col="source")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents",
                     pq_.read_table(f"{src_dir}/documents.parquet"))
        want = con.execute("""
        WITH lines AS (
          SELECT doc_id, source, l.line, l.pos
          FROM documents,
               LATERAL (SELECT unnest(string_split(text, chr(10)))
                          AS line,
                        generate_subscripts(
                          string_split(text, chr(10)), 1) AS pos) l
        ), rep AS (
          SELECT source, line FROM lines GROUP BY source, line
          HAVING count(DISTINCT doc_id) >= 3
        ), kept AS (
          SELECT l.doc_id, l.pos, l.line
          FROM lines l ANTI JOIN rep r
            ON l.line = r.line AND l.source = r.source
        )
        SELECT d.doc_id,
               coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '')
                 AS clean_text
        FROM documents d LEFT JOIN kept k USING (doc_id)
        GROUP BY d.doc_id ORDER BY d.doc_id
        """).fetchdf()
        assert got["clean_text"].tolist() == want["clean_text"].tolist()
