"""phrase_search over the positional token index: brute-force
reference parity, overlap/repeat semantics, pruned reads, refusals."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.corpus_prep import _tokens
from ocr_ray.functions.token_index import (
    build_token_index,
    phrase_search,
    token_bucket,
)


def _write_docs(d, texts):
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        os.path.join(d, "documents.parquet"))
    return d


def _brute(texts, phrase):
    """Independent reference: scan each doc's token list."""
    ptoks = _tokens(phrase)
    out = {}
    for i, t in enumerate(texts):
        toks = _tokens(t)
        n = sum(1 for a in range(len(toks) - len(ptoks) + 1)
                if toks[a:a + len(ptoks)] == ptoks)
        if n:
            out[i] = n
    return out


def _got(ds):
    return {r["doc_id"]: r["n_occurrences"] for r in ds.take_all()}


@pytest.fixture(scope="module")
def pos_index(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("phrase")
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "quick brown quick brown quick",
        "a a a a",
        "brown fox",
        "fox brown",
        "",
        "solo",
    ]
    src = _write_docs(str(d / "corpus"), texts)
    idx = str(d / "idx")
    build_token_index(src, idx, max_df_frac=1.0, store_positions=True)
    return texts, idx


class TestPhraseSearch:
    @pytest.mark.parametrize("phrase", [
        "quick brown", "brown fox", "the", "a a", "a a a",
        "fox jumps over", "lazy dog", "no such phrase", "solo",
        "dog the",
    ])
    def test_matches_bruteforce(self, pos_index, phrase):
        texts, idx = pos_index
        assert _got(phrase_search(idx, phrase)) == _brute(texts, phrase)

    def test_overlapping_occurrences_count(self, pos_index):
        texts, idx = pos_index
        # "a a" in "a a a a" -> 3 overlapping occurrences
        assert _got(phrase_search(idx, "a a")) == {2: 3}
        assert _got(phrase_search(idx, "a a a")) == {2: 2}

    def test_fuzz_random_corpus(self, tmp_path, ray_session):
        rng = np.random.default_rng(17)
        alpha = list("pqrs")
        texts = [" ".join(rng.choice(alpha, rng.integers(1, 30)))
                 for _ in range(60)]
        src = _write_docs(str(tmp_path / "c"), texts)
        idx = str(tmp_path / "i")
        build_token_index(src, idx, max_df_frac=1.0,
                          store_positions=True)
        for _ in range(12):
            phrase = " ".join(rng.choice(alpha,
                                         rng.integers(1, 4)))
            assert _got(phrase_search(idx, phrase)) == \
                _brute(texts, phrase), phrase

    def test_reads_only_phrase_buckets(self, pos_index, monkeypatch):
        import ray.data as rd

        texts, idx = pos_index
        seen = []
        orig = rd.read_parquet

        def spy(paths, **kw):
            seen.append(paths)
            return orig(paths, **kw)

        monkeypatch.setattr(rd, "read_parquet", spy)
        phrase_search(idx, "quick brown").take_all()
        (files,) = seen
        want = {f"{idx}/bucket={token_bucket(t, 32)}/postings.parquet"
                for t in ("quick", "brown")}
        assert set(files) == want

    def test_refuses_positionless_index(self, tmp_path, ray_session):
        src = _write_docs(str(tmp_path / "c"), ["x y z"])
        idx = str(tmp_path / "i")
        build_token_index(src, idx, max_df_frac=1.0)
        with pytest.raises(ValueError, match="no positions"):
            phrase_search(idx, "x y")

    def test_empty_phrase(self, pos_index):
        _, idx = pos_index
        with pytest.raises(ValueError, match="empty phrase"):
            phrase_search(idx, "   ")

    def test_nonpositional_build_unchanged(self, tmp_path, ray_session):
        """The default build writes the same (token, doc_id, tf) rows
        with and without the round-5 positional extension."""
        src = _write_docs(str(tmp_path / "c"),
                          ["w w x", "x y", "y y y w"])
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        build_token_index(src, a, max_df_frac=1.0)
        build_token_index(src, b, max_df_frac=1.0,
                          store_positions=True)
        for sub in sorted(os.listdir(a)):
            if not sub.startswith("bucket="):
                continue
            ta = pq.read_table(f"{a}/{sub}/postings.parquet")
            tb = pq.read_table(f"{b}/{sub}/postings.parquet")
            assert ta.to_pydict() == tb.select(
                ["token", "doc_id", "tf"]).to_pydict()


class TestNullText:
    def test_positional_build_skips_null_text(self, tmp_path,
                                              ray_session):
        os.makedirs(str(tmp_path / "c"), exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["x y x y", None], pa.string())}),
            str(tmp_path / "c" / "documents.parquet"))
        idx = str(tmp_path / "i")
        build_token_index(str(tmp_path / "c"), idx, max_df_frac=1.0,
                          store_positions=True)
        assert _got(phrase_search(idx, "x y")) == {0: 2}
