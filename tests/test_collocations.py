"""collocation_pmi: independent brute-force oracle, planted
collocation ranking, min_count gate, determinism."""

import math
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.collocations import collocation_pmi
from ocr_ray.functions.corpus_prep import _tokens


def _write_docs(d, texts):
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        os.path.join(d, "documents.parquet"))
    return d


def _brute(texts, k, min_count):
    uni, big = Counter(), Counter()
    for t in texts:
        toks = _tokens(t)
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    N, B = sum(uni.values()), sum(big.values())
    rows = []
    for (a, b), c in big.items():
        if c < min_count:
            continue
        pmi = math.log(c * N * N / (B * uni[a] * uni[b]))
        rows.append((a, b, c, uni[a], uni[b],
                     int(math.floor(pmi * 1e6 + 0.5))))
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows[:k]


class TestCollocationPMI:
    def test_planted_collocation_outranks_stopword_pair(
            self, ray_session, tmp_path):
        # "san francisco" always together; "of the" frequent but both
        # words are everywhere -> PMI must rank the collocation first
        texts = (["san francisco of the"] * 6
                 + ["of green the of red the"] * 10
                 + ["the of"] * 5)
        src = _write_docs(str(tmp_path / "c"), texts)
        out = collocation_pmi(src, k=10, min_count=3).to_pylist()
        assert out[0]["w1"] == "san" and out[0]["w2"] == "francisco"
        got_pairs = [(r["w1"], r["w2"]) for r in out]
        assert ("of", "the") in got_pairs
        assert got_pairs.index(("san", "francisco")) < \
            got_pairs.index(("of", "the"))

    def test_matches_bruteforce(self, ray_session, tmp_path):
        rng = np.random.default_rng(23)
        vocab = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab, rng.integers(5, 40)))
                 for _ in range(80)]
        # plant a fixed pair so something survives min_count
        texts += ["alpha beta gap alpha beta"] * 4
        src = _write_docs(str(tmp_path / "c"), texts)
        out = collocation_pmi(src, k=25, min_count=4)
        got = [(r["w1"], r["w2"], r["n_pair"], r["n_w1"], r["n_w2"],
                r["pmi_micro"]) for r in out.to_pylist()]
        assert got == _brute(texts, 25, 4)

    def test_min_count_gate(self, ray_session, tmp_path):
        texts = ["rare pair once", "x y x y x y x y"]
        src = _write_docs(str(tmp_path / "c"), texts)
        out = collocation_pmi(src, k=10, min_count=2).to_pylist()
        pairs = {(r["w1"], r["w2"]) for r in out}
        assert ("rare", "pair") not in pairs
        assert ("x", "y") in pairs

    def test_empty_corpus(self, ray_session, tmp_path):
        src = _write_docs(str(tmp_path / "c"), ["solo", ""])
        out = collocation_pmi(src, k=5, min_count=1)
        assert out.num_rows == 0

    def test_deterministic_across_layouts(self, ray_session, tmp_path):
        texts = ["a b c a b", "b c a b c", "c a b c a"] * 7
        src = _write_docs(str(tmp_path / "c"), texts)
        a = collocation_pmi(src, k=10, min_count=2)
        b = collocation_pmi(src, k=10, min_count=2)
        assert a.to_pydict() == b.to_pydict()

    def test_null_text_skipped(self, ray_session, tmp_path):
        import os

        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b a b a b", None, "a b a b"],
                             pa.string())}),
            os.path.join(str(tmp_path), "documents.parquet"))
        out = collocation_pmi(str(tmp_path), k=5, min_count=2)
        assert ("a", "b") in {(r["w1"], r["w2"])
                              for r in out.to_pylist()}
