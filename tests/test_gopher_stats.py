"""Full Gopher repetition battery vs an independent brute-force oracle
(set-of-positions coverage, list-scan dup detection — different
machinery from the operator's mask/Counter kernel)."""

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _ref(text: str) -> dict:
    out = {"n_chars": len(text)}
    for name, sep in (("lines", "\n"), ("paras", "\n\n")):
        parts = text.split(sep)
        dups = [p for i, p in enumerate(parts) if p in parts[:i]]
        out[f"dup_{name}"] = len(dups)
        out[f"dup_{name[:4]}_chars"] = sum(len(p) for p in dups)
    toks = re.findall(r"[^ \t\n\r\f\v]+", text)
    starts = [m.start() for m in
              re.finditer(r"[^ \t\n\r\f\v]+", text)]
    for n in (2, 3, 4):
        key = f"top_{n}gram_chars"
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            out[key] = 0
            continue
        ranked = sorted(((grams.count(g), g) for g in set(grams)),
                        key=lambda kv: (-kv[0], kv[1]))
        cnt, g = ranked[0]
        out[key] = len(" ".join(g)) * cnt
    for n in (5, 6, 7, 8, 9, 10):
        key = f"dup_{n}gram_chars"
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        covered: set = set()
        for i, g in enumerate(grams):
            if grams.count(g) > 1:
                s = starts[i]
                e = starts[i + n - 1] + len(toks[i + n - 1])
                covered.update(range(s, e))
        out[key] = len(covered)
    return out


DOCS = [
    # repeated nav line + repeated paragraph
    "Home | About | Contact\nSome real content sentence here.\n"
    "Home | About | Contact\n\npara one text\n\npara one text",
    # looping 5-gram: the sentence repeats, overlapping coverage
    ("the quick brown fox jumps " * 4).strip(),
    # short doc below every n
    "tiny doc",
    # empty
    "",
    # heavy unicode + mixed whitespace
    "ăn b\tc ăn b\tc ăn b\tc long tail words here now",
]


def _write(tmp_path, texts):
    d = tmp_path / "gopher_sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(d / "documents.parquet"))
    return str(d)


class TestGopherRepetitionStats:
    def test_planted_docs_match_oracle(self, ray_session, tmp_path):
        from ocr_ray.functions.corpus_prep import gopher_repetition_stats

        sf = _write(tmp_path, DOCS)
        got = {r["doc_id"]: r for r in
               gopher_repetition_stats(sf).take_all()}
        for i, text in enumerate(DOCS):
            ref = _ref(text)
            for k, v in ref.items():
                assert got[i][k] == v, (i, k, got[i][k], v)

    def test_fuzz_matches_oracle(self, ray_session, tmp_path):
        import random

        from ocr_ray.functions.corpus_prep import gopher_repetition_stats

        rng = random.Random(99)
        vocab = ["aa", "bb", "cc", "dd", "ee"]
        texts = []
        for _ in range(30):
            toks = [rng.choice(vocab) for _ in range(rng.randrange(0, 40))]
            t = " ".join(toks)
            # inject newlines/paragraph breaks at random spaces
            t = re.sub(" ", lambda m: rng.choice([" ", "\n", "\n\n"]), t)
            texts.append(t)
        sf = _write(tmp_path, texts)
        got = {r["doc_id"]: r for r in
               gopher_repetition_stats(sf).take_all()}
        for i, text in enumerate(texts):
            ref = _ref(text)
            for k, v in ref.items():
                assert got[i][k] == v, (i, k, text)

    def test_driver_corpus_smoke(self, ray_session):
        import duckdb

        from ocr_ray.functions.corpus_prep import gopher_repetition_stats

        out = gopher_repetition_stats("/root/testdata/sf0.001").take_all()
        assert len(out) == duckdb.sql(
            "SELECT count(*) FROM read_parquet("
            "'/root/testdata/sf0.001/documents.parquet')").fetchone()[0]
        r = out[0]
        assert set(r) == {"doc_id", "n_chars", "dup_lines",
                          "dup_line_chars", "dup_paras", "dup_para_chars",
                          "top_2gram_chars", "top_3gram_chars",
                          "top_4gram_chars"} | {
                              f"dup_{n}gram_chars" for n in range(5, 11)}
        assert all(x["n_chars"] >= x["dup_line_chars"] >= 0 for x in out)
