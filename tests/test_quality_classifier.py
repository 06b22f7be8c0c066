"""Hashed Naive-Bayes quality classifier — pure-python oracle, planted
two-vocabulary separation, refusals, smoke."""
import math
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

B = 256
ALPHA = 1.0


def _mk_corpus(tmp_path, n_pos=20, n_neg=20, n_web=40):
    """Labeled reference (pos = latin-ish, neg = xyz-ish) plus unlabeled
    web docs drawn half-and-half from each vocabulary."""
    import random
    rng = random.Random(11)
    latin = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
             "sed do eiusmod tempor").split()
    xyz = ("zyx wvu tsr qpo nml kji hgf edc baz yxw vut srq").split()

    def doc(words):
        return " ".join(rng.choice(words) for _ in range(30))

    rows, did = [], 0
    for _ in range(n_pos):
        rows.append({"doc_id": did, "text": doc(latin), "source": "ref"})
        did += 1
    for _ in range(n_neg):
        rows.append({"doc_id": did, "text": doc(xyz), "source": "crawl"})
        did += 1
    web_latin = set()
    for i in range(n_web):
        latinish = i % 2 == 0
        if latinish:
            web_latin.add(did)
        rows.append({"doc_id": did,
                     "text": doc(latin if latinish else xyz),
                     "source": "web"})
        did += 1
    rows.append({"doc_id": did, "text": "", "source": "web"})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(sf / "documents.parquet"))
    return str(sf), rows, web_latin


def _preds():
    import pyarrow.compute as pc
    pos = lambda b: pc.equal(b["source"], pa.scalar("ref"))      # noqa: E731
    neg = lambda b: pc.equal(b["source"], pa.scalar("crawl"))    # noqa: E731
    return pos, neg


def _oracle(rows):
    """Independent NB reimplementation (pos=ref, neg=crawl)."""
    from ocr_ray.functions.corpus_prep import _tokens

    def bids(text):
        toks = _tokens(text)
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [zlib.crc32(f.encode()) % B for f in feats]

    pos_c = np.zeros(B, np.float64)
    neg_c = np.zeros(B, np.float64)
    n_pos = n_neg = 0
    for r in rows:
        if r["source"] == "ref":
            n_pos += 1
            for b in bids(r["text"]):
                pos_c[b] += 1
        elif r["source"] == "crawl":
            n_neg += 1
            for b in bids(r["text"]):
                neg_c[b] += 1
    w = (np.log((pos_c + ALPHA) / (pos_c.sum() + ALPHA * B))
         - np.log((neg_c + ALPHA) / (neg_c.sum() + ALPHA * B)))
    prior = math.log(n_pos / n_neg)
    out = {}
    for r in rows:
        ids = bids(r["text"])
        s = prior + float(w[ids].sum()) if ids else prior
        s_r = math.floor(s * 1e6 + 0.5) / 1e6
        p = 1.0 / (1.0 + math.exp(-max(min(s_r, 500.0), -500.0)))
        out[r["doc_id"]] = (s_r, math.floor(p * 1e6 + 0.5) / 1e6)
    return out


class TestQualityClassifier:
    def test_matches_oracle(self, ray_session, tmp_path):
        from ocr_ray.functions.quality_classifier import (
            quality_classifier_scores)

        sf, rows, _ = _mk_corpus(tmp_path)
        pos, neg = _preds()
        got = {r["doc_id"]: (r["score"], r["prob"]) for r in
               quality_classifier_scores(sf, pos, neg, B, ALPHA)
               .take_all()}
        want = _oracle(rows)
        assert set(got) == set(want)
        for did, (s, p) in want.items():
            assert got[did][0] == pytest.approx(s, abs=2e-6)
            assert got[did][1] == pytest.approx(p, abs=2e-6)

    def test_separates_planted_classes(self, ray_session, tmp_path):
        from ocr_ray.functions.quality_classifier import (
            quality_classifier_scores)

        sf, rows, web_latin = _mk_corpus(tmp_path)
        pos, neg = _preds()
        by_src = {r["doc_id"]: r["source"] for r in rows}
        got = {r["doc_id"]: r["prob"] for r in
               quality_classifier_scores(sf, pos, neg, B, ALPHA)
               .take_all()}
        for did, prob in got.items():
            if by_src[did] != "web" or not rows[did]["text"]:
                continue
            assert (prob > 0.5) == (did in web_latin), (did, prob)

    def test_featureless_doc_scores_prior(self, ray_session, tmp_path):
        from ocr_ray.functions.quality_classifier import (
            quality_classifier_scores)

        sf, rows, _ = _mk_corpus(tmp_path)
        pos, neg = _preds()
        empty_id = max(r["doc_id"] for r in rows)
        got = {r["doc_id"]: r["score"] for r in
               quality_classifier_scores(sf, pos, neg, B, ALPHA)
               .take_all()}
        assert got[empty_id] == pytest.approx(math.log(20 / 20), abs=1e-9)

    def test_empty_class_raises(self, ray_session, tmp_path):
        import pyarrow.compute as pc

        from ocr_ray.functions.quality_classifier import (
            quality_classifier_scores)

        sf, _, _ = _mk_corpus(tmp_path)
        nope = lambda b: pc.equal(b["source"], pa.scalar("zz"))  # noqa: E731
        _, neg = _preds()
        with pytest.raises(ValueError, match="class is empty"):
            quality_classifier_scores(sf, nope, neg, B, ALPHA).take_all()

    def test_sf001_smoke(self, ray_session):
        """Default pred (source='src0' vs rest): every doc scored, probs
        in (0,1), deterministic across two runs."""
        from ocr_ray.functions.quality_classifier import (
            quality_classifier_scores)

        sf = "/root/testdata/sf0.001"
        a = sorted((r["doc_id"], r["prob"]) for r in
                   quality_classifier_scores(sf, n_buckets=1024)
                   .take_all())
        b = sorted((r["doc_id"], r["prob"]) for r in
                   quality_classifier_scores(sf, n_buckets=1024)
                   .take_all())
        assert a == b and len(a) > 0
        assert all(0.0 <= p <= 1.0 for _, p in a)
