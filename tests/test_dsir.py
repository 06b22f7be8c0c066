"""DSIR importance resampling — pure-python oracle + planted-mixture
enrichment semantics."""
import hashlib
import math
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

B = 256          # small bucket space so collisions are exercised
ALPHA = 1.0
SEED = 17


def _mk_corpus(tmp_path, n_latin=60, n_xyz=60, n_target=15):
    """Raw corpus: latin-ish docs + xyz-ish docs; target = docs with
    source='tgt' (latin-ish) — DSIR should enrich latin."""
    import random
    rng = random.Random(5)
    latin = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
             "sed do eiusmod tempor incididunt ut labore").split()
    xyz = ("zyx wvu tsr qpo nml kji hgf edc baz yxw vut srq pon "
           "mlk jih gfe dcb").split()

    def doc(words):
        return " ".join(rng.choice(words) for _ in range(30))

    rows = []
    did = 0
    for _ in range(n_target):
        rows.append({"doc_id": did, "text": doc(latin), "source": "tgt"})
        did += 1
    for _ in range(n_latin):
        rows.append({"doc_id": did, "text": doc(latin), "source": "raw"})
        did += 1
    for _ in range(n_xyz):
        rows.append({"doc_id": did, "text": doc(xyz), "source": "raw"})
        did += 1
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(sf / "documents.parquet"))
    return str(sf), rows


def _pred_factory(value="tgt"):
    """Returns a dynamically-created lambda: cloudpickle serializes it
    by VALUE, so Ray workers never need to import this test module."""
    import pyarrow.compute as pc
    return lambda batch: pc.equal(batch["source"], pa.scalar(value))


def _oracle(rows):
    """Independent reimplementation of the whole DSIR pipeline."""
    from ocr_ray.functions.corpus_prep import _tokens

    def bids(text):
        toks = _tokens(text)
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return np.asarray([zlib.crc32(f.encode()) % B for f in feats],
                          dtype=np.int64)

    raw = np.zeros(B, np.int64)
    tgt = np.zeros(B, np.int64)
    for r in rows:
        bc = np.bincount(bids(r["text"]), minlength=B)
        raw += bc
        if r["source"] == "tgt":
            tgt += bc
    p = (tgt + ALPHA) / (tgt.sum() + ALPHA * B)
    q = (raw + ALPHA) / (raw.sum() + ALPHA * B)
    lr = np.log(p) - np.log(q)
    out = {}
    for r in rows:
        ids = bids(r["text"])
        w = float(lr[ids].sum()) if len(ids) else 0.0
        h = hashlib.md5(f"{SEED}:{r['doc_id']}".encode()).digest()
        u = (int.from_bytes(h[:8], "big") >> 11) / float(1 << 53)
        u = min(max(u, 1e-12), 1.0 - 1e-12)
        out[r["doc_id"]] = (w, w + (-math.log(-math.log(u))))
    return out


class TestDsir:
    def test_weights_match_oracle(self, ray_session, tmp_path):
        from ocr_ray.functions.dsir import dsir_weights

        sf, rows = _mk_corpus(tmp_path)
        got = {r["doc_id"]: (r["logw"], r["key"]) for r in
               dsir_weights(sf, _pred_factory(), B, ALPHA, SEED).take_all()}
        want = _oracle(rows)
        assert set(got) == set(want)
        for did in want:
            assert got[did][0] == pytest.approx(want[did][0], rel=1e-12)
            assert got[did][1] == pytest.approx(want[did][1], rel=1e-12)

    def test_select_is_gumbel_topk(self, ray_session, tmp_path):
        from ocr_ray.functions.dsir import dsir_select

        sf, rows = _mk_corpus(tmp_path)
        k = 25
        got = [r["doc_id"] for r in
               dsir_select(sf, k, _pred_factory(), B, ALPHA, SEED).take_all()]
        want = sorted(_oracle(rows).items(), key=lambda kv: -kv[1][1])
        assert got == [d for d, _ in want[:k]]

    def test_enriches_target_like_docs(self, ray_session, tmp_path):
        from ocr_ray.functions.dsir import dsir_select

        sf, rows = _mk_corpus(tmp_path)
        # latin marker: no overlap with the xyz vocabulary
        latin_ids = {r["doc_id"] for r in rows
                     if "zyx" not in r["text"] and "wvu" not in r["text"]
                     and not set(r["text"].split())
                     & {"tsr", "qpo", "nml", "kji", "hgf", "edc", "baz",
                        "yxw", "vut", "srq", "pon", "mlk", "jih", "gfe",
                        "dcb"}}
        sel = [r["doc_id"] for r in
               dsir_select(sf, 30, _pred_factory(), B, ALPHA, SEED).take_all()]
        frac = len([d for d in sel if d in latin_ids]) / len(sel)
        # 60/120 raw docs are latin; DSIR should pick nearly all latin
        assert frac >= 0.9

    def test_deterministic_and_layout_independent(self, ray_session,
                                                  tmp_path):
        from ocr_ray.functions.dsir import dsir_select

        sf, rows = _mk_corpus(tmp_path)
        a = [r["doc_id"] for r in
             dsir_select(sf, 20, _pred_factory(), B, ALPHA, SEED).take_all()]
        b = [r["doc_id"] for r in
             dsir_select(sf, 20, _pred_factory(), B, ALPHA, SEED).take_all()]
        assert a == b

    def test_empty_target_raises(self, ray_session, tmp_path):
        from ocr_ray.functions.dsir import dsir_weights

        sf, _ = _mk_corpus(tmp_path)

        with pytest.raises(ValueError, match="target is empty"):
            dsir_weights(sf, _pred_factory("nope"), B, ALPHA,
                         SEED).take_all()

    def test_default_pred_on_sf001(self, ray_session):
        """Driver-corpus smoke: default target (source='src0'); weights
        exist for every doc and selection is a strict subset."""
        from ocr_ray.functions.dsir import dsir_select, dsir_weights

        sf = "/root/testdata/sf0.001"
        w = dsir_weights(sf, n_buckets=1024)
        n = w.count()
        sel = dsir_select(sf, 10, n_buckets=1024).take_all()
        assert n > 0 and len(sel) == 10
        keys = [r["key"] for r in sel]
        assert keys == sorted(keys, reverse=True)


class TestSourceDivergence:
    def test_identical_sources_diverge_zero(self, ray_session, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.dsir import source_token_divergence

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        texts = [f"shared vocabulary doc {i} alpha beta" for i in range(20)]
        rows = ([{"doc_id": i, "text": t, "source": "a"}
                 for i, t in enumerate(texts)]
                + [{"doc_id": 100 + i, "text": t, "source": "b"}
                   for i, t in enumerate(texts)])
        pq.write_table(pa.Table.from_pylist(rows),
                       f"{sf}/documents.parquet")
        out = source_token_divergence(sf).to_pylist()
        assert len(out) == 1
        assert out[0]["js_divergence"] == 0.0

    def test_disjoint_sources_diverge_high(self, ray_session, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.dsir import source_token_divergence

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        rows = ([{"doc_id": i, "text": f"latin verba {i} scriptum est",
                  "source": "latin"} for i in range(20)]
                + [{"doc_id": 100 + i, "text": f"zzq xxw {i} qqz wwx",
                    "source": "xyz"} for i in range(20)])
        pq.write_table(pa.Table.from_pylist(rows),
                       f"{sf}/documents.parquet")
        out = source_token_divergence(sf).to_pylist()
        assert out[0]["js_divergence"] > 0.5

    def test_sf0001_runs_and_is_symmetric_complete(self, ray_session):
        from ocr_ray.functions.dsir import source_token_divergence

        out = source_token_divergence("/root/testdata/sf0.001")
        n_src = len({r["source_a"] for r in out.to_pylist()}
                    | {r["source_b"] for r in out.to_pylist()})
        assert len(out) == n_src * (n_src - 1) // 2
        assert all(0.0 <= r["js_divergence"] <= 1.0
                   for r in out.to_pylist())
