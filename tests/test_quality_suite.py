"""Fused quality-signal suite — exact parity with the three standalone
scorers, one read_parquet call, refusals."""
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

B_D = 256
B_L = 512
ALPHA = 1.0


def _mk_corpus(tmp_path):
    import random
    rng = random.Random(7)
    latin = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
             "sed do eiusmod tempor").split()
    xyz = ("zyx wvu tsr qpo nml kji hgf edc baz yxw").split()

    def doc(words):
        return " ".join(rng.choice(words) for _ in range(25))

    rows, did = [], 0
    for _ in range(12):
        rows.append({"doc_id": did, "text": doc(latin), "source": "tgt"})
        did += 1
    for _ in range(25):
        rows.append({"doc_id": did, "text": doc(latin), "source": "raw"})
        did += 1
    for _ in range(25):
        rows.append({"doc_id": did, "text": doc(xyz), "source": "raw"})
        did += 1
    rows.append({"doc_id": did, "text": "one", "source": "raw"})
    rows.append({"doc_id": did + 1, "text": "", "source": "raw"})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(sf / "documents.parquet"))
    return str(sf)


def _pred():
    import pyarrow.compute as pc
    return lambda b: pc.equal(b["source"], pa.scalar("tgt"))


class TestQualitySuite:
    def test_parity_with_standalone_ops(self, ray_session, tmp_path):
        from ocr_ray.functions.dsir import dsir_weights
        from ocr_ray.functions.lm_filter import doc_perplexity
        from ocr_ray.functions.quality_classifier import (
            quality_classifier_scores)
        from ocr_ray.functions.quality_suite import quality_signals

        sf = _mk_corpus(tmp_path)
        fused = {r["doc_id"]: r for r in
                 quality_signals(sf, _pred(), B_D, B_L, B_D,
                                 ALPHA).take_all()}

        dsir = {r["doc_id"]: r["logw"] for r in
                dsir_weights(sf, _pred(), B_D, ALPHA).take_all()}
        lm = {r["doc_id"]: r["ppl"] for r in
              doc_perplexity(sf, _pred(), B_L, ALPHA,
                             pred_columns=("source",)).take_all()}
        nb = {r["doc_id"]: (r["score"], r["prob"]) for r in
              quality_classifier_scores(sf, _pred(), None, B_D,
                                        ALPHA).take_all()}
        assert set(fused) == set(dsir) == set(lm) == set(nb)
        for did, r in fused.items():
            assert r["logw"] == dsir[did], ("logw", did)
            assert r["ppl"] == lm[did], ("ppl", did)
            assert (r["nb_score"], r["nb_prob"]) == nb[did], ("nb", did)

    def test_parity_with_distinct_nb_buckets(self, ray_session,
                                             tmp_path):
        """nb_buckets != dsir_buckets exercises the non-shared hashing
        branch; values still equal the standalone classifier's."""
        from ocr_ray.functions.quality_classifier import (
            quality_classifier_scores)
        from ocr_ray.functions.quality_suite import quality_signals

        sf = _mk_corpus(tmp_path)
        fused = {r["doc_id"]: (r["nb_score"], r["nb_prob"]) for r in
                 quality_signals(sf, _pred(), B_D, B_L, 128,
                                 ALPHA).take_all()}
        nb = {r["doc_id"]: (r["score"], r["prob"]) for r in
              quality_classifier_scores(sf, _pred(), None, 128,
                                        ALPHA).take_all()}
        assert fused == nb

    def test_one_read_parquet_call(self, ray_session, tmp_path):
        from unittest import mock

        import ray.data as rd

        from ocr_ray.functions.quality_suite import quality_signals

        sf = _mk_corpus(tmp_path)
        real = rd.read_parquet
        calls = []

        def counting(path, *a, columns=None, **kw):
            if columns and "text" in columns:
                calls.append(columns)
            return real(path, *a, columns=columns, **kw)

        with mock.patch.object(rd, "read_parquet", counting):
            out = quality_signals(sf, _pred(), B_D, B_L, B_D,
                                  ALPHA).take_all()
        assert len(out) == 64
        # one logical read feeds BOTH the fit aggregate and the scoring
        # map (two passes by design; six passes standalone)
        assert len(calls) == 1, calls

    def test_bigramless_target_raises_like_standalone(self, ray_session,
                                                      tmp_path):
        """Target rows exist but none has >= 2 tokens: the fused suite
        refuses exactly as doc_perplexity does, instead of silently
        scoring with a uniform LM."""
        import pyarrow.compute as pc

        from ocr_ray.functions.quality_suite import quality_signals

        sf = tmp_path / "sf2"
        sf.mkdir()
        pq.write_table(pa.Table.from_pylist(
            [{"doc_id": 0, "text": "single", "source": "tgt"},
             {"doc_id": 1, "text": "two words here", "source": "raw"},
             {"doc_id": 2, "text": "and more words", "source": "raw"}]),
            str(sf / "documents.parquet"))
        pred = lambda b: pc.equal(b["source"], pa.scalar("tgt"))  # noqa: E731
        with pytest.raises(ValueError, match="LM target is empty"):
            quality_signals(str(sf), pred, B_D, B_L, B_D).take_all()

    def test_empty_target_raises(self, ray_session, tmp_path):
        import pyarrow.compute as pc

        from ocr_ray.functions.quality_suite import quality_signals

        sf = _mk_corpus(tmp_path)
        nope = lambda b: pc.equal(b["source"], pa.scalar("zz"))  # noqa: E731
        with pytest.raises(ValueError, match="target is empty"):
            quality_signals(sf, nope, B_D, B_L, B_D).take_all()

    def test_sf001_smoke_default_pred(self, ray_session):
        from ocr_ray.functions.quality_suite import quality_signals

        got = quality_signals("/root/testdata/sf0.001", None,
                              1024, 2048, 1024).take_all()
        assert len(got) > 0
        for r in got[:5]:
            assert r["ppl"] is None or r["ppl"] > 0
            assert 0.0 <= r["nb_prob"] <= 1.0
