"""Bloom-filter decontamination — no-false-negatives vs the exact
operator, merge==OR, FP-forcing tiny filter, external probe file."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _mk_corpus(tmp_path):
    """Docs 0..2 are probes; docs 10/11 copy probe passages (planted
    contamination); the rest are clean."""
    import random
    rng = random.Random(3)
    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()

    def doc(n=30):
        return " ".join(rng.choice(vocab) for _ in range(n))

    rows = [{"doc_id": i, "text": doc()} for i in range(3)]
    # contaminated: embed an 8+-token window from probe 0 / probe 2
    rows.append({"doc_id": 10,
                 "text": doc(5) + " " + " ".join(
                     rows[0]["text"].split()[4:14]) + " " + doc(5)})
    rows.append({"doc_id": 11,
                 "text": " ".join(rows[2]["text"].split()[0:9])})
    for i in range(12, 40):
        # clean docs: distinct vocabulary, no 8-gram overlap possible
        rows.append({"doc_id": i,
                     "text": " ".join(f"w{i}x{j}" for j in range(25))})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(sf / "documents.parquet"))
    return str(sf), rows


class TestBloom:
    def test_equals_exact_at_default_size(self, ray_session, tmp_path):
        from ocr_ray.functions.bloom import bloom_contamination_check
        from ocr_ray.functions.corpus_prep import contamination_check

        sf, _ = _mk_corpus(tmp_path)
        exact = {r["doc_id"]: r["n_hits"] for r in
                 contamination_check(sf).take_all()}
        got = {r["doc_id"]: r["n_hits"] for r in
               bloom_contamination_check(sf).take_all()}
        # at m=2^23 with a few hundred inserted n-grams the FP chance is
        # ~1e-20 — the bloom answer IS the exact answer
        assert got == exact
        assert 10 in got and 11 in got

    def test_superset_even_when_tiny(self, ray_session, tmp_path):
        from ocr_ray.functions.bloom import bloom_contamination_check
        from ocr_ray.functions.corpus_prep import contamination_check

        sf, _ = _mk_corpus(tmp_path)
        exact = {r["doc_id"]: r["n_hits"] for r in
                 contamination_check(sf).take_all()}
        got = {r["doc_id"]: r["n_hits"] for r in
               bloom_contamination_check(sf, m_bits=64,
                                         k_hashes=2).take_all()}
        # a 64-bit filter is saturated with false positives, but it can
        # NEVER miss: every exact hit present, counted at least as high
        for did, n in exact.items():
            assert got.get(did, 0) >= n

    def test_build_merge_is_or(self, ray_session, tmp_path):
        """Distributed build over many blocks == single-pass oracle."""
        import ray.data as rd

        from ocr_ray.functions.bloom import (_positions, _win_digests,
                                             build_ngram_bloom)

        sf, rows = _mk_corpus(tmp_path)
        texts = [r["text"] for r in rows]
        m, k = 1 << 12, 3
        ds = rd.from_items([{"text": t} for t in texts],
                           override_num_blocks=8)
        got = np.frombuffer(build_ngram_bloom(ds, 8, m, k), np.uint8)
        want = np.zeros(m // 8, np.uint8)
        for t in texts:
            pos = _positions(_win_digests(t, 8), k, m).ravel()
            if len(pos):
                np.bitwise_or.at(want, pos >> 3,
                                 (1 << (pos & 7)).astype(np.uint8))
        assert np.array_equal(got, want)

    def test_positions_match_exact_hash(self):
        """Bloom windows hash with the SAME md5 as the exact operator."""
        from ocr_ray.functions.bloom import _win_digests
        from ocr_ray.functions.corpus_prep import _win_hashes_fn

        text = "one two three four five six seven eight nine ten"
        assert [d.hex() for d in _win_digests(text, 8)] == \
            _win_hashes_fn(8)(text)
        assert _win_digests("too short", 8) == []

    def test_external_probe_file(self, ray_session, tmp_path):
        from ocr_ray.functions.bloom import bloom_contamination_check

        sf, rows = _mk_corpus(tmp_path)
        probe = tmp_path / "eval.parquet"
        # eval set = the planted passage from doc 0
        pq.write_table(pa.Table.from_pylist(
            [{"text": " ".join(rows[0]["text"].split()[4:14])}]),
            str(probe))
        got = {r["doc_id"] for r in
               bloom_contamination_check(sf, probe_path=str(probe))
               .take_all()}
        assert 10 in got            # carries the passage
        assert 0 in got             # probe docs are NOT excluded here
        assert 11 not in got        # different probe's passage
        assert not any(d >= 12 for d in got)

    def test_sf001_matches_exact(self, ray_session):
        from ocr_ray.functions.bloom import bloom_contamination_check
        from ocr_ray.functions.corpus_prep import contamination_check

        sf = "/root/testdata/sf0.001"
        exact = {r["doc_id"]: r["n_hits"] for r in
                 contamination_check(sf).take_all()}
        got = {r["doc_id"]: r["n_hits"] for r in
               bloom_contamination_check(sf).take_all()}
        assert got == exact
