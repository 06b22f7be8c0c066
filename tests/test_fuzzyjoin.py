"""Cross-dataset fuzzy join: brute-force pair-set parity, no
within-side pairs, identical-text recall guarantee, layout
independence, and the order-aware edit re-verify."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "machine learning systems require careful data curation and "
    "deduplication before any training run begins in earnest",
    "romanian legal documents describe administrative procedures for "
    "municipal authorities and local councils in great detail",
    "completely unrelated text about cooking pasta with fresh tomatoes "
    "and basil leaves from the garden this summer",
    "weather forecasts predict heavy rainfall across the northern "
    "region with strong winds and falling temperatures overnight",
]


def _mutate(s: str, n_swaps: int) -> str:
    toks = s.split()
    for k in range(n_swaps):
        toks[(3 * k) % len(toks)] = f"tok{k}x"
    return " ".join(toks)


def _tables():
    left = pa.table({
        "doc_id": pa.array(range(len(BASE)), pa.int64()),
        "text": pa.array(BASE, pa.string())})
    right_rows = [
        (100, BASE[0]),                 # identical -> jaccard 1.0
        (101, _mutate(BASE[1], 1)),     # near-dup
        (102, _mutate(BASE[2], 2)),     # near-dup-ish
        (103, "totally different content about astronomy telescopes "
              "observing distant galaxies through clear night skies"),
        (104, BASE[4] + " extra trailing clause appended here"),
    ]
    right = pa.table({
        "doc_id": pa.array([r[0] for r in right_rows], pa.int64()),
        "text": pa.array([r[1] for r in right_rows], pa.string())})
    return left, right


class TestFuzzyJoin:
    @pytest.mark.parametrize("thr", [0.5, 0.8])
    def test_brute_force_parity(self, ray_session, thr):
        from ocr_ray.functions.fuzzyjoin import fuzzy_join, fuzzy_join_brute

        left, right = _tables()
        got = {(r["left_id"], r["right_id"], r["jaccard"])
               for r in fuzzy_join(left, right, jaccard_threshold=thr)
               .to_pandas().to_dict("records")}
        want = fuzzy_join_brute(left, right, thr)
        # identical/near-identical pairs (j >= 0.7) MUST be found (band
        # collision prob >= 1-(1-0.7^4)^8 = 0.89; these planted pairs
        # share full bands by construction); any found pair must carry
        # the exact brute-force jaccard
        assert got <= want
        must = {(l, r, j) for (l, r, j) in want if j >= 0.99}
        assert must <= got

    def test_no_within_side_pairs_and_sides_oriented(self, ray_session):
        from ocr_ray.functions.fuzzyjoin import fuzzy_join

        left, right = _tables()
        df = fuzzy_join(left, right, jaccard_threshold=0.3).to_pandas()
        assert set(df.left_id) <= set(range(len(BASE)))
        assert set(df.right_id) <= {100, 101, 102, 103, 104}

    def test_identical_text_always_found(self, ray_session):
        from ocr_ray.functions.fuzzyjoin import fuzzy_join

        n = 30
        texts = [f"shared sentence number {i} with common filler words "
                 f"for realistic shingle overlap patterns" for i in range(n)]
        left = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                         "text": pa.array(texts)})
        right = pa.table({"doc_id": pa.array(range(1000, 1000 + n),
                                             pa.int64()),
                          "text": pa.array(texts)})
        df = fuzzy_join(left, right, jaccard_threshold=0.9).to_pandas()
        exact = df[df.jaccard >= 0.999]
        # every i <-> 1000+i identical pair collides in every band
        assert {(r.left_id, r.right_id) for r in exact.itertuples()} >= {
            (i, 1000 + i) for i in range(n)}

    def test_layout_independence(self, ray_session, tmp_path):
        import ray.data as rd

        from ocr_ray.functions.fuzzyjoin import fuzzy_join

        left, right = _tables()
        a = {(r["left_id"], r["right_id"], r["jaccard"])
             for r in fuzzy_join(left, right, jaccard_threshold=0.5)
             .to_pandas().to_dict("records")}
        # same rows, radically different block layout
        lds = rd.from_arrow(left).repartition(5)
        rds = rd.from_arrow(right).repartition(3)
        b = {(r["left_id"], r["right_id"], r["jaccard"])
             for r in fuzzy_join(lds, rds, jaccard_threshold=0.5)
             .to_pandas().to_dict("records")}
        assert a == b

    def test_edit_threshold_rejects_shuffled_copy(self, ray_session):
        from ocr_ray.functions.fuzzyjoin import fuzzy_join

        # swap the two halves: shingle set nearly identical (only the
        # boundary 3-grams change) but token order is globally broken
        doc = " ".join(f"w{i}token" for i in range(60))
        toks = doc.split()
        swapped = " ".join(toks[30:] + toks[:30])
        left = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                         "text": pa.array([doc, BASE[2]])})
        right = pa.table({"doc_id": pa.array([100, 101], pa.int64()),
                          "text": pa.array([swapped, BASE[2]])})
        loose = fuzzy_join(left, right, jaccard_threshold=0.5).to_pandas()
        # the shuffled copy passes the set-based gate…
        assert (0, 100) in {(r.left_id, r.right_id)
                            for r in loose.itertuples()}
        strict = fuzzy_join(left, right, jaccard_threshold=0.5,
                            edit_threshold=0.8).to_pandas()
        pairs = {(r.left_id, r.right_id) for r in strict.itertuples()}
        # …and is rejected by the order-aware verify; the true copy stays
        assert (0, 100) not in pairs
        assert (1, 101) in pairs
        assert "edit_sim" in strict.columns
        row = strict[(strict.left_id == 1) & (strict.right_id == 101)]
        assert float(row.edit_sim.iloc[0]) == 1.0

    def test_custom_column_names(self, ray_session):
        from ocr_ray.functions.fuzzyjoin import fuzzy_join

        left, right = _tables()
        left2 = left.rename_columns(["item_id", "body"])
        right2 = right.rename_columns(["item_id", "body"])
        df = fuzzy_join(left2, right2, key_col="item_id",
                        text_col="body", jaccard_threshold=0.9).to_pandas()
        assert (0, 100) in {(r.left_id, r.right_id)
                            for r in df.itertuples()}

    def test_empty_candidate_set(self, ray_session):
        from ocr_ray.functions.fuzzyjoin import fuzzy_join

        left = pa.table({"doc_id": pa.array([0], pa.int64()),
                         "text": pa.array(["alpha beta gamma delta "
                                           "epsilon zeta eta theta"])})
        right = pa.table({"doc_id": pa.array([100], pa.int64()),
                          "text": pa.array(["one two three four five "
                                            "six seven eight nine"])})
        ds = fuzzy_join(left, right, jaccard_threshold=0.9)
        assert ds.count() == 0
        assert set(ds.schema().names) == {"left_id", "right_id", "jaccard"}


class TestBandGeometry:
    def test_low_threshold_auto_loosens_bands(self, ray_session):
        """Below thr 0.6 the same 32-perm signatures re-band 16x2:
        collision prob at j~0.45 goes 0.26 -> ~0.97.  Planted
        moderate-overlap pairs (drop every 7th word: shingle j ~ 0.44)
        must be found at thr 0.4 — the 8x4 geometry misses most."""
        import numpy as np

        from ocr_ray.functions.fuzzyjoin import fuzzy_join

        rng = np.random.default_rng(11)
        n = 25
        docs = [" ".join(f"w{rng.integers(0, 50_000)}x{j}"
                         for j in range(70)) for _ in range(n)]
        mut = [" ".join(w for i, w in enumerate(d.split()) if i % 7)
               for d in docs]
        left = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                         "text": pa.array(docs)})
        right = pa.table({"doc_id": pa.array([100 + i for i in range(n)],
                                             pa.int64()),
                          "text": pa.array(mut)})
        auto = fuzzy_join(left, right, jaccard_threshold=0.4).to_pandas()
        hits = {(r.left_id, r.right_id) for r in auto.itertuples()}
        planted = {(i, 100 + i) for i in range(n)}
        assert len(hits & planted) / n >= 0.9
        # pinned tight geometry finds far fewer of the same pairs
        tight = fuzzy_join(left, right, jaccard_threshold=0.4,
                           band_rows=4).to_pandas()
        t_hits = {(r.left_id, r.right_id) for r in tight.itertuples()}
        assert len(t_hits & planted) < len(hits & planted)

    def test_invalid_band_rows_refused(self, ray_session):
        from ocr_ray.functions.fuzzyjoin import fuzzy_join

        left, right = _tables()
        with pytest.raises(ValueError, match="band_rows"):
            fuzzy_join(left, right, band_rows=3)
