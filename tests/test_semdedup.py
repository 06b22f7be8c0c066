"""SemDeDup (cluster-based semantic dedup) — planted-geometry oracles.

The corpus is built so every true near-dup pair lies well inside one
k-means cluster (centers near-orthogonal, members tightly around them):
global brute-force pairs == within-cluster pairs, so the method's
documented cross-cluster blind spot cannot hide a recall failure here.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _unit(v):
    return v / np.linalg.norm(v)


def _build_corpus(tmp_path, jitter=0.02):
    """4 near-orthogonal centers in R^8; per center: a dup component of
    3 tight members (pairwise cos > 0.99), plus 2 loose singletons
    (cos < 0.9 to everything).  Rows interleaved across groups so the
    centroid init (first-k rows) sees all 4 groups."""
    rng = np.random.RandomState(7)
    centers = np.eye(8)[:4] * 10.0
    rows = []   # (vec_id, embedding, label)
    vid = 0
    per_group = []
    for g, c in enumerate(centers):
        members = []
        base = c + rng.uniform(-1, 1, 8) * jitter
        for _ in range(3):                       # tight dup component
            members.append(base + rng.uniform(-1, 1, 8) * jitter)
        for _ in range(2):                       # loose singletons
            members.append(c + rng.uniform(-1, 1, 8) * 3.0)
        per_group.append(members)
    for i in range(5):
        for g in range(4):
            rows.append((vid, per_group[g][i], g))
            vid += 1
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([list(np.asarray(r[1], np.float32))
                                   for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }), str(sf / "embeddings.parquet"))
    vecs = {r[0]: np.asarray(r[1], np.float64) for r in rows}
    return str(sf), vecs


def _brute_pairs(vecs, thr):
    ids = sorted(vecs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = float(_unit(vecs[a]) @ _unit(vecs[b]))
            if c >= thr:
                out.add((a, b))
    return out


THR = 0.95


class TestSemanticDedup:
    def test_pairs_match_bruteforce(self, ray_session, tmp_path):
        from ocr_ray.functions.semdedup import semantic_dedup_pairs

        sf, vecs = _build_corpus(tmp_path)
        got = semantic_dedup_pairs(sf, THR, n_clusters=4).take_all()
        got_pairs = {(r["vec_a"], r["vec_b"]) for r in got}
        want = _brute_pairs(vecs, THR)
        assert got_pairs == want
        assert len(want) == 4 * 3          # 4 components of 3 -> 3 pairs
        # exact cosines (1e-4 rounding, same as the LSH family)
        for r in got:
            c = float(_unit(vecs[r["vec_a"]]) @ _unit(vecs[r["vec_b"]]))
            assert r["cosine"] == pytest.approx(
                np.floor(c * 1e4 + 0.5) / 1e4)

    def test_losers_keep_lowest_centroid_cosine(self, ray_session,
                                                tmp_path):
        from ocr_ray.functions.semdedup import semantic_dedup_losers
        from ocr_ray.functions.similarity import build_ivf_index

        sf, vecs = _build_corpus(tmp_path)
        losers = semantic_dedup_losers(sf, THR, n_clusters=4).take_all()
        # each 3-member component drops exactly 2
        assert len(losers) == 4 * 2
        _path, cent = build_ivf_index(sf, 4)
        by_keeper = {}
        for r in losers:
            by_keeper.setdefault(r["keeper"], []).append(r)
        assert len(by_keeper) == 4
        for keeper, rs in by_keeper.items():
            cl = rs[0]["cluster"]
            c = _unit(cent[cl])
            comp = [keeper] + [r["vec_id"] for r in rs]
            # paper rule: the keeper is the component member with the
            # LOWEST cosine to its cluster centroid
            want = min(comp,
                       key=lambda v: (float(_unit(vecs[v]) @ c), v))
            assert keeper == want

    def test_survivors_partition(self, ray_session, tmp_path):
        from ocr_ray.functions.semdedup import (semantic_dedup_losers,
                                                semantic_dedup_survivors)

        sf, vecs = _build_corpus(tmp_path)
        losers = {r["vec_id"] for r in
                  semantic_dedup_losers(sf, THR, n_clusters=4).take_all()}
        surv = {r["vec_id"] for r in
                semantic_dedup_survivors(sf, THR, n_clusters=4).take_all()}
        assert losers | surv == set(vecs)
        assert losers & surv == set()
        assert len(surv) == 20 - 8

    def test_no_dups_is_identity(self, ray_session, tmp_path):
        from ocr_ray.functions.semdedup import (semantic_dedup_pairs,
                                                semantic_dedup_survivors)

        # only the loose singletons: no pair reaches the threshold
        sf, vecs = _build_corpus(tmp_path, jitter=0.0)
        # rebuild with all members loose
        rng = np.random.RandomState(3)
        centers = np.eye(8)[:4] * 10.0
        rows = []
        vid = 0
        for i in range(3):
            for g in range(4):
                v = centers[g] + rng.uniform(-1, 1, 8) * 3.0
                rows.append((vid, v, g))
                vid += 1
        sf2 = tmp_path / "sf2"
        sf2.mkdir()
        pq.write_table(
            pa.table({
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [list(np.asarray(r[1], np.float32)) for r in rows],
                    pa.list_(pa.float32())),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }), str(sf2 / "embeddings.parquet"))
        assert semantic_dedup_pairs(str(sf2), THR, 4).count() == 0
        assert semantic_dedup_survivors(str(sf2), THR, 4).count() == 12

    def test_deterministic_across_runs(self, ray_session, tmp_path):
        from ocr_ray.functions.semdedup import semantic_dedup_losers

        sf, _ = _build_corpus(tmp_path)
        a = sorted((r["vec_id"], r["cluster"], r["keeper"]) for r in
                   semantic_dedup_losers(sf, THR, n_clusters=4).take_all())
        b = sorted((r["vec_id"], r["cluster"], r["keeper"]) for r in
                   semantic_dedup_losers(sf, THR, n_clusters=4).take_all())
        assert a == b

    def test_sf001_corpus_runs(self, ray_session):
        """Smoke over the driver corpus: pairs are exact-cosine-verified
        members of the same bucket; losers ⊂ pair members."""
        from ocr_ray.functions.semdedup import (semantic_dedup_losers,
                                                semantic_dedup_pairs)

        sf = "/root/testdata/sf0.01"
        pairs = semantic_dedup_pairs(sf, 0.95, 16).take_all()
        losers = semantic_dedup_losers(sf, 0.95, 16).take_all()
        in_pairs = {r["vec_a"] for r in pairs} | {r["vec_b"] for r in pairs}
        assert {r["vec_id"] for r in losers} <= in_pairs
        for r in pairs:
            assert r["vec_a"] < r["vec_b"]
            assert r["cosine"] >= 0.95

    def test_overcap_cluster_uses_rehub_and_stays_correct(
            self, ray_session, tmp_path):
        """One cluster holds a 70-member near-identical component
        (above _ALL_PAIRS_CAP=64, so the kernel takes the hub-rehub
        walk): every member must still join ONE component and exactly
        one keeper survives."""
        from ocr_ray.functions.semdedup import (semantic_dedup_losers,
                                                semantic_dedup_pairs)

        rng = np.random.RandomState(23)
        centers = np.eye(8)[:2] * 10.0
        rows = []
        base = centers[0] + rng.uniform(-1, 1, 8) * 0.01
        for vid in range(70):                    # big dup component
            rows.append((vid, base + rng.uniform(-1, 1, 8) * 0.01, 0))
        # two fillers in the other cluster at a deliberate 25 degrees
        # (cos 0.906 < THR) so they can never pair with anything
        a = np.radians(25.0)
        rows.append((70, centers[1], 1))
        rows.append((71, 10.0 * (np.cos(a) * np.eye(8)[1]
                                 + np.sin(a) * np.eye(8)[2]), 1))
        sf = tmp_path / "sfbig"
        sf.mkdir()
        pq.write_table(
            pa.table({
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [list(np.asarray(r[1], np.float32)) for r in rows],
                    pa.list_(pa.float32())),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }), str(sf / "embeddings.parquet"))

        pairs = semantic_dedup_pairs(str(sf), THR, n_clusters=2).take_all()
        members = {r["vec_a"] for r in pairs} | {r["vec_b"] for r in pairs}
        assert members == set(range(70))
        losers = semantic_dedup_losers(str(sf), THR,
                                       n_clusters=2).take_all()
        # the rehub walk may not emit every O(n^2) pair, but it must
        # keep the component CONNECTED: exactly one keeper survives
        assert len(losers) == 69
        keepers = {r["keeper"] for r in losers}
        assert len(keepers) == 1
        assert keepers.pop() not in {r["vec_id"] for r in losers}
