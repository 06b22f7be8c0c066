"""Edit-similarity verification: DP kernel vs a classic reference
implementation (fuzz), order-awareness, and the end-to-end planted
near-dup pipeline."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ref_lev(a, b):
    """Classic O(n*m) reference DP (independent implementation)."""
    n, m = len(a), len(b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        dp[i][0] = i
    for j in range(m + 1):
        dp[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                           dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return dp[n][m]


def _write_docs(path, rows):
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(rows)]),
        f"{path}/documents.parquet")


class TestKernel:
    def test_classic_cases(self):
        from ocr_ray.functions.editsim import token_edit_distance

        k = np.array([1, 2, 3, 3, 4, 5])       # "kitten"-style ids
        s = np.array([6, 2, 3, 3, 2, 5, 7])
        assert token_edit_distance(k, s) == _ref_lev(list(k), list(s))
        assert token_edit_distance(k, k) == 0
        assert token_edit_distance(k, np.array([], np.int64)) == 6

    def test_fuzz_vs_reference(self):
        from ocr_ray.functions.editsim import token_edit_distance

        rng = np.random.RandomState(5)
        for _ in range(60):
            a = rng.randint(0, 6, size=rng.randint(0, 25))
            b = rng.randint(0, 6, size=rng.randint(0, 25))
            assert token_edit_distance(a, b) == _ref_lev(list(a), list(b))

    def test_order_awareness(self):
        """A shuffled copy has Jaccard 1.0 but low edit similarity —
        the distinction this operator exists for."""
        from ocr_ray.functions.editsim import token_edit_similarity

        words = [f"w{i}" for i in range(60)]
        a = " ".join(words)
        b = " ".join(reversed(words))
        assert token_edit_similarity(a, a) == 1.0
        assert token_edit_similarity(a, b) < 0.1
        assert token_edit_similarity("", "") == 1.0


class TestVerifyPairs:
    def test_verify_filters_by_similarity(self, ray_session, tmp_path):
        import ray.data as rd

        from ocr_ray.functions.editsim import edit_verify_pairs

        sf = str(tmp_path / "sf")
        base = " ".join(f"t{i}" for i in range(100))
        near = " ".join([f"t{i}" for i in range(95)]
                        + [f"x{i}" for i in range(5)])    # 5 subs
        other = " ".join(f"z{i}" for i in range(100))
        _write_docs(sf, [base, near, other])
        pairs = rd.from_arrow(pa.table({
            "doc_a": pa.array([0, 0], pa.int64()),
            "doc_b": pa.array([1, 2], pa.int64())}))
        out = {(r["doc_a"], r["doc_b"]): r["edit_sim"]
               for r in edit_verify_pairs(sf, pairs, 0.9).take_all()}
        assert out == {(0, 1): 0.95}

    def test_empty_pairs(self, ray_session, tmp_path):
        import ray.data as rd

        from ocr_ray.functions.editsim import edit_verify_pairs

        sf = str(tmp_path / "sf")
        _write_docs(sf, ["a b c"])
        pairs = rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64())}))
        assert edit_verify_pairs(sf, pairs).take_all() == []


class TestEndToEnd:
    def test_planted_corpus(self, ray_session, tmp_path):
        """Exact dups and tail-swap near dups survive the edit verify;
        a SHUFFLED copy passes the Jaccard gate but is rejected."""
        from ocr_ray.fixtures import write_neardup_corpus
        from ocr_ray.functions.editsim import edit_near_dup_pairs

        sf = str(tmp_path / "sf")
        write_neardup_corpus(sf)
        # append a shuffled copy of doc 0's text as a new doc
        t = pq.read_table(f"{sf}/documents.parquet")
        words = t["text"][0].as_py().split()
        shuffled = " ".join(reversed(words))
        new_id = max(t["doc_id"].to_pylist()) + 1
        t2 = pa.concat_tables([t, pa.Table.from_pylist(
            [{"doc_id": new_id, "text": shuffled}], schema=t.schema)])
        pq.write_table(t2, f"{sf}/documents.parquet")

        got = {(r["doc_a"], r["doc_b"])
               for r in edit_near_dup_pairs(sf, jaccard_gate=0.5,
                                            edit_threshold=0.9)
               .take_all()}
        # 20 exact pairs (ids 240..279) + 40 near pairs (280..359)
        exact = {(240 + 2 * i, 241 + 2 * i) for i in range(20)}
        near = {(280 + 2 * i, 281 + 2 * i) for i in range(40)}
        assert exact <= got
        assert near <= got
        # the shuffled copy must be gated OUT by the edit verify
        assert not any(new_id in p for p in got)
        # and nothing else sneaks in
        assert got == exact | near


class TestMetamorphic:
    def test_metric_properties(self):
        """Levenshtein is a metric: symmetry, identity, triangle
        inequality — fuzzed over random token-id triples."""
        from ocr_ray.functions.editsim import token_edit_distance

        rng = np.random.RandomState(77)
        for _ in range(40):
            a = rng.randint(0, 5, size=rng.randint(0, 18))
            b = rng.randint(0, 5, size=rng.randint(0, 18))
            c = rng.randint(0, 5, size=rng.randint(0, 18))
            dab = token_edit_distance(a, b)
            dba = token_edit_distance(b, a)
            dac = token_edit_distance(a, c)
            dcb = token_edit_distance(c, b)
            assert dab == dba                       # symmetry
            assert token_edit_distance(a, a) == 0   # identity
            assert dab <= dac + dcb                 # triangle
            # single edit moves distance by at most 1
            if len(a):
                a2 = a.copy()
                a2[0] = (a2[0] + 1) % 7
                assert abs(token_edit_distance(a2, b) - dab) <= 1
