"""Winnowing fingerprints: the paper's guarantees (window coverage,
shared-substring detection, density), reference parity, and the
overlap-pair detector on planted shared passages."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ref_winnow(text, k, w):
    """Independent reference implementation (per-character loops)."""
    data = text.encode("utf-8")
    if len(data) < k:
        return []
    base = 1_000_003
    hashes = []
    for i in range(len(data) - k + 1):
        h = 0
        for c in data[i:i + k]:
            h = (h * base + c) % (1 << 64)
        hashes.append(h)
    if len(hashes) < w:
        best = min(range(len(hashes)), key=lambda i: (hashes[i], -i))
        return [(best, hashes[best])]
    out, last = [], -1
    for s in range(len(hashes) - w + 1):
        win = hashes[s:s + w]
        m = min(win)
        i = s + max(j for j in range(w) if win[j] == m)  # rightmost
        if i != last:
            out.append((i, hashes[i]))
            last = i
    return out


def _write_docs(path, rows):
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(rows)]),
        f"{path}/documents.parquet")


class TestSelection:
    def test_matches_reference(self):
        from ocr_ray.functions.winnow import winnow_select

        rng = np.random.RandomState(9)
        texts = ["the quick brown fox jumps over the lazy dog",
                 "aaaaaaaaaaaaaaaa", "ab", "", "abcdefg",
                 "x" * 3 + "abcabcabc" * 5]
        texts += ["".join(rng.choice(list("abcd efg"), size=60))
                  for _ in range(20)]
        for t in texts:
            pos, fp = winnow_select(t, k=5, w=4)
            assert list(zip(pos.tolist(), fp.tolist())) == \
                _ref_winnow(t, 5, 4)

    def test_window_coverage_guarantee(self):
        """Every window of w consecutive k-grams contains a selection."""
        from ocr_ray.functions.winnow import winnow_select

        rng = np.random.RandomState(3)
        t = "".join(rng.choice(list("abcdef "), size=400))
        k, w = 5, 4
        pos, _ = winnow_select(t, k, w)
        ps = set(pos.tolist())
        n_grams = len(t.encode()) - k + 1
        for s in range(n_grams - w + 1):
            assert any(s <= p < s + w for p in ps)

    def test_shared_substring_guarantee(self):
        """Texts sharing a substring of length >= w + k - 1 share a
        fingerprint (the paper's theorem 1 direction)."""
        from ocr_ray.functions.winnow import winnow_select

        k, w = 5, 4
        shared = "zqxjkvwpml"          # len 10 >= w + k - 1 = 8
        a = "aaaa " + shared + " bbbb cccc dddd"
        b = "eeee ffff " + shared + " gggg"
        _, fa = winnow_select(a, k, w)
        _, fb = winnow_select(b, k, w)
        assert set(fa.tolist()) & set(fb.tolist())

    def test_density(self):
        """Expected density 2/(w+1); allow a wide band."""
        from ocr_ray.functions.winnow import winnow_select

        rng = np.random.RandomState(1)
        t = "".join(rng.choice(list("abcdefghij"), size=5000))
        k, w = 5, 8
        pos, _ = winnow_select(t, k, w)
        density = len(pos) / (len(t) - k + 1)
        assert 0.1 < density < 0.4      # 2/(w+1) = 0.222


class TestOverlapPairs:
    def test_planted_shared_passage(self, ray_session, tmp_path):
        from ocr_ray.functions.winnow import winnow_overlap_pairs

        sf = str(tmp_path / "sf")
        passage = "the shared boilerplate sentence appears here verbatim"
        rng = np.random.RandomState(7)

        def noise(n):
            return "".join(rng.choice(list("abcdefgh "), size=n))

        docs = [noise(120) + passage + noise(120),
                noise(100) + passage + noise(140),
                noise(260), noise(260)]
        _write_docs(sf, docs)
        got = {(r["doc_a"], r["doc_b"]): r["n_shared"]
               for r in winnow_overlap_pairs(sf, min_shared=3)
               .take_all()}
        assert (0, 1) in got and got[(0, 1)] >= 3
        assert all(p == (0, 1) for p in got)    # no noise pairs

    def test_fingerprints_deterministic(self, ray_session, tmp_path):
        from ocr_ray.functions.winnow import winnow_fingerprints

        sf = str(tmp_path / "sf")
        _write_docs(sf, ["some document text here", "another one"])
        a = sorted(map(tuple, (r.values() for r in
                               winnow_fingerprints(sf).take_all())))
        b = sorted(map(tuple, (r.values() for r in
                               winnow_fingerprints(sf).take_all())))
        assert a == b and len(a) > 0


class TestContainment:
    def test_quote_has_high_containment(self, ray_session, tmp_path):
        """Doc 1 IS (mostly) a quote inside the much larger doc 0:
        contain of the small doc ~ 1.0, of the big doc well below."""
        from ocr_ray.functions.winnow import winnow_containment_pairs

        rng = np.random.RandomState(11)
        quote = "this exact paragraph is lifted verbatim into the host"

        def noise(n):
            return "".join(rng.choice(list("abcdefgh "), size=n))

        _write_docs(str(tmp_path / "sf"),
                    [noise(400) + quote + noise(400),   # big host
                     quote,                             # the quote
                     noise(300)])                       # unrelated
        out = winnow_containment_pairs(str(tmp_path / "sf"),
                                       min_shared=2).take_all()
        rows = {(r["doc_a"], r["doc_b"]): r for r in out}
        assert set(rows) == {(0, 1)}
        r = rows[(0, 1)]
        assert r["contain_b"] >= 0.8       # quote almost fully covered
        assert r["contain_a"] <= 0.3       # host barely covered
        assert r["n_shared"] >= 2

    def test_empty_when_no_overlap(self, ray_session, tmp_path):
        from ocr_ray.functions.winnow import winnow_containment_pairs

        rng = np.random.RandomState(2)
        _write_docs(str(tmp_path / "sf"),
                    ["".join(rng.choice(list("abcd "), size=200)),
                     "".join(rng.choice(list("wxyz "), size=200))])
        assert winnow_containment_pairs(
            str(tmp_path / "sf")).take_all() == []


class TestOverlapFuzz:
    def test_random_corpora_match_bruteforce_pairs(self, ray_session,
                                                   tmp_path):
        """8 seeded random corpora: the distributed pair counts equal
        the brute-force shared-distinct-fingerprint counts (below the
        stop-gram cap)."""
        from itertools import combinations

        from ocr_ray.functions.winnow import (
            winnow_overlap_pairs,
            winnow_select,
        )

        for seed in range(8):
            rng = np.random.RandomState(200 + seed)
            n_docs = int(rng.randint(3, 12))
            shared = "".join(rng.choice(list("abcdef "), size=30))
            docs = []
            for i in range(n_docs):
                t = "".join(rng.choice(list("abcdefgh "),
                                       size=int(rng.randint(40, 150))))
                if rng.rand() < 0.5:          # half embed the passage
                    t = t[:20] + shared + t[20:]
                docs.append(t)
            sf = str(tmp_path / f"sf{seed}")
            _write_docs(sf, docs)

            fps = [set(winnow_select(t, 5, 4)[1].tolist())
                   for t in docs]
            want = {}
            for a, b in combinations(range(n_docs), 2):
                m = len(fps[a] & fps[b])
                if m >= 2:
                    want[(a, b)] = m
            got = {(r["doc_a"], r["doc_b"]): r["n_shared"]
                   for r in winnow_overlap_pairs(
                       sf, min_shared=2, max_bucket=64).take_all()}
            assert got == want, f"seed {seed}"


class TestContainmentDedup:
    def test_quoted_doc_dropped_host_kept(self, ray_session, tmp_path):
        from ocr_ray.functions.winnow import (
            containment_dedup_losers,
            containment_dedup_survivors,
        )

        rng = np.random.RandomState(31)
        quote = "a long boilerplate passage quoted verbatim elsewhere"

        def noise(n):
            return "".join(rng.choice(list("abcdefgh "), size=n))

        sf = str(tmp_path / "sf")
        _write_docs(sf, [noise(400) + quote + noise(400),  # 0: host
                         quote,                            # 1: subset
                         noise(300),                       # 2: clean
                         quote])                           # 3: dup quote
        losers = sorted(r["doc_id"] for r in
                        containment_dedup_losers(
                            sf, threshold=0.8).take_all())
        # both quote copies are contained in the host; between the two
        # identical quotes the max id (3) also loses by the tie rule
        assert 1 in losers and 3 in losers and 0 not in losers \
            and 2 not in losers
        surv = sorted(r["doc_id"] for r in
                      containment_dedup_survivors(
                          sf, threshold=0.8).take_all())
        assert surv == sorted(set([0, 1, 2, 3]) - set(losers))
        assert 0 in surv and 2 in surv

    def test_no_containment_all_survive(self, ray_session, tmp_path):
        from ocr_ray.functions.winnow import containment_dedup_survivors

        rng = np.random.RandomState(5)
        sf = str(tmp_path / "sf")
        _write_docs(sf, ["".join(rng.choice(list("abcd "), size=200))
                         for _ in range(4)])
        surv = sorted(r["doc_id"] for r in
                      containment_dedup_survivors(sf).take_all())
        assert surv == [0, 1, 2, 3]
