"""CCNet-style hashed-bigram LM perplexity filter — pure-python oracle,
planted gibberish separation, tertile-bucket semantics."""
import math
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

B = 512          # small bucket space so collisions are exercised
ALPHA = 1.0


def _mk_corpus(tmp_path, n_latin=40, n_gib=20, n_target=12):
    """Fluent latin-ish docs + gibberish docs; target rows (source=
    'wiki') are latin-ish — gibberish must score higher perplexity."""
    import random
    rng = random.Random(9)
    latin = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
             "sed do eiusmod tempor incididunt ut labore et dolore "
             "magna aliqua").split()

    def latin_doc():
        return " ".join(rng.choice(latin) for _ in range(40))

    def gib_doc():
        return " ".join("".join(rng.choice("bcdfghjklmnpqrstvwxz")
                                for _ in range(7))
                        for _ in range(40))

    rows, did = [], 0
    for _ in range(n_target):
        rows.append({"doc_id": did, "text": latin_doc(), "source": "wiki"})
        did += 1
    for _ in range(n_latin):
        rows.append({"doc_id": did, "text": latin_doc(), "source": "web"})
        did += 1
    for _ in range(n_gib):
        rows.append({"doc_id": did, "text": gib_doc(), "source": "web"})
        did += 1
    rows.append({"doc_id": did, "text": "single", "source": "web"})  # no bigram
    rows.append({"doc_id": did + 1, "text": "", "source": "web"})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(sf / "documents.parquet"))
    return str(sf), rows


def _pred_factory(value="wiki"):
    import pyarrow.compute as pc
    return lambda batch: pc.equal(batch["source"], pa.scalar(value))


def _oracle(rows, target=None):
    """Independent reimplementation over the raw rows."""
    from ocr_ray.functions.corpus_prep import _tokens

    def ids(text):
        toks = [t.lower() for t in _tokens(text)]
        if len(toks) < 2:
            return [], []
        return ([zlib.crc32(t.encode()) % B for t in toks[:-1]],
                [zlib.crc32(f"{a} {b}".encode()) % B
                 for a, b in zip(toks, toks[1:])])

    ctx_c = np.zeros(B, np.int64)
    bi_c = np.zeros(B, np.int64)
    for r in rows:
        if target is not None and r["source"] != target:
            continue
        ctx, bi = ids(r["text"])
        for c in ctx:
            ctx_c[c] += 1
        for b in bi:
            bi_c[b] += 1
    out = {}
    for r in rows:
        ctx, bi = ids(r["text"])
        if not ctx:
            out[r["doc_id"]] = (0.0, 0, None)
            continue
        lp = sum(math.log((bi_c[b] + ALPHA) / (ctx_c[c] + ALPHA * B))
                 for c, b in zip(ctx, bi))
        lp_r = math.floor(lp * 1e6 + 0.5) / 1e6
        ppl = math.exp(-lp_r / len(ctx))
        out[r["doc_id"]] = (lp_r, len(ctx),
                            math.floor(ppl * 1e6 + 0.5) / 1e6)
    return out


class TestLmFilter:
    def test_matches_oracle_self_trained(self, ray_session, tmp_path):
        from ocr_ray.functions.lm_filter import doc_perplexity

        sf, rows = _mk_corpus(tmp_path)
        got = {r["doc_id"]: (r["logprob"], r["n_pred"], r["ppl"]) for r in
               doc_perplexity(sf, None, B, ALPHA).take_all()}
        want = _oracle(rows)
        assert set(got) == set(want)
        for did, (lp, n, ppl) in want.items():
            assert got[did][1] == n
            if ppl is None:
                assert got[did][2] is None
            else:
                # numpy pairwise sum vs the oracle's sequential sum can
                # differ in the last ulp, shifting the 1e-6 rounding by
                # one step — tolerances cover exactly that
                assert got[did][0] == pytest.approx(lp, abs=2e-6)
                assert got[did][2] == pytest.approx(ppl, rel=1e-6)

    def test_matches_oracle_target_trained(self, ray_session, tmp_path):
        from ocr_ray.functions.lm_filter import doc_perplexity

        sf, rows = _mk_corpus(tmp_path)
        got = {r["doc_id"]: r["ppl"] for r in
               doc_perplexity(sf, _pred_factory(), B, ALPHA,
                              pred_columns=("source",)).take_all()}
        want = _oracle(rows, target="wiki")
        for did, (_, _, ppl) in want.items():
            if ppl is not None:
                assert got[did] == pytest.approx(ppl, rel=1e-6)

    def test_gibberish_scores_above_fluent(self, ray_session, tmp_path):
        from ocr_ray.functions.lm_filter import doc_perplexity

        sf, rows = _mk_corpus(tmp_path)
        by_src = {r["doc_id"]: r["source"] for r in rows}
        gib = {r["doc_id"] for r in rows
               if r["source"] == "web" and "lorem" not in r["text"]
               and "ipsum" not in r["text"] and len(r["text"]) > 20}
        got = {r["doc_id"]: r["ppl"] for r in
               doc_perplexity(sf, _pred_factory(), B, ALPHA,
                              pred_columns=("source",)).take_all()
               if r["ppl"] is not None}
        worst_latin = max(v for d, v in got.items()
                          if d not in gib and by_src[d] in ("wiki", "web"))
        best_gib = min(v for d, v in got.items() if d in gib)
        # every gibberish doc scores above every fluent doc
        assert best_gib > worst_latin

    def test_buckets_are_exact_tertiles(self, ray_session, tmp_path):
        from ocr_ray.functions.lm_filter import perplexity_buckets

        sf, rows = _mk_corpus(tmp_path)
        got = perplexity_buckets(sf, None, B, ALPHA).take_all()
        want = _oracle(rows)
        ppls = sorted(v[2] for v in want.values() if v[2] is not None)
        n = len(ppls)
        # quantile_disc cutoffs: ceil(q*n)-th 1-based order statistic
        t1 = ppls[math.ceil(n / 3) - 1]
        t2 = ppls[math.ceil(2 * n / 3) - 1]
        for r in got:
            ppl = r["ppl"]
            expect = ("tail" if ppl is None else
                      "head" if ppl <= t1 else
                      "middle" if ppl <= t2 else "tail")
            assert r["bucket"] == expect, (r, t1, t2)
        heads = sum(1 for r in got if r["bucket"] == "head")
        assert heads == sum(1 for p in ppls if p <= t1)

    def test_all_unscorable_corpus_is_all_tail(self, ray_session,
                                               tmp_path):
        """Every doc < 2 tokens: no quantiles exist; all land in tail."""
        from ocr_ray.functions.lm_filter import perplexity_buckets

        sf = tmp_path / "sf1"
        sf.mkdir()
        pq.write_table(pa.Table.from_pylist(
            [{"doc_id": i, "text": t, "source": "web"}
             for i, t in enumerate(["one", "", "word"])]),
            str(sf / "documents.parquet"))
        got = perplexity_buckets(str(sf), None, B, ALPHA).take_all()
        assert len(got) == 3
        assert all(r["bucket"] == "tail" and r["ppl"] is None
                   for r in got)

    def test_empty_target_raises(self, ray_session, tmp_path):
        from ocr_ray.functions.lm_filter import doc_perplexity

        sf, _ = _mk_corpus(tmp_path)
        with pytest.raises(ValueError, match="target is empty"):
            doc_perplexity(sf, _pred_factory("nope"), B, ALPHA,
                           pred_columns=("source",)).take_all()

    def test_sf001_smoke(self, ray_session):
        """Driver-corpus smoke: every doc scored, buckets near-tertile."""
        from ocr_ray.functions.lm_filter import perplexity_buckets

        got = perplexity_buckets("/root/testdata/sf0.001",
                                 n_buckets=4096).take_all()
        assert len(got) > 0
        counts = {}
        for r in got:
            counts[r["bucket"]] = counts.get(r["bucket"], 0) + 1
        n = len(got)
        assert counts.get("head", 0) >= n // 4
        assert counts.get("tail", 0) >= n // 4
