"""Mojibake repair: round-trip oracle (encode -> misdecode -> fix ==
original), double-encode convergence, conservative guards, idempotence,
RE2-vs-Python pattern agreement, and the distributed path."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_ray.functions.encfix import (MOJIBAKE_PATTERN, fix_mojibake,
                                      fix_mojibake_batch, mojibake_score)

CLEAN = [
    "propoziție română cu ș ț ă â î",
    "café — naïve “quotes” déjà vu",
    "日本語テキストのサンプル文",
    "emoji 🎉🎈 party time",
    "Привет мир, как дела сегодня",
    "Ωμέγα και άλφα ελληνικά",
]


def _misdecode(u: str) -> str:
    raw = u.encode("utf-8")
    try:
        return raw.decode("cp1252")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


class TestKernel:
    @pytest.mark.parametrize("u", CLEAN)
    def test_single_roundtrip(self, u):
        fixed, rounds = fix_mojibake(_misdecode(u))
        assert fixed == u and rounds == 1

    @pytest.mark.parametrize("u", CLEAN)
    def test_double_roundtrip(self, u):
        fixed, rounds = fix_mojibake(_misdecode(_misdecode(u)))
        assert fixed == u and rounds == 2

    def test_ascii_and_clean_unicode_untouched(self):
        for s in ["plain ascii only", *CLEAN]:
            assert fix_mojibake(s) == (s, 0)

    def test_mixed_clean_and_mojibake_untouched(self):
        # one genuine é makes the strict UTF-8 decode fail: the string
        # is left byte-identical (documented all-or-nothing rule)
        s = "genuine café plus broken " + _misdecode("café")
        assert fix_mojibake(s) == (s, 0)

    def test_weak_single_marker_untouched(self):
        # "É" + curly apostrophe is byte-valid UTF-8 (U+0252) but real
        # text; single weak marker -> no repair
        s = "JOSÉ’s"
        assert mojibake_score(s) == (0, 1)
        assert fix_mojibake(s) == (s, 0)

    def test_weak_repeat_caught_by_implausible_guard(self):
        # two weak markers pass the evidence gate but decode into IPA
        # block chars -> rejected
        s = "JOSÉ’s and JOSÉ’s again"
        assert fix_mojibake(s) == (s, 0)

    def test_idempotent(self):
        for u in CLEAN:
            m = _misdecode(u)
            once, _ = fix_mojibake(m)
            twice, r2 = fix_mojibake(once)
            assert twice == once and r2 == 0

    @settings(max_examples=150, deadline=None)
    @given(st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FFF,
                               exclude_categories=("Cs",)),
        min_size=1, max_size=60))
    def test_fuzz_roundtrip_or_untouched(self, u):
        """Any string either repairs exactly back to the original after
        misdecode, or is conservatively left alone — never corrupted
        into a third value."""
        s_cnt, w_cnt = mojibake_score(u)
        m = _misdecode(u)
        fixed, rounds = fix_mojibake(m)
        if rounds:
            if s_cnt == 0 and w_cnt < 2:
                assert fixed == u
            else:
                # u itself carries marker evidence (it LOOKS like
                # mojibake): repair may legitimately continue past it
                assert fixed in (u, fix_mojibake(u)[0],
                                 fix_mojibake(u, max_rounds=2)[0])
        else:
            assert fixed == m
        if u == m:  # pure-ASCII: nothing to repair
            assert rounds == 0
        elif s_cnt == 0 and w_cnt == 0 and not u.isascii():
            # clean original with non-ASCII: its mojibake must carry
            # markers (UTF-8 bytes always produce lead+cont faces)
            assert mojibake_score(m) != (0, 0)


class TestPatternAgreement:
    def test_re2_matches_python_gate(self):
        """The Arrow RE2 pre-filter must flag every row the Python
        kernel would touch (false positives fine, misses not)."""
        import pyarrow.compute as pc

        rows = [_misdecode(u) for u in CLEAN] + \
               [_misdecode(_misdecode(u)) for u in CLEAN] + \
               ["plain", "JOSÉ’s", *CLEAN]
        flags = pc.match_substring_regex(
            pa.array(rows), MOJIBAKE_PATTERN).to_pylist()
        for s, f in zip(rows, flags):
            strong, weak = mojibake_score(s)
            if strong or weak:
                assert f, f"RE2 missed marker row {s!r}"


class TestDistributed:
    def test_batch_equals_kernel_and_clean_rows_identical(
            self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        texts = (["clean ascii row"] * 3 + [_misdecode(u) for u in CLEAN]
                 + CLEAN + [_misdecode(_misdecode(CLEAN[0])), None])
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))

        from ocr_ray.functions.encfix import fix_encoding

        out = fix_encoding(str(tmp_path)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        for i, t in enumerate(texts):
            if t is None:
                assert out["text"][i] is None or out["text"][i] != out["text"][i]
                assert out["enc_fix_rounds"][i] == 0
                continue
            ft, r = fix_mojibake(t)
            assert out["text"][i] == ft
            assert out["enc_fix_rounds"][i] == r

    def test_health_stats(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        texts = (["ascii"] * 4 + [_misdecode(u) for u in CLEAN[:3]]
                 + [_misdecode(_misdecode(CLEAN[0])), "JOSÉ’s"])
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))

        from ocr_ray.functions.encfix import encoding_health_stats

        row = encoding_health_stats(str(tmp_path)).to_pylist()[0]
        assert row["n_docs"] == len(texts)
        assert row["n_repaired"] == 4
        assert row["n_single_pass"] == 3
        assert row["n_double_pass"] == 1
        assert row["n_marker_unrepaired"] == 1  # the JOSÉ’s skip
