"""BPE trainer oracles: hand-checked first merges on the Sennrich
corpus, an independently-coded reference loop, driver == distributed
path equality, encode/training segmentation consistency, gates."""

from collections import Counter

import pyarrow as pa
import pytest

from ocr_ray.functions.bpe import (END, bpe_encode_word, train_bpe)


def _reference_bpe(word_freqs: dict, n_merges: int, min_pair_freq: int = 2):
    """Independent re-statement of Sennrich's algorithm (recount from
    scratch each round, list-of-lists representation) used only as a
    test oracle."""
    table = [[list(w) + [END], n] for w, n in sorted(word_freqs.items())]
    out = []
    for _ in range(n_merges):
        counts = Counter()
        for sym, n in table:
            for x, y in zip(sym, sym[1:]):
                counts[(x, y)] += n
        if not counts:
            break
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if top[1] < min_pair_freq:
            break
        (x, y) = top[0]
        out.append((x, y))
        for row in table:
            sym = row[0]
            j = 0
            while j < len(sym) - 1:
                if sym[j] == x and sym[j + 1] == y:
                    sym[j:j + 2] = [x + y]
                else:
                    j += 1
    return out


SENNRICH = ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).strip()


def _ds_from_texts(texts, parallelism=2):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(texts))], pa.string()),
        "text": pa.array(texts, pa.string()),
    })).repartition(parallelism)


class TestTrainBPE:
    def test_first_merges_hand_checked(self, ray_session):
        # e+s / es+t / est+</w> each occur 9 times (newest 6 + widest 3)
        # and tie; the lexicographic tie-break orders them exactly so.
        merges = train_bpe(_ds_from_texts([SENNRICH]), n_merges=3)
        assert merges == [("e", "s"), ("es", "t"), ("est", END)]

    def test_matches_independent_reference(self, ray_session):
        merges = train_bpe(_ds_from_texts([SENNRICH]), n_merges=12)
        expect = _reference_bpe(Counter(SENNRICH.split()), 12)
        assert merges == expect

    def test_distributed_equals_driver(self, ray_session):
        # split the corpus across docs AND blocks: merge lists must be
        # identical regardless of physical path
        texts = [SENNRICH, "lowest newest lowest", "wide wider widest"]
        ds = _ds_from_texts(texts, parallelism=3)
        driver = train_bpe(ds, n_merges=8, mode="driver")
        dist = train_bpe(_ds_from_texts(texts, parallelism=1),
                         n_merges=8, mode="distributed")
        assert driver == dist and len(driver) == 8

    def test_encode_reproduces_training_segmentation(self, ray_session):
        corpus = Counter(SENNRICH.split())
        merges = train_bpe(_ds_from_texts([SENNRICH]), n_merges=10)
        ranks = {p: i for i, p in enumerate(merges)}
        # apply merges in training order to each word
        from ocr_ray.functions.bpe import _merge_word, _to_syms
        for w in corpus:
            sym = _to_syms(w)
            for a, b in merges:
                sym = _merge_word(sym, a, b)
            assert bpe_encode_word(w, ranks) == list(sym), w
        # subword streams concatenate back to the word + marker
        for w in corpus:
            assert "".join(bpe_encode_word(w, ranks)) == w + END

    def test_min_pair_freq_stops_early(self, ray_session):
        # all-unique words sharing no repeated pair: nothing reaches 2
        ds = _ds_from_texts(["ab cd ef gh"])
        assert train_bpe(ds, n_merges=10, min_pair_freq=2) == []

    def test_max_words_gate_and_remedy(self, ray_session):
        ds = _ds_from_texts(["a b c d e f g h i j"])
        with pytest.raises(ValueError, match="min_word_freq"):
            train_bpe(ds, n_merges=2, max_words=5)
        # the documented remedy: a frequency floor shrinks the table.
        # "aa" x3 ties (a,</w>) with (a,a) at 3; "<" sorts before "a",
        # so the lexicographic tie-break merges the end marker first.
        ds2 = _ds_from_texts(["aa aa aa bb bb c d e f g"])
        merges = train_bpe(ds2, n_merges=2, max_words=5, min_word_freq=2)
        assert merges == [("a", END), ("a", "a" + END)]

    def test_deterministic_on_real_corpus(self, ray_session):
        import ray.data as rd

        def run():
            ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                 columns=["doc_id", "text"])
            return train_bpe(ds, n_merges=20)

        a, b = run(), run()
        assert a == b and len(a) == 20

    def test_subword_counts(self, ray_session):
        from ocr_ray.functions.bpe import bpe_subword_counts

        ds = _ds_from_texts([SENNRICH])
        merges = train_bpe(ds, n_merges=10)
        ranks = {p: i for i, p in enumerate(merges)}
        out = bpe_subword_counts(ds, merges).take_all()
        expect = sum(len(bpe_encode_word(w, ranks))
                     for w in SENNRICH.split())
        assert out[0]["n_subwords"] == expect


class TestHFExport:
    def test_roundtrip_and_encode_equality(self, ray_session, tmp_path):
        import ray.data as rd

        from ocr_ray.functions.bpe import (bpe_encode_word,
                                           build_bpe_vocab,
                                           export_bpe_hf, load_bpe_hf,
                                           train_bpe)

        texts = ["low lower lowest slow slower newest new news",
                 "the newest lower news slows the slowest low"] * 3
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
        merges = train_bpe(ds, n_merges=20, min_pair_freq=2)
        vocab = build_bpe_vocab(ds, merges)
        d = str(tmp_path / "tok")
        export_bpe_hf(vocab, merges, d)
        v2, m2 = load_bpe_hf(d)
        assert v2 == vocab and m2 == merges
        # encodings under the loaded table are identical
        r1 = {p: i for i, p in enumerate(merges)}
        r2 = {p: i for i, p in enumerate(m2)}
        for w in ["lowest", "slower", "news", "unseen"]:
            assert bpe_encode_word(w, r2) == bpe_encode_word(w, r1)

    def test_merges_file_format(self, tmp_path):
        from ocr_ray.functions.bpe import export_bpe_hf

        d = str(tmp_path / "tok")
        export_bpe_hf({"a": 0, "b": 1}, [("a", "b"), ("ab", "c")], d)
        lines = open(f"{d}/merges.txt").read().splitlines()
        assert lines[0].startswith("#version")
        assert lines[1:] == ["a b", "ab c"]

    def test_separator_in_symbol_refused(self, tmp_path):
        from ocr_ray.functions.bpe import export_bpe_hf

        with pytest.raises(ValueError, match="separator"):
            export_bpe_hf({}, [("a b", "c")], str(tmp_path))
