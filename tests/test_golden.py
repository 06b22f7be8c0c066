"""Golden oracle behaviour on the archetype corpus (FIXTURES.md)."""

import pyarrow.compute as pc

from ocr_ray.fixtures import documents_table, gen_doc
from ocr_ray.golden import golden_extract, spans_fingerprint
from ocr_ray.kernels.extract import extract_doc
from ocr_ray.kernels.keywords import KeywordMatcher
from ocr_ray.kernels.wordpool import keyword_list


def _by_prefix(table, prefix):
    return [r for r in table.to_pylist() if r["doc_id"].startswith(prefix)]


class TestGoldenArchetypes:
    def test_rejections(self, golden_result):
        failed = {r["doc_id"]: r["reason"] for r in golden_result["failed"].to_pylist()}
        assert any(d.startswith("empty-") and r == "empty_document"
                   for d, r in failed.items())
        assert any(d.startswith("malformed-") and r == "malformed_span"
                   for d, r in failed.items())
        assert any(d.startswith("oversize-") and r == "too_many_spans"
                   for d, r in failed.items())
        # nothing else fails
        assert all(d.split("-")[0] in ("empty", "malformed", "oversize")
                   for d in failed)

    def test_span_sequence_ordered_and_shaped(self, golden_result):
        for doc_id, seq in spans_fingerprint(golden_result["extracted"]).items():
            offsets = [s[3] for s in seq]
            assert offsets == sorted(offsets)
            for kind, text, media_ref, _ in seq:
                assert kind in ("text", "media")
                assert (media_ref == "") == (kind == "text")

    def test_media_quality_and_retry(self, golden_result):
        m = golden_result["metrics"].to_pylist()
        lowq = [r for r in m if r["doc_id"].startswith("lowq-")]
        assert lowq and all(r["retried_spans"] >= 1 for r in lowq)
        # retried docs still end up above the gate
        assert all(r["quality_mean"] > 85 for r in lowq)

    def test_mega_doc_extracted_in_full(self, golden_result):
        mega = _by_prefix(golden_result["extracted"], "mega-")
        assert mega
        doc = gen_doc(42, 4)
        assert len(mega[0]["spans"]) == len(doc["spans"])

    def test_deep_dom_survives(self, golden_result):
        deep = _by_prefix(golden_result["extracted"], "deepdom-")
        assert deep and len(deep[0]["spans"][0]["text"]) > 20

    def test_kwdall_golden_count(self, golden_result):
        """Analog of the num_kwds == 365 golden assertion
        (/root/reference/tests/test_ocr_worker.py:48-51)."""
        kwdall = _by_prefix(golden_result["extracted"], "kwdall-")[0]
        full_text = "\n".join(s["text"] for s in kwdall["spans"])
        matcher = KeywordMatcher(list(keyword_list()))
        found = {h["keyword"] for h in matcher.find(full_text)}
        # every keyword planted in its own span must be recovered
        assert len(found) == 365

    def test_determinism_across_runs(self, small_corpus, golden_result):
        again = golden_extract(small_corpus)
        assert spans_fingerprint(again["extracted"]) == spans_fingerprint(
            golden_result["extracted"])

    def test_metrics_counters_consistent(self, golden_result):
        m = golden_result["metrics"]
        kept = pc.sum(m.column("blocks_kept")).as_py()
        dropped = pc.sum(m.column("blocks_dropped")).as_py()
        assert kept > 0 and dropped > 0
        per_rule = sum(
            pc.sum(m.column(c)).as_py()
            for c in ("min_length_lines", "forbidden_lines", "low_alpha_lines",
                      "high_digit_lines", "non_ascii_lines")
        )
        assert per_rule == dropped


class TestExtractDoc:
    def test_unordered_offsets_sorted(self):
        spans = [
            {"kind": "text", "text": "<p>Al doilea paragraf vine aici.</p>",
             "media_ref": "", "offset": 1},
            {"kind": "text", "text": "<p>Primul paragraf vine aici.</p>",
             "media_ref": "", "offset": 0},
        ]
        res = extract_doc("d1", spans)
        assert res["ok"]
        assert [s["offset"] for s in res["spans"]] == [0, 1]
        assert res["spans"][0]["text"].startswith("Primul")

    def test_duplicate_offsets_rejected(self):
        spans = [
            {"kind": "text", "text": "<p>Una bucată text aici.</p>", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "<p>Alta bucată text aici.</p>", "media_ref": "", "offset": 0},
        ]
        assert extract_doc("d2", spans)["reason"] == "duplicate_offsets"

    def test_no_content_rejected(self):
        spans = [{"kind": "text", "text": "   ", "media_ref": "", "offset": 0}]
        assert extract_doc("d3", spans)["reason"] == "no_content"
