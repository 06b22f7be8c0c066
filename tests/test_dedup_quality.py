"""Quality-aware dedup keeper: highest-quality cluster member survives
(ties -> lowest id); survivor COUNT always agrees with min-id dedup."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(path, rows):
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(rows)]),
        f"{path}/documents.parquet")


def _near_pair():
    """Two near-dup docs (5 of 120 tokens differ -> shingle J ~ 0.9)
    where doc 1 has the HIGHER quality score (doc 0's differing tokens
    are digits, dragging its alpha ratio down)."""
    base = [f"alpha{i}" for i in range(120)]
    low = list(base)
    for j in range(5):
        low[-(j + 1)] = str(1111 * (j + 2))      # digit tokens
    high = list(base)
    for j in range(5):
        high[-(j + 1)] = f"betaxyz{j}"           # alpha tokens
    return " ".join(low), " ".join(high)


class TestQualityKeeper:
    def test_best_quality_survives_near_cluster(self, ray_session,
                                                tmp_path):
        from ocr_ray.functions.dedup import (
            dedup_survivors,
            dedup_survivors_by_quality,
        )

        sf = str(tmp_path / "sf")
        low, high = _near_pair()
        others = [" ".join(f"uniq{i}w{j}" for j in range(100))
                  for i in range(6)]
        _write_docs(sf, [low, high] + others)

        minid = sorted(r["doc_id"] for r in
                       dedup_survivors(sf, near=True).take_all())
        byq = sorted(r["doc_id"] for r in
                     dedup_survivors_by_quality(sf, near=True).take_all())
        assert minid == [0, 2, 3, 4, 5, 6, 7]    # min-id keeps doc 0
        assert byq == [1, 2, 3, 4, 5, 6, 7]      # quality keeps doc 1
        assert len(minid) == len(byq)            # same cluster count

    def test_tie_breaks_to_lowest_id(self, ray_session, tmp_path):
        from ocr_ray.functions.dedup import dedup_survivors_by_quality

        sf = str(tmp_path / "sf")
        t = " ".join(f"same{i}" for i in range(80))
        _write_docs(sf, [t, t, "other doc entirely " * 10])
        byq = sorted(r["doc_id"] for r in
                     dedup_survivors_by_quality(sf).take_all())
        assert byq == [0, 2]                     # identical quality -> min id

    def test_no_dups_returns_all(self, ray_session, tmp_path):
        from ocr_ray.functions.dedup import dedup_survivors_by_quality

        sf = str(tmp_path / "sf")
        _write_docs(sf, [" ".join(f"d{i}x{j}" for j in range(50))
                         for i in range(5)])
        byq = sorted(r["doc_id"] for r in
                     dedup_survivors_by_quality(sf).take_all())
        assert byq == [0, 1, 2, 3, 4]
