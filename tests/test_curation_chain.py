"""End-to-end curation chain across FOUR operator families: blocklist
filter -> quality-keeper near-dedup -> containment dedup -> mixture
token plan.  Each stage consumes the previous stage's written parquet
(the composition contract: every operator reads a corpus directory),
and each stage's planted effect is asserted independently.

Stage ORDER matters and is itself pinned here: quality-keeper
near-dedup must run BEFORE containment dedup, because a near-dup pair
is also MUTUALLY contained (shared fingerprints cover ~95% of both
docs), and containment's id-based tie rule would delete one copy
blindly where the quality keeper chooses the better one.  (The first
draft of this test had the stages reversed and containment silently
ate the high-quality near-dup copy — exactly the mistake a pipeline
author would make without this pin.)"""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _stage_dir(tmp_path, name, table):
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, f"{d}/documents.parquet")
    return d


def test_curation_chain(ray_session, tmp_path):
    import numpy as np

    from ocr_ray.functions.blocklist import blocklist_survivors
    from ocr_ray.functions.corpus_prep import mixture_token_plan
    from ocr_ray.functions.dedup import dedup_survivors_by_quality
    from ocr_ray.functions.winnow import containment_dedup_survivors

    rng = np.random.RandomState(55)

    def noise(n):
        return " ".join("".join(rng.choice(list("abcdefgh"),
                                           size=5)) for _ in range(n))

    quote = "this exact boilerplate paragraph is quoted verbatim here"
    base_tokens = [f"alpha{i}" for i in range(120)]
    low_q = list(base_tokens)
    for j in range(5):
        low_q[-(j + 1)] = str(1111 * (j + 2))     # digit tail: lower q
    high_q = list(base_tokens)
    for j in range(5):
        high_q[-(j + 1)] = f"beta{j}"             # alpha tail: higher q

    docs = [
        # 0: blocked (casino) -> dies at stage 1
        "win big at the casino " + noise(40),
        # 1: host containing the quote -> survives everything
        noise(60) + " " + quote + " " + noise(60),
        # 2: the bare quote -> dies at stage 3 (contained in 1; NOT a
        #    minhash near-dup of 1, so stage 2 cannot catch it)
        quote,
        # 3/4: near-dup pair with different quality -> stage 2 keeps 4
        " ".join(low_q),
        " ".join(high_q),
        # 5: clean unique doc -> survives everything
        noise(50),
    ]
    sources = ["web", "web", "web", "books", "books", "books"]
    t0 = pa.Table.from_pylist(
        [{"doc_id": i, "text": t, "source": s}
         for i, (t, s) in enumerate(zip(docs, sources))])
    sf0 = _stage_dir(tmp_path, "raw", t0)

    # stage 1: blocklist — doc 0 dies
    s1 = blocklist_survivors(sf0).to_pandas().sort_values("doc_id")
    assert list(s1["doc_id"]) == [1, 2, 3, 4, 5]
    sf1 = _stage_dir(tmp_path, "s1",
                     pa.Table.from_pandas(s1, preserve_index=False))

    # stage 2: quality-keeper near-dedup — of the 3/4 pair the
    # HIGHER-quality 4 survives (min-id dedup would keep 3); the
    # quote/host pair is NOT near-dup (low Jaccard) so both remain
    keep2 = {r["doc_id"] for r in dedup_survivors_by_quality(
        sf1, near=True).take_all()}
    assert keep2 == {1, 2, 4, 5}
    s2 = s1[s1["doc_id"].isin(keep2)]
    sf2 = _stage_dir(tmp_path, "s2",
                     pa.Table.from_pandas(s2, preserve_index=False))

    # stage 3: containment dedup — the bare quote (2) dies, host stays
    keep3 = {r["doc_id"] for r in containment_dedup_survivors(
        sf2, threshold=0.8).take_all()}
    assert keep3 == {1, 4, 5}
    s3 = s2[s2["doc_id"].isin(keep3)]
    sf3 = _stage_dir(tmp_path, "s3",
                     pa.Table.from_pandas(s3, preserve_index=False))

    # stage 4: mixture plan over the curated corpus
    plan = mixture_token_plan(sf3, budget_tokens=10_000,
                              tau=0.7).to_pandas().set_index("source")
    assert set(plan.index) == {"web", "books"}
    assert plan["target_tokens"].sum() <= 10_000 + 2
    assert (plan["n_tokens"] > 0).all()
