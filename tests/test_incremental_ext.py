"""Gate for dedup_incremental_minhash: processing the corpus in
arrival batches against the accumulating LSH store must produce
EXACTLY the verdicts of a sequential replay — batching must not
change the answer.  The replica replays the documented convention in
plain Python over the Spark-computed signatures/bands (so the gate
tests the INCREMENTAL property, not the hash function): a doc is a
duplicate iff it shares a band bucket AND ≥ 50% of minhash
components with any LOWER-id doc of its own batch, or with any
ACCEPTED doc of an earlier batch; only non-duplicates extend the
store."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from guidewire_spark.operators.incremental_ext import dedup_incremental_minhash
from guidewire_spark.operators.llm import MINHASH_N, band_hashes, minhash_signatures
from guidewire_spark.plans.catalog import load_table


def test_incremental_verdicts_match_sequential_replay(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = {
        r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(MINHASH_N))
        for r in minhash_signatures(d).collect()
    }
    buckets = defaultdict(set)
    for r in band_hashes(minhash_signatures(d)).collect():
        buckets[r["doc_id"]].add((r["band"], r["bucket"]))

    def similar(a, b):
        if not (buckets[a] & buckets[b]):
            return False
        agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        return agree >= MINHASH_N // 2

    accepted: list[int] = []
    want: dict[int, tuple[bool, int | None]] = {}
    order = sorted(sigs, key=lambda i: (i % 3, i))
    for doc in order:
        batch = doc % 3
        cands = [
            c
            for c in accepted
            if c % 3 < batch and similar(doc, c)
        ] + [
            c
            for c in order
            if c % 3 == batch and c < doc and similar(doc, c)
        ]
        if cands:
            want[doc] = (True, min(cands))
        else:
            want[doc] = (False, None)
            accepted.append(doc)

    got = {
        r["doc_id"]: (bool(r["is_duplicate"]), r["matched_doc_id"])
        for r in dedup_incremental_minhash(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    mism = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mism, dict(list(mism.items())[:5])
    # sanity: the fixture corpus actually contains duplicates
    assert any(v[0] for v in want.values())
