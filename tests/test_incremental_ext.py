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


def test_incremental_embedding_matches_sequential_replay(spark, sf_dir):
    """Same batching-invariance gate for the embedding form: replay
    the documented convention in numpy over the Spark-computed unit
    vectors and hyperplane buckets (dup iff shares a bucket AND exact
    cosine ≥ 0.95 with a lower-id same-batch vector or an accepted
    earlier-batch vector), and require identical verdicts — the
    planted copies must all be flagged."""
    import numpy as np

    from guidewire_spark.functions import vectors as V
    from guidewire_spark.operators.incremental_ext import (
        dedup_incremental_embedding,
    )
    from guidewire_spark.operators.llm import _hyperplane_bucket_udf

    band_buckets = _hyperplane_bucket_udf(n_bands=32, bits=12, dim=64)
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    planted = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "u"
    )
    corpus = base.unionByName(planted)
    rows = corpus.select(
        "vec_id", "u", band_buckets("u").alias("bk")
    ).collect()
    vecs = {r["vec_id"]: np.array(r["u"], dtype=np.float64) for r in rows}
    bks = {
        r["vec_id"]: {(i, b) for i, b in enumerate(r["bk"])} for r in rows
    }

    def similar(a, b):
        return bool(bks[a] & bks[b]) and float(vecs[a] @ vecs[b]) >= 0.95

    accepted: list[int] = []
    want = {}
    order = sorted(vecs, key=lambda i: (i % 3, i))
    for v in order:
        batch = v % 3
        cands = [c for c in accepted if c % 3 < batch and similar(v, c)] + [
            c for c in order if c % 3 == batch and c < v and similar(v, c)
        ]
        want[v] = (bool(cands), min(cands) if cands else None)
        if not cands:
            accepted.append(v)

    got = {
        r["vec_id"]: (bool(r["is_duplicate"]), r["matched_vec_id"])
        for r in dedup_incremental_embedding(spark, sf_dir).collect()
    }
    assert got == want
    # every planted exact-copy pair: the LATER-in-arrival-order member
    # is flagged (copy lands in batch (v+1)%3, so when the copy
    # arrives before the original, the ORIGINAL is the duplicate)
    planted_ids = [v for v in vecs if v >= 1_000_000]
    assert planted_ids
    for p in planted_ids:
        orig = p - 1_000_000
        later = p if (p % 3, p) > (orig % 3, orig) else orig
        assert got[later][0], (p, orig, got[p], got[orig])
