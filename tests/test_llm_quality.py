"""Quality evidence for the approximate operators: the rows-only
queries (MinHash LSH, IVF ANN) are checked here against their exact
counterparts — recall bounds instead of hash-equality."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_lsh_recall_of_high_jaccard_pairs(spark):
    """Every pair with exact 3-shingle Jaccard >= 0.5 must be an LSH
    candidate (with 8 bands x 4 rows the match probability at J=0.5 is
    ~1 - (1 - 0.5^4)^8 = 0.42 per band-structure in theory, but true
    near-dups in this corpus share long runs of identical shingles, so
    high-J pairs collide in at least one band in practice — this guards
    the banding wiring, not probability theory)."""
    from guidewire_spark.operators.llm import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    exact = dedup_ngram_jaccard(spark, SF)
    high = {
        (r.doc_a, r.doc_b)
        for r in exact.where(F.col("jaccard") >= 0.5).collect()
    }
    candidates = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, SF)
        .where((F.col("doc_a") < 100) & (F.col("doc_b") < 100))
        .collect()
    }
    assert high, "fixture should contain at least one high-Jaccard pair"
    missed = high - candidates
    assert not missed, f"LSH missed high-Jaccard pairs: {missed}"


def test_ivf_recall_vs_bruteforce(spark):
    """IVF top-5 must recover a reasonable fraction of the exact top-5
    (single-probe IVF trades recall for an ~n_cells× scan cut; on this
    corpus recall@5 stays well above random)."""
    from guidewire_spark.operators.llm import (
        similarity_ann_ivf,
        similarity_topk_bruteforce,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity_topk_bruteforce(spark, SF).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity_ann_ivf(spark, SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    # measured 0.66 @ sf0.001 / 0.74 @ sf0.01 with 2 Lloyd iterations
    # and n_probe=3 of 8 cells (searching ~3/8 of the corpus); bound
    # set with headroom.
    assert recall >= 0.5, f"IVF recall@5 collapsed: {recall:.2f}"


def test_embedding_lsh_recall_of_planted_near_dups(spark):
    """Random-hyperplane LSH must recover every planted near-dup pair
    (cos ≈ 0.98-0.99) and report no pair below the threshold.  200
    background vectors are near-orthogonal random draws; 10 planted
    pairs are a base vector plus small noise."""
    import numpy as np

    from guidewire_spark.operators.llm import embedding_near_dup_pairs

    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    for _ in range(200):
        v = rng.standard_normal(64)
        rows.append((vid, (v / np.linalg.norm(v)).tolist()))
        vid += 1
    planted = []
    for _ in range(10):
        v = rng.standard_normal(64)
        v /= np.linalg.norm(v)
        w = v + 0.03 * rng.standard_normal(64)
        w /= np.linalg.norm(w)
        assert float(v @ w) >= 0.95
        rows.append((vid, v.tolist()))
        rows.append((vid + 1, w.tolist()))
        planted.append((vid, vid + 1))
        vid += 2

    df = spark.createDataFrame(rows, "vec_id long, u array<double>")
    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(df, threshold=0.95).collect()
    }
    assert set(planted) <= got, f"missed planted pairs: {set(planted) - got}"
    # exact verification step must have filtered everything else out
    for a, b in got - set(planted):
        assert False, f"unexpected pair ({a},{b}) survived exact check"


def test_lsh_ann_recall_vs_bruteforce(spark):
    """LSH-bucketed ANN top-5 must recover most of the exact top-5
    (measured 0.82 @ sf0.001 / 0.86 @ sf0.01 with 16 bands x 5 bits,
    ~40% candidate fraction; bound set with headroom)."""
    from guidewire_spark.operators.llm import (
        similarity_ann_lsh,
        similarity_topk_bruteforce,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity_topk_bruteforce(spark, SF).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity_ann_lsh(spark, SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH ANN recall@5 collapsed: {recall:.2f}"


def test_simhash_hamming_separates_near_dups(spark):
    """SimHash quality gate: a document and its lightly-edited copy
    must be far hamming-closer than unrelated documents. (On this
    corpus the background mean is ~14 bits, not the ~32 of independent
    texts — every synthetic doc shares one small vocabulary — so the
    gate is separation, not absolute distance.)"""
    from guidewire_spark.operators.llm import dedup_simhash

    sigs = {
        r.doc_id: r.simhash for r in dedup_simhash(spark, SF).collect()
    }

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    import itertools

    ids = sorted(sigs)
    pairs = list(itertools.combinations(ids[:60], 2))
    background = sum(hamming(sigs[a], sigs[b]) for a, b in pairs) / len(pairs)
    assert background > 8, f"background hamming collapsed: {background:.1f}"

    # planted: re-run the operator over a tiny frame with edited copies
    from pyspark.sql import functions as F

    from guidewire_spark.plans.catalog import load_table

    d = (
        load_table(spark, SF, "documents")
        .orderBy(F.col("n_chars").desc())
        .limit(10)
        .select("doc_id", "text")
    )
    edited = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzqx")).alias("text"),
    )
    both = d.unionByName(edited)
    both.createOrReplaceTempView("_simhash_planted")
    # reuse the operator body via a monkeypatched loader? simpler: the
    # signature math is deterministic, so compute directly with the
    # same pipeline on the union frame
    from guidewire_spark.operators import llm as llm_mod

    orig = llm_mod.load_table
    try:
        llm_mod.load_table = lambda _s, _d, _n: both
        planted = {
            r.doc_id: r.simhash for r in llm_mod.dedup_simhash(spark, SF).collect()
        }
    finally:
        llm_mod.load_table = orig
    planted_dists = [
        hamming(planted[r.doc_id], planted[r.doc_id + 100000])
        for r in d.select("doc_id").collect()
    ]
    mean_planted = sum(planted_dists) / len(planted_dists)
    # tiny shared vocabulary → bit-sums are shallow random walks, so a
    # one-token edit still flips a few bits; gate on clear separation
    # of the means and no planted pair reaching background distance
    assert mean_planted < background / 2, (
        f"edited copies not separated: planted mean {mean_planted:.1f} "
        f"vs background mean {background:.1f}"
    )
    assert max(planted_dists) < background, planted_dists


def test_approx_percentile_error_bound(spark):
    """agg_approx_percentile (Greenwald-Khanna, accuracy=10000) must
    land within the sketch's rank guarantee of the exact percentile.
    The query now emits the rank-window booleans itself (bound-check
    oracle, round 9) — assert they all hold — plus an independent
    value-space relative error bound of 1% against F.percentile on
    the same groups (loose vs the theory, tight vs a broken wiring)."""
    from guidewire_spark.operators.extras import agg_approx_percentile
    from guidewire_spark.plans.catalog import load_table

    rows = agg_approx_percentile(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.p50_in_bounds and r.p90_in_bounds and r.p99_in_bounds, r

    li = load_table(spark, SF, "lineitem")
    both = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a50"),
            F.percentile_approx("l_extendedprice", 0.9, 10000).alias("a90"),
            F.percentile_approx("l_extendedprice", 0.99, 10000).alias("a99"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("e90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("e99"),
        )
        .collect()
    }
    assert {r.l_returnflag for r in rows} == set(both)
    for flag, r in both.items():
        for got, want in ((r.a50, r.e50), (r.a90, r.e90), (r.a99, r.e99)):
            assert abs(float(got) - float(want)) / float(want) < 0.01, (
                flag,
                got,
                want,
            )


def test_pq_recall_vs_bruteforce(spark):
    """PQ + exact-rerank top-5 must recover most of the exact top-5
    (measured 0.74 @ sf0.001 / 0.84 @ sf0.01 with M=8 subspaces,
    K=16 codewords, 100-deep ADC shortlist; bound set with
    headroom)."""
    from guidewire_spark.operators.llm import (
        similarity_ann_pq,
        similarity_topk_bruteforce,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity_topk_bruteforce(spark, SF).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity_ann_pq(spark, SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.55, f"PQ ANN recall@5 collapsed: {recall:.2f}"


def test_pq_recall_vs_bruteforce_sf01(spark):
    """Same PQ recall gate at sf0.1 (the bench scale): codebooks are
    trained on a larger vector population, so the quantization error
    distribution differs from the tiny fixture — the gate must hold
    where the bench runs, not only at sf0.001."""
    from guidewire_spark.operators.llm import (
        similarity_ann_pq,
        similarity_topk_bruteforce,
    )

    sf = "/root/testdata/sf0.1"
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity_topk_bruteforce(spark, sf).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity_ann_pq(spark, sf).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.55, f"PQ ANN recall@5 collapsed at sf0.1: {recall:.2f}"


def test_phash_neardup_finds_planted_pairs(spark, tmp_path):
    """Planted near-identical payloads must collide (tiny perturbation
    → small Hamming distance → banded candidate + verify), and the
    pipeline must be deterministic across runs."""
    from guidewire_spark.operators.llm import multimodal_phash_neardup

    base = ("the quick brown fox jumps over the lazy dog " * 60)[:2500]
    perturbed = base[:1200] + "X" + base[1201:]
    other = ("zzzz!!!!    0000AAAA####aaaa    " * 90)[:2500]
    docs = [
        (1, base, "en", "web", len(base)),
        (2, perturbed, "en", "web", len(perturbed)),
        (3, other, "en", "web", len(other)),
        (4, other[::-1], "en", "web", len(other)),
    ]
    d = str(tmp_path / "phash_docs")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(d + "/documents.parquet")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in multimodal_phash_neardup(spark, d).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 10
    assert (1, 3) not in pairs and (1, 4) not in pairs
    again = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in multimodal_phash_neardup(spark, d).collect()
    }
    assert pairs == again


def test_ivfpq_recall_vs_bruteforce(spark):
    """IVF-PQ composite: probing 2/8 cells with residual-PQ ADC and
    exact rerank must recover a solid fraction of the exact top-5.
    The coarse probe is the recall ceiling (a true neighbor in an
    unprobed cell is unreachable); residual PQ + 100-deep rerank
    recovers nearly everything inside the probed cells."""
    from guidewire_spark.operators.llm import (
        similarity_ann_ivfpq,
        similarity_topk_bruteforce,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity_topk_bruteforce(spark, SF).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity_ann_ivfpq(spark, SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF-PQ recall@5 collapsed: {recall:.2f}"


def test_substring_spans_interval_merge_on_planted_corpus(spark, tmp_path):
    """dedup_substring_spans on a planted corpus: a 6-token run shared
    by two documents produces two overlapping duplicated 5-windows per
    document that must interval-merge into ONE maximal span of exactly
    6 tokens; a unique document must not appear at all."""
    from guidewire_spark.operators.llm import dedup_substring_spans

    rows = [
        (1, "a b c d e f g h", "en", "t", 15),
        (2, "x x a b c d e f y", "en", "t", 17),
        (3, "p q r s t unique1 only1", "en", "t", 23),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = {r.doc_id: r for r in dedup_substring_spans(spark, sf).collect()}
    assert set(got) == {1, 2}, f"unexpected docs: {sorted(got)}"
    for doc_id, n_tokens in ((1, 8), (2, 9)):
        r = got[doc_id]
        assert r.n_spans == 1, f"doc {doc_id}: windows did not merge: {r}"
        assert r.dup_tokens == 6, f"doc {doc_id}: span mass wrong: {r}"
        assert r.n_tokens == n_tokens
        assert abs(r.dup_frac - round(6 / n_tokens, 6)) < 1e-9


def test_substring_trim_keep_first_semantics(spark, tmp_path):
    """dedup_substring_trim keeps the globally FIRST occurrence of a
    duplicated window and cuts the later ones: with the same 6-token
    run in docs 1 and 2, doc 1 (earlier (doc_id, start)) survives
    intact while doc 2 loses exactly the merged 6-token span; an exact
    duplicate of a whole document is trimmed to nothing and drops out."""
    from guidewire_spark.operators.llm import dedup_substring_trim

    rows = [
        (1, "a b c d e f g h", "en", "t", 15),
        (2, "x x a b c d e f y", "en", "t", 17),
        (3, "m n o p q r", "en", "t", 11),
        (4, "m n o p q r", "en", "t", 11),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = {r.doc_id: r for r in dedup_substring_trim(spark, sf).collect()}
    assert got[1].retained_text == "a b c d e f g h"
    assert got[2].retained_text == "x x y"
    assert got[2].retained_tokens == 3
    assert got[3].retained_text == "m n o p q r"
    assert 4 not in got, f"exact dup should trim to nothing: {got.get(4)}"


def test_deletion_neighborhood_covers_all_distance_one_pairs():
    """The theorem join_fuzzy_deletion rests on, pinned empirically:
    two strings with Levenshtein distance <= 1 ALWAYS share a member
    of (string ∪ its single-char deletions) — so the equi-join on
    variants can never miss a true pair (false candidates are fine;
    the verify step removes them)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def lev1(a: str, b: str) -> bool:
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:  # one substitution
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        return any(b[:i] + b[i + 1 :] == a for i in range(lb))

    def hood(s: str) -> set[str]:
        return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet="ab1", max_size=6),
        st.text(alphabet="ab1", max_size=6),
    )
    def check(a, b):
        if lev1(a, b):
            assert hood(a) & hood(b), (a, b)

    check()


def test_minhash_verified_recalls_very_high_jaccard_pairs(spark):
    """Quality gate for the hash-verified minhash row (md5-int ids, 16
    permutations in 4 bands × 4 rows — a LIGHTER band structure than
    the production 8×4, so the gate uses a tighter Jaccard floor:
    at J >= 0.7 a band-collision miss would indicate broken banding
    wiring, not banding probability).  Correctness of the row itself
    is the DuckDB oracle's job; this pins that the candidate recall is
    sane against the exact-Jaccard twin."""
    from guidewire_spark.operators.llm import (
        dedup_minhash_verified,
        dedup_ngram_jaccard,
    )

    exact = dedup_ngram_jaccard(spark, SF)
    high = {
        (r.doc_a, r.doc_b)
        for r in exact.where(F.col("jaccard") >= 0.7).collect()
    }
    verified = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_verified(spark, SF)
        .where((F.col("doc_a") < 100) & (F.col("doc_b") < 100))
        .collect()
    }
    assert high, "fixture should contain at least one very-high-Jaccard pair"
    missed = high - verified
    assert not missed, f"verified-minhash missed high-Jaccard pairs: {missed}"


def test_simhash_verified_hamming_separates_near_dups(spark):
    """Same quality property the production simhash row is gated on:
    near-dup documents land Hamming-close, unrelated documents far —
    over the 60-bit md5-int signature."""
    from guidewire_spark.operators.llm import (
        dedup_ngram_jaccard,
        dedup_simhash_verified,
    )

    sig = {
        r.doc_id: r.simhash
        for r in dedup_simhash_verified(spark, SF).collect()
    }
    assert all(0 <= v < 2**60 for v in sig.values())

    def ham(a, b):
        return bin(a ^ b).count("1")

    high = [
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, SF)
        .where(F.col("jaccard") >= 0.5)
        .collect()
    ]
    assert high
    near = [ham(sig[a], sig[b]) for a, b in high]
    assert max(near) <= 20, f"near-dups not Hamming-close: {near}"


def test_verified_oracle_preconditions_hold_on_testdata(spark):
    """Loud pre-flight for the two data-dependent assumptions the
    round-9 verified oracles rest on, so a regenerated fixture that
    breaks them fails HERE with a named cause instead of as an opaque
    driver hash mismatch:

    1. BPE symbol encoding: the corpus must contain no private-use-
       area chars U+E000-U+E00F — the oracle assigns those codepoints
       to merged symbols, and a base char in that range would collide
       (two symbols, one encoded char).
    2. Quantization parity: floor(normalize(embedding)*1e4) must agree
       element-for-element between Spark and DuckDB (the sign-bit /
       bucket inputs of the integer-hyperplane verified rows).  The
       structural risk is a normalized component whose engines' last
       ulp straddles a 1e-4 grid boundary.
    """
    import duckdb

    from guidewire_spark.functions import vectors as V
    from guidewire_spark.plans.catalog import load_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        pua = (
            load_table(spark, sf, "documents")
            .where(F.col("text").rlike("[\\ue000-\\ue00f]"))
            .count()
        )
        assert pua == 0, f"{sf}: corpus contains U+E000-U+E00F chars"

        # BMP-only guard: the BPE argmax tie-break orders decoded
        # symbol strings in both engines, but Spark compares by UTF-16
        # code units while DuckDB compares UTF-8 bytes — orders that
        # agree on the BMP yet DIVERGE for supplementary-plane chars
        # (U+10000+, which UTF-16 encodes as surrogate pairs sorting
        # BELOW U+E000..U+FFFF).  The oracle contract is BMP-only.
        non_bmp = (
            load_table(spark, sf, "documents")
            .where(F.col("text").rlike("[\\x{10000}-\\x{10FFFF}]"))
            .count()
        )
        assert non_bmp == 0, (
            f"{sf}: corpus contains supplementary-plane (non-BMP) "
            "chars — Spark UTF-16 vs DuckDB UTF-8 string order "
            "diverges there, breaking the BPE tie-break parity"
        )

        qu = (
            load_table(spark, sf, "embeddings")
            .select(
                "vec_id",
                F.transform(
                    V.normalize(F.col("embedding")),
                    lambda x: F.floor(x * 10000).cast("long"),
                ).alias("qu"),
            )
            .collect()
        )
        srows = {r.vec_id: list(r.qu) for r in qu}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf}/embeddings.parquet')"
        )
        drows = dict(
            con.execute(
                """
            SELECT vec_id, list_transform(
              list_transform(embedding, x -> CAST(x AS DOUBLE) /
                sqrt(list_sum(list_transform(embedding,
                     y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))),
              x -> CAST(FLOOR(x * 10000) AS BIGINT)) FROM embeddings
            """
            ).fetchall()
        )
        bad = [k for k in srows if srows[k] != drows[k]]
        assert not bad, f"{sf}: quantization parity broken for {bad[:5]}"
