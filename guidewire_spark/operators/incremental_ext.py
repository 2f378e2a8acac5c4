"""Round-6 frontier: INCREMENTAL dedup-against-history — the shape a
production training-data pipeline actually runs.  One-shot corpus
dedup (dedup_minhash_lsh / dedup_connected_components) answers "which
of these N documents duplicate each other"; a crawling pipeline needs
"is this NEW batch a duplicate of anything we have EVER accepted",
without re-scanning history per batch.

The design is the standard LSH-store architecture: a Delta table
holds the band membership (band, bucket, doc_id) plus the full
minhash signature of every ACCEPTED document.  Each arriving batch

1. computes its signatures (the same deterministic seed as the
   one-shot operator — signatures from different runs are comparable),
2. joins its band hashes against the store → candidate (new, old)
   pairs — the only history touched is the matching buckets,
3. verifies candidates by estimated Jaccard (fraction of agreeing
   minhash components ≥ threshold — no historical TEXT is ever read,
   only the signature store),
4. also self-dedups within the batch (earlier doc_id wins),
5. MERGEs the accepted docs' bands + signatures into the store and
   appends the per-doc decisions.

At 100 TB: per-batch cost is proportional to the batch plus the
touched buckets, never to history; the store is a Delta table so the
whole loop is restartable and the accept/reject log is itself a
queryable table.  The batch loop body is exactly what a
``foreachBatch`` sink runs in the streaming form (the CDC-apply
pattern, streaming/jobs.py) — registered as the deterministic batch
twin so the driver can execute it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from guidewire_spark.operators.llm import (
    MINHASH_N,
    band_hashes,
    minhash_signatures,
)
from guidewire_spark.plans.catalog import load_table
from guidewire_spark.plans.scratch import scratch_dir
from guidewire_spark.registry import query

_SIG_COLS = [f"mh_{i}" for i in range(MINHASH_N)]


def dedup_batch_against_store(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    threshold: float = 0.5,
    signature_fn=minhash_signatures,
    band_fn=band_hashes,
    sig_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One incremental-dedup step (the ``foreachBatch`` body): returns
    (decisions, accepted_signatures).  ``decisions`` has one row per
    batch doc: (doc_id, is_duplicate, matched_doc_id); accepted docs'
    signatures are what the caller merges into the store.

    ``signature_fn``/``band_fn``/``sig_cols`` select the signature
    scheme: the default is the production xxhash64 pipeline; the
    hash-verified variant (``dedup_incremental_minhash_verified``)
    passes the md5-int arithmetic stages so the SAME store/candidate/
    verify machinery runs under a SQL-reproducible hash."""
    from guidewire_spark.sources.snapshot import read_delta

    if sig_cols is None:
        sig_cols = _SIG_COLS
    # Materialize the signatures ONCE per batch (eager localCheckpoint,
    # batch-sized: one row of 33 longs per doc): the frame feeds the
    # band self-join (both sides), the verify join, and the accepted
    # write — without the checkpoint each consumer re-runs the
    # CPU-heavy mapInPandas shingling stage (the anti-pattern
    # dedup_minhash_lsh's own docstring warns about).
    # Guarded fan-out BEFORE the signature stage (round-12): the
    # arrival batch is a filtered single-file scan at the test SFs —
    # one partition — so the CPU-heavy mapInPandas shingling of every
    # chunk ran in ONE task; at real scale the batch scan already
    # carries ≥ cores partitions and this is a no-op.  Signatures are
    # pure per-document functions, so the layout cannot change them.
    from guidewire_spark.plans.catalog import fan_out

    sigs = signature_fn(fan_out(batch)).localCheckpoint(eager=True)
    bands = band_fn(sigs)

    # --- within-batch self-dedup: earlier (lower) doc_id wins -------
    a, b = bands.alias("a"), bands.alias("b")
    self_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("cand_id"),
        )
        .distinct()
    )

    # --- against-history candidates ---------------------------------
    # store presence = live data files in the Delta log — a
    # metadata-only read (load_snapshot), NOT a limit(1).count() Spark
    # job per batch (guide §1.2: remove the work outright)
    try:
        from guidewire_spark.sources.snapshot import load_snapshot

        have_store = load_snapshot(store_path).num_files > 0
        store = read_delta(spark, store_path) if have_store else None
    except FileNotFoundError:
        store, have_store = None, False
    if have_store:
        hist_pairs = (
            bands.alias("n")
            .join(
                store.select("band", "bucket", F.col("doc_id").alias("cand_id"))
                .alias("h"),
                ["band", "bucket"],
            )
            .select("doc_id", "cand_id")
            .distinct()
        )
        cand = self_pairs.unionByName(hist_pairs).distinct()
        # store ids and batch ids are disjoint (a doc is processed
        # once), so plain union; the store side is filtered to the
        # CANDIDATE ids map-side via a broadcast semi-join BEFORE the
        # verify join — the signature store is O(history) and only
        # bucket-matched rows may shuffle
        cand_ids = F.broadcast(
            cand.select(F.col("cand_id").alias("doc_id")).distinct()
        )
        cand_sigs = (
            read_delta(spark, store_path + "_sigs")
            .join(cand_ids, "doc_id", "left_semi")
            .unionByName(sigs)
        )
    else:
        cand = self_pairs
        cand_sigs = sigs

    # --- verify by estimated Jaccard over signatures -----------------
    agree = sum(
        F.when(F.col(f"n_{c}") == F.col(f"c_{c}"), 1).otherwise(0)
        for c in sig_cols
    )
    n_side = sigs.select(
        F.col("doc_id"), *[F.col(c).alias(f"n_{c}") for c in sig_cols]
    )
    c_side = cand_sigs.select(
        F.col("doc_id").alias("cand_id"),
        *[F.col(c).alias(f"c_{c}") for c in sig_cols],
    )
    verified = (
        cand.join(n_side, "doc_id")
        .join(c_side, "cand_id")
        .where(agree >= int(threshold * len(sig_cols)))
        .select("doc_id", "cand_id")
    )
    # Duplicate convention (documented, deterministic, exactly
    # replicable): a doc is a duplicate iff it is similar to ANY
    # earlier doc of the same batch (lower doc_id) or to ANY accepted
    # doc of an earlier batch — the transitive-chain convention
    # (similar-to-a-duplicate still counts, like connected-component
    # dedup), so no kept/duplicate fixed point is needed and batch
    # processing provably matches the sequential replay.
    best = verified.groupBy("doc_id").agg(F.min("cand_id").alias("matched_doc_id"))
    decisions = (
        batch.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.col("matched_doc_id").isNotNull().alias("is_duplicate"),
            "matched_doc_id",
        )
    )
    # Pin the decision table before deriving consumers: the caller
    # actions this subtree three times per batch (band-store append,
    # signature-store append, final decision-log drain), and the
    # candidate-generation + verify joins above are the batch's whole
    # cost — the eager local checkpoint computes them ONCE and the
    # three actions re-read a k-columns × batch-rows materialization
    # (guide §5: cut lineage when an intermediate is reused and
    # recomputing beats memory; decisions is batch-sized, never
    # corpus-sized).
    decisions = decisions.localCheckpoint(eager=True)
    accepted = sigs.join(
        decisions.where("is_duplicate").select("doc_id"), "doc_id", "left_anti"
    )
    return decisions, accepted


def _minhash_store_run(
    spark: SparkSession,
    d: DataFrame,
    store_path: str,
    signature_fn=minhash_signatures,
    band_fn=band_hashes,
    sig_cols: list[str] | None = None,
) -> DataFrame:
    """The 3-batch minhash dedup-against-history loop, shared by the
    production row and the hash-verified sibling so the two can never
    drift: per arrival batch (doc_id % 3), run one
    ``dedup_batch_against_store`` step, append the accepted docs'
    bands + signatures to the Delta store, and accumulate the
    per-doc decisions."""
    from guidewire_spark.sources.writer import write_delta

    out = None
    for chunk in range(3):
        batch = d.where(F.col("doc_id") % 3 == chunk)
        decisions, accepted = dedup_batch_against_store(
            spark,
            batch,
            store_path,
            signature_fn=signature_fn,
            band_fn=band_fn,
            sig_cols=sig_cols,
        )
        decisions = decisions.withColumn("batch", F.lit(chunk).cast("long"))
        write_delta(band_fn(accepted), store_path, mode="append")
        write_delta(accepted, store_path + "_sigs", mode="append")
        out = decisions if out is None else out.unionByName(decisions)
    return out.select("doc_id", "batch", "is_duplicate", "matched_doc_id")


@query("dedup_incremental_minhash")  # engine-hash-dependent → rows-only;
# order-equivalence vs the one-shot replica is gated in pytest
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-against-history over three arrival batches (doc_id % 3 as
    the simulated crawl order): every batch is checked against the
    accumulated LSH store of previously ACCEPTED documents plus
    itself, and only accepted docs extend the store.  The duplicate
    verdicts must be exactly what a single-pass dedup in arrival
    order produces (pytest replica gate) — the property that makes
    incremental processing trustworthy: processing in batches must
    not change the answer."""

    store_path = scratch_dir("gw_incdedup_") + "/lsh_store"
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _minhash_store_run(spark, d, store_path)


def _inc_mhv_oracle() -> str:
    """Unrolled 3-batch DuckDB replay of the incremental LSH-store
    pipeline under the md5-int arithmetic hash: signatures, band
    buckets, candidate generation (within-batch lower-doc_id +
    bucket-collision against ACCEPTED earlier docs), signature-
    agreement verification, and the per-batch acceptance recursion —
    all digit-for-digit."""
    from guidewire_spark.operators.llm import _MHV_AB, mhv_sigs_bands_sql

    agree = " + ".join(
        f"CAST(sn.m{i} = sc.m{i} AS INT)" for i in range(len(_MHV_AB))
    )
    thresh = int(0.5 * len(_MHV_AB))
    return f"""
    WITH docs AS (SELECT doc_id, doc_id % 3 AS batch, text FROM documents),
    {mhv_sigs_bands_sql("docs")},
    cand AS (
      SELECT DISTINCT a.doc_id AS n, b.doc_id AS c
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket
       AND a.doc_id <> b.doc_id
    ),
    ver AS (
      SELECT cand.n, cand.c, dn.batch AS bn, dc.batch AS bc
      FROM cand
      JOIN sigs sn ON sn.doc_id = cand.n
      JOIN sigs sc ON sc.doc_id = cand.c
      JOIN docs dn ON dn.doc_id = cand.n
      JOIN docs dc ON dc.doc_id = cand.c
      WHERE ({agree}) >= {thresh}
    ),
    dup0 AS (
      SELECT n AS doc_id, MIN(c) AS m FROM ver
      WHERE bn = 0 AND bc = 0 AND c < n GROUP BY n
    ),
    dup1 AS (
      SELECT n AS doc_id, MIN(c) AS m FROM ver
      WHERE bn = 1 AND ((bc = 1 AND c < n)
         OR (bc = 0 AND c NOT IN (SELECT doc_id FROM dup0)))
      GROUP BY n
    ),
    dup2 AS (
      SELECT n AS doc_id, MIN(c) AS m FROM ver
      WHERE bn = 2 AND ((bc = 2 AND c < n)
         OR (bc < 2 AND c NOT IN (SELECT doc_id FROM dup0
                                  UNION SELECT doc_id FROM dup1)))
      GROUP BY n
    ),
    dups AS (
      SELECT * FROM dup0 UNION ALL SELECT * FROM dup1
      UNION ALL SELECT * FROM dup2
    )
    SELECT d.doc_id, CAST(d.batch AS BIGINT) AS batch,
           dups.m IS NOT NULL AS is_duplicate,
           dups.m AS matched_doc_id
    FROM docs d LEFT JOIN dups ON dups.doc_id = d.doc_id
    """


@query("dedup_incremental_minhash_verified", oracle=_inc_mhv_oracle())
def dedup_incremental_minhash_verified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The incremental LSH-store pipeline, hash-verified end-to-end.

    Identical machinery to ``dedup_incremental_minhash`` — the SAME
    ``dedup_batch_against_store`` body (Delta band + signature stores,
    broadcast-semi-join candidate filtering, signature-agreement
    verification, transitive acceptance convention) — with the
    signature scheme swapped to the md5-int arithmetic stages
    (``minhash_signatures_verified`` / ``band_buckets_arith``), so a
    DuckDB oracle replays all three batches digit-for-digit: every
    signature, bucket, candidate pair, agreement count, and the
    acceptance recursion itself.  The production row keeps only the
    engine hash (and its pytest batched≡sequential gate); the store/
    candidate/verify machinery is now value-verified here.

    Scale shape: unchanged from the production row — per-batch cost ∝
    batch size + touched buckets, history text never re-read."""

    from guidewire_spark.operators.llm import (
        _MHV_AB,
        band_buckets_arith,
        minhash_signatures_verified,
    )

    store_path = scratch_dir("gw_incdedupv_") + "/lsh_store"
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _minhash_store_run(
        spark,
        d,
        store_path,
        signature_fn=minhash_signatures_verified,
        band_fn=band_buckets_arith,
        sig_cols=[f"m{i}" for i in range(len(_MHV_AB))],
    )


@query(
    "dedup_incremental_exact",
    oracle="""
    WITH o AS (
      SELECT doc_id, doc_id % 3 AS batch, sha256(text) AS h FROM documents
    ),
    ranked AS (
      SELECT doc_id, batch, h,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY batch, doc_id) AS rn,
             FIRST_VALUE(doc_id) OVER (PARTITION BY h ORDER BY batch, doc_id)
               AS keeper
      FROM o
    )
    SELECT doc_id, CAST(batch AS BIGINT) AS batch,
           rn > 1 AS is_duplicate,
           CASE WHEN rn > 1 THEN keeper END AS matched_doc_id
    FROM ranked
    """,
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT dedup-against-history (the oracle-verified twin of the
    minhash pipeline): three arrival batches check their sha256 text
    digests against a Delta digest store of previously accepted
    documents; within a batch the lowest doc_id wins.  Per-batch cost
    is digest-join-sized (32-byte digests + ids shuffle, never text);
    the store is a restartable Delta table.  Because exact identity
    is transitive for free, the incremental verdicts provably equal
    the one-shot GROUP BY — which is exactly what the oracle computes
    with a single window over arrival order."""

    from guidewire_spark.sources.snapshot import read_delta
    from guidewire_spark.sources.writer import write_delta

    store_path = scratch_dir("gw_incexact_") + "/digests"
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.sha2("text", 256).alias("h")
    )
    out = None
    for chunk in range(3):
        batch = d.where(F.col("doc_id") % 3 == chunk)
        # within-batch keeper: lowest doc_id per digest — a plain
        # shuffle join on the digest (one row per DISTINCT digest ≈
        # batch-sized: never forced broadcast; AQE may still choose
        # one when the batch is genuinely small)
        w_min = batch.groupBy("h").agg(F.min("doc_id").alias("batch_keeper"))
        try:
            store = read_delta(spark, store_path).select(
                "h", F.col("keeper").alias("hist_keeper")
            )
        except FileNotFoundError:
            store = None
        scored = batch.join(w_min, "h")
        if store is not None:
            scored = scored.join(store, "h", "left")
        else:
            scored = scored.withColumn("hist_keeper", F.lit(None).cast("long"))
        matched = F.coalesce("hist_keeper", "batch_keeper")
        decisions = scored.select(
            "doc_id",
            F.lit(chunk).cast("long").alias("batch"),
            (matched != F.col("doc_id")).alias("is_duplicate"),
            F.when(matched != F.col("doc_id"), matched).alias(
                "matched_doc_id"
            ),
            "h",
            "batch_keeper",
            "hist_keeper",
        )
        accepted = decisions.where(~F.col("is_duplicate")).select(
            "h", F.col("doc_id").alias("keeper")
        )
        write_delta(accepted, store_path, mode="append")
        keep = decisions.select(
            "doc_id", "batch", "is_duplicate", "matched_doc_id"
        )
        out = keep if out is None else out.unionByName(keep)
    return out


@query("dedup_incremental_embedding")  # hyperplane-LSH candidates →
# rows-only; batching-invariance replica gate in pytest
def dedup_incremental_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING dedup-against-history — the semantic sibling of
    dedup_incremental_minhash: three arrival batches of unit vectors
    check their random-hyperplane LSH buckets against a Delta store of
    previously ACCEPTED vectors, candidates verify by EXACT fused
    cosine (zip_with dot on the unit vectors, ≥ 0.95), and only
    accepted vectors extend the store.  Exact copies of every 10th
    vector are planted one batch later (vec_id + 1,000,000), so the
    pipeline demonstrably catches semantic re-crawls of accepted
    content.  Same documented convention as the minhash form: a
    vector is a duplicate iff cosine-similar to a lower-id same-batch
    vector or to any accepted earlier-batch vector sharing a bucket;
    duplicate verdicts must equal the sequential replay (pytest).

    Scale: per-batch cost ∝ batch + touched buckets; the vector store
    joins filter map-side on broadcast candidate ids; vectors shuffle
    only for verified candidates, never all-pairs."""

    from guidewire_spark.functions import vectors as V
    from guidewire_spark.operators.llm import _hyperplane_bucket_udf
    from guidewire_spark.sources.snapshot import read_delta
    from guidewire_spark.sources.writer import write_delta

    store_path = scratch_dir("gw_incemb_") + "/buckets"
    band_buckets = _hyperplane_bucket_udf(n_bands=32, bits=12, dim=64)

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    planted = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "u"
    )
    corpus = base.unionByName(planted)

    dot = F.aggregate(
        F.zip_with("n_u", "c_u", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return _embedding_dedup_run(
        spark, corpus, store_path, band_buckets, dot >= 0.95
    )


def _embedding_dedup_run(
    spark: SparkSession,
    corpus: DataFrame,
    store_path: str,
    band_buckets,
    similar,
) -> DataFrame:
    """The embedding dedup-against-history loop body, shared by the
    production row (float hyperplanes + exact-cosine >= 0.95 verify)
    and the hash-verified sibling (integer hyperplanes + exact integer
    quantized-dot verify).  ``corpus`` carries (vec_id, u); ``similar``
    is the verify predicate over columns n_u/c_u."""
    from guidewire_spark.sources.snapshot import read_delta
    from guidewire_spark.sources.writer import write_delta

    out = None
    for chunk in range(3):
        # eager checkpoint: the batch frame feeds the bands self-join
        # (twice), the verify join, and the accepted write — pin it so
        # the normalize + hyperplane matmul run once per batch
        batch = corpus.where(F.col("vec_id") % 3 == chunk).localCheckpoint(
            eager=True
        )
        bands = batch.select(
            "vec_id", F.posexplode(band_buckets("u")).alias("band", "bucket")
        )
        a, b = bands.alias("a"), bands.alias("b")
        self_pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") > F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_id"),
                F.col("b.vec_id").alias("cand_id"),
            )
            .distinct()
        )
        # store presence = live data files in the Delta log — a
        # metadata-only read (load_snapshot), NOT a limit(1).count()
        # Spark job; this per-batch orchestration job was pure
        # overhead (guide §1.2: remove work, then tune) and at scale
        # the log read is O(log), the count job O(cluster round-trip)
        try:
            from guidewire_spark.sources.snapshot import load_snapshot

            have = load_snapshot(store_path).num_files > 0
            store = read_delta(spark, store_path) if have else None
        except FileNotFoundError:
            store, have = None, False
        if have:
            hist_pairs = (
                bands.join(
                    store.select(
                        "band", "bucket", F.col("vec_id").alias("cand_id")
                    ),
                    ["band", "bucket"],
                )
                .select("vec_id", "cand_id")
                .distinct()
            )
            cand = self_pairs.unionByName(hist_pairs).distinct()
            cand_ids = F.broadcast(
                cand.select(F.col("cand_id").alias("vec_id")).distinct()
            )
            cand_vecs = (
                read_delta(spark, store_path + "_vecs")
                .join(cand_ids, "vec_id", "left_semi")
                .unionByName(batch)
            )
        else:
            cand = self_pairs
            cand_vecs = batch
        verified = (
            cand.join(batch.select("vec_id", F.col("u").alias("n_u")), "vec_id")
            .join(
                cand_vecs.select(
                    F.col("vec_id").alias("cand_id"), F.col("u").alias("c_u")
                ),
                "cand_id",
            )
            .where(similar)
            .select("vec_id", "cand_id")
        )
        best = verified.groupBy("vec_id").agg(
            F.min("cand_id").alias("matched_vec_id")
        )
        decisions = (
            batch.select("vec_id")
            .join(best, "vec_id", "left")
            .select(
                "vec_id",
                F.lit(chunk).cast("long").alias("batch"),
                F.col("matched_vec_id").isNotNull().alias("is_duplicate"),
                "matched_vec_id",
            )
            # actioned three times (two store appends + the final
            # drain) — compute the bands/verify pipeline once per
            # batch (same rationale as dedup_batch_against_store)
            .localCheckpoint(eager=True)
        )
        accepted = batch.join(
            decisions.where("is_duplicate").select("vec_id"),
            "vec_id",
            "left_anti",
        )
        acc_bands = accepted.select(
            "vec_id", F.posexplode(band_buckets("u")).alias("band", "bucket")
        )
        write_delta(acc_bands, store_path, mode="append")
        write_delta(accepted, store_path + "_vecs", mode="append")
        out = decisions if out is None else out.unionByName(decisions)
    return out


def _inc_embv_oracle() -> str:
    """Unrolled 3-batch DuckDB replay of the embedding LSH-store
    pipeline under the integer scheme: vectors quantize to
    floor(u·10⁴) int64 (exact cross-engine — verified over the whole
    table), hyperplane entries regenerate from the integer LCG formula
    the Spark UDF uses, sign bits / bucket packing / candidate
    generation / the quantized-dot ≥ 0.95·10⁸ verify / the acceptance
    recursion are all pure integer arithmetic."""
    return """
    WITH base AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS fu
      FROM embeddings
    ),
    qv0 AS MATERIALIZED (
      SELECT vec_id,
             list_transform(fu, x -> CAST(FLOOR(x * 10000) AS BIGINT)) AS qu
      FROM base
    ),
    corpus AS MATERIALIZED (
      SELECT vec_id, qu FROM qv0
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, qu FROM qv0 WHERE vec_id % 10 = 0
    ),
    qv AS MATERIALIZED (
      SELECT vec_id, vec_id % 3 AS batch, i AS dim, qu[i + 1] AS q
      FROM corpus, UNNEST(range(0, 64)) AS t(i)
    ),
    hyp AS MATERIALIZED (
      SELECT p, i,
             ((1103515245 * (p * 64 + i) + 12345) % 65536) - 32768 AS h
      FROM range(0, 64) a(p), range(0, 64) b(i)
    ),
    dots AS MATERIALIZED (
      SELECT qv.vec_id, hyp.p, SUM(qv.q * hyp.h) AS s
      FROM qv JOIN hyp ON hyp.i = qv.dim
      GROUP BY qv.vec_id, hyp.p
    ),
    bands AS MATERIALIZED (
      SELECT vec_id, p // 8 AS band,
             SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << (p % 8))
                      ELSE 0 END) AS bucket
      FROM dots GROUP BY vec_id, p // 8
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.vec_id AS n, b.vec_id AS c
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket
       AND a.vec_id <> b.vec_id
    ),
    verdot AS MATERIALIZED (
      SELECT cand.n, cand.c, SUM(qa.q * qb.q) AS d
      FROM cand
      JOIN qv qa ON qa.vec_id = cand.n
      JOIN qv qb ON qb.vec_id = cand.c AND qb.dim = qa.dim
      GROUP BY cand.n, cand.c
    ),
    ver AS MATERIALIZED (
      SELECT v.n, v.c, v.n % 3 AS bn, v.c % 3 AS bc
      FROM verdot v WHERE v.d >= 95000000
    ),
    dup0 AS MATERIALIZED (
      SELECT n AS vec_id, MIN(c) AS m FROM ver
      WHERE bn = 0 AND bc = 0 AND c < n GROUP BY n
    ),
    dup1 AS MATERIALIZED (
      SELECT n AS vec_id, MIN(c) AS m FROM ver
      WHERE bn = 1 AND ((bc = 1 AND c < n)
         OR (bc = 0 AND c NOT IN (SELECT vec_id FROM dup0)))
      GROUP BY n
    ),
    dup2 AS MATERIALIZED (
      SELECT n AS vec_id, MIN(c) AS m FROM ver
      WHERE bn = 2 AND ((bc = 2 AND c < n)
         OR (bc < 2 AND c NOT IN (SELECT vec_id FROM dup0
                                  UNION SELECT vec_id FROM dup1)))
      GROUP BY n
    ),
    dups AS (
      SELECT * FROM dup0 UNION ALL SELECT * FROM dup1
      UNION ALL SELECT * FROM dup2
    )
    SELECT cs.vec_id, CAST(cs.vec_id % 3 AS BIGINT) AS batch,
           dups.m IS NOT NULL AS is_duplicate,
           dups.m AS matched_vec_id
    FROM corpus cs LEFT JOIN dups ON dups.vec_id = cs.vec_id
    """


@query("dedup_incremental_embedding_verified", oracle=_inc_embv_oracle())
def dedup_incremental_embedding_verified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The embedding LSH-store pipeline, hash-verified end-to-end.

    The SAME ``_embedding_dedup_run`` body as the production row —
    Delta band + vector stores, bucket self-join, broadcast-semi-join
    candidate filtering, verify join, acceptance recursion — with the
    two float-dependent stages swapped for exact integer twins: the
    hyperplane buckets come from ``_int_hyperplane_bucket_udf`` (int64
    LCG hyperplanes over floor(u·10⁴)-quantized vectors, same Arrow
    batch shape and numpy matmul as production, but exact), and the
    cosine verify becomes the quantized integer dot ≥ 0.95·10⁸.  The
    DuckDB oracle regenerates hyperplanes from the same formula and
    replays all three batches — every sign bit, bucket, candidate
    pair, dot, and the acceptance recursion — digit for digit.
    Quantization parity (floor of the normalized component × 10⁴) was
    verified over the entire embeddings table before this row shipped.

    Scale shape: unchanged — per-batch cost ∝ batch + touched buckets,
    the Arrow matmul stays one batch-sized matrix multiply."""

    from guidewire_spark.functions import vectors as V
    from guidewire_spark.operators.llm import _int_hyperplane_bucket_udf

    store_path = scratch_dir("gw_incembv_") + "/buckets"
    band_buckets = _int_hyperplane_bucket_udf(n_bands=8, bits=8, dim=64)

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            V.normalize(F.col("embedding")),
            lambda x: F.floor(x * 10000).cast("long"),
        ).alias("u"),
    )
    planted = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "u"
    )
    corpus = base.unionByName(planted)

    int_dot = F.aggregate(
        F.zip_with("n_u", "c_u", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return _embedding_dedup_run(
        spark, corpus, store_path, band_buckets, int_dot >= 95_000_000
    )


@query(
    "dedup_incremental_substring",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS words
      FROM documents
    ),
    occ AS (
      SELECT doc_id, doc_id % 3 AS batch, i - 1 AS start,
             array_to_string(words[i : i + 4], ' ') AS shingle
      FROM toks, UNNEST(range(1, len(words) - 3)) AS t(i)
      WHERE len(words) >= 5
    ),
    ranked AS (
      SELECT doc_id, batch, start,
             ROW_NUMBER() OVER (PARTITION BY shingle
                                ORDER BY batch, doc_id, start) AS rn
      FROM occ
    ),
    hits AS (SELECT doc_id, batch, start FROM ranked WHERE rn > 1),
    isl AS (
      SELECT doc_id, batch, start,
             SUM(CASE WHEN prev_max_end IS NULL OR start > prev_max_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY start
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM (
        SELECT doc_id, batch, start,
               MAX(start + 5) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max_end
        FROM hits)
    ),
    spans AS (
      SELECT doc_id, ANY_VALUE(batch) AS batch, island,
             MIN(start) AS s, MAX(start) + 5 AS e
      FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id, CAST(batch AS BIGINT) AS batch,
           COUNT(*) AS n_spans, CAST(SUM(e - s) AS BIGINT) AS dup_tokens
    FROM spans GROUP BY doc_id, batch
    """,
)
def dedup_incremental_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING-SPAN dedup-against-history: three arrival batches
    check their 5-token windows against a Delta SHINGLE STORE of every
    window previously accepted; a window whose shingle is stored (or
    repeats a within-batch arrival-earlier window) is cut, cut windows
    interval-merge per document, and only first-arrival shingles
    extend the store.  First-ARRIVAL-wins is exactly keep-first under
    the arrival order, so the incremental verdicts provably equal a
    single window over (batch, doc_id, start) — which is what the
    oracle computes; the batched pipeline is therefore oracle-verified
    end-to-end, unlike the minhash/embedding siblings whose candidate
    hashes force rows-only checks.

    Scale: per-batch cost ∝ batch occurrences + matched store rows
    (the store join is shingle-keyed and AQE-skew-splittable); the
    store grows by distinct NEW shingles only and history text is
    never re-read.  At 100 TB the store key would be an xxhash64 of
    the shingle; the string key is kept so the oracle can verify."""

    from guidewire_spark.operators.llm import (
        SUBSTRING_K,
        merge_cut_spans,
        substring_occurrences,
    )
    from guidewire_spark.sources.snapshot import read_delta
    from guidewire_spark.sources.writer import write_delta

    k = SUBSTRING_K
    store_path = scratch_dir("gw_incsub_") + "/shingles"
    d = load_table(spark, sf_dir, "documents")
    out = None
    for chunk in range(3):
        _, occ = substring_occurrences(
            d.where(F.col("doc_id") % 3 == chunk), k
        )
        occ = occ.withColumn(
            "okey", F.col("doc_id").cast("bigint") * 100000 + F.col("start")
        )
        keeper = occ.groupBy("shingle").agg(F.min("okey").alias("batch_keep"))
        try:
            store = read_delta(spark, store_path).withColumn(
                "in_store", F.lit(True)
            )
        except FileNotFoundError:
            store = None
        scored = occ.join(keeper, "shingle")
        if store is not None:
            scored = scored.join(store, "shingle", "left")
        else:
            scored = scored.withColumn("in_store", F.lit(None).cast("boolean"))
        cut = F.coalesce("in_store", F.lit(False)) | (
            F.col("okey") != F.col("batch_keep")
        )
        hits = scored.where(cut).select("doc_id", "start")
        stats = (
            merge_cut_spans(hits, k)
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_spans"),
                F.sum(F.col("e") - F.col("s")).alias("dup_tokens"),
            )
            .withColumn("batch", F.lit(chunk).cast("long"))
            .select("doc_id", "batch", "n_spans", "dup_tokens")
        )
        out = stats if out is None else out.unionByName(stats)
        fresh = keeper.select("shingle")
        if store is not None:
            fresh = fresh.join(store.select("shingle"), "shingle", "left_anti")
        write_delta(fresh, store_path, mode="append")
        # force this batch's decisions before the store advances (the
        # sequential-replay contract the oracle encodes)
        out = out.localCheckpoint(eager=True)
    return out
