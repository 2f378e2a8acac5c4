"""LLM-data-pipeline operators (SURVEY.md §2.5): deduplication,
similarity search, text analysis, multimodal column plumbing.

Scale design notes (100 TB posture):

* exact dedup — hash-groupBy on ``sha2(text)``: shuffles 32-byte
  digests + doc ids, never the text payload.
* minhash LSH — shingle → minhash signature → band buckets →
  in-bucket pair expansion: candidate pairs only, never the O(n²)
  cross join, and one single pass over the corpus.
* brute-force cosine top-k — broadcast the (small) query set against
  the full corpus; the corpus side streams, nothing shuffles.
* IVF-style ANN — assign each vector to its nearest of K centroid
  buckets, then search only within the probe's bucket: turns top-k
  from O(N) per query into O(N/K).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints at driver side

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from guidewire_spark.functions import text as T
from guidewire_spark.functions import vectors as V
from guidewire_spark.plans.catalog import load_table
from guidewire_spark.plans.scratch import scratch_dir
from guidewire_spark.registry import query


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------

MINHASH_P = 2_147_483_647
MINHASH_N = 32
MINHASH_BANDS = 8


def minhash_signatures(
    d: DataFrame, n_hashes: int = MINHASH_N, seed: int = 42
) -> DataFrame:
    """(doc_id, text) → (doc_id, mh_0..mh_{n-1}) minhash signatures —
    the Arrow-batched ``mapInPandas`` signature stage shared by
    dedup_minhash_lsh and the incremental dedup pipeline (one corpus
    pass, vectorized siphash + one numpy broadcast-min per doc).
    Deterministic for a (seed, n_hashes) pair, so signatures computed
    in different batches/runs are comparable — the property the
    dedup-against-history store depends on."""
    import random

    import numpy as np

    rng = random.Random(seed)
    p = MINHASH_P
    A = np.array([rng.randrange(1, p) for _ in range(n_hashes)], dtype=np.int64)
    B = np.array([rng.randrange(0, p) for _ in range(n_hashes)], dtype=np.int64)

    def sigs(batches):
        # Whole-batch vectorization (guide §4.2): the previous shape
        # looped per DOCUMENT in Python (one hash_array + one
        # broadcast-min per doc — fine math, but ~1 ms of numpy call
        # overhead per doc dominates at thousands of docs/batch).
        # Instead: hash every word of the batch in ONE hash_array
        # call, build shingle hashes on the flat array (masking the
        # positions that straddle a document boundary), and take each
        # document's 32 permutation minima with minimum.reduceat over
        # the doc-segmented value array.  Dropping the old np.unique
        # is value-neutral — min() is dedup-insensitive — and every
        # modular product stays < 2^62 (p = 2^31-1), exact in int64,
        # so signatures are bit-identical to the per-doc shape.
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy()
            docs = [t.split() or [""] for t in pdf["text"]]
            lens = np.fromiter(
                (len(w) for w in docs), dtype=np.int64, count=len(docs)
            )
            flat = np.concatenate(
                [np.asarray(w, dtype=object) for w in docs]
            )
            h = pd.util.hash_array(flat).view(np.int64) % p
            doc_of = np.repeat(np.arange(len(docs)), lens)
            if len(h) >= 3:
                sh_all = ((h[:-2] * 31 + h[1:-1]) % p * 31 + h[2:]) % p
                in_doc = doc_of[:-2] == doc_of[2:]
            else:
                sh_all = np.empty(0, dtype=np.int64)
                in_doc = np.empty(0, dtype=bool)
            small = lens < 3  # <3 words → minhash the word hashes
            vals = np.concatenate([sh_all[in_doc], h[small[doc_of]]])
            seg = np.concatenate(
                [doc_of[:-2][in_doc], doc_of[small[doc_of]]]
            )
            order = np.argsort(seg, kind="stable")
            vals, seg = vals[order], seg[order]
            # every doc contributes ≥1 value (the [""] fallback), so
            # the first-index list aligns 1:1 with the batch's docs
            first = np.unique(seg, return_index=True)[1]
            M = np.empty((len(docs), n_hashes), dtype=np.int64)
            for i in range(n_hashes):
                M[:, i] = np.minimum.reduceat((vals * A[i] + B[i]) % p, first)
            yield pd.DataFrame(
                {"doc_id": ids, **{f"mh_{i}": M[:, i] for i in range(n_hashes)}}
            )

    return d.select("doc_id", "text").mapInPandas(
        sigs, "doc_id long, " + ", ".join(f"mh_{i} long" for i in range(n_hashes))
    )


def band_hashes(
    minhashes: DataFrame,
    n_hashes: int = MINHASH_N,
    n_bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Signature frame → (doc_id, band, bucket) LSH band membership
    (JVM-side ``F.hash`` over each band's rows)."""
    rows_per_band = n_hashes // n_bands
    return minhashes.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(
                        *[
                            F.col(f"mh_{band * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ]
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )


@query(
    "dedup_exact_groups",
    oracle="""
    SELECT sha256(text) AS text_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY sha256(text)
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest doc_id.

    Only (digest, doc_id) pairs cross the shuffle — the text column is
    pruned before the exchange, which is what makes this viable when
    documents average megabytes.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.sha2("text", 256).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


@query(
    "dedup_exact_keep_first",
    oracle="""
    SELECT doc_id FROM (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, survivor-selection form (row_number == 1)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id")
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH shingles AS (
      SELECT DISTINCT doc_id, shingle
      FROM (
        SELECT doc_id,
               array_to_string(words[i : i + 2], ' ') AS shingle
        FROM (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS words
          FROM documents WHERE doc_id < 100
        ), UNNEST(range(1, len(words) - 1)) AS t(i)
        WHERE len(words) >= 3
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both_n
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(both_n / (sa.n + sb.n - both_n), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE both_n / (sa.n + sb.n - both_n) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection via exact 3-word-shingle Jaccard similarity.

    Explode distinct shingles, self-join on shingle to count the
    intersection, then Jaccard = |A∩B| / (|A|+|B|-|A∩B|). The
    shingle join only pairs documents that share at least one shingle
    — the sparse version of the O(n²) similarity matrix.
    """
    # round-11 second pass: guarded fan_out — the single-file sf
    # scan ran the tokenize in ONE task; no-op at real scale
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100))
    shingles = (
        d.where(F.size(T.words(F.col("text"))) >= 3)
        .select("doc_id", F.explode(T.word_shingles(F.col("text"), 3)).alias("shingle"))
        .distinct()
    )
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("both_n"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jacc = F.col("both_n") / (F.col("sa.n") + F.col("sb.n") - F.col("both_n"))
    return (
        inter.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .where(jacc >= 0.2)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


SUBSTRING_K = 5


def substring_occurrences(d: DataFrame, k: int = SUBSTRING_K):
    """(tokens frame, window-occurrence frame) shared by the substring
    dedup family: ``toks`` = (doc_id, words array), ``occ`` = one row
    per k-token window (doc_id, start, shingle).

    Guarded fan-out (plans.catalog.fan_out) before the CPU-heavy
    tokenize+shingle pass: the corpus often arrives as fewer files
    than cores (sf0.1 = ONE parquet file = one scan partition); at
    real scale the scan already has ≥ cores partitions and the
    repartition is skipped."""
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(d)
    toks = d.select("doc_id", T.words(F.col("text")).alias("words"))
    occ = toks.where(F.size("words") >= k).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("words") - k),
                lambda i: F.concat_ws(" ", F.slice(F.col("words"), i + 1, k)),
            )
        ).alias("start", "shingle"),
    )
    return toks, occ


def merge_cut_spans(hits: DataFrame, k: int = SUBSTRING_K) -> DataFrame:
    """(doc_id, start) duplicated windows → maximal merged spans
    (doc_id, island, s, e) via the running-max island pattern: one
    doc_id shuffle, partition-local windows only."""
    w_ord = Window.partitionBy("doc_id").orderBy("start")
    prev_max_end = F.max(F.col("start") + k).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        hits.withColumn(
            "island",
            F.sum(
                F.when(
                    prev_max_end.isNull() | (F.col("start") > prev_max_end), 1
                ).otherwise(0)
            ).over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "island")
        .agg(F.min("start").alias("s"), (F.max("start") + k).alias("e"))
    )


@query(
    "dedup_substring_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS words
      FROM documents
    ),
    occ AS (
      SELECT doc_id, i - 1 AS start,
             array_to_string(words[i : i + 4], ' ') AS shingle
      FROM toks, UNNEST(range(1, len(words) - 3)) AS t(i)
      WHERE len(words) >= 5
    ),
    dup AS (SELECT shingle FROM occ GROUP BY shingle HAVING COUNT(*) >= 2),
    hits AS (SELECT o.doc_id, o.start FROM occ o JOIN dup d USING (shingle)),
    isl AS (
      SELECT doc_id, start,
             SUM(CASE WHEN prev_max_end IS NULL OR start > prev_max_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY start
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM (
        SELECT doc_id, start,
               MAX(start + 5) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max_end
        FROM hits)
    ),
    spans AS (
      SELECT doc_id, island, MIN(start) AS s, MAX(start) + 5 AS e
      FROM isl GROUP BY doc_id, island
    ),
    sizes AS (SELECT doc_id, len(words) AS n_tokens FROM toks)
    SELECT d.doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(e - s) AS BIGINT) AS dup_tokens,
           ANY_VALUE(z.n_tokens) AS n_tokens,
           CAST(ROUND(CAST(SUM(e - s) / CAST(ANY_VALUE(z.n_tokens) AS DOUBLE)
                 AS DECIMAL(24,10)), 6) AS DOUBLE) AS dup_frac
    FROM spans d JOIN sizes z ON d.doc_id = z.doc_id
    GROUP BY d.doc_id
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup (the Lee et al. 2022 'Deduplicating
    Training Data' shape): any 5-token window whose exact text occurs
    ≥2 times anywhere in the corpus marks its span duplicated; per
    document, overlapping/adjacent marked windows are interval-merged
    into maximal spans (the regions a trim pass would cut), and the
    output reports span count, duplicated-token mass, and the
    duplicated fraction per affected document.

    Scale design: one corpus tokenize; window occurrences shuffle once
    on the shingle for the global count (partial-agg groupBy — NOT a
    count-window, so a pathologically hot shingle is a skew-join
    problem AQE can split rather than a single-partition window), then
    hit positions shuffle once on doc_id for the interval merge
    (running-max island pattern, same as ts_intervals_merge). Nothing
    is quadratic: a shingle with c occurrences contributes c rows, not
    c² pairs — the property that distinguishes this from the Jaccard
    pair expansion. At 100 TB the shingle key would be xxhash64-packed
    to 8 bytes before the shuffle; the string key is kept here so the
    DuckDB oracle can verify the pipeline end-to-end."""
    k = SUBSTRING_K
    d = load_table(spark, sf_dir, "documents")
    toks, occ = substring_occurrences(d, k)
    dup = (
        occ.groupBy("shingle")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 2)
        .select("shingle")
    )
    hits = occ.join(dup, "shingle").select("doc_id", "start")
    spans = merge_cut_spans(hits, k)
    sizes = toks.select("doc_id", F.size("words").alias("n_tokens"))
    frac = F.sum(F.col("e") - F.col("s")) / F.first("n_tokens").cast("double")
    return (
        spans.join(sizes, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("e") - F.col("s")).alias("dup_tokens"),
            F.first("n_tokens").alias("n_tokens"),
            F.round(frac.cast("decimal(24,10)"), 6)
            .cast("double")
            .alias("dup_frac"),
        )
    )


@query(
    "dedup_substring_trim",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS words
      FROM documents
    ),
    occ AS (
      SELECT doc_id, i - 1 AS start,
             CAST(doc_id AS BIGINT) * 100000 + (i - 1) AS okey,
             array_to_string(words[i : i + 4], ' ') AS shingle
      FROM toks, UNNEST(range(1, len(words) - 3)) AS t(i)
      WHERE len(words) >= 5
    ),
    keeper AS (
      SELECT shingle, COUNT(*) AS c, MIN(okey) AS keep_key
      FROM occ GROUP BY shingle HAVING COUNT(*) >= 2
    ),
    marked AS (
      SELECT o.doc_id, o.start
      FROM occ o JOIN keeper k USING (shingle)
      WHERE o.okey <> k.keep_key
    ),
    isl AS (
      SELECT doc_id, start,
             SUM(CASE WHEN prev_max_end IS NULL OR start > prev_max_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY start
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM (
        SELECT doc_id, start,
               MAX(start + 5) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max_end
        FROM marked)
    ),
    spans AS (
      SELECT doc_id, island, MIN(start) AS s, MAX(start) + 5 AS e
      FROM isl GROUP BY doc_id, island
    ),
    tokpos AS (
      SELECT doc_id, i - 1 AS pos, words[i] AS tok
      FROM toks, UNNEST(range(1, len(words) + 1)) AS t(i)
    ),
    kept AS (
      SELECT tp.doc_id, tp.pos, tp.tok
      FROM tokpos tp LEFT JOIN spans s
        ON tp.doc_id = s.doc_id AND tp.pos >= s.s AND tp.pos < s.e
      WHERE s.doc_id IS NULL
    )
    SELECT doc_id,
           COUNT(*) AS retained_tokens,
           string_agg(tok, ' ' ORDER BY pos) AS retained_text
    FROM kept GROUP BY doc_id
    """,
)
def dedup_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first substring trim — the materializing half of
    dedup_substring_spans, with the Lee et al. keep-one-copy rule:
    for every duplicated 5-token window, the globally first occurrence
    (min (doc_id, start)) SURVIVES and every later occurrence is cut;
    per document the cut windows interval-merge into maximal spans and
    the retained text is re-assembled from the surviving tokens, so
    the output IS the trimmed corpus (plus a retained-token audit
    count). Documents trimmed to nothing drop out entirely.

    Scale design: the keep-first winner is min(okey) per shingle
    (okey = doc_id·10⁵ + start packs the lexicographic (doc, pos)
    order into one BIGINT so min() IS argmin — no tie-ambiguity for
    the driver to break differently); marked positions then shuffle
    once on doc_id for the interval merge, and reassembly joins token
    positions against the merged spans (equi on doc_id + range
    residual — never a cross join). Text payloads move through
    exactly two narrow shuffles (tokenize→positions,
    group→reassemble); the shingle shuffle carries positions only.

    Round-11 shape: count/min come from ONE window over the
    shingle-partitioned occurrences instead of a partial-agg groupBy
    + join back — that diamond ran the tokenize+shingle projection
    TWICE (occ has no other way to feed both the aggregate and the
    per-row keep test; stage-profiled 2.01 → 1.65 s median at sf0.1).
    Tradeoff, documented deliberately: a single pathologically hot
    shingle is now one window group (a straggler) where the join
    shape let AQE split the probe partition.  The skew-robust
    partial-agg + join reference shape lives on in
    ``dedup_substring_spans``; if a corpus with a boilerplate shingle
    that dominates a partition ever shows up, the escape is a salted
    two-phase aggregate (guide §2.5), not a revert — the double
    tokenize was the measured cost."""
    k = SUBSTRING_K
    d = load_table(spark, sf_dir, "documents")
    toks, occ0 = substring_occurrences(d, k)
    occ = occ0.withColumn(
        "okey", F.col("doc_id").cast("bigint") * 100000 + F.col("start")
    )
    w_sh = Window.partitionBy("shingle")
    marked = (
        occ.withColumn("c", F.count("*").over(w_sh))
        .withColumn("keep_key", F.min("okey").over(w_sh))
        .where((F.col("c") >= 2) & (F.col("okey") != F.col("keep_key")))
        .select("doc_id", "start")
    )
    spans = merge_cut_spans(marked, k)
    tokpos = toks.select(
        "doc_id",
        F.posexplode("words").alias("pos", "tok"),
    )
    cuts = spans.select(
        F.col("doc_id").alias("cut_doc"), "s", "e"
    )
    kept = tokpos.join(
        cuts,
        (tokpos["doc_id"] == cuts["cut_doc"])
        & (tokpos["pos"] >= cuts["s"])
        & (tokpos["pos"] < cuts["e"]),
        "left_anti",
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda x: x["tok"]
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").alias("retained_tokens"),
        F.concat_ws(" ", ordered).alias("retained_text"),
    )


@query("dedup_minhash_lsh")  # engine-hash-dependent → rows-only check
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup candidates.

    shingle → 32 minhash permutations h_i(x) = (a_i*x + b_i) mod p over
    xxhash64 shingle ids → 8 bands × 4 rows → candidate pairs sharing
    any band bucket. Depends on Spark's xxhash64 → no SQL oracle
    (rows-only); the verified Jaccard twin is dedup_ngram_jaccard.

    Scale shape: ONE pass over the corpus. Signatures are computed in
    an Arrow-batched ``mapInPandas`` stage — per batch, all words hash
    through pandas' vectorized siphash (deterministic fixed key), a
    3-word shingle id is the arithmetic combination of three word
    hashes, and all 32 permutation minima come from one numpy
    broadcast-min per document. This was PERF.md's documented escape
    hatch over the JVM ``array_min(transform(...))`` projection;
    re-measured under the bench protocol (codegen warmed, first data
    pass timed) it wins ~25-30% (1.95 s → 1.5 s first pass, 1.3 →
    1.0 s steady), because the 33-column HOF projection's evaluation
    cost exceeds the Arrow transfer. Banding, bucketing and pair
    expansion stay JVM-side: pairs come from groupBy (band, bucket) +
    in-bucket combination expansion instead of a self-join (which
    would re-execute the signature pipeline for both sides); the only
    shuffle carries tiny (band, bucket, doc_id) rows.
    """
    # The documents table arrives as one small parquet file = one scan
    # partition; fan out before the (CPU-heavy) shingling stage so it
    # uses every core.  Guard the fan-out: repartition always moves
    # every row, so at real scale — where the scan already has ≥ cores
    # partitions — an unconditional repartition would be a full shuffle
    # of raw corpus text for nothing.
    d = load_table(spark, sf_dir, "documents")
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(d)

    minhashes = minhash_signatures(d)
    bands_long = band_hashes(minhashes)
    return bucket_pair_expansion(bands_long)


def bucket_pair_expansion(bands_long: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) membership → DISTINCT candidate pairs
    (doc_a < doc_b) sharing any band bucket — the LSH candidate stage
    shared by ``dedup_minhash_lsh`` and its hash-verified sibling
    ``dedup_minhash_verified``.

    Pairs come from groupBy (band, bucket) + in-bucket combination
    expansion instead of a self-join, so the signature pipeline is
    executed once and the only shuffle carries (band, bucket, doc_id)
    rows.  Bucket population is LSH-bounded (a bucket collects only
    near-identical signatures), so the per-group expansion is small;
    a skewed degenerate bucket would be the place to salt."""
    buckets = (
        bands_long.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("pr")
    )
    return pairs.select("pr.doc_a", "pr.doc_b").distinct()


def _md5_int(col) -> "F.Column":
    """Cross-engine-exact 60-bit integer hash: the first 15 hex digits
    of md5 parsed as an integer.  MD5 is standardized, so Spark's
    ``conv(substr(md5(s),1,15),16,10)`` and DuckDB's
    ``cast('0x'||substr(md5(s),1,15) as bigint)`` agree digit-for-digit
    (verified on ASCII and multi-byte UTF-8) — the trick that lets the
    minhash/simhash machinery be value-verified end-to-end without
    depending on an engine-internal hash like xxhash64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# 16 fixed universal-hash permutations h_i(x) = (a_i*x + b_i) mod p for
# the hash-verified minhash row.  Literals (not runtime-seeded) so the
# DuckDB oracle below embeds the exact same constants.  a_i, b_i < p
# and x < p keep a_i*x + b_i < 2^62 — exact in BIGINT in both engines.
_MHV_AB = [
    (1203911, 402811), (2402731, 900001), (3500177, 117721), (4700081, 222527),
    (5800039, 330103), (6900077, 444089), (8100059, 550067), (9200021, 666013),
    (10400219, 770027), (11500033, 880099), (12700121, 990031), (13800253, 101111),
    (15000017, 202213), (16100143, 303323), (17300099, 404431), (18400067, 505547),
]
_MHV_BANDS, _MHV_ROWS = 4, 4


def minhash_signatures_verified(d: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, m0..m15) minhash signatures over the
    cross-engine-exact md5-int shingle id and the 16 literal
    permutations in ``_MHV_AB`` — the signature stage of the
    hash-verified minhash rows (batch + incremental).  Entirely
    JVM-side expressions; docs with < 3 words have no shingles and
    drop out (both engines agree).  Guarded fan-out before the
    CPU-heavy md5+shingle projection (see plans.catalog.fan_out)."""
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(d)
    p = F.lit(MINHASH_P)
    sh = (
        d.where(F.size(T.words(F.col("text"))) >= 3)
        .select(
            "doc_id",
            F.explode(T.word_shingles(F.col("text"), 3)).alias("shingle"),
        )
        .distinct()
        .select("doc_id", (_md5_int(F.col("shingle")) % p).alias("x"))
    )
    return sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % p).alias(f"m{i}")
            for i, (a, b) in enumerate(_MHV_AB)
        ]
    )


def band_buckets_arith(sigs: DataFrame) -> DataFrame:
    """Signature frame (m0..m15) → (doc_id, band, bucket) with the
    bucket as a mod-p 31-fold of each band's 4 minima — pure integer
    arithmetic, so a SQL oracle reproduces the buckets exactly
    (unlike ``band_hashes``' engine-internal ``F.hash``)."""
    p = F.lit(MINHASH_P)

    def bucket(band: int) -> "F.Column":
        e = F.lit(0).cast("bigint")
        for r in range(_MHV_ROWS):
            e = (e * 31 + F.col(f"m{band * _MHV_ROWS + r}")) % p
        return e

    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[bucket(b) for b in range(_MHV_BANDS)])
        ).alias("band", "bucket"),
    )


def _mhv_bucket_sql(band: int) -> str:
    """DuckDB expression for band ``band``'s bucket: the mod-p 31-fold
    of its 4 signature minima (same arithmetic as the Spark side)."""
    e = "0"
    for r in range(_MHV_ROWS):
        e = f"(({e}) * 31 + m{band * _MHV_ROWS + r}) % {MINHASH_P}"
    return e


def mhv_sigs_bands_sql(source: str = "documents") -> str:
    """Shared oracle CTE block for the md5-int minhash scheme —
    ``shingles`` / ``sigs`` / ``bands`` over ``source`` (a table or
    CTE with doc_id + text) — used by both dedup_minhash_verified and
    dedup_incremental_minhash_verified so the SQL can never drift
    from the shared Spark stages it mirrors
    (minhash_signatures_verified / band_buckets_arith)."""
    mins = ", ".join(
        f"MIN(({a} * x + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(_MHV_AB)
    )
    buckets = ", ".join(_mhv_bucket_sql(b) for b in range(_MHV_BANDS))
    return f"""
    shingles AS (
      SELECT DISTINCT doc_id,
             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT)
               % {MINHASH_P} AS x
      FROM (
        SELECT doc_id, array_to_string(words[i : i + 2], ' ') AS shingle
        FROM (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             w -> w <> '') AS words
          FROM {source}
        ), UNNEST(range(1, len(words) - 1)) AS t(i)
        WHERE len(words) >= 3
      )
    ),
    sigs AS (
      SELECT doc_id, {mins}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, i - 1 AS band, bks[i] AS bucket
      FROM (
        SELECT doc_id, [{buckets}] AS bks
        FROM sigs
      ), UNNEST(range(1, {_MHV_BANDS + 1})) AS t(i)
    )"""


@query(
    "dedup_minhash_verified",
    oracle=f"""
    WITH {mhv_sigs_bands_sql("documents")}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding, hash-verified end-to-end.

    The same pipeline shape as ``dedup_minhash_lsh`` (3-word shingles →
    permutation minima → band buckets → in-bucket pair expansion via
    the SAME ``bucket_pair_expansion`` code path), but the shingle id
    is a cross-engine-exact md5-derived integer instead of xxhash64,
    and the 16 universal-hash permutations are fixed literals — so the
    DuckDB oracle reproduces every signature, bucket, and candidate
    pair digit-for-digit.  This is the fullprobe trick applied to the
    minhash family (cf. similarity_ann_ivf_fullprobe): any defect in
    permutation arithmetic, banding layout, bucket grouping, or pair
    expansion breaks the hash, so the production xxhash64 row inherits
    verified machinery and keeps only the (unverifiable) engine hash.

    Scale shape: identical to the production row — one corpus pass,
    signatures reduce through a map-side-combined groupBy MIN on
    (doc_id), then only (band, bucket, doc_id) rows shuffle.  The md5
    expression is JVM-side (whole-stage codegen), so there is no
    Python in the hot path at all here.
    """
    d = load_table(spark, sf_dir, "documents")
    return bucket_pair_expansion(
        band_buckets_arith(minhash_signatures_verified(d))
    )


@query("dedup_simhash")  # engine-hash-dependent → rows-only check
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document from word-level xxhash64.

    For each of 64 bit positions, sum ±1 across token hashes and take
    the sign. Entirely JVM-side: explode → bitwise ops → groupBy.
    Hamming-close signatures ⇒ near-dups. xxhash64-dependent →
    rows-only check.  Guarded ``fan_out`` before the tokenize + 64-bit
    vote projection (round-11 second pass): the single-file sf scan
    ran it in ONE task; no-op at real scale.
    """
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"))
    tokens = d.select(
        "doc_id", F.explode(F.array_distinct(T.words(F.col("text")))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    # bit 63 packs as -(2^63): xxhash64 is signed, so the full 64-bit
    # signature needs the two's-complement top-bit weight
    weights = [2**i if i < 63 else -(2**63) for i in range(64)]
    return _simhash_pack(tokens, weights).orderBy("doc_id")


def _simhash_pack(tokens: DataFrame, weights: list[int]) -> DataFrame:
    """(doc_id, h) token-hash frame → (doc_id, simhash): per-bit ±1
    votes (shiftright/bitwiseAND), one map-side-combined groupBy of
    the vote sums, sign packing with the given per-bit weights — the
    SimHash bit machinery shared by dedup_simhash (64-bit xxhash64,
    top-bit two's-complement weight) and dedup_simhash_verified
    (60-bit md5-int, plain non-negative weights), so the two rows
    cannot drift."""
    n_bits = len(weights)
    bits = tokens.select(
        "doc_id",
        *[
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{i}")
            for i in range(n_bits)
        ],
    )
    sums = bits.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"s{i}") for i in range(n_bits)]
    )
    return sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"s{i}") > 0, F.lit(1).cast("bigint")).otherwise(0)
                * F.lit(w).cast("bigint")
                for i, w in enumerate(weights)
            ],
            F.lit(0).cast("bigint"),
        ).alias("simhash"),
    )


_SIMHASH_V_BITS = 60  # md5-int is 60 bits (15 hex digits)


@query(
    "dedup_simhash_verified",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\\s+'),
                                  w -> w <> '')) AS tok
        FROM documents
      )
    ),
    h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
      FROM toks
    ),
    bits AS (
      SELECT doc_id, i AS bit,
             SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h, UNNEST(range(0, {_SIMHASH_V_BITS})) AS t(i)
      GROUP BY doc_id, i
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0
                         THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash, hash-verified end-to-end.

    The same shape as ``dedup_simhash`` (distinct word tokens →
    per-bit ±1 votes → sign → packed signature) with the word hash
    swapped from xxhash64 to the cross-engine-exact md5-derived 60-bit
    integer (see ``_md5_int``) — so the DuckDB oracle reproduces every
    bit vote, every sign, and the packed signature exactly.  60 bits
    (not 64) because 15 hex digits parse to a non-negative 60-bit
    value in both engines, which keeps the packing sum inside BIGINT
    without the two's-complement top-bit trick the production row
    needs.  Verifies the family's bit machinery (shiftright /
    bitwiseAND votes, per-bit sums, sign packing); the production row
    keeps only the engine hash unverified.

    Scale shape: explode distinct tokens, one JVM-side projection of
    60 vote columns, one map-side-combined groupBy — a single corpus
    pass, no Python, no self-join.  Guarded ``fan_out`` before the
    tokenize + vote projection (round-11 second pass, same single-task
    finding as the production row).
    """
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"))
    tokens = d.select(
        "doc_id", F.explode(F.array_distinct(T.words(F.col("text")))).alias("tok")
    ).withColumn("h", _md5_int(F.col("tok")))
    return _simhash_pack(tokens, [2**i for i in range(_SIMHASH_V_BITS)])


def _hyperplane_bucket_udf(n_bands: int, bits: int, dim: int, seed: int = 7):
    """Arrow-batched UDF: ``n_bands`` LSH bucket ids per unit vector —
    sign bits of ``U @ H.T`` against ``n_bands × bits`` seeded random
    hyperplanes, packed to ints via one numpy matmul per batch."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    hyper = np.random.RandomState(seed).standard_normal((n_bands * bits, dim))
    packer = 1 << np.arange(bits, dtype=np.int64)

    @pandas_udf("array<long>")
    def band_buckets(u: pd.Series) -> pd.Series:
        mat = np.stack(u.to_numpy())  # (n, dim)
        signs = (mat @ hyper.T) > 0  # (n, n_bands*bits)
        b = signs.reshape(len(mat), n_bands, bits) @ packer  # (n, n_bands)
        return pd.Series(list(b))

    return band_buckets


def _int_hyperplane_bucket_udf(
    n_bands: int = 8, bits: int = 8, dim: int = 64
):
    """Integer twin of ``_hyperplane_bucket_udf`` for the hash-verified
    embedding rows: hyperplane entries come from a fixed integer LCG
    formula h(p,i) = ((1103515245·(p·dim+i) + 12345) mod 65536) − 32768
    instead of seeded Gaussian floats, and the input vectors are
    int64-quantized — so the sign bits are exact int64 arithmetic a
    SQL oracle regenerates from the same formula (no numpy float
    matmul order to model).  Same Arrow batch shape and packing as the
    production UDF."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    idx = np.arange(n_bands * bits * dim, dtype=np.int64)
    hyper = ((1103515245 * idx + 12345) % 65536 - 32768).reshape(
        n_bands * bits, dim
    )
    packer = 1 << np.arange(bits, dtype=np.int64)

    @pandas_udf("array<long>")
    def band_buckets(qu: pd.Series) -> pd.Series:
        mat = np.stack(qu.to_numpy()).astype(np.int64)  # (n, dim)
        signs = (mat @ hyper.T) > 0  # exact: int64 dots
        b = signs.reshape(len(mat), n_bands, bits) @ packer
        return pd.Series(list(b))

    return band_buckets


def embedding_near_dup_pairs(
    unit_vectors: DataFrame,
    threshold: float = 0.95,
    n_bands: int = 32,
    bits: int = 12,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH near-dup pairs over (vec_id, u) unit vectors.

    Scale shape — LSH bucketing, NOT an all-pairs join:

    1. One Arrow-batched pandas UDF computes ``n_bands`` band-bucket ids
       per vector (sign bits of ``U @ H.T`` against seeded hyperplanes,
       packed to ints — a single numpy matmul per batch).
    2. Candidate pairs come from groupBy (band, bucket) + in-bucket
       combination expansion (same machinery as minhash LSH); only
       (band, bucket, vec_id) rows shuffle, never vectors.
    3. Candidates are verified with the exact fused dot product after
       joining unit vectors back by vec_id — two hash joins sized by
       the candidate count, not the corpus square.

    For cosine ≥ 0.95 the per-bit agreement probability is
    1 − arccos(.95)/π ≈ .899, so a qualifying pair misses all 32 bands
    with probability (1 − .899¹²)³² ≈ 3e-5, and the seeded hyperplanes
    make the outcome deterministic.  Recall is locked by a planted-dup
    pytest (tests/test_llm_quality.py); engine parity by the all-pairs
    DuckDB oracle twin.
    """
    band_buckets = _hyperplane_bucket_udf(n_bands, bits, dim)
    e = unit_vectors
    buckets = (
        e.select("vec_id", F.posexplode(band_buckets("u")).alias("band", "bucket"))
        .groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("vec_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    cand = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                            lambda y: F.struct(x.alias("vec_a"), y.alias("vec_b")),
                        ),
                    )
                )
            ).alias("pr")
        )
        .select("pr.vec_a", "pr.vec_b")
        .distinct()
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("u").alias("ua"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("u").alias("ub"))
    sim = V.dot(F.col("ua"), F.col("ub"))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .where(sim >= threshold)
        .select("vec_a", "vec_b", F.round(sim, 4).alias("cos_sim"))
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH unit AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
      FROM embeddings WHERE vec_id < 100
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_sum(list_transform(range(1, 65),
                 i -> a.u[i] * b.u[i])), 4) AS cos_sim
    FROM unit a JOIN unit b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, 65), i -> a.u[i] * b.u[i])) >= 0.95
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.95 on unit vectors, via
    random-hyperplane LSH (see ``embedding_near_dup_pairs``).

    The ``vec_id < 100`` cap only mirrors the all-pairs oracle twin;
    the same plan runs uncapped at corpus scale, where bucket fan-in
    replaces the O(n²) pair space.  This corpus contains no pair above
    0.95 (max observed cosine ≈ 0.6), so both engines agree on the
    empty set; positive-recall is locked by the planted-dup pytest.
    """
    e = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 100)
        .select("vec_id", V.normalize(F.col("embedding")).alias("u"))
    )
    return embedding_near_dup_pairs(e)


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


@query(
    "similarity_topk_bruteforce",
    oracle="""
    WITH unit AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(range(1, 65),
                   i -> q.u[i] * c.u[i])), 4) AS cos_sim
      FROM unit q JOIN unit c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for 10 query vectors.

    The query set is broadcast; the corpus streams through one fused
    dot-product projection + per-query top-k window. Ranking uses the
    ROUNDED similarity with neighbor_id tiebreak so the result set is
    float-order independent.
    """
    from guidewire_spark.plans.catalog import fan_out

    d = load_table(spark, sf_dir, "embeddings")
    # corpus side: guarded fan-out before the normalize projection —
    # the single-file sf scan otherwise funnels scan+normalize+score
    # through ONE task (stage-profiled: 0.91 s of the 1.5 s wall);
    # no-op at real scale where the scan has ≥ cores partitions
    e = fan_out(d).select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    # query side: derived from the RAW scan, not the fanned frame, so
    # the vec_id < 10 predicate pushes into the parquet scan and the
    # 10-row broadcast build never waits on the corpus repartition
    q = d.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        V.normalize(F.col("embedding")).alias("qu"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.dot(F.col("qu"), F.col("u")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@query(
    "retrieval_ndcg_mrr",
    oracle="""
    WITH unit AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, label AS q_label, u AS qu
          FROM unit WHERE vec_id < 20),
    c AS (SELECT vec_id, label, u FROM unit WHERE vec_id >= 20),
    scored AS (
      SELECT q.query_id, q.q_label, c.vec_id, c.label,
             ROUND(list_sum(list_transform(range(1, 65),
                   i -> q.qu[i] * c.u[i])), 4) AS cos_sim
      FROM q JOIN c ON TRUE
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored
    ),
    top AS (
      SELECT query_id, q_label, rnk,
             CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel,
             CAST(ROUND(CAST(1.0 / log2(rnk + 1) AS DECIMAL(26,16)), 12)
                  AS DECIMAL(18,12)) AS disc
      FROM ranked WHERE rnk <= 10
    ),
    agg AS (
      SELECT query_id, ANY_VALUE(q_label) AS q_label,
             SUM(rel) AS hits,
             SUM(CASE WHEN rel = 1 THEN disc
                      ELSE CAST(0 AS DECIMAL(18,12)) END) AS dcg,
             MAX(CASE WHEN rel = 1 THEN 1.0 / rnk ELSE 0.0 END) AS mrr_raw
      FROM top GROUP BY query_id
    ),
    totals AS (SELECT label, COUNT(*) AS label_total FROM c GROUP BY label)
    SELECT a.query_id,
           CAST(a.hits AS BIGINT) AS hits,
           CAST(t.label_total AS BIGINT) AS label_total,
           CAST(ROUND(CAST(CASE WHEN a.hits > 0 THEN
                 CAST(a.dcg AS DOUBLE) /
                 CAST(COALESCE(list_sum(list_transform(
                      range(1, CAST(a.hits + 1 AS BIGINT)),
                      i -> CAST(ROUND(CAST(1.0 / log2(i + 1)
                             AS DECIMAL(26,16)), 12) AS DECIMAL(18,12)))),
                      CAST(0 AS DECIMAL(18,12))) AS DOUBLE)
                 ELSE 0.0 END AS DECIMAL(24,10)), 6) AS DOUBLE) AS ndcg10,
           CAST(ROUND(CAST(a.mrr_raw AS DECIMAL(24,10)), 6) AS DOUBLE)
             AS mrr10
    FROM agg a JOIN totals t ON t.label = a.q_label
    """,
)
def retrieval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation — nDCG@10 and MRR@10 per query, with
    label-match relevance: 20 query vectors retrieve top-10 exact
    cosine neighbors from the rest of the corpus; a neighbor sharing
    the query's label is relevant. The metric every embedding-model /
    ANN-tuning loop optimizes, computed exactly.

    Determinism discipline: ranks order by the ROUNDED similarity
    with vec_id tiebreak (float-order independent, same as
    similarity_topk_bruteforce), and DCG terms quantize to
    DECIMAL(18,12) BEFORE summing — a plain double SUM's
    partition-order ulp noise is exactly the class the layout gate
    exists to catch. Scale shape: query side broadcast, corpus
    streams once; per-query state is 10 rows."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", V.normalize(F.col("embedding")).alias("u")
    )
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("u").alias("qu"),
    )
    c = e.where(F.col("vec_id") >= 20)
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "q_label",
        "vec_id",
        "label",
        F.round(V.dot(F.col("qu"), F.col("u")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    rel = F.when(F.col("label") == F.col("q_label"), 1).otherwise(0)
    disc = (
        F.round(
            (F.lit(1.0) / F.log2(F.col("rnk") + 1)).cast("decimal(26,16)"),
            12,
        ).cast("decimal(18,12)")
    )
    top = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .withColumn("rel", rel)
        .withColumn("disc", disc)
    )
    zero_dec = F.lit(0).cast("decimal(18,12)")
    agg = top.groupBy("query_id").agg(
        F.first("q_label").alias("q_label"),
        F.sum("rel").cast("long").alias("hits"),
        F.sum(F.when(F.col("rel") == 1, F.col("disc")).otherwise(zero_dec))
        .alias("dcg"),
        F.max(
            F.when(F.col("rel") == 1, F.lit(1.0) / F.col("rnk")).otherwise(0.0)
        ).alias("mrr_raw"),
    )
    totals = c.groupBy("label").agg(F.count("*").alias("label_total"))
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.col("hits").cast("int")),
        zero_dec,
        lambda acc, i: (
            acc
            + F.round(
                (F.lit(1.0) / F.log2(i + 1)).cast("decimal(26,16)"), 12
            ).cast("decimal(18,12)")
        ).cast("decimal(18,12)"),
    )
    ndcg = F.when(
        F.col("hits") > 0,
        F.col("dcg").cast("double") / idcg.cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        agg.join(F.broadcast(totals), agg.q_label == totals.label)
        .select(
            "query_id",
            "hits",
            F.col("label_total").cast("long").alias("label_total"),
            F.round(ndcg.cast("decimal(24,10)"), 6)
            .cast("double")
            .alias("ndcg10"),
            F.round(F.col("mrr_raw").cast("decimal(24,10)"), 6)
            .cast("double")
            .alias("mrr10"),
        )
    )


def _ivf_assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: each point keeps its best cell
    (deterministic tie-break on lowest cent_id).  Output:
    (vec_id, u, cell).

    The centroid table is k-sized by construction, so it collapses to
    ONE row carrying the whole centroid set as an array column, which
    broadcast-crossJoins onto the points (every row references the
    same broadcast array — no literal blow-up in the plan).  The
    argmax is then a single projection: transform each centroid to a
    (sim, -cent_id) struct and take ``array_max`` — NO k×N join
    output, NO shuffle, NO per-vector window.  The previous shape
    (broadcast join to k rows + row_number window partitioned by
    vec_id) shuffled k×N rows with the 64-double vector payload
    through every assignment — three times per IVF pipeline (two
    Lloyd rounds + the final build); this rewrite removes all three
    exchanges, making assignment the embarrassingly parallel map work
    a k-means assignment should be.  Tie-break semantics are
    identical: struct comparison orders by sim first then -cent_id,
    so an exact double tie still picks the lowest cent_id; the
    (sim, -cent_id) pairs are unique per centroid, so the max is
    insensitive to collect_list's arrival order."""
    carr = centroids.agg(
        F.collect_list(F.struct("cent_id", "cu")).alias("cents")
    )
    best = F.array_max(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                V.dot(F.col("u"), c["cu"]).alias("sim"),
                (-c["cent_id"]).cast("long").alias("negc"),
            ),
        )
    )
    return points.crossJoin(F.broadcast(carr)).select(
        "vec_id", "u", (-best["negc"]).cast("long").alias("cell")
    )


def _ivf_centroids(
    spark: SparkSession, e: DataFrame, cache_key: tuple | None = None
) -> DataFrame:
    """Coarse quantizer training: 8 deterministic seeds (vec_id % 64
    == 0) refined with TWO Lloyd iterations in pure DataFrame math;
    each round's 8x64-double centroid table is collected so the next
    assignment's plan doesn't re-execute the previous round's corpus
    pass.  Returns the (cent_id, cu) centroid DataFrame.

    ``cache_key`` (a corpus fingerprint) memoizes the COLLECTED 8x64
    table via plans.artifact_cache — the coarse quantizer is a
    k-sized deterministic artifact of the corpus, trained once per
    corpus snapshot in production; repeated query invocations in one
    session apply the cached table instead of re-running two Lloyd
    corpus passes.  Callers training on a SUBSET (e.g. the
    incremental query's first-batch slice) must put a subset marker
    in the key so it never collides with full-corpus centroids."""
    from guidewire_spark.plans.artifact_cache import get_or_train

    def train() -> list:
        cents = (
            e.where(F.col("vec_id") % 64 == 0)
            .select(F.col("vec_id").alias("cent_id"), F.col("u").alias("cu"))
            # order before limit: a bare limit(8) takes the first 8 in
            # PARTITION order, which changes when the corpus is fanned
            # out across cores; TakeOrdered picks the 8 smallest
            # vec_ids under any layout (identical to the old file-order
            # pick on id-sorted corpora, and layout-independent always)
            .orderBy("cent_id")
            .limit(8)
        )
        refined = cents
        rows = None
        for _ in range(2):
            assigned = _ivf_assign(e, refined)
            dims = assigned.select(
                "cell", F.posexplode(F.col("u")).alias("dim", "val")
            )
            refined_df = (
                dims.groupBy("cell", "dim")
                .agg(F.avg("val").alias("m"))
                .groupBy("cell")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "m"))),
                        lambda s: s["m"],
                    ).alias("mean_vec")
                )
                .select(
                    F.col("cell").alias("cent_id"),
                    V.normalize(F.col("mean_vec")).alias("cu"),
                )
            )
            rows = [(r["cent_id"], list(r["cu"])) for r in refined_df.collect()]
            refined = local_df(
                spark, rows, "cent_id long, cu array<double>"
            )
        return rows

    from guidewire_spark.plans.catalog import local_df

    rows = get_or_train("ivf_centroids_8x2lloyd", cache_key, train)
    # local_df (LocalTableScan): the pickle-RDD path spawned 32-task
    # Python micro-stages for every aggregate/broadcast over this
    # 8-row table — pure worker round-trip overhead, ~0.7 s/query
    # (stage-profiled; see plans.catalog.local_df)
    return local_df(spark, rows, "cent_id long, cu array<double>")


def _ivf_probe_topk(
    cells: DataFrame, centroids: DataFrame, q_pts: DataFrame, n_probe: int
) -> DataFrame:
    """Multi-probe search over an inverted-list table: queries pick
    their top-``n_probe`` cells against the broadcast centroids, then
    score only vectors living in probed cells; per-query top-5 on the
    4-dp-rounded similarity with neighbor_id tie-break."""
    q_scored = q_pts.join(F.broadcast(centroids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("u").alias("qu"),
        F.col("cent_id").alias("cell"),
        V.dot(F.col("u"), F.col("cu")).alias("sim"),
    )
    wq_probe = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cell")
    )
    queries = (
        q_scored.withColumn("rn", F.row_number().over(wq_probe))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qu", "cell")
    )
    scored = (
        cells.join(F.broadcast(queries), on="cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.dot(F.col("qu"), F.col("u")), 4).alias("cos_sim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def _ivf_topk(spark: SparkSession, sf_dir: str, n_probe: int) -> DataFrame:
    """IVF approximate-nearest-neighbor pipeline, parameterized by
    n_probe (shared by the rows-only n_probe=3 production shape and
    the hash-verified full-probe twin).

    Coarse quantizer: 8 centroids seeded deterministically from the
    corpus and refined with TWO Lloyd iterations in pure DataFrame
    math (see _ivf_centroids). Each vector joins its nearest centroid
    (the inverted list, _ivf_assign); queries probe their top-n_probe
    cells (_ivf_probe_topk), searching ~n_probe/8 of the corpus (at
    100 TB: n_probe/n_cells of it; each Lloyd step's final shuffle is
    (cells x dims) rows — centroid-sized, not corpus-sized, after
    partial aggregation). Measured recall@5 at n_probe=3: 0.66 @
    sf0.001 / 0.74 @ sf0.01.
    """
    from guidewire_spark.plans.catalog import fan_out

    # Guarded fan-out BEFORE the normalize projection: the sf corpus
    # is one parquet file = one scan partition, so without it the
    # normalize+materialize stage — and every downstream per-vector
    # stage that reads the checkpoint (assignment argmax, probe
    # scoring) — runs on a single core (stage-profiled: 1.09 s of the
    # query's 3.1 s wall in ONE task).  At real scale the scan already
    # carries ≥ cores partitions and fan_out is a no-op (guide §2).
    raw = load_table(spark, sf_dir, "embeddings")
    e = fan_out(raw).select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    from guidewire_spark.plans.artifact_cache import corpus_fingerprint, has

    cache_key = corpus_fingerprint(sf_dir, "embeddings")
    if not has("ivf_centroids_8x2lloyd", cache_key):
        # COLD path: the corpus feeds ~5 separate training jobs (seed
        # collect, two Lloyd rounds, the inverted-list build) —
        # materialize the normalized vectors ONCE instead of re-running
        # scan+normalize per job.  This is the standard k-means cache;
        # at cluster scale the same role is played by
        # .persist(DISK_ONLY) before the Lloyd loop, sized at
        # 8 doubles/dim × N — far smaller than the raw table when
        # embeddings ride along wide rows.  WARM path (centroids
        # memoized for this corpus fingerprint): exactly one job reads
        # the corpus, so the checkpoint materialization would be pure
        # overhead — skip it (round-11; one job fewer per invocation).
        e = e.localCheckpoint(eager=True)
    refined = _ivf_centroids(spark, e, cache_key=cache_key)
    cells = _ivf_assign(e, refined)
    # query side from the RAW scan so vec_id < 10 pushes into parquet
    # and the 10-row extraction never waits on the corpus fan-out
    q_pts = raw.where(F.col("vec_id") < 10).select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    return _ivf_probe_topk(cells, refined, q_pts, n_probe)


@query("similarity_ann_ivf")  # cell boundaries are approximation → rows-only
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN at the production setting (n_probe=3 of 8 cells —
    recall@5 0.66 @ sf0.001 / 0.74 @ sf0.01, recall-gated in pytest).
    Rows-only by nature: which candidates fall inside the probed 3/8
    of the corpus is an approximation detail.  The MACHINERY is
    value-verified by similarity_ann_ivf_fullprobe below."""
    return _ivf_topk(spark, sf_dir, n_probe=3)


@query(
    "similarity_ann_ivf_fullprobe",
    oracle="""
    WITH unit AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(range(1, 65),
                   i -> q.u[i] * c.u[i])), 4) AS cos_sim
      FROM unit q JOIN unit c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def similarity_ann_ivf_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN family's VALUE-VERIFIED driver row (round-8, after
    similarity_ann_ivfpq burned a window slot on `no_oracle`): the
    SAME IVF pipeline — deterministic seeding, two Lloyd iterations,
    inverted-list build, multi-probe, per-query top-k — run with
    n_probe = n_cells.  Probing every cell makes IVF provably exact
    (each corpus vector lives in exactly one cell, so the candidate
    union is the whole corpus minus self), so the result must equal
    the brute-force cosine top-5 oracle digit for digit.  Any defect
    in the machinery — a vector dropped from its inverted list, a
    mis-assigned cell, a probe-union duplicate — breaks the hash,
    giving the driver a real value check on the pipeline the
    approximate settings share."""
    return _ivf_topk(spark, sf_dir, n_probe=8)


@query(
    "similarity_ann_ivf_incremental",
    oracle="""
    WITH unit AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(range(1, 65),
                   i -> q.u[i] * c.u[i])), 4) AS cos_sim
      FROM unit q JOIN unit c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def similarity_ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL IVF index maintenance — the ANN shape a live corpus
    needs: centroids train ONCE on the first arrival batch, later
    batches assign against those FIXED centroids and APPEND their
    inverted-list rows to a Delta index table (one commit per batch,
    asserted), and search runs against the stored index — never
    against raw embeddings.  Per-batch maintenance cost is that
    batch's vectors only (assign = one broadcast join; append = one
    commit); nothing is retrained or rebuilt, which is what makes IVF
    viable under continuous ingest at 100 TB.

    Value verification: the search probes ALL cells, which makes IVF
    provably exact (similarity_ann_ivf_fullprobe's argument), so the
    result must equal the brute-force top-5 over EVERY vector that
    has arrived — digit for digit through the Delta round-trip.  A
    vector dropped by an append, a mis-assigned cell, or an index row
    corrupted in storage breaks the hash.  The production n_probe<8
    search over the same stored index inherits the verified plumbing.
    """

    from guidewire_spark.sources.deltalog import list_versions
    from guidewire_spark.sources.snapshot import read_delta
    from guidewire_spark.sources.writer import write_delta

    from guidewire_spark.plans.catalog import fan_out

    # guarded fan-out before normalize, same rationale as _ivf_topk:
    # parallelize the materialize and every per-vector stage reading it
    e = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    # same k-means cache as _ivf_topk: the corpus feeds the centroid
    # training jobs plus one assignment job per arrival batch
    e = e.localCheckpoint(eager=True)
    # centroids from the FIRST arrivals only — later batches must not
    # perturb them, or stored assignments would go stale.  The trained
    # table is a deterministic k-sized artifact of the corpus snapshot
    # (first-batch subset), so it memoizes per corpus fingerprint like
    # the other trained artifacts (round-11; the key carries a marker
    # so it can never collide with the full-corpus centroid cache the
    # fullprobe family trains — different training subset).
    from guidewire_spark.plans.artifact_cache import corpus_fingerprint

    cents = _ivf_centroids(
        spark,
        e.where(F.col("vec_id") % 3 == 0),
        cache_key=corpus_fingerprint(sf_dir, "embeddings")
        + ("ivfinc_first_batch_mod3",),
    )
    index = scratch_dir("gw_ivfinc_") + "/index"
    for b in range(3):
        batch = e.where(F.col("vec_id") % 3 == b)
        write_delta(
            _ivf_assign(batch, cents).select("vec_id", "cell", "u"),
            index,
            mode="append",
        )
    if len(list_versions(index)) != 3:
        raise AssertionError("expected one index commit per arrival batch")
    stored = read_delta(spark, index)
    n_vecs = e.count()
    if stored.count() != n_vecs:
        raise AssertionError("index row count != arrived vectors")
    q_pts = stored.where(F.col("vec_id") < 10).select("vec_id", "u")
    return _ivf_probe_topk(
        stored.select("vec_id", "u", "cell"), cents, q_pts, n_probe=8
    )


@query("similarity_ann_lsh")  # hyperplane-hash-dependent → rows-only
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbor (the second scale path
    next to IVF): corpus and query vectors hash into 16 bands × 5-bit
    random-hyperplane buckets; a query's candidates are corpus vectors
    sharing ANY band bucket, rescored exactly and top-5'd.

    Scale shape: the (band, bucket) equi-join replaces the O(N·Q)
    score-everything pass — only (band, bucket, id) rows shuffle, and
    the candidate set is ~40 % of the corpus per query at this band
    config (measured sweep: 16×5 → recall 0.82/0.86 @ 40 %; 24×6 →
    0.82/0.64 @ 31 %; 32×7 → 0.70/0.52 @ 23 % — tune bits/bands for
    the tightness-vs-recall trade). Exact vectors join back by id for
    rescoring, sized by the candidate count. Unlike IVF there is no
    training pass, and recall degrades gracefully for
    out-of-distribution queries.
    """
    band_buckets = _hyperplane_bucket_udf(n_bands=16, bits=5, dim=64)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    return _lsh_topk(e, band_buckets, hash_col="u")


def _lsh_topk(e: DataFrame, band_buckets, hash_col: str) -> DataFrame:
    """The LSH ANN pipeline body shared by similarity_ann_lsh and its
    hash-verified sibling (so they cannot drift): band-bucket the
    corpus and the <10 query vectors through ``band_buckets`` over
    ``hash_col``, equi-join buckets for candidates, rescore
    candidates exactly on the unit vectors (column ``u``), and take
    the per-query top-5 on the 4-dp-rounded similarity."""
    corpus_b = e.select(
        "vec_id", F.posexplode(band_buckets(hash_col)).alias("band", "bucket")
    )
    q = e.where(F.col("vec_id") < 10)
    query_b = q.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(band_buckets(hash_col)).alias("band", "bucket"),
    )
    cand = (
        corpus_b.join(F.broadcast(query_b), ["band", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qv = q.select(F.col("vec_id").alias("query_id"), F.col("u").alias("qu"))
    cv = e.select(F.col("vec_id").alias("neighbor_id"), F.col("u").alias("u"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(V.dot(F.col("qu"), F.col("u")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@query(
    "similarity_ann_lsh_verified",
    oracle="""
    WITH unit AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS fu
      FROM embeddings
    ),
    qv AS MATERIALIZED (
      SELECT vec_id, i AS dim,
             CAST(FLOOR(fu[i + 1] * 10000) AS BIGINT) AS q
      FROM unit, UNNEST(range(0, 64)) AS t(i)
    ),
    hyp AS MATERIALIZED (
      SELECT p, i,
             ((1103515245 * (p * 64 + i) + 12345) % 65536) - 32768 AS h
      FROM range(0, 80) a(p), range(0, 64) b(i)
    ),
    dots AS MATERIALIZED (
      SELECT qv.vec_id, hyp.p, SUM(qv.q * hyp.h) AS s
      FROM qv JOIN hyp ON hyp.i = qv.dim
      GROUP BY qv.vec_id, hyp.p
    ),
    bands AS MATERIALIZED (
      SELECT vec_id, p // 5 AS band,
             SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << (p % 5))
                      ELSE 0 END) AS bucket
      FROM dots GROUP BY vec_id, p // 5
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM bands q JOIN bands c
        ON q.band = c.band AND q.bucket = c.bucket
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND(list_sum(list_transform(range(1, 65),
                   i -> q.fu[i] * c.fu[i])), 4) AS cos_sim
      FROM cand
      JOIN unit q ON q.vec_id = cand.query_id
      JOIN unit c ON c.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def similarity_ann_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN, hash-verified end-to-end — the LSH family's
    analogue of similarity_ann_ivf_fullprobe: the SAME pipeline shape
    as similarity_ann_lsh (band buckets → candidate equi-join → exact
    rescore → per-query top-5) with the hyperplanes swapped from
    seeded Gaussian floats to the integer LCG scheme
    (``_int_hyperplane_bucket_udf``, 16 bands × 5 bits over
    floor(u·10⁴)-quantized vectors).  The DuckDB oracle regenerates
    the hyperplanes from the same formula and replays every sign bit,
    bucket, candidate pair, and the rounded exact rerank — so a defect
    in the banding layout, bucket packing, candidate join, or rescore
    breaks the hash, and the production row keeps only the Gaussian
    hyperplane draw unverified.  Note this row's top-5 is the LSH
    ANSWER (exact only over bucket-mates), not the brute-force top-5 —
    the oracle replays the approximation faithfully, including its
    misses.

    Scale shape: identical to production — only (band, bucket, id)
    rows shuffle for candidates; rerank is candidate-sized."""
    band_buckets = _int_hyperplane_bucket_udf(n_bands=16, bits=5, dim=64)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    e = e.withColumn(
        "qu", F.transform("u", lambda x: F.floor(x * 10000).cast("long"))
    )
    return _lsh_topk(e, band_buckets, hash_col="qu")


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@query(
    "text_quality_stats",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_chars_actual,
           len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS n_words,
           LENGTH(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS n_punct,
           ROUND(LENGTH(text) / GREATEST(len(list_filter(string_split_regex(text, '\\s+'),
                 w -> w <> '')), 1), 4) AS avg_word_len
    FROM documents
    """,
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics: char/word/punct counts, average
    word length — the filter features of a pretraining pipeline."""
    d = load_table(spark, sf_dir, "documents")
    wc = T.word_count(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        wc.cast("long").alias("n_words"),
        F.length(F.regexp_replace("text", r"[^.,;:!?'\"()\-]", "")).cast("long").alias("n_punct"),
        F.round(F.length("text") / F.greatest(wc, F.lit(1)), 4).alias("avg_word_len"),
    )


@query(
    "text_token_counts",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''))
             AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))
             AS bpe_ish_tokens
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.word_count(F.col("text")).cast("long").alias("ws_tokens"),
        T.bpe_ish_token_count(F.col("text")).cast("long").alias("bpe_ish_tokens"),
    )


@query(
    "text_lang_id",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
      FROM documents
    ),
    hits AS (
      SELECT doc_id, lang,
        len(list_filter(ws, x -> x IN ('the','and','of','to','a'))) AS en_hits,
        len(list_filter(ws, x -> x IN ('el','la','de','que','y'))) AS es_hits,
        len(list_filter(ws, x -> x IN ('le','la','et','les','des'))) AS fr_hits,
        len(list_filter(ws, x -> x IN ('der','die','und','das','ist'))) AS de_hits,
        len(list_filter(ws, x -> x IN ('的','是','了','在','我'))) AS zh_hits
      FROM w
    )
    SELECT doc_id, lang AS actual_lang,
           CASE GREATEST(en_hits, es_hits, fr_hits, de_hits, zh_hits)
             WHEN 0 THEN 'unknown'
             WHEN en_hits THEN 'en'
             WHEN es_hits THEN 'es'
             WHEN fr_hits THEN 'fr'
             WHEN de_hits THEN 'de'
             ELSE 'zh' END AS predicted_lang
    FROM hits
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language identification (argmax with fixed
    precedence en>es>fr>de>zh on ties, mirrored exactly in the oracle)."""
    # round-12: r11's fan_out REMOVED — interleaved A/B (sf0.1 and the
    # 10x fixture) measured the round-robin exchange of raw text
    # costing 1.3-2x the row-local projection it parallelizes; this is
    # a cheap per-row pass, so scan parallelism already suffices at
    # every scale (ADVICE r11).
    d = load_table(spark, sf_dir, "documents")
    ws = T.words(F.lower(F.col("text")))
    hits = {lang: T.stopword_hits(ws, lang) for lang in ["en", "es", "fr", "de", "zh"]}
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == 0, "unknown")
        .when(hits["en"] == best, "en")
        .when(hits["es"] == best, "es")
        .when(hits["fr"] == best, "fr")
        .when(hits["de"] == best, "de")
        .otherwise("zh")
    )
    return d.select(
        "doc_id", F.col("lang").alias("actual_lang"), pred.alias("predicted_lang")
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(7 AS BIGINT),
               list_transform(list_filter(string_split_regex(text, '\\s+'),
                              w -> w <> ''),
                 w -> CAST(ascii(w) + length(w) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 2147483647) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint (polynomial mod prime),
    exactly reproducible in ANSI SQL — unlike engine hash builtins."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.polynomial_fingerprint(T.words(F.col("text"))).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# Multimodal column plumbing
# --------------------------------------------------------------------------


@query(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           'application/octet-stream' AS mime,
           octet_length(encode(text)) // 4 AS est_frames
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal columns: treat payloads as opaque binary + typed
    metadata. The documents' text stands in as the payload (the
    container has no media libs); the schema/partitioning/UDF plumbing
    is the real thing — see multimodal_decode_stub for the mapInPandas
    decode path."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("payload_bytes"),
        F.lit("application/octet-stream").alias("mime"),
        (F.octet_length(payload) / F.lit(4)).cast("bigint").alias("est_frames"),
    )


def multimodal_frame_sample_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-like payloads: one input row fans out
    to N frame rows (uniform stride over the byte stream), each with a
    fixed-shape feature vector — the one-to-many mapInPandas shape a
    video pipeline needs (decode is a deterministic fake; no codecs in
    this container — the Spark contract is real: Arrow batches in,
    exploded typed rows out, partition-parallel).

    At 100 TB: payloads stay in executor-local Arrow batches; the fan-
    out multiplies rows, not bytes (features only), so the shuffle
    after sampling carries frames' features, never the source media.

    Returns the array<int>-typed feature column for downstream use;
    the registered query serializes it (see multimodal_frame_sample).
    """
    import pandas as pd

    n_frames = 4
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def sample_frames(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "feature": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                stride = max(len(buf) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * stride, max(len(buf) - 1, 0))
                    window = buf[off : off + 64]
                    # fake per-frame feature: 4-bin histogram of the window
                    hist = [0, 0, 0, 0]
                    for b in window:
                        hist[b >> 6] += 1
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["feature"].append(hist)
            yield pd.DataFrame(out)

    return d.mapInPandas(
        sample_frames,
        "doc_id long, frame_idx int, frame_offset long, feature array<int>",
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH docs AS (
      SELECT doc_id, text, LENGTH(text) AS n
      FROM documents WHERE doc_id % 7 = 0
    ),
    frames AS (
      SELECT doc_id,
             CAST(i AS INT) AS frame_idx,
             LEAST(i * GREATEST(n // 4, 1), GREATEST(n - 1, 0)) AS off,
             text
      FROM docs, UNNEST(range(0, 4)) t(i)
    ),
    wins AS (
      SELECT doc_id, frame_idx, off,
             substring(text, CAST(off + 1 AS INT), 64) AS w
      FROM frames
    ),
    hist AS (
      SELECT doc_id, frame_idx, off,
             SUM(CASE WHEN ascii(substring(w, CAST(j AS INT), 1)) // 64 = 0
                      THEN 1 ELSE 0 END) AS h0,
             SUM(CASE WHEN ascii(substring(w, CAST(j AS INT), 1)) // 64 = 1
                      THEN 1 ELSE 0 END) AS h1,
             SUM(CASE WHEN ascii(substring(w, CAST(j AS INT), 1)) // 64 = 2
                      THEN 1 ELSE 0 END) AS h2,
             SUM(CASE WHEN ascii(substring(w, CAST(j AS INT), 1)) // 64 = 3
                      THEN 1 ELSE 0 END) AS h3
      FROM wins, UNNEST(range(1, LEN(w) + 1)) u(j)
      GROUP BY doc_id, frame_idx, off
    )
    SELECT doc_id, frame_idx, CAST(off AS BIGINT) AS frame_offset,
           '[' || h0 || ',' || h1 || ',' || h2 || ',' || h3 || ']'
             AS feature
    FROM hist
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing wrapper over multimodal_frame_sample_arrays: the
    feature vector is serialized to a JSON string at the query boundary
    so result canonicalizers (pandas sort/hash) can handle the rows;
    internal pipelines use the array-typed variant directly.

    UPGRADED r7 from rows-only to oracle-EXACT: the corpus is pure
    printable ASCII (verified at every sf), so byte offsets ≡ char
    offsets and the whole fake-decode pipeline — uniform stride,
    64-byte window, 4-bin high-bit histogram — is reconstructed
    relationally in DuckDB, making the Arrow mapInPandas fan-out
    hash-verified end-to-end (the shot_boundaries treatment applied
    to the one-to-many shape)."""
    return multimodal_frame_sample_arrays(spark, sf_dir).withColumn(
        "feature", F.to_json("feature")
    )


def multimodal_decode_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched multimodal decode/feature-extract pipeline.

    mapInPandas over (doc_id, payload binary) producing fixed-shape
    feature vectors. The decode itself is a deterministic fake
    (byte-histogram "features") because no image/audio codecs ship in
    this container — the Spark-side contract (schema, Arrow batching,
    iterator-of-DataFrames signature, partition sizing) is real.

    Returns the array<int>-typed features column for downstream use;
    the registered query serializes it (see multimodal_decode_stub).
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def decode_batch(batches):
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                buf = bytes(payload)
                # Deterministic fake decode: 8-bin byte histogram as the
                # stand-in for image/audio feature extraction.
                hist = [0] * 8
                for byte in buf[:4096]:
                    hist[byte >> 5] += 1
                feats.append(hist)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return d.mapInPandas(
        decode_batch, "doc_id long, n_bytes long, features array<int>"
    )


@query(
    "multimodal_decode_stub",
    oracle="""
    WITH chars AS (
      SELECT doc_id, LENGTH(text) AS n_bytes,
             ascii(substring(substring(text, 1, 4096),
                             CAST(j AS INT), 1)) // 32 AS bin
      FROM documents,
           UNNEST(range(1, LEAST(LENGTH(text), 4096) + 1)) u(j)
    ),
    hist AS (
      SELECT doc_id, n_bytes,
             SUM(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS h0,
             SUM(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS h1,
             SUM(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS h2,
             SUM(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS h3,
             SUM(CASE WHEN bin = 4 THEN 1 ELSE 0 END) AS h4,
             SUM(CASE WHEN bin = 5 THEN 1 ELSE 0 END) AS h5,
             SUM(CASE WHEN bin = 6 THEN 1 ELSE 0 END) AS h6,
             SUM(CASE WHEN bin = 7 THEN 1 ELSE 0 END) AS h7
      FROM chars GROUP BY doc_id, n_bytes
    )
    SELECT doc_id, n_bytes,
           '[' || h0 || ',' || h1 || ',' || h2 || ',' || h3 || ',' ||
           h4 || ',' || h5 || ',' || h6 || ',' || h7 || ']' AS features
    FROM hist
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing wrapper over multimodal_decode_arrays: the
    features vector is serialized to a JSON string at the query
    boundary so result canonicalizers (pandas sort/hash) can handle the
    rows; internal pipelines use the array-typed variant directly.

    UPGRADED r7 from rows-only to oracle-EXACT: pure-ASCII payloads
    make byte offsets ≡ char offsets, so the fake decode (8-bin
    high-bit histogram over the first 4096 bytes) reconstructs
    relationally — the whole Arrow mapInPandas contract is now
    hash-verified, not just shape-checked."""
    return multimodal_decode_arrays(spark, sf_dir).withColumn(
        "features", F.to_json("features")
    )


@query(
    "multimodal_decode_hist",
    oracle="""
    WITH d AS (
      SELECT doc_id, substr(text, 1, 4096) AS t4
      FROM documents
      WHERE octet_length(encode(text)) = length(text) AND doc_id % 4 = 0
    ),
    ch AS (
      SELECT doc_id,
             unicode(substr(t4, CAST(i AS INT), 1)) // 32 AS bin
      FROM d, UNNEST(range(1, length(t4) + 1)) AS t(i)
    ),
    cnt AS (SELECT doc_id, bin, COUNT(*) AS n FROM ch GROUP BY doc_id, bin),
    grid AS (SELECT d.doc_id, k.bin FROM d, UNNEST(range(0, 8)) AS k(bin))
    SELECT g.doc_id,
           '[' || string_agg(CAST(CAST(COALESCE(c.n, 0) AS BIGINT) AS VARCHAR),
                             ',' ORDER BY g.bin) || ']' AS hist
    FROM grid g LEFT JOIN cnt c ON c.doc_id = g.doc_id AND c.bin = g.bin
    GROUP BY g.doc_id
    """,
)
def multimodal_decode_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode stub's feature math, oracle-verified: the same
    Arrow-batched mapInPandas byte-histogram "decode" as
    multimodal_decode_stub, restricted to PURE-ASCII payloads (where
    byte == character, checked by octet_length == char length in both
    engines) so DuckDB can recompute the 8-bin histogram exactly from
    the characters — upgrading the multimodal decode path from a
    rows-only check to a value-verified one. The full-corpus stub
    stays registered for the multi-byte payload shape."""
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .where(
            (F.octet_length(F.encode(F.col("text"), "utf-8"))
             == F.length("text"))
            & (F.col("doc_id") % 4 == 0)
        )
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )

    def decode_batch(batches):
        for pdf in batches:
            hists = []
            for payload in pdf["payload"]:
                buf = bytes(payload)
                hist = [0] * 8
                for byte in buf[:4096]:
                    hist[byte >> 5] += 1
                hists.append(hist)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "hist": hists})

    # Output-type contract: array columns break the driver's pandas
    # canon (unhashable list cells, CORRECTNESS_r07 ERROR) — the
    # internal pipeline stays array-typed, the query boundary emits
    # the JSON string form, which the oracle reconstructs exactly
    # (integers render identically in both engines).
    return d.mapInPandas(
        decode_batch, "doc_id long, hist array<long>"
    ).select("doc_id", F.to_json("hist").alias("hist"))


@query(
    "multimodal_resize_pool",
    oracle="""
    WITH px AS (
      SELECT doc_id, i,
             CAST((doc_id * 7 + i) % 256 AS DOUBLE) AS v,
             ((i // 16) // 2) * 8 + ((i % 16) // 2) AS cell
      FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
           UNNEST(range(0, 256)) AS t(i)
    ),
    cells AS (
      SELECT doc_id, cell, AVG(v) AS m FROM px GROUP BY doc_id, cell
    )
    SELECT doc_id,
           '[' || string_agg(CAST(m AS VARCHAR), ',' ORDER BY cell)
               || ']' AS pooled
    FROM cells GROUP BY doc_id
    """,
)
def multimodal_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize as 2×2 mean-pooling (16×16 → 8×8) through the REAL
    media pipeline shape: Arrow-batched ``mapInPandas``, numpy strided
    reshape per frame, fixed-shape ``array<double>`` out. The frame
    itself is a deterministic synthetic (pixel = (doc_id·7+i) mod 256
    — no codecs in this container), which is exactly what lets the
    DuckDB oracle verify the POOLING ARITHMETIC AND the Arrow
    round-trip bit-for-bit (quarter-integer means are exact doubles)
    instead of settling for a rows-only check like the decode stub.

    At 100 TB: pooling multiplies nothing — each payload row maps to
    one fixed-64-float feature row inside its executor's Arrow batch;
    no shuffle is introduced at all."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)

    def pool(batches):
        import numpy as np

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            pooled = []
            for did in ids:
                img = (
                    ((did * 7 + np.arange(256)) % 256)
                    .astype(np.float64)
                    .reshape(16, 16)
                )
                pooled.append(
                    img.reshape(8, 2, 8, 2).mean(axis=(1, 3)).reshape(64).tolist()
                )
            yield pd.DataFrame({"doc_id": ids, "pooled": pooled})

    # Output-type contract: the query boundary serializes the pooled
    # vector to its JSON string (quarter-integer doubles render
    # identically under Spark's to_json and DuckDB's VARCHAR cast);
    # the array-typed frame stays the internal pipeline shape.
    return (
        d.select("doc_id")
        .mapInPandas(pool, "doc_id long, pooled array<double>")
        .select("doc_id", F.to_json("pooled").alias("pooled"))
    )


@query(
    "embedding_normalize_stats",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(ROUND(CAST(sqrt(COALESCE(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0))
                AS DECIMAL(24,10)), 5) AS DOUBLE) AS l2_norm,
           CAST(ROUND(CAST(list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE))))
                AS DECIMAL(24,10)), 5) AS DOUBLE) AS max_abs
    FROM embeddings
    """,
)
def embedding_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector embedding hygiene stats: dimensionality, L2 norm and
    largest-magnitude component — the pre-normalization audit every
    ANN/cosine pipeline runs (zero vectors and NaN spikes break cosine
    math downstream).

    Pure higher-order-function arithmetic (transform/aggregate/
    array_max) inside the JVM: one projection pass, no shuffle, no
    Python. The 5dp DECIMAL bridge keeps float32→double widening and
    summation rounding identical across engines.
    """
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    sq_sum = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x)
    max_abs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.sqrt(sq_sum).cast("decimal(24,10)"), 5)
        .cast("double")
        .alias("l2_norm"),
        F.round(max_abs.cast("decimal(24,10)"), 5).cast("double").alias("max_abs"),
    )


@query(
    "multimodal_audio_rms",
    oracle="""
    WITH samples AS (
      SELECT doc_id, CAST((t.p - 1) // 256 AS BIGINT) AS window_idx,
             ord(substring(text, t.p, 1)) AS s
      FROM documents, UNNEST(range(1, length(text) + 1)) AS t(p)
      WHERE doc_id % 9 = 0
    )
    SELECT doc_id, window_idx,
           COUNT(*) AS n_samples,
           CAST(ROUND(CAST(sqrt(AVG(CAST(s * s AS DOUBLE)))
                AS DECIMAL(24,10)), 4) AS DOUBLE) AS rms
    FROM samples GROUP BY doc_id, window_idx
    """,
)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed RMS over binary payloads: the payload is
    treated as a PCM-u8 sample stream (the documents' utf-8 bytes — no
    audio codecs in this container; with ASCII text every byte IS the
    code point, which is what lets a SQL oracle verify the Python path
    bit-for-bit). mapInPandas decodes each payload with numpy and
    emits one row per 256-sample window with its RMS level — the
    loudness-profile / silence-detection primitive of an audio
    curation pipeline.

    At 100 TB: payloads never shuffle (the window rows carry only
    scalars); numpy vectorizes the per-window fold inside one Arrow
    batch. The decode call is the swap point for a real codec
    (soundfile/ffmpeg) on a cluster that has one."""
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 9 == 0)
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )

    def rms_windows(batches):
        import numpy as np

        win = 256
        for pdf in batches:
            out = {"doc_id": [], "window_idx": [], "n_samples": [], "rms": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(payload), dtype=np.uint8)
                for i in range(0, len(samples), win):
                    chunk = samples[i : i + win].astype(np.float64)
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(i // win)
                    out["n_samples"].append(len(chunk))
                    out["rms"].append(float(np.sqrt(np.mean(chunk * chunk))))
            yield pd.DataFrame(out)

    raw = d.mapInPandas(
        rms_windows, "doc_id long, window_idx long, n_samples long, rms double"
    )
    return raw.select(
        "doc_id",
        "window_idx",
        "n_samples",
        F.round(F.col("rms").cast("decimal(24,10)"), 4).cast("double").alias("rms"),
    )


@query("similarity_ann_pq")  # quantization-dependent → rows-only
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-ranking — the third leg
    of the ANN triad (IVF cells: similarity_ann_ivf; hyperplane LSH:
    similarity_ann_lsh). PQ is the memory play: each 64-dim vector is
    stored as M=4 one-byte codes (one per 16-dim subspace, K=16
    codewords trained with a Lloyd step per subspace), a 64× payload
    compression — at 100 TB of embeddings THAT is what lets the index
    live in executor memory.

    Query path is the production ADC + rerank pipeline: per query a
    (M × K) lookup table of subspace distances is built against the
    codebooks (640 rows for 10 queries — broadcast), approximate
    distance is one grouped sum over the code columns, the top-50
    shortlist per query is then re-scored EXACTLY against the raw
    vectors and cut to top-5 (the rerank step converts PQ's coarse
    ranking into high recall while touching 50 vectors per query, not
    the corpus). Unit vectors make L2² = 2 − 2·cos, so the ADC
    ranking agrees with the brute-force cosine contract.
    Rows-only: codeword boundaries are approximation details; recall
    is gated in tests/test_llm_quality.py.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    from guidewire_spark.plans.artifact_cache import corpus_fingerprint

    return _pq_topk(
        spark, e, enc_col="u", refine=True,
        cache_key=corpus_fingerprint(sf_dir, "embeddings"),
    )


def _pq_topk(
    spark: SparkSession,
    e: DataFrame,
    enc_col: str,
    refine: bool,
    det_seeds: bool = False,
    cache_key: tuple | None = None,
) -> DataFrame:
    """The PQ ANN pipeline body — subspace split, codebook seeding
    (+ optional one-Lloyd-step refinement), code assignment, ADC
    lookup-table scoring, top-100 shortlist, exact rerank — shared by
    similarity_ann_pq (float subvectors, refined codebooks) and the
    hash-verified similarity_ann_pq_verified (int64-quantized
    subvectors, seed codebooks, refine=False so every distance is
    exact integer arithmetic a SQL oracle replays).  ``e`` carries
    the float unit vector ``u`` (rerank is always exact float cosine)
    plus ``enc_col``, the vector the codes are built from."""
    m_sub, k_codes, dim_sub = 8, 16, 8
    # Corpus-side fan-out (round-11 second pass): the single-file sf
    # scan ran the per-subvector argmin encode — an interpreted
    # 16-codeword × 8-dim HOF fold per row — in ONE task
    # (stage-profiled 1.27 s single-task at sf0.1).  Guarded, so a
    # multi-file production scan is untouched.  Seed selection and the
    # query side stay on the RAW frame: the production row's
    # limit-based seed pick depends on partition layout, and fanning
    # it would silently retrain a different codebook.
    from guidewire_spark.plans.catalog import fan_out, local_df

    ew = fan_out(e)
    # (vec_id, m, sub): one 8-dim subvector per subspace, JVM slices.
    subs = ew.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(enc_col, m * dim_sub + 1, dim_sub)
                    for m in range(m_sub)
                ]
            )
        ).alias("m", "sub"),
    )
    # Seeds -> per-subspace codebooks.  The verified row uses the
    # fully-deterministic predicate (vec_id < 32·k, no limit) so the
    # oracle selects the identical seed set; the production row keeps
    # its historical limit-based selection.
    if det_seeds:
        # code = vec_id // 32 IS the rank of the eligible ids in
        # ascending order — pure arithmetic, no window at all
        seeds = e.where(
            (F.col("vec_id") % 32 == 0) & (F.col("vec_id") < 32 * k_codes)
        ).select(
            "vec_id",
            enc_col,
            (F.col("vec_id") / 32).cast("int").alias("code"),
        )
    else:
        seeds = (
            e.where(F.col("vec_id") % 32 == 0)
            .select("vec_id", enc_col)
            .limit(k_codes)
            .withColumn(
                "code",
                F.row_number().over(Window.orderBy("vec_id")) - 1,
            )
        )
    cb = seeds.select(
        "code",
        F.posexplode(
            F.array(
                *[
                    F.slice(enc_col, m * dim_sub + 1, dim_sub)
                    for m in range(m_sub)
                ]
            )
        ).alias("m", "cvec"),
    )
    # (x-y)^2 sums stay exact for BOTH element types: doubles are the
    # production path; quantized int64 components are ≤ 1e4 so the
    # squared sums (≤ 3.2e9) are exactly representable in the double
    # accumulator — the fold is a single shared expression.
    l2sq = F.aggregate(
        F.zip_with(
            F.col("sub"), F.col("cvec"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def encode(sub_df, codebook):
        """Shuffle-free codeword argmin (round-11, the r9 IVF
        broadcast-argmax pattern): collapse each subspace's 16
        codewords to one array row keyed by m, broadcast-join 1:1,
        take array_min over (d, code) structs — no 16× row blow-up,
        no row_number window, no exchange.  Ordering identical to
        orderBy(d, code): code makes the pair unique, so the min is
        arrival-order-insensitive; d is the same shared (x-y)² fold
        (exact for both element types — see l2sq comment above)."""
        cb_by_m = codebook.groupBy("m").agg(
            F.collect_list(F.struct("code", "cvec")).alias("codes")
        )
        best = F.array_min(
            F.transform(
                F.col("codes"),
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("sub"), c["cvec"],
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    c["code"].alias("code"),
                ),
            )
        )
        return sub_df.join(F.broadcast(cb_by_m), "m").select(
            "vec_id", "m", "sub", best["code"].alias("code")
        )

    if refine:
        # codebooks are (8 x 16 x 8 doubles) — driver-metadata-sized;
        # collecting truncates the corpus-pass lineage like IVF's
        # Lloyd, and the collected artifact is fingerprint-memoized
        # (plans.artifact_cache) like the other trained tables.
        from guidewire_spark.plans.artifact_cache import get_or_train

        def train() -> list:
            # Train from the RAW scan's subvectors, not the fanned-out
            # frame: the refinement's F.avg sums doubles in partition
            # order, and the guarded fan_out's round-robin layout is
            # exactly what must never leak into a trained artifact —
            # mirror _ivfpq_topk's raw training path so the refined
            # codebook is byte-identical across core counts and cache
            # states (round-12, per ADVICE).  The fanned `subs` is
            # still what the warm-path encode below consumes.
            subs_raw = e.select(
                "vec_id",
                F.posexplode(
                    F.array(
                        *[
                            F.slice(enc_col, m * dim_sub + 1, dim_sub)
                            for m in range(m_sub)
                        ]
                    )
                ).alias("m", "sub"),
            )
            assigned = encode(subs_raw, cb)
            refined_df = (
                assigned.select(
                    "m", "code", F.posexplode("sub").alias("dim", "val")
                )
                .groupBy("m", "code", "dim")
                .agg(F.avg("val").alias("mu"))
                .groupBy("m", "code")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "mu"))),
                        lambda s: s["mu"],
                    ).alias("cvec")
                )
            )
            return [
                (r["m"], r["code"], list(r["cvec"]))
                for r in refined_df.collect()
            ]

        rows = get_or_train(
            "pq_codebook_refined",
            # det_seeds changes the seed codebook the refinement trains
            # from, so it must discriminate the cache slot (refine too,
            # defensively — today this branch implies refine=True)
            (cache_key, enc_col, det_seeds, refine)
            if cache_key is not None
            else None,
            train,
        )
        # local_df, not createDataFrame: the pickle-RDD path spawned
        # two 32-task micro-stages per run wherever the 128-row
        # codebook was consumed (stage-profiled ~0.7 s each at sf0.1);
        # the LocalTableScan plan has zero scan tasks.
        cb1 = local_df(spark, rows, "m int, code int, cvec array<double>")
    else:
        cb1 = cb
    codes = encode(subs, cb1).select("vec_id", "m", "code")

    # Per-query ADC lookup table: ||q_m - c_{m,k}||^2 for every (m, k).
    q = e.where(F.col("vec_id") < 10)
    q_subs = q.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(
            F.array(
                *[
                    F.slice(enc_col, m * dim_sub + 1, dim_sub)
                    for m in range(m_sub)
                ]
            )
        ).alias("m", "sub"),
    )
    lut = q_subs.join(F.broadcast(cb1), "m").select(
        "query_id", "m", "code", l2sq.alias("d")
    )  # 10 queries x 8 subspaces x 16 codes = 1280 rows
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("approx_d"))
    )
    w50 = Window.partitionBy("query_id").orderBy("approx_d", "vec_id")
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w50))
        .where(F.col("rn") <= 100)
        .select("query_id", "vec_id")
    )
    # Exact rerank of the shortlist against the raw unit vectors
    # (always the float u column, whatever enc_col the codes used).
    rescored = (
        shortlist.join(e.select("vec_id", "u"), "vec_id")
        .join(
            F.broadcast(
                q.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("u").alias("q_unit"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.dot(F.col("q_unit"), F.col("u")), 4).alias("cos_sim"),
        )
    )
    w5 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w5))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@query(
    "similarity_ann_pq_verified",
    oracle="""
    WITH unit AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS fu
      FROM embeddings
    ),
    qv AS MATERIALIZED (
      SELECT vec_id, i AS dim,
             CAST(FLOOR(fu[i + 1] * 10000) AS BIGINT) AS q
      FROM unit, UNNEST(range(0, 64)) AS t(i)
    ),
    seeds AS MATERIALIZED (
      SELECT vec_id, CAST(vec_id // 32 AS INT) AS code
      FROM unit WHERE vec_id % 32 = 0 AND vec_id < 512
    ),
    cbq AS MATERIALIZED (
      SELECT s.code, qv.dim // 8 AS m, qv.dim % 8 AS sdim, qv.q AS c
      FROM seeds s JOIN qv ON qv.vec_id = s.vec_id
    ),
    sub AS MATERIALIZED (
      SELECT vec_id, dim // 8 AS m, dim % 8 AS sdim, q FROM qv
    ),
    dist AS MATERIALIZED (
      SELECT sub.vec_id, sub.m, cb.code,
             SUM((sub.q - cb.c) * (sub.q - cb.c)) AS d
      FROM sub JOIN cbq cb ON cb.m = sub.m AND cb.sdim = sub.sdim
      GROUP BY sub.vec_id, sub.m, cb.code
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, code) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    lut AS MATERIALIZED (
      SELECT vec_id AS query_id, m, code, d FROM dist WHERE vec_id < 10
    ),
    adc AS MATERIALIZED (
      SELECT l.query_id, c.vec_id, SUM(l.d) AS approx_d
      FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
      WHERE c.vec_id <> l.query_id
      GROUP BY l.query_id, c.vec_id
    ),
    short AS MATERIALIZED (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY approx_d, vec_id) AS rn
        FROM adc
      ) WHERE rn <= 100
    ),
    resc AS (
      SELECT s.query_id, s.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(range(1, 65),
                   i -> qq.fu[i] * cc.fu[i])), 4) AS cos_sim
      FROM short s
      JOIN unit qq ON qq.vec_id = s.query_id
      JOIN unit cc ON cc.vec_id = s.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM resc
    ) WHERE rn <= 5
    """,
)
def similarity_ann_pq_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN, hash-verified end-to-end — the PQ
    leg's analogue of similarity_ann_ivf_fullprobe, completing the ANN
    triad's verified coverage: the SAME ``_pq_topk`` body as the
    production row (subspace split, codebook seeding, nearest-codeword
    assignment with (d, code) tie-break, per-query ADC lookup table,
    grouped approximate-distance sum, top-100 shortlist, exact
    rerank) with two exactness swaps: subvectors are
    floor(u·10⁴)-quantized int64 (the squared-distance folds become
    exact — the double accumulator represents sums ≤ 3.2e9 exactly)
    and the codebooks are the UNREFINED deterministic seeds
    (vec_id % 32 = 0, vec_id < 512 — no float Lloyd means), so the
    DuckDB oracle replays every code assignment, every ADC cell,
    the shortlist ordering, and the rerank digit-for-digit.  The
    production row keeps only the float Lloyd refinement unverified —
    the same training-step class IVF's verified rows already cover.

    Scale shape: identical to production — codes are M small ints per
    vector, the ADC join carries (m, code) keys, rerank touches 100
    vectors per query."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    e = e.withColumn(
        "qu", F.transform("u", lambda x: F.floor(x * 10000).cast("long"))
    )
    return _pq_topk(spark, e, enc_col="qu", refine=False, det_seeds=True)


@query(
    "training_hard_negatives",
    oracle="""
    WITH unit AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS anchor_id, c.vec_id AS negative_id,
             c.label AS negative_label,
             ROUND(list_sum(list_transform(range(1, 65),
                   i -> q.u[i] * c.u[i])), 4) AS cos_sim
      FROM unit q JOIN unit c
        ON q.label <> c.label
      WHERE q.vec_id < 20
    )
    SELECT anchor_id, negative_id, negative_label, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                 ORDER BY cos_sim DESC, negative_id) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def training_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the most-similar vectors with a DIFFERENT label — the negatives
    that actually move a contrastive loss (random negatives are
    trivially separated; hard ones define the margin). Complements
    training_negative_pairs (deterministic random negatives).

    Same broadcast-anchor brute-force shape as
    similarity_topk_bruteforce with the label-mismatch predicate
    pushed into the join; at 100 TB the anchor side is the small
    per-batch set and the corpus side streams. The ANN paths (IVF/
    LSH/PQ + label filter at rerank) are the scale route when anchors
    grow."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", V.normalize(F.col("embedding")).alias("u")
    )
    anchors = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("u").alias("qu"),
    )
    scored = e.join(
        F.broadcast(anchors), F.col("label") != F.col("anchor_label")
    ).select(
        "anchor_id",
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.round(V.dot(F.col("qu"), F.col("u")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("anchor_id", "negative_id", "negative_label", "cos_sim")
    )


@query(
    "text_lang_confusion_matrix",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
      FROM documents
    ),
    hits AS (
      SELECT doc_id, lang,
        len(list_filter(ws, x -> x IN ('the','and','of','to','a'))) AS en_hits,
        len(list_filter(ws, x -> x IN ('el','la','de','que','y'))) AS es_hits,
        len(list_filter(ws, x -> x IN ('le','la','et','les','des'))) AS fr_hits,
        len(list_filter(ws, x -> x IN ('der','die','und','das','ist'))) AS de_hits,
        len(list_filter(ws, x -> x IN ('的','是','了','在','我'))) AS zh_hits
      FROM w
    ),
    pred AS (
      SELECT lang AS actual_lang,
             CASE GREATEST(en_hits, es_hits, fr_hits, de_hits, zh_hits)
               WHEN 0 THEN 'unknown'
               WHEN en_hits THEN 'en'
               WHEN es_hits THEN 'es'
               WHEN fr_hits THEN 'fr'
               WHEN de_hits THEN 'de'
               ELSE 'zh' END AS predicted_lang
      FROM hits
    )
    SELECT actual_lang, predicted_lang, COUNT(*) AS n,
           CAST(ROUND(CAST(COUNT(*) / CAST(SUM(COUNT(*))
                OVER (PARTITION BY actual_lang) AS DOUBLE)
                AS DECIMAL(24,10)), 4) AS DOUBLE) AS frac_of_actual
    FROM pred GROUP BY actual_lang, predicted_lang
    """,
)
def text_lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the
    stored labels — the component-quality evaluation run as a query:
    per (actual, predicted) cell count and its share of the actual
    class (the per-class recall on the diagonal). Operator evaluation
    at 100 TB is exactly this: aggregate the predictor's output
    against ground truth in one pass; the matrix is
    (langs × langs)-bounded regardless of corpus size."""
    pred = text_lang_id(spark, sf_dir)
    cell = pred.groupBy("actual_lang", "predicted_lang").agg(
        F.count("*").alias("n")
    )
    share = F.col("n") / F.sum("n").over(
        Window.partitionBy("actual_lang")
    ).cast("double")
    return cell.select(
        "actual_lang",
        "predicted_lang",
        "n",
        F.round(share.cast("decimal(24,10)"), 4).cast("double").alias(
            "frac_of_actual"
        ),
    )


@query("multimodal_phash_neardup")  # python decode pipeline → rows-only
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate candidates for image-like binary
    payloads: decode → 8×8 grayscale → 2-D DCT-II → 64-bit pHash
    (sign of each low-frequency coefficient against the median), then
    the standard banded-LSH dedup: 4 × 16-bit hash bands bucket the
    corpus, in-bucket pairs verify by EXACT Hamming distance ≤ 10 —
    computed JVM-side as ``bit_count(xor)``, so only the hash (8
    bytes/doc) ever shuffles, never payload bytes.

    The "decode" is the repo's documented deterministic fake (no
    media libs in this container): the first 4 KiB of the payload
    average-pool into the 8×8 tile grid.  Everything downstream of
    the decode — Arrow batch shape, DCT, banding, bucket join,
    Hamming verify — is the real production pipeline; swap the
    pooling for a real image decode and nothing else changes.
    Python-side hashing → rows-only; planted near-identical payloads
    are recall-gated in tests/test_llm_quality.py."""
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(d)

    n = 8
    # DCT-II basis, built once per executor batch
    k = np.arange(n)
    C = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    C[0, :] /= np.sqrt(2.0)

    def phash(batches):
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload)[:4096], dtype=np.uint8)
                if buf.size == 0:
                    buf = np.zeros(64, dtype=np.uint8)
                # average-pool into 64 tiles (the deterministic fake
                # stand-in for decode + resize)
                cells = np.array_split(buf.astype(np.float64), 64)
                tile = np.array([c.mean() if c.size else 0.0 for c in cells])
                A = tile.reshape(n, n)
                D = C @ A @ C.T
                coeffs = D.flatten()
                bits = (coeffs > np.median(coeffs)).astype(np.uint64)
                h = np.uint64(0)
                for b in bits:
                    h = np.uint64(h << np.uint64(1)) | b
                ids.append(doc_id)
                hashes.append(np.int64(h.astype(np.int64)))
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    hashed = d.mapInPandas(phash, "doc_id long, phash long")
    return _phash_band_pairs(hashed)


def _phash_band_pairs(hashed: DataFrame, max_hamming: int = 10) -> DataFrame:
    """(doc_id, phash) → near-dup pairs via the banded perceptual-hash
    LSH shared by multimodal_phash_neardup and its WHT-verified
    sibling: 4 × 16-bit hash bands bucket the corpus, in-bucket pairs
    verify by exact JVM-side Hamming distance (bit_count of xor) —
    only the 8-byte hash ever shuffles."""
    bands = hashed.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    (F.shiftrightunsigned("phash", 16 * i) % 65536).cast("int")
                    for i in range(4)
                ]
            )
        ).alias("band", "bucket"),
    )
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(
            F.sort_array(
                F.collect_set(F.struct("doc_id", "phash"))
            ).alias("ids")
        )
        .where(F.size("ids") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                        lambda y: F.struct(
                            x["doc_id"].alias("doc_a"),
                            y["doc_id"].alias("doc_b"),
                            x["phash"].alias("ha"),
                            y["phash"].alias("hb"),
                        ),
                    ),
                )
            )
        ).alias("pr")
    ).select("pr.doc_a", "pr.doc_b", "pr.ha", "pr.hb").distinct()
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


@query(
    "multimodal_phash_wht_verified",
    oracle="""
    WITH ct AS MATERIALIZED (
      SELECT doc_id,
             substr(regexp_replace(text, '[^ -~]', '.', 'g'), 1, 4096) AS s
      FROM documents
      WHERE length(regexp_replace(text, '[^ -~]', '.', 'g')) > 0
    ),
    meta AS MATERIALIZED (
      SELECT doc_id, s, length(s) AS L,
             length(s) // 64 AS q, length(s) % 64 AS r
      FROM ct
    ),
    pos AS MATERIALIZED (
      SELECT doc_id, q,
             ascii(substr(s, j + 1, 1)) AS byte,
             CASE WHEN q = 0 THEN j
                  WHEN j < r * (q + 1) THEN j // (q + 1)
                  ELSE r + (j - r * (q + 1)) // q END AS cell
      FROM meta, UNNEST(range(0, L)) AS t(j)
    ),
    tile AS MATERIALIZED (
      SELECT doc_id, cell,
             SUM(byte) * ((CASE WHEN MAX(q) = 0 THEN 1
                           ELSE MAX(q) * (MAX(q) + 1) END) // COUNT(*)) AS v
      FROM pos GROUP BY doc_id, cell
    ),
    dense AS MATERIALIZED (
      SELECT m.doc_id, c.cell, COALESCE(t.v, 0) AS v
      FROM (SELECT doc_id FROM ct) m
      CROSS JOIN range(0, 64) c(cell)
      LEFT JOIN tile t ON t.doc_id = m.doc_id AND t.cell = c.cell
    ),
    coef AS MATERIALIZED (
      SELECT d.doc_id, g.idx,
             SUM(CASE WHEN (bit_count(CAST((g.idx // 8) & (d.cell // 8)
                                           AS BIGINT))
                          + bit_count(CAST((g.idx % 8) & (d.cell % 8)
                                           AS BIGINT))) % 2 = 0
                      THEN d.v ELSE -d.v END) AS c
      FROM dense d CROSS JOIN range(0, 64) g(idx)
      GROUP BY d.doc_id, g.idx
    ),
    med AS MATERIALIZED (
      SELECT doc_id, list_sort(list(c))[32] AS med
      FROM coef WHERE idx >= 1 GROUP BY doc_id
    ),
    hashes AS MATERIALIZED (
      SELECT coef.doc_id,
             CAST(SUM(CASE WHEN coef.c > med.med
                           THEN CAST(1 AS BIGINT) << (63 - coef.idx)
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS phash
      FROM coef JOIN med ON med.doc_id = coef.doc_id
      WHERE coef.idx >= 1
      GROUP BY coef.doc_id
    ),
    bands AS MATERIALIZED (
      SELECT doc_id, phash, b.band,
             (phash >> (16 * b.band)) & 65535 AS bucket
      FROM hashes CROSS JOIN range(0, 4) b(band)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 10
    """,
)
def multimodal_phash_wht_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup, hash-verified end-to-end — the
    multimodal family's analogue of dedup_minhash_verified: the SAME
    pipeline as multimodal_phash_neardup (deterministic fake decode →
    8×8 tile → 2-D transform → sign-vs-median bits → the shared
    ``_phash_band_pairs`` banded-LSH machinery) with the one
    float-dependent stage swapped for an exact integer twin: the
    Walsh–Hadamard transform (entries ±1 via popcount parity — a
    standard perceptual-hash transform choice) over integer-scaled
    tile means (mean·q·(q+1) is an exact int64 for the two cell sizes
    array_split produces), 63 AC coefficients against their exact
    integer median (odd count ⇒ the middle element, no averaging).
    The payload is sanitized to printable ASCII first so byte == char
    holds in both engines (the multimodal_decode_hist trick).  The
    DuckDB oracle replays tiling, transform, median, bit packing,
    banding, bucket join, and Hamming verify digit-for-digit; the
    production row keeps only the float DCT unverified.

    Scale shape: identical to production — Arrow-batched per-doc
    hashing, then only 8-byte hashes shuffle."""
    import numpy as np

    from guidewire_spark.plans.catalog import fan_out

    d = fan_out(
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_replace(F.col("text"), "[^ -~]", ".").alias("ct"),
        )
        .where(F.length("ct") > 0)
    )
    H = np.array(
        [[(-1) ** bin(i & j).count("1") for j in range(8)] for i in range(8)],
        dtype=np.int64,
    )

    def wht_hash(batches):
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, ct in zip(pdf["doc_id"], pdf["ct"]):
                buf = np.frombuffer(
                    ct.encode("ascii")[:4096], dtype=np.uint8
                ).astype(np.int64)
                L = buf.size
                q, r = divmod(L, 64)
                scale = q * (q + 1) if q > 0 else 1
                cells = np.array_split(buf, 64)
                tile = np.array(
                    [
                        c.sum() * (scale // len(c)) if len(c) else 0
                        for c in cells
                    ],
                    dtype=np.int64,
                )
                A = tile.reshape(8, 8)
                D = H @ A @ H.T  # exact int64 WHT
                ac = D.flatten()[1:]
                med = np.sort(ac)[31]
                bits = ac > med
                h = 0
                for b in bits:
                    h = (h << 1) | int(b)
                ids.append(doc_id)
                hashes.append(h)
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    hashed = d.mapInPandas(wht_hash, "doc_id long, phash long")
    return _phash_band_pairs(hashed)


@query(
    "dedup_semdedup",
    oracle="""
    WITH unit AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, u AS cu FROM unit WHERE vec_id < 8),
    scored AS (
      SELECT v.vec_id, v.u, c.cid,
             list_sum(list_transform(range(1, 65),
                      i -> v.u[i] * c.cu[i])) AS cos
      FROM unit v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, u, cid AS cluster_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, cid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a
      JOIN assigned b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE list_sum(list_transform(range(1, 65),
                     i -> a.u[i] * b.u[i])) >= 0.42
    )
    SELECT a.vec_id, a.cluster_id, (d.vec_id IS NOT NULL) AS dropped
    FROM assigned a LEFT JOIN dup d ON a.vec_id = d.vec_id
    """,
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic dedup by
    CLUSTER-then-pairwise — k-means-style clusters bound the
    quadratic pair space (the same role LSH bands play for minhash),
    then within-cluster cosine above a threshold drops all but the
    lowest-id member of each near-dup set.

    Determinism choices that make an exact oracle possible: centroids
    are the unit embeddings of vec_id 0..7 (a seeded k-means++ would
    be engine-ambiguous), assignment is argmax cosine with
    lowest-centroid-id tie-break, and the keep rule is keep-first by
    id.  Scale shape: the 8 centroids broadcast (k-sized, never
    data-sized), assignment is one map-side pass + an argmax window
    keyed by vec_id, and the pairwise stage shuffles on cluster_id —
    per-cluster quadratic, corpus-linear overall when clusters are
    balanced (skewed clusters are the thing to monitor, exactly like
    skewed LSH buckets; AQE skew-join covers moderate cases).  At
    100 TB you raise k so cluster size stays bounded; the plan is
    unchanged."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    cents = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("u").alias("cu")
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "u", "cid", V.dot(F.col("u"), F.col("cu")).alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cid").asc()
    )
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("vec_id", "u", F.col("cid").alias("cluster_id"))
    )
    a = assigned.select(
        "cluster_id", F.col("vec_id").alias("a_id"), F.col("u").alias("a_u")
    )
    b = assigned.select(
        "cluster_id", F.col("vec_id").alias("b_id"), F.col("u").alias("b_u")
    )
    dropped = (
        a.join(b, "cluster_id")
        .where(F.col("a_id") < F.col("b_id"))
        .where(V.dot(F.col("a_u"), F.col("b_u")) >= 0.42)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("d", F.lit(True))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cluster_id",
        F.coalesce("d", F.lit(False)).alias("dropped"),
    )


@query("similarity_ann_ivfpq")  # quantization + cell boundaries → rows-only
def similarity_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN — the production pairing the triad's legs
    only demonstrate separately (FAISS's standard recipe, public):
    a coarse quantizer prunes the SEARCH SPACE (probe n_probe of
    n_cells inverted lists), and product quantization on the
    RESIDUALS (vector minus its cell centroid) compresses the
    PAYLOAD (~64×).  Residual PQ beats raw PQ because residuals
    concentrate near zero, so the same 16-codeword budget spends its
    resolution where the data actually lives.

    Scale shape: centroids and codebooks are collected once (8×64 +
    8×16×8 doubles — driver-metadata-sized, truncating the
    corpus-pass lineage exactly like IVF's Lloyd step); the per-query
    ADC lookup table is (queries × probes × M × K) rows and
    broadcasts; the candidate scan touches only the probed cells'
    codes.  Measured recall@5: 0.60 @ sf0.001 / 0.58 @ sf0.01 with
    n_probe=3 of 8 Lloyd-refined cells + 100-deep exact rerank (the
    coarse probe is the ceiling — a true neighbor in an unprobed cell
    is unreachable, which is the knob n_probe buys back).  Rows-only:
    recall@5 vs brute force is gated in tests/test_llm_quality.py."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    from guidewire_spark.plans.artifact_cache import corpus_fingerprint

    return _ivfpq_topk(
        spark, e, enc_col="u", det=False,
        cache_key=corpus_fingerprint(sf_dir, "embeddings"),
    )


def _arr_type(det: bool) -> str:
    """Schema element type for the IVF-PQ helper's collected tables:
    int64 on the deterministic (verified) path, double on the
    production float path."""
    return "array<bigint>" if det else "array<double>"


def _ivfpq_topk(
    spark: SparkSession,
    e: DataFrame,
    enc_col: str,
    det: bool,
    cache_key: tuple | None = None,
) -> DataFrame:
    """The IVF-PQ composite body — coarse quantizer, residual
    computation, residual-PQ codebooks, code assignment, probed
    residual-ADC, exact rerank — shared by similarity_ann_ivfpq
    (float path: limit-seeded Lloyd-refined centroids and codebooks)
    and the hash-verified similarity_ann_ivfpq_verified
    (``det=True``: int64-quantized vectors, arithmetic-ranked
    unrefined centroid/codebook seeds — every stage exact integer
    work a SQL oracle replays, probes and all).  ``e`` carries the
    float unit vector ``u`` (the rerank is always exact float cosine)
    plus ``enc_col``, the vector the index is built from.

    ``cache_key`` memoizes the TRAINED pair (coarse centroid table,
    residual-PQ codebook — 8 + 128 rows) per corpus fingerprint via
    plans.artifact_cache, same pattern as _ivf_centroids/_train_bpe_
    merges: train once per corpus snapshot, apply everywhere."""
    from guidewire_spark.plans.artifact_cache import get_or_train

    m_sub, k_codes, dim_sub, n_probe, n_cells = 8, 16, 8, 3, 8
    vec_cols = ["vec_id", "u"] if enc_col == "u" else ["vec_id", "u", enc_col]

    def coarse_assign(centroids, points=None):
        """Shuffle-free broadcast-argmax assignment (the r9 IVF
        pattern, ported round-11): the k-sized centroid table
        collapses to ONE row carrying the whole set as an array,
        which broadcast-crossJoins onto the points; the winning cell
        is array_max over (sim, -cell, cu) structs — NO k×N join
        blow-up, NO per-vector row_number window, NO exchange.  The
        old shape (broadcast join to k rows + window partitioned by
        vec_id) shuffled k×N rows carrying the 64-double vector
        payloads through every assignment.  Tie-break identical to
        orderBy(sim desc, cell asc): struct comparison orders by sim
        then -cell, and (sim, -cell) is unique per centroid, so the
        max is insensitive to collect_list arrival order (cu rides
        along but is never reached in the comparison).

        ``points`` defaults to the raw frame ``e`` — the training
        path must keep it so the limit-based seed picks stay
        byte-identical; the warm apply path passes the fanned-out
        frame (round-11 second pass: the single-file sf scan ran the
        interpreted argmax + residual fold in ONE task)."""
        if points is None:
            points = e
        carr = centroids.agg(
            F.collect_list(F.struct("cell", "cu")).alias("cents")
        )
        best = F.array_max(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    V.dot(F.col(enc_col), c["cu"]).alias("sim"),
                    (-c["cell"]).cast("int").alias("negc"),
                    c["cu"].alias("cu"),
                ),
            )
        )
        return points.crossJoin(F.broadcast(carr)).select(
            *vec_cols,
            (-best["negc"]).cast("int").alias("cell"),
            best["cu"].alias("cu"),
        )

    def residual_subs(assigned_df):
        return assigned_df.select(
            "vec_id", "cell",
            F.posexplode(
                F.array(*[F.slice("res", m * dim_sub + 1, dim_sub)
                          for m in range(m_sub)])
            ).alias("m", "sub"),
        )

    def encode(sub_df, codebook):
        """Shuffle-free codeword argmin (same rewrite as
        coarse_assign): the 16-codeword table of each subspace
        collapses to one array row keyed by m; after the 1:1
        broadcast join on m, the winning code is array_min over
        (d, code) structs computed per subvector.  The old shape
        joined every subvector to all 16 codewords (16× row blow-up
        carrying both arrays) and shuffled that through a
        row_number window per (vec_id, m).  Ordering identical to
        orderBy(d, code): (d, code) is unique per codeword since
        code is, so the min is arrival-order-insensitive and the
        same exact distances are compared."""
        cb_by_m = codebook.groupBy("m").agg(
            F.collect_list(F.struct("code", "cvec")).alias("codes")
        )
        best = F.array_min(
            F.transform(
                F.col("codes"),
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("sub"), c["cvec"],
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    c["code"].alias("code"),
                ),
            )
        )
        return sub_df.join(F.broadcast(cb_by_m), "m").select(
            "vec_id", "cell", "m", "sub", best["code"].alias("code")
        )

    cents_schema = f"cell int, cu {_arr_type(det)}"
    cb_schema = f"m int, code int, cvec {_arr_type(det)}"

    def train():
        """Coarse centroids + residual-PQ codebook, exactly the r9
        shapes (det: arithmetic-ranked seeds, no refinement; float:
        limit seeds + one Lloyd step on each level), returned as
        plain row lists so the cache entry is k-sized data."""
        # --- coarse quantizer --------------------------------------
        if det:
            # cell = vec_id // 64 IS the ascending rank of the
            # eligible seeds — pure arithmetic, no limit, no Lloyd
            cents_rows = [
                (r["cell"], list(r["cu"]))
                for r in e.where(
                    (F.col("vec_id") % 64 == 0)
                    & (F.col("vec_id") < 64 * n_cells)
                )
                .select(
                    (F.col("vec_id") / 64).cast("int").alias("cell"),
                    F.col(enc_col).alias("cu"),
                )
                .collect()
            ]
        else:
            seeds = (
                e.where(F.col("vec_id") % 64 == 0)
                .select(F.col("vec_id").alias("cent_id"), F.col("u").alias("cu"))
                .limit(n_cells)
                .collect()
            )
            cents_rows = [(i, list(r["cu"])) for i, r in enumerate(seeds)]
            lloyd = (
                coarse_assign(
                    spark.createDataFrame(cents_rows, cents_schema)
                )
                .select("cell", F.posexplode("u").alias("dim", "val"))
                .groupBy("cell", "dim")
                .agg(F.avg("val").alias("m"))
                .groupBy("cell")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "m"))),
                        lambda st: st["m"],
                    ).alias("mean_vec")
                )
                .select("cell", V.normalize(F.col("mean_vec")).alias("cu"))
            )
            cents_rows = [(r["cell"], list(r["cu"])) for r in lloyd.collect()]
        cents_t = spark.createDataFrame(cents_rows, cents_schema)
        assigned_t = coarse_assign(cents_t).select(
            "vec_id", "u", "cell",
            F.zip_with(enc_col, "cu", lambda x, y: x - y).alias("res"),
        )
        # --- residual PQ codebook from deterministic seeds ---------
        if det:
            seed_rows = (
                assigned_t.where(
                    (F.col("vec_id") % 32 == 0)
                    & (F.col("vec_id") < 32 * k_codes)
                )
                .select("vec_id", "res")
                .collect()
            )
            cb_rows = [
                (m, r["vec_id"] // 32,
                 list(r["res"][m * dim_sub : (m + 1) * dim_sub]))
                for r in seed_rows
                for m in range(m_sub)
            ]
        else:
            seed_rows = (
                assigned_t.where(F.col("vec_id") % 32 == 0)
                .select("res")
                .limit(k_codes)
                .collect()
            )
            cb_rows = [
                (m, k, list(r["res"][m * dim_sub : (m + 1) * dim_sub]))
                for k, r in enumerate(seed_rows)
                for m in range(m_sub)
            ]
            # one Lloyd refinement of the residual codebooks
            # (production path only — the verified path keeps the
            # exact integer seed codebooks)
            refined = (
                encode(
                    residual_subs(assigned_t),
                    spark.createDataFrame(cb_rows, cb_schema),
                )
                .select("m", "code", F.posexplode("sub").alias("dim", "val"))
                .groupBy("m", "code", "dim")
                .agg(F.avg("val").alias("mu"))
                .groupBy("m", "code")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "mu"))),
                        lambda st: st["mu"],
                    ).alias("cvec")
                )
            )
            cb_rows = [
                (r["m"], r["code"], list(r["cvec"])) for r in refined.collect()
            ]
        return cents_rows, cb_rows

    cents_rows, cb_rows = get_or_train(
        "ivfpq_trained",
        (cache_key, enc_col, det) if cache_key is not None else None,
        train,
    )
    # Warm apply path (round-11 second pass): k-sized trained tables
    # as LocalTableScans (local_df — the pickle-RDD path spawned
    # 32-task micro-stages per consumer), and the corpus-side assign +
    # encode over the fanned-out scan (guarded; the single-file sf
    # scan otherwise runs the interpreted argmax/argmin folds in ONE
    # task).  The training path above keeps the raw frame and plain
    # createDataFrame — its seed picks and cached artifacts must stay
    # byte-identical.
    from guidewire_spark.plans.catalog import fan_out, local_df

    cents = local_df(spark, cents_rows, cents_schema)
    cb1 = local_df(spark, cb_rows, cb_schema)
    assigned = coarse_assign(cents, points=fan_out(e)).select(
        "vec_id", "u", "cell",
        # residual: where the vector sits INSIDE its cell
        F.zip_with(enc_col, "cu", lambda x, y: x - y).alias("res"),
    )
    subs = residual_subs(assigned)
    codes = encode(subs, cb1).select("vec_id", "cell", "m", "code")

    # --- query path: probe top-n cells, residual-ADC, exact rerank --
    q = e.where(F.col("vec_id") < 10)
    q_cells = (
        q.join(F.broadcast(cents))
        .select(
            F.col("vec_id").alias("query_id"), enc_col, "cell", "cu",
            V.dot(F.col(enc_col), F.col("cu")).alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("cell")
                )
            ),
        )
        .where(F.col("rn") <= n_probe)
        # the query's residual is PER PROBED CELL (q minus that cell's
        # centroid) — the LUT must live in the same residual space
        .select(
            "query_id", "cell",
            F.zip_with(enc_col, "cu", lambda x, y: x - y).alias("qres"),
        )
    )
    q_subs = q_cells.select(
        "query_id", "cell",
        F.posexplode(
            F.array(*[F.slice("qres", m * dim_sub + 1, dim_sub)
                      for m in range(m_sub)])
        ).alias("m", "qsub"),
    )
    qdist = F.aggregate(
        F.zip_with(F.col("qsub"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = q_subs.join(F.broadcast(cb1), "m").select(
        "query_id", "cell", "m", "code", qdist.alias("d")
    )  # 10 queries x 2 cells x 8 subspaces x 16 codes = 2560 rows
    adc = (
        codes.join(F.broadcast(lut), ["cell", "m", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("approx_d"))
    )
    shortlist = (
        adc.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("approx_d", "vec_id")
            ),
        )
        .where(F.col("rn") <= 100)
        .select("query_id", "vec_id")
    )
    rescored = (
        shortlist.join(e.select("vec_id", "u"), "vec_id")
        .join(
            F.broadcast(
                q.select(F.col("vec_id").alias("query_id"),
                         F.col("u").alias("q_unit"))
            ),
            "query_id",
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.dot(F.col("q_unit"), F.col("u")), 4).alias("cos_sim"),
        )
    )
    w5 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w5))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@query(
    "similarity_ann_ivfpq_verified",
    oracle="""
    WITH unit AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS fu
      FROM embeddings
    ),
    qv AS MATERIALIZED (
      SELECT vec_id, i AS dim,
             CAST(FLOOR(fu[i + 1] * 10000) AS BIGINT) AS q
      FROM unit, UNNEST(range(0, 64)) AS t(i)
    ),
    cents AS MATERIALIZED (
      SELECT CAST(vec_id // 64 AS INT) AS cell, vec_id AS cvid
      FROM unit WHERE vec_id % 64 = 0 AND vec_id < 512
    ),
    centd AS MATERIALIZED (
      SELECT c.cell, qv.dim, qv.q AS cq
      FROM cents c JOIN qv ON qv.vec_id = c.cvid
    ),
    cdots AS MATERIALIZED (
      SELECT qv.vec_id, cd.cell, SUM(qv.q * cd.cq) AS s
      FROM qv JOIN centd cd ON cd.dim = qv.dim
      GROUP BY qv.vec_id, cd.cell
    ),
    assign AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, cell) AS rn
        FROM cdots
      ) WHERE rn = 1
    ),
    res AS MATERIALIZED (
      SELECT qv.vec_id, a.cell, qv.dim, qv.q - cd.cq AS r
      FROM qv
      JOIN assign a ON a.vec_id = qv.vec_id
      JOIN centd cd ON cd.cell = a.cell AND cd.dim = qv.dim
    ),
    cb AS MATERIALIZED (
      SELECT CAST(s.vec_id // 32 AS INT) AS code,
             res.dim // 8 AS m, res.dim % 8 AS sdim, res.r AS c
      FROM (SELECT vec_id FROM unit
            WHERE vec_id % 32 = 0 AND vec_id < 512) s
      JOIN res ON res.vec_id = s.vec_id
    ),
    dist AS MATERIALIZED (
      SELECT res.vec_id, res.dim // 8 AS m, cb.code,
             SUM((res.r - cb.c) * (res.r - cb.c)) AS d
      FROM res JOIN cb ON cb.m = res.dim // 8 AND cb.sdim = res.dim % 8
      GROUP BY res.vec_id, res.dim // 8, cb.code
    ),
    codes AS MATERIALIZED (
      SELECT d.vec_id, a.cell, d.m, d.code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, code) AS rn
        FROM dist
      ) d JOIN assign a ON a.vec_id = d.vec_id
      WHERE d.rn = 1
    ),
    probes AS MATERIALIZED (
      SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, cell) AS rn
        FROM cdots WHERE vec_id < 10
      ) WHERE rn <= 3
    ),
    qres AS MATERIALIZED (
      SELECT p.query_id, p.cell, qv.dim, qv.q - cd.cq AS r
      FROM probes p
      JOIN qv ON qv.vec_id = p.query_id
      JOIN centd cd ON cd.cell = p.cell AND cd.dim = qv.dim
    ),
    lut AS MATERIALIZED (
      SELECT q.query_id, q.cell, q.dim // 8 AS m, cb.code,
             SUM((q.r - cb.c) * (q.r - cb.c)) AS d
      FROM qres q JOIN cb ON cb.m = q.dim // 8 AND cb.sdim = q.dim % 8
      GROUP BY q.query_id, q.cell, q.dim // 8, cb.code
    ),
    adc AS MATERIALIZED (
      SELECT l.query_id, c.vec_id, SUM(l.d) AS approx_d
      FROM codes c
      JOIN lut l ON l.cell = c.cell AND l.m = c.m AND l.code = c.code
      WHERE c.vec_id <> l.query_id
      GROUP BY l.query_id, c.vec_id
    ),
    short AS MATERIALIZED (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY approx_d, vec_id) AS rn
        FROM adc
      ) WHERE rn <= 100
    ),
    resc AS (
      SELECT s.query_id, s.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(range(1, 65),
                   i -> qq.fu[i] * cc.fu[i])), 4) AS cos_sim
      FROM short s
      JOIN unit qq ON qq.vec_id = s.query_id
      JOIN unit cc ON cc.vec_id = s.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM resc
    ) WHERE rn <= 5
    """,
)
def similarity_ann_ivfpq_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN, hash-verified end-to-end — closing the
    ANN family: the SAME ``_ivfpq_topk`` body as the production row
    (coarse assignment, residual computation, residual-PQ codebooks,
    code assignment, n_probe=3 probed residual-ADC, top-100
    shortlist, exact rerank) on int64-quantized vectors with
    arithmetic-ranked unrefined centroid and codebook seeds — so
    every stage, INCLUDING the composite-specific residual wiring and
    per-cell ADC, is exact integer work the DuckDB oracle replays
    digit-for-digit, probes and all (like the LSH/PQ verified rows,
    the oracle reproduces the approximation's own misses).  Only the
    float Lloyd refinements of the production row remain unverified —
    the training-step class the IVF verified rows already argue.

    Scale shape: identical to production — centroids/codebooks are
    metadata-sized collects, the ADC join carries (cell, m, code)
    keys, candidates touch only probed cells."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.normalize(F.col("embedding")).alias("u")
    )
    e = e.withColumn(
        "qu", F.transform("u", lambda x: F.floor(x * 10000).cast("long"))
    )
    from guidewire_spark.plans.artifact_cache import corpus_fingerprint

    return _ivfpq_topk(
        spark, e, enc_col="qu", det=True,
        cache_key=corpus_fingerprint(sf_dir, "embeddings"),
    )


@query(
    "retrieval_hybrid_rrf",
    oracle="""
    WITH corpus AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               w -> w <> '')) AS toks
      FROM documents WHERE doc_id < 200
    ),
    lex AS (
      SELECT q.doc_id AS query_id, d.doc_id AS cand_id,
             ROUND(
               CAST(len(list_intersect(q.toks, d.toks)) AS DOUBLE)
               / (len(q.toks) + len(d.toks)
                  - len(list_intersect(q.toks, d.toks))),
               4) AS jac
      FROM corpus q JOIN corpus d ON d.doc_id <> q.doc_id
      WHERE q.doc_id < 3
    ),
    lex_rank AS (
      SELECT query_id, cand_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY jac DESC, cand_id) AS r
      FROM lex
    ),
    unit AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
      FROM embeddings WHERE vec_id < 200
    ),
    sem AS (
      SELECT q.vec_id AS query_id, d.vec_id AS cand_id,
             ROUND(list_sum(list_transform(range(1, 65),
                   i -> q.u[i] * d.u[i])), 4) AS cos_sim
      FROM unit q JOIN unit d ON d.vec_id <> q.vec_id
      WHERE q.vec_id < 3
    ),
    sem_rank AS (
      SELECT query_id, cand_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, cand_id) AS r
      FROM sem
    ),
    fused AS (
      SELECT COALESCE(l.query_id, s.query_id) AS query_id,
             COALESCE(l.cand_id, s.cand_id) AS cand_id,
             ROUND(COALESCE(1.0 / (60 + l.r), 0)
                   + COALESCE(1.0 / (60 + s.r), 0), 6) AS rrf
      FROM (SELECT * FROM lex_rank WHERE r <= 20) l
      FULL OUTER JOIN (SELECT * FROM sem_rank WHERE r <= 20) s
        ON l.query_id = s.query_id AND l.cand_id = s.cand_id
    )
    SELECT query_id, cand_id, rrf FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY rrf DESC, cand_id) AS rn
      FROM fused
    ) WHERE rn <= 5
    """,
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal rank fusion (Cormack et al.
    2009): a lexical ranking (token-set Jaccard, the more-like-this
    shape) and a semantic ranking (unit-cosine over the embedding
    column) are each cut to top-20 per query, then fused by
    score = Σ 1/(60 + rank) — rank-only fusion, so the two systems'
    incomparable score scales never touch.  The production RAG-stack
    pattern: BM25 index + vector index, RRF at the top.

    Scale shape: both rankings broadcast the 3-query side against the
    corpus (one fused projection each, no shuffle on the corpus), the
    per-system cut is a partition-local top-k window over query_id,
    and fusion joins two 60-row frames.  Both ranks order by the
    ROUNDED score with cand_id tiebreak, and the fused score rounds
    before its own rank — float-order-proof end to end.  Guarded
    ``fan_out`` (round-11 second pass): the single-file sf scan ran
    the tokenize + intersect scoring in ONE task; no-op at real
    scale."""
    from guidewire_spark.plans.catalog import fan_out

    docs = (
        fan_out(load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200))
        .select(
            "doc_id",
            F.array_distinct(T.words(F.lower(F.col("text")))).alias("toks"),
        )
    )
    dq = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("toks").alias("qtoks")
    )
    inter = F.size(F.array_intersect(F.col("qtoks"), F.col("toks")))
    lex = (
        docs.join(F.broadcast(dq), F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("doc_id").alias("cand_id"),
            F.round(
                inter.cast("double")
                / (F.size("qtoks") + F.size("toks") - inter),
                4,
            ).alias("jac"),
        )
    )
    wl = Window.partitionBy("query_id").orderBy(F.col("jac").desc(), "cand_id")
    lex_rank = lex.withColumn("r", F.row_number().over(wl)).where(F.col("r") <= 20)

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 200)
        .select("vec_id", V.normalize(F.col("embedding")).alias("u"))
    )
    eq = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
    )
    sem = (
        emb.join(F.broadcast(eq), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(V.dot(F.col("qu"), F.col("u")), 4).alias("cos_sim"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "cand_id"
    )
    sem_rank = sem.withColumn("r", F.row_number().over(ws)).where(F.col("r") <= 20)

    fused = (
        lex_rank.select("query_id", "cand_id", F.col("r").alias("rl"))
        .join(
            sem_rank.select("query_id", "cand_id", F.col("r").alias("rs")),
            ["query_id", "cand_id"],
            "full_outer",
        )
        .select(
            "query_id",
            "cand_id",
            F.round(
                F.coalesce(F.lit(1.0) / (60 + F.col("rl")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (60 + F.col("rs")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), "cand_id")
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .where(F.col("rn") <= 5)
        .select("query_id", "cand_id", "rrf")
    )


@query(
    "multimodal_shot_boundaries",
    oracle="""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % 6 = 0
        AND octet_length(encode(text)) = length(text)
        AND length(text) >= 64
    ),
    ch AS (
      SELECT doc_id,
             CAST((i - 1) // 64 AS INT) AS frame_idx,
             unicode(substr(text, CAST(i AS INT), 1)) AS code
      FROM d, UNNEST(range(1, (length(text) // 64) * 64 + 1)) AS t(i)
    ),
    fr AS (
      SELECT doc_id, frame_idx, CAST(SUM(code) AS BIGINT) AS csum
      FROM ch GROUP BY doc_id, frame_idx
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, frame_idx, csum,
           COALESCE(ABS(csum - LAG(csum) OVER
             (PARTITION BY doc_id ORDER BY frame_idx)) >= 512, FALSE)
             AS is_boundary
    FROM fr
    """,
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection for video-like payloads: decode frames
    (64-byte windows over the byte stream — the deterministic stand-in
    for real frame decode; no codecs in this container), extract one
    luma-like feature per frame (byte-sum, exact integer), and flag a
    boundary wherever consecutive frames' features jump by >= 512
    (mean-per-byte jump of 8) — the classic frame-difference cut
    detector, on Spark primitives.

    Scale shape: the Arrow stage emits (doc, frame_idx, csum) — frame
    FEATURES multiply, bytes never leave the executor — and boundary
    detection is a partition-local lag window per doc (docs are
    bounded; no global window).  The feature is an exact integer sum
    over pure-ASCII payloads, so the whole pipeline — including the
    mapInPandas decode — is value-verified by the DuckDB oracle, the
    multimodal family's temporal-pipeline proof."""
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .where(
            (F.col("doc_id") % 6 == 0)
            & (F.octet_length(F.encode(F.col("text"), "utf-8"))
               == F.length(F.col("text")))
            & (F.length("text") >= 64)
        )
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )

    def frame_features(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "csum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                for i in range(len(buf) // 64):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["csum"].append(sum(buf[i * 64 : (i + 1) * 64]))
            yield pd.DataFrame(out)

    frames = d.mapInPandas(
        frame_features, "doc_id long, frame_idx int, csum long"
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    return frames.select(
        "doc_id",
        "frame_idx",
        "csum",
        F.coalesce(
            F.abs(F.col("csum") - F.lag("csum").over(w)) >= 512, F.lit(False)
        ).alias("is_boundary"),
    )


@query(
    "sample_kcenter_greedy",
    oracle="""
    WITH unit AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_sum(list_transform(embedding,
                    y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
      FROM embeddings WHERE vec_id < 200
    ),
    dist AS (
      SELECT a.vec_id AS p, b.vec_id AS c,
             CAST(ROUND((1.0 - list_sum(list_transform(range(1, 65),
                  i -> a.u[i] * b.u[i]))) * 10000) AS BIGINT) AS d
      FROM unit a JOIN unit b
        ON b.vec_id IN (SELECT vec_id FROM unit)
    ),
    s1 AS (
      SELECT p, d FROM dist WHERE c = 0
    ),
    p1 AS (SELECT p, d FROM s1 WHERE p <> 0
           ORDER BY d DESC, p ASC LIMIT 1),
    s2 AS (
      SELECT s1.p, LEAST(s1.d, dist.d) AS d
      FROM s1 JOIN dist ON dist.p = s1.p AND dist.c = (SELECT p FROM p1)
    ),
    p2 AS (SELECT p, d FROM s2 WHERE p <> 0 AND p NOT IN (SELECT p FROM p1)
           ORDER BY d DESC, p ASC LIMIT 1),
    s3 AS (
      SELECT s2.p, LEAST(s2.d, dist.d) AS d
      FROM s2 JOIN dist ON dist.p = s2.p AND dist.c = (SELECT p FROM p2)
    ),
    p3 AS (SELECT p, d FROM s3 WHERE p <> 0
             AND p NOT IN (SELECT p FROM p1 UNION SELECT p FROM p2)
           ORDER BY d DESC, p ASC LIMIT 1),
    s4 AS (
      SELECT s3.p, LEAST(s3.d, dist.d) AS d
      FROM s3 JOIN dist ON dist.p = s3.p AND dist.c = (SELECT p FROM p3)
    ),
    p4 AS (SELECT p, d FROM s4 WHERE p <> 0 AND p NOT IN
             (SELECT p FROM p1 UNION SELECT p FROM p2 UNION SELECT p FROM p3)
           ORDER BY d DESC, p ASC LIMIT 1)
    SELECT 1 AS step, p AS vec_id, d AS dist_q4 FROM p1
    UNION ALL SELECT 2, p, d FROM p2
    UNION ALL SELECT 3, p, d FROM p3
    UNION ALL SELECT 4, p, d FROM p4
    """,
)
def sample_kcenter_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy (farthest-point) diversity sampling — the
    coreset selector training-data pipelines use to pick maximally
    spread exemplars (each step takes the point farthest from the
    chosen set; 2-approximation to the k-center optimum, Gonzalez
    1985).  Seeded at vec_id 0, four greedy steps over cosine
    distance.

    Scale shape: the chosen set is k vectors — BROADCAST — so each
    step is one corpus pass computing min-distance-to-chosen via a
    fused fold, and the argmax folds through ONE max_by aggregate
    (no sort, no window).  The driver holds k vectors and k picks,
    never the corpus.  Determinism: distances quantize to integer
    1e-4 units before any comparison and the argmax key packs
    (dist, -vec_id) into one BIGINT, so every step — and therefore
    the whole iteration — is float-order-proof."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 200)
        .select("vec_id", V.normalize(F.col("embedding")).alias("u"))
    )

    def dist_to(vec):
        dot = F.aggregate(
            F.zip_with(F.col("u"), F.array(*[F.lit(x) for x in vec]),
                       lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.round((F.lit(1.0) - dot) * 10000).cast("long")

    seed = e.where(F.col("vec_id") == 0).select("u").first()["u"]
    cur = e.select("vec_id", "u", dist_to(seed).alias("d")).where(
        F.col("vec_id") != 0
    )
    picks = []
    for step in range(1, 5):
        # pack (distance, smallest-id tiebreak) into one max_by key
        key = F.col("d") * 1000000 + (F.lit(999999) - F.col("vec_id"))
        pick = cur.agg(
            F.max_by(F.struct("vec_id", "d"), key).alias("p")
        ).first()["p"]
        picks.append((step, pick["vec_id"], pick["d"]))
        if step == 4:
            break
        vec = e.where(F.col("vec_id") == pick["vec_id"]).first()["u"]
        cur = cur.where(F.col("vec_id") != pick["vec_id"]).select(
            "vec_id", "u", F.least(F.col("d"), dist_to(vec)).alias("d")
        )
    # local_df, not createDataFrame: the k-sized result frame as a
    # LocalTableScan instead of a 32-slice pickle-RDD micro-stage
    from guidewire_spark.plans.catalog import local_df

    return local_df(spark, picks, "step int, vec_id long, dist_q4 long")


@query(
    "er_survivorship_merge",
    oracle="""
    SELECT doc_id % 50 AS entity_id,
           COUNT(*) AS n_members,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           min_by(n_chars,
                  CAST(substr(source, 4) AS BIGINT) * 1000000000 + doc_id)
             AS trusted_chars,
           max_by(lang, doc_id) AS freshest_lang
    FROM documents
    GROUP BY doc_id % 50
    """,
)
def er_survivorship_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (the MDM step AFTER entity resolution): matched
    records collapse into one golden record with per-FIELD rules —
    here 'trusted source wins' for the content field (lowest source
    number, doc_id tiebreak) and 'freshest wins' for the language
    field (highest doc_id as the recency proxy), alongside the
    aggregate facts.  Complements dedup_cluster_canonical (which
    keeps one whole ROW): survivorship composes each field from a
    DIFFERENT member.

    Scale shape: one hash aggregate per entity — every per-field rule
    is a max_by/min_by with a UNIQUE packed ordering key, so the
    golden record falls out of the same single shuffle as the counts
    (no window, no self-join, no per-field passes)."""
    d = load_table(spark, sf_dir, "documents")
    trust_key = (
        F.substring("source", 4, 10).cast("long") * 1000000000
        + F.col("doc_id")
    )
    return (
        d.groupBy((F.col("doc_id") % 50).alias("entity_id"))
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
            F.min_by("n_chars", trust_key).alias("trusted_chars"),
            F.max_by("lang", F.col("doc_id")).alias("freshest_lang"),
        )
    )
