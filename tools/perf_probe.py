"""Scratch perf probes for hot queries — compare implementation variants.

Usage: python tools/perf_probe.py [sf_dir]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from guidewire_spark.plans.session import get_spark
from guidewire_spark.functions import text as T
from guidewire_spark.functions import vectors as V

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(app_name="perf-probe")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
emb.count(); docs.count()  # warm

DIM = len(emb.select("embedding").first()[0])
print(f"dim={DIM}, emb rows={emb.count()}, docs={docs.count()}")


def dot_unrolled(a, b, dim):
    expr = F.lit(0.0)
    for i in range(dim):
        expr = expr + a[i].cast("double") * b[i].cast("double")
    return expr


def timeit(label, fn, reps=3):
    best = min(run_once(fn) for _ in range(reps))
    print(f"{label}: {best:.3f}s")
    return best


def run_once(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


# ---- similarity: HOF fold vs unrolled codegen ----
e = emb.select("vec_id", V.normalize(F.col("embedding")).alias("u"))
q = e.where(F.col("vec_id") < 10).select(
    F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
)
w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))


def topk(dot_fn):
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(dot_fn(F.col("qu"), F.col("u")), 4).alias("cos_sim"),
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )


timeit("similarity HOF fold", lambda: topk(V.dot).count())
timeit("similarity unrolled", lambda: topk(lambda a, b: dot_unrolled(a, b, DIM)).count())

# check identical results
r1 = {tuple(r) for r in topk(V.dot).collect()}
r2 = {tuple(r) for r in topk(lambda a, b: dot_unrolled(a, b, DIM)).collect()}
print("identical:", r1 == r2)

# ---- minhash: explode+groupBy vs array-local min ----
import random

rng = random.Random(42)
p = 2_147_483_647
n_hashes, n_bands = 32, 8
rows_per_band = n_hashes // n_bands
coeffs = [(rng.randrange(1, p), rng.randrange(0, p)) for _ in range(n_hashes)]

d = docs.repartition(spark.sparkContext.defaultParallelism)
sids = F.array_distinct(
    F.transform(T.word_shingles(F.col("text"), 3), lambda s: (F.xxhash64(s) % p + p) % p)
)


def pairs_from(minhashes):
    bands_long = minhashes.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)])
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    x, y = bands_long.alias("x"), bands_long.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def mh_explode():
    sid_rows = d.select("doc_id", F.explode(sids).alias("sid"))
    return sid_rows.groupBy("doc_id").agg(
        *[
            F.min((F.col("sid") * F.lit(a) + F.lit(b)) % p).alias(f"mh_{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )


def _perm_min(col, a, b):
    return F.array_min(F.transform(col, lambda s: (s * a + b) % p))


def mh_array():
    with_sids = d.select("doc_id", sids.alias("sids"))
    return with_sids.select(
        "doc_id",
        *[
            _perm_min(F.col("sids"), a, b).alias(f"mh_{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
    )


timeit("minhash explode+groupBy (sig only)", lambda: mh_explode().count(), reps=2)
timeit("minhash array-local     (sig only)", lambda: mh_array().count(), reps=2)
timeit("minhash explode full pairs", lambda: pairs_from(mh_explode()).count(), reps=2)
timeit("minhash array   full pairs", lambda: pairs_from(mh_array()).count(), reps=2)
ra = {tuple(r) for r in pairs_from(mh_explode()).collect()}
rb = {tuple(r) for r in pairs_from(mh_array()).collect()}
print("minhash identical:", ra == rb)

spark.stop()
