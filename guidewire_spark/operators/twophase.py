"""Two-phase global ordered computations — the scale-safe substitute
for ``Window.orderBy(...)`` with no partition key.

A global window funnels the whole input through ONE task; at 100 TB
that single partition is the job.  The two-phase shape keeps every
data-sized stage parallel:

1. ``repartitionByRange(parts, *order_cols)`` — each partition holds a
   contiguous slice of the global order (phase-1 shuffle, the only
   data-sized movement).
2. Partition-local window (row_number / running sum / lead) keyed by
   ``spark_partition_id()`` — parallel across all ``parts`` tasks.
3. A ``parts``-row per-partition summary (counts / sums / first keys)
   is prefix-combined with a window over ``pid`` — trivially small —
   and **broadcast** back as each partition's carry-in offset.

The result is exactly the global window's answer because row counts,
sums, and min/max are associative across the partition order.  This is
the pattern agg_lift_gains_table and skyline_pareto_frontier
introduced (evaluation_ext.py / audit2_ext.py, both plan-locked);
this module is the shared implementation the rest of the registry
retrofits onto.

Plan signature (what the plan locks assert): ``SPARK_PARTITION_ID()``
present, the data-sized window's exchange is ``hashpartitioning(__pid``
(or the helper's pid alias), and a ``rangepartitioning(...)`` phase-1
exchange; the only SinglePartition window left is the parts-row prefix
combine.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pid"
_LOCAL_RN = "__local_rn"

# Bounded FIFO of pinned (persisted) partitioned frames — see
# _pin_partitioning.  Eviction unpersists the OLDEST pin.  CAUTION:
# DataFrames are lazy and re-execute per action, so ANY action on a
# two-phase frame after its pin was evicted — whether it already ran
# or not — re-opens the boundary-desync bug the pin fixes (each
# consumer branch re-samples its own range exchange).  Held two-phase
# DataFrames must therefore be RE-BUILT, not re-collected, once more
# than _PIN_CAP two-phase frames have been constructed since; every
# in-repo consumer (registry sweep, bench, driver harness, tests)
# builds, materializes, and drops each query adjacently, so 32 leaves
# ~30× slack, and eviction warns loudly (below) so a violating
# workload is visible rather than intermittently wrong.
_PIN_FIFO: list = []
_PIN_CAP = 32
_RESERVED_PREFIXES = ("__pid", "__local_rn", "__offset", "__run_", "__off_",
                      "__sum_", "__cnt", "__local_lead", "__first",
                      "__next_first", "__keep_")


def _default_parts(df: DataFrame) -> int:
    """Partition count for the phase-1 range shuffle: the larger of the
    cluster's parallelism and the session's configured shuffle
    partitions (never fewer than 16).  ``spark.sql.shuffle.partitions``
    is the knob operators already size to their data volume (a 100 TB
    job runs with thousands), so tracking it keeps per-partition bytes
    bounded the same way every other shuffle in the job is bounded;
    callers with unusual inputs can still pass ``parts`` explicitly."""
    try:
        spark = df.sparkSession
        shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "16"))
        cores = spark.sparkContext.defaultParallelism
        return max(16, cores, shuffle)
    except Exception:
        return 16


def _pin_partitioning(parted: DataFrame) -> DataFrame:
    """Pin the range-partitioned, pid-stamped frame so its TWO
    consumers (the partition-local window and the parts-row summary)
    observe the SAME partition boundaries.

    Why this is load-bearing: the range exchange SAMPLES its
    boundaries, and when column pruning narrows one consumer's scan
    the two below-exchange plans stop being canonically equal — each
    branch then gets its OWN independently-sampled exchange, whose
    boundaries can disagree.  Local ranks computed under boundary set
    A combined with broadcast offsets computed under boundary set B
    produce duplicate/gapped global ranks (caught intermittently at
    sf0.1 by window_rolling_median; invisible in narrow queries where
    both branches prune to identical columns and the exchange IS
    reused).  ``persist()`` routes both consumers through one
    InMemoryRelation — the frame is computed once per partition and
    the pid assignment is shared.  MEMORY_AND_DISK, so at scale this
    degrades to a disk materialization (the same order of cost as the
    range shuffle itself, and the price of a deterministic boundary);
    the SQL plan keeps the rangepartitioning exchange visible inside
    the InMemoryRelation, which the plan locks assert on.

    Leak control (round-6 review finding): every call registers an
    InMemoryRelation in Spark's CacheManager and the lazy API has no
    natural unpersist point, so pins are tracked in a bounded FIFO —
    when it overflows, the OLDEST pin is unpersisted (non-blocking).
    The cap comfortably exceeds the number of two-phase frames any
    single query composes (the max observed is 2, Kaplan-Meier), so a
    query under construction never loses its pin; a long session
    sweeping hundreds of queries stays bounded instead of
    accumulating spilled cache blocks forever."""
    from pyspark import StorageLevel

    pinned = parted.persist(StorageLevel.MEMORY_AND_DISK)
    _PIN_FIFO.append(pinned)
    while len(_PIN_FIFO) > _PIN_CAP:
        import warnings

        old = _PIN_FIFO.pop(0)
        warnings.warn(
            "two-phase pin FIFO overflow: unpersisting the oldest "
            "pinned frame — ANY further action on that frame "
            "(including re-collecting one that already ran: "
            "DataFrames re-execute per action) may desync its "
            "range-partition boundaries between consumers; re-BUILD "
            "held two-phase frames after eviction, and call "
            "clear_two_phase_pins() between query executions instead "
            "of constructing >32 two-phase queries up front",
            RuntimeWarning,
            stacklevel=2,
        )
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session may already be stopped
    return pinned


def register_pin(df: DataFrame) -> DataFrame:
    """Track an ALREADY-persisted frame in the pin FIFO so
    ``clear_two_phase_pins()`` (called by the bench / registry sweep
    between query executions) releases it.  For operators outside the
    two-phase family that persist a diamond intermediate for the
    duration of one query: without registration each invocation leaks
    an InMemoryRelation in Spark's CacheManager for the session's
    lifetime."""
    _PIN_FIFO.append(df)
    return df


def clear_two_phase_pins() -> int:
    """Unpersist every pinned two-phase frame — the explicit cleanup
    hook for long-lived sessions that execute many two-phase queries
    (the registry sweep and bench call this between queries, so pins
    never approach the FIFO cap and the eviction warning stays
    theoretical).  SAFE only between query executions: a constructed-
    but-not-yet-run two-phase DataFrame loses its boundary pin.
    Returns the number of pins released."""
    n = len(_PIN_FIFO)
    while _PIN_FIFO:
        df = _PIN_FIFO.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
    return n


def _check_columns(df: DataFrame) -> None:
    """Reject inputs whose columns collide with the helper's internal
    names — a pre-existing ``__offset``/``__run_*`` would be silently
    overwritten or raise AMBIGUOUS_REFERENCE deep inside the plan."""
    bad = [
        c for c in df.columns if any(c.startswith(p) for p in _RESERVED_PREFIXES)
    ]
    if bad:
        raise ValueError(
            f"input columns {bad} collide with two-phase internal names "
            f"(reserved prefixes: {_RESERVED_PREFIXES})"
        )


def two_phase_ordered(
    df: DataFrame,
    order_cols: Sequence[Column],
    *,
    parts: int | None = None,
    rank_name: str | None = "rnk",
    total_name: str | None = None,
    cumsums: Mapping[str, str] | None = None,
    sum_totals: Mapping[str, str] | None = None,
) -> DataFrame:
    """Attach global-order columns to ``df`` without a global window.

    ``order_cols``
        The total order (include a unique tiebreaker — rank ties are
        the one thing range partitioning cannot arbitrate
        deterministically).
    ``rank_name``
        Name for the global ``row_number`` column (None to skip).
    ``total_name``
        Name for a broadcast COUNT(*) OVER () column (None to skip).
    ``cumsums``
        ``{out_name: value_col}`` inclusive running sums in the global
        order (``SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``),
        with exact NULL semantics: the sum is NULL only while NO
        non-null value has appeared yet in the global prefix.
    ``sum_totals``
        ``{out_name: value_col}`` grand totals (``SUM(v) OVER ()``),
        computed on the parts-row summary and broadcast.  Output names
        must not overlap ``cumsums`` (rejected — the two would
        silently shadow each other).

    Returns ``df``'s columns plus the requested ones.  All data-sized
    stages stay parallel; the only single-partition window runs over
    the ``parts``-row summary.
    """
    cumsums = dict(cumsums or {})
    sum_totals = dict(sum_totals or {})
    overlap = set(cumsums) & set(sum_totals)
    if overlap:
        raise ValueError(
            f"cumsums and sum_totals share output names {sorted(overlap)}; "
            "give the running sum and the grand total distinct names"
        )
    _check_columns(df)
    if parts is None:
        parts = _default_parts(df)
    parted = _pin_partitioning(
        df.repartitionByRange(parts, *order_cols).withColumn(
            _PID, F.spark_partition_id()
        )
    )
    w_local = Window.partitionBy(_PID).orderBy(*order_cols)
    w_run = w_local.rowsBetween(Window.unboundedPreceding, 0)
    local = parted.withColumn(_LOCAL_RN, F.row_number().over(w_local))
    for out, src in cumsums.items():
        local = local.withColumn(f"__run_{out}", F.sum(src).over(w_run))
        # non-null count in the local prefix: distinguishes "no values
        # yet" (window answer NULL) from "values summed so far"
        local = local.withColumn(f"__runc_{out}", F.count(src).over(w_run))

    aggs = [F.count("*").alias("__cnt")]
    for out, src in cumsums.items():
        aggs.append(F.sum(src).alias(f"__sum_{out}"))
        aggs.append(F.count(src).alias(f"__sumc_{out}"))
    for out, src in sum_totals.items():
        aggs.append(F.sum(src).alias(f"__sum_{out}"))
    per_pid = parted.groupBy(_PID).agg(*aggs)

    # parts-row prefix combine: exclusive prefix sums become each
    # partition's carry-in; whole-table sums become broadcast totals
    w_prefix = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    sel: list[Column] = [
        F.col(_PID),
        F.coalesce(F.sum("__cnt").over(w_prefix), F.lit(0)).alias("__offset"),
    ]
    if total_name is not None:
        sel.append(F.sum("__cnt").over(w_all).alias(total_name))
    for out in cumsums:
        sel.append(
            F.coalesce(F.sum(f"__sum_{out}").over(w_prefix), F.lit(0)).alias(
                f"__off_{out}"
            )
        )
        sel.append(
            F.coalesce(F.sum(f"__sumc_{out}").over(w_prefix), F.lit(0)).alias(
                f"__offc_{out}"
            )
        )
    for out in sum_totals:
        sel.append(F.sum(f"__sum_{out}").over(w_all).alias(out))
    offsets = per_pid.select(*sel)

    out_df = local.join(F.broadcast(offsets), _PID)
    if rank_name is not None:
        out_df = out_df.withColumn(
            rank_name, F.col("__offset") + F.col(_LOCAL_RN)
        )
    for out in cumsums:
        # SUM over a window frame is NULL iff the frame holds no
        # non-null value; otherwise nulls are ignored — reproduce that
        # exactly across the partition boundary
        seen = F.col(f"__runc_{out}") + F.col(f"__offc_{out}")
        out_df = out_df.withColumn(
            out,
            F.when(
                seen > 0,
                F.coalesce(F.col(f"__off_{out}"), F.lit(0))
                + F.coalesce(F.col(f"__run_{out}"), F.lit(0)),
            ),
        )
    drop = [_PID, _LOCAL_RN, "__offset"]
    for o in cumsums:
        drop += [f"__run_{o}", f"__runc_{o}", f"__off_{o}", f"__offc_{o}"]
    return out_df.drop(*drop)


def ntile_from_rank(n: int, rank: str = "rnk", total: str = "n_total") -> Column:
    """NTILE(n) derived from a global rank + total count — the exact
    remainder-to-leading-buckets arithmetic (first ``total % n``
    buckets hold ``total div n + 1`` rows, the rest ``total div n``),
    so a two-phase rank reproduces the window function bit-for-bit.
    The CASE guards the ``total < n`` corner (q = 0): every row lands
    in the WHEN branch, so the ELSE's division by q never evaluates.
    """
    q = f"({total} div {n})"
    r = f"({total} % {n})"
    return F.expr(
        f"CASE WHEN {rank} <= {r} * ({q} + 1) "
        f"THEN ({rank} - 1) div ({q} + 1) + 1 "
        f"ELSE {r} + ({rank} - {r} * ({q} + 1) - 1) div {q} + 1 END"
    )


def two_phase_lead(
    df: DataFrame,
    key_col: str,
    *,
    parts: int | None = None,
    lead_name: str = "next_key",
) -> DataFrame:
    """``LEAD(key) OVER (ORDER BY key)`` without a global window:
    partition-local lead, then boundary stitching — each partition's
    tail row takes the FIRST key of the next non-empty partition,
    read from the broadcast parts-row summary (min key per pid,
    lead-combined over the pid order).  The final global tail stays
    NULL, exactly like the window form.

    NULL keys are EXCLUDED from the sequence (filtered before
    partitioning): the coalesce-based boundary stitch cannot
    distinguish "partition tail" from "successor's key is NULL", and
    for the ID-sequence audits this helper serves, a NULL id is an
    absent id, not a sequence member."""
    _check_columns(df)
    df = df.where(F.col(key_col).isNotNull())
    if parts is None:
        parts = _default_parts(df)
    parted = _pin_partitioning(
        df.repartitionByRange(parts, F.asc(key_col)).withColumn(
            _PID, F.spark_partition_id()
        )
    )
    w_local = Window.partitionBy(_PID).orderBy(key_col)
    local = parted.withColumn("__local_lead", F.lead(key_col).over(w_local))
    per_pid = parted.groupBy(_PID).agg(F.min(key_col).alias("__first"))
    nxt = per_pid.select(
        _PID,
        F.lead("__first").over(Window.orderBy(_PID)).alias("__next_first"),
    )
    out = local.join(F.broadcast(nxt), _PID).withColumn(
        lead_name, F.coalesce("__local_lead", "__next_first")
    )
    return out.drop(_PID, "__local_lead", "__next_first")
