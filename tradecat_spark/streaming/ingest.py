"""Streaming candle ingest: micro-batch source → idempotent merge-upsert.

Reference S1/S2/S3: the WebSocket collector buffers 1m candle updates in
a 3 s window (max 1000 rows) and flushes them through a COPY + ``ON
CONFLICT DO UPDATE`` upsert whose conflict action implements the
partial-bar merge law (ws.py:30-114, timescale.py:53-125,
001_timescaledb.sql:106-119).

Spark-first: the buffer window IS the trigger interval; the upsert is a
``foreachBatch`` that folds the batch per key (``operators.merge.
fold_batch``) and merges it into the bronze store with ``merge_candles``.

Scale design (mirrors TimescaleDB's 1-day chunks,
001_timescaledb.sql:9-35): the store is hash/date **partitioned**, and a
micro-batch only ever reads and rewrites the partitions its keys touch —
a live 1m feed touches today's partition, never the historical ones, so
per-trigger work is O(hot partition), not O(store). Nothing is ever
materialized on the driver.

Commit protocol (crash-safe without a transaction log): the merged
touched partitions are written ONCE to a staging path by Spark (the
store is never the input of a job that overwrites it), then committed
by renaming the partition directories into place — an O(#partitions)
filesystem metadata operation, not a second data write. A crash before
the commit leaves the old store intact; a crash mid-commit leaves some
partitions new and some old, and replaying the micro-batch (the
streaming checkpoint has not advanced past a failed batch) reconverges
because the merge law is idempotent — the same exactly-once-by-
idempotence story the reference gets from ON CONFLICT. Rename is atomic
on local/HDFS filesystems; on object stores without rename, use the
Delta path: when delta-spark is importable and the store is a Delta
table, ``upsert_batch`` is one atomic ``DeltaTable.merge()`` and the
staging dance disappears entirely.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tradecat_spark.operators.merge import (
    DELTA_MERGE_SET,
    MERGE_COLS,
    detect_order_col,
    fold_batch,
    merge_candles,
)

# Partition column added to the store layout (derived from the merge
# keys, so it never needs to travel with the data).
PART_COL = "_part"
_HASH_PARTS = 32


def _part_expr(df: DataFrame, keys: list[str]) -> Column:
    """Partition expression for the store layout.

    If a timestamp/date key exists, partition by its calendar date — the
    TimescaleDB 1-day-chunk layout, which confines a live feed's writes
    to the current day. Otherwise fall back to a uniform hash bucket of
    the full key.
    """
    dtypes = dict(df.dtypes)
    for k in keys:
        if dtypes.get(k, "").startswith(("timestamp", "date")):
            return F.date_format(F.col(k), "yyyy-MM-dd")
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(_HASH_PARTS)).cast(
        "string"
    )


def _delta_table(spark: SparkSession, store_path: str):
    """The store as a DeltaTable, or None when the runtime has no
    delta-spark / the store is not Delta (this container ships neither,
    so the parquet + rename-commit path below is the tested one)."""
    try:
        from delta.tables import DeltaTable  # noqa: PLC0415
    except ImportError:
        return None
    try:
        if not DeltaTable.isDeltaTable(spark, store_path):
            return None
        return DeltaTable.forPath(spark, store_path)
    except Exception:
        return None


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    keys: list[str],
    order_col: str | None = None,
) -> None:
    """Merge one micro-batch of (possibly partial) bars into the store.

    1. Fold intra-batch duplicates per key (latest write wins under the
       merge law) — a 3 s buffer routinely carries several partial
       updates of the same live bar.
    2. Read ONLY the store partitions the batch touches (partition
       pruning on ``_part``), merge with the folded batch.
    3. Stage the merged partitions once, then commit them by directory
       rename (or, on a Delta store, skip 2-3 for one atomic MERGE).

    Intra-batch ordering: the fold needs an arrival order per key. Pass
    ``order_col`` (event time / Kafka offset); a conventional column
    (``ORDER_COL_CANDIDATES``: event_ts, kafka_offset) is auto-detected
    when none is given. A multi-partition batch with no resolvable
    order is an error (see fold_batch).
    """
    if order_col is None:
        order_col = detect_order_col(batch.columns)
    extra = [order_col] if order_col is not None else []
    folded = fold_batch(
        batch.select(*keys, *MERGE_COLS, *extra), keys, order_col
    )

    dt = _delta_table(spark, store_path)
    if dt is not None:
        # Atomic transaction-log commit; the _part equality lets Delta
        # prune the merge to the touched partitions.
        src = folded.withColumn(PART_COL, _part_expr(folded, keys))
        cond = " AND ".join(
            [f"t.{k} = s.{k}" for k in keys] + [f"t.{PART_COL} = s.{PART_COL}"]
        )
        (
            dt.alias("t")
            .merge(src.alias("s"), cond)
            .whenMatchedUpdate(set=DELTA_MERGE_SET)
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    def _merge(existing: DataFrame | None, f: DataFrame) -> DataFrame:
        if existing is None:
            # merge law over an EMPTY target is the folded batch itself
            # (pure source-side pass-through): skip the outer-join
            # stage. The recovery probe already looked for
            # crash-orphaned versions, so empty here really means no
            # prior data for the touched partitions.
            return f.select(*keys, *MERGE_COLS)
        return merge_candles(existing, f, keys)

    upsert_partitions(spark, batch, folded, store_path, keys, _merge)


def upsert_partitions(
    spark: SparkSession,
    probe: DataFrame,
    folded: DataFrame,
    store_path: str,
    keys: list[str],
    merge_fn,
    part_expr: Column | None = None,
) -> None:
    """Generic partition-scoped staged merge-commit — the idempotent
    upsert pattern shared by the candle store and any other silver
    store (the streaming dedup signature store reuses it with an
    insert-if-absent merge and a per-batch partition expression).

    ``probe`` supplies the touched partition values (one tiny distinct
    — pass the RAW batch so the probe job never executes the fold;
    bounded by symbols x dates in a trigger window, not row count).
    Each touched partition's CURRENT data dir is resolved individually
    (published entry, or the newest crash-orphaned version — see
    _partition_data_dir), so a replay after ANY crash point re-reads
    whatever survived and reconverges as long as ``merge_fn`` is
    idempotent. ``merge_fn(existing_or_None, folded)`` returns the
    merged rows (None = no prior data for the touched partitions).
    ``part_expr`` overrides the layout column (default: date of a
    timestamp key, else key-hash bucket)."""
    if part_expr is None:
        part_expr = _part_expr(probe, keys)
    dirs = []
    if os.path.isdir(store_path):
        touched = [
            r[0]
            for r in probe.select(part_expr.alias(PART_COL))
            .distinct()
            .collect()
        ]
        for v in touched:
            d = _partition_data_dir(store_path, f"{PART_COL}={v}")
            if d is not None:
                dirs.append(d)
    if dirs:
        # data files carry the value columns only (partitionBy excludes
        # the layout column), so reading the resolved dirs directly is
        # both prune-exact and parse-free
        merged = merge_fn(spark.read.parquet(*dirs), folded)
    else:
        merged = merge_fn(None, folded)
    merged = merged.withColumn(PART_COL, part_expr)

    staging = f"{store_path}.staging"
    merged.write.mode("overwrite").partitionBy(PART_COL).parquet(staging)
    os.makedirs(store_path, exist_ok=True)
    try:
        _commit_staging(spark, staging, store_path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _partition_data_dir(store_path: str, entry: str) -> str | None:
    """The directory holding ``entry``'s current data, crash-tolerant.

    Normal case: the published ``_part=X`` entry (symlink resolved, or
    a legacy real dir). Recovery case: the entry is missing because a
    commit crashed mid-swap — fall back to the NEWEST dot-prefixed
    version of the partition (``.v*``/``.old-*``); whichever of the
    displaced/new versions is picked, the replayed batch re-merges on
    top and the result reconverges, because the merge law is
    idempotent and latest-write-wins (what must never happen is
    reading NOTHING while displaced data still exists — that was the
    data-loss window the review found in the legacy-upgrade path)."""
    dst = os.path.join(store_path, entry)
    if os.path.isdir(dst):  # follows a symlink
        return os.path.realpath(dst)
    cands = [
        os.path.join(store_path, n)
        for n in os.listdir(store_path)
        if n.startswith(".") and n.endswith(f"-{entry}")
        and os.path.isdir(os.path.join(store_path, n))
    ]
    if not cands:
        return None
    return max(cands, key=_version_rank)


def _version_rank(p: str) -> tuple:
    """Tie-break key for dot-prefixed versioned partition dirs, shared
    by every crash-recovery probe (``_partition_data_dir`` and
    ``read_store``'s pre-first-publish branch — r8 advice: both must
    use the SAME ordering or a crashed store can resolve differently
    depending on which probe sees it first).

    Newest by mtime; name-ordered tie-break: version names carry a
    time_ns prefix (see ``_commit_staging``), so equal-mtime versions
    resolve to the later publish instead of an arbitrary winner.
    Names WITHOUT the 20-digit time prefix are pre-upgrade (uuid-only)
    versions; lexicographic order against them is meaningless (hex a-f
    sorts after any digit), so the flag ranks every time-prefixed name
    above every legacy one at equal mtime — a stale pre-upgrade
    version can never win the tie (r7 advice)."""
    name = os.path.basename(p)
    ver = name[2:]  # strip ".v"
    timed = len(ver) >= 20 and ver[:20].isdigit()
    return (os.path.getmtime(p), timed, name)


#: Test seam: called once per partition right before its atomic swap.
#: Lets the chaos test freeze the commit mid-flight while a concurrent
#: reader hammers the store. Never set in production.
_COMMIT_PAUSE = None


def _commit_staging(spark: SparkSession, staging: str, store_path: str) -> None:
    """Publish the staged partition directories via atomic symlink swap.

    Layout: each live partition entry ``_part=X`` is a SYMLINK to a
    dot-prefixed versioned directory (``.v<id>-_part=X``, invisible to
    parquet readers). Committing a partition is then:

      1. move the staged dir into the store as a new versioned dir
         (same-filesystem rename — metadata only);
      2. build a temp symlink and ``os.rename`` it over ``_part=X`` —
         on POSIX, rename over an existing symlink atomically replaces
         it, so a reader resolving the partition sees the OLD target or
         the NEW target, never a missing or half-replaced directory
         (the r4 protocol parked the old dir first, which exposed a
         window where the partition did not exist at all);
      3. retire the displaced version by parking it dot-prefixed; it is
         deleted on the NEXT commit of that partition (one-commit grace
         so an in-flight reader of the old files can finish).

    A reader that LISTED old files and reads them after the next-commit
    cleanup can still observe FileNotFound — the documented limit of
    the rename store versus the Delta path (upsert_batch docstring); a
    read that starts between commits always sees one consistent
    version. A crash anywhere leaves dot-prefixed debris plus old/new
    partitions, and the replayed micro-batch reconverges under the
    idempotent merge law.

    Separated so the crash seam is explicit (and testable): a failure
    anywhere before this call leaves the store byte-identical.
    ``spark`` is unused here but kept so the seam's signature is stable
    for both commit strategies."""
    import time
    import uuid

    # Version token is nanosecond-time-prefixed so dir NAMES sort in
    # publish order: the crash-recovery probes pick the newest version
    # by (mtime, name), and on filesystems with coarse mtime
    # granularity two versions published within the same tick would
    # otherwise tie with the winner arbitrary — the name breaks the
    # tie deterministically toward the later publish (r6 advice).
    ver = f"{time.time_ns():020d}{uuid.uuid4().hex[:6]}"
    for entry in os.listdir(staging):
        if not entry.startswith(f"{PART_COL}="):
            continue  # _SUCCESS markers etc.
        src = os.path.join(staging, entry)
        dst = os.path.join(store_path, entry)
        real_name = f".v{ver}-{entry}"
        real = os.path.join(store_path, real_name)
        os.rename(src, real)
        tmp_link = os.path.join(store_path, f".link-{ver}-{entry}")
        # relative target keeps the store relocatable
        os.symlink(real_name, tmp_link)
        if _COMMIT_PAUSE is not None:
            _COMMIT_PAUSE(entry)
        old_target = None
        parked_name = None
        if os.path.islink(dst):
            # normalize to the bare version-dir NAME: external tooling
            # or manual repair may have written an absolute or
            # non-canonical target, and the keep set below compares
            # against listdir names — an unnormalized target would get
            # its just-displaced version rmtree'd immediately, exposing
            # in-flight readers (r5 advice)
            old_target = os.path.basename(os.path.realpath(dst))
        elif os.path.isdir(dst):
            # legacy real-dir partition (pre-symlink layout): park it so
            # the swap below is a plain create — one transient-missing
            # window only ever on the first upgrade of a partition (a
            # crash inside it is recovered by _partition_data_dir)
            parked_name = f".old-{ver}-{entry}"
            os.rename(dst, os.path.join(store_path, parked_name))
        os.rename(tmp_link, dst)  # atomic publish (replaces symlink)
        # retire every stale version of THIS partition except the one
        # just published and the one just displaced — whether that was
        # a symlink target or a parked legacy dir, it gets the same
        # one-commit grace for in-flight readers
        keep = {real_name, old_target, parked_name}
        for stale in os.listdir(store_path):
            if stale in keep or not stale.startswith("."):
                continue
            if stale.endswith(f"-{entry}"):
                stale_path = os.path.join(store_path, stale)
                if os.path.islink(stale_path):
                    # crash-orphaned .link-* temp symlink: rmtree
                    # refuses symlinks, so unlink explicitly
                    try:
                        os.unlink(stale_path)
                    except OSError:
                        pass
                else:
                    shutil.rmtree(stale_path, ignore_errors=True)


def read_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Read the candle store without the internal layout column.

    Reader contract for the symlink-swap layout: resolve each partition
    symlink to its versioned directory AT LIST TIME and read those real
    paths. The versioned dir a reader pins survives until the NEXT
    commit of that partition (one-commit grace), so a read that starts
    between commits always sees one consistent version — holding
    symlink-relative paths instead would race the swap (glob old name,
    open after swap → FileNotFound). External readers (DuckDB etc.)
    should do the same realpath-after-listing."""
    entries = sorted(
        e for e in os.listdir(store_path) if e.startswith(f"{PART_COL}=")
    )
    if not entries:
        # crash before the FIRST publish of every partition: the store
        # dir exists but holds only dot-prefixed versioned dirs (data
        # renamed in, symlink never swapped). Recover the newest
        # version per partition — the same rule upsert_batch's probe
        # applies — instead of falling into the legacy branch, whose
        # schema inference fails on a dot-only directory (r5 advice).
        newest: dict[str, str] = {}
        for n in os.listdir(store_path):
            p = os.path.join(store_path, n)
            if (
                not n.startswith(".")
                or f"-{PART_COL}=" not in n
                or os.path.islink(p)
                or not os.path.isdir(p)
            ):
                continue
            entry = f"{PART_COL}=" + n.split(f"-{PART_COL}=", 1)[1]
            # same rank key as _partition_data_dir (shared helper):
            # time_ns-prefixed names beat legacy uuid-only debris at
            # equal mtime here too (r8 advice)
            if entry not in newest or (
                _version_rank(p) > _version_rank(newest[entry])
            ):
                newest[entry] = p
        if newest:
            return spark.read.parquet(*sorted(newest.values()))
    targets = [
        os.path.realpath(os.path.join(store_path, e)) for e in entries
    ]
    if not targets or not any(os.path.islink(os.path.join(store_path, e))
                              for e in entries):
        # legacy real-dir layout (or truly empty store — no debris, no
        # schema anywhere on disk, so erroring is honest): plain
        # partitioned read
        return spark.read.parquet(store_path).drop(PART_COL)
    # PART_COL lives in directory names only (partitionBy excludes it
    # from the data files), so reading the resolved dirs directly drops
    # it for free.
    return spark.read.parquet(*targets)


def batch_partition_vals(store_path: str) -> list[str]:
    """Partition values of a batch-partitioned store (``b<idx>``
    partials + ``c<idx>`` compacted bases)."""
    import os

    if not os.path.isdir(store_path):
        return []
    return [
        e.split("=", 1)[1]
        for e in os.listdir(store_path)
        if e.startswith(f"{PART_COL}=")
    ]


def live_batch_vals(vals: list[str]) -> list[str]:
    """Coverage rule shared by every batch-partitioned store's reader
    and compactor (CMS counters, ANN codes): the newest compacted base
    ``c<k>`` covers every partial ``b<j>`` with j <= k, so the live
    set is that base plus the newer partials. Publish-the-base-first
    ordering makes this crash-safe: the reader's selection is already
    correct before a single covered partition is deleted, and a
    covered batch id REPLAYED after compaction writes a ``b<j>`` the
    reader ignores."""
    cks = [int(v[1:]) for v in vals if v.startswith("c")]
    cmax = max(cks) if cks else None
    return [
        v
        for v in vals
        if (v.startswith("b") and (cmax is None or int(v[1:]) > cmax))
        or (v.startswith("c") and int(v[1:]) == cmax)
    ]


def read_batch_partitions(
    spark: SparkSession, store_path: str, vals: list[str]
) -> DataFrame:
    """Read exactly the named partition values (resolving each through
    the crash-recovery version probe)."""
    dirs = [
        d
        for v in vals
        if (d := _partition_data_dir(store_path, f"{PART_COL}={v}"))
        is not None
    ]
    return spark.read.parquet(*dirs)


def drop_batch_partition(store_path: str, v: str) -> None:
    """Remove a dead partition: the published entry (symlink or legacy
    dir) and every displaced versioned dot-dir. Lazy-safe: a crash here
    only leaves debris the coverage rule already ignores."""
    import os
    import shutil

    ent = os.path.join(store_path, f"{PART_COL}={v}")
    if os.path.islink(ent):
        os.unlink(ent)
    elif os.path.isdir(ent):
        shutil.rmtree(ent, ignore_errors=True)
    for n in os.listdir(store_path):
        if n.startswith(".") and n.endswith(f"-{PART_COL}={v}"):
            shutil.rmtree(os.path.join(store_path, n), ignore_errors=True)


def store_has_data(store_path: str) -> bool:
    """True iff the store holds data ``read_store`` can actually read:
    a published ``_part=`` entry, or a displaced versioned dot-DIR
    (crash-orphan recovery case). A stray dot FILE or a dangling
    ``.link-*`` symlink must NOT count — a caller's bootstrap branch
    would otherwise hand read_store a directory whose recovery scan
    finds nothing and whose legacy fallback fails schema inference.
    Single home for the commit-layout knowledge (the sig and sketch
    stores used to carry their own copies)."""
    if not os.path.isdir(store_path):
        return False
    for n in os.listdir(store_path):
        p = os.path.join(store_path, n)
        if n.startswith(f"{PART_COL}="):
            return True
        if (
            n.startswith(".")
            and f"-{PART_COL}=" in n
            and os.path.isdir(p)
            and not os.path.islink(p)
        ):
            return True
    return False


def start_foreach_batch(
    stream: DataFrame,
    sink,
    checkpoint: str,
    trigger_sec: int = 3,
    available_now: bool = False,
):
    """Shared writer scaffolding for every foreachBatch silver-store
    maintainer (candles, dedup signatures, sketch stores): empty-batch
    guard, checkpoint location, update mode, availableNow vs
    processingTime trigger. ``sink(batch, batch_id)`` runs only on
    non-empty batches."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink(batch, batch_id)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_sec} seconds")
    return writer.start()


def start_candle_ingest(
    stream: DataFrame,
    store_path: str,
    keys: list[str],
    checkpoint: str,
    trigger_sec: int = 3,
    available_now: bool = False,
    order_col: str | None = None,
):
    """Start the ingest query: 3 s trigger == the reference flush window.

    ``stream`` must already be shaped as key + MERGE_COLS rows (use
    ``candles_from_events`` or a source adapter). Sources whose batches
    can carry several updates of one bar should expose the event time /
    offset as ``order_col`` (conventional columns — event_ts,
    kafka_offset — are auto-detected) —
    micro-batches are multi-partition in general, and arrival order
    within a key is only defined by such a column.
    """
    spark = stream.sparkSession
    if order_col is None:
        order_col = detect_order_col(stream.columns)

    def _sink(batch: DataFrame, _batch_id: int) -> None:
        upsert_batch(spark, batch, store_path, keys, order_col=order_col)

    return start_foreach_batch(
        stream, _sink, checkpoint, trigger_sec, available_now
    )
