"""SparkSession builders.

The reference hand-tunes Postgres/SQLite (pooling, WAL, chunk pruning —
SURVEY.md §4); on Spark the equivalents are session-level configs: AQE,
adaptive shuffle partition coalescing, Arrow for pandas interchange, and a
UTC session timezone so parquet naive timestamps agree with the DuckDB
oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe (and desirable) to set on an already-running session.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    # the driver's events table stores TIMESTAMP(NANOS) which the vectorized
    # parquet reader rejects; read as int64 nanos and convert in the catalog
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # naive (isAdjustedToUTC=false) parquet timestamps must read as plain
    # TIMESTAMP in the UTC session, not TIMESTAMP_NTZ: watermarks require
    # the instant type, and with a UTC session tz the wall-clock values are
    # bit-identical to what the DuckDB oracle sees
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def _ship_package(spark: SparkSession) -> None:
    """Make ``tradecat_spark`` importable on Python workers.

    applyInPandas / mapInPandas stages unpickle functions that import
    this package; workers inherit neither the driver's ``sys.path`` nor
    its cwd, so a driver launched outside the repo root (or a real
    cluster without --py-files) would fail with ModuleNotFoundError.
    Shipping a zip via ``addPyFile`` once per session fixes both."""
    sc = spark.sparkContext
    if sc._jsc is None or getattr(sc, "_tradecat_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"tradecat_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "tradecat_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    sc.addPyFile(zpath)
    sc._tradecat_shipped = True


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally-provided session.

    The verify driver owns its own SparkSession; every public query entry
    point calls this so results do not depend on the caller's defaults
    (notably the session timezone).
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on this build — defaults are acceptable
    try:
        _ship_package(spark)
    except Exception:
        pass  # already shipped under another name, or a restricted env
    return spark


def get_spark(
    app_name: str = "tradecat-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local session sized for the driver's bench/test harness.

    At cluster scale the same code runs unmodified: nothing below pins
    local mode except the master URL, and shuffle sizing is AQE-advisory.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    shuffle = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return tune(builder.getOrCreate())
