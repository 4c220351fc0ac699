"""SparkSession factory.

The reference caches a single MongoDB client per process
(``app.py:18-23`` @st.cache_resource); the Spark analogue is one tuned
SparkSession per process. Configuration is chosen for the 100 TB design
target while remaining correct on local[N]:

- AQE on: runtime coalescing of shuffle partitions, broadcast-join
  conversion, and skew-join splitting replace any hand-tuning.
- ``spark.sql.shuffle.partitions`` seeds the pre-AQE plan; AQE coalesces
  down on small inputs and a real cluster would raise it (rule of thumb:
  ~2-3x total cores, partitions sized 100-200 MB post-compression).
- Arrow enabled: every pandas UDF / mapInPandas / toPandas crosses the
  JVM<->Python boundary in columnar Arrow batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "crawlingbigdatavisionaid-spark") -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism (driver contract);
    defaults to all cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", _DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if os.environ.get("SPARK_GRAFT_PRETOUCH", "") not in ("", "0"):
        # Preallocate + pre-touch the whole heap at JVM start: measured
        # 10x-replica joins spent 30-50s of KERNEL time (page-zeroing
        # during heap growth) on their first executions with a growable
        # heap — -Xms=-Xmx + AlwaysPreTouch moves that one-time fault
        # cost to startup (~2.5 s/GiB on this host) so query timings
        # measure the query, not the allocator. Opt-in because the
        # startup tax is wrong for short-lived test/tool sessions;
        # bench.py and tools/scale_smoke.py set it.
        #
        # Caller-supplied driver JVM options (SPARK_GRAFT_EXTRA_JAVA_OPTIONS,
        # since a plain python process has no started JVM to read
        # spark-defaults from) go LAST: the JVM resolves duplicate flags
        # last-wins, so a caller -Xms/-XX override actually takes effect
        # instead of being shadowed by the pretouch defaults. Caveat:
        # like every config here, this is a no-op when getOrCreate()
        # reuses an already-started JVM — bench/tools always build the
        # session first in a fresh process.
        extra = os.environ.get("SPARK_GRAFT_EXTRA_JAVA_OPTIONS", "")
        pretouch = (
            "-Xms"
            + os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
            + " -XX:+AlwaysPreTouch"
        )
        builder = builder.config(
            "spark.driver.extraJavaOptions", (pretouch + " " + extra).strip()
        )
    return builder.getOrCreate()


def tune_for_sf(spark: SparkSession, sf_dir: str) -> None:
    """Adjust partition-count knobs to the scale factor under test.

    At 100 TB these would come from cluster sizing (cores x 2-3,
    target 128 MB shuffle blocks); locally AQE coalescing makes the
    exact seed value non-critical.
    """
    spark.conf.set("spark.sql.shuffle.partitions", _DEFAULT_SHUFFLE_PARTITIONS)
