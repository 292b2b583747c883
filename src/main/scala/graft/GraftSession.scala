package graft

import org.apache.spark.sql.SparkSession

/** Session tuning applied by every graft entry point.
  *
  * The driver owns SparkSession construction (Verify/Bench), so all
  * settings here must be runtime-settable SQL confs, not builder-time
  * statics. Rationale per conf:
  *
  *  - `ansi.enabled=false`: the reference engine (Python 2) treats any
  *    per-row parse/cast failure as "skip the row with a warning"
  *    (analyze_slow_queries.py:1296-1304). Non-ANSI Spark gives the
  *    same null-on-error semantics, which we turn into explicit
  *    filters; ANSI would fail the whole job on one bad row.
  *  - `legacy.parquet.nanosAsLong=true`: the `events` test table has
  *    INT64 nanos timestamps, which the parquet reader otherwise
  *    rejects; we convert `ns DIV 1000` to microsecond timestamps
  *    (integer division — ns-since-epoch exceeds 2^53, double math
  *    would corrupt it).
  *  - `mapKeyDedupPolicy=LAST_WIN`: the reference builds bound-value
  *    maps with a Python dict where a duplicated key keeps the last
  *    value (analyze_slow_queries.py:466-476); Spark's default throws.
  */
object GraftSession {
  /** Sessions whose SQL functions are already registered — re-registering
    * on every tune() call works but spams "replaced a previously
    * registered function" warnings (170+ per bench run). Weak keys so a
    * stopped session doesn't pin memory.
    */
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    registered.synchronized {
      if (registered.add(spark)) GraftFunctions.register(spark)
    }
    spark
  }

  /** Local session for tests/mains outside the driver contract. */
  def local(cores: Int = 4, app: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tune(spark)
  }
}
