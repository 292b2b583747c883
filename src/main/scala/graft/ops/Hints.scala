package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-hint hygiene for sides whose size scales with the corpus.
  *
  * A forced `broadcast()` hint bypasses AQE's size threshold, so it is
  * only ever safe on frames whose cardinality is bounded by a DOMAIN
  * (catalog tables, codebooks, per-language stats, 1-row aggregates) —
  * never on frames that grow with the input. For inputs that are
  * usually small but corpus-derived (a decontamination holdout's
  * distinct n-grams, an incremental-batch key set), the hint must be
  * gated on a measured row count; above the gate the hint is dropped
  * and AQE/statistics pick the join strategy, which at 100 TB means a
  * partitioned shuffle join instead of a guaranteed executor OOM.
  */
object Hints {
  /** Row-count gate above which a corpus-derived frame is no longer
    * force-broadcast. 4M distinct 8-gram rows is ~hundreds of MB
    * serialized — already past the point where a hint helps and well
    * before driver/executor broadcast limits hurt.
    */
  val MaxBroadcastRows: Long = 4L * 1000 * 1000

  /** `broadcast(df)` iff `rows` (a count the caller has already paid
    * for, e.g. for bloom-filter sizing) is within the gate; otherwise
    * the unhinted frame, leaving strategy choice to AQE.
    */
  def broadcastIfSmall(df: DataFrame, rows: Long,
      maxRows: Long = MaxBroadcastRows): DataFrame =
    if (rows <= maxRows) broadcast(df) else df
}
