package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Prints formatted physical plans for representative queries so plan
  * regressions (lost pushdown, surprise sort-merge joins, codegen
  * fallbacks) are visible. Run: sbt "runMain graft.tools.PlanAudit
  * [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "plan-audit")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_agg_sum", "q03_topn", "q06_join_enrich", "q17_slowlog_e2e")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
