package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The cache-release discipline multi-query harnesses rely on: every
  * registered scratch cache and checkpointed block is actually freed
  * by release() (the round-4 bench regressed unrelated queries 3.6-6x
  * when these leaked across 98 queries in one JVM).
  */
class ScratchSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "ScratchSpec")

  test("release unpersists registered caches and checkpointed blocks") {
    import spark.implicits._
    Scratch.release() // drain anything earlier suites registered
    val df = Scratch.cache(Seq(1, 2, 3).toDF("x"))
    df.count()
    assert(df.storageLevel != StorageLevel.NONE, "cache registered + live")
    val ck = Scratch.localCheckpoint(Seq(4, 5).toDF("y"))
    ck.count()
    val ckRddId = ck.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }.head
    assert(spark.sparkContext.getRDDStorageInfo.exists(_.id == ckRddId),
      "checkpoint blocks live before release")
    Scratch.release()
    assert(df.storageLevel == StorageLevel.NONE, "cache freed")
    assert(!spark.sparkContext.getRDDStorageInfo.exists(_.id == ckRddId),
      "checkpoint blocks freed")
    // release is idempotent and safe on an empty registry
    Scratch.release()
  }
}
