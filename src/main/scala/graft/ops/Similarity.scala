package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Scale design: brute-force top-k is a narrow map + TakeOrderedAndProject
  * (per-partition bounded heaps, no global sort) — the right baseline
  * even at 100 TB when k is small. The LSH variant buckets vectors by
  * random-hyperplane sign bits so near-dup pair generation touches
  * only same-bucket pairs.
  *
  * Cross-engine float determinism: dot products fold sequentially
  * (Spark `aggregate` is a strict left fold; the DuckDB oracle uses
  * `list_reduce` over the zipped products) so both engines add the
  * same doubles in the same order; outputs additionally round to 6
  * decimals to absorb any residual representation noise.
  */
object Similarity {

  /** Sequential-fold dot product of two float arrays as double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector (plans as
    * TakeOrderedAndProject).
    */
  def topKCosine(embeddings: DataFrame, idCol: String, vecCol: String,
      queryVec: Column, k: Int): DataFrame =
    embeddings
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), round(cosine(col("v"), queryVec), 6).as("cos"))
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)

  /** Deterministic integer hyperplane weights, reproducible in SQL:
    * w(plane, dim) = hex32(md5(plane + "_" + dim)) % 1001 - 500.
    * Computed driver-side with the same md5 formula the oracle uses.
    */
  def hyperplanes(planes: Int, dims: Int): Array[Array[Int]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      val hex = mdig.digest(s"${p}_$d".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % 1001L - 500L).toInt
    }
  }

  /** Sign-bit LSH bucket id from `planes` integer hyperplanes: bit p
    * set when dot(v, w_p) >= 0. Narrow expression; the weights ship as
    * literals.
    */
  def lshBucket(vec: Column, planes: Array[Array[Int]]): Column =
    planes.zipWithIndex.map { case (w, p) =>
      val wLit = typedLit(w.toSeq)
      val d = aggregate(
        zip_with(vec, wLit, (x, wi) => x.cast("double") * wi.cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-accelerated ANN: probe only the query's bucket, then rank.
    * Recall < 1 by construction — the scale path; pair with
    * [[topKCosine]] as the exact baseline.
    */
  def topKCosineLsh(embeddings: DataFrame, idCol: String, vecCol: String,
      queryVec: Column, k: Int, planes: Array[Array[Int]]): DataFrame = {
    val bucketed = embeddings
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        lshBucket(col(vecCol), planes).as("bucket"))
    val qBucket = lshBucket(queryVec, planes)
    bucketed
      .filter(col("bucket") === qBucket)
      .select(col("id"), round(cosine(col("v"), queryVec), 6).as("cos"))
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }

  /** Embedding near-duplicate pairs: LSH-bucket self-join, then exact
    * cosine >= minCos (rounded compare). Only same-bucket pairs are
    * ever materialized.
    */
  def nearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      planes: Array[Array[Int]], minCos: Double): DataFrame = {
    val bucketed = embeddings.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
