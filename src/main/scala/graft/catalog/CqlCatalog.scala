package graft.catalog

import graft.model.TableMeta

/** Driver-side CQL schema catalog.
  *
  * Parses a `DESCRIBE SCHEMA`-style CQL dump into
  * `(keyspace, column_family) -> TableMeta` and derives the
  * column-family -> keyspace inverted index used for keyspace
  * guessing. This is dimension-sized data: it stays on the driver and
  * is shipped to executors as literal maps / broadcast joins — never
  * shuffled.
  *
  * Grammar accepted mirrors the reference parser
  * (analyze_slow_queries.py:334-418): three PRIMARY KEY shapes —
  * composite partition `PRIMARY KEY ((a, b), c)`, simple
  * `PRIMARY KEY (a, b)`, and inline `col type PRIMARY KEY`.
  */
object CqlCatalog {

  /** Sentinel for a column family present in >1 keyspace
    * (analyze_slow_queries.py:566).
    */
  val UnknownKeyspace = "unknown"

  /** Substring strictly between the first `before` and the next
    * `after`; None when either is absent
    * (analyze_slow_queries.py:295-316).
    */
  def strSlice(s: String, before: String, after: String): Option[String] = {
    val start = s.indexOf(before)
    if (start == -1) return None
    val rest = s.substring(start + before.length)
    val end = rest.indexOf(after)
    if (end == -1) None else Some(rest.substring(0, end))
  }

  /** Parse a CQL schema dump. Lines outside CREATE TABLE / PRIMARY KEY
    * are ignored; a PRIMARY KEY line with no preceding CREATE TABLE is
    * an error (analyze_slow_queries.py:345-346,355-356).
    */
  def parse(cql: String): Map[(String, String), TableMeta] = {
    var result = Map.empty[(String, String), TableMeta]
    var current: Option[(String, String)] = None
    cql.linesIterator.foreach { line =>
      if (line.contains("CREATE TABLE")) {
        val ks = strSlice(line, "CREATE TABLE ", ".")
        val cf = strSlice(line, ".", " ")
        (ks, cf) match {
          case (Some(k), Some(c)) =>
            current = Some((k, c))
            if (!result.contains((k, c))) result += ((k, c) -> TableMeta(Nil, Nil))
          case _ =>
            // a line merely MENTIONING 'CREATE TABLE' (comment, prose):
            // the reference records a junk None-keyed entry and moves on
            // (analyze_slow_queries.py:336-346); a PRIMARY KEY line
            // while in this state still errors, matching its raise
            current = None
        }
      }
      if (line.contains("PRIMARY KEY (")) {
        val key = current.getOrElse(
          throw new IllegalArgumentException(s"Unable to process schema line $line"))
        result += (key -> parseKeys(line))
        current = None
      } else if (line.contains("PRIMARY KEY")) {
        val key = current.getOrElse(
          throw new IllegalArgumentException(s"Unable to process schema line $line"))
        result += (key -> TableMeta(Seq(parseInlinePrimary(line)), Nil))
        current = None
      }
    }
    result
  }

  /** `PRIMARY KEY ((a, b), c)` / `PRIMARY KEY (a, b)` forms
    * (analyze_slow_queries.py:379-404).
    */
  private def parseKeys(line: String): TableMeta = {
    val s = line.replace("PRIMARY KEY ", "")
    if (s.startsWith("((")) {
      val split = s.indexOf(')')
      val primary = s.substring(0, split).replace("((", "")
      val partition = primary.split(',').map(stripSpaces).toSeq
      val clustering = s.substring(split + 1).replace(")", "")
        .split(',').map(stripSpaces).filter(_.nonEmpty).toSeq
      TableMeta(partition, clustering)
    } else {
      val keys = s.replace("(", "").replace(")", "")
        .split(',').map(stripSpaces).toSeq
      TableMeta(keys.take(1), keys.drop(1))
    }
  }

  /** `    my_id uuid PRIMARY KEY,` form (analyze_slow_queries.py:407-418). */
  private def parseInlinePrimary(line: String): String =
    stripCommaSpaces(line).replace(" PRIMARY KEY", "").split(' ').head

  private def stripSpaces(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  private def stripCommaSpaces(s: String): String = {
    val drop = (c: Char) => c == ' ' || c == ','
    s.dropWhile(drop).reverse.dropWhile(drop).reverse
  }

  /** Inverted CF -> keyspace index; ambiguous CFs map to
    * [[UnknownKeyspace]] (analyze_slow_queries.py:553-567).
    */
  def cfKeyspaces(schema: Map[(String, String), TableMeta]): Map[String, String] =
    schema.keys.foldLeft(Map.empty[String, String]) { case (acc, (ks, cf)) =>
      acc.get(cf) match {
        case None                       => acc + (cf -> ks)
        case Some(k) if k == ks         => acc
        case Some(_)                    => acc + (cf -> UnknownKeyspace)
      }
    }

  /** Separator for composite (ks, cf) literal-map keys; a control
    * char that cannot occur in CQL identifiers.
    */
  val KeySep = "\u0001"

  /** Partition-key columns keyed by ks+KeySep+cf for literal-map
    * shipping into Catalyst expressions. Keys keep their original
    * case: the reference looks lowercased log-side names up against
    * unmodified schema-side keys (analyze_slow_queries.py:58,520-524),
    * and that asymmetry is part of the pinned behavior.
    */
  def partitionKeyIndex(schema: Map[(String, String), TableMeta]): Map[String, Seq[String]] =
    schema.map { case ((ks, cf), meta) => (ks + KeySep + cf) -> meta.partitionKey }
}
