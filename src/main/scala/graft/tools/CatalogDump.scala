package graft.tools

/** Dumps the full query-catalog surface — every oracle SQL body plus the
  * query-name set — to a file, so a catalog refactor (e.g. the round-11
  * per-family split of the oracle map) can be diffed byte-for-byte against
  * the pre-refactor state without running Spark.
  *
  * Usage: runMain graft.tools.CatalogDump /tmp/catalog.txt
  */
object CatalogDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: CatalogDump <output-file>")
    val out = new java.io.PrintWriter(args(0))
    try {
      graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (k, v) =>
        out.println(s"#### ORACLE $k")
        out.println(v)
      }
      out.println("#### QUERY KEYS")
      graft.SparkEntry.queries.keys.toSeq.sorted.foreach(out.println)
    } finally out.close()
  }
}
