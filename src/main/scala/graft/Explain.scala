package graft


/** Plan inspector: prints `.explain("formatted")` for the named queries
  * (all queries when none given) — the review loop for pushdown, broadcast
  * and codegen coverage. Usage: runMain graft.Explain <sfDir> [query...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkLocal.session("8")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
