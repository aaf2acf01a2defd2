package graft

/** SQL front-end parity: the ANSI-portable subset of the oracle SQL runs
  * unchanged through `spark.sql` on registered views and returns exactly
  * what the DataFrame formulation returns — one logical surface, two entry
  * points (the reference's users get a SQL door, not just the Scala API).
  */
class SqlFrontendSpec extends SparkSpec {

  private val portable = Seq(
    "q01_pricing_summary", "q02_filter_project", "q03_revenue",
    "q06_join_left", "q07_join_semi", "q08_join_anti",
    "q44_in_subquery", "q45_correlated_exists")

  portable.foreach { name =>
    test(s"$name: spark.sql(oracle text) == DataFrame result") {
      graft.sources.Tables.registerViews(spark, sfDir)
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaDf = SparkEntry.queries(name)(spark, sfDir)
      assert(viaSql.schema.fieldNames.toSeq == viaDf.schema.fieldNames.toSeq)
      val a = viaSql.collect().map(_.toSeq).toSeq
      val b = viaDf.collect().map(_.toSeq).toSeq
      assert(a == b, s"$name SQL/DataFrame divergence: ${a.take(2)} vs ${b.take(2)}")
    }
  }
}
