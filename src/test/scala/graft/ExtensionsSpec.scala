package graft

import org.apache.spark.sql.SparkSession

/** SURVEY §2.12/§4 — the `spark.sql.extensions` installation path: a
  * session built with GraftExtensions resolves the custom expressions
  * from raw SQL (no register calls) and runs the bbox optimizer rule. */
class ExtensionsSpec extends BaseSpec {

  test("GraftExtensions installs functions and the optimizer rule") {
    spark // force the shared session (and its SparkContext) to exist
    val oldDefault = SparkSession.getDefaultSession
    val oldActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try {
        // functions resolve from SQL text with no register() call
        val d = ext.sql("SELECT round(haversine_km(0.0, 0.0, 0.0, 1.0), 2) AS d")
          .collect().head.getDouble(0)
        assert(math.abs(d - 111.19) < 0.01, s"haversine via extensions: $d")
        val c = ext.sql(
          "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
          .collect().head.getDouble(0)
        assert(math.abs(c - 1.0) < 1e-9, s"cosine via extensions: $c")
        // the injected optimizer rule fires without install() (range() is
        // not a LocalRelation, so the filter survives constant folding)
        val df = ext.range(1000)
          .selectExpr("CAST(id DIV 180 AS DOUBLE) AS lat", "CAST(id % 180 AS DOUBLE) AS lon")
          .where("haversine_km(lat, lon, 2.0d, 5.0d) < 500.0d")
        val opt = df.queryExecution.optimizedPlan.toString
        val (latLo, _, _) = graft.plans.HaversineRadiusPruning.bbox(2.0, 5.0, 500.0)
        assert(opt.contains(latLo.toString),
          s"bbox rule did not fire in extension session:\n$opt")
        val expected = (0L until 1000L).count { id =>
          graft.functions.HaversineDist.km((id / 180).toDouble, (id % 180).toDouble, 2.0, 5.0) < 500.0 }
        assert(expected > 0 && df.count() == expected,
          s"rule changed results: got ${df.count()}, want $expected")
      } finally {
        // do NOT stop ext: it shares the SparkContext with the main session
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      oldDefault.foreach(SparkSession.setDefaultSession)
      oldActive.foreach(SparkSession.setActiveSession)
    }
  }
}
