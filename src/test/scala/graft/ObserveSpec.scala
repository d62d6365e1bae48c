package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** The observe() metrics surface: quality counters evaluated inside the
  * producing job — batch via QueryExecutionListener, streaming via
  * per-batch observedMetrics — with values asserted against directly
  * computed truth. */
class ObserveSpec extends BaseSpec {
  import spark.implicits._

  test("batch observe: null counters arrive via the listener, match direct counts") {
    val seen = new ConcurrentLinkedQueue[Map[String, org.apache.spark.sql.Row]]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        if (qe.observedMetrics.nonEmpty) seen.add(qe.observedMetrics)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq(
        (1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None), (5L, None)
      ).toDF("id", "v")
      val observed = graft.operators.Observe.qualityMetrics(df, "quality", Seq("v"))
      val n = observed.count()
      assert(n == 5)
      // listener events are delivered asynchronously after job end —
      // poll briefly (the bus has no public drain hook)
      val deadline = System.nanoTime() + 10e9.toLong
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val metrics = seen.asScala().flatMap(_.get("quality")).lastOption
        .getOrElse(fail("no 'quality' observed metrics arrived"))
      assert(metrics.getAs[Long]("n_rows") == 5L)
      assert(metrics.getAs[Long]("null_v") == 3L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("streaming observe: per-batch metrics surface in query progress") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Option[String])]
    val observed = graft.operators.Observe
      .qualityMetrics(input.toDS().toDF("id", "v"), "squality", Seq("v"))
    val q = observed.writeStream.format("noop").outputMode("append").start()
    try {
      input.addData((1L, Some("x")), (2L, None), (3L, None))
      q.processAllAvailable()
      val m = Option(q.lastProgress).map(_.observedMetrics)
        .filter(_.containsKey("squality"))
        .getOrElse(fail("no streaming observed metrics"))
        .get("squality")
      assert(m.getAs[Long]("n_rows") == 3L)
      assert(m.getAs[Long]("null_v") == 2L)
    } finally q.stop()
  }

  private implicit class QAsScala(q: ConcurrentLinkedQueue[Map[String, org.apache.spark.sql.Row]]) {
    def asScala(): List[Map[String, org.apache.spark.sql.Row]] = {
      val it = q.iterator(); val b = List.newBuilder[Map[String, org.apache.spark.sql.Row]]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}
