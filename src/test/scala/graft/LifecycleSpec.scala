package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamPipeline
import java.util.concurrent.{ConcurrentLinkedQueue => CLQ}

/** The reference's streaming app lifecycle (SURVEY.md §3.3): TWO concurrent
  * queries off one source definition, each its own StreamExecution, parked
  * with awaitAnyTermination — plus the g06-vs-g08 PageRank semantic
  * comparison (SURVEY §2.10 G6: same graph, different normalization).
  */
class LifecycleSpec extends AnyFunSuite with SparkTestSession {

  test("two concurrent queries consume one source; awaitAnyTermination parks") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[String]
    ms.addData(
      """{"event_id":1,"user_id":1,"event_type":"error","value":1.0,"ts":"2024-01-01T10:00:00Z"}""",
      """{"event_id":2,"user_id":2,"event_type":"click","value":2.0,"ts":"2024-01-01T10:01:00Z"}""")
    val derived = StreamPipeline.derive(
      StreamPipeline.parse(ms.toDF().select(col("value"))))
    val epochs = new CLQ[Long]()
    val q1 = derived.writeStream.format("memory").queryName("lc_mem")
      .outputMode("append").start()
    val q2 = StreamPipeline.foreachBatchSink(derived, _ => (), epochs,
      Trigger.AvailableNow()).start()
    assert(spark.streams.active.count(q =>
      q.id == q1.id || q.id == q2.id) == 2)
    // bounded stand-in for the reference's park-forever
    spark.streams.awaitAnyTermination(5000)
    q1.processAllAvailable()
    q1.stop(); q2.awaitTermination();
    assert(spark.table("lc_mem").count() == 2)
    assert(epochs.size() >= 1)
  }

  test("DataFrame degrees equal GraphX degrees for every connected vertex") {
    val session = spark
    import org.apache.spark.graphx.{Edge, Graph, VertexId}
    import session.implicits._
    val dfDeg = graph.CoGraph.degrees(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edgeRdd = graph.CoGraph.edges(spark, Sf)
      .select(col("src"), col("dst")).as[(Long, Long)]
      .rdd.map { case (a, b) => Edge(a: VertexId, b: VertexId, 1) }
    val gxDeg = Graph.fromEdges(edgeRdd, ()).degrees.collect()
      .map { case (id, d) => id -> d.toLong }.toMap
    assert(dfDeg == gxDeg,
      s"sizes df=${dfDeg.size} gx=${gxDeg.size}")
  }

  test("GraphX staticPageRank ranks the same hubs as the reference loop") {
    import graft.graph.PageRankOps
    val loopTop = PageRankOps.topQ(spark, Sf).collect().map(_.getLong(0)).toSet
    val gxTop = PageRankOps.graphxPageRank(spark, Sf)
      .limit(10).collect().map(_.getLong(0)).toSet
    // different normalization (amount-weight vs out-degree) ⇒ different
    // scores, but the top of a co-occurrence graph is structural: require
    // meaningful overlap, not equality (SURVEY §2.10 G6)
    val overlap = (loopTop & gxTop).size
    assert(overlap >= 3, s"top-10 overlap $overlap: loop=$loopTop gx=$gxTop")
  }
}
