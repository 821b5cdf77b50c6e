package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.graphx.lib.ShortestPaths
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GraphFrames-shaped façade over GraphX + DataFrames (SURVEY §2.10,
  * VERDICT r4 "what's missing" #3).
  *
  * The reference drives its graph layer through the GraphFrames API
  * (`notebooks/4_graphx.ipynb:334-373`: `GraphFrame(v, e)`, `.degrees`,
  * `.connectedComponents()`, `.pageRank(resetProbability, maxIter)`).
  * This repo deliberately implements the graph ALGORITHMS on native
  * GraphX + DataFrame algebra (Components/CoGraph/PageRankOps — each
  * oracle-checked); this class is the thin adapter that lets a user
  * porting GraphFrames call-sites run them verbatim:
  *
  * {{{
  *   val g = GraphFrame(vertices, edges)        // "id" / "src","dst"
  *   g.degrees                                   // id, degree (zero-degree omitted)
  *   g.connectedComponents.run()                 // vertices + component
  *   g.pageRank.resetProbability(0.15).maxIter(10).run()
  *   g.find("(a)-[e]->(b); (b)-[e2]->(c)")       // motif chains
  * }}}
  *
  * Id handling: integral `id` columns (the common case here — `user_id`
  * is int64) are used as GraphX `VertexId`s directly, zero extra
  * shuffles. Any other id type goes through a deterministic dictionary
  * (distinct ids sorted ascending → dense index via `zipWithIndex`), so
  * component labels are still "minimum member id" exactly like
  * [[Components.connectedComponents]] and the DuckDB oracle mirror.
  *
  * Scale: every algorithm delegates to the same Pregel machinery the
  * oracle-checked operators use (per-superstep local joins, edge
  * partition placement, no driver state). The dictionary — when needed
  * at all — is one sort + zipWithIndex over DISTINCT vertex ids (vertex
  * cardinality, not edge volume) and two equi-joins to translate edges;
  * motif search is a chain of vertex-id equi-joins that AQE plans like
  * any other fact-fact join. Nothing here collects data to the driver.
  */
class GraphFrame private (val vertices: DataFrame, val edges: DataFrame) {
  import GraphFrame.{DST, ID, SRC}

  require(vertices.columns.contains(ID), s"vertices must have an '$ID' column")
  require(edges.columns.contains(SRC) && edges.columns.contains(DST),
    s"edges must have '$SRC' and '$DST' columns")

  private val spark = vertices.sparkSession

  // ---- basic views ------------------------------------------------------

  /** (src struct, edge struct, dst struct) — GraphFrames' `triplets`. */
  def triplets: DataFrame = {
    val v = vertices
    val e = edges
    val srcStruct = struct(v.columns.map(c => col(s"__sv.$c").as(c)): _*)
    val dstStruct = struct(v.columns.map(c => col(s"__dv.$c").as(c)): _*)
    val edgeStruct = struct(e.columns.map(c => col(s"__e.$c").as(c)): _*)
    e.as("__e")
      .join(v.as("__sv"), col(s"__e.$SRC") === col(s"__sv.$ID"))
      .join(v.as("__dv"), col(s"__e.$DST") === col(s"__dv.$ID"))
      .select(srcStruct.as("src"), edgeStruct.as("edge"), dstStruct.as("dst"))
  }

  /** In+out degree per vertex; vertices with no edges are omitted —
    * GraphFrames semantics (`4_graphx.ipynb:354-373`), same spelling as
    * [[CoGraph.degrees]]: union-all + one keyed aggregate, no join.
    */
  def degrees: DataFrame =
    edges.select(col(SRC).as(ID)).unionAll(edges.select(col(DST).as(ID)))
      .groupBy(col(ID)).agg(count(lit(1)).cast("int").as("degree"))

  def inDegrees: DataFrame =
    edges.groupBy(col(DST).as(ID)).agg(count(lit(1)).cast("int").as("inDegree"))

  def outDegrees: DataFrame =
    edges.groupBy(col(SRC).as(ID)).agg(count(lit(1)).cast("int").as("outDegree"))

  // ---- id translation ---------------------------------------------------

  private def idType: DataType = vertices.schema(ID).dataType

  private def idIsIntegral: Boolean = idType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (id, gid) dense dictionary for non-integral ids: ascending sort →
    * zipWithIndex, so gid order == id order and min-gid labels map back
    * to min-id labels. Vertex-cardinality work only.
    */
  private lazy val dict: DataFrame = {
    val ss = spark
    val idT = idType
    val rdd = vertices.select(col(ID)).distinct().orderBy(col(ID))
      .rdd.zipWithIndex.map { case (r, i) => org.apache.spark.sql.Row(r.get(0), i) }
    ss.createDataFrame(rdd,
      StructType(Seq(StructField(ID, idT), StructField("gid", LongType))))
      .persist()
  }

  /** Edge RDD in VertexId space (direct cast for integral ids). */
  private def edgeRdd: org.apache.spark.rdd.RDD[Edge[Double]] = {
    val w = if (edges.columns.contains("weight")) col("weight").cast("double")
            else lit(1.0)
    val df =
      if (idIsIntegral)
        edges.select(col(SRC).cast("long"), col(DST).cast("long"), w)
      else {
        // fresh aliases per side — two raw copies of `dict` in one plan
        // would share exprIds and trip self-join ambiguity
        val sdict = dict.select(col(ID).as("__sid"), col("gid").as("__sgid"))
        val ddict = dict.select(col(ID).as("__did"), col("gid").as("__dgid"))
        edges
          .join(sdict, col(SRC) === col("__sid"))
          .join(ddict, col(DST) === col("__did"))
          .select(col("__sgid"), col("__dgid"), w)
      }
    df.rdd.map(r => Edge(r.getLong(0): VertexId, r.getLong(1), r.getDouble(2)))
  }

  private def vertexRdd: org.apache.spark.rdd.RDD[(VertexId, Unit)] = {
    val df = if (idIsIntegral) vertices.select(col(ID).cast("long"))
             else dict.select(col("gid"))
    df.rdd.map(r => (r.getLong(0), ()))
  }

  private def graph: Graph[Unit, Double] = Graph(vertexRdd, edgeRdd)

  /** (gid → original id) translation of an algorithm's (VertexId, A)
    * output, rejoined onto the full vertex table.
    */
  private def backToVertices(out: DataFrame, valueCol: String): DataFrame = {
    val withId =
      if (idIsIntegral) out.withColumn(ID, col("gid").cast(idType)).drop("gid")
      else out.join(dict, "gid").drop("gid")
    vertices.join(withId, Seq(ID), "left_outer")
  }

  private def algoOut(pairs: org.apache.spark.rdd.RDD[(VertexId, Long)],
                      valueCol: String): DataFrame = {
    val ss = spark
    import ss.implicits._
    val out = pairs.toDF("gid", valueCol)
    // label values are vertex ids for CC/SCC/LPA — translate them too
    if (idIsIntegral)
      backToVertices(out.withColumn(valueCol, col(valueCol).cast(idType)), valueCol)
    else {
      val lblDict = dict.select(col("gid").as(valueCol), col(ID).as("__lbl"))
      backToVertices(
        out.join(lblDict, valueCol).drop(valueCol)
          .withColumnRenamed("__lbl", valueCol),
        valueCol)
    }
  }

  // ---- algorithms (GraphFrames builder shapes) --------------------------

  /** `g.connectedComponents.run()` — vertices + `component` (= min member
    * id, matching [[Components.connectedComponents]] and its recursive-CTE
    * oracle).
    */
  def connectedComponents: GraphFrame.ConnectedComponents =
    new GraphFrame.ConnectedComponents(this)

  /** `g.stronglyConnectedComponents.maxIter(n).run()`. */
  def stronglyConnectedComponents: GraphFrame.Scc = new GraphFrame.Scc(this)

  /** `g.pageRank.resetProbability(a).maxIter(n).run()` — returns a new
    * GraphFrame whose vertices carry `pagerank` (GraphX staticPageRank /
    * personalized when `sourceId` is set — same semantics as
    * [[PageRankOps.graphxPageRank]], whose g08 registration is
    * oracle-checked against the unrolled-CTE mirror since round 8).
    */
  def pageRank: GraphFrame.PageRankBuilder = new GraphFrame.PageRankBuilder(this)

  /** `g.triangleCount.run()` — vertices + `count`. */
  def triangleCount: GraphFrame.Triangles = new GraphFrame.Triangles(this)

  /** `g.labelPropagation.maxIter(n).run()` — vertices + `label`. */
  def labelPropagation: GraphFrame.Lpa = new GraphFrame.Lpa(this)

  /** `g.shortestPaths.landmarks(xs).run()` — vertices + `distances` map
    * (landmark id → hop count), unreached landmarks absent from the map.
    */
  def shortestPaths: GraphFrame.Spaths = new GraphFrame.Spaths(this)

  /** `g.bfs.fromExpr(...).toExpr(...).maxPathLength(n).run()`. */
  def bfs: GraphFrame.Bfs = new GraphFrame.Bfs(this)

  /** `g.aggregateMessages.sendToDst(AM.src("x")).agg(sum(AM.msg))`. */
  def aggregateMessages: GraphFrame.AggregateMessages =
    new GraphFrame.AggregateMessages(this)

  private[graph] def runCc(): DataFrame =
    algoOut(graph.connectedComponents().vertices.map { case (v, c) => (v, c: Long) },
      "component")

  private[graph] def runScc(maxIter: Int): DataFrame =
    algoOut(graph.stronglyConnectedComponents(maxIter).vertices
      .map { case (v, c) => (v, c: Long) }, "component")

  private[graph] def runLpa(maxIter: Int): DataFrame =
    algoOut(org.apache.spark.graphx.lib.LabelPropagation.run(graph, maxIter)
      .vertices.map { case (v, c) => (v, c: Long) }, "label")

  private[graph] def runTriangles(): DataFrame = {
    val ss = spark
    import ss.implicits._
    // GraphX TriangleCount requires canonical orientation; partitionBy
    // satisfies its precondition, canonical dedup happens inside.
    val out = graph
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
      .triangleCount().vertices.toDF("gid", "count")
    backToVertices(out.withColumn("count", col("count").cast("long")), "count")
      .withColumn("count", coalesce(col("count"), lit(0L)))
  }

  private[graph] def runPageRank(reset: Double, maxIter: Int,
                                 sourceId: Option[Any]): GraphFrame = {
    val ss = spark
    import ss.implicits._
    val g = graph
    val ranked = sourceId match {
      case Some(src) =>
        val gid: VertexId =
          if (idIsIntegral) src.toString.toLong
          else dict.filter(col(ID) === lit(src)).select(col("gid"))
            .head().getLong(0)
        g.staticPersonalizedPageRank(gid, maxIter, reset)
      case None => g.staticPageRank(maxIter, reset)
    }
    val out = ranked.vertices.toDF("gid", "pagerank")
    val newV = backToVertices(out, "pagerank")
    new GraphFrame(newV, edges.withColumn("weight",
      lit(1.0) / count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(SRC)))))
  }

  private[graph] def runShortestPaths(landmarks: Seq[Any]): DataFrame = {
    val ss = spark
    import ss.implicits._
    val lms: Seq[VertexId] =
      if (idIsIntegral) landmarks.map(_.toString.toLong)
      else {
        val wanted = landmarks.map(_.toString).toSet
        dict.filter(col(ID).cast("string").isin(wanted.toSeq: _*))
          .select(col("gid")).collect().map(_.getLong(0)).toSeq
      }
    val out = ShortestPaths.run(graph, lms).vertices
      .map { case (v, m) => (v, m.toSeq) }.toDF("gid", "kv")
    val translated =
      if (idIsIntegral)
        out.select(col("gid"),
          map_from_entries(transform(col("kv"), e =>
            struct(e.getField("_1").cast(idType), e.getField("_2"))))
            .as("distances"))
      else {
        // translate map keys (landmark gids) back through the dictionary;
        // collect_list skips the nulls explode_outer emits for empty maps,
        // so unreached vertices get an empty map, not a null map key
        val lblDict = dict.select(col("gid").as("lgid"), col(ID).as("lid"))
        out.select(col("gid"), explode_outer(col("kv")).as("e"))
          .join(lblDict, col("e._1") === col("lgid"), "left_outer")
          .groupBy(col("gid"))
          .agg(map_from_entries(collect_list(when(col("e").isNotNull,
            struct(col("lid"), col("e._2"))))).as("distances"))
      }
    backToVertices(translated, "distances")
  }

  // ---- motif finding ----------------------------------------------------

  /** GraphFrames motif search for chain patterns:
    * `"(a)-[e]->(b); (b)-[e2]->(c); !(a)-[]->(c)"`.
    * Positive terms become vertex-id equi-joins over [[triplets]];
    * negated terms (both endpoints named) become anti-joins on the edge
    * list. Anonymous vertices `()` / edges `[]` bind nothing. Result
    * columns are struct-typed, one per named element, exactly like
    * GraphFrames.
    */
  def find(pattern: String): DataFrame = GraphFrame.Motif.find(this, pattern)
}

object GraphFrame {
  val ID = "id"; val SRC = "src"; val DST = "dst"

  def apply(vertices: DataFrame, edges: DataFrame): GraphFrame =
    new GraphFrame(vertices, edges)

  /** `GraphFrame.fromEdges(e)` — vertices inferred from edge endpoints. */
  def fromEdges(edges: DataFrame): GraphFrame = {
    val v = edges.select(col(SRC).as(ID))
      .unionAll(edges.select(col(DST).as(ID))).distinct()
    new GraphFrame(v, edges)
  }

  // builder objects mirroring the GraphFrames call shapes ----------------

  final class ConnectedComponents private[graph] (g: GraphFrame) {
    def run(): DataFrame = g.runCc()
  }

  final class Scc private[graph] (g: GraphFrame) {
    private var iters = 10
    def maxIter(n: Int): Scc = { iters = n; this }
    def run(): DataFrame = g.runScc(iters)
  }

  final class PageRankBuilder private[graph] (g: GraphFrame) {
    private var reset = 0.15
    private var iters = 10
    private var srcId: Option[Any] = None
    def resetProbability(a: Double): PageRankBuilder = { reset = a; this }
    def maxIter(n: Int): PageRankBuilder = { iters = n; this }
    def sourceId(id: Any): PageRankBuilder = { srcId = Some(id); this }
    def run(): GraphFrame = g.runPageRank(reset, iters, srcId)
  }

  final class Triangles private[graph] (g: GraphFrame) {
    def run(): DataFrame = g.runTriangles()
  }

  final class Lpa private[graph] (g: GraphFrame) {
    private var iters = 5
    def maxIter(n: Int): Lpa = { iters = n; this }
    def run(): DataFrame = g.runLpa(iters)
  }

  final class Spaths private[graph] (g: GraphFrame) {
    private var lms: Seq[Any] = Nil
    def landmarks(xs: Seq[Any]): Spaths = { lms = xs; this }
    def run(): DataFrame = g.runShortestPaths(lms)
  }

  /** Iterative shortest-path search `fromExpr → toExpr`; returns the
    * match rows at the FIRST depth with any match (GraphFrames bfs
    * semantics), columns `from, e0, v1, e1, …, to`, cycles pruned by
    * excluding any vertex already on the path.
    */
  final class Bfs private[graph] (g: GraphFrame) {
    private var fromE: Column = lit(true)
    private var toE: Column = lit(true)
    private var maxLen = 10
    def fromExpr(c: Column): Bfs = { fromE = c; this }
    def fromExpr(s: String): Bfs = { fromE = expr(s); this }
    def toExpr(c: Column): Bfs = { toE = c; this }
    def toExpr(s: String): Bfs = { toE = expr(s); this }
    def maxPathLength(n: Int): Bfs = { maxLen = n; this }

    def run(): DataFrame = {
      val v = g.vertices
      val vCols = v.columns
      def vs(alias: String) = struct(vCols.map(c => col(s"$alias.$c").as(c)): _*)
      val eCols = g.edges.columns
      def es(alias: String) = struct(eCols.map(c => col(s"$alias.$c").as(c)): _*)

      val start = v.filter(fromE)
      // depth 0: from == to
      val hit0 = start.filter(toE)
      if (!hit0.isEmpty) return hit0
        .select(struct(vCols.map(col): _*).as("from"),
          struct(vCols.map(col): _*).as("to"))

      // frontier: (from struct, pathIds array, tip id)
      var frontier = start.select(
        struct(vCols.map(col): _*).as("from"),
        array(col(ID)).as("__path"),
        col(ID).as("__tip"))
      var hops = Seq.empty[(String, String)] // (edge col, vertex col) names
      var depth = 0
      while (depth < maxLen) {
        depth += 1
        val eAl = s"e${depth - 1}"; val vAl = s"v$depth"
        val stepped = frontier.as("__f")
          .join(g.edges.as("__e"), col("__f.__tip") === col(s"__e.$SRC"))
          .join(v.as("__v"), col(s"__e.$DST") === col(s"__v.$ID"))
          .filter(!array_contains(col("__f.__path"), col(s"__v.$ID")))
          .select(Seq(col("__f.*"), es("__e").as(eAl), vs("__v").as(vAl)): _*)
          .withColumn("__path", array_append(col("__path"), col(s"$vAl.$ID")))
          .withColumn("__tip", col(s"$vAl.$ID"))
        hops = hops :+ (eAl, vAl)
        // resolve toExpr against the tip vertex struct
        val tipFiltered = stepped.filter(structFilter(toE, vAl, vCols))
        if (!tipFiltered.isEmpty) {
          val outCols = col("from") +: hops.dropRight(1).flatMap {
            case (e, vv) => Seq(col(e), col(vv)) } :+ col(hops.last._1) :+
            col(hops.last._2).as("to")
          return tipFiltered.select(outCols: _*)
        }
        frontier = stepped
      }
      // no path within maxLen → empty frame with (from, to) shape
      start.filter(lit(false))
        .select(struct(vCols.map(col): _*).as("from"),
          struct(vCols.map(col): _*).as("to"))
    }

    /** Rewrites a vertex-level predicate to apply to struct column `al`. */
    private def structFilter(c: Column, al: String, vCols: Seq[String]): Column = {
      import org.apache.spark.sql.GraftBridge
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      GraftBridge.column(GraftBridge.expression(c).transformUp {
        case UnresolvedAttribute(parts) if vCols.contains(parts.mkString(".")) =>
          UnresolvedAttribute(Seq(al) ++ parts)
      })
    }
  }

  /** GraphFrames `AM` — column anchors for [[GraphFrame.aggregateMessages]]. */
  object AM {
    val src: Column = col("src")
    val dst: Column = col("dst")
    val edge: Column = col("edge")
    val msg: Column = col("MSG")
    def src(field: String): Column = col(s"src.$field")
    def dst(field: String): Column = col(s"dst.$field")
    def edge(field: String): Column = col(s"edge.$field")
  }

  final class AggregateMessages private[graph] (g: GraphFrame) {
    private var toSrc: Option[Column] = None
    private var toDst: Option[Column] = None
    def sendToSrc(c: Column): AggregateMessages = { toSrc = Some(c); this }
    def sendToDst(c: Column): AggregateMessages = { toDst = Some(c); this }

    /** One aggregate over the received messages, grouped by recipient id.
      *
      * Both-directions sends are ONE explode projection over the triplet
      * relation, not a 2-branch union: the triplets view joins vertices
      * twice, and Spark shares no subplan across union branches, so the
      * union spelling ran those joins twice per query (the g30/g20
      * finding, enforced library-wide by UnionLintSpec).
      */
    def agg(aggCol: Column): DataFrame = {
      require(toSrc.nonEmpty || toDst.nonEmpty,
        "aggregateMessages: set sendToSrc and/or sendToDst")
      val t = g.triplets
      def part(recipient: String, m: Column) =
        struct(col(s"$recipient.${GraphFrame.ID}").as(ID), m.as("MSG"))
      val parts = Seq(
        toDst.map(m => part("dst", m)),
        toSrc.map(m => part("src", m))).flatten
      t.select(explode(array(parts: _*)).as("m"))
        .select(col(s"m.$ID").as(ID), col("m.MSG").as("MSG"))
        .groupBy(col(ID)).agg(aggCol)
    }
  }

  // motif parser/planner --------------------------------------------------

  private[graph] object Motif {
    private val Term = """(!?)\((\w*)\)-\[(\w*)\]->\((\w*)\)""".r

    def find(g: GraphFrame, pattern: String): DataFrame = {
      val terms = pattern.split(";").map(_.trim).filter(_.nonEmpty).map {
        case Term(neg, a, e, b) => (neg == "!", a, e, b)
        case t => throw new IllegalArgumentException(
          s"unsupported motif term '$t' (expected '(a)-[e]->(b)' or '!(a)-[]->(b)')")
      }
      val (negs, pos) = terms.partition(_._1)
      require(pos.nonEmpty, "motif needs at least one positive term")

      val vCols = g.vertices.columns
      def vStruct(alias: String) =
        struct(vCols.map(c => col(s"$alias.$c").as(c)): _*)
      val eCols = g.edges.columns
      def eStruct(alias: String) =
        struct(eCols.map(c => col(s"$alias.$c").as(c)): _*)

      var bound = Set.empty[String] // named vertices already in the frame
      var named = Seq.empty[String] // output column order
      var cur: DataFrame = null
      var anon = 0

      pos.foreach { case (_, a, e, b) =>
        val ea = if (e.nonEmpty) e else { anon += 1; s"__anon$anon" }
        // one triplet instance per term, aliased by its element names
        val va = if (a.nonEmpty) a else { anon += 1; s"__anon$anon" }
        val vb = if (b.nonEmpty) b else { anon += 1; s"__anon$anon" }
        val t = g.edges.as(s"__e_$ea")
          .join(g.vertices.as(s"__v_$va"),
            col(s"__e_$ea.${GraphFrame.SRC}") === col(s"__v_$va.${GraphFrame.ID}"))
          .join(g.vertices.as(s"__v_$vb"),
            col(s"__e_$ea.${GraphFrame.DST}") === col(s"__v_$vb.${GraphFrame.ID}"))
          .select(
            (Seq(vStruct(s"__v_$va").as(va), eStruct(s"__e_$ea").as(ea),
              vStruct(s"__v_$vb").as(vb))): _*)
        if (cur == null) cur = t
        else {
          val joinKeys = Seq(va, vb).filter(bound.contains)
          cur =
            if (joinKeys.isEmpty) cur.crossJoin(t)
            else cur.join(t.withColumnsRenamed(
                joinKeys.map(k => k -> s"__r_$k").toMap),
              joinKeys.map(k =>
                col(s"$k.${GraphFrame.ID}") === col(s"__r_$k.${GraphFrame.ID}"))
                .reduce(_ && _))
              .drop(joinKeys.map(k => s"__r_$k"): _*)
        }
        Seq(va, e -> 0, vb) // no-op; clarity
        val newNames = Seq(
          if (a.nonEmpty && !bound.contains(a)) Some(a) else None,
          if (e.nonEmpty) Some(e) else None,
          if (b.nonEmpty && !bound.contains(b)) Some(b) else None).flatten
        named = named ++ newNames
        bound = bound ++ Seq(a, b).filter(_.nonEmpty)
        // drop anonymous columns immediately
        cur = cur.drop(Seq(va, ea, vb).filter(_.startsWith("__anon")): _*)
      }

      negs.foreach { case (_, a, e, b) =>
        require(a.nonEmpty && b.nonEmpty && bound.contains(a) && bound.contains(b),
          s"negated term !($a)-[]->($b) needs both endpoints bound by positive terms")
        require(e.isEmpty, "negated motif terms cannot name their edge")
        cur = cur.join(g.edges.as("__neg"),
          col(s"$a.${GraphFrame.ID}") === col(s"__neg.${GraphFrame.SRC}") &&
            col(s"$b.${GraphFrame.ID}") === col(s"__neg.${GraphFrame.DST}"),
          "left_anti")
      }

      cur.select(named.map(col): _*)
    }
  }
}
