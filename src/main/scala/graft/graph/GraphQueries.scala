package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query registry for the graph layer (SURVEY.md §2.10 G1–G7). */
object GraphQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_cooccurrence_edges" -> (CoGraph.q _),
    "g02_degrees" -> (CoGraph.degrees _),
    "g26_degree_distribution" -> (CoGraph.g26DegreeDistribution _),
    "g03_connected_components" -> (Components.q _),
    "g04_component_stats" -> (Components.componentStats _),
    "g05_weighted_edges" -> (CoGraph.weightedEdges _),
    "g06_pagerank_loop" -> (PageRankOps.q _),
    "g06b_pagerank_capped" -> ((s: SparkSession, d: String) =>
      PageRankOps.cappedQ(s, d)),
    "g07_top_pagerank" -> (PageRankOps.topQ _),
    "g08_pagerank_graphx" -> (PageRankOps.graphxPageRank _),
    "g08b_graphx_capped" -> ((s: SparkSession, d: String) =>
      PageRankOps.g08bCappedGraphxPageRank(s, d)),
    "g09_component_purity" -> (Components.componentPurity _),
    "g10_isolation_summary" -> (Components.isolationSummary _),
    "g11_mules" -> (PageRankOps.mules _),
    "g12_triangles" -> (Components.triangles _),
    "g13_fraud_distance" -> (Components.fraudDistance _),
    "g14_label_propagation" -> (Components.lpaQ _),
    "g14b_lpa_capped" -> (Components.g14bLpaCapped _),
    "g15_kcore" -> (Components.kcoreQ _),
    "g16_personalized_pagerank" -> (PageRankOps.personalizedPageRank(_, _)),
    "g16b_ppr_capped" -> ((s: SparkSession, d: String) =>
      PageRankOps.g16bCappedPpr(s, d)),
    "g17_fraud_cost_distance" -> ((s: SparkSession, d: String) =>
      Components.fraudCostDistance(s, d)),
    "g17b_cost_distance_capped" -> (Components.g17bCostDistanceCapped _),
    "g15b_kcore_capped" -> (Components.g15bKcoreCapped _),
    "g26b_degree_distribution_capped" ->
      (CoGraph.g26bCappedDegreeDistribution _),
    "g21b_assortativity_capped" -> (NeighborAgg.g21bCappedAssortativity _),
    "g18_hits" -> (PageRankOps.g18Hits _),
    "g19_neighbor_features" -> (NeighborAgg.g19NeighborFeatures _),
    "g20_clustering_coeff" -> (NeighborAgg.g20ClusteringCoeff _),
    "g20b_capped_clustering_coeff" -> (NeighborAgg.g20bCappedClusteringCoeff _),
    "g21_assortativity" -> (NeighborAgg.g21Assortativity _),
    "g22_capped_neighbor_features" -> (NeighborAgg.g22CappedNeighborFeatures _),
    "g23_scc" -> (Scc.q _),
    "g24_pingpong" -> (Scc.g24PingPong _),
    "g25_reciprocity" -> (Scc.g25Reciprocity _),
    "g27_neighborhood_function" -> (Centrality.g27NeighborhoodFunction _),
    "g27b_hyperball" -> (Centrality.g27bHyperball _),
    "g28_landmark_harmonic" -> (Centrality.g28LandmarkHarmonic _),
    "g29_modularity" -> (Centrality.g29Modularity _),
    "g29b_modularity_capped" -> (Centrality.g29bModularityCapped _),
    "g30_ktruss" -> (Components.ktrussQ _),
    "g30b_ktruss_fanout" -> (Components.g30bKtrussFanout _),
    "g31_landmark_betweenness" -> (Centrality.g31LandmarkBetweenness _),
    "g31b_betweenness_fanout" -> (Centrality.g31bBetweennessFanout _),
    "g32_hash_walks" -> (Walks.g32HashWalks _),
    "g32b_hash_walks_fanout" -> (Walks.g32bHashWalksFanout _),
    "g33_skipgram_pairs" -> (Walks.g33SkipgramPairs _)
  )

  val oracles: Map[String, String] = Map(
    "g08_pagerank_graphx" -> PageRankOps.graphxSql(),
    "g08b_graphx_capped" -> PageRankOps.graphxSql(
      edgesCte = CoGraph.cappedEdgesCte()),
    "g01_cooccurrence_edges" -> CoGraph.qSql,
    "g02_degrees" -> CoGraph.degreesSql,
    "g26_degree_distribution" -> CoGraph.g26Sql,
    "g03_connected_components" -> Components.qSql,
    "g04_component_stats" -> Components.componentStatsSql,
    "g05_weighted_edges" -> CoGraph.weightedEdgesSql,
    "g23_scc" -> Scc.qSql,
    "g24_pingpong" -> Scc.g24Sql,
    "g25_reciprocity" -> Scc.g25Sql,
    "g06_pagerank_loop" -> PageRankOps.qSql(),
    "g06b_pagerank_capped" -> PageRankOps.cappedQSql(),
    "g07_top_pagerank" -> PageRankOps.topQSql(),
    "g09_component_purity" -> Components.componentPuritySql,
    "g10_isolation_summary" -> Components.isolationSummarySql,
    "g11_mules" -> PageRankOps.mulesSql(),
    "g12_triangles" -> Components.trianglesSql,
    "g13_fraud_distance" -> Components.fraudDistanceSql,
    "g14_label_propagation" -> Components.lpaQSql,
    "g14b_lpa_capped" -> Components.g14bSql,
    "g15_kcore" -> Components.kcoreQSql,
    "g16_personalized_pagerank" -> PageRankOps.pprSql(),
    "g16b_ppr_capped" -> PageRankOps.pprSql(
      weightsCte = CoGraph.cappedWeightsCte()),
    "g17_fraud_cost_distance" -> Components.fraudCostDistanceSql,
    "g17b_cost_distance_capped" -> Components.g17bSql,
    "g15b_kcore_capped" -> Components.g15bSql,
    "g26b_degree_distribution_capped" -> CoGraph.g26bSql,
    "g21b_assortativity_capped" -> NeighborAgg.g21bSql,
    "g18_hits" -> PageRankOps.g18Sql,
    "g19_neighbor_features" -> NeighborAgg.g19Sql,
    "g20_clustering_coeff" -> NeighborAgg.g20Sql,
    "g20b_capped_clustering_coeff" -> NeighborAgg.g20bSql,
    "g21_assortativity" -> NeighborAgg.g21Sql,
    "g22_capped_neighbor_features" -> NeighborAgg.g22Sql,
    // g27b_hyperball carries no oracle: DuckDB has no DataSketches HLL —
    // rows-only at the driver; Round9bSpec pins its error against exact g27
    "g27_neighborhood_function" -> Centrality.g27Sql,
    "g28_landmark_harmonic" -> Centrality.g28Sql,
    "g29_modularity" -> Centrality.g29Sql,
    "g29b_modularity_capped" -> Centrality.g29bSql,
    "g30_ktruss" -> Components.ktrussQSql,
    "g30b_ktruss_fanout" -> Components.g30bSql,
    "g31_landmark_betweenness" -> Centrality.g31Sql,
    "g31b_betweenness_fanout" -> Centrality.g31bSql,
    "g32_hash_walks" -> Walks.g32Sql,
    "g32b_hash_walks_fanout" -> Walks.g32bSql,
    "g33_skipgram_pairs" -> Walks.g33Sql
  )
}
