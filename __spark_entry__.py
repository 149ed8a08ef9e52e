"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship link-graph pipeline on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator for the
sf0.01 DuckDB cross-check (see networkit_spark/contract*.py for the
cross-engine determinism rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize the deterministic link graph from sf0.001,
    run PageRank, return the top-20 ranking with degrees joined."""
    from networkit_spark.contract import load_graph
    from networkit_spark.operators.pagerank import pagerank

    g = load_graph(spark, "/root/testdata/sf0.001")
    res = pagerank(g, max_iterations=10, tol=0.0, unroll=5)
    deg = g.degrees().select("id", "degree")
    return (
        res.scores.join(deg, "id")
        .select("id", F.round("score", 6).alias("score"), "degree")
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(20)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order matters: the driver rows only the FIRST 50 entries.

    Round-5 composition of the 50 in-cap slots (the invariant is
    "every registered query driver-green in round 4 OR round 5"):
      1. the round-4 red row (`graph_maxflow`, oracle CAST fixed) and
         EVERY new round-5 query — their only chance at a driver row;
      2. the 25 queries that were r3-green but rotated out in round 4 —
         at most one round stale after this run.
    Everything past the cap was driver-green in round 4 (the r4 PRIORITY
    block, the r4 STABLE TAIL, and the r4-green CORE refreshers) and
    stays covered by pytest plus the all-pairs DuckDB rehearsal
    (tests/test_contract_oracles.py) every round.
    """
    from networkit_spark import contract as c
    from networkit_spark import contract_docs as d
    from networkit_spark import contract_ext as e

    return {
        # --- PRIORITY: round-4 red row (oracle CAST fixed this round) --
        "graph_maxflow": e.q_maxflow,
        # --- PRIORITY: new in round 5 ---------------------------------
        "graph_group_closeness": e.q_group_closeness,
        "graph_bmatching": e.q_bmatching,
        "graph_dyn_betweenness": e.q_dyn_betweenness,
        "graph_dyn_approx_betweenness": e.q_dyn_approx_betweenness,
        "graph_approx_closeness": e.q_approx_closeness,
        "graph_scd_lfm": e.q_scd_lfm,
        "graph_group_betweenness": e.q_group_betweenness,
        "graph_scd_tce": e.q_scd_tce,
        "graph_scd_lte": e.q_scd_lte,
        "graph_scd_clique": e.q_scd_clique,
        "graph_dyn_top_harmonic": e.q_dyn_top_harmonic,
        "graph_scd_localt": e.q_scd_localt,
        "graph_scd_twophasel": e.q_scd_twophasel,
        "graph_scd_gtcomparison": e.q_scd_gtcomparison,
        "graph_sfigality": e.q_sfigality,
        "graph_partition_coverage": e.q_partition_coverage,
        "graph_laplacian": e.q_laplacian,
        "graph_square_clustering": e.q_square_clustering,
        "graph_luby": e.q_luby,
        "graph_partition_quality": e.q_partition_quality,
        "graph_cover_quality": e.q_cover_quality,
        "graph_neighborhood_fn": e.q_neighborhood_fn,
        "graph_volume": e.q_volume,
        "graph_spsp": e.q_spsp,
        "graph_algebraic_distance": e.q_algebraic_distance,
        "graph_dyn_apsp": e.q_dyn_apsp,
        "graph_permanence": e.q_permanence,
        "graph_reachable": e.q_reachable,
        "graph_seir": e.q_seir,
        "graph_gedwalk": e.q_gedwalk,
        "graph_st_distance": e.q_st_distance,
        "graph_simple_paths": e.q_simple_paths,
        "graph_spanning_edge": e.q_spanning_edge,
        "graph_floyd_warshall": e.q_floyd_warshall,
        "graph_dyn_bfs": e.q_dyn_bfs,
        "graph_local_max_matching": e.q_local_max_matching,
        "graph_modularity_scoring": e.q_modularity_scoring,
        "graph_nf_heuristic": e.q_nf_heuristic,
        "graph_complex_paths": e.q_complex_paths,
        "graph_kpath": e.q_kpath,
        # --- PRIORITY continued: round-5e/5f additions — never held a
        # driver row before; full oracles except the two rows-only UST /
        # grow-shrink entries (their strongest check is the driver row
        # count + pytest replicas) --------------------------------------
        "graph_clustering_gen": e.q_clustering_gen,
        "graph_dyn_bmatching": e.q_dyn_bmatching,
        "graph_agglomerative": e.q_agglomerative,
        "graph_edge_score_suite": e.q_edge_score_suite,
        "graph_simrank": e.q_simrank,
        "graph_sampled_rand": e.q_sampled_rand,
        "graph_overlap_nmi": e.q_overlap_nmi,
        # --- round-5h: PrunedLandmarkLabeling (PSL supersteps, full label
        # set) + dynamic-insertion repair (independent BFS oracle).  Two
        # same-module companions of in-cap rows (graph_complex_plci /
        # complexpaths.py, graph_prefix_jaccard / edgescores.py) moved
        # post-cap to make room — every module keeps a driver row.
        "graph_pll": e.q_pll,
        "graph_dyn_pll": e.q_dyn_pll,
        # ---------------------------------------------------- 50-row cap
        "graph_complex_plci": e.q_complex_plci,
        "graph_prefix_jaccard": e.q_prefix_jaccard,
        # --- round-5i: link-prediction completion (KatzIndex,
        # AdjustedRand/NeighborhoodDistance/NeighborsMeasure/SameCommunity,
        # AlgebraicDistanceIndex, RandomLinkSampler + ROC/PR metrics).
        # Post-cap (the 50 slots are taken by earlier never-rowed round-5
        # queries); full DuckDB oracles, rehearsal-verified at BOTH
        # sf0.001 and sf0.01 (the driver's exact comparison) every round.
        "graph_linkpred_more": e.q_linkpred_more,
        "graph_linkpred_katz": e.q_linkpred_katz,
        "graph_linkpred_algdist": e.q_linkpred_algdist,
        "graph_linkpred_eval": e.q_linkpred_eval,
        # --- sf-INDEPENDENT gate (fixed n=1000 synthetic disk): the
        # sf0.001 rehearsal runs the identical comparison the driver
        # would, so a cap slot adds nothing ------------------------------
        "graph_hyperbolic": e.q_hyperbolic,
        "graph_pivot_mds": e.q_pivot_mds,
        # --- round-5g additions (post-cap): full oracles, rehearsal-green
        # at sf0.001 + sf0.01 every round
        "graph_dyn_bc_one_node": e.q_dyn_bc_one_node,
        "graph_mocnik": e.q_mocnik,
        # --- rows-only entries (grow-shrink replica-proven in
        # tests/test_growshrink.py; the UST family against dense-exact
        # pseudo-inverse values in tests/test_ust.py) -------------------
        # --- round-5j: Dinic (value-equal companion of in-cap
        # graph_maxflow; full EK-unroll oracle projecting the flow value)
        "graph_dinic": e.q_dinic,
        # --- round-5j: GraphDifference edit script (full SQL oracle)
        "graph_diff": e.q_graph_diff,
        # --- round-5j: SuccessiveShortestPath min-cost flow
        # (independent transportation-LP oracle over shortest-path costs)
        "graph_min_cost_flow": e.q_min_cost_flow,
        # --- round-5j: ClusteringProjector + RandomSpanningForest
        "graph_project_back": e.q_project_back,
        "graph_random_forest": e.q_random_forest,
        "graph_grow_shrink": e.q_grow_shrink,
        "graph_group_closeness_ls": e.q_group_closeness_ls,
        "graph_planarity": e.q_planarity,
        "graph_approx_spanning_edge": e.q_approx_spanning_edge,
        "graph_forest_centrality": e.q_forest_centrality,
        "graph_electrical_closeness": e.q_electrical_closeness,
        # --- ROTATION displaced by the never-rowed round-5 additions:
        # r3-green core kernels (near-zero drift risk; still exercised
        # every round by pytest + the all-pairs DuckDB rehearsal) -------
        "graph_assortativity": e.q_assortativity,
        "graph_diameter": e.q_diameter,
        "graph_edge_scores": e.q_edge_scores,
        "graph_linkpred": e.q_linkpred,
        "graph_triangles": c.q_triangles,
        "graph_lcc": c.q_lcc,
        "graph_coarsen_cc": c.q_coarsen_cc,
        "graph_plp": c.q_plp,
        # --- displaced in round 5c: pure-SQL doc queries (r3-green,
        # near-zero drift risk, rehearsal-covered) ----------------------
        "sim_cosine_topk": d.q_cosine_topk,
        "dedup_exact": d.q_dedup_exact,
        "dedup_minhash_candidates": d.q_minhash_candidates,
        "sim_cosine_pairs": d.q_cosine_pairs,
        "dedup_jaccard_pairs": d.q_jaccard_pairs,
        "events_top_per_user": d.q_events_top_per_user,
        "graph_top_degree": c.q_top_degree,
        "graph_degree": c.q_degree,
        "dedup_minhash_sig": d.q_minhash_sig,
        "graph_coverage": e.q_coverage,
        "graph_scalars": c.q_scalars,
        "graph_cc_sizes": c.q_component_sizes,
        "text_token_count": d.q_token_count,
        "text_quality": d.q_quality,
        "text_langid": d.q_langid,
        "text_fingerprint": d.q_fingerprint,
        "events_agg": d.q_events_agg,
        # --- STABLE TAIL (driver-green in round 4; pytest + the all-
        # pairs DuckDB rehearsal keep them covered every round) ---------
        "graph_top_closeness": e.q_top_closeness,
        "graph_group_harmonic": e.q_group_harmonic,
        "graph_matching": e.q_matching,
        "graph_closeness": e.q_closeness,
        "graph_leiden": e.q_leiden,
        "graph_mapequation": e.q_mapequation,
        "graph_kcore": e.q_kcore,
        "graph_plm": e.q_plm,
        "graph_pagerank": c.q_pagerank,
        "graph_betweenness": e.q_betweenness,
        "graph_cc": c.q_connected_components,
        "graph_pagerank_large": e.q_pagerank_large,
        "multimodal_features": e.q_multimodal_features,
        "graph_approx_betweenness": e.q_approx_betweenness,
        "graph_kadabra": e.q_kadabra,
        "graph_top_harmonic": e.q_top_harmonic,
        "graph_node2vec_walks": e.q_node2vec_walks,
        "graph_sparsify": e.q_sparsify,
        "graph_msf": e.q_msf,
        "graph_anf": e.q_anf,
        "dedup_simhash_sig": e.q_simhash_sig,
        "dedup_simhash_candidates": e.q_simhash_candidates,
        "events_window": e.q_events_window,
        "sim_lsh_topk": e.q_lsh_topk,
        "graph_partition_measures": e.q_partition_measures,
        "graph_group_degree": e.q_group_degree,
        "graph_edge_switching": e.q_edge_switching,
        "graph_max_cliques": e.q_max_cliques,
        "graph_scd_nibble": e.q_scd_nibble,
        "graph_degree_shuffle": e.q_degree_shuffle,
        "graph_curveball": e.q_curveball,
        "graph_dyn_katz": e.q_dyn_katz,
        "graph_scd_gce": e.q_scd_gce,
        "graph_set_conductance": e.q_set_conductance,
        "graph_subgraph_compact": e.q_subgraph_compact,
        "graph_degree_centrality": e.q_degree_centrality,
        "graph_modularity": e.q_modularity,
        "graph_dyn_cc": e.q_dyn_cc,
        "graph_dyn_wcc": e.q_dyn_wcc,
        "graph_eigenvector": e.q_eigenvector,
        "graph_katz": e.q_katz,
        "graph_bipartite": e.q_bipartite,
        "graph_bfs": e.q_bfs,
        "graph_sssp": e.q_sssp,
        "graph_scc": e.q_scc,
        "graph_tri_edge": e.q_tri_edge,
        "graph_lcc_sampled": e.q_lcc_sampled,
        "graph_weighted_betweenness": e.q_weighted_betweenness,
        "graph_closeness_weighted": e.q_closeness_weighted,
        # --- round-5k: distance-family closure (APSP batch, ReverseBFS
        # on the directed graph, GraphDistance scalar wrapper).  Post-cap
        # with full DuckDB oracles, rehearsal-verified at sf0.001 +
        # sf0.01 every round.
        "graph_apsp": e.q_apsp,
        "graph_reverse_bfs": e.q_reverse_bfs,
        "graph_distance_scalar": e.q_graph_distance,
        "graph_affected_nodes": e.q_affected_nodes,
        # round-5l: Node2Vec LearnEmbedding (synchronous-SGNS contract,
        # full unrolled oracle: walks + vocab CDF + md5 draws + 2 GD
        # epochs replayed in SQL)
        "graph_node2vec_emb": e.q_node2vec_emb,
        # round-5l: PubWebGenerator — fixed-n synthetic gate
        # (sf-independent like graph_hyperbolic / graph_pivot_mds)
        "graph_pubweb": e.q_pubweb,
        "graph_dyn_pubweb": e.q_dyn_pubweb,
        "graph_dyn_path": e.q_dyn_path,
        "graph_dyn_hyperbolic": e.q_dyn_hyperbolic,
        "graph_maxent_stress": e.q_maxent_stress,
        # --- round-5k closing additions (post-cap by design: the 50
        # slots are long taken; every entry below has a full DuckDB
        # oracle except the rows-only spectral coloring, and each was
        # dry-run at BOTH sf0.001 and sf0.01 with the driver's exact
        # comparison before landing) ------------------------------------
        "graph_maxent_metrics": e.q_maxent_metrics,
        "graph_chung_lu_alam": e.q_chung_lu_alam,
        "graph_umsf": e.q_umsf,
        "graph_matching_coarsen": e.q_matching_coarsen,
        "graph_curveball_trade_gen": e.q_curveball_trade_gen,
        "graph_curveball_run": e.q_curveball_run,
        "graph_spectral_coloring": e.q_spectral_coloring,
        # rows-only: sequential growth recurrences (see contract_ext
        # comment) — invariant-proven in tests/test_dyngen.py
        "graph_dyn_generators": e.q_dyn_generators,
        # --- round-5l: algebraic module (COO matrices: construction,
        # add/scale/transpose, SpMV, SpMM — full oracle) -----------------
        "graph_algebra": e.q_algebra,
        # --- round-5l: profiling module (properties + degree-measure
        # stats + component partition stats, full oracle) ----------------
        "graph_profile": e.q_profile,
        # --- round-5l: traversal module (BFS visit order + tree; DFS is
        # pytest-replica-only, see contract comment) ---------------------
        "graph_traversal": e.q_traversal,
        # --- round-5l: stats module (gini, full oracle) -----------------
        "graph_gini": e.q_gini,
    }


def oracle_sql() -> dict[str, str]:
    from networkit_spark import contract as c
    from networkit_spark import contract_docs as d
    from networkit_spark import contract_ext as e

    return {
        "graph_degree": c.SQL_DEGREE,
        "graph_top_degree": c.SQL_TOP_DEGREE,
        "graph_scalars": c.SQL_SCALARS,
        "graph_cc": c.SQL_CC,
        "graph_cc_sizes": c.SQL_CC_SIZES,
        "graph_pagerank": c.SQL_PAGERANK,
        "graph_plp": c.SQL_PLP,
        "graph_triangles": c.SQL_TRIANGLES,
        "graph_lcc": c.SQL_LCC,
        "graph_coarsen_cc": c.SQL_COARSEN_CC,
        "dedup_exact": d.SQL_DEDUP_EXACT,
        "dedup_minhash_sig": d.SQL_MINHASH_SIG,
        "dedup_minhash_candidates": d.SQL_MINHASH_CANDIDATES,
        "dedup_jaccard_pairs": d.SQL_JACCARD_PAIRS,
        "text_token_count": d.SQL_TOKEN_COUNT,
        "text_quality": d.SQL_QUALITY,
        "text_langid": d.SQL_LANGID,
        "text_fingerprint": d.SQL_FINGERPRINT,
        "sim_cosine_pairs": d.SQL_COSINE_PAIRS,
        "sim_cosine_topk": d.SQL_COSINE_TOPK,
        "events_agg": d.SQL_EVENTS_AGG,
        "events_top_per_user": d.SQL_EVENTS_TOP_PER_USER,
        "graph_subgraph_compact": e.SQL_SUBGRAPH_COMPACT,
        "graph_degree_centrality": e.SQL_DEGREE_CENTRALITY,
        "graph_modularity": e.SQL_MODULARITY,
        "graph_dyn_cc": e.SQL_DYN_CC,
        "graph_dyn_wcc": e.SQL_DYN_WCC,
        "graph_eigenvector": e.SQL_EIGENVECTOR,
        "graph_katz": e.SQL_KATZ,
        "graph_plm": e.SQL_PLM,
        "graph_leiden": e.SQL_LEIDEN,
        "graph_mapequation": e.SQL_MAPEQUATION,
        "graph_kcore": e.SQL_KCORE,
        "graph_bipartite": e.SQL_BIPARTITE,
        "graph_bfs": e.SQL_BFS,
        "graph_sssp": e.SQL_SSSP,
        "graph_scc": e.SQL_SCC,
        "graph_tri_edge": e.SQL_TRI_EDGE,
        "graph_lcc_sampled": e.SQL_LCC_SAMPLED,
        "graph_betweenness": e.SQL_BETWEENNESS,
        "graph_approx_betweenness": e.SQL_APPROX_BETWEENNESS,
        "graph_weighted_betweenness": e.SQL_WEIGHTED_BETWEENNESS,
        "graph_closeness": e.SQL_CLOSENESS,
        "graph_top_closeness": e.SQL_TOP_CLOSENESS,
        "graph_closeness_weighted": e.SQL_CLOSENESS_WEIGHTED,
        "graph_assortativity": e.SQL_ASSORTATIVITY,
        "graph_diameter": e.SQL_DIAMETER,
        "graph_coverage": e.SQL_COVERAGE,
        "graph_edge_scores": e.SQL_EDGE_SCORES,
        "graph_linkpred": e.SQL_LINKPRED,
        "graph_sparsify": e.SQL_SPARSIFY,
        "graph_node2vec_walks": e.SQL_NODE2VEC,
        "graph_msf": e.SQL_MSF,
        "graph_anf": e.SQL_ANF,
        "graph_pagerank_large": e.SQL_PAGERANK_LARGE,
        "dedup_simhash_sig": e.SQL_SIMHASH_SIG,
        "dedup_simhash_candidates": e.SQL_SIMHASH_CANDIDATES,
        "events_window": e.SQL_EVENTS_WINDOW,
        # LSH top-k / multimodal: oracled by unrolling the seeded
        # hyperplane literals / the stub's sha256-digest arithmetic into
        # the SQL (same trick as the unrolled kernel oracles)
        "sim_lsh_topk": e.SQL_LSH_TOPK,
        "multimodal_features": e.SQL_MULTIMODAL,
        # round 4
        "graph_partition_measures": e.SQL_PARTITION_MEASURES,
        "graph_matching": e.SQL_MATCHING,
        "graph_group_degree": e.SQL_GROUP_DEGREE,
        "graph_group_harmonic": e.SQL_GROUP_HARMONIC,
        "graph_kadabra": e.SQL_KADABRA,
        "graph_maxflow": e.SQL_MAXFLOW,
        "graph_dinic": e.SQL_DINIC,
        "graph_diff": e.SQL_GRAPH_DIFF,
        "graph_min_cost_flow": e.SQL_MIN_COST_FLOW,
        "graph_project_back": e.SQL_PROJECT_BACK,
        "graph_random_forest": e.SQL_RANDOM_FOREST,
        "graph_edge_switching": e.SQL_EDGE_SWITCHING,
        "graph_max_cliques": e.SQL_MAX_CLIQUES,
        "graph_scd_nibble": e.SQL_SCD_NIBBLE,
        "graph_top_harmonic": e.SQL_TOP_HARMONIC,
        "graph_degree_shuffle": e.SQL_DEGREE_SHUFFLE,
        "graph_curveball": e.SQL_CURVEBALL,
        "graph_dyn_katz": e.SQL_DYN_KATZ,
        "graph_scd_gce": e.SQL_SCD_GCE,
        "graph_set_conductance": e.SQL_SET_CONDUCTANCE,
        # round 5
        "graph_group_closeness": e.SQL_GROUP_CLOSENESS,
        "graph_bmatching": e.SQL_BMATCHING,
        "graph_dyn_betweenness": e.SQL_DYN_BETWEENNESS,
        "graph_dyn_approx_betweenness": e.SQL_DYN_APPROX_BETWEENNESS,
        "graph_approx_closeness": e.SQL_APPROX_CLOSENESS,
        "graph_scd_lfm": e.SQL_SCD_LFM,
        "graph_group_betweenness": e.SQL_GROUP_BETWEENNESS,
        "graph_scd_tce": e.SQL_SCD_TCE,
        "graph_scd_lte": e.SQL_SCD_LTE,
        "graph_scd_clique": e.SQL_SCD_CLIQUE,
        "graph_dyn_top_harmonic": e.SQL_DYN_TOP_HARMONIC,
        "graph_scd_localt": e.SQL_SCD_LOCALT,
        "graph_scd_twophasel": e.SQL_SCD_TWOPHASEL,
        "graph_scd_gtcomparison": e.SQL_SCD_GTCOMPARISON,
        "graph_sfigality": e.SQL_SFIGALITY,
        "graph_partition_coverage": e.SQL_PARTITION_COVERAGE,
        "graph_laplacian": e.SQL_LAPLACIAN,
        "graph_square_clustering": e.SQL_SQUARE_CLUSTERING,
        "graph_luby": e.SQL_LUBY,
        "graph_partition_quality": e.SQL_PARTITION_QUALITY,
        "graph_cover_quality": e.SQL_COVER_QUALITY,
        "graph_neighborhood_fn": e.SQL_NEIGHBORHOOD_FN,
        "graph_volume": e.SQL_VOLUME,
        "graph_spsp": e.SQL_SPSP,
        "graph_algebraic_distance": e.SQL_ALGEBRAIC_DISTANCE,
        "graph_dyn_apsp": e.SQL_DYN_APSP,
        "graph_permanence": e.SQL_PERMANENCE,
        "graph_reachable": e.SQL_REACHABLE,
        "graph_seir": e.SQL_SEIR,
        "graph_gedwalk": e.SQL_GEDWALK,
        "graph_st_distance": e.SQL_ST_DISTANCE,
        "graph_simple_paths": e.SQL_SIMPLE_PATHS,
        "graph_spanning_edge": e.SQL_SPANNING_EDGE,
        "graph_floyd_warshall": e.SQL_FLOYD_WARSHALL,
        "graph_dyn_bfs": e.SQL_DYN_BFS,
        "graph_local_max_matching": e.SQL_LOCAL_MAX_MATCHING,
        "graph_modularity_scoring": e.SQL_MODULARITY_SCORING,
        "graph_nf_heuristic": e.SQL_NF_HEURISTIC,
        "graph_complex_paths": e.SQL_COMPLEX_PATHS,
        "graph_complex_plci": e.SQL_COMPLEX_PLCI,
        "graph_kpath": e.SQL_KPATH,
        "graph_edge_score_suite": e.SQL_EDGE_SCORE_SUITE,
        "graph_prefix_jaccard": e.SQL_PREFIX_JACCARD,
        "graph_simrank": e.SQL_SIMRANK,
        "graph_clustering_gen": e.SQL_CLUSTERING_GEN,
        "graph_dyn_bmatching": e.SQL_DYN_BMATCHING,
        "graph_agglomerative": e.SQL_AGGLOMERATIVE,
        "graph_sampled_rand": e.SQL_SAMPLED_RAND,
        "graph_overlap_nmi": e.SQL_OVERLAP_NMI,
        "graph_hyperbolic": e.SQL_HYPERBOLIC,
        "graph_pivot_mds": e.SQL_PIVOT_MDS,
        "graph_dyn_bc_one_node": e.SQL_DYN_BC_ONE_NODE,
        "graph_mocnik": e.SQL_MOCNIK,
        "graph_pll": e.SQL_PLL,
        "graph_dyn_pll": e.SQL_DYN_PLL,
        "graph_linkpred_more": e.SQL_LINKPRED_MORE,
        "graph_linkpred_katz": e.SQL_LINKPRED_KATZ,
        "graph_linkpred_algdist": e.SQL_LINKPRED_ALGDIST,
        "graph_linkpred_eval": e.SQL_LINKPRED_EVAL,
        "graph_apsp": e.SQL_APSP,
        "graph_reverse_bfs": e.SQL_REVERSE_BFS,
        "graph_distance_scalar": e.SQL_GRAPH_DISTANCE,
        "graph_affected_nodes": e.SQL_AFFECTED_NODES,
        "graph_node2vec_emb": e.SQL_NODE2VEC_EMB,
        "graph_pubweb": e.SQL_PUBWEB,
        "graph_dyn_pubweb": e.SQL_DYN_PUBWEB,
        "graph_dyn_path": e.SQL_DYN_PATH,
        "graph_dyn_hyperbolic": e.SQL_DYN_HYPERBOLIC,
        "graph_maxent_stress": e.SQL_MAXENT_STRESS,
        "graph_maxent_metrics": e.SQL_MAXENT_METRICS,
        "graph_chung_lu_alam": e.SQL_CHUNG_LU_ALAM,
        "graph_umsf": e.SQL_UMSF,
        "graph_matching_coarsen": e.SQL_MATCHING_COARSEN,
        "graph_curveball_trade_gen": e.SQL_CURVEBALL_TRADE_GEN,
        "graph_curveball_run": e.SQL_CURVEBALL_RUN,
        "graph_algebra": e.SQL_ALGEBRA,
        "graph_profile": e.SQL_PROFILE,
        "graph_traversal": e.SQL_TRAVERSAL,
        "graph_gini": e.SQL_GINI,
    }
