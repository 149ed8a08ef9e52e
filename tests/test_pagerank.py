import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import (
    DISTRIBUTE_SINKS,
    NO_SINK_HANDLING,
    pagerank,
)
from tests.fixtures import (
    PR_EDGES,
    PR_EXPECTED,
    PR_N,
    PR_SINK_EDGES,
    PR_SINK_N,
    numpy_pagerank,
)


def scores_vec(df, n):
    rows = {r["id"]: r["score"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_pagerank_golden_8node(spark):
    """Matlab-derived golden fixture, CentralityGTest.cpp:689-729 (tol 1e-4)."""
    g = Graph.from_pandas(spark, PR_EDGES, weighted=True, n=PR_N)
    res = pagerank(g)
    got = scores_vec(res.scores, PR_N)
    assert np.allclose(got, PR_EXPECTED, atol=1e-4)
    # cross-check against the numpy oracle at full precision
    oracle, oit = numpy_pagerank(PR_N, PR_EDGES)
    assert np.allclose(got, oracle, atol=1e-9)
    assert res.info.iterations == oit  # synchronous Jacobi: step-identical


def test_pagerank_ranking_order(spark):
    g = Graph.from_pandas(spark, PR_EDGES, weighted=True, n=PR_N)
    res = pagerank(g)
    top = res.ranking(3).collect()
    # scores: node 2 and 5 tie at 0.2552 -> asc id on ties (Centrality.cpp:27-39)
    assert [r["id"] for r in top] == [2, 5, 3]


@pytest.mark.parametrize("mode", [NO_SINK_HANDLING, DISTRIBUTE_SINKS])
def test_pagerank_directed_sinks(spark, mode):
    g = Graph.from_pandas(spark, PR_SINK_EDGES, directed=True, n=PR_SINK_N)
    res = pagerank(g, distribute_sinks=mode)
    got = scores_vec(res.scores, PR_SINK_N)
    oracle, _ = numpy_pagerank(
        PR_SINK_N, PR_SINK_EDGES, directed=True,
        distribute_sinks=(mode == DISTRIBUTE_SINKS),
    )
    assert np.allclose(got, oracle, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-6


def test_pagerank_normalized_directed(spark):
    g = Graph.from_pandas(spark, PR_SINK_EDGES, directed=True, n=PR_SINK_N)
    res = pagerank(g, normalized=True)
    got = scores_vec(res.scores, PR_SINK_N)
    oracle, _ = numpy_pagerank(
        PR_SINK_N, PR_SINK_EDGES, directed=True, normalized=True
    )
    assert np.allclose(got, oracle, atol=1e-9)


def test_pagerank_l1_and_maxiter(spark):
    g = Graph.from_pandas(spark, PR_EDGES, weighted=True, n=PR_N)
    res = pagerank(g, norm="l1", max_iterations=5)
    assert res.info.iterations == 5
    oracle, _ = numpy_pagerank(PR_N, PR_EDGES, norm="l1", max_iterations=5)
    assert np.allclose(scores_vec(res.scores, PR_N), oracle, atol=1e-12)


def test_pagerank_csr_engine_parity(spark):
    g = Graph.from_pandas(spark, PR_EDGES, weighted=True, n=PR_N)
    res_df = pagerank(g, max_iterations=20)
    res_csr = pagerank(g, max_iterations=20, engine="csr", num_blocks=3)
    a = scores_vec(res_df.scores, PR_N)
    b = scores_vec(res_csr.scores, PR_N)
    assert np.allclose(a, b, atol=1e-12)


def test_pagerank_salted_parity(spark):
    g = Graph.from_pandas(spark, PR_EDGES, weighted=True, n=PR_N)
    res = pagerank(g, max_iterations=10, salt=3)
    oracle, _ = numpy_pagerank(PR_N, PR_EDGES, max_iterations=10)
    assert np.allclose(scores_vec(res.scores, PR_N), oracle, atol=1e-12)


def test_pagerank_csrblocks_engine_parity(spark):
    """dst-blocked CSR engine (parquet block store + worker-memoized
    numpy blocks, no per-superstep dst aggregation) matches the
    DataFrame engine bit-for-bit-close."""
    g = Graph.from_pandas(spark, PR_EDGES, weighted=True, n=PR_N)
    res_df = pagerank(g, max_iterations=20)
    res_blk = pagerank(g, max_iterations=20, engine="csrblocks", num_blocks=3)
    a = scores_vec(res_df.scores, PR_N)
    b = scores_vec(res_blk.scores, PR_N)
    assert np.allclose(a, b, atol=1e-12)


def test_pagerank_csrblocks_fixed_iter_fastpath(spark):
    """tol=0 + fixed iterations fast path under csrblocks."""
    g = Graph.from_pandas(spark, PR_EDGES, weighted=True, n=PR_N)
    res = pagerank(g, max_iterations=10, tol=0.0, engine="csrblocks", num_blocks=2)
    oracle, _ = numpy_pagerank(PR_N, PR_EDGES, max_iterations=10)
    assert np.allclose(scores_vec(res.scores, PR_N), oracle, atol=1e-12)
