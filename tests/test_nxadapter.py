"""NetworkX adapter round-trips (nxadapter.py nx2nk/nk2nx)."""

from __future__ import annotations

import pytest

networkx = pytest.importorskip("networkx")

from networkit_spark.graph import Graph
from networkit_spark.nxadapter import from_networkx, to_networkx

pytestmark = pytest.mark.usefixtures("spark")


def test_from_networkx_weighted(spark):
    nxg = networkx.Graph()
    nxg.add_edge("a", "b", w=2.0)
    nxg.add_edge("b", "c", w=0.5)
    nxg.add_node("d")  # isolated
    g, idmap = from_networkx(spark, nxg, weight_attr="w")
    assert not g.directed and g.weighted
    assert g.number_of_nodes() == 4
    got = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert got == {(idmap["a"], idmap["b"]): 2.0,
                   (idmap["b"], idmap["c"]): 0.5}


def test_roundtrip_directed(spark):
    nxg = networkx.DiGraph()
    nxg.add_edges_from([(0, 1), (1, 2), (2, 0)])
    g, idmap = from_networkx(spark, nxg)
    assert g.directed and not g.weighted
    back = to_networkx(g)
    assert back.is_directed()
    assert set(back.edges()) == {(idmap[u], idmap[v])
                                 for u, v in nxg.edges()}


def test_to_networkx_weighted(spark):
    g = Graph.from_pandas(spark, [(0, 1, 3.0), (1, 2, 1.5)],
                          weighted=True, n=3)
    nxg = to_networkx(g)
    assert nxg[0][1]["weight"] == 3.0
    assert nxg[1][2]["weight"] == 1.5
    assert nxg.number_of_nodes() == 3


def test_kernel_parity_via_adapter(spark):
    """Degrees computed by the engine equal networkx degrees after
    conversion — the adapter preserves structure."""
    nxg = networkx.gnm_random_graph(30, 60, seed=7)
    g, idmap = from_networkx(spark, nxg)
    got = {r["id"]: r["degree"] for r in g.degrees().collect()}
    for u in nxg.nodes():
        assert got[idmap[u]] == nxg.degree(u)
