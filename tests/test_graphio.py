from networkit_spark.graph import Graph
from networkit_spark.sources import graphio


def test_edge_list_roundtrip(spark, tmp_path):
    g = Graph.from_pandas(spark, [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 1.0)], weighted=True)
    p = str(tmp_path / "el")
    graphio.write_edge_list(g, p)
    g2 = graphio.read_edge_list(spark, p)
    assert {(r["src"], r["dst"], r["weight"]) for r in g2.edges.collect()} == {
        (0, 1, 2.0), (1, 2, 1.0), (2, 3, 1.0)
    }
    assert g2.weighted


def test_edge_list_first_node_and_comments(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("# comment\n1 2\n2 3\n")
    g = graphio.read_edge_list(spark, str(p), first_node=1)
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {(0, 1), (1, 2)}


def test_edge_list_noncontinuous(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("100 200\n200 500\n")
    g = graphio.read_edge_list(spark, str(p), continuous=False)
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {(0, 1), (1, 2)}


def test_metis_roundtrip(spark, tmp_path):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], n=4)
    p = str(tmp_path / "g.graph")
    graphio.write_metis(g, p)
    g2 = graphio.read_metis(spark, p)
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == {
        (0, 1), (1, 2), (0, 2), (2, 3)
    }
    assert g2.number_of_nodes() == 4


def test_metis_reads_reference_fixture_format(spark, tmp_path):
    # karate-club-style header: n m
    p = tmp_path / "tiny.graph"
    p.write_text("3 2\n2 3\n1\n1\n")  # 1-based: edges (0,1), (0,2)
    g = graphio.read_metis(spark, str(p))
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {(0, 1), (0, 2)}


def test_labels_parquet_roundtrip(spark, tmp_path):
    labels = spark.createDataFrame([(0, 5), (1, 5)], "id long, label long")
    p = str(tmp_path / "labels")
    graphio.write_labels_parquet(labels, p)
    back = graphio.read_labels_parquet(spark, p)
    assert {(r["id"], r["label"]) for r in back.collect()} == {(0, 5), (1, 5)}


def test_read_snap_remaps_ids(spark, tmp_path):
    p = tmp_path / "snap.txt"
    p.write_text("# comment\n100\t200\n200\t300\n100\t300\n")
    from networkit_spark.sources.graphio import read_snap

    g = read_snap(spark, str(p), directed=True)
    assert g.number_of_nodes() == 3
    assert g.number_of_edges() == 3
    ids = {r["id"] for r in g.nodes().collect()}
    assert ids == {0, 1, 2}  # densified from 100/200/300


def test_read_konect_one_based(spark, tmp_path):
    p = tmp_path / "out.test"
    p.write_text("% sym unweighted\n1 2\n2 3\n")
    from networkit_spark.sources.graphio import read_konect

    g = read_konect(spark, str(p))
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1), (1, 2)]


def test_gml_roundtrip(spark, tmp_path):
    from networkit_spark.graph import Graph
    from networkit_spark.sources.graphio import read_gml, write_gml

    g = Graph.from_pandas(spark, [(0, 1, 2.5), (1, 2, 1.0)], weighted=True, n=4)
    p = str(tmp_path / "g.gml")
    write_gml(g, p)
    g2 = read_gml(spark, p)
    assert g2.number_of_nodes() == 4
    got = sorted(
        (r["src"], r["dst"], r["weight"]) for r in g2.edges.collect()
    )
    assert got == [(0, 1, 2.5), (1, 2, 1.0)]


def test_gml_reads_reference_fixture_shape(spark, tmp_path):
    # the reference's looptest-style GML: nodes then edges, self-loop legal
    p = tmp_path / "loop.gml"
    p.write_text(
        "graph [\n"
        "  node [\n    id 0\n  ]\n  node [\n    id 1\n  ]\n"
        "  edge [\n    source 0\n    target 1\n  ]\n"
        "  edge [\n    source 1\n    target 1\n  ]\n"
        "]\n"
    )
    g = graphio.read_gml(spark, str(p))
    assert g.number_of_nodes() == 2
    assert g.number_of_edges() == 2
    loops = g.edges.filter("src = dst").count()
    assert loops == 1


def test_dot_and_snap_writers(spark, tmp_path):
    from networkit_spark.graph import Graph
    from networkit_spark.sources.graphio import write_dot, write_snap

    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], directed=True)
    dot = tmp_path / "g.dot"
    write_dot(g, str(dot))
    assert "digraph" in dot.read_text() and "0 -> 1;" in dot.read_text()
    snap = tmp_path / "g.snap"
    write_snap(g, str(snap))
    assert snap.read_text().startswith("# Nodes: 3 Edges: 2")


def test_mtx_roundtrip(spark, tmp_path):
    from networkit_spark.graph import Graph
    from networkit_spark.sources.graphio import read_mtx, write_mtx

    g = Graph.from_pandas(spark, [(0, 1, 2.0), (1, 2, 1.0)], weighted=True, n=3)
    p = str(tmp_path / "g.mtx")
    write_mtx(g, p)
    txt = open(p).read()
    assert txt.startswith("%%MatrixMarket matrix coordinate real symmetric")
    g2 = read_mtx(spark, p)
    got = sorted((r["src"], r["dst"], r["weight"]) for r in g2.edges.collect())
    assert got == [(0, 1, 2.0), (1, 2, 1.0)]


def test_clustered_random_generator(spark):
    from networkit_spark.sources.generators import clustered_random_graph

    g = clustered_random_graph(spark, n=30, k=3, p_in=1.0, p_out=0.0, seed=1)
    # p_in=1, p_out=0 -> 3 complete blocks of 10 (node i in block i%3)
    assert g.number_of_edges() == 3 * (10 * 9 // 2)
    from networkit_spark.operators.components import connected_components

    labels, _ = connected_components(g)
    assert labels.select("label").distinct().count() == 3


def test_graphml_roundtrip(spark, tmp_path):
    from networkit_spark.graph import Graph
    from networkit_spark.sources.graphio import read_graphml, write_graphml

    g = Graph.from_pandas(spark, [(0, 1, 2.0), (1, 2, 1.0)], weighted=True, n=3)
    p = str(tmp_path / "g.graphml")
    write_graphml(g, p)
    g2 = read_graphml(spark, p)
    got = sorted((r["src"], r["dst"], r["weight"]) for r in g2.edges.collect())
    assert got == [(0, 1, 2.0), (1, 2, 1.0)]
    assert not g2.directed


def test_read_dgs(spark, tmp_path):
    from networkit_spark.sources.graphio import read_dgs
    from networkit_spark.streaming.dynamics import apply_events
    from networkit_spark.graph import Graph
    from pyspark.sql import functions as F

    p = tmp_path / "g.dgs"
    p.write_text(
        "DGS004\n"
        "test 0 0\n"
        "an A\nan B\nan C\n"
        "st 1\n"
        "ae e1 A B\nae e2 B C\n"
        "st 2\n"
        "ce A-B weight=5\n"
        "de B-C\n"
    )
    events, names = read_dgs(spark, str(p))
    assert names == {"A": 0, "B": 1, "C": 2}
    kinds = {r["type"] for r in events.collect()}
    assert kinds == {
        "TIME_STEP", "NODE_ADDITION", "EDGE_ADDITION",
        "EDGE_WEIGHT_UPDATE", "EDGE_REMOVAL",
    }
    g0 = Graph(
        spark.createDataFrame([], "src long, dst long, weight double"),
        vertices=spark.range(0).select(F.col("id")),
        directed=False, weighted=True,
    )
    g1 = apply_events(g0, events.filter(F.col("type") != "TIME_STEP"))
    got = {(r["src"], r["dst"]): r["weight"] for r in g1.edges.collect()}
    assert got == {(0, 1): 5.0}  # A-B updated to 5, B-C removed
    assert {r["id"] for r in g1.nodes().collect()} == {0, 1, 2}


def test_read_dgs_bad_magic(spark, tmp_path):
    from networkit_spark.sources.graphio import read_dgs
    import pytest as _pytest

    p = tmp_path / "bad.dgs"
    p.write_text("DGS003\nx 0 0\n")
    with _pytest.raises(ValueError, match="DGS004"):
        read_dgs(spark, str(p))


def test_read_dgs_hyphenated_node_names(spark, tmp_path):
    """Round-3 ADVICE: ce/de must resolve edge NAMES through the map
    populated by 'ae' events (reference DGSReader keeps a name map) —
    node names containing hyphens must not be mis-split."""
    from networkit_spark.sources.graphio import read_dgs

    p = tmp_path / "h.dgs"
    p.write_text(
        "DGS004\n"
        "test 0 0\n"
        "an node-a\nan node-b\n"
        "ae e1 node-a node-b\n"
        "ce e1 weight=3\n"
        "de e1\n"
    )
    events, names = read_dgs(spark, str(p))
    assert names == {"node-a": 0, "node-b": 1}
    rows = {(r["type"], r["u"], r["v"]) for r in events.collect()}
    assert ("EDGE_WEIGHT_UPDATE", 0, 1) in rows
    assert ("EDGE_REMOVAL", 0, 1) in rows
    # no phantom nodes were minted by splitting 'e1' or 'node-a'
    assert len(names) == 2


# --- NetworkitBinary (io/NetworkitBinaryGraph.hpp, nkbg004) -----------------


def test_nkbg_varint_spec_examples():
    from networkit_spark.sources.graphio import (
        _nkbg_varint_decode,
        _nkbg_varint_encode,
    )

    # spec: 0 encodes as a single 0x01 byte
    assert _nkbg_varint_encode(0) == b"\x01"
    # spec example: 7-bit value fits in the header byte
    x = 0b1111110
    enc = _nkbg_varint_encode(x)
    assert len(enc) == 1 and enc[0] & 1 == 1
    for v in [0, 1, 63, 64, 127, 128, 300, 2**20, 2**56 - 1, 2**56,
              2**64 - 1]:
        enc = _nkbg_varint_encode(v)
        dec, pos = _nkbg_varint_decode(enc, 0)
        assert dec == v and pos == len(enc), v
    # 8-data-byte case starts with a zero header byte
    assert _nkbg_varint_encode(2**56)[0] == 0


def test_nkbg_roundtrip_undirected(spark, tmp_path):
    from networkit_spark.sources.graphio import (
        read_networkit_binary,
        write_networkit_binary,
    )
    from networkit_spark.graph import Graph

    # self-loop + isolated node 5 + hole (node 6 absent from universe)
    g = Graph.from_pandas(
        spark, [(0, 1), (1, 2), (2, 3), (3, 0), (2, 2), (0, 4)], n=6
    )
    p = str(tmp_path / "g.nkbg")
    write_networkit_binary(g, p, chunks=3)
    g2 = read_networkit_binary(spark, p)
    assert not g2.directed and not g2.weighted
    assert sorted(r["id"] for r in g2.nodes().collect()) == list(range(6))
    got = sorted((r["src"], r["dst"]) for r in g2.edges.collect())
    assert got == sorted(
        (min(a, b), max(a, b))
        for a, b in [(0, 1), (1, 2), (2, 3), (3, 0), (2, 2), (0, 4)]
    )


def test_nkbg_roundtrip_directed_weighted(spark, tmp_path):
    from networkit_spark.sources.graphio import (
        read_networkit_binary,
        write_networkit_binary,
    )
    from networkit_spark.graph import Graph

    edges = [(0, 1, 0.5), (1, 2, 2.25), (2, 0, 3.0), (0, 2, 1.75)]
    g = Graph.from_pandas(spark, edges, n=3, directed=True, weighted=True)
    for fmt, exact in [("double", True), ("float", True),
                       ("varint", False), ("signed_varint", False)]:
        p = str(tmp_path / f"g_{fmt}.nkbg")
        write_networkit_binary(g, p, chunks=2, weight_format=fmt)
        g2 = read_networkit_binary(spark, p)
        assert g2.directed and g2.weighted
        got = sorted(
            (r["src"], r["dst"], r["weight"]) for r in g2.edges.collect()
        )
        if exact:
            assert got == sorted(edges)
        else:  # integer formats truncate
            assert [(s, d) for s, d, _ in got] == sorted(
                (s, d) for s, d, _ in edges
            )


def test_nkbg_rejects_bad_magic(spark, tmp_path):
    from networkit_spark.sources.graphio import read_networkit_binary

    p = tmp_path / "bad.nkbg"
    p.write_bytes(b"notmagic" + b"\x00" * 88)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="magic"):
        read_networkit_binary(spark, str(p))


import pytest  # noqa: E402


# ---------------------------------------------------------------------------
# ThrillGraphBinary + GraphToolBinary round-trips
# (io/ThrillGraphBinaryReader.cpp, GraphToolBinaryReader.cpp)
# ---------------------------------------------------------------------------


def test_thrill_binary_roundtrip(spark, tmp_path):
    from networkit_spark.sources.graphio import (
        read_thrill_binary,
        write_thrill_binary,
    )

    edges = [(0, 1), (1, 2), (2, 4), (0, 4), (3, 3)]
    g = Graph.from_pandas(spark, edges, n=5)
    p = str(tmp_path / "g.thrill")
    write_thrill_binary(g, p)
    g2 = read_thrill_binary(spark, p)
    assert g2.number_of_nodes() == 5
    got = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    want = {(min(u, v), max(u, v)) for u, v in edges}
    assert got == want


def test_thrill_binary_varint_degree_and_multifile(spark, tmp_path):
    from networkit_spark.sources.graphio import (
        read_thrill_binary,
        write_thrill_binary,
    )

    # hub with 130 neighbors -> degree needs a 2-byte varint
    edges = [(0, i) for i in range(1, 131)]
    g = Graph.from_pandas(spark, edges, n=131)
    p = str(tmp_path / "hub.thrill")
    write_thrill_binary(g, p)
    raw = open(p, "rb").read()
    assert raw[0] & 0x80  # multi-byte varint emitted
    g2 = read_thrill_binary(spark, p)
    assert g2.number_of_edges() == 130
    # multi-file concatenation: split after node 0's record
    rec0 = 2 + 130 * 4
    a, b = str(tmp_path / "part0"), str(tmp_path / "part1")
    open(a, "wb").write(raw[:rec0])
    open(b, "wb").write(raw[rec0:])
    g3 = read_thrill_binary(spark, [a, b])
    assert g3.number_of_edges() == 130


@pytest.mark.parametrize("directed", [False, True])
def test_graphtool_binary_roundtrip(spark, tmp_path, directed):
    from networkit_spark.sources.graphio import (
        read_graphtool_binary,
        write_graphtool_binary,
    )

    edges = [(0, 1), (1, 2), (2, 0), (3, 1)]
    g = Graph.from_pandas(spark, edges, n=4, directed=directed)
    p = str(tmp_path / "g.gt")
    write_graphtool_binary(g, p)
    g2 = read_graphtool_binary(spark, p)
    assert g2.directed == directed
    assert g2.number_of_nodes() == 4
    got = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    if directed:
        assert got == set(edges)
    else:
        assert got == {(min(u, v), max(u, v)) for u, v in edges}


def test_graphtool_binary_width2(spark, tmp_path):
    from networkit_spark.sources.graphio import (
        read_graphtool_binary,
        write_graphtool_binary,
    )

    # n = 300 forces 2-byte adjacency ids
    edges = [(i, i + 1) for i in range(299)]
    g = Graph.from_pandas(spark, edges, n=300)
    p = str(tmp_path / "w2.gt")
    write_graphtool_binary(g, p)
    g2 = read_graphtool_binary(spark, p)
    assert g2.number_of_nodes() == 300
    assert g2.number_of_edges() == 299


def test_read_write_graph_dispatch(spark, tmp_path):
    """readGraph/writeGraph format dispatchers (graphio.pyx:1319-1366)."""
    from networkit_spark.sources.graphio import read_graph, write_graph

    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (0, 2)], n=3)
    p = str(tmp_path / "g.metis")
    write_graph(g, p, "METIS")
    back = read_graph(spark, p, "METIS")
    assert back.number_of_edges() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown graph format"):
        read_graph(spark, p, "NopeFormat")
    with _pytest.raises(ValueError, match="unknown graph format"):
        write_graph(g, p, "NopeFormat")


def test_read_graphs_directory(spark, tmp_path):
    """readGraphs (graphio.pyx:1368): pattern/exclude/some selection."""
    from networkit_spark.sources.graphio import read_graphs, write_graph

    for name, pairs in [("a.metis", [(0, 1)]), ("b.metis", [(0, 1), (1, 2)]),
                        ("skip.metis", [(0, 1)]), ("c.txt", [(0, 1)])]:
        write_graph(Graph.from_pandas(spark, pairs, n=3),
                    str(tmp_path / name), "METIS")
    got = read_graphs(spark, str(tmp_path), "*.metis", "METIS",
                      exclude="skip*")
    assert sorted(got) == ["a.metis", "b.metis"]
    assert got["b.metis"].number_of_edges() == 2
    capped = read_graphs(spark, str(tmp_path), "*.metis", "METIS", some=1)
    assert len(capped) == 1
