"""Round-5 format I/O: RB, Dibap, Raster, Cover, EdgeListCover,
BinaryPartition — parity against the reference's own fixtures
(/root/reference/input/) and synthetic round-trips."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.graphio import (
    read_binary_partition,
    read_cover,
    read_dibap,
    read_edgelist_cover,
    read_metis,
    read_mtx,
    read_raster,
    read_rb,
    write_binary_partition,
    write_cover,
)

pytestmark = pytest.mark.usefixtures("spark")

REF_INPUT = "/root/reference/input"


def test_rb_reader_matches_mtx_on_reference_fixture(spark):
    # IOGTest.cpp:1289 testRBGraphReader — tiny_05.rb vs the MTX twin
    grb = read_rb(spark, f"{REF_INPUT}/tiny_05.rb")
    gmm = read_mtx(spark, f"{REF_INPUT}/tiny_05.matrixmarket",
                   directed=True)
    assert grb.directed and grb.weighted
    rb_edges = {
        (r["src"], r["dst"], r["weight"])
        for r in grb.edges.collect()
    }
    mm_edges = {
        (r["src"], r["dst"], r["weight"])
        for r in gmm.edges.collect()
    }
    assert rb_edges == mm_edges
    assert grb.number_of_nodes() == gmm.number_of_nodes() == 5


def test_rb_reader_symmetric_pattern(tmp_path, spark):
    # hand-built 'psa' file: 3x3 symmetric pattern, lower triangle
    # col1: rows 2,3; col2: row 3; col3: none  (1-indexed)
    p = tmp_path / "sym.rb"
    p.write_text(
        "tiny symmetric pattern                     T\n"
        "             3             1             1             0\n"
        "PSA                        3             3             3\n"
        "(4I3)           (3I3)\n"
        "  1  3  4  4\n"
        "  2  3  3\n"
    )
    g = read_rb(spark, str(p))
    assert not g.directed and not g.weighted
    edges = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert edges == {(1, 0), (2, 0), (2, 1)}


def test_dibap_reader_reference_fixture_matches_metis_twin(spark):
    # airfoil1.gi vs airfoil1.graph (same graph, DibaP vs METIS format)
    gd = read_dibap(spark, f"{REF_INPUT}/airfoil1.gi")
    gm = read_metis(spark, f"{REF_INPUT}/airfoil1.graph")
    d_edges = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in gd.edges.collect()
    }
    m_edges = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in gm.edges.collect()
    }
    assert gd.number_of_nodes() == gm.number_of_nodes()
    assert d_edges == m_edges


def test_dibap_reader_synthetic_weighted(tmp_path, spark):
    # V=3 path 0-1-2 with int edge weights, dvw=0, dxy=0
    of = [0, 1, 3, 4]
    to = [1, 0, 2, 1]
    ew = [7, 7, 9, 9]
    buf = struct.pack(">h", (ord("G") << 8) | ord("I"))
    buf += struct.pack(">i", 3) + struct.pack(">i", 0)
    buf += struct.pack(f">{len(of)}i", *of)
    buf += struct.pack(f">{len(to)}i", *to)
    buf += struct.pack(">i", 1)
    buf += struct.pack(f">{len(ew)}i", *ew)
    buf += struct.pack(">i", 0)
    p = tmp_path / "tiny.gi"
    p.write_bytes(buf)
    g = read_dibap(spark, str(p))
    assert g.weighted and not g.directed
    edges = {
        (r["src"], r["dst"], r["weight"]) for r in g.edges.collect()
    }
    assert edges == {(0, 1, 7.0), (1, 2, 9.0)}


def test_raster_reader_deterministic_points(tmp_path, spark):
    p = tmp_path / "tiny.asc"
    p.write_text(
        "ncols         3\n"
        "nrows         2\n"
        "xllcorner     0.0\n"
        "yllcorner     0.0\n"
        "cellsize      1.0\n"
        "NODATA_value  -9999\n"
        "2 0 1\n"
        "0 3 0\n"
    )
    pts = read_raster(spark, str(p)).collect()
    assert len(pts) == 6
    again = read_raster(spark, str(p)).collect()
    assert sorted(map(tuple, pts)) == sorted(map(tuple, again))
    # cell (0,0) holds 2 points with x in [0,1), y in [0,1)
    c00 = [r for r in pts if 0 <= r["x"] < 1 and 0 <= r["y"] < 1]
    assert len(c00) == 2
    # cell (1,1) holds 3 points with x in [1,2), y in [-1,0)
    c11 = [r for r in pts if 1 <= r["x"] < 2 and -1 <= r["y"] < 0]
    assert len(c11) == 3


def test_cover_reader_reference_fixture(spark):
    # IOGTest.cpp:447 testCoverReader expectations
    c = read_cover(spark, f"{REF_INPUT}/community_overlapping.cover")
    assert c.agg(F.max("subset")).collect()[0][0] + 1 == 9
    assert c.select("id").distinct().count() == 10
    by_node = {
        r["id"]: r["n"]
        for r in c.groupBy("id").agg(F.count("*").alias("n")).collect()
    }
    assert by_node[0] == 3
    assert by_node[3] == 1
    assert c.filter((F.col("id") == 0) & (F.col("subset") == 1)).count() == 1


def test_edgelist_cover_reader_reference_fixture(spark):
    # IOGTest.cpp:434 testEdgeListCoverReader expectations (firstNode=1)
    c = read_edgelist_cover(
        spark, f"{REF_INPUT}/community_overlapping.dat", first_node=1
    )
    assert c.agg(F.max("subset")).collect()[0][0] + 1 == 9
    assert c.select("id").distinct().count() == 10
    by_node = {
        r["id"]: r["n"]
        for r in c.groupBy("id").agg(F.count("*").alias("n")).collect()
    }
    assert by_node[0] == 3
    assert by_node[3] == 1
    assert c.filter((F.col("id") == 0) & (F.col("subset") == 1)).count() == 1


def test_cover_round_trip(tmp_path, spark):
    cov = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (0, 1), (3, 2)], "id long, subset long"
    )
    p = tmp_path / "out.cover"
    write_cover(cov, str(p))
    back = read_cover(spark, str(p))
    assert sorted(
        (r["id"], r["subset"]) for r in back.collect()
    ) == sorted((r["id"], r["subset"]) for r in cov.collect())


@pytest.mark.parametrize("width", [4, 8])
def test_binary_partition_round_trip(tmp_path, spark, width):
    labels = spark.createDataFrame(
        [(0, 3), (1, 0), (2, 3), (3, 7), (4, 1)], "id long, label long"
    )
    p = tmp_path / f"part{width}.bin"
    write_binary_partition(labels, str(p), width=width)
    assert p.stat().st_size == 5 * width
    back = read_binary_partition(spark, str(p), width=width)
    assert sorted(
        (r["id"], r["label"]) for r in back.collect()
    ) == sorted((r["id"], r["label"]) for r in labels.collect())


def test_binary_partition_width4_overflow_raises(tmp_path, spark):
    labels = spark.createDataFrame(
        [(0, 2**33)], "id long, label long"
    )
    with pytest.raises(ValueError):
        write_binary_partition(labels, str(tmp_path / "x.bin"), width=4)


def test_edgelist_partition_reader(tmp_path, spark):
    from networkit_spark.sources.graphio import read_edgelist_partition

    p = tmp_path / "part.dat"
    p.write_text("1\t3\n2\t0\n4\t3\n")
    df = read_edgelist_partition(spark, str(p), first_node=1, sep="\t")
    rows = {r["id"]: r["label"] for r in df.collect()}
    # nodes 0..3 exist (max mentioned node 4-1=3); node 2 unmentioned
    assert rows == {0: 3, 1: 0, 2: None, 3: 3}


def test_snap_partition_reader_with_map(tmp_path, spark):
    from networkit_spark.sources.graphio import read_snap_partition

    p = tmp_path / "cmty.txt"
    p.write_text("# comment\n101 102\n103 999\n")
    df = read_snap_partition(
        spark, str(p), node_map={101: 0, 102: 1, 103: 2}
    )
    rows = sorted((r["id"], r["subset"]) for r in df.collect())
    # line numbering counts the comment line (reference semantics);
    # unknown id 999 is dropped
    assert rows == [(0, 2), (1, 2), (2, 3)]


def test_dot_partition_writer(tmp_path, spark):
    from networkit_spark.graph import Graph
    from networkit_spark.sources.graphio import write_dot_partition

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    verts = spark.createDataFrame([(i,) for i in range(4)], "id long")
    g = Graph(edges, verts, directed=False, weighted=False)
    labels = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 9), (3, 9)], "id long, label long"
    )
    p = tmp_path / "out.dot"
    write_dot_partition(g, labels, str(p))
    text = p.read_text()
    assert text.startswith("graph {")
    assert "0 -- 1;" in text and "1 -- 2;" in text
    assert "label=5" in text and "label=9" in text
    assert "3 [" not in text  # zero-degree node skipped


@pytest.mark.parametrize("width", [4, 8])
def test_binary_edgelist_partition_round_trip(tmp_path, spark, width):
    from networkit_spark.sources.graphio import (
        read_binary_edgelist_partition,
        write_binary_edgelist_partition,
    )

    labels = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 0), (3, 5)], "id long, label long"
    )
    p = tmp_path / f"belp{width}.bin"
    write_binary_edgelist_partition(
        labels, str(p), first_node=1, width=width
    )
    assert p.stat().st_size == 4 * 2 * width
    back = read_binary_edgelist_partition(
        spark, str(p), first_node=1, width=width
    )
    assert sorted((r["id"], r["label"]) for r in back.collect()) == [
        (0, 2), (1, 2), (2, 0), (3, 5)
    ]
