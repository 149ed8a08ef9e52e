"""PostscriptWriter (viz/PostscriptWriter.cpp:37-168) structural
checks: header/macros, palette cycling, grey inter-cluster edges,
bounding-box scaling, torus wrap."""

from __future__ import annotations

import os

from networkit_spark.graph import Graph
from networkit_spark.sources.graphio import write_postscript


def _square(spark):
    g = Graph(
        spark.createDataFrame(
            [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 1.0)],
            "src long, dst long, weight double",
        ),
        spark.createDataFrame([(i,) for i in range(4)], "id long"),
        directed=False,
        weighted=True,
    )
    coords = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 1.0, 1.0), (3, 0.0, 1.0)],
        "id long, x0 double, x1 double",
    )
    return g, coords


def test_write_and_structure(spark, tmp_path):
    g, coords = _square(spark)
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, label long"
    )
    path = os.path.join(tmp_path, "g.eps")
    write_postscript(g, coords, path, clustering=labels)
    text = open(path).read()
    assert text.startswith("%!PS-Adobe-1.0\n")
    assert "%%BoundingBox: 0.000 0.000 1020.000 1020.000" in text
    assert "/a {arc closepath fill} bind def" in text
    # intra-cluster edges (0,1) and (2,3) use palette colors 0 and 1
    assert "1.000 0.000 0.000 c p 0.000 0.000 m 1020.000 0.000 l s" in text
    assert "1.000 0.500 0.000 c p 1020.000 1020.000 m 0.000 1020.000 l s" in text
    # inter-cluster edges grey
    assert text.count("0.80 0.80 0.80 c 1.0 w ") == 2
    # 4 node dots, scaled corners
    assert text.count(" 2.000 0.00 360.00 a s") == 4
    assert text.rstrip().endswith("grestore")


def test_default_one_clustering_and_torus(spark, tmp_path):
    g, coords = _square(spark)
    path = os.path.join(tmp_path, "t.eps")
    write_postscript(g, coords, path, torus=True)
    text = open(path).read()
    assert text.startswith("%!PS-Adobe-3.0 EPSF-3.0\n")
    # one-clustering: 4 edges + 4 node dots all use palette color 0
    assert text.count("1.000 0.000 0.000 c p ") == 8
    # torus wrap: the 1020-length edge (0,1) folds to a 20pt segment
    assert "p 0.000 0.000 m 20.000 0.000 l s" in text
    assert "grestore" not in text
