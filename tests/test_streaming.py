from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import number_of_components
from networkit_spark.streaming.dynamics import (
    DynConnectedComponents,
    apply_events,
)

EVENT_SCHEMA = "type string, u long, v long, w double"


def test_apply_events(spark):
    g = Graph.from_pandas(spark, [(0, 1), (2, 3, 2.0)], weighted=True, n=4)
    events = spark.createDataFrame(
        [
            ("EDGE_ADDITION", 1, 2, 1.0),
            ("EDGE_REMOVAL", 0, 1, None),
            ("EDGE_WEIGHT_UPDATE", 2, 3, 9.0),
        ],
        EVENT_SCHEMA,
    )
    g2 = apply_events(g, events)
    got = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    assert got == {(1, 2): 1.0, (2, 3): 9.0}


def test_apply_events_node_removal(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], n=3)
    events = spark.createDataFrame(
        [("NODE_REMOVAL", 1, None, None)], EVENT_SCHEMA
    )
    g2 = apply_events(g, events)
    assert g2.number_of_edges() == 0
    assert {r["id"] for r in g2.nodes().collect()} == {0, 2}


def test_dyn_cc_incremental_merge(spark):
    """Additions-only repair must equal a full recompute."""
    g = Graph.from_pandas(spark, [(0, 1), (2, 3), (4, 5)], n=6)
    dyn = DynConnectedComponents(g)
    assert number_of_components(dyn.labels) == 3
    events = spark.createDataFrame(
        [("EDGE_ADDITION", 1, 2, 1.0)], EVENT_SCHEMA
    )
    labels = dyn.update_batch(events)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}


def test_dyn_cc_removal_recompute(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], n=3)
    dyn = DynConnectedComponents(g)
    assert number_of_components(dyn.labels) == 1
    events = spark.createDataFrame(
        [("EDGE_REMOVAL", 1, 2, None)], EVENT_SCHEMA
    )
    labels = dyn.update_batch(events)
    assert number_of_components(labels) == 2


def test_structured_streaming_windowed_agg(spark, tmp_path):
    """Structured Streaming smoke over the events table shape:
    watermark + tumbling-window count, memory sink."""
    src = str(tmp_path / "in")
    df = spark.createDataFrame(
        [(i, f"2025-01-01 00:{i:02d}:00", "click", float(i)) for i in range(30)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)
    stream = (
        spark.readStream.schema(df.schema).parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory").queryName("ev_out")
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql("select * from ev_out").collect()
    q.stop()
    assert sum(r["n"] for r in rows) == 30
    assert len(rows) == 3  # 30 minutes / 10-minute tumble


def test_pagerank_warm_start_after_events(spark):
    """Dyn*-style incremental recompute: apply an edge batch, warm-start
    PageRank from the previous fixpoint — same result as cold, fewer
    supersteps."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.streaming.dynamics import apply_events

    g = Graph.from_pandas(
        spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3), (0, 5)]
    )
    base = pagerank(g, tol=1e-10)
    events = spark.createDataFrame(
        [("EDGE_ADDITION", 0, 2, 1.0)], "type string, u long, v long, w double"
    )
    g2 = apply_events(g, events)
    cold = pagerank(g2, tol=1e-10)
    warm = pagerank(g2, tol=1e-10, init_scores=base.scores)
    c = {r["id"]: r["score"] for r in cold.scores.collect()}
    w = {r["id"]: r["score"] for r in warm.scores.collect()}
    assert all(abs(c[k] - w[k]) < 1e-8 for k in c)
    assert warm.info.iterations <= cold.info.iterations


def test_dyn_wcc_matches_recompute(spark):
    """DynWeaklyConnectedComponents parity vs recompute on every batch
    kind (DynWeaklyConnectedComponents.cpp contract)."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.components import weakly_connected_components
    from networkit_spark.streaming.dynamics import DynWeaklyConnectedComponents

    g = Graph.from_pandas(
        spark, [(0, 1), (2, 3), (4, 5)], directed=True, n=6
    )
    dyn = DynWeaklyConnectedComponents(g)
    assert {r["label"] for r in dyn.labels.collect()} == {0, 2, 4}

    # additions-only batch -> incremental merge path
    adds = spark.createDataFrame(
        [("EDGE_ADDITION", 1, 2, 1.0), ("EDGE_ADDITION", 5, 0, 1.0)],
        "type string, u long, v long, w double",
    )
    labels = dyn.update_batch(adds)
    got = {r["id"]: r["label"] for r in labels.collect()}
    want = {
        r["id"]: r["label"]
        for r in weakly_connected_components(dyn.g)[0].collect()
    }
    assert got == want
    assert len({*got.values()}) == 1  # everything merged into one weak comp

    # removal batch -> recompute path (splits back apart)
    rem = spark.createDataFrame(
        [("EDGE_REMOVAL", 1, 2, None), ("EDGE_REMOVAL", 5, 0, None)],
        "type string, u long, v long, w double",
    )
    labels = dyn.update_batch(rem)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4}


def test_dyn_wcc_isolating_removal_matches_oracle_universe(spark):
    """Round-3 ADVICE: if a removal strips ALL incident edges from a
    node, the Spark side (vertices=None, like q_dyn_wcc's
    load_directed_graph) and the SQL oracle (nodes from surviving
    edges) must stay row-identical — both omit the isolated node.
    Cross-checked against a DuckDB replica of SQL_DYN_WCC's recursion
    shape over the same final edge set."""
    import duckdb

    from networkit_spark.graph import Graph
    from networkit_spark.streaming.dynamics import DynWeaklyConnectedComponents

    # 1 has edges only to 0 and 2; removing both isolates node 1
    edges = [(0, 1), (1, 2), (2, 3), (4, 5)]
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    g = Graph(edges=e, vertices=None, directed=True)
    dyn = DynWeaklyConnectedComponents(g)
    removes = spark.createDataFrame(
        [("EDGE_REMOVAL", 0, 1, None), ("EDGE_REMOVAL", 1, 2, None)],
        "type string, u long, v long, w double",
    )
    labels = dyn.update_batch(removes)
    got = sorted((r["id"], r["label"]) for r in labels.collect())
    assert 1 not in {i for i, _ in got}  # isolated node dropped by Spark

    want = duckdb.sql(
        """
WITH RECURSIVE ne(src, dst) AS (VALUES (2, 3), (4, 5)),
nadj AS (SELECT src, dst FROM ne
         UNION ALL SELECT dst AS src, src AS dst FROM ne),
nnodes AS (SELECT DISTINCT src AS id FROM nadj),
reach(id, lbl) AS (
  SELECT id, id FROM nnodes
  UNION
  SELECT a.dst AS id, r.lbl FROM reach r JOIN nadj a ON a.src = r.id
  WHERE r.lbl < a.dst
)
SELECT id, MIN(lbl) AS label FROM reach GROUP BY id ORDER BY id
        """
    ).fetchall()
    assert got == [(int(i), int(l)) for i, l in want]


def test_graph_updater_timeline(spark):
    """GraphUpdater: per-update (n, m) size timeline matches the
    reference's record-after-each-batch contract
    (GraphUpdater.cpp:15-62)."""
    from networkit_spark.streaming.dynamics import GraphUpdater

    g = Graph.from_pandas(spark, [(0, 1), (2, 3, 2.0)], weighted=True, n=4)
    up = GraphUpdater(g)
    b1 = spark.createDataFrame(
        [("EDGE_ADDITION", 1, 2, 1.0)], EVENT_SCHEMA
    )
    up.update(b1)
    b2 = spark.createDataFrame(
        [("EDGE_REMOVAL", 0, 1, None), ("NODE_ADDITION", 4, None, None)],
        EVENT_SCHEMA,
    )
    g2 = up.update(b2)
    assert up.size_timeline() == [(4, 3), (5, 2)]
    got = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert got == {(1, 2), (2, 3)}
