"""Gephi graph-streaming exporter — the reference's gephi module as a
line-relation producer.

Reference: networkit/gephi/streaming.py GephiStreamingClient
(exportGraph :45-92, exportEventStream :138-177, _edgeId :38-43) and
gephi/pyclient.py's JSON wire format (add_node :91-106 ``{"an":
{id: attrs}}``, delete_node :138 ``{"dn": {id: {}}}``, add_edge
:140-162 ``{"ae": {id: {"source":…, "target":…, "directed":…}}}``,
delete_edge :209 ``{"de": {id: {}}}``).

The reference POSTs each line to a local Gephi HTTP server; there is
no network target in this engine's environment, so the Spark analogue
PRODUCES the exact line stream as a DataFrame (one ``line`` string
column, ``\\r\\n`` excluded — the writer adds terminators) that can be
written with ``df.write.text`` or piped to a client.  Every line is
built with JVM-side string expressions (concat over columns) — no
Python in the loop, fully distributed.

Fidelity notes: edge ids follow _edgeId (``u->v`` directed,
``min-max`` undirected); node/edge attribute dicts are empty exactly
as exportGraph sends them; EDGE_WEIGHT_* events are dropped with the
reference's own behavior ("Edge weights not yet supported in gephi
streaming!") — we filter instead of print; TIME_STEP maps to no line
(it is a client-side flush/delay in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _edge_id(directed: bool):
    if directed:
        return F.concat(F.col("src").cast("string"), F.lit("->"),
                        F.col("dst").cast("string"))
    return F.concat(
        F.least("src", "dst").cast("string"), F.lit("-"),
        F.greatest("src", "dst").cast("string"),
    )


def _an(idcol) -> F.Column:
    return F.concat(F.lit('{"an": {"'), idcol.cast("string"),
                    F.lit('": {}}}'))


def _dn(idcol) -> F.Column:
    return F.concat(F.lit('{"dn": {"'), idcol.cast("string"),
                    F.lit('": {}}}'))


def _ae(eid, directed: bool) -> F.Column:
    d = "true" if directed else "false"
    return F.concat(
        F.lit('{"ae": {"'), eid,
        F.lit('": {"source": '), F.col("src").cast("string"),
        F.lit(', "target": '), F.col("dst").cast("string"),
        F.lit(', "directed": ' + d + "}}}"),
    )


def _de(eid) -> F.Column:
    return F.concat(F.lit('{"de": {"'), eid, F.lit('": {}}}'))


def export_graph_lines(g: Graph) -> DataFrame:
    """exportGraph (streaming.py:45-92): one ``an`` line per node then
    one ``ae`` line per edge, as a (kind, ord, line) relation —
    ``kind`` orders nodes before edges like the reference's two
    passes."""
    nodes = g.nodes().select(
        F.lit(0).alias("kind"), F.col("id").alias("ord"),
        _an(F.col("id")).alias("line"),
    )
    edges = g.edges.select(
        F.lit(1).alias("kind"),
        F.col("src").alias("ord"),
        _ae(_edge_id(g.directed), g.directed).alias("line"),
    )
    return nodes.unionByName(edges)


def events_to_lines(events: DataFrame, directed: bool = False) -> DataFrame:
    """exportEventStream (streaming.py:138-177): map a GraphEvent
    relation (type, u, v, w) to wire lines.  Weight events and
    TIME_STEP produce no line (see module fidelity notes)."""
    ev = events.withColumn(
        "src", F.col("u").cast("long")
    ).withColumn("dst", F.col("v").cast("long"))
    line = (
        F.when(F.col("type").isin("NODE_ADDITION", "NODE_RESTORATION"),
               _an(F.col("src")))
        .when(F.col("type") == "NODE_REMOVAL", _dn(F.col("src")))
        .when(F.col("type") == "EDGE_ADDITION",
              _ae(_edge_id(directed), directed))
        .when(F.col("type") == "EDGE_REMOVAL", _de(_edge_id(directed)))
    )
    return ev.select(line.alias("line")).filter(F.col("line").isNotNull())


def write_gephi_stream(lines: DataFrame, path: str) -> None:
    """Persist the line relation as text part-files (one line per
    event, the wire format minus the transport)."""
    lines.select("line").write.mode("overwrite").text(path)
