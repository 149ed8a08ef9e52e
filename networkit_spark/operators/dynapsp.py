"""DynAPSP — all-pairs shortest paths maintained under edge insertions
/ weight decreases.

Reference: /root/reference/networkit/cpp/distance/DynAPSP.cpp (:30-43
run() = per-source SSSP; :63-170 update(): for an insertion (u, v, w)
improving d(u, v), find the affected sources S = {x : d(x, v) >
d(x, u) + w} by a pruned BFS from u and the affected targets from v,
then relax d(x, y) = min(d(x, y), d(x, u) + w + d(v, y)); only
EDGE_ADDITION and negative EDGE_WEIGHT_INCREMENT are allowed).

Spark-first form: the APSP state is the (s, v, dist) relation of the
tagged multi-source BFS/SSSP (one synchronized frontier — the
reference's n independent SSSPs collapsed).  An insertion relaxes the
relation declaratively:

    cand(x, y) = d(x, u) + w + d(v, y)        (and the v/u mirror)
    d'         = full-outer min(d, cand)

— two equi-joins through the endpoint columns; rows the reference's
affected-set BFS would skip fall out of the MIN (the join only
produces candidates passing through the new edge, which is exactly the
affected superset).  Newly CONNECTED pairs appear via the full-outer
side, which per-source recompute engines must handle separately.

APSP state is inherently O(n^2) rows — fixture-scale like
``all_pairs_hop_distances``; at web scale you maintain the relation for
a SOURCES subset (the constructor accepts one) and the same relaxation
applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.closeness import _tagged_bfs, _tagged_sssp
from networkit_spark.plans.superstep import Checkpointer


class DynAPSP:
    def __init__(self, g: Graph, sources=None) -> None:
        self.g = g
        self._sources = sources
        self._ckpt = Checkpointer(g.edges.sparkSession)
        self.distances: DataFrame | None = None

    def run(self) -> "DynAPSP":
        spark = self.g.edges.sparkSession
        if self._sources is None:
            src_df = self.g.nodes()
        else:
            src_df = spark.createDataFrame(
                [(int(s),) for s in self._sources], "id long"
            )
        sweep = _tagged_sssp if self.g.weighted else _tagged_bfs
        settled, _ = sweep(self.g, src_df, None, self._ckpt)
        self.distances = settled.select("s", "v", "dist").localCheckpoint(
            eager=True
        )
        return self

    def _relax(self, u: int, v: int, w: float) -> None:
        """Relax the relation through the improved edge (u, v): fresh
        post-event distances FROM the endpoints (one 2-source tagged
        BFS — the reference's phase-2 truncated BFS from v, :120-168),
        old distances TO the endpoints from the relation itself."""
        spark = self.g.edges.sparkSession
        d = self.distances
        dtype = d.schema["dist"].dataType.simpleString()
        ep_df = spark.createDataFrame(
            sorted({(int(u),), (int(v),)}), "id long"
        )
        sweep = _tagged_sssp if self.g.weighted else _tagged_bfs
        fresh, _ = sweep(self.g, ep_df, None, self._ckpt)
        pairs = [(u, v)] if self.g.directed else [(u, v), (v, u)]
        cands = None
        for a, b in pairs:
            dxa = d.filter(F.col("v") == a).select(
                F.col("s"), F.col("dist").alias("d_xa")
            )
            dby = fresh.filter(F.col("s") == b).select(
                F.col("v"), F.col("dist").alias("d_by")
            )
            c = dxa.crossJoin(dby).select(
                "s", "v",
                (F.col("d_xa") + F.lit(w) + F.col("d_by"))
                .cast(dtype).alias("cand"),
            )
            cands = c if cands is None else cands.unionByName(c)
        cand = cands.groupBy("s", "v").agg(F.min("cand").alias("cand"))
        self.distances = (
            d.join(cand, ["s", "v"], "full_outer")
            .select(
                "s", "v",
                F.least(
                    F.coalesce("dist", F.col("cand")),
                    F.coalesce("cand", F.col("dist")),
                ).alias("dist"),
            )
            .localCheckpoint(eager=True)
        )

    def update(self, event) -> "DynAPSP":
        """event: (type, u, v, w) row or tuple.  Edge insertions and
        weight decreases only, like the reference (:70-73)."""
        etype, u, v, w = (
            event["type"], int(event["u"]), int(event["v"]),
            event["w"],
        ) if not isinstance(event, tuple) else (
            event[0], int(event[1]), int(event[2]), event[3]
        )
        if etype not in ("EDGE_ADDITION",) and not (
            etype == "EDGE_WEIGHT_INCREMENT" and (w or 0) < 0
        ):
            raise RuntimeError(
                "event type not allowed. Edge insertions and edge "
                "weight decreases only."
            )
        from networkit_spark.streaming.dynamics import apply_events

        spark = self.g.edges.sparkSession
        ev = spark.createDataFrame(
            [(etype, u, v, w)], "type string, u long, v long, w double"
        )
        self.g = apply_events(self.g, ev)
        if self.g.weighted:
            # the POST-event weight of (u, v), like the reference's
            # weightuv = G.weight(u, v) read after the event (:68)
            row = self.g.edges.filter(
                ((F.col("src") == u) & (F.col("dst") == v))
                | ((F.col("src") == v) & (F.col("dst") == u))
            ).collect()
            wv = float(row[0]["weight"])
        else:
            wv = 1.0
        self._relax(u, v, wv)
        return self

    def update_batch(self, events) -> "DynAPSP":
        for ev in events:
            self.update(ev)
        return self
