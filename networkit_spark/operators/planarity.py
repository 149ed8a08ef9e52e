"""Left-right planarity test.

Reference: /root/reference/networkit/cpp/planarity/
LeftRightPlanarityCheck.cpp:36-66 — run() applies the Euler-criterion
quick reject (m > 3n - 6, :38-43), a DFS orientation computing
lowpt/lowpt2/nesting depth (:49-57 + dfsOrientation), sorts the DFS
adjacency by nesting depth (:60, :69-77), and runs the testing DFS with
a conflict-pair stack (dfsTesting); exposes only the boolean
isPlanar().  The algorithm is the published left-right criterion
(Brandes, "The left-right planarity test", 2009 lecture notes; also
de Fraysseix-Rosenstiehl) — this file implements that public
pseudocode directly, iteratively, not the reference's array layout.

Spark-first shape: the Euler cut m > 3n - 6 is evaluated DISTRIBUTED
(two scalar aggregations) and at web scale rejects every graph a link
crawl produces long before any DFS; the LR test itself is an inherently
sequential two-pass DFS (exactly one reference loop iteration per
step), run driver-side at fixture scale like the Hopcroft-Tarjan
biconnected-components oracle (operators/components.py).  The
documented scale path: planarity factors over biconnected components,
so the driver-side check runs per component after the distributed
Euler filter and the existing distributed biconnected decomposition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.graph import Graph

_INF = float("inf")


class _ConflictPair:
    __slots__ = ("L", "R")

    def __init__(self, L=None, R=None):
        self.L = L if L is not None else [None, None]  # [low, high]
        self.R = R if R is not None else [None, None]


def _lr_planar(adj: dict[int, list[int]]) -> bool:
    """Left-right test on a driver-side adjacency (documented public
    pseudocode; boolean only, no embedding phase)."""
    nodes = sorted(adj)
    height = {v: None for v in nodes}
    lowpt: dict[tuple[int, int], float] = {}
    lowpt2: dict[tuple[int, int], float] = {}
    nesting: dict[tuple[int, int], float] = {}
    oriented: set[frozenset] = set()
    parent_edge: dict[int, tuple[int, int] | None] = {v: None for v in nodes}
    out_edges: dict[int, list[tuple[int, int]]] = {v: [] for v in nodes}
    roots = []

    # ---- phase 1: orientation DFS (iterative) -------------------------
    for r in nodes:
        if height[r] is not None:
            continue
        height[r] = 0
        roots.append(r)
        stack = [(r, iter(adj[r]))]
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if v == w:
                    continue  # self-loop: never affects planarity here
                key = frozenset((v, w))
                if key in oriented:
                    continue
                oriented.add(key)
                e = (v, w)
                out_edges[v].append(e)
                lowpt[e] = height[v]
                lowpt2[e] = height[v]
                if height[w] is None:  # tree edge
                    parent_edge[w] = e
                    height[w] = height[v] + 1
                    stack.append((w, iter(adj[w])))
                    advanced = True
                    break
                else:  # back edge
                    lowpt[e] = height[w]
                    _finish_edge(e, v, parent_edge, lowpt, lowpt2,
                                 nesting, height)
            if not advanced:
                stack.pop()
                pe = parent_edge[v]
                if pe is not None:
                    _finish_edge(pe, pe[0], parent_edge, lowpt, lowpt2,
                                 nesting, height, is_tree_return=True)
    # ---- phase 2: testing DFS over nesting-ordered adjacency ----------
    for v in nodes:
        out_edges[v].sort(key=lambda e: nesting[e])

    ref: dict[tuple[int, int], tuple[int, int] | None] = {}
    side: dict[tuple[int, int], int] = {}
    S: list[_ConflictPair] = []
    stack_bottom: dict[tuple[int, int], int] = {}
    lowpt_edge: dict[tuple[int, int], tuple[int, int]] = {}

    def top_of(e):
        return lowpt[e]

    def lowest(P: _ConflictPair) -> float:
        if P.L[0] is None:
            return lowpt[P.R[0]]
        if P.R[0] is None:
            return lowpt[P.L[0]]
        return min(lowpt[P.L[0]], lowpt[P.R[0]])

    def add_constraints(ei, e) -> bool:
        P = _ConflictPair()
        # merge return edges of ei into P.R
        while len(S) > stack_bottom[ei]:
            Q = S.pop()
            if Q.L[0] is not None:
                Q.L, Q.R = Q.R, Q.L
            if Q.L[0] is not None:
                return False  # merge condition violated
            if lowpt[Q.R[0]] > lowpt[e]:
                # merge intervals
                if P.R[1] is None:
                    P.R[1] = Q.R[1]
                else:
                    ref[P.R[0]] = Q.R[1]
                P.R[0] = Q.R[0]
            else:  # align
                ref[Q.R[0]] = lowpt_edge[e]
        # merge conflicting return edges of e1..ei-1 into P.L
        while S and (_conflicting(S[-1].L, ei) or _conflicting(S[-1].R, ei)):
            Q = S.pop()
            if _conflicting(Q.R, ei):
                Q.L, Q.R = Q.R, Q.L
            if _conflicting(Q.R, ei):
                return False  # interlacing on both sides
            # merge below-lowpt(ei) interval into P.R
            if Q.R[0] is not None:
                if P.R[0] is not None:
                    ref[P.R[0]] = Q.R[1]
                else:
                    P.R[1] = Q.R[1]
                P.R[0] = Q.R[0]
            if P.L[1] is None:
                P.L[1] = Q.L[1]
            else:
                ref[P.L[0]] = Q.L[1]
            P.L[0] = Q.L[0]
        if P.L[0] is not None or P.R[0] is not None:
            S.append(P)
        return True

    def _conflicting(I, b) -> bool:
        return I[1] is not None and lowpt[I[1]] > lowpt[b]

    def trim_back_edges(u):
        # drop entire conflict pairs below height[u]
        while S and lowest(S[-1]) == height[u]:
            P = S.pop()
            if P.L[0] is not None:
                side[P.L[0]] = -1
        if S:
            P = S.pop()
            # trim left interval
            while P.L[1] is not None and P.L[1][1] == u:
                P.L[1] = ref.get(P.L[1])
            if P.L[1] is None and P.L[0] is not None:
                ref[P.L[0]] = P.R[0]
                side[P.L[0]] = -1
                P.L[0] = None
            # trim right interval
            while P.R[1] is not None and P.R[1][1] == u:
                P.R[1] = ref.get(P.R[1])
            if P.R[1] is None and P.R[0] is not None:
                ref[P.R[0]] = P.L[0]
                side[P.R[0]] = -1
                P.R[0] = None
            S.append(P)

    for r in roots:
        # iterative testing DFS
        stack = [(r, iter(out_edges[r]), None)]
        while stack:
            v, it, _ = stack[-1]
            e = parent_edge[v]
            advanced = False
            for ei in it:
                w = ei[1]
                stack_bottom[ei] = len(S)
                if ei == parent_edge[w]:  # tree edge: recurse
                    stack.append((w, iter(out_edges[w]), ei))
                    advanced = True
                    break
                else:  # back edge
                    lowpt_edge[ei] = ei
                    S.append(_ConflictPair(R=[ei, ei]))
                # integrate new return edges
                if lowpt[ei] < height[v]:
                    if ei == out_edges[v][0]:
                        lowpt_edge[e] = lowpt_edge[ei]
                    else:
                        if not add_constraints(ei, e):
                            return False
            if advanced:
                continue
            stack.pop()
            # after returning from v: postprocess edge e = parent_edge[v]
            if e is not None:
                u = e[0]
                trim_back_edges(u)
                if lowpt[e] < height[u]:  # e has return edge
                    if S:
                        hl = S[-1].L[1]
                        hr = S[-1].R[1]
                        if hl is not None and (
                            hr is None or lowpt[hl] > lowpt[hr]
                        ):
                            ref[e] = hl
                        else:
                            ref[e] = hr
                # integrate e's return edges into the PARENT frame
                # (the parent loop body after its recursive call)
                if len(stack) > 0:
                    pv = stack[-1][0]
                    pe = parent_edge[pv]
                    if lowpt[e] < height[pv]:
                        if e == out_edges[pv][0]:
                            lowpt_edge[pe] = lowpt_edge[e]
                        else:
                            if not add_constraints(e, pe):
                                return False
    return True


def _finish_edge(e, v, parent_edge, lowpt, lowpt2, nesting, height,
                 is_tree_return=False):
    """nesting depth of e + lowpt propagation into v's parent edge
    (phase-1 epilogue of the published pseudocode)."""
    nesting[e] = 2 * lowpt[e]
    if lowpt2[e] < height[v]:
        nesting[e] += 1  # chordal adjustment
    pe = parent_edge[v]
    if pe is not None and e != pe:
        if lowpt[e] < lowpt[pe]:
            lowpt2[pe] = min(lowpt[pe], lowpt2[e])
            lowpt[pe] = lowpt[e]
        elif lowpt[e] > lowpt[pe]:
            lowpt2[pe] = min(lowpt2[pe], lowpt[e])
        else:
            lowpt2[pe] = min(lowpt2[pe], lowpt2[e])


def left_right_planarity(g: Graph) -> bool:
    """LeftRightPlanarityCheck.run + isPlanar (:36-66): True iff the
    undirected graph is planar.  Directed graphs are rejected (:16-18).
    The Euler cut (m > 3n - 6 for n > 2 => non-planar, :38-43) is
    evaluated distributed; the LR DFS runs driver-side (fixture scale,
    documented above)."""
    if g.directed:
        raise ValueError("The graph is not an undirected graph.")
    simple = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    n = g.nodes().count()
    m = simple.count()
    if n > 2 and m > 3 * n - 6:
        return False
    rows = simple.collect()
    adj: dict[int, list[int]] = {
        int(r["id"]): [] for r in g.nodes().collect()
    }
    for r in rows:
        u, v = int(r["u"]), int(r["v"])
        adj[u].append(v)
        adj[v].append(u)
    for v in adj:
        adj[v].sort()
    return _lr_planar(adj)
