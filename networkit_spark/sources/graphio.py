"""Graph file formats — readers/writers over Spark scans.

Reference dispatch: ``nk.readGraph(path, Format.X)``
(/root/reference/networkit/graphio.pyx:1055-1367, 21-member Format
enum). We implement the formats that matter for interop with the
reference's fixtures and for production use; the parquet edge table is
the engine's native format (the NetworkitBinary analogue,
networkit/cpp/io/NetworkitBinaryReader.cpp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def read_edge_list(
    spark: SparkSession,
    path: str,
    separator: str = " ",
    first_node: int = 0,
    comment_prefix: str = "#",
    continuous: bool = True,
    directed: bool = False,
) -> Graph:
    """EdgeListReader (/root/reference/networkit/cpp/io/EdgeListReader.cpp:37-62):
    lines ``src sep dst [sep weight]``; ``first_node`` subtracted to make
    ids 0-based; non-continuous ids get densified via an id-assignment
    join (the reference's mapNodeIds)."""
    lines = spark.read.text(path).filter(
        (F.length(F.trim(F.col("value"))) > 0)
        & (~F.col("value").startswith(comment_prefix))
    )
    parts = F.split(F.trim(F.col("value")), separator if separator != " " else r"\s+")
    raw = lines.select(
        # F.get (not getItem): returns NULL past the end instead of the
        # ANSI INVALID_ARRAY_INDEX error on weightless lines
        F.get(parts, 0).cast("long").alias("src"),
        F.get(parts, 1).cast("long").alias("dst"),
        F.coalesce(F.get(parts, 2).cast("double"), F.lit(1.0)).alias("weight"),
    )
    weighted = raw.filter(F.col("weight") != 1.0).limit(1).count() > 0
    if not continuous:
        ids = (
            raw.select(F.col("src").alias("old"))
            .unionByName(raw.select(F.col("dst").alias("old")))
            .distinct()
        )
        from networkit_spark.plans.ids import dense_ids

        ids = dense_ids(ids, ["old"], "new")
        raw = (
            raw.join(ids.withColumnRenamed("old", "src"), "src")
            .select(F.col("new").alias("src"), "dst", "weight")
            .join(ids.withColumnRenamed("old", "dst"), "dst")
            .select("src", F.col("new").alias("dst"), "weight")
        )
    elif first_node:
        raw = raw.select(
            (F.col("src") - first_node).alias("src"),
            (F.col("dst") - first_node).alias("dst"),
            "weight",
        )
    return Graph.from_edges(raw, directed=directed, weighted=weighted)


def write_edge_list(g: Graph, path: str, separator: str = " ") -> None:
    """EdgeListWriter — one text file part per partition."""
    (
        g.edges.select(
            F.concat_ws(
                separator,
                F.col("src").cast("string"),
                F.col("dst").cast("string"),
                F.col("weight").cast("string"),
            ).alias("value")
        ).write.mode("overwrite").text(path)
    )


def read_metis(spark: SparkSession, path: str) -> Graph:
    """METISGraphReader (/root/reference/networkit/cpp/io/METISGraphReader.cpp:16-44):
    header ``n m [fmt]``; line i (1-based) lists neighbors of node i-1
    (1-based ids); fmt=1 -> alternating neighbor/weight pairs.

    Driver-side parse is fine here — METIS exists only to ingest the
    reference's small fixture corpus (input/*.graph)."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if not ln.startswith("%")]
    header = lines[0].split()
    n = int(header[0])
    fmt = header[2] if len(header) > 2 else "0"
    weighted = fmt in ("1", "11", "10")
    edges = []
    for i, line in enumerate(lines[1 : n + 1]):
        toks = line.split()
        if weighted and fmt == "1":
            pairs = [(int(toks[j]) - 1, float(toks[j + 1])) for j in range(0, len(toks), 2)]
        else:
            pairs = [(int(t) - 1, 1.0) for t in toks]
        for v, w in pairs:
            if i <= v:  # undirected, stored once
                edges.append((i, v, w))
    return Graph.from_pandas(spark, edges, weighted=weighted, n=n)


def write_metis(g: Graph, path: str) -> None:
    """METISGraphWriter — driver-side (fixture-scale interop only)."""
    n = g.number_of_nodes()
    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    for r in g.adj().select("src", "dst").collect():
        adj[r["src"]].append(r["dst"])
    m = sum(len(v) for v in adj.values()) // 2
    with open(path, "w") as f:
        f.write(f"{n} {m}\n")
        for i in range(n):
            f.write(" ".join(str(v + 1) for v in sorted(adj[i])) + "\n")


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    """PartitionReader (networkit/cpp/io/PartitionReader.cpp): line i =
    subset of node i."""
    from pyspark.sql import Window

    lines = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    return lines.select(
        (F.row_number().over(w) - 1).alias("id"),
        F.col("value").cast("long").alias("label"),
    )


def write_labels_parquet(labels: DataFrame, path: str) -> None:
    labels.write.mode("overwrite").parquet(path)


def read_labels_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_snap(spark: SparkSession, path: str, directed: bool = True) -> Graph:
    """SNAPGraphReader (/root/reference/networkit/cpp/io/SNAPGraphReader.cpp):
    tab/space-separated edge list with '#' comments and arbitrary
    (non-continuous) node ids, remapped to dense 0-based ids — the
    reference's nodeIdMap, here the same distributed id-assignment join
    ``read_edge_list(continuous=False)`` uses."""
    return read_edge_list(
        spark, path, separator=" ", comment_prefix="#",
        continuous=False, directed=directed,
    )


def read_konect(spark: SparkSession, path: str, directed: bool = False) -> Graph:
    """KONECTGraphReader (/root/reference/networkit/cpp/io/KONECTGraphReader.cpp):
    KONECT out.* format — '%' comment lines (the first declares
    directedness/weights, ignored here; pass ``directed``), 1-based
    ids, optional weight column."""
    return read_edge_list(
        spark, path, separator=" ", first_node=1, comment_prefix="%",
        continuous=True, directed=directed,
    )


def read_gml(spark: SparkSession, path: str) -> Graph:
    """GMLGraphReader (/root/reference/networkit/cpp/io/GMLGraphReader.cpp:21-150):
    ``graph [ node [ id N ] ... edge [ source A target B ] ... ]`` with
    optional ``directed 1`` header key; node ids remapped to dense
    0-based ids in order of appearance (the reference's nodeMap).
    Driver-side parse — GML exists to ingest the reference's fixture
    corpus (input/*.gml)."""
    import re

    text = open(path).read()
    directed = bool(re.search(r"\bdirected\s+1\b", text.split("node", 1)[0]))
    node_ids = re.findall(r"node\s*\[\s*id\s+(\S+)", text)
    node_map = {nid: i for i, nid in enumerate(node_ids)}
    raw_edges = re.findall(
        r"edge\s*\[\s*source\s+(\S+)\s+target\s+(\S+)(?:\s+weight\s+(\S+))?", text
    )
    weighted = any(w for _, _, w in raw_edges)
    edges = [
        (node_map[s], node_map[t], float(w) if w else 1.0)
        for s, t, w in raw_edges
    ]
    return Graph.from_pandas(
        spark, edges, directed=directed, weighted=weighted, n=len(node_ids)
    )


def write_gml(g: Graph, path: str) -> None:
    """GMLGraphWriter (/root/reference/networkit/cpp/io/GMLGraphWriter.cpp) —
    driver-side, fixture-scale interop."""
    lines = ["graph ["]
    if g.directed:
        lines.append("  directed 1")
    for r in g.nodes().orderBy("id").collect():
        lines += ["  node [", f"    id {r['id']}", "  ]"]
    for r in g.edges.orderBy("src", "dst").collect():
        lines += ["  edge [", f"    source {r['src']}", f"    target {r['dst']}"]
        if g.weighted:
            lines.append(f"    weight {r['weight']}")
        lines.append("  ]")
    lines.append("]")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_dot(g: Graph, path: str) -> None:
    """DotGraphWriter (/root/reference/networkit/cpp/io/DotGraphWriter.cpp) —
    Graphviz interop, driver-side."""
    arrow = "->" if g.directed else "--"
    head = "digraph" if g.directed else "graph"
    with open(path, "w") as f:
        f.write(head + " G {\n")
        for r in g.edges.orderBy("src", "dst").collect():
            f.write(f"  {r['src']} {arrow} {r['dst']};\n")
        f.write("}\n")


def write_snap(g: Graph, path: str) -> None:
    """SNAPGraphWriter — '# Nodes: n Edges: m' header + tab edge list;
    distributed write for large graphs would use write_edge_list; this
    driver-side form matches the reference's small-file interop."""
    n, m = g.number_of_nodes(), g.number_of_edges()
    with open(path, "w") as f:
        f.write(f"# Nodes: {n} Edges: {m}\n")
        for r in g.edges.orderBy("src", "dst").collect():
            f.write(f"{r['src']}\t{r['dst']}\n")


def read_mtx(spark: SparkSession, path: str, directed: bool = False) -> Graph:
    """MatrixMarketReader / MTXGraphReader
    (/root/reference/networkit/cpp/io/MatrixMarketReader.cpp): header
    ``%%MatrixMarket matrix coordinate <field> <symmetry>``, '%'
    comments, one ``rows cols nnz`` size line, then 1-based
    ``i j [value]`` entries. Driver-side parse (fixture interop, like
    METIS); symmetric banner -> undirected."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    banner = lines[0].lower()
    undirected = "symmetric" in banner or not directed
    body = [ln for ln in lines[1:] if not ln.startswith("%")]
    edges = []
    weighted = False
    for ln in body[1:]:  # body[0] is the size line
        t = ln.split()
        w = float(t[2]) if len(t) > 2 else 1.0
        weighted = weighted or (len(t) > 2 and w != 1.0)
        edges.append((int(t[0]) - 1, int(t[1]) - 1, w))
    return Graph.from_pandas(
        spark, edges, directed=not undirected, weighted=weighted
    )


def write_mtx(g: Graph, path: str) -> None:
    """MatrixMarket coordinate writer (1-based, symmetric for
    undirected graphs)."""
    sym = "general" if g.directed else "symmetric"
    field = "real" if g.weighted else "pattern"
    n = g.number_of_nodes()
    rows = g.edges.orderBy("src", "dst").collect()
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} {sym}\n")
        f.write(f"{n} {n} {len(rows)}\n")
        for r in rows:
            if g.weighted:
                f.write(f"{r['src'] + 1} {r['dst'] + 1} {r['weight']}\n")
            else:
                f.write(f"{r['src'] + 1} {r['dst'] + 1}\n")


def read_graphml(spark: SparkSession, path: str) -> Graph:
    """GraphMLReader (/root/reference/networkit/cpp/io/GraphMLReader-
    style): XML ``<node id=.../>`` + ``<edge source=... target=.../>``
    with an optional weight ``<data>`` child; node ids remapped to dense
    0-based in document order. Driver-side (fixture interop)."""
    import xml.etree.ElementTree as ET

    tree = ET.parse(path)
    root = tree.getroot()
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag.split("}")[0] + "}"
    graph_el = root.find(f"{ns}graph")
    directed = (graph_el.get("edgedefault") or "undirected") == "directed"
    node_map: dict[str, int] = {}
    for el in graph_el.findall(f"{ns}node"):
        node_map[el.get("id")] = len(node_map)
    edges = []
    weighted = False
    for el in graph_el.findall(f"{ns}edge"):
        w = 1.0
        for d in el.findall(f"{ns}data"):
            try:
                w = float(d.text)
                weighted = True
            except (TypeError, ValueError):
                pass
        edges.append((node_map[el.get("source")], node_map[el.get("target")], w))
    return Graph.from_pandas(
        spark, edges, directed=directed, weighted=weighted, n=len(node_map)
    )


def write_graphml(g: Graph, path: str) -> None:
    """GraphMLWriter — minimal conformant document, driver-side."""
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '  <key id="w" for="edge" attr.name="weight" attr.type="double"/>',
        f'  <graph edgedefault="{"directed" if g.directed else "undirected"}">',
    ]
    for r in g.nodes().orderBy("id").collect():
        lines.append(f'    <node id="n{r["id"]}"/>')
    for r in g.edges.orderBy("src", "dst").collect():
        if g.weighted:
            lines.append(
                f'    <edge source="n{r["src"]}" target="n{r["dst"]}">'
                f'<data key="w">{r["weight"]}</data></edge>'
            )
        else:
            lines.append(f'    <edge source="n{r["src"]}" target="n{r["dst"]}"/>')
    lines += ["  </graph>", "</graphml>"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_dgs(spark: SparkSession, path: str):
    """DGSReader (/root/reference/networkit/cpp/io/DGSReader.cpp:19-125):
    parse a DGS004 dynamic-graph stream into a GraphEvent DataFrame
    consumable by streaming.dynamics.apply_events / Dyn* algorithms.

    Node names map to dense ids in FIRST-APPEARANCE order (the
    reference's Gproxy.addNode() counter). Returns
    (events(step, type, u, v, w) DataFrame, {name: id}).
    Driver-side line parser by design — DGS is a fixture/ingest format
    (the reference reads it sequentially too); the EVENTS become a
    distributed relation.
    """
    names: dict[str, int] = {}
    edge_names: dict[str, tuple[int, int]] = {}
    rows: list[tuple] = []
    step = 0

    def nid(name: str) -> int:
        if name not in names:
            names[name] = len(names)
        return names[name]

    def resolve_edge(name: str) -> tuple[int, int]:
        """Resolve an edge name to endpoint ids via the name map that
        'ae' events populate (the reference DGSReader keeps such a map,
        DGSReader.cpp edgeNames); node names may themselves contain
        hyphens, so the 'u-v' split is only a fallback for edges never
        declared by an 'ae' line."""
        if name in edge_names:
            return edge_names[name]
        a, b = name.split("-", 1)
        return nid(a), nid(b)

    with open(path) as f:
        first = f.readline().strip()
        if first != "DGS004":
            raise ValueError(
                "This does not seem to be a valid DGS file. Expected magic "
                "cookie 'DGS004' in first line"
            )
        f.readline()  # name / clock ticks / event count line
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "st":  # bare "st" (DGSWriter.cpp:52) or "st <t>"
                step += 1
                rows.append((step, "TIME_STEP", None, None, None))
            elif tag == "an" and len(parts) >= 2:
                rows.append((step, "NODE_ADDITION", nid(parts[1]), None, None))
            elif tag == "ae" and len(parts) >= 4:
                u, v = nid(parts[2]), nid(parts[3])
                edge_names[parts[1]] = (u, v)
                rows.append((step, "EDGE_ADDITION", u, v, 1.0))
            elif tag == "ce" and len(parts) == 3:
                u, v = resolve_edge(parts[1])
                w = float(parts[2].split("=")[1])
                rows.append((step, "EDGE_WEIGHT_UPDATE", u, v, w))
            elif tag == "dn" and len(parts) == 2:
                rows.append((step, "NODE_REMOVAL", nid(parts[1]), None, None))
            elif tag == "de" and len(parts) == 2:
                u, v = resolve_edge(parts[1])
                rows.append((step, "EDGE_REMOVAL", u, v, None))
    events = spark.createDataFrame(
        rows, "step long, type string, u long, v long, w double"
    )
    return events, dict(names)


# ---------------------------------------------------------------------------
# NetworkitBinary — the reference's native graph format.
# Reference: /root/reference/include/networkit/io/NetworkitBinaryGraph.hpp
# (:20-32 Header layout, :40-45 feature masks, :76-130 varint encoding,
# :132-139 zigzag), NetworkitBinaryWriter.cpp (:227-470 chunked section
# layout: per section [(chunks-1) x uint64 byte-offsets][uint64 entry
# count (adj sections only)][payload]; undirected adj keeps v <= u,
# transpose keeps v >= u), NetworkitBinaryReader.cpp (:37-330).
# Driver-side parse/serialize like the other fixture-scale writers;
# parquet remains the declared native format for 100 TB data.
# ---------------------------------------------------------------------------

_NKBG_MAGIC = b"nkbg004\x00"
_NKBG_WF = {"none": 0, "varint": 1, "signed_varint": 2, "double": 3,
            "float": 4}


def _nkbg_varint_encode(value: int) -> bytes:
    if value == 0:
        return b"\x01"
    if value >= 1 << 56:
        return bytes([0]) + value.to_bytes(8, "little")
    bits = value.bit_length()
    data_bytes = (bits - 1) // 7
    head = (1 << data_bytes) | ((value << (data_bytes + 1)) & 0xFF)
    rest = value >> (7 - data_bytes)
    return bytes([head]) + rest.to_bytes(data_bytes, "little")


def _nkbg_varint_decode(buf: bytes, pos: int) -> tuple[int, int]:
    head = buf[pos]
    if head == 0:
        n, decoded, bits = 8, 0, 0
    else:
        n = (head & -head).bit_length() - 1  # index of lowest set bit
        decoded = head >> (n + 1)
        bits = 7 - n
    for i in range(n):
        decoded |= buf[pos + 1 + i] << bits
        bits += 8
    return decoded, pos + 1 + n


def _nkbg_zigzag_encode(v: int) -> int:
    return 2 * v if v >= 0 else -2 * v - 1


def _nkbg_zigzag_decode(u: int) -> int:
    return (u >> 1) if u % 2 == 0 else -((u + 1) >> 1)


def write_networkit_binary(
    g: Graph, path: str, chunks: int = 32, weight_format: str | None = None
) -> None:
    """Serialize to the reference's nkbg004 binary layout."""
    import struct

    node_ids = sorted(int(r["id"]) for r in g.nodes().collect())
    present = set(node_ids)
    nodes = (max(node_ids) + 1) if node_ids else 0
    if weight_format is None:
        weight_format = "double" if g.weighted else "none"
    wf = _NKBG_WF[weight_format]
    edges = [
        (int(r["src"]), int(r["dst"]), float(r["weight"]))
        for r in g.edges.collect()
    ]
    out_adj: list[list[tuple[int, float]]] = [[] for _ in range(nodes)]
    in_adj: list[list[tuple[int, float]]] = [[] for _ in range(nodes)]
    for s, d, w in edges:
        if g.directed:
            out_adj[s].append((d, w))
            in_adj[d].append((s, w))
        else:
            # adj keeps v <= u (stored at the larger endpoint),
            # transpose keeps v >= u; a self-loop lands in both
            lo, hi = min(s, d), max(s, d)
            out_adj[hi].append((lo, w))
            in_adj[lo].append((hi, w))
    for a in out_adj:
        a.sort()
    for a in in_adj:
        a.sort()

    if nodes and chunks > nodes:
        chunks = nodes
    chunks = max(chunks, 1)
    first = [0]
    acc = 0
    for _ in range(1, chunks):
        acc += nodes // chunks
        first.append(acc)
    first.append(nodes)

    def _enc_weight(w: float) -> bytes:
        if wf == 1:
            return _nkbg_varint_encode(int(w))
        if wf == 2:
            return _nkbg_varint_encode(_nkbg_zigzag_encode(int(w)))
        if wf == 3:
            return struct.pack("<d", w)
        if wf == 4:
            return struct.pack("<f", w)
        return b""

    def _payload(adj):
        """per-chunk (bytes, weight_bytes), plus total entry count."""
        chunk_adj, chunk_w, entries = [], [], 0
        for c in range(chunks):
            pa, pw = bytearray(), bytearray()
            for u in range(first[c], first[c + 1]):
                if u not in present:
                    pa += _nkbg_varint_encode(0)
                    continue
                pa += _nkbg_varint_encode(len(adj[u]))
                entries += len(adj[u])
                for v, w in adj[u]:
                    pa += _nkbg_varint_encode(v)
                    pw += _enc_weight(w)
            chunk_adj.append(bytes(pa))
            chunk_w.append(bytes(pw))
        return chunk_adj, chunk_w, entries

    adj_chunks, adjw_chunks, n_out = _payload(out_adj)
    tr_chunks, trw_chunks, n_in = _payload(in_adj)

    def _prefix(blocks):
        sums, acc = [], 0
        for b in blocks:
            acc += len(b)
            sums.append(acc)
        return sums

    def _section(blocks, count):
        out = bytearray()
        pre = _prefix(blocks)
        for c in range(chunks - 1):
            out += struct.pack("<Q", pre[c])
        if count is not None:
            out += struct.pack("<Q", count)
        for b in blocks:
            out += b
        return bytes(out)

    sec_adj = _section(adj_chunks, n_out)
    sec_tr = _section(tr_chunks, n_in)
    sec_wadj = _section(adjw_chunks, None) if wf else b""
    sec_wtr = _section(trw_chunks, None) if wf else b""

    header_size = 8 + 11 * 8
    off_base = header_size
    base = bytearray()
    for u in range(nodes):
        base.append(0 if u in present else 1)
    for c in range(1, chunks):
        base += struct.pack("<Q", first[c])
    off_adj = off_base + len(base)
    off_tr = off_adj + len(sec_adj)
    nxt = off_tr + len(sec_tr)
    if wf:
        off_wadj, off_wtr = nxt, nxt + len(sec_wadj)
    else:
        off_wadj = off_wtr = 0
    features = (1 if g.directed else 0) | (wf << 1)
    header = _NKBG_MAGIC + struct.pack(
        "<10Q", 0, features, nodes, chunks, off_base, off_adj, off_tr,
        off_wadj, off_wtr, 0,
    ) + struct.pack("<Q", 0)
    with open(path, "wb") as f:
        f.write(header + bytes(base) + sec_adj + sec_tr + sec_wadj + sec_wtr)


def read_networkit_binary(spark: SparkSession, path: str) -> Graph:
    """Parse nkbg002/003/004 into a Graph (adj + weight sections only —
    the transpose mirrors the same undirected edges / directed in-edges,
    and edge ids are consumed by offset, never needed)."""
    import struct

    with open(path, "rb") as f:
        buf = f.read()
    magic = buf[:8]
    version = {b"nkbg002\x00": 2, b"nkbg003\x00": 3, b"nkbg004\x00": 4}.get(
        magic
    )
    if version is None:
        raise ValueError("Reader expected another magic value")
    vals = struct.unpack_from("<11Q", buf, 8)
    (_cksum, features, nodes, chunks, off_base, off_adj, _off_tr,
     off_wadj, _off_wtr, _off_id, _off_idt) = vals
    directed = bool(features & 0x1)
    wf = (features & 0xE) >> 1
    present = []
    pos = off_base
    for u in range(nodes):
        if not (buf[pos] & 0x1):
            present.append(u)
        pos += 1
    first = [0]
    for _ in range(1, chunks):
        first.append(struct.unpack_from("<Q", buf, pos)[0])
        pos += 8
    first.append(nodes)
    present_set = set(present)

    apos = off_adj + (chunks - 1) * 8 + 8
    wpos = off_wadj + (chunks - 1) * 8 if wf else 0
    rows = []
    for u in range(nodes):
        cnt, apos = _nkbg_varint_decode(buf, apos)
        for _ in range(cnt):
            v, apos = _nkbg_varint_decode(buf, apos)
            w = 1.0
            if wf in (1, 2):
                raw, wpos = _nkbg_varint_decode(buf, wpos)
                w = float(raw if wf == 1 else _nkbg_zigzag_decode(raw))
            elif wf == 3:
                w = struct.unpack_from("<d", buf, wpos)[0]
                wpos += 8
            elif wf == 4:
                w = float(struct.unpack_from("<f", buf, wpos)[0])
                wpos += 4
            if u in present_set and v in present_set:
                if directed:
                    rows.append((u, v, w))
                else:
                    rows.append((min(u, v), max(u, v), w))
    v_df = spark.createDataFrame([(i,) for i in present], "id long")
    e_df = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph.from_edges(
        e_df, directed=directed, weighted=wf != 0, vertices=v_df
    )


def write_thrill_binary(g: Graph, path: str) -> None:
    """ThrillGraphBinaryWriter
    (/root/reference/networkit/cpp/io/ThrillGraphBinaryWriter.cpp:13-57):
    per node id u in 0..max: varint half-degree, then the neighbors
    v >= u as little-endian uint32.  Neighbors are emitted in ascending
    order (the reference walks adjacency order — a permutation of the
    same set; round-trips are id-exact either way).  Driver-side
    fixture-scale IO like the other binary formats; parquet is the
    declared web-scale native format."""
    if g.directed:
        raise ValueError("Thrill binary stores undirected half-edges only")
    rows = (
        g.adj()
        .filter(F.col("dst") >= F.col("src"))
        .select("src", "dst")
        .collect()
    )
    nbrs: dict[int, list[int]] = {}
    max_id = -1
    for r in rows:
        u, v = int(r["src"]), int(r["dst"])
        nbrs.setdefault(u, []).append(v)
        max_id = max(max_id, u, v)
    if max_id >= 1 << 32:
        raise ValueError(
            "Thrill binary graphs only support graphs with up to 2^32-1 nodes"
        )
    out = bytearray()
    for u in range(max_id + 1):
        ns = sorted(nbrs.get(u, []))
        deg = len(ns)
        if deg == 0:
            out.append(0)
        while deg:
            b = deg & 0x7F
            deg >>= 7
            out.append(b | (0x80 if deg else 0))
        for v in ns:
            out += int(v).to_bytes(4, "little")
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_thrill_binary(spark: SparkSession, path: str | list) -> Graph:
    """ThrillGraphBinaryReader
    (/root/reference/networkit/cpp/io/ThrillGraphBinaryReader.cpp:46-107):
    sequential node records (varint degree + uint32-LE neighbors over
    one or several concatenated files) -> undirected Graph."""
    paths = [path] if isinstance(path, str) else list(path)
    buf = b"".join(open(p, "rb").read() for p in paths)
    pos, u = 0, 0
    edges: list[tuple[int, int, float]] = []
    max_id = -1
    while pos < len(buf):
        deg, shift = 0, 0
        while True:
            b = buf[pos]
            pos += 1
            if shift == 63 and (b & 0xFE):
                raise OverflowError("Overflow during variant64 decoding.")
            deg |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        for _ in range(deg):
            v = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
            edges.append((u, v, 1.0))
            max_id = max(max_id, v)
        max_id = max(max_id, u)
        u += 1
    n = max(max_id + 1, 0)
    e = spark.createDataFrame(
        edges or [], "src long, dst long, weight double"
    ).select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "weight",
    ).distinct()
    verts = spark.range(n).select(F.col("id").cast("long").alias("id"))
    return Graph(e, vertices=verts, directed=False, weighted=False)


_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])


def _gt_width(n: int) -> int:
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


def write_graphtool_binary(g: Graph, path: str) -> None:
    """GraphToolBinaryWriter
    (/root/reference/networkit/cpp/io/GraphToolBinaryWriter.cpp:19-46 +
    writeAdjacencies :64-120): gt magic + version 1 + little-endian
    flag, empty comment, directed byte, u64 n, then per node a u64
    degree and width-byte neighbor ids (undirected: neighbors v <= u).
    Requires continuous ids (the reference's compact branch)."""
    nodes = sorted(int(r["id"]) for r in g.nodes().collect())
    n = len(nodes)
    if nodes and nodes[-1] != n - 1:
        raise ValueError(
            "graph-tool binary writer needs continuous node ids — "
            "compact the graph first (GraphTools.getCompactedGraph)"
        )
    width = _gt_width(n)
    rel = g.adj() if not g.directed else g.edges
    rows = rel.select("src", "dst").collect()
    nbrs: dict[int, list[int]] = {u: [] for u in range(n)}
    for r in rows:
        u, v = int(r["src"]), int(r["dst"])
        if g.directed or v <= u:
            nbrs[u].append(v)
    out = bytearray()
    out += _GT_MAGIC
    out += bytes([0x01, 0x00])  # version, little-endian
    out += (0).to_bytes(8, "little")  # empty comment
    out += bytes([0x01 if g.directed else 0x00])
    out += n.to_bytes(8, "little")
    for u in range(n):
        ns = sorted(nbrs[u])
        out += len(ns).to_bytes(8, "little")
        for v in ns:
            out += int(v).to_bytes(width, "little")
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_graphtool_binary(spark: SparkSession, path: str) -> Graph:
    """GraphToolBinaryReader
    (/root/reference/networkit/cpp/io/GraphToolBinaryReader.cpp:14-131):
    header + comment + directed byte + u64 n + per-node adjacency
    records; undirected files store each edge once (at the larger
    endpoint)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:6] != _GT_MAGIC or buf[6] != 0x01:
        raise ValueError("File header is broken")
    if buf[7] == 0x00:
        little = True
    elif buf[7] == 0x01:
        little = False
    else:
        raise ValueError("File header is broken")
    bo = "little" if little else "big"
    pos = 8
    clen = int.from_bytes(buf[pos:pos + 8], bo)
    pos += 8 + clen
    directed = buf[pos] == 0x01
    pos += 1
    n = int.from_bytes(buf[pos:pos + 8], bo)
    pos += 8
    width = _gt_width(n)
    edges: list[tuple[int, int, float]] = []
    for u in range(n):
        deg = int.from_bytes(buf[pos:pos + 8], bo)
        pos += 8
        for _ in range(deg):
            v = int.from_bytes(buf[pos:pos + width], bo)
            pos += width
            edges.append((u, v, 1.0))
    e = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    if not directed:
        e = e.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ).distinct()
    verts = spark.range(n).select(F.col("id").cast("long").alias("id"))
    return Graph(e, vertices=verts, directed=directed, weighted=False)


def read_rb(spark: SparkSession, path: str) -> Graph:
    """RBGraphReader (Rutherford-Boeing compressed-column files,
    /root/reference/networkit/cpp/io/RBGraphReader.cpp:16-44 over
    RBMatrixReader.cpp:36-130): 4-line header (title; row counts of the
    pointer/index/value blocks; ``fmt ncols nrows nvals``; fortran
    formats), then 1-indexed column pointers, row indices, and (unless
    pattern-only) values.  Only real/integer/pattern ('r'/'i'/'p') in
    assembled column form ('a') are supported, like the reference.
    Edge direction is row -> col; 's' (symmetric) files produce an
    undirected graph.  Driver-side fixture-scale interop like the other
    format readers; parquet is the native format."""
    with open(path) as f:
        lines = f.read().splitlines()
    hdr = lines[1].split()
    n_ptr_rows, n_idx_rows, n_val_rows = (
        int(hdr[1]), int(hdr[2]), int(hdr[3])
    )
    fmt_line = lines[2].split()
    fmt = fmt_line[0].lower()
    ncols, nrows = int(fmt_line[1]), int(fmt_line[2])
    if fmt[0] not in "rip":
        raise ValueError(
            "Unsupported format: only real, integer, and pattern "
            "formats are supported."
        )
    if fmt[2] != "a":
        raise ValueError(
            "Unsupported format: only compressed column format is "
            "supported."
        )
    pattern_only = fmt[0] == "p"
    symmetric = fmt[1] == "s"
    if ncols != nrows:
        raise ValueError(
            "File does not contain a square matrix - cannot parse "
            "this file into a graph!"
        )
    body = lines[4:]
    ptr_block = body[:n_ptr_rows]
    idx_block = body[n_ptr_rows:n_ptr_rows + n_idx_rows]
    val_block = body[
        n_ptr_rows + n_idx_rows:n_ptr_rows + n_idx_rows + n_val_rows
    ]
    pointers = [int(t) - 1 for ln in ptr_block for t in ln.split()]
    rowindex = [int(t) - 1 for ln in idx_block for t in ln.split()]
    values = [float(t) for ln in val_block for t in ln.split()]
    edges = []
    for col in range(ncols):
        for idx in range(pointers[col], pointers[col + 1]):
            w = 1.0 if pattern_only else values[idx]
            edges.append((rowindex[idx], col, w))
    edf = spark.createDataFrame(
        edges or [(0, 0, 1.0)], "src long, dst long, weight double"
    )
    if not edges:
        edf = edf.limit(0)
    verts = spark.range(ncols).select(F.col("id"))
    return Graph(
        edf, verts, directed=not symmetric, weighted=not pattern_only
    )


def read_dibap(spark: SparkSession, path: str) -> Graph:
    """DibapGraphReader
    (/root/reference/networkit/cpp/io/DibapGraphReader.cpp:33-180):
    big-endian binary — 'GI' type code (short), V, vertex-weight dim +
    weights, CSR offsets of[V+1], targets to[numE2], edge-weight dim +
    int weights, coordinate dim + float coords.  Undirected edges taken
    for v <= to[e]; node weights/coordinates are parsed and discarded
    like the reference (its FIXME keeps the graph unweighted per-node).
    """
    import struct

    buf = open(path, "rb").read()
    pos = 0

    def _i(k=1):
        nonlocal pos
        out = struct.unpack(f">{k}i", buf[pos:pos + 4 * k])
        pos += 4 * k
        return out

    (type_code,) = struct.unpack(">h", buf[pos:pos + 2])
    pos += 2
    if type_code != ((ord("G") << 8) | ord("I")):
        raise ValueError("bad file structure ")
    (v_count,) = _i()
    (dvw,) = _i()
    if dvw > 0:
        _i(v_count * dvw)  # vertex weights — parsed, unused
    of = list(_i(v_count + 1))
    num_e2 = of[v_count]
    to = list(_i(num_e2)) if num_e2 else []
    (dew,) = _i()
    ew = list(_i(num_e2 * dew)) if dew > 0 else []
    (dxy,) = _i()
    if dxy > 0:
        pos += 4 * v_count * dxy  # float coordinates — skipped
    edges = []
    for v in range(v_count):
        for e in range(of[v], of[v + 1]):
            if v <= to[e]:
                w = float(ew[e]) if dew > 0 else 1.0
                edges.append((v, to[e], w))
    edf = spark.createDataFrame(
        edges or [(0, 0, 1.0)], "src long, dst long, weight double"
    )
    if not edges:
        edf = edf.limit(0)
    verts = spark.range(v_count).select(F.col("id"))
    return Graph(edf, verts, directed=False, weighted=dew > 0)


def read_raster(
    spark: SparkSession, path: str, normalization_factor: float = 1.0
) -> DataFrame:
    """RasterReader
    (/root/reference/networkit/cpp/io/RasterReader.cpp:19-105): ESRI
    ASCII raster — 6-line header (ncols/nrows read from columns 15+,
    rest ignored), then nrows data lines; each cell value * factor,
    rounded, spawns that many 2D points inside the unit cell (x in
    [col, col+1), y in [1-(row+1), 1-row)).

    Deviation (documented): the reference draws the in-cell offsets
    from Aux::Random; here they are md5-derandomized from
    (row, col, i) so the point cloud is reproducible cross-run —
    the same derandomization rule every sampling operator in this
    engine uses.  Returns a DataFrame (x double, y double)."""
    import hashlib

    with open(path) as f:
        lines = f.read().splitlines()
    ncols = int(float(lines[0][14:].split()[0]))
    nrows = int(float(lines[1][14:].split()[0]))
    pts = []
    for row in range(nrows):
        vals = lines[6 + row].split()
        for col in range(ncols):
            v = float(vals[col]) * normalization_factor
            cnt = int(round(v))
            xlb, ylb = float(col), 1.0 - (row + 1)
            for i in range(cnt):
                h = hashlib.md5(f"{row}:{col}:{i}".encode()).hexdigest()
                fx = int(h[:8], 16) / 2**32
                fy = int(h[8:16], 16) / 2**32
                pts.append((xlb + fx, ylb + fy))
    df = spark.createDataFrame(pts or [(0.0, 0.0)], "x double, y double")
    return df if pts else df.limit(0)


def read_cover(spark: SparkSession, path: str) -> DataFrame:
    """CoverReader (/root/reference/networkit/cpp/io/CoverReader.cpp:9-34):
    non-comment line i lists the member nodes of subset i.  Returns
    (id, subset) — a node appears once per subset containing it."""
    rows = []
    i = 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("#"):
                continue
            for tok in line.split():
                rows.append((int(tok), i))
            i += 1
    df = spark.createDataFrame(rows or [(0, 0)], "id long, subset long")
    return df if rows else df.limit(0)


def write_cover(cover: DataFrame, path: str) -> None:
    """CoverWriter (/root/reference/networkit/cpp/io/CoverWriter.cpp:9-26):
    one line per subset (ascending subset index), member ids ascending,
    trailing space per id like the reference."""
    rows = cover.select("id", "subset").collect()
    sets: dict[int, list[int]] = {}
    for r in rows:
        sets.setdefault(int(r["subset"]), []).append(int(r["id"]))
    upper = max(sets) + 1 if sets else 0
    with open(path, "w") as f:
        for s in range(upper):
            for v in sorted(sets.get(s, [])):
                f.write(f"{v} ")
            f.write("\n")


def read_binary_partition(
    spark: SparkSession, path: str, width: int = 8
) -> DataFrame:
    """BinaryPartitionReader
    (/root/reference/networkit/cpp/io/BinaryPartitionReader.cpp:7-48):
    little-endian fixed-width (4 or 8 byte) subset ids, node u = record
    u.  Returns (id, label)."""
    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    buf = open(path, "rb").read()
    if len(buf) % width != 0:
        raise ValueError(
            "Error: length of partition file must be a multiple of the "
            "width."
        )
    rows = [
        (u, int.from_bytes(buf[u * width:(u + 1) * width], "little"))
        for u in range(len(buf) // width)
    ]
    df = spark.createDataFrame(rows or [(0, 0)], "id long, label long")
    return df if rows else df.limit(0)


def write_binary_partition(
    labels: DataFrame, path: str, width: int = 8
) -> None:
    """BinaryPartitionWriter
    (/root/reference/networkit/cpp/io/BinaryPartitionWriter.cpp:7-33)."""
    if width not in (4, 8):
        raise ValueError("Only width 4 and 8 are supported")
    rows = labels.select("id", "label").collect()
    lab = {int(r["id"]): int(r["label"]) for r in rows}
    if width == 4 and lab and max(lab.values()) > 0xFFFFFFFF:
        raise ValueError(
            "Error, the upper bound of the given partition cannot be "
            "represented by an unsigned int of width 4. Please use a "
            "width of 8."
        )
    with open(path, "wb") as f:
        for u in range(len(lab)):
            f.write(int(lab[u]).to_bytes(width, "little"))


def read_edgelist_cover(
    spark: SparkSession, path: str, first_node: int = 1
) -> DataFrame:
    """EdgeListCoverReader
    (/root/reference/networkit/cpp/io/EdgeListCoverReader.cpp:12-47):
    non-comment line = ``v c1 c2 ...`` — node v (shifted by
    ``first_node``) belongs to subsets c1, c2, ... (kept as-is).
    Returns (id, subset)."""
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            toks = line.split()
            if not toks:
                continue
            v = int(toks[0]) - first_node
            for c in toks[1:]:
                rows.append((v, int(c)))
    df = spark.createDataFrame(rows or [(0, 0)], "id long, subset long")
    return df if rows else df.limit(0)


def read_edgelist_partition(
    spark: SparkSession, path: str, first_node: int = 1, sep: str = "\t"
) -> DataFrame:
    """EdgeListPartitionReader
    (/root/reference/networkit/cpp/io/EdgeListPartitionReader.cpp:14-44):
    line = ``v<sep>c``; node ids shifted by ``first_node``; nodes never
    mentioned default to label ``none`` (represented here as NULL).
    Returns (id, label)."""
    entries: dict[int, int] = {}
    max_v = -1
    with open(path) as f:
        for line in f:
            toks = line.rstrip("\n").split(sep)
            if not toks or toks[0] == "#" or toks[0] == "":
                continue
            v = int(toks[0]) - first_node
            entries[v] = int(toks[1])
            max_v = max(max_v, v)
    rows = [(u, entries.get(u)) for u in range(max_v + 1)]
    df = spark.createDataFrame(rows or [(0, 0)], "id long, label long")
    return df if rows else df.limit(0)


def read_snap_partition(
    spark: SparkSession, path: str, node_map: dict | None = None
) -> DataFrame:
    """SNAPEdgeListPartitionReader
    (/root/reference/networkit/cpp/io/SNAPEdgeListPartitionReader.cpp:
    24-121): SNAP community files — line i (1-based, comments/blanks
    keep counting like the reference's ``while(file.good()) {++i; ...}``
    loop) lists the members of subset i; ids run through ``node_map``
    when given, unknown ids are dropped with the same semantics as the
    reference's WARN-and-ignore.  Returns a cover (id, subset)."""
    rows = []
    i = 0
    with open(path) as f:
        for line in f:
            i += 1
            line = line.rstrip("\n")
            if line.startswith("#") or not line.strip():
                continue
            for tok in line.split():
                v = int(tok)
                if node_map is not None:
                    if v in node_map:
                        rows.append((int(node_map[v]), i))
                else:
                    rows.append((v, i))
    df = spark.createDataFrame(rows or [(0, 0)], "id long, subset long")
    return df if rows else df.limit(0)


def write_dot_partition(g: Graph, labels: DataFrame, path: str) -> None:
    """DotPartitionWriter
    (/root/reference/networkit/cpp/io/DotPartitionWriter.cpp:9-63):
    undirected dot graph with per-cluster hue fills; zero-degree nodes
    are skipped like the reference.  Hue order follows ascending cluster
    id (the reference iterates an unordered_set — documented
    deviation)."""
    lab = {int(r["id"]): int(r["label"])
           for r in labels.select("id", "label").collect()}
    deg = {int(r["id"]): int(r["degree"])
           for r in g.degrees().select("id", "degree").collect()}
    used = sorted({c for u, c in lab.items() if deg.get(u, 0) > 0})
    factor = 1.0 / len(used) if used else 0.0
    hue = {c: factor * i for i, c in enumerate(used)}
    with open(path, "w") as f:
        f.write("graph {\n")
        for u in sorted(deg):
            if deg[u] == 0 or u not in lab:
                continue
            c = lab[u]
            f.write(
                f"{u} [style=filled, color=\"{hue[c]},0.99,0.99\", "
                f"label={c}];\n"
            )
        for r in g.edges.select("src", "dst").collect():
            f.write(f"{r['src']} -- {r['dst']};\n")
        f.write("}\n")


def read_binary_edgelist_partition(
    spark: SparkSession, path, first_node: int = 0, width: int = 8
) -> DataFrame:
    """BinaryEdgeListPartitionReader
    (/root/reference/networkit/cpp/io/BinaryEdgeListPartitionReader.cpp:
    14-90): little-endian (u, p) pairs of fixed width over one or
    several concatenated files.  Returns (id, label)."""
    if width not in (4, 8):
        raise ValueError("Error: width must be 4 or 8")
    paths = [path] if isinstance(path, str) else list(path)
    buf = b"".join(open(p, "rb").read() for p in paths)
    if len(buf) % (2 * width) != 0:
        raise ValueError("Error: truncated (u, p) record")
    entries: dict[int, int] = {}
    max_v = -1
    for off in range(0, len(buf), 2 * width):
        u = int.from_bytes(buf[off:off + width], "little")
        p = int.from_bytes(buf[off + width:off + 2 * width], "little")
        if u < first_node:
            raise ValueError(
                "Error: node smaller than the given firstNode found!"
            )
        u -= first_node
        entries[u] = p
        max_v = max(max_v, u)
    if len(entries) != max_v + 1:
        raise ValueError(
            "Error, read less values than there are elements in the "
            "partition."
        )
    rows = sorted(entries.items())
    df = spark.createDataFrame(rows or [(0, 0)], "id long, label long")
    return df if rows else df.limit(0)


def write_binary_edgelist_partition(
    labels: DataFrame, path: str, first_node: int = 0, width: int = 8
) -> None:
    """BinaryEdgeListPartitionWriter
    (/root/reference/networkit/cpp/io/BinaryEdgeListPartitionWriter.cpp:
    7-37)."""
    if width not in (4, 8):
        raise ValueError("Width must be 4 or 8")
    rows = sorted(
        (int(r["id"]), int(r["label"]))
        for r in labels.select("id", "label").collect()
    )
    if width == 4 and rows and max(p for _, p in rows) > 0xFFFFFFFF:
        raise ValueError(
            "Error, the upper bound of the given partition cannot be "
            "represented by an unsigned int of width 4. Please use a "
            "width of 8."
        )
    with open(path, "wb") as f:
        for u, p in rows:
            f.write(int(u + first_node).to_bytes(width, "little"))
            f.write(int(p).to_bytes(width, "little"))


_PS_COLORS = [
    (1.0, 0.0, 0.0), (1.0, 0.5, 0.0), (1.0, 1.0, 0.0), (0.5, 1.0, 0.0),
    (0.0, 1.0, 0.0), (0.0, 1.0, 0.5), (0.0, 1.0, 1.0), (0.0, 0.5, 1.0),
    (0.0, 0.0, 1.0), (0.5, 0.0, 1.0), (1.0, 0.0, 1.0), (1.0, 0.0, 0.5),
    (0.6, 0.0, 0.0), (0.6, 0.3, 0.0), (0.6, 0.6, 0.0), (0.3, 0.6, 0.0),
    (0.0, 0.6, 0.0), (0.0, 0.6, 0.3), (0.0, 0.6, 0.6), (0.0, 0.3, 0.6),
    (0.0, 0.0, 0.6), (0.3, 0.0, 0.6), (0.6, 0.0, 0.6), (0.6, 0.0, 0.3),
]


def write_postscript(
    g,
    coordinates,
    path: str,
    clustering=None,
    torus: bool = False,
) -> None:
    """PostscriptWriter (viz/PostscriptWriter.cpp:37-168): EPS drawing
    of a laid-out graph, intra-cluster edges in the 24-color cyclic
    palette (:20-33), inter-cluster edges grey, nodes as filled dots.

    ``coordinates``: (id, x0, x1) DataFrame (e.g. operators/pivotmds
    output); ``clustering``: optional (id, label) — omitted = the
    reference's makeOneClustering fallback (:163-168).  Fixture-scale
    collect like every other writer here (the reference streams through
    one ofstream, :143-160); the 1020x1020 canvas, zero border
    (ps_border is default-initialized in the reference), fixed 3-digit
    formatting, and the torus +-500 wrap replicate :37-115.
    """
    from pyspark.sql import functions as F  # noqa: F401 (local import style)

    rows = coordinates.collect()
    cols = coordinates.columns
    xs = {r["id"]: (float(r[cols[1]]), float(r[cols[2]])) for r in rows}
    labels = {}
    if clustering is not None:
        labels = {r["id"]: r["label"] for r in clustering.collect()}
    else:
        labels = {u: 0 for u in xs}
    edges = [
        (r["src"], r["dst"])
        for r in g.edges.select("src", "dst").collect()
        if r["src"] in xs and r["dst"] in xs
    ]
    size = 1020.0
    border = 0.0
    min_x = min(p[0] for p in xs.values())
    min_y = min(p[1] for p in xs.values())
    max_x = max(p[0] for p in xs.values())
    max_y = max(p[1] for p in xs.values())
    sx = (size - 2 * border) / (max_x - min_x) if max_x > min_x else 1.0
    sy = (size - 2 * border) / (max_y - min_y) if max_y > min_y else 1.0

    def adj(p):
        return ((p[0] - min_x) * sx + border, (p[1] - min_y) * sy + border)

    out = []
    out.append("%!PS-Adobe-3.0 EPSF-3.0\n" if torus else "%!PS-Adobe-1.0\n")
    out.append("%%Title: NetworKit visualization\n")
    out.append(f"%%BoundingBox: 0.000 0.000 {size:.3f} {size:.3f}\n")
    out.append("%%EndComments\n")
    if not torus:
        out.append("%%EndProlog\ngsave\n")
    out.append(
        "/p {newpath} bind def\n/m {moveto} bind def\n"
        "/r {rmoveto} bind def\n/k {rlineto} bind def\n"
        "/l {lineto} bind def\n/n {rlineto} bind def\n"
        "/c {setrgbcolor} bind def\n/s {stroke} bind def\n"
        "/w {setlinewidth} bind def\n/h {show} bind def\n"
        "/a {arc closepath fill} bind def\n/b {closepath eofill} bind def\n"
    )
    out.append("0.000 0.000 0.000 c\n")
    for u, v in edges:
        lu, lv = labels.get(u), labels.get(v)
        if lu == lv and lu is not None:
            r_, g_, b_ = _PS_COLORS[int(lu) % len(_PS_COLORS)]
            out.append(f"{r_:.3f} {g_:.3f} {b_:.3f} c ")
        else:
            out.append("0.80 0.80 0.80 c 1.0 w ")
        start, end = adj(xs[u]), adj(xs[v])
        if torus:
            d0, d1 = end[0] - start[0], end[1] - start[1]
            d0 += -1000.0 if d0 > 500.0 else (1000.0 if d0 < -500.0 else 0.0)
            d1 += -1000.0 if d1 > 500.0 else (1000.0 if d1 < -500.0 else 0.0)
            end = (start[0] + d0, start[1] + d1)
        out.append(
            f"p {start[0]:.3f} {start[1]:.3f} m {end[0]:.3f} {end[1]:.3f} l s\n"
        )
    for u in sorted(xs):
        lu = labels.get(u)
        if lu is not None:
            r_, g_, b_ = _PS_COLORS[int(lu) % len(_PS_COLORS)]
            out.append(f"{r_:.3f} {g_:.3f} {b_:.3f} c ")
        else:
            out.append("0.0 0.0 0.0 c ")
        p = adj(xs[u])
        out.append(f"p {p[0]:.3f} {p[1]:.3f} 2.000 0.00 360.00 a s\n")
    if not torus:
        out.append("grestore\n")
    with open(path, "w") as fh:
        fh.write("".join(out))


def write_dgs(events: DataFrame, path: str, order_by=("step", "cls", "u", "v")) -> None:
    """DGSWriter (/root/reference/networkit/cpp/dynamics/DGSWriter.cpp:
    14-60): serialize a GraphEvent relation as a DGS004 stream — header
    ``DGS004 / noname 0 0`` (:17), `an`/`dn`/`rn` node lines, `ae u-v u
    v weight=w`, `de u-v`, `ce u-v weight=w`, `ie u-v weight=w`, `st`
    (:20-55).  Edge names are the reference's own ``u-v`` scheme (:34).

    ``events`` columns: (type, u, v[, w][, step][, cls]); rows are
    emitted in ``order_by`` order restricted to the columns present
    (a DGS stream is ordered; pass the ordering your event source
    defines).  Fixture-scale writer (driver-side collect) like every
    other format writer here — parquet is the 100 TB-native format.
    """
    cols = set(events.columns)
    keys = [c for c in order_by if c in cols]
    rows = events.orderBy(*keys).collect() if keys else events.collect()
    with open(path, "w") as out:
        out.write("DGS004\nnoname 0 0\n")
        for r in rows:
            t = r["type"]
            u = None if "u" not in cols else r["u"]
            v = None if "v" not in cols else r["v"]
            w = None if "w" not in cols else r["w"]
            if t == "NODE_ADDITION":
                out.write(f"an {u}\n")
            elif t == "NODE_REMOVAL":
                out.write(f"dn {u}\n")
            elif t == "NODE_RESTORATION":
                out.write(f"rn {u}\n")
            elif t == "EDGE_ADDITION":
                ww = 1.0 if w is None else w
                out.write(f"ae {u}-{v} {u} {v} weight={ww}\n")
            elif t == "EDGE_REMOVAL":
                out.write(f"de {u}-{v}\n")
            elif t == "EDGE_WEIGHT_UPDATE":
                out.write(f"ce {u}-{v} weight={w}\n")
            elif t == "EDGE_WEIGHT_INCREMENT":
                out.write(f"ie {u}-{v} weight={w}\n")
            elif t == "TIME_STEP":
                out.write("st\n")
            else:
                raise ValueError(f"unknown event type: {t}")


# ---------------------------------------------------------------------------
# Format dispatcher (networkit/graphio.pyx readGraph :1319-1366 /
# writeGraph): one entry point keyed on a format name, resolving to the
# per-format readers/writers above.  Format names mirror the
# reference's graphio.Format enum members.
# ---------------------------------------------------------------------------

READ_FORMATS = {
    "EdgeList": read_edge_list,
    "METIS": read_metis,
    "SNAP": read_snap,
    "KONECT": read_konect,
    "GML": read_gml,
    "MTX": read_mtx,
    "MatrixMarket": read_mtx,
    "GraphML": read_graphml,
    "NetworkitBinary": read_networkit_binary,
    "ThrillBinary": read_thrill_binary,
    "GraphToolBinary": read_graphtool_binary,
    "RB": read_rb,
    "Dibap": read_dibap,
    "Raster": read_raster,
}

WRITE_FORMATS = {
    "EdgeList": write_edge_list,
    "METIS": write_metis,
    "GML": write_gml,
    "DOT": write_dot,
    "GraphViz": write_dot,
    "SNAP": write_snap,
    "MTX": write_mtx,
    "MatrixMarket": write_mtx,
    "GraphML": write_graphml,
    "NetworkitBinary": write_networkit_binary,
    "ThrillBinary": write_thrill_binary,
    "GraphToolBinary": write_graphtool_binary,
}


def read_graph(spark: SparkSession, path: str, fileformat: str = "EdgeList",
               **kwargs) -> Graph:
    """readGraph (graphio.pyx:1319-1366): dispatch on the format name.
    Unknown formats raise ValueError listing the supported set, like
    the reference's unknown-format error."""
    try:
        reader = READ_FORMATS[fileformat]
    except KeyError:
        raise ValueError(
            f"unknown graph format {fileformat!r}; supported: "
            f"{sorted(READ_FORMATS)}"
        ) from None
    return reader(spark, path, **kwargs)


def write_graph(g: Graph, path: str, fileformat: str = "EdgeList",
                **kwargs) -> None:
    """writeGraph: format-name dispatch over the writers above."""
    try:
        writer = WRITE_FORMATS[fileformat]
    except KeyError:
        raise ValueError(
            f"unknown graph format {fileformat!r}; supported: "
            f"{sorted(WRITE_FORMATS)}"
        ) from None
    writer(g, path, **kwargs)


def read_graphs(spark: SparkSession, dir_path: str, pattern: str,
                fileformat: str = "EdgeList", some: int | None = None,
                exclude: str | None = None, **kwargs) -> dict[str, Graph]:
    """readGraphs (graphio.pyx:1368-1404): read every file under
    ``dir_path`` whose name fnmatches ``pattern`` (minus ``exclude``),
    keyed by filename; ``some`` caps the count like the reference."""
    import fnmatch
    import os

    graphs: dict[str, Graph] = {}
    for root, _dirs, files in os.walk(dir_path):
        for fname in sorted(files):
            if not fnmatch.fnmatch(fname, pattern):
                continue
            if exclude is not None and fnmatch.fnmatch(fname, exclude):
                continue
            graphs[fname] = read_graph(
                spark, os.path.join(root, fname), fileformat, **kwargs
            )
            if some is not None and len(graphs) >= some:
                return graphs
    return graphs
