"""Deduplication operators for web-scale corpora.

Five strategies, all shuffle-conscious:

  - exact: md5 groupBy — one shuffle on the 16-byte digest, never on
    the document text.
  - MinHash + LSH: shingle -> per-permutation min-hash -> band buckets
    -> bucket self-join. Cross-engine-deterministic hashing: the "hash"
    of a shingle under permutation i is ``md5(i || '|' || shingle)``
    and the min is LEXICOGRAPHIC over hex digests — identical in any
    engine with md5, no 64-bit arithmetic to disagree on.
  - SimHash: 64-bit signature from per-token crc32-derived bit votes;
    near-dups = signatures at small Hamming distance, bucketed by
    16-bit bands.
  - n-gram Jaccard: exact pairwise verification (used standalone at
    small scale, or as the verify stage after LSH candidates).
  - embedding cosine: see functions/similarity.py (near_duplicates_by
    threshold).

At 100 TB the only quadratic step (pairwise Jaccard) runs strictly on
LSH candidate pairs, whose count is controlled by bands x rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+"), 0)


def shingles_col(text: Column, k: int = 3) -> Column:
    """array<string> of word k-shingles (space-joined), distinct."""
    toks = _norm_tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, keep_id, text_hash): every doc mapped to the minimum id
    sharing its md5; rows with doc_id != keep_id are the removable
    duplicates."""
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    keep = h.groupBy("text_hash").agg(F.min(id_col).alias("keep_id"))
    return h.join(keep, "text_hash").select(id_col, "keep_id", "text_hash")


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Filtered corpus: one representative (min id) per distinct text."""
    m = exact_duplicates(df, id_col, text_col)
    return df.join(
        m.filter(F.col(id_col) == F.col("keep_id")).select(id_col), id_col, "left_semi"
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig: array<string>) — sig[i] = min over shingles of
    md5(i|shingle); lexicographic min over hex = a valid uniform
    min-hash, reproducible in any SQL engine."""
    sh = df.select(F.col(id_col), shingles_col(F.col(text_col), shingle_k).alias("sh"))

    def perm_min(i: int):
        prefix = f"{i}|"
        # NOTE: the lambda must take exactly ONE argument — a 2-arg lambda
        # would be bound by F.transform as (element, index)
        return F.array_min(
            F.transform(F.col("sh"), lambda s: F.md5(F.concat(F.lit(prefix), s)))
        )

    return sh.select(
        id_col, F.array(*[perm_min(i) for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """(a, b) candidate near-dup pairs (a < b): docs sharing at least one
    LSH band bucket. rows_per_band = num_perm / bands.

    ``max_bucket`` is the mega-bucket guard for web scale: buckets with
    more than this many members are excluded from the self-join (a
    boilerplate bucket with 10^5 members would otherwise emit 10^10
    pairs inside one task). REQUIRED PIPELINE ORDER at scale: run
    :func:`dedup_exact` FIRST — byte-identical boilerplate then
    collapses to one representative per digest, and any bucket still
    exceeding ``max_bucket`` is near-identical-but-not-equal spam whose
    pairs are better handled by clustering its (few) distinct signatures
    than by enumerating pairs. Dropped buckets only lose candidates
    WITHIN the dropped bucket; pairs still co-bucketed in another band
    survive."""
    rows = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, num_perm, shingle_k)
    buckets = None
    for b in range(bands):
        part = sig.select(
            F.col(id_col).alias("doc"),
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col("sig").getItem(b * rows + r) for r in range(rows)]
            ).alias("bucket"),
        )
        buckets = part if buckets is None else buckets.unionByName(part)
    # materialize: the shingle+md5 pipeline would otherwise re-run once
    # per band AND per side of the self-join (4x at bands=2)
    buckets = buckets.localCheckpoint(eager=True)
    if max_bucket is not None:
        ok = (
            buckets.groupBy("band", "bucket")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") <= max_bucket)
            .select("band", "bucket")
        )
        buckets = buckets.join(ok, ["band", "bucket"], "left_semi")
    left = buckets.select("band", "bucket", F.col("doc").alias("a"))
    right = buckets.select("band", "bucket", F.col("doc").alias("b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(a, b, jaccard) pairs with shingle-set Jaccard >= threshold.

    Without ``candidates``: exact all-pairs via an inverted index
    (shingle -> docs) self-join — quadratic in shingle document
    frequency, fine at fixture scale only.

    With ``candidates`` (the LSH verify stage — the 100 TB path): the
    work is strictly O(|candidates|). Each candidate pair is joined to
    the two docs' shingle arrays and the intersection computed per-row
    with ``array_intersect`` — the inverted-index self-join (which
    Catalyst could never push a post-aggregation semi-join below) is
    never built.
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        shingles_col(F.col(text_col), shingle_k).alias("sh"),
    ).withColumn("sz", F.size("sh"))
    if candidates is not None:
        a_sh = sh.select(
            F.col("doc").alias("a"), F.col("sh").alias("sha"), F.col("sz").alias("sza")
        )
        b_sh = sh.select(
            F.col("doc").alias("b"), F.col("sh").alias("shb"), F.col("sz").alias("szb")
        )
        return (
            candidates.select("a", "b")
            .join(a_sh, "a")
            .join(b_sh, "b")
            .select(
                "a",
                "b",
                F.size(F.array_intersect("sha", "shb")).alias("inter"),
                "sza",
                "szb",
            )
            .select(
                "a",
                "b",
                F.round(
                    F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
                    6,
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    sizes = sh.select("doc", "sz")
    inv = sh.select("doc", F.explode("sh").alias("s"))
    pairs = (
        inv.alias("x")
        .join(inv.alias("y"), "s")
        .filter(F.col("x.doc") < F.col("y.doc"))
        .groupBy(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("sz").alias("szb")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(id, simhash) — 64-bit SimHash: each distinct token votes its
    crc32-seeded bit pattern; signature bit j is 1 iff positive vote sum.

    JVM-only plan: explode tokens, one crc32 per (token, not per bit —
    bit j derived as crc32(j|token) & 1 would be 64 hashes; instead we
    derive 64 bits from two md5 halves), groupBy doc with bit-popcount
    aggregation.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(_norm_tokens(F.col(text_col)))).alias("tok"),
    )
    # 64 deterministic bits per token: md5 hex -> two 32-bit ints
    h = toks.withColumn("hex", F.md5(F.col("tok")))
    bit_cols = []
    for j in range(bits):
        nibble = F.conv(F.substring("hex", 1 + j // 4, 1), 16, 10).cast("int")
        bit = F.shiftrightunsigned(nibble, j % 4).bitwiseAND(F.lit(1))
        bit_cols.append(F.when(bit == 1, 1).otherwise(-1).alias(f"b{j}"))
    voted = h.select("doc", *bit_cols)
    agg = voted.groupBy("doc").agg(
        *[F.sum(f"b{j}").alias(f"b{j}") for j in range(bits)]
    )
    sig = agg.select(
        F.col("doc").alias(id_col),
        sum(
            [
                F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long") * (2**j)).otherwise(
                    F.lit(0).cast("long")
                )
                for j in range(min(bits, 63))
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """(a, b, hamming) pairs within Hamming distance, via band-bucketed
    join (a pair within distance d < bands must agree on >= 1 band).

    ``max_bucket``: same mega-bucket guard (and same exact-dedup-first
    pipeline-order requirement) as :func:`minhash_lsh_candidates`."""
    sig = simhash_signatures(df, id_col, text_col).cache()
    width = 63 // bands
    buckets = None
    for b in range(bands):
        part = sig.select(
            F.col(id_col).alias("doc"),
            "simhash",
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("bucket"),
        )
        buckets = part if buckets is None else buckets.unionByName(part)
    if max_bucket is not None:
        buckets = buckets.localCheckpoint(eager=True)
        ok = (
            buckets.groupBy("band", "bucket")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") <= max_bucket)
            .select("band", "bucket")
        )
        buckets = buckets.join(ok, ["band", "bucket"], "left_semi")
    pairs = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("a"),
            F.col("y.doc").alias("b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs
