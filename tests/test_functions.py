import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from networkit_spark.functions import dedup, multimodal, similarity, textfns


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),      # exact dup of 0
        (2, "the quick brown fox jumped over the lazy dog", "en"),     # near dup
        (3, "der schnelle braune fuchs springt und ist nicht faul", "de"),
        (4, "completely different content about spark engines", "en"),
        (5, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(spark, docs):
    m = dedup.exact_duplicates(docs)
    got = {r["doc_id"]: r["keep_id"] for r in m.collect()}
    assert got[0] == 0 and got[1] == 0 and got[2] == 2
    kept = dedup.dedup_exact(docs)
    assert kept.count() == 5
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == {0, 2, 3, 4, 5}


def test_minhash_lsh_finds_near_dup(spark, docs):
    cand = dedup.minhash_lsh_candidates(docs, num_perm=8, bands=4, shingle_k=3)
    pairs = {(r["a"], r["b"]) for r in cand.collect()}
    assert (0, 1) in pairs  # identical texts always collide
    # low-jaccard pair (0, 4) must NOT collide in all bands
    assert (0, 4) not in pairs

    # a verified-colliding near-dup pair (jaccard 0.91; all 4 bands agree
    # under md5 — precomputed with hashlib, deterministic)
    a = (
        "large scale web data processing with spark requires careful "
        "attention to partitioning shuffle behavior and skew handling "
        "across many executor nodes in the cluster"
    )
    b = a.replace("cluster", "datacenter")
    near = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    got = {(r["a"], r["b"]) for r in
           dedup.minhash_lsh_candidates(near, num_perm=8, bands=4).collect()}
    assert (0, 1) in got


def test_ngram_jaccard(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.3)
    got = {(r["a"], r["b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(0, 1)] == 1.0
    # 9 tokens -> 7 shingles; the one changed word breaks 3 of them:
    # inter 4 / union 10
    assert got[(0, 2)] == 0.4
    assert (0, 4) not in got


def test_simhash(spark, docs):
    sig = dedup.simhash_signatures(docs)
    vals = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert vals[0] == vals[1]  # identical text -> identical signature
    pairs = dedup.simhash_candidates(docs, max_hamming=10)
    got = {(r["a"], r["b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((0, 1)) == 0


def test_textfns(spark, docs):
    out = textfns.token_count(docs).collect()
    n = {r["doc_id"]: r["n_tokens"] for r in out}
    assert n[0] == 9 and n[5] == 0
    lang = textfns.language_id(docs)
    got = {r["doc_id"]: r["lang_pred"] for r in lang.collect()}
    assert got[0] == "en" and got[3] == "de" and got[5] == "und"
    q = textfns.quality_score(docs)
    rows = {r["doc_id"]: r for r in q.collect()}
    assert rows[0]["quality"] > rows[5]["quality"]
    assert 0.0 <= rows[0]["quality"] <= 1.0
    fp = textfns.fingerprint(docs)
    vals = {r["doc_id"]: r["fp"] for r in fp.collect()}
    assert vals[0] == vals[1] != vals[2]
    # order sensitivity: permuted tokens -> different fingerprint
    perm = spark.createDataFrame(
        [(9, "dog lazy the over jumps fox brown quick the", "en")],
        "doc_id long, text string, lang string",
    )
    assert textfns.fingerprint(perm).collect()[0]["fp"] != vals[0]


def test_cosine_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0]),  # zero vector excluded
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = similarity.cosine_pairs(emb, threshold=0.9)
    got = {(r["a"], r["b"]): r["cosine"] for r in pairs.collect()}
    assert (0, 1) in got and got[(0, 1)] > 0.99
    assert (0, 2) not in got

    topk = similarity.cosine_topk(emb, emb, k=1)
    best = {r["query_id"]: r["neighbor_id"] for r in topk.collect()}
    assert best[0] == 1 and best[1] == 0


def test_lsh_topk_recall(spark):
    rng = np.random.default_rng(42)
    base = rng.standard_normal((20, 8))
    rows = [(i, base[i].tolist()) for i in range(20)]
    # plant an exact near-duplicate of vector 0
    rows.append((20, (base[0] + 0.01 * rng.standard_normal(8)).tolist()))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    approx = similarity.lsh_topk(emb, k=3, bits=6, tables=6)
    hits = {
        (r["query_id"], r["neighbor_id"]) for r in approx.collect() if r["rank"] == 1
    }
    assert (0, 20) in hits or (20, 0) in hits


def test_multimodal_plumbing(spark):
    pdf = multimodal.gen_media_pdf(9)
    media = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 9
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in rows)
    # determinism: same payload -> same features
    again = {r["media_id"]: r["features"] for r in feats.collect()}
    assert {r["media_id"]: r["features"] for r in rows} == again

    with pytest.raises(Exception):
        multimodal.extract_features(media, decode_stub=False).collect()

    resized = multimodal.resize_images(media, 64, 64).collect()
    assert all(r["meta"]["width"] == 64 for r in resized)
    frames = multimodal.sample_frames(media, every_n=30)
    per_vid = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per_vid)  # 120 frames / 30
