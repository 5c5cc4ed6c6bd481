"""Training-data operators: dedup families, similarity search, text stats,
multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dice_spark.functions.textstats import lang_id, quality_score, token_count
from dice_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from dice_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_bucketed_topk


def _docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank today."),
        (2, "The quick brown fox jumps over the lazy dog near the river bank today!"),  # exact after canon
        (3, "The quick brown fox jumps over the lazy dog near the river bend today."),  # near-dup
        (4, "Completely different text about spark dataframes and shuffle partitions."),
        (5, "el gato y el perro estan en la casa de la abuela y los ninos"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    groups = exact_dedup(_docs(spark)).collect()
    sizes = sorted(r["n_docs"] for r in groups)
    assert sizes == [1, 1, 1, 2]
    dup = [r for r in groups if r["n_docs"] == 2][0]
    assert dup["keep_id"] == 1 and list(dup["doc_ids"]) == [1, 2]


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_finds_near_dup(spark):
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(_docs(spark)).collect()}
    assert (1, 2) in pairs
    assert (1, 4) not in pairs


def test_simhash_near_dups(spark):
    # Identical canonical text -> identical simhash (hamming 0); the quarter
    # blocking guarantees recall only up to distance 3 (pigeonhole), so the
    # contract tested here is exact-dup detection + no false self-pairs.
    # Short docs flip many bits per token change, so (1,3) is NOT asserted.
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_dups(_docs(spark), max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0
    assert all(a < b for a, b in pairs)


def test_textstats(spark):
    df = _docs(spark).select(
        "doc_id",
        token_count(F.col("text")).alias("n"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["n"] == 14
    assert rows[1]["lang"] == "en"
    assert rows[5]["lang"] == "es"
    assert 0.0 <= rows[4]["q"] <= 1.0 and rows[1]["q"] > 0.5


def _vecs(spark):
    import math

    rows = []
    for i in range(20):
        angle = (i % 10) * math.pi / 20
        rows.append((i, [math.cos(angle), math.sin(angle), 0.1 * (i % 3)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark):
    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") == 0)
    top = brute_force_topk(q, emb, k=3).collect()
    assert len(top) == 3
    # vec 10 has the same angle as vec 0 -> among the top hits
    ids = [r["vec_id"] for r in top]
    assert 10 in ids
    assert all(top[i]["cosine"] >= top[i + 1]["cosine"] for i in range(len(top) - 1))


def test_ivf_recall_vs_brute_force(spark):
    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") < 3)
    from dice_spark.operators.similarity import train_centroids

    cents = train_centroids(emb, n_cells=4)
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(q, emb, k=3).collect()}
    approx = {(r["query_id"], r["vec_id"]) for r in ivf_topk(q, emb, cents, k=3, n_probe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6


def test_lsh_bucketed_topk_runs(spark):
    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") < 2)
    got = lsh_bucketed_topk(q, emb, n_planes=4, k=3, dim=3).collect()
    assert all(r["rank"] <= 3 for r in got)


def test_multimodal_plumbing(spark):
    from dice_spark.operators.multimodal import MEDIA_SCHEMA, extract_features, frame_sample_plan

    rows = [
        ("m1", "image", bytearray(b"\x89PNGfake"), "image/png", 4, 4, None),
        ("m2", "video", bytearray(b"fakemp4"), "video/mp4", None, None, 3500),
        ("m3", "image", None, "image/png", 4, 4, None),  # decode failure -> quarantined row
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats["m1"]["decode_ok"] and len(feats["m1"]["feature"]) == 8
    assert not feats["m3"]["decode_ok"] and feats["m3"]["decode_error"]
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_embedding_near_dups_hyperplane_fallback(spark):
    from dice_spark.operators.dedup import embedding_near_dups

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [-1.0, 0.0, 0.0]),     # opposite
        (4, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dups(emb, threshold=0.95, block_col=None, dim=3).collect()
    }
    assert (1, 2) in got and all(a < b for a, b in got)


def test_lsh_bucketed_topk_requires_dim(spark):
    import pytest as _pytest

    emb = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError):
        lsh_bucketed_topk(emb, emb, n_planes=2, k=1)


def test_dedup_clusters_transitive_closure_and_survivor(spark):
    """Pairs (a,b),(b,c) close into one cluster of 3; the longest text wins
    keep (doc_id ascending tiebreak); docs in no pair are singletons."""
    from dice_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [
            ("d1", "short"),
            ("d2", "the longest text of the family"),
            ("d3", "mid text"),
            ("d4", "unrelated singleton"),
            ("d5", "tie a"), ("d6", "tie b"),
        ],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d5", "d6")],
        "doc_a string, doc_b string",
    )
    got = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(got) == 6  # one row per input doc
    # transitive closure: d1-d2-d3 one cluster labeled by the min id
    assert got["d1"]["cluster_id"] == got["d2"]["cluster_id"] == got["d3"]["cluster_id"] == "d1"
    assert got["d1"]["cluster_size"] == 3
    # survivor = longest text
    assert got["d2"]["keep"] and not got["d1"]["keep"] and not got["d3"]["keep"]
    # singleton keeps itself
    assert got["d4"]["cluster_id"] == "d4" and got["d4"]["cluster_size"] == 1 and got["d4"]["keep"]
    # equal-length tie -> doc_id ascending
    assert got["d5"]["keep"] and not got["d6"]["keep"]
    # exactly one survivor per cluster
    keeps = [r for r in got.values() if r["keep"]]
    assert len(keeps) == 3
