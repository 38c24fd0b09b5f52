"""Hamming near-dup band join (Manku et al. WWW 2007) + image aHash."""

from __future__ import annotations

import random

import pytest

from web_content_extractor_spark.operators.dedup_docs import (
    hamming_near_duplicates,
    simhash_near_duplicates,
)
from web_content_extractor_spark.operators.multimodal import (
    _average_hash_bits,
    average_hash,
    synth_bmp,
)


def _fps(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, simhash long")


def _brute(rows, max_distance):
    out = set()
    for i, (ia, fa) in enumerate(rows):
        for ib, fb in rows[i + 1 :]:
            d = bin((fa ^ fb) & ((1 << 64) - 1)).count("1")
            if d <= max_distance:
                a, b = sorted((ia, ib))
                out.add((a, b, d))
    return out


@pytest.mark.parametrize("max_distance", [0, 1, 3])
def test_band_join_matches_brute_force(spark, max_distance):
    """Soundness AND completeness vs an all-pairs popcount: the
    pigeonhole banding must find exactly the brute-force pair set."""
    rng = random.Random(7 + max_distance)
    rows = []
    base = rng.getrandbits(64)
    for i in range(120):
        if i % 4 == 0:
            # planted near-twins of a shared base: flip 0-4 bits
            fp = base
            for b in rng.sample(range(64), rng.randint(0, 4)):
                fp ^= 1 << b
        else:
            fp = rng.getrandbits(64)
        # store as two's-complement int64 (Spark bigint semantics)
        rows.append((i, fp - (1 << 64) if fp >= 1 << 63 else fp))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_duplicates(
            _fps(spark, rows), max_distance=max_distance
        ).collect()
    }
    assert got == _brute(rows, max_distance)


def test_band_join_narrow_fingerprint_with_remainder_band(spark):
    """bits=26 with 4 bands: widths 6/6/6/8 — the remainder band must
    still cover the top bits (a pair differing only in bit 25 at
    distance 1 is caught by some identical band)."""
    rows = [(1, 0), (2, 1 << 25), (3, 3), (4, (1 << 25) | 3)]
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_duplicates(
            _fps(spark, rows), max_distance=3, bits=26
        ).collect()
    }
    assert got == _brute(rows, 3)


def test_band_join_distance_zero_is_exact_bucketing(spark):
    rows = [(1, 42), (2, 42), (3, 43), (4, 42)]
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_duplicates(
            _fps(spark, rows), max_distance=0
        ).collect()
    }
    assert got == {(1, 2, 0), (1, 4, 0), (2, 4, 0)}


def test_band_join_rejects_bad_params(spark):
    df = _fps(spark, [(1, 0)])
    with pytest.raises(ValueError):
        hamming_near_duplicates(df, max_distance=-1)
    with pytest.raises(ValueError):
        hamming_near_duplicates(df, max_distance=3, bits=2)


def test_simhash_near_duplicates_end_to_end(spark):
    base = " ".join(f"tok{i}" for i in range(120))
    twin = base.replace("tok57", "changed")
    other = " ".join(f"other{i}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, base), (2, twin), (3, other), (4, base)],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_id_a, r.doc_id_b): r.hamming
        for r in simhash_near_duplicates(docs, max_distance=6).collect()
    }
    assert pairs[(1, 4)] == 0  # identical text -> identical simhash
    assert (1, 2) in pairs and pairs[(1, 2)] > 0  # one-token twin
    assert not any(3 in p for p in pairs)  # unrelated doc pairs nothing


def _media(spark, rows):
    return spark.createDataFrame(
        [(str(i), str(i), "image", "image/bmp", payload, None)
         for i, payload in rows],
        "media_id string, doc_id string, media_type string, mime string, "
        "payload binary, meta struct<width:int,height:int,duration_ms:int,"
        "n_bytes:bigint>",
    )


def test_average_hash_deterministic_and_twin_sensitive(spark):
    base = synth_bmp(11, 16, 16)
    twin = synth_bmp(11, 16, 16, flip_pixels=3)
    other = synth_bmp(99, 16, 16)
    out = {
        r.media_id: r
        for r in average_hash(
            _media(spark, [(0, base), (1, base), (2, twin), (3, other),
                           (4, b"not an image")])
        ).collect()
    }
    assert all(out[str(i)].decoded for i in range(4))
    assert not out["4"].decoded
    assert out["0"].phash == out["1"].phash  # identical bytes
    d_twin = bin((out["0"].phash ^ out["2"].phash) & ((1 << 64) - 1)).count("1")
    d_other = bin((out["0"].phash ^ out["3"].phash) & ((1 << 64) - 1)).count("1")
    assert d_twin <= 8 < d_other  # flip 3 of 256 px ~ <=3 grid cells


def test_average_hash_matches_direct_kernel_and_odd_sizes():
    from web_content_extractor_spark.operators.multimodal import _decode_bmp

    for seed, w, h in [(1, 16, 16), (2, 13, 9), (3, 5, 21), (4, 3, 3)]:
        img = _decode_bmp(synth_bmp(seed, w, h))
        assert img is not None and img.shape == (h, w, 3)
        ph = _average_hash_bits(img)
        assert -(1 << 63) <= ph < (1 << 63)
        assert ph == _average_hash_bits(img)  # pure function


def test_image_neardup_planted_twins_recall(spark):
    """20 base images, each with a 2-pixel-flip twin, plus 40 unrelated:
    the aHash -> band-join pipeline must pair every planted twin and
    no unrelated pair."""
    rows, want = [], set()
    for i in range(20):
        rows.append((2 * i, synth_bmp(1000 + i)))
        rows.append((2 * i + 1, synth_bmp(1000 + i, flip_pixels=2)))
        want.add((str(2 * i), str(2 * i + 1)))
    for j in range(40, 80):
        rows.append((j, synth_bmp(5000 + j)))
    hashes = average_hash(_media(spark, rows))
    got = {
        tuple(sorted((r.id_a, r.id_b), key=int))
        for r in hamming_near_duplicates(
            hashes, id_col="media_id", hash_col="phash", max_distance=6
        ).collect()
    }
    assert want <= got  # every planted twin found
    extras = got - want
    assert not any(int(a) >= 40 or int(b) >= 40 for a, b in extras)


def test_average_hash_rejects_oversized_grid(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        average_hash(_media(spark, [(0, synth_bmp(1))]), hash_size=16)
    with _pytest.raises(ValueError):
        _average_hash_bits(None, hash_size=9)


def test_simhash_pipeline_pairs_to_clusters_to_resolution(spark):
    """The full SimHash dedup pipeline composed end to end: Arrow
    simhash -> Manku band join -> connected components -> canonical
    resolution.  Docs 1/2/3 chain through near-dup pairs into ONE
    cluster whose longest member survives; doc 4 stands alone."""
    from pyspark.sql import functions as F

    from web_content_extractor_spark.operators.dedup_docs import (
        duplicate_clusters,
        resolve_clusters,
    )

    base = " ".join(f"tok{i}" for i in range(150))
    v2 = base.replace("tok10", "x10")               # near 1
    v3 = base.replace("tok10", "x10").replace("tok20", "x20") + " extra"
    docs = spark.createDataFrame(
        [(1, base), (2, v2), (3, v3),
         (4, " ".join(f"other{i}" for i in range(150)))],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    # measured simhash distances on this corpus: 1-2=9, 2-3=5, 1-3=12,
    # unrelated >=32 — threshold 10 chains the cluster TRANSITIVELY
    # (1-3 connect only through 2, exercising the components step)
    pairs = simhash_near_duplicates(docs, max_distance=10).select(
        F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b")
    )
    clusters = duplicate_clusters(docs, pairs=pairs)
    resolved = {
        r.doc_id: r for r in resolve_clusters(docs, clusters).collect()
    }
    assert {resolved[i].cluster_id for i in (1, 2, 3)} == {1}
    assert resolved[4].cluster_id == 4 and resolved[4].is_canonical
    # str.replace('tok10', 'x10') also hits tok100-109, so the variants
    # shrink by ~22 chars and doc 1 (the unmodified base) is the
    # longest member — the quality rule keeps it, drops the variants
    assert resolved[1].is_canonical
    assert not resolved[2].is_canonical and not resolved[3].is_canonical
    assert resolved[1].cluster_size == 3
