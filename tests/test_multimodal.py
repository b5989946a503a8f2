

def test_media_phash_near_dup_finds_identical_payloads(spark):
    from vector_db_spark.operators.multimodal import (
        media_hash60,
        media_near_dup_pairs,
    )

    rows = [
        (1, "image", b"same-bytes"),
        (2, "image", b"same-bytes"),      # exact dup of 1
        (3, "image", b"other-bytes"),
        (4, "audio", b"same-bytes"),      # wrong kind: excluded
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    h = {r.media_id: r.phash for r in media_hash60(df, decoder="fake").collect()}
    assert h[1] == h[2] != h[3] and 4 not in h
    pairs = media_near_dup_pairs(df, decoder="fake").collect()
    assert [(r.media_a, r.media_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_media_phash_strict_decoder_raises(spark):
    import pytest as _pytest

    from vector_db_spark.operators.multimodal import media_hash60

    df = spark.createDataFrame(
        [(1, "image", b"x")], "media_id long, kind string, payload binary"
    )
    with _pytest.raises(NotImplementedError, match="PIL"):
        media_hash60(df, decoder="strict")
