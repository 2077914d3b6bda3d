"""Multimodal plumbing: binary schema contract, Arrow batch shapes (1→1 and
1→N), determinism, and payload-column pruning."""

from __future__ import annotations

from pyspark.sql.types import ArrayType, BinaryType, FloatType

from tweets_elastic_spark.functions.multimodal import (
    attach_payload,
    decode_assets,
    extract_features,
    sample_frames,
)
from tweets_elastic_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _assets(spark):
    return attach_payload(load_table(spark, SF, "documents"))


def test_payload_is_binary_with_modality(spark):
    assets = _assets(spark)
    schema = {f.name: f.dataType for f in assets.schema.fields}
    assert isinstance(schema["payload"], BinaryType)
    mods = {r["modality"] for r in assets.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_metadata_matches_payload(spark):
    decoded = decode_assets(_assets(spark))
    rows = decoded.collect()
    assert len(rows) == 500
    r = rows[0]
    assert r["width"] == 1 + r["n_bytes"] % 640
    assert r["height"] == 1 + r["n_bytes"] % 480
    assert len(r["sha256"]) == 64


def test_features_fixed_dim_and_deterministic(spark):
    f1 = extract_features(_assets(spark), dim=16)
    schema = {f.name: f.dataType for f in f1.schema.fields}
    assert isinstance(schema["features"], ArrayType)
    assert isinstance(schema["features"].elementType, FloatType)
    a = {r["asset_id"]: list(r["features"]) for r in f1.collect()}
    b = {r["asset_id"]: list(r["features"]) for r in extract_features(_assets(spark), 16).collect()}
    assert a == b  # bit-stable across runs
    assert all(len(v) == 16 for v in a.values())
    assert all(-1.0 <= x <= 1.0 for v in a.values() for x in v)


def test_frame_sampling_one_to_n(spark):
    assets = _assets(spark)
    n_videos = assets.filter("modality = 'video'").count()
    frames = sample_frames(assets, n_frames=4)
    assert frames.count() == 4 * n_videos
    one = frames.filter("asset_id = 2").collect()  # doc 2 → video
    assert [r["frame_idx"] for r in sorted(one, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    offs = [r["byte_offset"] for r in sorted(one, key=lambda r: r["frame_idx"])]
    assert offs == sorted(offs) and offs[0] == 0


def test_metadata_plan_prunes_payload(spark):
    """Selecting only modality must not drag the payload column through the
    plan — at 100 TB the payload IS the data volume."""
    assets = _assets(spark)
    plan = assets.select("modality").distinct()._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
