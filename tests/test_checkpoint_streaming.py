"""Checkpointed pyramid / mosaic resumability + streaming ingest tests."""

import glob
import json
import os
import shutil

import pytest

from geojson_vt_rs_spark.config import Options
from geojson_vt_rs_spark.operators.pipeline import read_geojson_features
from geojson_vt_rs_spark.plans.checkpoint import (
    CheckpointedPyramid,
    checkpointed_mosaic,
    _read_manifest,
)


def test_checkpointed_pyramid_and_resume(spark, tmp_path):
    out = str(tmp_path / "pyr")
    feats = read_geojson_features(spark, "/root/reference/fixtures/us-states.json")
    cp = CheckpointedPyramid(
        spark, Options(max_zoom=14, index_max_zoom=3, index_max_points=200)
    )
    s1 = cp.run(feats, out)
    # small inputs may fuse the whole subtree into level 0 — what matters
    # is the complete tile set landing in the store
    assert s1["levels"] >= 1
    assert s1["total_tiles"] == 17  # local-tiler ground truth at imz=3/imp=200
    for m in s1["manifests"]:
        assert m["n_tiles"] > 0
        assert "wall_sec" in m
    # every zoom 0..3 is populated
    import pyspark.sql.functions as F

    zs = {
        r["z"]
        for r in spark.read.parquet(os.path.join(out, "tiles"))
        .select("z")
        .distinct()
        .collect()
    }
    assert {0, 1, 2, 3} <= zs

    # simulate a crash after level 0: drop manifests for levels >= 1
    for p in sorted(glob.glob(os.path.join(out, "_manifests", "level_*.json")))[1:]:
        os.remove(p)
    # wipe tile parquet rows written after level 0 is NOT needed for the
    # resume logic test: resume re-appends; use a fresh dir to verify a
    # full re-run equals the summary instead
    s2 = cp.run(feats, out)
    assert s2["levels"] == s1["levels"]

    # the tiles table supports partition-pruned point lookups
    tile = cp.read_tile(out, 1, 0, 0).toPandas()
    assert len(tile) >= 0
    # warm repeat read hits the per-(z,x,y) memo (same persisted DF, no
    # new scan+rank plan), with identical rows
    again = cp.read_tile(out, 1, 0, 0)
    assert again is cp.read_tile(out, 1, 0, 0)
    assert again.toPandas().equals(tile)

    # fully-completed run resumes as a no-op
    s3 = cp.run(feats, out)
    assert s3["levels"] == s2["levels"]
    # publishing (even a no-op resume does not publish; force one by
    # invalidation check): a publish must evict the warm memo
    cp._invalidate_memos(out)
    fresh = cp.read_tile(out, 1, 0, 0)
    assert fresh is not again
    assert fresh.toPandas().equals(tile)


def test_checkpointed_mosaic_resume(spark, tmp_path):
    from geojson_vt_rs_spark.plans.spatial import with_cells, with_footprints
    from geojson_vt_rs_spark.sources.images import generate_images

    out = str(tmp_path / "mosaic")
    imgs = with_cells(with_footprints(generate_images(spark, 400, 4)), 5).persist()
    s1 = checkpointed_mosaic(imgs, 5, out, n_buckets=4)
    assert s1["buckets"] == 4
    assert s1["n_images"] > 0

    # resume skips completed buckets (manifests untouched)
    before = [_read_manifest(out, f"mosaic_bucket_{b}") for b in range(4)]
    s2 = checkpointed_mosaic(imgs, 5, out, n_buckets=4)
    after = [_read_manifest(out, f"mosaic_bucket_{b}") for b in range(4)]
    assert before == after
    assert s2["n_tiles"] == s1["n_tiles"]

    # partial resume: remove one bucket's manifest -> only it recomputes
    os.remove(os.path.join(out, "_manifests", "mosaic_bucket_2.json"))
    s3 = checkpointed_mosaic(imgs, 5, out, n_buckets=4)
    assert s3["n_tiles"] == s1["n_tiles"]
    imgs.unpersist()


def test_streaming_cell_counts(spark, tmp_path):
    from geojson_vt_rs_spark.plans.spatial import with_cells, with_footprints
    from geojson_vt_rs_spark.sources.images import generate_images
    from geojson_vt_rs_spark.streaming.ingest import stream_cell_counts

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    imgs = generate_images(spark, 300, 4)
    imgs.write.parquet(src)

    stream_cell_counts(spark, src, out, ckpt, zoom=5)

    got = spark.read.parquet(out)
    batch = (
        with_cells(with_footprints(spark.read.parquet(src)), 5)
        .groupBy("cx", "cy")
        .count()
    )
    got_total = got.agg({"n": "sum"}).collect()[0][0]
    assert got_total == 300
    assert got.select("cx", "cy").distinct().count() == batch.count()


def test_checkpointed_get_tile_drilldown(spark, tmp_path):
    """Parquet-store get_tile: memo hit, drill-down miss (creates and
    persists new tiles), and EMPTY result for feature-less regions —
    golden-compared against the in-memory index."""
    import json as _json

    from geojson_vt_rs_spark.plans.pyramid import SparkGeoJSONVT

    out = str(tmp_path / "pyr2")
    feats = read_geojson_features(spark, "/root/reference/fixtures/us-states.json")
    opts = Options()  # index_max_zoom=5, default stops at z0 leaf
    cp = CheckpointedPyramid(spark, opts)
    cp.run(feats, out)

    mem = SparkGeoJSONVT(spark, feats, opts)  # adaptive local reference

    # drill-down miss -> must match the in-memory engine's tile exactly
    got = cp.get_tile(out, 7, 37, 48).toPandas()
    want = mem.get_tile(7, 37, 48)
    assert len(got) == len(want.features)
    for i, tf in enumerate(want.features):
        row = got[got.feature_idx == i].iloc[0]
        assert row["type"] == tf["type"]
        assert _json.loads(row["geometry_json"]) == tf["geometry"]

    # now a memo hit (persisted by the drill) — identical
    again = cp.get_tile(out, 7, 37, 48).toPandas()
    assert len(again) == len(got)

    # feature-less region -> empty tile
    empty = cp.get_tile(out, 11, 800, 400).toPandas()
    assert len(empty) == 0


def test_checkpointed_pyramid_golden_corpus(spark, tmp_path):
    """The PARQUET write path must reproduce the us-states golden corpus
    exactly: read every tile back from the store and compare to the
    fixture (same check the in-memory index passes)."""
    import json as _json

    import pyspark.sql.functions as F

    from conftest import fixture_path, parse_jsontiles

    out = str(tmp_path / "pyrg")
    feats = read_geojson_features(spark, fixture_path("us-states.json"))
    cp = CheckpointedPyramid(
        spark, Options(max_zoom=14, index_max_zoom=7, index_max_points=200)
    )
    s = cp.run(feats, out)
    expected = parse_jsontiles(fixture_path("us-states-tiles.json"))

    all_rows = spark.read.parquet(os.path.join(out, "tiles")).toPandas()
    # every tile (incl. feature-less ones — the fixture has empty tiles
    # like z4-3-4) appears via its stats row
    actual = {
        f"z{int(r.z)}-{int(r.x)}-{int(r.y)}": []
        for r in all_rows[all_rows.feature_idx < 0].itertuples(index=False)
    }
    # feature rows carry the persisted order keys (feature_idx is derived
    # at read time by read_tile); sort here exactly as read_tile ranks
    rows = all_rows[all_rows["type"].notna()]
    from geojson_vt_rs_spark.core.geom import GEOM_MULTIPOLYGON

    for (z, x, y), grp in rows.groupby(["z", "x", "y"]):
        feats_c = []
        for r in grp.sort_values(
            ["world_copy", "feature_seq", "slice_path", "sub_idx"]
        ).itertuples(index=False):
            geom = _json.loads(r.geometry_json)
            if int(r.kind) == GEOM_MULTIPOLYGON:
                geom = [ring for poly in geom for ring in poly]
            if int(r.type) == 1:
                geom = [[float(p[0]), float(p[1])] for p in geom]
            else:
                geom = [[[float(p[0]), float(p[1])] for p in part] for part in geom]
            tags = None if r.tags_json is None else _json.loads(r.tags_json)
            feats_c.append(
                (int(r.type), geom, tags,
                 r.tile_id_str if isinstance(r.tile_id_str, str) else None,
                 None)
            )
        actual[f"z{int(z)}-{int(x)}-{int(y)}"] = feats_c

    # expected corpus covers only non-empty tiles
    assert set(expected.keys()) <= set(actual.keys())
    for key in expected:
        assert actual[key] == expected[key], f"tile {key}"
    # tiles absent from the fixture must be feature-less in the store
    for key in set(actual.keys()) - set(expected.keys()):
        assert actual[key] == [], key


def test_streaming_replay_idempotent(spark, tmp_path):
    """Simulated at-least-once replay: wiping the stream checkpoint makes
    availableNow reprocess the whole backlog under the same epoch ids —
    the per-epoch overwrite sink must leave totals unchanged (no
    double-append)."""
    import shutil

    from geojson_vt_rs_spark.sources.images import generate_images
    from geojson_vt_rs_spark.streaming.ingest import stream_cell_counts

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    generate_images(spark, 200, 4).write.parquet(src)

    stream_cell_counts(spark, src, out, ckpt, zoom=5)
    first = spark.read.parquet(out).agg({"n": "sum"}).collect()[0][0]
    assert first == 200

    shutil.rmtree(ckpt)  # lose the commit log -> full replay
    stream_cell_counts(spark, src, out, ckpt, zoom=5)
    again = spark.read.parquet(out).agg({"n": "sum"}).collect()[0][0]
    assert again == 200


def test_checkpointed_exactly_once_after_crash(spark, tmp_path):
    """Kill-and-resume with NO reader-side dedupe: simulate both crash
    windows of the level commit protocol — (a) after publish, before
    manifest (level dir exists, manifest missing) and (b) mid-staging
    (orphan staging dir) — the resumed store must hold zero duplicate
    (z,x,y,feature_idx) keys and byte-identical content."""
    import pyspark.sql.functions as F

    out = str(tmp_path / "pyr_xonce")
    feats = read_geojson_features(
        spark, "/root/reference/fixtures/us-states.json"
    )
    # tiny fuse bound forces true per-level distributed processing so the
    # run writes several level commits to crash between
    cp = CheckpointedPyramid(
        spark,
        Options(
            max_zoom=14, index_max_zoom=3, index_max_points=200,
            fuse_max_points=1,
        ),
    )
    s1 = cp.run(feats, out)
    assert s1["levels"] >= 2  # need a real multi-level run for the test

    key_cols = ["z", "x", "y", "world_copy", "feature_seq", "slice_path",
                "sub_idx"]

    def snapshot():
        return (
            spark.read.parquet(os.path.join(out, "tiles"))
            .select(
                "z", "x", "y", "feature_idx", "type", "world_copy",
                "feature_seq", "slice_path", "sub_idx", "geometry_json",
                "tags_json",
            )
            .sort(*key_cols, "feature_idx", "geometry_json")
            .toPandas()
        )

    def assert_no_dupes(pdf):
        keyed = pdf[pdf["type"].notna()]
        assert not keyed.duplicated(subset=key_cols).any()

    base = snapshot()
    assert_no_dupes(base)

    # (a) crash after publish, before manifest: kill the LAST level's
    # manifest but leave its published dir in place
    last = s1["levels"] - 1
    os.remove(os.path.join(out, "_manifests", f"level_{last}.json"))
    # (b) plus an orphan staging dir from a killed write
    stg = os.path.join(out, "_staging", f"tiles_level_{last}")
    os.makedirs(stg, exist_ok=True)
    with open(os.path.join(stg, "garbage.bin"), "wb") as fh:
        fh.write(b"partial write")

    s2 = cp.run(feats, out)
    assert s2["levels"] == s1["levels"]
    assert s2["total_tiles"] == s1["total_tiles"]
    resumed = snapshot()
    assert_no_dupes(resumed)
    assert base.equals(resumed)
    assert not os.path.exists(stg)


def test_streaming_stateful_dedupe(spark, tmp_path):
    """applyInPandasWithState dedupe: first occurrence per phash wins
    across micro-batches AND across query restarts (state checkpointed);
    replayed epochs stay exactly-once via the per-epoch overwrite sink."""
    import pandas as pd

    from geojson_vt_rs_spark.sources.images import generate_images
    from geojson_vt_rs_spark.streaming.stateful import stream_dedupe_images

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # two files -> two micro-batches (maxFilesPerTrigger=1) with
    # overlapping phashes across them
    generate_images(spark, 150, 2).write.parquet(src + "/f1")
    spark.read.parquet(src + "/f1").write.mode("append").parquet(src)
    stream_dedupe_images(spark, src, out, ckpt)
    first = spark.read.parquet(out).toPandas()
    want_phashes = {
        r["phash"]
        for r in generate_images(spark, 150, 2).select("phash").collect()
    }
    assert set(first["phash"]) == want_phashes
    assert not first["phash"].duplicated().any()
    # streaming dedupe keeps the FIRST-ARRIVED representative: each
    # emitted image_id must belong to its phash group (batch order
    # determines which member, so global-min is not guaranteed)
    members = {}
    for r in generate_images(spark, 150, 2).select(
        "phash", "image_id"
    ).collect():
        members.setdefault(r["phash"], set()).add(r["image_id"])
    for ph, iid in zip(first["phash"], first["image_id"]):
        assert iid in members[ph]

    # restart with MORE data: rows 0..149 repeat + 150..299 are new;
    # only never-seen phashes may be emitted
    g2 = generate_images(spark, 300, 2)
    g2.write.mode("append").parquet(src)
    stream_dedupe_images(spark, src, out, ckpt)
    both = spark.read.parquet(out).toPandas()
    assert not both["phash"].duplicated().any()
    all_phashes = {r["phash"] for r in g2.select("phash").collect()}
    assert set(both["phash"]) == all_phashes


def test_streaming_watermarked_windows_drop_late(spark, tmp_path):
    """Watermarked tumbling windows (append mode): a row arriving after
    the watermark passed its window's end is DROPPED — the closed
    window's count excludes it; an in-watermark straggler still counts."""
    import datetime as dt

    from geojson_vt_rs_spark.streaming.ingest import (
        EVENT_SCHEMA,
        stream_windowed_event_counts,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def rows(*ts_hours):
        base = dt.datetime(2026, 1, 1)
        return [
            (i, base + dt.timedelta(hours=h), 1, "click", 1.0, None)
            for i, h in enumerate(ts_hours)
        ]

    # run 1: hours 0.5, 1.5, 5.0 -> watermark persists in the stream
    # checkpoint as 5h - 1h = 4h, closing the [0,1) and [1,2) windows
    spark.createDataFrame(rows(0.5, 1.5, 5.0), EVENT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    stream_windowed_event_counts(spark, src, out, ckpt)
    got1 = {
        r["win_start"].hour: r["n"]
        for r in spark.read.parquet(out).collect()
    }
    assert got1.get(0) == 1 and got1.get(1) == 1
    assert 5 not in got1  # its window end is past the watermark

    # run 2 (resumes the checkpointed watermark=4h): a LATE row for hour
    # 0.7 (window closed -> DROPPED) and an in-watermark row for 4.5
    spark.createDataFrame(rows(0.7, 4.5), EVENT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    stream_windowed_event_counts(spark, src, out, ckpt)
    got2 = {
        r["win_start"].hour: r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # closed windows unchanged: the late 0.7 row was dropped
    assert got2.get(0) == 1
    assert got2.get(1) == 1
    # [4,5) and [5,6) still open (watermark stays 4h; 4.5 is buffered)
    assert 4 not in got2 and 5 not in got2

    # run 3 — the EXACT allowed-lateness boundary: with watermark=4h, a
    # row at 3.5 falls in [3,4) whose end EQUALS the watermark -> the
    # window is already finalized, the row is dropped (window.end <=
    # watermark is the eviction predicate).  6.5 advances the watermark
    # to 5.5, which closes [4,5) and emits the buffered 4.5 row; [5,6)
    # (end 6 > 5.5) stays open.
    spark.createDataFrame(rows(3.5, 6.5), EVENT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    stream_windowed_event_counts(spark, src, out, ckpt)
    got3 = {
        r["win_start"].hour: r["n"]
        for r in spark.read.parquet(out).collect()
    }
    assert 3 not in got3  # boundary row dropped: end == watermark
    assert got3.get(4) == 1  # straggler emitted once the window closed
    assert 5 not in got3 and 6 not in got3  # still open
    assert got3.get(0) == 1 and got3.get(1) == 1  # history untouched


def test_drilldown_crash_window_retry(spark, tmp_path):
    """get_tile drill-down commit protocol: simulate a crash AFTER the
    leaves rename but BEFORE the tiles rename (tiles is the commit
    point) — a retried get_tile must recompute and return the exact
    tile with no duplicate rows."""
    import shutil as _sh

    from geojson_vt_rs_spark.plans.pyramid import SparkGeoJSONVT

    out = str(tmp_path / "pyr_dc")
    feats = read_geojson_features(
        spark, "/root/reference/fixtures/us-states.json"
    )
    opts = Options()
    cp = CheckpointedPyramid(spark, opts)
    cp.run(feats, out)

    # full drill (ground truth)
    want = cp.get_tile(out, 7, 37, 48).toPandas()
    mem = SparkGeoJSONVT(spark, feats, opts)
    assert len(want) == len(mem.get_tile(7, 37, 48).features)

    # roll back to the crash window: remove the committed drill tiles dir
    # but LEAVE the drill leaves dir (as if we died between the renames)
    _sh.rmtree(os.path.join(out, "tiles", "level=drill_7_37_48"))
    again = cp.get_tile(out, 7, 37, 48).toPandas()
    assert len(again) == len(want)
    assert not again.duplicated(subset=["feature_idx"]).any()


def test_iceberg_sink_gating(spark, tmp_path):
    """iceberg=True routes level commits through snapshot commits when
    pyiceberg exists; without it the constructor path raises a clear
    ImportError at first use and the default protocol is unaffected."""
    from geojson_vt_rs_spark.plans.iceberg_sink import iceberg_available

    out = str(tmp_path / "pyr_ib")
    feats = read_geojson_features(
        spark, "/root/reference/fixtures/us-states.json"
    )
    opts = Options(max_zoom=14, index_max_zoom=3, index_max_points=200)
    cp = CheckpointedPyramid(spark, opts, iceberg=True)
    if not iceberg_available():
        with pytest.raises(ImportError, match="pyiceberg"):
            cp.run(feats, out)
        # the default (rename+JSON) protocol is untouched by the flag
        s = CheckpointedPyramid(spark, opts).run(feats, out)
        assert s["total_tiles"] == 17
        return
    # with pyiceberg present: full roundtrip + snapshot-backed resume
    s1 = cp.run(feats, out)
    assert s1["total_tiles"] == 17
    # wipe the JSON manifest cache; resume must re-derive it from the
    # snapshot log and skip all committed levels
    shutil.rmtree(os.path.join(out, "_manifests"))
    s2 = cp.run(feats, out)
    assert s2["total_tiles"] == s1["total_tiles"]


def test_iceberg_sink_snapshot_branch(spark, tmp_path, monkeypatch):
    """Execute the SNAPSHOT-COMMIT branch of the Iceberg sink (absent
    pyiceberg normally leaves it untested) against a faithful API double
    whose catalog state is durable on disk: full run commits one
    snapshot per level with the manifest in table properties; wiping the
    JSON manifest cache must resume purely from the snapshot log; an
    all-empty commit_level call (zero parquet files, no table yet) must
    create the table from the engine schema instead of crashing."""
    from geojson_vt_rs_spark.plans import iceberg_sink

    if iceberg_sink.iceberg_available():
        pytest.skip("real pyiceberg present; gating test covers it")
    import fake_pyiceberg

    fake_pyiceberg.install(monkeypatch)
    assert iceberg_sink.iceberg_available()

    out = str(tmp_path / "pyr_ibs")
    feats = read_geojson_features(
        spark, "/root/reference/fixtures/us-states.json"
    )
    opts = Options(max_zoom=14, index_max_zoom=3, index_max_points=200)
    cp = CheckpointedPyramid(spark, opts, iceberg=True)
    s1 = cp.run(feats, out)
    assert s1["total_tiles"] == 17

    # snapshots carry the level manifests in table properties
    sink = cp._sink(out)
    for lvl in range(s1["levels"]):
        m = sink.read_manifest("tiles", lvl)
        assert m is not None and m["level"] == lvl

    # wipe the JSON manifest cache: resume must re-derive every level
    # from the snapshot log (no recompute -> same totals, cache restored)
    shutil.rmtree(os.path.join(out, "_manifests"))
    s2 = CheckpointedPyramid(spark, opts, iceberg=True).run(feats, out)
    assert s2["total_tiles"] == s1["total_tiles"]
    assert s2["levels"] == s1["levels"]
    assert os.path.isdir(os.path.join(out, "_manifests"))

    # all-empty level commit on a fresh store: engine-schema fallback
    from geojson_vt_rs_spark.plans.iceberg_sink import IcebergTileSink

    empty_store = str(tmp_path / "pyr_ib_empty")
    os.makedirs(empty_store)
    sink2 = IcebergTileSink(empty_store)
    sink2.commit_level("tiles", "", dict(level=0, n_tiles=0))
    assert sink2.read_manifest("tiles", 0) == {"level": 0, "n_tiles": 0}


def test_multi_drill_divergent_targets(spark, tmp_path):
    """Two drills whose paths share a prefix then diverge: every drilled
    tile matches the in-memory tiler, and cousin tiles created by the
    first drill are not duplicated by the second (anti-join guard)."""
    from geojson_vt_rs_spark.plans.pyramid import SparkGeoJSONVT

    out = str(tmp_path / "pyr_md")
    feats = read_geojson_features(
        spark, "/root/reference/fixtures/us-states.json"
    )
    opts = Options()
    cp = CheckpointedPyramid(spark, opts)
    cp.run(feats, out)
    mem = SparkGeoJSONVT(spark, feats, opts)

    # paths share z0..z5 then diverge (37//2=18 vs 38//2=19 at z6)
    for tz, tx, ty in [(7, 37, 48), (7, 38, 48), (8, 74, 96)]:
        got = cp.get_tile(out, tz, tx, ty).toPandas()
        want = mem.get_tile(tz, tx, ty).features
        assert len(got) == len(want), (tz, tx, ty)
        assert not got.duplicated(subset=["feature_idx"]).any()
        for i, tf in enumerate(want):
            row = got.iloc[i]
            assert json.loads(row["geometry_json"]) == tf["geometry"]
    # the shared-prefix tiles exist exactly once in the store
    import pyspark.sql.functions as Fx

    dup = (
        spark.read.parquet(os.path.join(out, "tiles"))
        .filter(Fx.col("feature_idx") == -1)
        .groupBy("z", "x", "y")
        .count()
        .filter(Fx.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_store_routes_identical_tiles(spark, tmp_path):
    """The raw-gated level-0 routes (fuse-all subtree vs optimistic
    render+split levels) lay the store out differently (one fused level
    vs per-zoom levels) but every tile read back must be identical —
    same tile set, same ordered features per tile."""
    feats = read_geojson_features(
        spark, "/root/reference/fixtures/us-states.json"
    )
    o_fuse = Options(max_zoom=14, index_max_zoom=3, index_max_points=200)
    o_opt = Options(max_zoom=14, index_max_zoom=3, index_max_points=200,
                    fuse_max_points=1)
    out_a = str(tmp_path / "fuse")
    out_b = str(tmp_path / "opt")
    cp_a = CheckpointedPyramid(spark, o_fuse)
    cp_b = CheckpointedPyramid(spark, o_opt)
    sa = cp_a.run(feats, out_a)
    sb = cp_b.run(feats, out_b)
    assert sa["levels"] == 1  # raw 3539 <= fuse_bound -> one fused level
    assert sb["levels"] >= 2  # optimistic split -> real per-zoom levels
    assert sa["total_tiles"] == sb["total_tiles"] == 17

    keys_a = sorted(cp_a._tile_keys(out_a))
    keys_b = sorted(cp_b._tile_keys(out_b))
    assert keys_a == keys_b

    for z, x, y in keys_a:
        ta = cp_a.read_tile(out_a, z, x, y).select(
            "feature_idx", "type", "kind", "geometry_json", "tags_json"
        ).toPandas()
        tb = cp_b.read_tile(out_b, z, x, y).select(
            "feature_idx", "type", "kind", "geometry_json", "tags_json"
        ).toPandas()
        assert ta.values.tolist() == tb.values.tolist(), (z, x, y)


def test_drill_tile_sink_matches_yield_path(spark, tmp_path):
    """drill_descend_stage's in-kernel tile sink (tile_sink=...) must
    write EXACTLY the rows the yield-path's Spark-side write produced:
    same store schema, same row set, existing-tile exclusion applied,
    and idempotent under re-execution (deterministic filenames +
    atomic rename — a retried/duplicated task overwrites with
    identical content)."""
    import glob
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from geojson_vt_rs_spark.operators.pipeline import (
        RS_CAGG,
        RS_LEAF,
        RS_RENDER,
        drill_descend_stage,
    )
    from geojson_vt_rs_spark.plans.pyramid import TILED_COLS

    out = str(tmp_path / "sinkstore")
    feats = read_geojson_features(
        spark, "/root/reference/fixtures/us-states.json"
    )
    opts = Options()
    cp = CheckpointedPyramid(spark, opts)
    cp.run(feats, out)

    leaf = spark.read.parquet(os.path.join(out, "leaves")).filter(
        "z = 0 and x = 0 and y = 0"
    )
    src = leaf.select(*TILED_COLS).repartition(4)
    root, target = (0, 0, 0), (7, 37, 48)
    existing = {(0, 0, 0), (5, 9, 11)}  # ancestor + a fake prior cousin

    # yield path: render rows cross the boundary, shaped by the former
    # Spark-side write expression
    plain = drill_descend_stage(src, opts, root, target).persist()
    want_tiles = (
        plain.filter(
            (F.col("row_kind") == RS_RENDER) & (F.col("sub_idx") >= 0)
        )
        .select(
            "z", "x", "y",
            F.lit(None).cast("int").alias("feature_idx"),
            "type", "kind", "geometry_json", "tags_json",
            F.col("id_str").alias("tile_id_str"),
            F.col("id_num").alias("tile_id_num"),
            F.col("id_float").alias("tile_id_float"),
            F.lit(None).cast("int").alias("tile_num_points"),
            F.lit(None).cast("int").alias("tile_num_simplified"),
            F.lit("drill").alias("action"),
            "world_copy", "feature_seq", "slice_path", "sub_idx",
        )
        .filter(
            ~F.struct("z", "x", "y").isin(
                [F.struct(F.lit(a), F.lit(b), F.lit(c)) for a, b, c in existing]
            )
        )
        .toPandas()
    )
    plain_kinds = {
        r["row_kind"]: r["n"]
        for r in plain.groupBy("row_kind").agg(F.count("*").alias("n")).collect()
    }
    plain.unpersist()

    # sink path
    stg = str(tmp_path / "stg_tiles")
    sunk = drill_descend_stage(
        src, opts, root, target,
        tile_sink=dict(path=stg, existing=existing),
    ).persist()
    sunk_kinds = {
        r["row_kind"]: r["n"]
        for r in sunk.groupBy("row_kind").agg(F.count("*").alias("n")).collect()
    }
    sunk.unpersist()

    # the sink output yields NO render rows; leaves/cagg identical
    assert RS_RENDER not in sunk_kinds
    assert sunk_kinds[RS_LEAF] == plain_kinds[RS_LEAF]
    assert sunk_kinds[RS_CAGG] == plain_kinds[RS_CAGG]

    got_tiles = spark.read.parquet(stg).toPandas()
    cols = sorted(want_tiles.columns)
    assert sorted(got_tiles.columns) == cols
    key = ["z", "x", "y", "world_copy", "feature_seq", "slice_path", "sub_idx"]
    a = got_tiles[cols].sort_values(key, ignore_index=True)
    b = want_tiles[cols].sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=True)
    # exclusion applied: no row for any existing tile
    assert not set(
        map(tuple, got_tiles[["z", "x", "y"]].drop_duplicates().to_numpy())
    ) & existing

    # idempotence: re-executing the pass overwrites the same files with
    # identical content (no duplicates, no leftover visible tmp files)
    files1 = sorted(glob.glob(f"{stg}/z=*/part-*.parquet"))
    drill_descend_stage(
        src, opts, root, target,
        tile_sink=dict(path=stg, existing=existing),
    ).write.format("noop").mode("overwrite").save()
    files2 = sorted(glob.glob(f"{stg}/z=*/part-*.parquet"))
    assert files1 == files2
    again = spark.read.parquet(stg).toPandas()
    c = again[cols].sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(c, b, check_dtype=True)
