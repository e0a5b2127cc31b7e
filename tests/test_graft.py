"""Graft pipeline tests: PNG codec, synthetic images, cell assignment,
PIP join vs brute force, kNN join, mosaic PSNR + caption byte-equality."""

import json

import numpy as np
import pytest

from geojson_vt_rs_spark.sources.images import (
    compute_phash,
    decode_image,
    generate_images,
    make_image_row,
    make_pixels,
)
from geojson_vt_rs_spark.sources.png import decode_png, encode_png, psnr


def test_png_roundtrip():
    rgb = make_pixels(7, 24, 16)
    data = encode_png(rgb)
    back = decode_png(data)
    assert np.array_equal(rgb, back)
    assert psnr(rgb, back) == float("inf")


def test_image_row_deterministic():
    a = make_image_row(42)  # i%4 == 2 -> jpeg row
    b = make_image_row(42)
    assert a["fmt"] == "jpeg"
    assert a["bytes"] == b["bytes"]
    assert a["phash"] == b["phash"]
    assert a["caption"] == "caption for img00000042"
    # phash is the INGEST-time hash of the source pixels; jpeg is lossy,
    # so the decoded image's hash may drift by a few bits but stays near
    rgb = decode_image(a["bytes"], a["w"], a["h"], a["fmt"])
    drift = bin((compute_phash(rgb) ^ a["phash"]) & ((1 << 64) - 1)).count("1")
    assert drift <= 8, drift
    c = make_image_row(41)  # png row: lossless, phash exact
    rgb_c = decode_image(c["bytes"], c["w"], c["h"], c["fmt"])
    assert compute_phash(rgb_c) == c["phash"]


def test_jpeg_roundtrip():
    from geojson_vt_rs_spark.sources.jpeg import encode_jpeg
    from geojson_vt_rs_spark.sources.png import psnr

    for i, w, h in [(2, 16, 24), (6, 32, 32), (10, 24, 16), (14, 17, 9)]:
        rgb = make_pixels(i, w, h)
        back = decode_image(encode_jpeg(rgb), w, h, "jpeg")
        assert back.shape == rgb.shape
        assert psnr(rgb, back) >= 40.0  # builder-brief fidelity gate
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff", 8, 8, "jpeg")  # truncated
    with pytest.raises(ValueError):
        decode_image(b"nonsense", 8, 8, "jpeg")


N = 2000
ZOOM = 5


@pytest.fixture(scope="module")
def images(spark):
    from geojson_vt_rs_spark.plans.spatial import with_cells, with_footprints

    df = with_cells(with_footprints(generate_images(spark, N, 8)), ZOOM)
    df.persist().count()
    return df


def test_images_table_shape(spark, images):
    assert images.count() == N
    row = images.filter("image_id = 'img00000042'").collect()[0]
    rgb = decode_image(bytes(row["bytes"]), row["w"], row["h"], row["fmt"])
    assert psnr(rgb, rgb) == float("inf")
    assert row["caption"] == "caption for img00000042"
    # footprints in range, cells in range
    agg = images.selectExpr(
        "min(lon) a", "max(lon) b", "min(lat) c", "max(lat) d",
        "min(cx) e", "max(cx) f", "min(cy) g", "max(cy) h",
    ).collect()[0]
    assert -180 <= agg["a"] and agg["b"] < 180.01
    assert -80.01 <= agg["c"] and agg["d"] < 80.01
    assert 0 <= agg["e"] and agg["f"] < (1 << ZOOM)
    assert 0 <= agg["g"] and agg["h"] < (1 << ZOOM)


def test_metro_skew_present(images):
    top = (
        images.groupBy("cx", "cy").count().orderBy("count", ascending=False).limit(3)
    ).collect()
    # ~30% of rows in 3 metro cells
    assert sum(r["count"] for r in top) > 0.25 * N


@pytest.fixture(scope="module")
def us_index(spark):
    from geojson_vt_rs_spark.config import Options
    from geojson_vt_rs_spark.operators.pipeline import read_geojson_features
    from geojson_vt_rs_spark.plans.pyramid import SparkGeoJSONVT

    # index_max_points=0 forces full split to ZOOM so every occupied
    # cell has its clipped tile polygons materialized
    feats = read_geojson_features(spark, "/root/reference/fixtures/us-states.json")
    return SparkGeoJSONVT(
        spark, feats, Options(index_max_zoom=ZOOM, index_max_points=0)
    )


def test_pip_join_vs_bruteforce(spark, images, us_index):
    from geojson_vt_rs_spark.plans.spatial import (
        pip_join,
        ray_cast_inside,
        tile_polygons_df,
    )

    polys = tile_polygons_df(spark, us_index, ZOOM)
    npolys = polys.count()
    assert npolys > 0
    got = pip_join(images, polys, ZOOM).toPandas()
    assert (got["id_str"].notna()).all() or len(got) == 0

    # brute force on the driver over every (point, polygon) pair
    pts = images.select("image_id", "mx", "my", "cx", "cy").toPandas()
    pl = polys.toPandas()
    expected = set()
    z2 = float(1 << ZOOM)
    for pr in pl.itertuples(index=False):
        sub = pts[(pts.cx == pr.x) & (pts.cy == pr.y)]
        if sub.empty:
            continue
        tx = (sub["mx"].to_numpy() * z2 - pr.x) * 4096
        ty = (sub["my"].to_numpy() * z2 - pr.y) * 4096
        inside = ray_cast_inside(tx, ty, json.loads(pr.rings_json))
        for iid in sub["image_id"].to_numpy()[inside]:
            expected.add((iid, pr.x, pr.y, pr.feature_idx))
    actual = {
        (r.image_id, r.cx, r.cy, r.feature_idx) for r in got.itertuples(index=False)
    }
    assert actual == expected
    assert len(actual) > 0  # metro NYC sits inside a us-states tile polygon
    # caption invariant: joined captions byte-equal the source formula
    for r in got.itertuples(index=False):
        assert r.caption == "caption for " + r.image_id


def test_knn_join(spark, images, us_index):
    from geojson_vt_rs_spark.plans.spatial import knn_neighbor_tiles

    centers = spark.createDataFrame(
        [
            (t.x, t.y)
            for t in us_index.get_internal_tiles().values()
            if t.z == ZOOM and t.features
        ],
        "x long, y long",
    )
    out = knn_neighbor_tiles(images, centers, ZOOM, k=3)
    pdf = out.toPandas()
    assert len(pdf) > 0
    g = pdf.groupby("image_id")["rank"].agg(["min", "max", "count"])
    assert (g["min"] == 1).all()
    assert (g["count"] <= 3).all()
    # ranks are distance-sorted per image
    for _, grp in pdf.groupby("image_id"):
        d = grp.sort_values("rank")["d2"].to_numpy()
        assert (np.diff(d) >= 0).all()


def test_mosaic_psnr_and_lineage(spark, images):
    from geojson_vt_rs_spark.plans.spatial import (
        SLOT_PX,
        TILE_PX,
        mosaic_tiles,
        nn_resample,
    )

    tiles = mosaic_tiles(images, ZOOM).toPandas()
    assert len(tiles) > 0
    assert tiles["n_images"].sum() > 0
    per = TILE_PX // SLOT_PX

    src = {r["image_id"]: r for r in images.collect()}
    checked = 0
    for t in tiles.head(5).itertuples(index=False):
        canvas = decode_png(bytes(t.tile_png))
        manifest = json.loads(t.manifest_json)
        assert t.n_images == len(manifest)
        for s, iid in list(manifest.items())[:8]:
            s = int(s)
            r = src[iid]
            rgb = decode_image(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
            want = nn_resample(rgb)
            ry, rx = (s // per) * SLOT_PX, (s % per) * SLOT_PX
            slot = canvas[ry : ry + SLOT_PX, rx : rx + SLOT_PX]
            assert psnr(slot, want) >= 40.0
            assert np.array_equal(slot, want)  # PNG is lossless: exact
            checked += 1
    assert checked > 0


def test_mosaic_decode_early_identical(spark):
    """decode_early moves decode+resample before the shuffle (the
    large-image scale path) — output tiles must be byte-identical to the
    default decode-in-render path."""
    from geojson_vt_rs_spark.plans.spatial import (
        mosaic_tiles,
        with_cells,
        with_footprints,
    )
    from geojson_vt_rs_spark.sources.images import generate_images

    imgs = with_cells(with_footprints(generate_images(spark, 600, 4)), 5)
    imgs = imgs.persist()
    a = {
        (r["x"], r["y"]): (bytes(r["tile_png"]), r["manifest_json"])
        for r in mosaic_tiles(imgs, 5, decode_early=False).collect()
    }
    b = {
        (r["x"], r["y"]): (bytes(r["tile_png"]), r["manifest_json"])
        for r in mosaic_tiles(imgs, 5, decode_early=True).collect()
    }
    imgs.unpersist()
    assert a == b


def test_mosaic_unbroadcast_survivors_identical(spark):
    """Above MOSAIC_BROADCAST_MAX_ZOOM the survivor-id join drops its
    broadcast hint (worst-case 4^zoom * SLOTS rows would blow the
    broadcast ceiling at z8+) and lets AQE pick the strategy — output
    must be byte-identical on both sides of the gate, and the hint-free
    plan must not carry the explicit broadcast hint."""
    from geojson_vt_rs_spark.plans.spatial import (
        MOSAIC_BROADCAST_MAX_ZOOM,
        mosaic_tiles,
        with_cells,
        with_footprints,
    )
    from geojson_vt_rs_spark.sources.images import generate_images

    imgs = with_cells(with_footprints(generate_images(spark, 400, 4)), 5)
    imgs = imgs.persist()

    def tiles(**kw):
        return {
            (r["x"], r["y"]): (bytes(r["tile_png"]), r["manifest_json"])
            for r in mosaic_tiles(imgs, 5, **kw).collect()
        }

    a = tiles(broadcast_survivors=True)
    b = tiles(broadcast_survivors=False)
    assert a == b and len(a) > 0
    # the default gate: low zoom hints broadcast, high zoom does not
    lo = mosaic_tiles(imgs, 5)
    hi = mosaic_tiles(imgs, MOSAIC_BROADCAST_MAX_ZOOM + 1)
    lo_plan = lo._jdf.queryExecution().optimizedPlan().toString()
    hi_plan = hi._jdf.queryExecution().optimizedPlan().toString()
    assert "rightHint=(strategy=broadcast)" in lo_plan
    assert "strategy=broadcast" not in hi_plan
    imgs.unpersist()
