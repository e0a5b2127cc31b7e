"""Golden-corpus and behavioral tests ported from the reference
(/root/reference/src/tests.rs:404-1043), run against the local core tiler.
Comparison is exact structural equality on (type, geometry, tags, id)."""

import json

import pytest

from geojson_vt_rs_spark.config import Options, TileOptions
from geojson_vt_rs_spark.core.tiler import EMPTY_TILE, GeoJSONVT, geojson_to_tile
from geojson_vt_rs_spark.sources.geojson import load_geojson, load_geojson_file

from conftest import emitted_to_canonical, fixture_path, parse_jsontile, parse_jsontiles


def _tile_canonical_from_file(name):
    with open(fixture_path(name)) as fh:
        return parse_jsontile(json.load(fh))


def gen_tiles(input_name, index_max_zoom, index_max_points, line_metrics):
    feats = load_geojson_file(fixture_path(input_name))
    index = GeoJSONVT(
        feats,
        Options(
            max_zoom=14,
            index_max_zoom=index_max_zoom,
            index_max_points=index_max_points,
            tile=TileOptions(line_metrics=line_metrics),
        ),
    )
    out = {}
    for tid, it in list(index.get_internal_tiles().items()):
        em = it.emitter
        key = f"z{em.z}-{em.x}-{em.y}"
        out[key] = emitted_to_canonical(index.get_tile(em.z, em.x, em.y))
    return out


CORPUS = [
    ("us-states.json", "us-states-tiles.json", 7, 200, False),
    ("dateline.json", "dateline-tiles.json", 7, 200, False),
    ("dateline.json", "dateline-metrics-tiles.json", 0, 10000, True),
    ("feature.json", "feature-tiles.json", 0, 10000, False),
    ("collection.json", "collection-tiles.json", 0, 10000, False),
    ("single-geom.json", "single-geom-tiles.json", 0, 10000, False),
]


@pytest.mark.parametrize("inp,exp,imz,imp,lm", CORPUS)
def test_tile_corpus(inp, exp, imz, imp, lm):
    actual = gen_tiles(inp, imz, imp, lm)
    expected = parse_jsontiles(fixture_path(exp))
    assert set(actual.keys()) == set(expected.keys())
    for key in expected:
        assert actual[key] == expected[key], f"tile {key} of {inp}"


def test_get_tile_us_states():
    feats = load_geojson_file(fixture_path("us-states.json"))
    index = GeoJSONVT(feats, Options())

    actual = emitted_to_canonical(index.get_tile(7, 37, 48))
    assert actual == _tile_canonical_from_file("us-states-z7-37-48.json")

    square = _tile_canonical_from_file("us-states-square.json")
    assert emitted_to_canonical(index.get_tile(9, 148, 192)) == square

    assert index.get_tile(11, 800, 400) is EMPTY_TILE
    assert index.get_tile(11, 800, 400) is EMPTY_TILE
    assert index.total == 37


def test_get_tile_generate_ids():
    feats = load_geojson_file(fixture_path("us-states.json"))
    index = GeoJSONVT(feats, Options(max_zoom=20, generate_id=True))
    tile = index.get_tile(7, 37, 48)
    assert tile.features[0]["id_num"] == 6
    actual = emitted_to_canonical(tile)
    assert actual == _tile_canonical_from_file("us-states-z7-37-48-gen-ids.json")


def test_get_tile_antimeridian_triangle():
    feats = load_geojson_file(fixture_path("dateline-triangle.json"))
    index = GeoJSONVT(feats, Options())
    for z, x, y in [(1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]:
        tile = index.get_tile(z, x, y)
        assert tile.num_points == tile.num_simplified
        assert len(tile.features) == 1, (z, x, y)


def test_get_tile_polygon_clipping_bug():
    feats = load_geojson_file(fixture_path("polygon-bug.json"))
    index = GeoJSONVT(feats, Options(tile=TileOptions(buffer=1024)))
    tile = index.get_tile(5, 19, 9)
    assert len(tile.features) == 1
    assert tile.num_points == 5
    expected = [[[3072.0, 3072.0], [5120.0, 3072.0], [5120.0, 5120.0],
                 [3072.0, 5120.0], [3072.0, 3072.0]]]
    assert tile.features[0]["geometry"] == expected
    assert tile.features[0]["type"] == 3


def test_get_tile_projection():
    import math

    feats = load_geojson_file(fixture_path("linestring.json"))
    index = GeoJSONVT(
        feats, Options(max_zoom=20, tile=TileOptions(extent=8192, tolerance=0.0))
    )
    coords = [
        (0, 0, 0), (1, 0, 0), (2, 0, 1), (3, 1, 3), (4, 2, 6), (5, 5, 12),
        (6, 10, 24), (7, 20, 49), (8, 40, 98), (9, 81, 197), (10, 163, 395),
        (11, 327, 791), (12, 655, 1583), (13, 1310, 3166), (14, 2620, 6332),
        (15, 5241, 12664), (16, 10482, 25329), (17, 20964, 50660),
        (18, 41929, 101320), (19, 83859, 202640), (20, 167719, 405281),
    ]
    for z, x, y in coords:
        tile = index.get_tile(z, x, y)
        assert tile.num_points == tile.num_simplified
        assert len(tile.features) == 1
        line = tile.features[0]["geometry"][0]
        assert len(line) == 2
        total = float(1 << z) * 8192.0

        def lon(p):
            return (8192.0 * x + p[0]) * 360.0 / total - 180.0

        def lat(p):
            y2 = 180.0 - (8192.0 * y + p[1]) * 360.0 / total
            return 360.0 / math.pi * math.atan(math.exp(y2 * math.pi / 180.0)) - 90.0

        tol = 0.1 / (1 + z)
        assert abs(lon(line[0]) - -122.41822421550751) <= tol
        assert abs(lat(line[0]) - 37.77852514599172) <= tol
        assert abs(lon(line[1]) - -122.41707086563109) <= tol
        assert abs(lat(line[1]) - 37.780424620898664) <= tol


def test_geojson_to_tile_simple():
    feats = load_geojson_file(fixture_path("single-tile.json"))
    tile = geojson_to_tile(feats, 12, 1171, 1566, TileOptions(), wrap_=False, clip_=False)
    assert len(tile.features) == 1
    tags = tile.features[0]["tags"]
    assert tags["name"] == "P Street Northwest - Massachusetts Avenue Northwest"


def test_geojson_to_tile_clips():
    feats = load_geojson_file(fixture_path("us-states.json"))
    tile = geojson_to_tile(feats, 12, 1171, 1566, TileOptions(), wrap_=False, clip_=True)
    assert len(tile.features) == 2
    assert tile.features[0]["tags"]["name"] == "District of Columbia"


def test_geojson_to_tile_metrics():
    feats = load_geojson_file(fixture_path("single-tile.json"))
    options = TileOptions(buffer=64, tolerance=3.0, line_metrics=True)
    eps = 1e-5

    tile_left = geojson_to_tile(feats, 13, 2342, 3133, options, wrap_=False, clip_=False)
    assert len(tile_left.features) == 1
    lt = tile_left.features[0]["tags"]
    assert abs(lt["mapbox_clip_start"] - 0.0) < 1e-12
    assert abs(lt["mapbox_clip_end"] - 0.42103) < eps

    tile_right = geojson_to_tile(feats, 13, 2343, 3133, options, wrap_=False, clip_=False)
    assert len(tile_right.features) == 1
    rt = tile_right.features[0]["tags"]
    assert abs(rt["mapbox_clip_start"] - 0.40349) < eps
    assert abs(rt["mapbox_clip_end"] - 1.0) < 1e-12


def test_geojson_to_tile_clip_vertex_on_tile_border():
    data = {
        "type": "Feature",
        "geometry": {
            "type": "LineString",
            "coordinates": [
                [-77.031373697916663, 38.895516493055553],
                [-77.01416015625, 38.887532552083336],
                [-76.99, 38.87],
            ],
        },
    }
    feats = load_geojson(data)
    index = GeoJSONVT(
        feats,
        Options(tile=TileOptions(extent=8192, buffer=2048, line_metrics=True)),
    )
    tile = index.get_tile(13, 2344, 3134)
    assert len(tile.features) > 0
    assert tile.features[0]["geometry"][0] == [[-2048.0, 2747.0], [408.0, 5037.0]]
    tags = tile.features[0]["tags"]
    assert abs(tags["mapbox_clip_start"] - 0.660622) < 1e-5
    assert abs(tags["mapbox_clip_end"] - 1.0) < 1e-5


def test_midpoint_calculation_quirk_parity():
    feats = load_geojson_file(fixture_path("last_feature.json"))
    index = GeoJSONVT(feats, Options(tile=TileOptions(tolerance=3.0)))
    actual = emitted_to_canonical(index.get_tile(6, 11, 23))
    fixed = _tile_canonical_from_file("last_feature-tile-fixed.json")
    broken_new = _tile_canonical_from_file("last_feature-tile-broken-new.json")
    assert actual != fixed
    assert actual == broken_new


def test_empty_geojson():
    feats = load_geojson_file(fixture_path("empty.json"))
    index = GeoJSONVT(feats, Options())
    assert index.total == 1  # the z0 tile exists, empty
    assert len(index.get_tile(0, 0, 0).features) == 0


def test_get_tile_zoom_guard_and_x_wrap():
    feats = load_geojson_file(fixture_path("feature.json"))
    index = GeoJSONVT(feats, Options())
    with pytest.raises(ValueError):
        index.get_tile(19, 0, 0)
    # x wraps modulo 2^z (lib.rs:190)
    t1 = index.get_tile(1, 0, 0)
    t2 = index.get_tile(1, 2, 0)
    assert emitted_to_canonical(t1) == emitted_to_canonical(t2)


def test_geojson_to_tile_wrap_path():
    # one-shot render with antimeridian wrapping enabled (lib.rs:104-110)
    feats = load_geojson_file(fixture_path("dateline.json"))
    t_wrapped = geojson_to_tile(feats, 1, 0, 0, TileOptions(), wrap_=True, clip_=True)
    t_plain = geojson_to_tile(feats, 1, 0, 0, TileOptions(), wrap_=False, clip_=True)
    # the dateline feature crosses the antimeridian: wrapping must place
    # geometry into the x=0 world tile that the unwrapped render misses
    assert len(t_wrapped.features) >= len(t_plain.features)
    assert len(t_wrapped.features) > 0


def test_pyramid_walk_smoke():
    # EP3: walk every (z,x,y) for z in [0,4) like benches/benchmark.rs:48-60
    feats = load_geojson_file(fixture_path("us-states.json"))
    index = GeoJSONVT(feats, Options())
    n_nonempty = 0
    for z in range(4):
        for x in range(1 << z):
            for y in range(1 << z):
                t = index.get_tile(z, x, y)
                if t.features:
                    n_nonempty += 1
    assert n_nonempty > 4
