"""GeoJSON ingest: text -> flat-encoded raw features (lon/lat space).

Normalization mirrors geojson_to_feature_collection
(/root/reference/src/lib.rs:68-89): a bare Geometry or bare Feature is
wrapped into a one-feature collection.  Nested GeometryCollections are
flattened one level at ingest — clip/emit semantics are invariant under
this flattening (clip recurses per sub-geometry and emit flattens GC into
one output feature per sub, tile.rs:286-297), so a single-level encoding
loses nothing.

Feature ids may be strings or numbers (tests.rs:92-98,
/root/reference/src/types.rs:133): string ids ride id_str, integer ids
id_num (int64), and non-integer numeric ids (legal JSON) id_float
(double) — nothing is dropped.  Properties stay an opaque canonical JSON
string to preserve number-vs-string typing through Arrow.
"""

from __future__ import annotations

import json
from typing import List, Optional

import numpy as np

from geojson_vt_rs_spark.core.geom import (
    GEOM_GEOMETRYCOLLECTION,
    GEOM_LINESTRING,
    GEOM_MULTILINESTRING,
    GEOM_MULTIPOINT,
    GEOM_MULTIPOLYGON,
    GEOM_POINT,
    GEOM_POLYGON,
    VtFeature,
    make_feature,
)

_TYPE_BY_NAME = {
    "Point": GEOM_POINT,
    "MultiPoint": GEOM_MULTIPOINT,
    "LineString": GEOM_LINESTRING,
    "MultiLineString": GEOM_MULTILINESTRING,
    "Polygon": GEOM_POLYGON,
    "MultiPolygon": GEOM_MULTIPOLYGON,
    "GeometryCollection": GEOM_GEOMETRYCOLLECTION,
}


def _coords_to_part(coords) -> tuple:
    arr = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    return arr[:, 0].copy(), arr[:, 1].copy(), np.zeros(len(arr), dtype=np.float64)


def _geometry_parts(geom: dict):
    """Yield (kind, parts, ring_group_sizes) flattening nested collections."""
    gt = _TYPE_BY_NAME[geom["type"]]
    c = geom.get("coordinates")
    if gt == GEOM_POINT:
        yield gt, [_coords_to_part([c])], None
    elif gt in (GEOM_MULTIPOINT, GEOM_LINESTRING):
        yield gt, [_coords_to_part(c)], None
    elif gt in (GEOM_MULTILINESTRING, GEOM_POLYGON):
        parts = [_coords_to_part(p) for p in c]
        groups = [len(parts)] if gt == GEOM_POLYGON else None
        yield gt, parts, groups
    elif gt == GEOM_MULTIPOLYGON:
        parts, groups = [], []
        for poly in c:
            groups.append(len(poly))
            parts.extend(_coords_to_part(r) for r in poly)
        yield gt, parts, groups
    else:  # GeometryCollection: flatten nested collections one level
        for sub in geom["geometries"]:
            yield from _geometry_parts(sub)


def feature_from_geojson(feat: dict, feature_seq: int) -> VtFeature:
    geom = feat["geometry"]
    props = feat.get("properties")
    props_json = json.dumps(props, separators=(",", ":")) if props else None
    fid = feat.get("id")
    id_str = fid if isinstance(fid, str) else None
    id_num = fid if isinstance(fid, (int,)) and not isinstance(fid, bool) else None
    id_float = fid if isinstance(fid, float) else None

    subs = list(_geometry_parts(geom))
    if len(subs) == 1 and subs[0][0] != GEOM_GEOMETRYCOLLECTION and (
        geom["type"] != "GeometryCollection"
    ):
        gt, parts, groups = subs[0]
        f = make_feature(
            gt,
            parts,
            ring_group_sizes=groups,
            props_json=props_json,
            id_str=id_str,
            id_num=id_num,
            id_float=id_float,
            feature_seq=feature_seq,
        )
        f.num_points = len(f.xs)  # raw point count (drives size-based planning)
        return f
    # GeometryCollection (possibly flattened from nesting)
    all_parts, kinds, counts, ring_sizes = [], [], [], []
    for gt, parts, groups in subs:
        kinds.append(gt)
        counts.append(len(parts))
        all_parts.extend(parts)
        if groups:
            ring_sizes.extend(groups)
    f = make_feature(
        GEOM_GEOMETRYCOLLECTION,
        all_parts,
        ring_group_sizes=ring_sizes if ring_sizes else None,
        gc_kinds=kinds,
        gc_part_counts=counts,
        props_json=props_json,
        id_str=id_str,
        id_num=id_num,
        id_float=id_float,
        feature_seq=feature_seq,
    )
    f.num_points = len(f.xs)
    return f


def load_geojson(text_or_obj) -> List[VtFeature]:
    """Parse GeoJSON text/object into raw lon/lat features (lib.rs:68-89)."""
    gj = json.loads(text_or_obj) if isinstance(text_or_obj, (str, bytes)) else text_or_obj
    t = gj.get("type")
    if t == "FeatureCollection":
        feats = gj["features"]
    elif t == "Feature":
        feats = [gj]
    else:  # bare geometry
        feats = [{"type": "Feature", "geometry": gj, "properties": None}]
    return [feature_from_geojson(f, i) for i, f in enumerate(feats)]


def load_geojson_file(path: str) -> List[VtFeature]:
    with open(path, "r") as fh:
        return load_geojson(fh.read())
