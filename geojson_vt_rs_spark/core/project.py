"""Lon/lat -> unit Web-Mercator conversion + per-part metrics + DP importance.

Reference semantics: /root/reference/src/convert.rs
  * project_point   (convert.rs:22-29): x = lon/360 + 0.5,
    y = clamp(0.5 - 0.25*ln((1+sin)/(1-sin))/pi, 0, 1), z := 0
  * line dist accumulated with hypot (convert.rs:45-49) — np.hypot for
    bit-parity with Rust f64::hypot
  * ring area = abs(shoelace)/2 (convert.rs:73-80)
  * simplification runs ONCE here at the max-zoom tolerance
    (lib.rs:166-172); later zooms only threshold the z scores
  * features with zero points are dropped (types.rs:152-155)
  * generate_id replaces ids with the 0-based input sequence
    (convert.rs:151-157)
"""

from __future__ import annotations

from typing import Optional

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
    finish_feature,
)
from geojson_vt_rs_spark.core.simplify import simplify

_LINEY = (GEOM_LINESTRING, GEOM_MULTILINESTRING)
_POLYY = (GEOM_POLYGON, GEOM_MULTIPOLYGON)


def project_points(lons: np.ndarray, lats: np.ndarray) -> tuple:
    """Vectorized project_point (convert.rs:22-29)."""
    sine = np.sin(lats * np.pi / 180.0)
    x = lons / 360.0 + 0.5
    with np.errstate(divide="ignore", invalid="ignore"):
        # poles produce +/-inf exactly like Rust's ln(); the clamp below
        # resolves them to 0/1 identically
        y = 0.5 - 0.25 * np.log((1.0 + sine) / (1.0 - sine)) / np.pi
    # .min(1.0).max(0.0)
    y = np.maximum(np.minimum(y, 1.0), 0.0)
    return x, y


def _part_kind(f: VtFeature, part_idx: int) -> int:
    """Geometry kind governing part ``part_idx`` (resolving GC nesting)."""
    if f.geom_type != GEOM_GEOMETRYCOLLECTION:
        return f.geom_type
    s = int(np.searchsorted(f.gc_part_offsets, part_idx, side="right")) - 1
    return int(f.gc_kinds[s])


def convert_feature(f: VtFeature, tolerance: float) -> Optional[VtFeature]:
    """Project one raw (lon/lat) feature in place semantics -> new feature.

    Input: VtFeature whose xs/ys hold lon/lat and zs are zeros.
    Output: unit-mercator feature with dist/area/seg metadata and DP
    importance in zs, or None when empty.
    """
    xs, ys = project_points(f.xs, f.ys)
    zs = np.zeros(len(xs), dtype=np.float64)
    nparts = f.nparts
    part_dist = np.zeros(nparts, dtype=np.float64)
    part_seg_start = np.zeros(nparts, dtype=np.float64)
    part_seg_end = np.zeros(nparts, dtype=np.float64)
    part_area = np.zeros(nparts, dtype=np.float64)

    for p in range(nparts):
        a, b = int(f.part_offsets[p]), int(f.part_offsets[p + 1])
        if b - a == 0:
            continue
        kind = _part_kind(f, p)
        px, py, pz = xs[a:b], ys[a:b], zs[a:b]
        if kind in _LINEY:
            # dist = left-to-right fold of hypot (convert.rs:45-49);
            # cumsum is a sequential accumulation, matching the Rust
            # loop's rounding order (np.sum's pairwise tree would not)
            if b - a > 1:
                part_dist[p] = float(
                    np.cumsum(np.hypot(np.diff(px), np.diff(py)))[-1]
                )
            simplify(px, py, pz, tolerance)
            part_seg_start[p] = 0.0
            part_seg_end[p] = part_dist[p]
        elif kind in _POLYY:
            # abs shoelace (convert.rs:73-80)
            if b - a > 1:
                # sequential shoelace fold, same rounding order as the
                # reference's += loop
                area = float(np.cumsum(px[:-1] * py[1:] - px[1:] * py[:-1])[-1])
                part_area[p] = abs(area / 2.0)
            simplify(px, py, pz, tolerance)
        # point/multipoint parts: z stays 0, no metrics

    out = VtFeature(
        geom_type=f.geom_type,
        xs=xs,
        ys=ys,
        zs=zs,
        part_offsets=f.part_offsets,
        ring_offsets=f.ring_offsets,
        gc_kinds=f.gc_kinds,
        gc_part_offsets=f.gc_part_offsets,
        part_dist=part_dist,
        part_seg_start=part_seg_start,
        part_seg_end=part_seg_end,
        part_area=part_area,
        **f.meta(),
    )
    return finish_feature(out)


def convert(features: list, tolerance: float, generate_id: bool) -> list:
    """Whole-collection convert (convert.rs:148-176).

    ``generate_id`` assigns the 0-based *input* index as numeric id —
    assigned before the empty-feature drop, so ids of dropped features
    are skipped, matching the reference's gen_id counter.

    Point/MultiPoint features (no metrics, no simplify) batch into ONE
    projection pass across the whole collection — elementwise identical
    to convert_feature (same project_points call, bbox via per-feature
    min/max reductions), so goldens are unaffected; per-feature numpy
    dispatch was the dominant convert cost on point-heavy inputs
    (the LargeGeoJSON shape).
    """
    out: list = [None] * len(features)
    pt_idx: list = []
    pt_feats: list = []
    for gen_id, f in enumerate(features):
        if generate_id:
            f = VtFeature(**{**f.__dict__})
            f.id_str = None
            f.id_num = gen_id
            f.id_float = None
        if (
            f.geom_type in (GEOM_POINT, GEOM_MULTIPOINT)
            and f.gc_kinds is None
            and len(f.xs)
        ):
            pt_idx.append(gen_id)
            pt_feats.append(f)
        else:
            out[gen_id] = convert_feature(f, tolerance)
    if pt_feats:
        m = len(pt_feats)
        lens = np.fromiter((len(f.xs) for f in pt_feats), np.int64, count=m)
        offs = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        all_x = np.concatenate([f.xs for f in pt_feats])
        all_y = np.concatenate([f.ys for f in pt_feats])
        X, Y = project_points(all_x, all_y)
        Z = np.zeros(len(X), dtype=np.float64)
        starts = offs[:-1]
        # per-feature bbox, clamped exactly like finish_feature
        minx = np.minimum(np.minimum.reduceat(X, starts), 2.0).tolist()
        miny = np.minimum(np.minimum.reduceat(Y, starts), 1.0).tolist()
        maxx = np.maximum(np.maximum.reduceat(X, starts), -1.0).tolist()
        maxy = np.maximum(np.maximum.reduceat(Y, starts), 0.0).tolist()
        for j, f in enumerate(pt_feats):
            a, b = int(offs[j]), int(offs[j + 1])
            nparts = f.nparts
            out[pt_idx[j]] = VtFeature(
                geom_type=f.geom_type,
                xs=X[a:b],
                ys=Y[a:b],
                zs=Z[a:b],
                part_offsets=f.part_offsets,
                ring_offsets=f.ring_offsets,
                part_dist=np.zeros(nparts, dtype=np.float64),
                part_seg_start=np.zeros(nparts, dtype=np.float64),
                part_seg_end=np.zeros(nparts, dtype=np.float64),
                part_area=np.zeros(nparts, dtype=np.float64),
                bbox=(minx[j], miny[j], maxx[j], maxy[j]),
                num_points=int(lens[j]),
                **f.meta(),
            )
    return [o for o in out if o is not None]
