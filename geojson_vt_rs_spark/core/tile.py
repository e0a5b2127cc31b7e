"""Per-tile feature emission: transform to tile-local integer coords,
apply per-zoom tolerance filters, collapse degenerate multis.

Reference: /root/reference/src/tile.rs.
  * transform_point (tile.rs:351-357): round((p*2^z - tile_xy) * extent)
    with Rust f64::round = half-AWAY-from-zero — numpy's np.round is
    half-to-even, so we use a sign-aware floor(|v|+0.5) instead.
  * emission filters (tile.rs:318-349): line kept when dist > tolerance,
    ring when area > sq_tolerance, point when z > sq_tolerance; clip-born
    points carry z=1.0 and always survive.
  * degenerate collapse (tile.rs:152-168, 225-241, 268-284): a multi
    geometry with exactly 1 surviving part collapses to the single kind,
    0 parts emits nothing.  Note the reference pushes *empty* inner
    lines/rings inside multi paths (tile.rs:331-349) — mirrored.
  * GeometryCollection flattens into several output features sharing
    props/id (tile.rs:286-297).
  * line metrics props mapbox_clip_start/_end = seg_start/dist, seg_end/
    dist; integral values serialize as JSON ints (tile.rs:178-205).
  * num_points sums source-feature point counts (tile.rs:81);
    num_simplified counts emitted points (tile.rs:352).
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
    subgeom_view,
)

TYPE_POINT = 1
TYPE_LINE = 2
TYPE_POLYGON = 3


def _round_half_away(v: np.ndarray) -> np.ndarray:
    """Rust f64::round semantics (half away from zero)."""
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


class TileEmitter:
    """Accumulates one tile's rendered features (ref InternalTile, tile.rs:28-101)."""

    def __init__(
        self,
        z: int,
        x: int,
        y: int,
        extent: int,
        tolerance: float,
        line_metrics: bool,
    ):
        self.z = z
        self.x = x
        self.y = y
        self.z2 = float(2**z)
        self.extent = float(extent)
        self.tolerance = tolerance
        self.sq_tolerance = tolerance * tolerance
        self.line_metrics = line_metrics
        self.features: List[dict] = []
        self.num_points = 0
        self.num_simplified = 0

    # --- point transform -------------------------------------------------
    def _transform(self, xs, ys) -> list:
        self.num_simplified += len(xs)
        tx = _round_half_away((xs * self.z2 - self.x) * self.extent)
        ty = _round_half_away((ys * self.z2 - self.y) * self.extent)
        # rounded values are exact whole floats; int64 coords serialize
        # faster and compare numerically equal (fixtures hold ints too)
        return np.stack([tx, ty], axis=1).astype(np.int64).tolist()

    def _transform_pre(self, tx, ty) -> list:
        """Emit PRE-transformed int64 coords (cross-feature columnar path:
        the whole Arrow batch was transformed in one numpy pass upstream —
        see pipeline.batch_pre_transform — elementwise identical to
        _transform, so both paths stay golden-exact)."""
        self.num_simplified += len(tx)
        return np.stack([tx, ty], axis=1).tolist()

    # --- per-kind emitters ------------------------------------------------
    def _emit(self, tile_type, kind, geometry, tags, ids):
        id_str, id_num, id_float = ids
        self.features.append(
            dict(
                type=tile_type,
                kind=kind,
                geometry=geometry,
                tags=tags,
                id_str=id_str,
                id_num=id_num,
                id_float=id_float,
            )
        )

    def _part_pts(self, f: VtFeature, p: int, pre, filter_z: bool) -> list:
        """Transform part p's points (optionally z-filtered) via either the
        scalar transform or the batch-precomputed (tx, ty, keep) arrays —
        `pre` is aligned index-for-index with f.xs."""
        a, b = int(f.part_offsets[p]), int(f.part_offsets[p + 1])
        if pre is not None:
            tx, ty, keep = pre
            if filter_z:
                k = keep[a:b]
                return self._transform_pre(tx[a:b][k], ty[a:b][k])
            return self._transform_pre(tx[a:b], ty[a:b])
        px, py, pz = f.part(p)
        if filter_z:
            k = pz > self.sq_tolerance
            return self._transform(px[k], py[k])
        return self._transform(px, py)

    def _line_pts(self, f: VtFeature, p: int, pre=None) -> list:
        """transform_line_string (tile.rs:318-329)."""
        if float(f.part_dist[p]) > self.tolerance:
            return self._part_pts(f, p, pre, filter_z=True)
        return []

    def _ring_pts(self, f: VtFeature, p: int, pre=None) -> list:
        """transform_linear_ring (tile.rs:359-376)."""
        if float(f.part_area[p]) > self.sq_tolerance:
            return self._part_pts(f, p, pre, filter_z=True)
        return []

    def _polygon_rings(self, f: VtFeature, g0: int, g1: int, pre=None) -> list:
        """transform_polygon over parts [g0,g1) — keeps empty rings for
        area-passing rings, like tile.rs:341-349."""
        return [
            self._ring_pts(f, p, pre)
            for p in range(g0, g1)
            if float(f.part_area[p]) > self.sq_tolerance
        ]

    def _add_geometry(self, f: VtFeature, tags, ids, pre=None):
        gt = f.geom_type
        if gt == GEOM_POINT:
            self._emit(
                TYPE_POINT, gt, self._part_pts(f, 0, pre, False), tags, ids
            )
        elif gt == GEOM_MULTIPOINT:
            pts = self._part_pts(f, 0, pre, False)
            if len(pts) == 1:
                self._emit(TYPE_POINT, GEOM_POINT, pts, tags, ids)
            elif len(pts) > 1:
                self._emit(TYPE_POINT, gt, pts, tags, ids)
        elif gt == GEOM_LINESTRING:
            pts = self._line_pts(f, 0, pre)
            if pts:
                if self.line_metrics:
                    new_tags = dict(tags) if tags else {}
                    dist = float(f.part_dist[0])
                    new_tags["mapbox_clip_start"] = _intify(
                        float(f.part_seg_start[0]) / dist
                    )
                    new_tags["mapbox_clip_end"] = _intify(
                        float(f.part_seg_end[0]) / dist
                    )
                    self._emit(TYPE_LINE, gt, [pts], new_tags, ids)
                else:
                    self._emit(TYPE_LINE, gt, [pts], tags, ids)
        elif gt == GEOM_MULTILINESTRING:
            # transform_multi_line_string keeps empty inner lines for
            # dist-passing lines (tile.rs:331-339)
            lines = [
                self._line_pts(f, p, pre)
                for p in range(f.nparts)
                if float(f.part_dist[p]) > self.tolerance
            ]
            if len(lines) == 1:
                self._emit(TYPE_LINE, GEOM_LINESTRING, lines, tags, ids)
            elif len(lines) > 1:
                self._emit(TYPE_LINE, gt, lines, tags, ids)
        elif gt == GEOM_POLYGON:
            rings = self._polygon_rings(f, 0, f.nparts, pre)
            if rings:
                self._emit(TYPE_POLYGON, gt, rings, tags, ids)
        elif gt == GEOM_MULTIPOLYGON:
            polys = []
            ro = f.ring_offsets
            for g in range(len(ro) - 1):
                rings = self._polygon_rings(
                    f, int(ro[g]), int(ro[g + 1]), pre
                )
                if rings:
                    polys.append(rings)
            if len(polys) == 1:
                self._emit(TYPE_POLYGON, GEOM_POLYGON, polys[0], tags, ids)
            elif len(polys) > 1:
                self._emit(TYPE_POLYGON, gt, polys, tags, ids)
        elif gt == GEOM_GEOMETRYCOLLECTION:
            for s in range(len(f.gc_kinds)):
                sub = subgeom_view(f, s)
                sub_pre = None
                if pre is not None:
                    # rebase pre the same way subgeom_view rebases xs
                    p0 = int(f.gc_part_offsets[s])
                    p1 = int(f.gc_part_offsets[s + 1])
                    a = int(f.part_offsets[p0])
                    b = int(f.part_offsets[p1])
                    tx, ty, keep = pre
                    sub_pre = (tx[a:b], ty[a:b], keep[a:b])
                self._add_geometry(sub, tags, ids, sub_pre)

    def add_feature(self, f: VtFeature, pre=None):
        """pre = optional (tx, ty, keep) arrays aligned with f.xs from the
        cross-feature batch transform (pipeline.batch_pre_transform)."""
        self.num_points += f.num_points
        tags = json.loads(f.props_json) if f.props_json else None
        if tags is not None and not tags:
            tags = None  # empty props -> no tags (tile.rs:86-90)
        self._add_geometry(f, tags, (f.id_str, f.id_num, f.id_float), pre)

    def add_point_fast(self, f: VtFeature, tx: int, ty: int):
        """Single-coordinate GEOM_POINT fast path: identical output to
        add_feature (same tags/empty-props handling, geometry [[tx,ty]],
        num_simplified += 1) without the per-feature numpy transform —
        the local twin of pipeline.render_split_stage's vectorized point
        render.  Caller guarantees geom_type == GEOM_POINT, len(xs) == 1,
        and (tx, ty) computed by the same half-away transform."""
        self.num_points += f.num_points
        self.num_simplified += 1
        tags = json.loads(f.props_json) if f.props_json else None
        if tags is not None and not tags:
            tags = None
        self.features.append(
            dict(
                type=TYPE_POINT,
                kind=GEOM_POINT,
                geometry=[[tx, ty]],
                tags=tags,
                id_str=f.id_str,
                id_num=f.id_num,
                id_float=f.id_float,
            )
        )


def _intify(v: float):
    """Integral floats serialize as JSON ints (tile.rs:183-198)."""
    return int(v) if float(v).is_integer() else float(v)


def emit_tile(
    features: list,
    z: int,
    x: int,
    y: int,
    extent: int,
    tolerance: float,
    line_metrics: bool,
) -> TileEmitter:
    """Render one tile.  For non-trivial feature lists the whole tile's
    point transform runs in ONE numpy pass (all features share this
    tile's (z2, x, y, sq_tolerance)), mirroring the distributed kernel's
    cross-feature columnar render (pipeline.batch_pre_transform) —
    elementwise identical to the per-feature path, asserted by the
    dual-path golden tests."""
    em = TileEmitter(z, x, y, extent, tolerance, line_metrics)
    n = len(features)
    if n >= 8:
        lens = np.fromiter((len(f.xs) for f in features), np.int64, count=n)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        if offs[-1]:
            all_x = np.concatenate([f.xs for f in features])
            all_y = np.concatenate([f.ys for f in features])
            all_z = np.concatenate([f.zs for f in features])
            tx = _round_half_away((all_x * em.z2 - em.x) * em.extent).astype(
                np.int64
            )
            ty = _round_half_away((all_y * em.z2 - em.y) * em.extent).astype(
                np.int64
            )
            keep = all_z > em.sq_tolerance
            txl = tx.tolist()  # Python ints for the point fast path
            tyl = ty.tolist()
            offl = offs.tolist()
            for i, f in enumerate(features):
                a = offl[i]
                if f.geom_type == GEOM_POINT and offl[i + 1] - a == 1:
                    em.add_point_fast(f, txl[a], tyl[a])
                else:
                    b = offl[i + 1]
                    em.add_feature(f, pre=(tx[a:b], ty[a:b], keep[a:b]))
            return em
    for f in features:
        em.add_feature(f)
    return em
