"""Flat-array feature model.

A feature's geometry is stored as flat ``xs/ys/zs`` float64 arrays plus
offset arrays, instead of the reference's 4-deep nested vectors
(``VtGeometry``, /root/reference/src/types.rs:8-18).  ``zs`` carries the
Douglas–Peucker importance score, NOT altitude (types.rs:73).

Encoding rules (one ``part`` = one contiguous run of points):

* POINT / MULTIPOINT  : 1 part holding all points.
* LINESTRING          : 1 part.   MULTILINESTRING: 1 part per line.
* POLYGON             : 1 part per ring; ``ring_offsets = [0, nrings]``.
* MULTIPOLYGON        : 1 part per ring; ``ring_offsets`` groups rings
                        into polygons (len = npolys+1, part indices).
* GEOMETRYCOLLECTION  : sub-geometries flattened one level deep;
                        ``gc_kinds[s]`` is the sub-geometry's type and
                        ``gc_part_offsets`` (len = nsub+1) its part range.
                        ``ring_offsets`` stays global over all parts (ring
                        groups never span sub-geometries).  Nested
                        collections are flattened at ingest — equivalent
                        order/semantics, see sources/geojson.py.

Per-part metadata mirrors ``VtLineString``/``VtLinearRing``
(types.rs:89-113): ``part_dist`` (line length), ``part_seg_start`` /
``part_seg_end`` (distance-along-line for line metrics), ``part_area``
(abs shoelace area for rings).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

import numpy as np

GEOM_POINT = 0
GEOM_MULTIPOINT = 1
GEOM_LINESTRING = 2
GEOM_MULTILINESTRING = 3
GEOM_POLYGON = 4
GEOM_MULTIPOLYGON = 5
GEOM_GEOMETRYCOLLECTION = 6

GEOM_NAMES = {
    GEOM_POINT: "Point",
    GEOM_MULTIPOINT: "MultiPoint",
    GEOM_LINESTRING: "LineString",
    GEOM_MULTILINESTRING: "MultiLineString",
    GEOM_POLYGON: "Polygon",
    GEOM_MULTIPOLYGON: "MultiPolygon",
    GEOM_GEOMETRYCOLLECTION: "GeometryCollection",
}

_POINTY = (GEOM_POINT, GEOM_MULTIPOINT)
_LINEY = (GEOM_LINESTRING, GEOM_MULTILINESTRING)
_POLY = (GEOM_POLYGON, GEOM_MULTIPOLYGON)

_EMPTY_F8 = np.empty(0, dtype=np.float64)
_EMPTY_I4 = np.zeros(1, dtype=np.int32)


@dataclass
class VtFeature:
    """One feature flowing between operators (ref ``VtFeature``, types.rs:129-136)."""

    geom_type: int
    xs: np.ndarray
    ys: np.ndarray
    zs: np.ndarray
    part_offsets: np.ndarray  # int32, len nparts+1
    ring_offsets: Optional[np.ndarray] = None  # int32, polygon grouping
    gc_kinds: Optional[np.ndarray] = None  # int8 per GC sub-geometry
    gc_part_offsets: Optional[np.ndarray] = None  # int32, len nsub+1
    part_dist: Optional[np.ndarray] = None  # float64 per part
    part_seg_start: Optional[np.ndarray] = None
    part_seg_end: Optional[np.ndarray] = None
    part_area: Optional[np.ndarray] = None
    props_json: Optional[str] = None
    id_str: Optional[str] = None
    id_num: Optional[int] = None
    id_float: Optional[float] = None  # non-integer numeric ids (legal JSON)
    feature_seq: int = 0
    world_copy: int = 1  # 0 left / 1 center / 2 right (wrap ordering)
    slice_path: str = ""  # lexicographic order key for metric-mode slices
    bbox: tuple = (2.0, 1.0, -1.0, 0.0)  # inverted seed, types.rs:148
    num_points: int = 0

    @property
    def nparts(self) -> int:
        return len(self.part_offsets) - 1

    def part(self, i: int) -> tuple:
        a, b = int(self.part_offsets[i]), int(self.part_offsets[i + 1])
        return self.xs[a:b], self.ys[a:b], self.zs[a:b]

    def part_len(self, i: int) -> int:
        return int(self.part_offsets[i + 1]) - int(self.part_offsets[i])

    def meta(self) -> dict:
        """Non-geometry attributes, for rebuilding clipped features."""
        return dict(
            props_json=self.props_json,
            id_str=self.id_str,
            id_num=self.id_num,
            id_float=self.id_float,
            feature_seq=self.feature_seq,
            world_copy=self.world_copy,
            slice_path=self.slice_path,
        )


def _ensure_meta_arrays(f: VtFeature) -> None:
    n = f.nparts
    if f.part_dist is None:
        f.part_dist = np.zeros(n, dtype=np.float64)
    if f.part_seg_start is None:
        f.part_seg_start = np.zeros(n, dtype=np.float64)
    if f.part_seg_end is None:
        f.part_seg_end = np.zeros(n, dtype=np.float64)
    if f.part_area is None:
        f.part_area = np.zeros(n, dtype=np.float64)


def finish_feature(f: VtFeature) -> Optional[VtFeature]:
    """Recompute bbox/num_points; drop empty features.

    Mirrors ``VtFeature::new`` + ``process_geometry``
    (types.rs:138-158, 211-223): bbox seeded inverted at
    (2,1)/(-1,0) and the feature is dropped when it has 0 points.
    """
    _ensure_meta_arrays(f)
    n = len(f.xs)
    f.num_points = n
    if n == 0:
        return None
    f.bbox = (
        min(2.0, float(np.min(f.xs))),
        min(1.0, float(np.min(f.ys))),
        max(-1.0, float(np.max(f.xs))),
        max(0.0, float(np.max(f.ys))),
    )
    return f


def shift_feature_x(f: VtFeature, offset: float) -> VtFeature:
    """World-copy shift: add offset to every x and the bbox (wrap.rs:5-16)."""
    g = replace(f, xs=f.xs + offset)
    minx, miny, maxx, maxy = f.bbox
    g.bbox = (minx + offset, miny, maxx + offset, maxy)
    return g


def make_feature(
    geom_type: int,
    parts: list,  # list of (xs, ys, zs) float64 arrays
    *,
    ring_group_sizes: Optional[list] = None,  # rings per polygon
    gc_kinds: Optional[list] = None,
    gc_part_counts: Optional[list] = None,
    part_dist: Optional[np.ndarray] = None,
    part_seg_start: Optional[np.ndarray] = None,
    part_seg_end: Optional[np.ndarray] = None,
    part_area: Optional[np.ndarray] = None,
    **meta,
) -> VtFeature:
    """Assemble a VtFeature from per-part arrays (does NOT finish it)."""
    if parts:
        xs = np.concatenate([p[0] for p in parts])
        ys = np.concatenate([p[1] for p in parts])
        zs = np.concatenate([p[2] for p in parts])
        offs = np.zeros(len(parts) + 1, dtype=np.int32)
        np.cumsum([len(p[0]) for p in parts], out=offs[1:])
    else:
        xs = ys = zs = _EMPTY_F8
        offs = _EMPTY_I4
    ring_offsets = None
    if ring_group_sizes is not None:
        ring_offsets = np.zeros(len(ring_group_sizes) + 1, dtype=np.int32)
        np.cumsum(ring_group_sizes, out=ring_offsets[1:])
    gk = gpo = None
    if gc_kinds is not None:
        gk = np.asarray(gc_kinds, dtype=np.int8)
        gpo = np.zeros(len(gc_part_counts) + 1, dtype=np.int32)
        np.cumsum(gc_part_counts, out=gpo[1:])
    return VtFeature(
        geom_type=geom_type,
        xs=xs,
        ys=ys,
        zs=zs,
        part_offsets=offs,
        ring_offsets=ring_offsets,
        gc_kinds=gk,
        gc_part_offsets=gpo,
        part_dist=part_dist,
        part_seg_start=part_seg_start,
        part_seg_end=part_seg_end,
        part_area=part_area,
        **meta,
    )


def subgeom_view(f: VtFeature, s: int) -> VtFeature:
    """View of GC sub-geometry ``s`` as a standalone feature (no copy of meta)."""
    p0, p1 = int(f.gc_part_offsets[s]), int(f.gc_part_offsets[s + 1])
    a, b = int(f.part_offsets[p0]), int(f.part_offsets[p1])
    ring_offsets = None
    kind = int(f.gc_kinds[s])
    if kind in _POLY and f.ring_offsets is not None:
        mask = (f.ring_offsets >= p0) & (f.ring_offsets <= p1)
        ring_offsets = (f.ring_offsets[mask] - p0).astype(np.int32)
    sl = slice(p0, p1)

    def _m(arr):
        return None if arr is None else arr[sl]

    return VtFeature(
        geom_type=kind,
        xs=f.xs[a:b],
        ys=f.ys[a:b],
        zs=f.zs[a:b],
        part_offsets=(f.part_offsets[p0 : p1 + 1] - a).astype(np.int32),
        ring_offsets=ring_offsets,
        part_dist=_m(f.part_dist),
        part_seg_start=_m(f.part_seg_start),
        part_seg_end=_m(f.part_seg_end),
        part_area=_m(f.part_area),
    )
