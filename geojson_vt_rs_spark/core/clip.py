"""Axis-parallel band clipping (Sutherland–Hodgman single-boundary pass).

Semantics: /root/reference/src/clip.rs.  The reference walks segments one
at a time (clip.rs:129-260 lines, 263-356 rings); here every segment of a
part is classified at once in numpy and the output point stream is
assembled with cumsum scatter — same emitted points, same float ops
(intersections via calc_progress/intersect, types.rs:256-282, which give
new points importance z=1.0 so they always survive tolerance filters).

Key behaviors mirrored exactly:
  * per-feature bbox trivial accept (returned unchanged) / reject before
    any clipping (clip.rs:385-398)
  * line slices: 9-case walk incl. the bk==k boundary quirks
    (clip.rs:179-185, 214-220); slices inherit the original line's dist
  * line metrics: seg_start/seg_end accumulation with line_len starting
    at line.seg_start (clip.rs:131, 248-250)
  * rings re-closed when endpoints differ after clipping, compared on
    (x,y,z) (clip.rs:346-353); ring area carried through
  * multipoint band filter is [k1,k2] double-inclusive (clip.rs:26-35)
  * 1-slice MultiLineString collapses to LineString (clip.rs:41-45,54-58)
  * polygons drop empty rings; multipolygons drop empty polygons
    (clip.rs:61-87); geometry collections recurse keeping empty subs
    (clip.rs:89-96)
  * with line_metrics, a clipped MultiLineString explodes into one
    feature per slice, each re-finished (clip.rs:402-422)
"""

from __future__ import annotations

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
    finish_feature,
    make_feature,
)

_EMPTY = np.empty(0, dtype=np.float64)

# parts below this size use the scalar walk (numpy dispatch overhead
# exceeds the work); tests override it to cross-check both paths
_SMALL_N = 32


def _clip_line_small(px, py, pz, axis, k1, k2, line_metrics, seg_start):
    """Scalar port of the reference segment walk (clip.rs:129-260) —
    faster than the vectorized kernel below ~32 points and an
    independent implementation cross-checked against it by the property
    suite."""
    n = len(px)
    pts = [(float(px[i]), float(py[i]), float(pz[i])) for i in range(n)]
    slices = []
    cur: list = []
    cur_start = seg_start if line_metrics else 0.0
    cur_end = 0.0
    line_len = seg_start
    for i in range(n - 1):
        a = pts[i]
        b = pts[i + 1]
        ak = a[axis]
        bk = b[axis]
        is_last = i == n - 2
        seg_len = np.hypot(b[0] - a[0], b[1] - a[1]) if line_metrics else 0.0

        def isect(v):
            t = (v - ak) / (bk - ak)
            if axis == 0:
                return (v, (b[1] - a[1]) * t + a[1], 1.0), t
            return ((b[0] - a[0]) * t + a[0], v, 1.0), t

        if ak < k1:
            if bk > k2:
                p1, t1 = isect(k1)
                p2, t2 = isect(k2)
                cur.append(p1)
                cur.append(p2)
                if line_metrics:
                    cur_start = line_len + seg_len * t1
                    cur_end = line_len + seg_len * t2
                slices.append((cur, cur_start, cur_end))
                cur = []
                cur_start = seg_start if line_metrics else 0.0
            elif bk > k1:
                p1, t1 = isect(k1)
                cur.append(p1)
                if line_metrics:
                    cur_start = line_len + seg_len * t1
                if is_last:
                    cur.append(b)
            elif bk == k1 and not is_last:
                if line_metrics:
                    cur_start = line_len + seg_len
                cur.append(b)
        elif ak > k2:
            if bk < k1:
                p2, t2 = isect(k2)
                p1, t1 = isect(k1)
                cur.append(p2)
                cur.append(p1)
                if line_metrics:
                    cur_start = line_len + seg_len * t2
                    cur_end = line_len + seg_len * t1
                slices.append((cur, cur_start, cur_end))
                cur = []
                cur_start = seg_start if line_metrics else 0.0
            elif bk < k2:
                p2, t2 = isect(k2)
                cur.append(p2)
                if line_metrics:
                    cur_start = line_len + seg_len * t2
                if is_last:
                    cur.append(b)
            elif bk == k2 and not is_last:
                if line_metrics:
                    cur_start = line_len + seg_len
                cur.append(b)
        else:
            cur.append(a)
            if bk < k1:
                p1, t1 = isect(k1)
                cur.append(p1)
                if line_metrics:
                    cur_end = line_len + seg_len * t1
                slices.append((cur, cur_start, cur_end))
                cur = []
                cur_start = seg_start if line_metrics else 0.0
            elif bk > k2:
                p2, t2 = isect(k2)
                cur.append(p2)
                if line_metrics:
                    cur_end = line_len + seg_len * t2
                slices.append((cur, cur_start, cur_end))
                cur = []
                cur_start = seg_start if line_metrics else 0.0
            elif is_last:
                cur.append(b)
        if line_metrics:
            line_len += seg_len
    if cur:
        slices.append((cur, cur_start, line_len))
    out = []
    for pts_list, s_start, s_end in slices:
        arr = np.asarray(pts_list, dtype=np.float64)
        out.append(
            (arr[:, 0], arr[:, 1], arr[:, 2],
             s_start if line_metrics else 0.0,
             s_end if line_metrics else 0.0)
        )
    return out


def clip_line_part(
    px: np.ndarray,
    py: np.ndarray,
    pz: np.ndarray,
    axis: int,
    k1: float,
    k2: float,
    line_metrics: bool,
    seg_start: float,
) -> list:
    """Clip one line part into slices.

    Returns a list of (xs, ys, zs, slice_seg_start, slice_seg_end); the
    caller attaches the original line's dist to every slice.
    """
    n = len(px)
    if n < 2:
        return []
    if n < _SMALL_N:
        return _clip_line_small(px, py, pz, axis, k1, k2, line_metrics, seg_start)

    k = px if axis == 0 else py
    o = py if axis == 0 else px  # the non-clip coordinate
    ak, bk = k[:-1], k[1:]
    ao, bo = o[:-1], o[1:]
    az, bz = pz[:-1], pz[1:]
    ax_, bx_ = px[:-1], px[1:]
    ay_, by_ = py[:-1], py[1:]
    m = n - 1
    last = np.zeros(m, dtype=bool)
    last[m - 1] = True

    A = ak < k1
    B = ak > k2
    C = ~A & ~B

    with np.errstate(divide="ignore", invalid="ignore"):
        dk = bk - ak
        t1 = (k1 - ak) / dk
        t2 = (k2 - ak) / dk
    with np.errstate(invalid="ignore"):
        i1o = (bo - ao) * t1 + ao  # other-coordinate at the k1 crossing
        i2o = (bo - ao) * t2 + ao

    A1 = A & (bk > k2)
    A2 = A & ~A1 & (bk > k1)
    A3 = A & (bk == k1) & ~last
    B1 = B & (bk < k1)
    B2 = B & ~B1 & (bk < k2)
    B3 = B & (bk == k2) & ~last
    C1 = C & (bk < k1)
    C2 = C & (bk > k2)
    C3 = C & ~C1 & ~C2 & last

    # emission slot 0
    e0 = A1 | A2 | A3 | B1 | B2 | B3 | C
    # slot-0 point: A1/A2 -> isect(k1); B1/B2 -> isect(k2); A3/B3 -> b; C -> a
    isect1 = A1 | A2
    isect2 = B1 | B2
    takeb0 = A3 | B3
    e0k = np.where(isect1, k1, np.where(isect2, k2, np.where(takeb0, bk, ak)))
    e0o = np.where(isect1, i1o, np.where(isect2, i2o, np.where(takeb0, bo, ao)))
    e0z = np.where(isect1 | isect2, 1.0, np.where(takeb0, bz, az))

    # emission slot 1: A1 -> isect(k2); B1 -> isect(k1);
    # (A2|B2)&last -> b; C1 -> isect(k1); C2 -> isect(k2); C3 -> b
    e1 = A1 | B1 | ((A2 | B2) & last) | C1 | C2 | C3
    s1_i2 = A1 | C2
    s1_i1 = B1 | C1
    e1k = np.where(s1_i2, k2, np.where(s1_i1, k1, bk))
    e1o = np.where(s1_i2, i2o, np.where(s1_i1, i1o, bo))
    e1z = np.where(s1_i2 | s1_i1, 1.0, bz)

    close = A1 | B1 | C1 | C2

    cnt = e0.astype(np.int64) + e1.astype(np.int64)
    total = int(cnt.sum())
    if total == 0:
        return []
    base = np.zeros(m, dtype=np.int64)
    np.cumsum(cnt[:-1], out=base[1:])

    out_k = np.empty(total, dtype=np.float64)
    out_o = np.empty(total, dtype=np.float64)
    out_z = np.empty(total, dtype=np.float64)
    p0 = base[e0]
    out_k[p0] = e0k[e0]
    out_o[p0] = e0o[e0]
    out_z[p0] = e0z[e0]
    p1 = base[e1] + e0[e1].astype(np.int64)
    out_k[p1] = e1k[e1]
    out_o[p1] = e1o[e1]
    out_z[p1] = e1z[e1]

    if axis == 0:
        out_x, out_y = out_k, out_o
    else:
        out_x, out_y = out_o, out_k

    # slice boundaries: stream position right after each closing segment
    close_idx = np.nonzero(close)[0]
    ends = (base[close_idx] + cnt[close_idx]).astype(np.int64)
    bounds = np.concatenate([[0], ends, [total]])

    # metrics
    if line_metrics:
        seg_len = np.hypot(bx_ - ax_, by_ - ay_)
        # line_len before segment i = seg_start left-folded with the
        # hypots (clip.rs:131,249); seeding the cumsum with seg_start
        # reproduces the reference's exact rounding order
        cum = np.cumsum(np.concatenate([[seg_start], seg_len]))
        line_len = cum[:-1]
        with np.errstate(invalid="ignore"):
            start_val = np.where(
                A1 | A2,
                line_len + seg_len * t1,
                np.where(
                    B1 | B2,
                    line_len + seg_len * t2,
                    line_len + seg_len,  # A3/B3
                ),
            )
            end_val = np.where(
                A1 | C2, line_len + seg_len * t2, line_len + seg_len * t1
            )
        final_end = float(cum[-1])
        # first emitting segment per stream position
        seg_of_pos = np.empty(total, dtype=np.int64)
        seg_of_pos[p0] = np.nonzero(e0)[0]
        seg_of_pos[p1] = np.nonzero(e1)[0]

    slices = []
    starts_seg = A1 | A2 | A3 | B1 | B2 | B3
    for si in range(len(bounds) - 1):
        lo, hi = int(bounds[si]), int(bounds[si + 1])
        if hi <= lo:
            continue
        sx = out_x[lo:hi]
        sy = out_y[lo:hi]
        sz = out_z[lo:hi]
        if line_metrics:
            first_seg = int(seg_of_pos[lo])
            s_start = (
                float(start_val[first_seg]) if starts_seg[first_seg] else seg_start
            )
            if si < len(bounds) - 2:  # closed slice
                close_seg = int(close_idx[si])
                s_end = float(end_val[close_seg])
            else:
                s_end = float(final_end)
        else:
            s_start = 0.0
            s_end = 0.0
        slices.append((sx, sy, sz, s_start, s_end))
    return slices


def _clip_ring_small(px, py, pz, axis, k1, k2):
    """Scalar port of the ring walk (clip.rs:263-356)."""
    n = len(px)
    pts = [(float(px[i]), float(py[i]), float(pz[i])) for i in range(n)]
    out = []
    for i in range(n - 1):
        a = pts[i]
        b = pts[i + 1]
        ak = a[axis]
        bk = b[axis]

        def isect(v):
            t = (v - ak) / (bk - ak)
            if axis == 0:
                return (v, (b[1] - a[1]) * t + a[1], 1.0)
            return ((b[0] - a[0]) * t + a[0], v, 1.0)

        if ak < k1:
            if bk > k1:
                out.append(isect(k1))
                if bk > k2:
                    out.append(isect(k2))
                elif i == n - 2:
                    out.append(b)
        elif ak > k2:
            if bk < k2:
                out.append(isect(k2))
                if bk < k1:
                    out.append(isect(k1))
                elif i == n - 2:
                    out.append(b)
        else:
            out.append(a)
            if bk < k1:
                out.append(isect(k1))
            elif bk > k2:
                out.append(isect(k2))
    if out and out[0] != out[-1]:
        out.append(out[0])
    if not out:
        return _EMPTY, _EMPTY, _EMPTY
    arr = np.asarray(out, dtype=np.float64)
    return arr[:, 0], arr[:, 1], arr[:, 2]


def clip_ring_part(
    px: np.ndarray, py: np.ndarray, pz: np.ndarray, axis: int, k1: float, k2: float
) -> tuple:
    """Clip one ring; returns (xs, ys, zs), possibly empty (clip.rs:263-356)."""
    n = len(px)
    if n < 2:
        return _EMPTY, _EMPTY, _EMPTY
    if n < _SMALL_N:
        return _clip_ring_small(px, py, pz, axis, k1, k2)

    k = px if axis == 0 else py
    o = py if axis == 0 else px
    ak, bk = k[:-1], k[1:]
    ao, bo = o[:-1], o[1:]
    az, bz = pz[:-1], pz[1:]
    m = n - 1
    last = np.zeros(m, dtype=bool)
    last[m - 1] = True

    A = ak < k1
    B = ak > k2
    C = ~A & ~B

    with np.errstate(divide="ignore", invalid="ignore"):
        dk = bk - ak
        t1 = (k1 - ak) / dk
        t2 = (k2 - ak) / dk
        i1o = (bo - ao) * t1 + ao
        i2o = (bo - ao) * t2 + ao

    # ring walk (clip.rs:274-344):
    # A & bk>k1: emit isect(k1); then bk>k2 -> isect(k2) elif last -> b
    # B & bk<k2: emit isect(k2); then bk<k1 -> isect(k1) elif last -> b
    # C: emit a; then bk<k1 -> isect(k1) elif bk>k2 -> isect(k2)
    Ae = A & (bk > k1)
    Be = B & (bk < k2)
    e0 = Ae | Be | C
    e0k = np.where(Ae, k1, np.where(Be, k2, ak))
    e0o = np.where(Ae, i1o, np.where(Be, i2o, ao))
    e0z = np.where(Ae | Be, 1.0, az)

    a_hi = Ae & (bk > k2)
    a_lb = Ae & ~a_hi & last
    b_lo = Be & (bk < k1)
    b_lb = Be & ~b_lo & last
    c_lo = C & (bk < k1)
    c_hi = C & (bk > k2)
    e1 = a_hi | a_lb | b_lo | b_lb | c_lo | c_hi
    s1_i2 = a_hi | c_hi
    s1_i1 = b_lo | c_lo
    e1k = np.where(s1_i2, k2, np.where(s1_i1, k1, bk))
    e1o = np.where(s1_i2, i2o, np.where(s1_i1, i1o, bo))
    e1z = np.where(s1_i2 | s1_i1, 1.0, bz)

    cnt = e0.astype(np.int64) + e1.astype(np.int64)
    total = int(cnt.sum())
    if total == 0:
        return _EMPTY, _EMPTY, _EMPTY
    base = np.zeros(m, dtype=np.int64)
    np.cumsum(cnt[:-1], out=base[1:])

    out_k = np.empty(total, dtype=np.float64)
    out_o = np.empty(total, dtype=np.float64)
    out_z = np.empty(total, dtype=np.float64)
    p0 = base[e0]
    out_k[p0] = e0k[e0]
    out_o[p0] = e0o[e0]
    out_z[p0] = e0z[e0]
    p1 = base[e1] + e0[e1].astype(np.int64)
    out_k[p1] = e1k[e1]
    out_o[p1] = e1o[e1]
    out_z[p1] = e1z[e1]

    if axis == 0:
        out_x, out_y = out_k, out_o
    else:
        out_x, out_y = out_o, out_k

    # close the ring if endpoints differ on (x, y, z) (clip.rs:346-353)
    if (
        out_x[0] != out_x[-1]
        or out_y[0] != out_y[-1]
        or out_z[0] != out_z[-1]
    ):
        out_x = np.append(out_x, out_x[0])
        out_y = np.append(out_y, out_y[0])
        out_z = np.append(out_z, out_z[0])
    return out_x, out_y, out_z


def _clip_parts_line(f: VtFeature, prange, axis, k1, k2, line_metrics):
    """Clip line parts in prange; returns (parts, dists, seg_starts, seg_ends)."""
    parts, dists, sstarts, sends = [], [], [], []
    for p in range(*prange):
        px, py, pz = f.part(p)
        d = float(f.part_dist[p])
        s0 = float(f.part_seg_start[p]) if line_metrics else 0.0
        for sx, sy, sz, s_start, s_end in clip_line_part(
            px, py, pz, axis, k1, k2, line_metrics, s0
        ):
            parts.append((sx, sy, sz))
            dists.append(d)
            sstarts.append(s_start)
            sends.append(s_end)
    return parts, dists, sstarts, sends


def _clip_geometry(f: VtFeature, axis, k1, k2, line_metrics):
    """Clip a (non-GC-aware caller handles GC) feature's geometry.

    Returns (geom_type, parts, part_meta dict, ring_group_sizes or None)
    where parts is a list of (xs,ys,zs).
    """
    gt = f.geom_type
    if gt == GEOM_POINT:
        # kept verbatim (clip.rs:22-24); feature-level bbox check decides
        px, py, pz = f.part(0)
        return gt, [(px, py, pz)], {}, None
    if gt == GEOM_MULTIPOINT:
        px, py, pz = f.part(0)
        k = px if axis == 0 else py
        mask = (k >= k1) & (k <= k2)
        return gt, [(px[mask], py[mask], pz[mask])], {}, None
    if gt in (GEOM_LINESTRING, GEOM_MULTILINESTRING):
        parts, dists, ss, se = _clip_parts_line(
            f, (0, f.nparts), axis, k1, k2, line_metrics
        )
        new_gt = GEOM_LINESTRING if len(parts) == 1 else GEOM_MULTILINESTRING
        meta = dict(
            part_dist=np.asarray(dists, dtype=np.float64),
            part_seg_start=np.asarray(ss, dtype=np.float64),
            part_seg_end=np.asarray(se, dtype=np.float64),
        )
        return new_gt, parts, meta, None
    if gt == GEOM_POLYGON:
        parts, areas = [], []
        for p in range(f.nparts):
            px, py, pz = f.part(p)
            rx, ry, rz = clip_ring_part(px, py, pz, axis, k1, k2)
            if len(rx):
                parts.append((rx, ry, rz))
                areas.append(float(f.part_area[p]))
        meta = dict(part_area=np.asarray(areas, dtype=np.float64))
        return gt, parts, meta, [len(parts)] if parts else []
    if gt == GEOM_MULTIPOLYGON:
        parts, areas, group_sizes = [], [], []
        ro = f.ring_offsets
        for g in range(len(ro) - 1):
            kept = 0
            for p in range(int(ro[g]), int(ro[g + 1])):
                px, py, pz = f.part(p)
                rx, ry, rz = clip_ring_part(px, py, pz, axis, k1, k2)
                if len(rx):
                    parts.append((rx, ry, rz))
                    areas.append(float(f.part_area[p]))
                    kept += 1
            if kept:
                group_sizes.append(kept)
        meta = dict(part_area=np.asarray(areas, dtype=np.float64))
        return gt, parts, meta, group_sizes
    raise AssertionError(f"unexpected geom_type {gt}")


def clip_feature(
    f: VtFeature, axis: int, k1: float, k2: float, line_metrics: bool
) -> List[VtFeature]:
    """Clip one feature -> 0..n features (clip.rs:365-433).

    n > 1 only in line-metrics mode, where MultiLineString slices explode
    into separate features with extended slice_path order keys.
    """
    fmin = f.bbox[axis]
    fmax = f.bbox[axis + 2]
    if fmin >= k1 and fmax < k2:
        return [f]  # trivial accept, unchanged
    if fmax < k1 or fmin >= k2:
        return []  # trivial reject

    from geojson_vt_rs_spark.core.geom import subgeom_view

    meta = f.meta()

    if f.geom_type == GEOM_GEOMETRYCOLLECTION:
        # recurse per sub-geometry, keep all (possibly empty) subs
        all_parts: list = []
        gc_kinds: list = []
        gc_part_counts: list = []
        ring_sizes: list = []
        pd: list = []
        ps: list = []
        pe: list = []
        pa: list = []
        for s in range(len(f.gc_kinds)):
            sub = subgeom_view(f, s)
            gt, parts, pmeta, groups = _clip_geometry(sub, axis, k1, k2, line_metrics)
            gc_kinds.append(gt)
            gc_part_counts.append(len(parts))
            all_parts.extend(parts)
            npp = len(parts)
            pd.extend(pmeta.get("part_dist", np.zeros(npp)).tolist())
            ps.extend(pmeta.get("part_seg_start", np.zeros(npp)).tolist())
            pe.extend(pmeta.get("part_seg_end", np.zeros(npp)).tolist())
            pa.extend(pmeta.get("part_area", np.zeros(npp)).tolist())
            if groups is not None:
                ring_sizes.extend(groups)
        out = make_feature(
            GEOM_GEOMETRYCOLLECTION,
            all_parts,
            ring_group_sizes=ring_sizes if ring_sizes else None,
            gc_kinds=gc_kinds,
            gc_part_counts=gc_part_counts,
            part_dist=np.asarray(pd, dtype=np.float64),
            part_seg_start=np.asarray(ps, dtype=np.float64),
            part_seg_end=np.asarray(pe, dtype=np.float64),
            part_area=np.asarray(pa, dtype=np.float64),
            **meta,
        )
        done = finish_feature(out)
        return [done] if done is not None else []

    gt, parts, pmeta, groups = _clip_geometry(f, axis, k1, k2, line_metrics)

    if gt == GEOM_MULTILINESTRING and line_metrics:
        # explode: one feature per slice (clip.rs:402-422)
        out = []
        width = 6  # fixed width keeps slice_path lexicographic order stable
        for i, part in enumerate(parts):
            sf = make_feature(
                GEOM_LINESTRING,
                [part],
                part_dist=pmeta["part_dist"][i : i + 1],
                part_seg_start=pmeta["part_seg_start"][i : i + 1],
                part_seg_end=pmeta["part_seg_end"][i : i + 1],
                **{**meta, "slice_path": meta["slice_path"] + f"{i:0{width}d}"},
            )
            done = finish_feature(sf)
            if done is not None:
                out.append(done)
        return out

    nf = make_feature(
        gt,
        parts,
        ring_group_sizes=groups,
        gc_kinds=None,
        gc_part_counts=None,
        **pmeta,
        **meta,
    )
    done = finish_feature(nf)
    return [done] if done is not None else []


def clip_features(
    features: list, axis: int, k1: float, k2: float, line_metrics: bool
) -> list:
    """Clip a feature list against band [k1,k2] on ``axis`` (clip.rs:365-433).

    Large lists take a vectorized bbox pre-pass: trivial accepts keep the
    feature object unchanged and trivial rejects drop it — exactly
    clip_feature's own first two branches — so only straddlers pay the
    per-feature clip (points never straddle: bbox_min == bbox_max)."""
    n = len(features)
    if n >= 64:
        lo, hi = (0, 2) if axis == 0 else (1, 3)
        mins = np.fromiter((f.bbox[lo] for f in features), np.float64, count=n)
        maxs = np.fromiter((f.bbox[hi] for f in features), np.float64, count=n)
        acc = (mins >= k1) & (maxs < k2)
        straddle = ~acc & (maxs >= k1) & (mins < k2)
        if not straddle.any():
            return [f for f, a in zip(features, acc.tolist()) if a]
        out = []
        for f, a, s in zip(features, acc.tolist(), straddle.tolist()):
            if a:
                out.append(f)
            elif s:
                out.extend(clip_feature(f, axis, k1, k2, line_metrics))
        return out
    out = []
    for f in features:
        out.extend(clip_feature(f, axis, k1, k2, line_metrics))
    return out
