"""Modified Douglas–Peucker: annotate, don't delete.

Writes each pivot's max squared segment distance into the point's ``z``
as an importance score; later zooms *threshold* ``z > sq_tolerance``
instead of re-simplifying (reference: /root/reference/src/simplify.rs:29-77,
architectural note in SURVEY.md §2.5).  Endpoints are pinned to z=1.0.

The recursion is replaced with an explicit stack; the distance scan per
interval is vectorized numpy.  Tie-break on equal max distance picks the
candidate nearest the interval midpoint (geojson-vt#104 workaround,
simplify.rs:41-50).
"""

from __future__ import annotations

import numpy as np


def simplify(xs: np.ndarray, ys: np.ndarray, zs: np.ndarray, tolerance: float) -> None:
    """In-place importance annotation of one part (simplify.rs:69-77)."""
    n = len(xs)
    if n == 0:
        return
    zs[0] = 1.0
    zs[n - 1] = 1.0
    sq_tolerance = tolerance * tolerance
    if n < 3:
        return

    stack = [(0, n - 1)]
    while stack:
        first, last = stack.pop()
        if last - first - 1 < 24:
            # scalar fast path: tiny intervals are cheaper without numpy
            # dispatch overhead; a straight port of the reference scan
            _simplify_small(xs, ys, zs, first, last, sq_tolerance, stack)
            continue
        # squared distance of interior points to segment (first,last),
        # with endpoint clamping (get_sq_seg_dist, simplify.rs:4-26)
        ax, ay = xs[first], ys[first]
        dx, dy = xs[last] - ax, ys[last] - ay
        px = xs[first + 1 : last]
        py = ys[first + 1 : last]
        d2 = dx * dx + dy * dy
        if d2 != 0.0:
            t = ((px - ax) * dx + (py - ay) * dy) / d2
            cx = np.where(t > 1.0, xs[last], np.where(t > 0.0, ax + dx * t, ax))
            cy = np.where(t > 1.0, ys[last], np.where(t > 0.0, ay + dy * t, ay))
        else:
            cx, cy = ax, ay
        ddx = px - cx
        ddy = py - cy
        sq = ddx * ddx + ddy * ddy

        # Pivot choice (simplify.rs:35-51): with a single occurrence of
        # the max the strict `>` branch picks it.  With TIES, the scan's
        # midpoint tie-break interacts with min_pos_to_mid updates made
        # earlier at LOWER running maxima (the reference then keeps the
        # FIRST max occurrence) — no closed form covers every case, so
        # ties fall back to the literal scalar scan (rare, cheap).
        max_sq = float(sq.max()) if len(sq) else sq_tolerance
        if max_sq > sq_tolerance:
            occ = np.nonzero(sq == max_sq)[0]
            if len(occ) != 1:
                _simplify_small(xs, ys, zs, first, last, sq_tolerance, stack)
                continue
            index = first + 1 + int(occ[0])
            zs[index] = max_sq
            if index - first > 1:
                stack.append((first, index))
            if last - index > 1:
                stack.append((index, last))


def _simplify_small(xs, ys, zs, first, last, sq_tolerance, stack):
    """Scalar scan, literally the reference loop (simplify.rs:29-67)."""
    max_sq = sq_tolerance
    index = 0
    mid = first + ((last - first) >> 1)
    min_pos_to_mid = last - first
    fx = float(xs[first])
    fy = float(ys[first])
    lx = float(xs[last])
    ly = float(ys[last])
    dx0 = lx - fx
    dy0 = ly - fy
    d2 = dx0 * dx0 + dy0 * dy0
    for i in range(first + 1, last):
        px = float(xs[i])
        py = float(ys[i])
        x, y = fx, fy
        if d2 != 0.0:
            t = ((px - fx) * dx0 + (py - fy) * dy0) / d2
            if t > 1.0:
                x, y = lx, ly
            elif t > 0.0:
                x = fx + dx0 * t
                y = fy + dy0 * t
        ddx = px - x
        ddy = py - y
        sq = ddx * ddx + ddy * ddy
        if sq > max_sq:
            index = i
            max_sq = sq
        elif sq == max_sq:
            pos = abs(i - mid)
            if pos < min_pos_to_mid:
                index = i
                min_pos_to_mid = pos
    if max_sq > sq_tolerance:
        zs[index] = max_sq
        if index - first > 1:
            stack.append((first, index))
        if last - index > 1:
            stack.append((index, last))
