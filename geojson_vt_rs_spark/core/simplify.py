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

        max_sq = sq_tolerance
        index = 0
        mid = first + ((last - first) >> 1)
        min_pos_to_mid = last - first
        # single pass replicating the scalar scan's argmax + midpoint
        # tie-break semantics exactly (ties at the current max re-select
        # only when strictly closer to mid)
        better = sq > max_sq
        if better.any():
            # process in order, same as the reference loop, but cheaply:
            # the running max only changes at strictly-increasing values.
            order_vals = sq
            running = np.maximum.accumulate(order_vals)
            is_new_max = order_vals >= running
            # fall back to exact scalar semantics over the (few) candidates
            for j in np.nonzero(is_new_max | (order_vals == order_vals.max()))[0]:
                i = first + 1 + int(j)
                sq_dist = float(order_vals[j])
                if sq_dist > max_sq:
                    index = i
                    max_sq = sq_dist
                elif sq_dist == max_sq:
                    pos_to_mid = abs(i - mid)
                    if pos_to_mid < min_pos_to_mid:
                        index = i
                        min_pos_to_mid = pos_to_mid
        else:
            # no point exceeds tolerance; handle exact-tie-with-tolerance
            # candidates (sq == sq_tolerance never triggers: require >)
            pass

        if max_sq > sq_tolerance:
            zs[index] = max_sq
            if index - first > 1:
                stack.append((first, index))
            if last - index > 1:
                stack.append((index, last))
