"""Antimeridian wrapping: clip three buffered world copies and merge.

Reference: /root/reference/src/wrap.rs:19-43.  Left copy is clipped to
[-1-b, b], right to [1-b, 2+b]; if both are empty the input is returned
unchanged (equivalently: the center clip [-b, 1+b] is then a per-feature
trivial accept, so the merge degenerates to the input).  Otherwise left
is shifted +1, right -1, and the result is ordered left ++ center ++
right (splice-prepend at wrap.rs:35, extend at :40) — the ``world_copy``
tag (0/1/2) preserves that order under distributed execution.
"""

from __future__ import annotations

from dataclasses import replace

from geojson_vt_rs_spark.core.clip import clip_features
from geojson_vt_rs_spark.core.geom import shift_feature_x


def wrap(features: list, buffer: float, line_metrics: bool) -> list:
    left = clip_features(features, 0, -1.0 - buffer, buffer, line_metrics)
    right = clip_features(features, 0, 1.0 - buffer, 2.0 + buffer, line_metrics)

    if not left and not right:
        return features

    merged = clip_features(features, 0, -buffer, 1.0 + buffer, line_metrics)
    merged = [replace(f, world_copy=1) if f.world_copy != 1 else f for f in merged]

    out = []
    for f in left:
        g = shift_feature_x(f, 1.0)
        g.world_copy = 0
        out.append(g)
    out.extend(merged)
    for f in right:
        g = shift_feature_x(f, -1.0)
        g.world_copy = 2
        out.append(g)
    return out
