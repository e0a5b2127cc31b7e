"""Spark stages of the tiling pipeline: convert, wrap, split, emit.

Each stage is declared on DataFrames; geometry math runs in Arrow-batched
pandas kernels (mapInPandas / applyInPandas) over the flat encoding —
no per-row Python objects cross the boundary, and Catalyst sees
bbox/num_points as plain columns for pruning.

Scale notes (100 TB shape):
  * convert/wrap/split are narrow per-row transforms — no shuffle; they
    scale linearly with input splits.
  * the only shuffle per pyramid level is the groupBy(z,x,y) for tile
    emission, keyed by the same (z,x,y) the next split reuses; AQE
    handles skewed (dense-metro) tiles, and hot tiles can additionally be
    salted upstream (plans/pyramid.py).
  * stop-condition evaluation is a tiny per-tile aggregate joined back
    broadcast — never a driver collect of feature rows.
"""

from __future__ import annotations

import json
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geojson_vt_rs_spark.config import Options
from geojson_vt_rs_spark.core.clip import clip_feature
from geojson_vt_rs_spark.core.project import convert_feature
from geojson_vt_rs_spark.core.tile import TileEmitter
from geojson_vt_rs_spark.core.wrap import wrap as core_wrap
from geojson_vt_rs_spark.operators.schema import (
    FEATURE_SCHEMA,
    TILE_ROW_SCHEMA,
    TILED_FEATURE_SCHEMA,
    create_feature_df,
    feature_to_row,
    features_to_pdf,
    pdf_to_features,
)

FEATURE_COLS = [f.name for f in FEATURE_SCHEMA.fields]
TILED_COLS = [f.name for f in TILED_FEATURE_SCHEMA.fields]


def read_geojson_features(spark: SparkSession, path_or_text) -> DataFrame:
    """GeoJSON -> raw lon/lat features DataFrame (FEATURE_SCHEMA)."""
    from geojson_vt_rs_spark.sources.geojson import load_geojson, load_geojson_file

    feats = (
        load_geojson_file(path_or_text)
        if isinstance(path_or_text, str) and path_or_text.endswith(".json")
        else load_geojson(path_or_text)
    )
    pdf = features_to_pdf(feats)
    # works in sessions without Arrow (driver harness) — see sanitize_pdf
    return create_feature_df(spark, pdf, FEATURE_SCHEMA)


def convert_stage(df: DataFrame, tolerance: float, generate_id: bool) -> DataFrame:
    """Project + metrics + DP importance (convert.rs:148-176).

    generate_id uses feature_seq, the deterministic 0-based input order —
    identical to the reference's gen_id counter under any partitioning.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for f in pdf_to_features(pdf):
                if generate_id:
                    f.id_str = None
                    f.id_num = f.feature_seq
                    f.id_float = None
                c = convert_feature(f, tolerance)
                if c is not None:
                    out.append(feature_to_row(c))
            yield pd.DataFrame(out, columns=FEATURE_COLS)

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def convert_wrap_stage(
    df: DataFrame,
    tolerance: float,
    generate_id: bool,
    buffer: float,
    line_metrics: bool,
) -> DataFrame:
    """convert_stage + wrap_stage FUSED into one mapInPandas pass: both
    are per-feature, so composing them in-kernel halves the Arrow
    round-trips of the pipeline head (the wide feature arrays otherwise
    cross JVM<->Python twice back-to-back).  Output is identical to
    wrap_stage(convert_stage(df, ...), ...).

    Columnar fast path (the z0 ingest wave was ~40 of 93s of the 8-core
    1M-point build, ~80us/row of per-feature Python here): single-
    coordinate Point rows project in ONE vectorized pass.  A point's
    convert is just project_points (no metrics, no simplify — zs stay
    0), and its wrap is a no-op whenever buffer < X < 1-buffer (the
    left clip [-1-b, b] and right clip [1-b, 2+b] are then both empty,
    so core_wrap returns the feature unchanged, world_copy included).
    Antimeridian-buffer points and everything else take the per-feature
    path; elementwise math is identical (same project_points call), so
    goldens are unaffected."""
    return df.mapInPandas(
        _convert_wrap_kernel(tolerance, generate_id, buffer, line_metrics),
        schema=FEATURE_SCHEMA,
    )


def _convert_wrap_kernel(
    tolerance: float, generate_id: bool, buffer: float, line_metrics: bool
):
    """The convert+wrap pandas kernel (see convert_wrap_stage) as a
    reusable generator factory — the first-turn wave fuses it in front of
    the render/split kernel."""
    from geojson_vt_rs_spark.core.geom import GEOM_POINT
    from geojson_vt_rs_spark.core.project import project_points

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zero1 = np.zeros(1)
        for pdf in batches:
            is_pt = (
                (pdf["geom_type"].to_numpy() == GEOM_POINT)
                & (pdf["num_points"].to_numpy() == 1)
            )
            if is_pt.any():
                gc = pdf["gc_kinds"].to_numpy()
                is_pt &= np.fromiter(
                    (g is None for g in gc), bool, count=len(gc)
                )
            if is_pt.any():
                X, Y = project_points(
                    np.concatenate(list(pdf["xs"].to_numpy()[is_pt])),
                    np.concatenate(list(pdf["ys"].to_numpy()[is_pt])),
                )
                # strict inequalities: a point exactly ON the buffer
                # boundary is clip-inclusion-sensitive -> per-feature path
                center_only = (X > buffer) & (X < 1.0 - buffer)
                if not center_only.all():
                    is_pt[np.flatnonzero(is_pt)[~center_only]] = False
                    X, Y = X[center_only], Y[center_only]
            if is_pt.any():
                k = int(is_pt.sum())
                seqs = pdf["feature_seq"].to_numpy()[is_pt]
                d = dict(
                    feature_seq=seqs,
                    world_copy=pdf["world_copy"].to_numpy()[is_pt],
                    slice_path=pdf["slice_path"].to_numpy()[is_pt],
                    id_str=(
                        [None] * k if generate_id
                        else pdf["id_str"].to_numpy()[is_pt]
                    ),
                    id_num=(
                        seqs if generate_id
                        else pdf["id_num"].to_numpy()[is_pt]
                    ),
                    id_float=(
                        [None] * k if generate_id
                        else pdf["id_float"].to_numpy()[is_pt]
                    ),
                    props_json=pdf["props_json"].to_numpy()[is_pt],
                    geom_type=pdf["geom_type"].to_numpy()[is_pt],
                    xs=[X[i : i + 1] for i in range(k)],
                    ys=[Y[i : i + 1] for i in range(k)],
                    zs=[zero1] * k,
                    part_offsets=pdf["part_offsets"].to_numpy()[is_pt],
                    ring_offsets=pdf["ring_offsets"].to_numpy()[is_pt],
                    gc_kinds=[None] * k,
                    gc_part_offsets=[None] * k,
                    part_dist=[zero1] * k,
                    part_seg_start=[zero1] * k,
                    part_seg_end=[zero1] * k,
                    part_area=[zero1] * k,
                    bbox_min_x=X,
                    bbox_min_y=Y,
                    bbox_max_x=X,
                    bbox_max_y=Y,
                    num_points=np.ones(k, dtype=np.int32),
                )
                yield pd.DataFrame(d, columns=FEATURE_COLS)
            rest = pdf.loc[~is_pt] if is_pt.any() else pdf
            if len(rest) == 0:
                continue
            out: List[dict] = []
            for f in pdf_to_features(rest):
                if generate_id:
                    f.id_str = None
                    f.id_num = f.feature_seq
                    f.id_float = None
                c = convert_feature(f, tolerance)
                if c is not None:
                    for g in core_wrap([c], buffer, line_metrics):
                        out.append(feature_to_row(g))
            yield pd.DataFrame(out, columns=FEATURE_COLS)

    return kernel


def wrap_stage(df: DataFrame, buffer: float, line_metrics: bool) -> DataFrame:
    """Antimeridian wrap (wrap.rs:19-43) as a single narrow pass.

    Per-feature independent: each feature contributes its left/center/
    right clips tagged world_copy 0/1/2.  Equivalent to the reference's
    global left/right-empty shortcut because when both are empty the
    center clip is a per-feature trivial accept (proof in core/wrap.py).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for f in pdf_to_features(pdf):
                for g in core_wrap([f], buffer, line_metrics):
                    out.append(feature_to_row(g))
            yield pd.DataFrame(out, columns=FEATURE_COLS)

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def split_stage(df: DataFrame, options: Options) -> DataFrame:
    """One pyramid level: tiled features -> up-to-4-way child features.

    Child clip bands use the half buffer p = 0.5*buffer/extent
    (lib.rs:340); x is clipped once and reused for both y children.
    Narrow (no shuffle).

    Columnar fast path: clip_feature's bbox trivial accept returns the
    feature UNCHANGED (clip.rs:385-390), so rows whose bbox makes every
    one of the four child bands a trivial accept or reject are routed
    with pure pandas slicing — no VtFeature construction, no Python
    per-feature work.  In a deep pyramid that is the vast majority of
    rows (a feature straddles child midlines only near the top).  Only
    straddling rows take the per-feature clip path.  The band arithmetic
    uses the same float64 op order as the scalar path, so the
    classification is bit-identical to clip_feature's own checks.
    """
    buffer = options.tile.buffer
    extent = options.tile.extent
    lm = options.tile.line_metrics

    def slow_rows(pdf: pd.DataFrame) -> List[dict]:
        out: List[dict] = []
        zs = pdf["z"].to_numpy()
        xs = pdf["x"].to_numpy()
        ys = pdf["y"].to_numpy()
        for i, f in enumerate(pdf_to_features(pdf)):
            z, x, y = int(zs[i]), int(xs[i]), int(ys[i])
            z2 = float(1 << z)
            p = 0.5 * buffer / extent
            left = clip_feature(f, 0, (x - p) / z2, (x + 0.5 + p) / z2, lm)
            right = clip_feature(f, 0, (x + 0.5 - p) / z2, (x + 1.0 + p) / z2, lm)
            for dx, half in ((0, left), (1, right)):
                for lf in half:
                    top = clip_feature(lf, 1, (y - p) / z2, (y + 0.5 + p) / z2, lm)
                    bot = clip_feature(
                        lf, 1, (y + 0.5 - p) / z2, (y + 1.0 + p) / z2, lm
                    )
                    for dy, quarter in ((0, top), (1, bot)):
                        for qf in quarter:
                            row = feature_to_row(qf)
                            row["z"] = z + 1
                            row["x"] = x * 2 + dx
                            row["y"] = y * 2 + dy
                            out.append(row)
        return out

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = 0.5 * buffer / extent
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(columns=TILED_COLS)
                continue
            z = pdf["z"].to_numpy()
            x = pdf["x"].to_numpy().astype(np.float64)
            y = pdf["y"].to_numpy().astype(np.float64)
            z2 = np.ldexp(1.0, z.astype(np.int64))  # exact float(1 << z)
            xm = pdf["bbox_min_x"].to_numpy()
            xM = pdf["bbox_max_x"].to_numpy()
            ym = pdf["bbox_min_y"].to_numpy()
            yM = pdf["bbox_max_y"].to_numpy()

            def classify(c, bmin, bmax):
                # same op order as the scalar path: (c - p) / z2 etc.
                k1a = (c - p) / z2
                k2a = (c + 0.5 + p) / z2
                k1b = (c + 0.5 - p) / z2
                k2b = (c + 1.0 + p) / z2
                acc_a = (bmin >= k1a) & (bmax < k2a)
                rej_a = (bmax < k1a) | (bmin >= k2a)
                acc_b = (bmin >= k1b) & (bmax < k2b)
                rej_b = (bmax < k1b) | (bmin >= k2b)
                return acc_a, rej_a, acc_b, rej_b

            xa0, xr0, xa1, xr1 = classify(x, xm, xM)
            ya0, yr0, ya1, yr1 = classify(y, ym, yM)
            trivial = (
                (xa0 | xr0) & (xa1 | xr1) & (ya0 | yr0) & (ya1 | yr1)
            )

            parts: List[pd.DataFrame] = []
            for dx, xacc in ((0, xa0), (1, xa1)):
                for dy, yacc in ((0, ya0), (1, ya1)):
                    sel = trivial & xacc & yacc
                    if not sel.any():
                        continue
                    sub = pdf.loc[sel, TILED_COLS].copy(deep=False)
                    sub["z"] = (z[sel] + 1).astype(sub["z"].dtype)
                    sub["x"] = (
                        pdf["x"].to_numpy()[sel] * 2 + dx
                    ).astype(sub["x"].dtype)
                    sub["y"] = (
                        pdf["y"].to_numpy()[sel] * 2 + dy
                    ).astype(sub["y"].dtype)
                    parts.append(sub)
            if not trivial.all():
                slow = slow_rows(pdf.loc[~trivial])
                if slow:
                    parts.append(pd.DataFrame(slow, columns=TILED_COLS))
            for part in parts:
                if len(part):
                    yield part[TILED_COLS]

    return df.mapInPandas(kernel, schema=TILED_FEATURE_SCHEMA)


def clip_xy_stage(
    df: DataFrame,
    x_band: tuple,
    y_band: tuple,
    line_metrics: bool,
) -> DataFrame:
    """One-shot x then y clip (geojson_to_tile path, lib.rs:112-131).

    The bbox trivial-reject predicate is ALSO applied as a Catalyst
    filter before the kernel so rejected features never reach Python.
    """
    xk1, xk2 = x_band
    yk1, yk2 = y_band
    pruned = df.filter(
        ~(
            (F.col("bbox_max_x") < F.lit(xk1))
            | (F.col("bbox_min_x") >= F.lit(xk2))
            | (F.col("bbox_max_y") < F.lit(yk1))
            | (F.col("bbox_min_y") >= F.lit(yk2))
        )
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for f in pdf_to_features(pdf):
                for g in clip_feature(f, 0, xk1, xk2, line_metrics):
                    for h in clip_feature(g, 1, yk1, yk2, line_metrics):
                        out.append(feature_to_row(h))
            yield pd.DataFrame(out, columns=FEATURE_COLS)

    return pruned.mapInPandas(kernel, schema=FEATURE_SCHEMA)


RENDER_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("x", T.IntegerType(), False),
        T.StructField("y", T.IntegerType(), False),
        T.StructField("world_copy", T.IntegerType()),
        T.StructField("feature_seq", T.LongType()),
        T.StructField("slice_path", T.StringType()),
        T.StructField("sub_idx", T.IntegerType()),
        T.StructField("type", T.IntegerType()),
        T.StructField("kind", T.IntegerType()),
        T.StructField("geometry_json", T.StringType()),
        T.StructField("tags_json", T.StringType()),
        T.StructField("id_str", T.StringType()),
        T.StructField("id_num", T.LongType()),
        T.StructField("id_float", T.DoubleType()),
        T.StructField("n_emitted", T.IntegerType()),
    ]
)

RENDER_COLS = [f.name for f in RENDER_SCHEMA.fields]


def batch_pre_transform(pdf: pd.DataFrame, extent: int, tol: float,
                        max_zoom: int):
    """Cross-feature columnar render: transform EVERY point of the Arrow
    batch to tile-local int64 coords in one numpy pass, with each row's
    (z2, x, y, sq_tolerance) broadcast per point via np.repeat.

    Elementwise identical to TileEmitter._transform / the per-part z
    filter — same op order ((xs*z2 - x)*extent, half-away round,
    tolerance = tol/(z2*extent), keep = zs > tol^2) — so the golden
    corpora stay exact through this path (asserted by the dual-path
    golden tests).  Per-part numpy dispatch overhead was the dominant
    render cost at fixture shapes (CLAUDE.md perf findings): one
    transform per BATCH replaces 2 transforms per part.

    Returns (offs, tx, ty, keep): row i's slice is offs[i]:offs[i+1].
    """
    from geojson_vt_rs_spark.core.tile import _round_half_away

    n = len(pdf)
    xs_col = pdf["xs"].to_numpy()
    ys_col = pdf["ys"].to_numpy()
    zs_col = pdf["zs"].to_numpy()
    lens = np.fromiter(
        (0 if v is None else len(v) for v in xs_col), np.int64, count=n
    )
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    if total == 0:
        e_i = np.empty(0, np.int64)
        return offs, e_i, e_i, np.empty(0, bool)
    all_x = np.concatenate(
        [np.asarray(v, np.float64) for v in xs_col if v is not None]
    )
    all_y = np.concatenate(
        [np.asarray(v, np.float64) for v in ys_col if v is not None]
    )
    all_z = np.concatenate(
        [np.asarray(v, np.float64) for v in zs_col if v is not None]
    )
    z = pdf["z"].to_numpy().astype(np.int64)
    z2r = np.ldexp(1.0, z)  # exact float(1 << z)
    ext = float(extent)
    tolr = np.where(z == max_zoom, 0.0, tol / (z2r * ext))
    rep_z2 = np.repeat(z2r, lens)
    rep_x = np.repeat(pdf["x"].to_numpy().astype(np.float64), lens)
    rep_y = np.repeat(pdf["y"].to_numpy().astype(np.float64), lens)
    rep_sq = np.repeat(tolr * tolr, lens)
    tx = _round_half_away((all_x * rep_z2 - rep_x) * ext).astype(np.int64)
    ty = _round_half_away((all_y * rep_z2 - rep_y) * ext).astype(np.int64)
    keep = all_z > rep_sq
    return offs, tx, ty, keep


def render_stage(df: DataFrame, options) -> DataFrame:
    """Per-ROW tile rendering (tile.rs:105-297 per feature).

    Rendering a tile is decomposable: every feature transforms and
    filters independently (GC flattening yields several output features,
    ordered by sub_idx); per-tile num_simplified is the sum of the
    per-row n_emitted.  This keeps giant tiles (a z0 root with millions
    of features) fully row-parallel — the reference's sequential
    InternalTile::new loop is just the serial schedule of this map.
    feature_idx is assigned later from the deterministic sort key
    (world_copy, feature_seq, slice_path, sub_idx).
    """
    extent = options.tile.extent
    tol = options.tile.tolerance
    max_zoom = options.max_zoom
    lm = options.tile.line_metrics

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            zs = pdf["z"].to_numpy()
            xs_ = pdf["x"].to_numpy()
            ys_ = pdf["y"].to_numpy()
            wc = pdf["world_copy"].to_numpy()
            seq = pdf["feature_seq"].to_numpy()
            sp = pdf["slice_path"].to_numpy()
            offs, btx, bty, bkeep = batch_pre_transform(
                pdf, extent, tol, max_zoom
            )
            for i, f in enumerate(pdf_to_features(pdf)):
                z, x, y = int(zs[i]), int(xs_[i]), int(ys_[i])
                tolerance = 0.0 if z == max_zoom else tol / (float(1 << z) * extent)
                em = TileEmitter(z, x, y, extent, tolerance, lm)
                a, b = offs[i], offs[i + 1]
                em.add_feature(f, pre=(btx[a:b], bty[a:b], bkeep[a:b]))
                if not em.features:
                    # still contributes num_simplified? no features kept,
                    # but transform_point calls may have run (e.g. points
                    # filtered later) — keep the counter row
                    if em.num_simplified:
                        out.append(
                            dict.fromkeys(RENDER_COLS)
                            | dict(
                                z=z, x=x, y=y,
                                world_copy=int(wc[i]), feature_seq=int(seq[i]),
                                slice_path=sp[i], sub_idx=-1,
                                n_emitted=em.num_simplified,
                            )
                        )
                    continue
                for si, tf in enumerate(em.features):
                    out.append(
                        dict(
                            z=z, x=x, y=y,
                            world_copy=int(wc[i]),
                            feature_seq=int(seq[i]),
                            slice_path=sp[i],
                            sub_idx=si,
                            type=tf["type"],
                            kind=tf["kind"],
                            geometry_json=json.dumps(
                                tf["geometry"], separators=(",", ":")
                            ),
                            tags_json=(
                                None
                                if tf["tags"] is None
                                else json.dumps(tf["tags"], separators=(",", ":"))
                            ),
                            id_str=tf["id_str"],
                            id_num=tf["id_num"],
                            id_float=tf["id_float"],
                            n_emitted=em.num_simplified if si == 0 else 0,
                        )
                    )
            yield pd.DataFrame(out, columns=RENDER_COLS)

    return df.mapInPandas(kernel, schema=RENDER_SCHEMA)


# fused render+split output: one row stream discriminated by row_kind
RS_RENDER = 0
RS_CHILD = 1
# map-side partial child-point counts: one row per (child tile, batch)
# carrying sum(num_points) in num_points — the driver's next-level
# decision agg finishes these index-sized partials in pandas, so a
# pyramid level needs NO separate Spark agg job (one wave per level)
RS_CAGG = 2
# retained-leaf source rows (drill_descend_stage output only): rows of a
# tile the drill leaves as-is, destined for the leaves store
RS_LEAF = 3

_RS_RENDER_ONLY = ["sub_idx", "type", "kind", "geometry_json", "tags_json",
                   "n_emitted"]
RS_SCHEMA = T.StructType(
    [T.StructField("row_kind", T.IntegerType(), False)]
    + list(TILED_FEATURE_SCHEMA.fields)
    + [
        T.StructField("sub_idx", T.IntegerType()),
        T.StructField("type", T.IntegerType()),
        T.StructField("kind", T.IntegerType()),
        T.StructField("geometry_json", T.StringType()),
        T.StructField("tags_json", T.StringType()),
        T.StructField("n_emitted", T.IntegerType()),
    ]
)
RS_COLS = [f.name for f in RS_SCHEMA.fields]


def _rs_body(options: Options):
    """Factory for the render+split PER-BATCH body shared by
    render_split_stage (one call per level) and drill_descend_stage (one
    call per level per batch, looped in-kernel).  Returns
    ``body(pdf) -> (parts, cagg)``: ``parts`` is a list of RS_COLS
    DataFrames (RS_RENDER / RS_CHILD rows), ``cagg`` the batch's child
    (num_points, row_count) partials keyed by (z, x, y)."""
    buffer = options.tile.buffer
    extent = options.tile.extent
    tol = options.tile.tolerance
    max_zoom = options.max_zoom
    lm = options.tile.line_metrics
    p = 0.5 * buffer / extent

    from geojson_vt_rs_spark.core.geom import GEOM_POINT
    from geojson_vt_rs_spark.core.tile import TYPE_POINT, _round_half_away

    _MISS = object()
    tags_cache: dict = {}

    def canon_tags(p):
        # canonical tags_json == json.dumps(json.loads(p)) with empty
        # props -> None (tile.rs:86-90); cached per distinct string
        if not isinstance(p, str):
            return None
        r = tags_cache.get(p, _MISS)
        if r is _MISS:
            t = json.loads(p)
            r = None if not t else json.dumps(t, separators=(",", ":"))
            tags_cache[p] = r
        return r

    def body(pdf: pd.DataFrame):
            z = pdf["z"].to_numpy()
            x = pdf["x"].to_numpy()
            y = pdf["y"].to_numpy()
            is_split = (pdf["action"] == "split").to_numpy()
            wc = pdf["world_copy"].to_numpy()
            seq = pdf["feature_seq"].to_numpy()
            sp = pdf["slice_path"].to_numpy()
            # single-coordinate Point rows: a point never straddles a
            # split band (bmin == bmax -> always trivial accept/reject),
            # so the split side is always the pandas passthrough below
            # and the render side is ONE vectorized transform — no
            # VtFeature / TileEmitter per row (the LargeGeoJSON shape:
            # 10^6-point inputs are render-bound without this)
            is_pt = (
                (pdf["geom_type"].to_numpy() == GEOM_POINT)
                & (pdf["num_points"].to_numpy() == 1)
            )

            # --- vectorized split classification (split rows only) ----
            xf = x.astype(np.float64)
            yf = y.astype(np.float64)
            z2v = np.ldexp(1.0, z.astype(np.int64))

            def classify(c, bmin, bmax):
                k1a = (c - p) / z2v
                k2a = (c + 0.5 + p) / z2v
                k1b = (c + 0.5 - p) / z2v
                k2b = (c + 1.0 + p) / z2v
                acc_a = (bmin >= k1a) & (bmax < k2a)
                rej_a = (bmax < k1a) | (bmin >= k2a)
                acc_b = (bmin >= k1b) & (bmax < k2b)
                rej_b = (bmax < k1b) | (bmin >= k2b)
                return acc_a, rej_a, acc_b, rej_b

            xm = pdf["bbox_min_x"].to_numpy()
            xM = pdf["bbox_max_x"].to_numpy()
            ym = pdf["bbox_min_y"].to_numpy()
            yM = pdf["bbox_max_y"].to_numpy()
            xa0, xr0, xa1, xr1 = classify(xf, xm, xM)
            ya0, yr0, ya1, yr1 = classify(yf, ym, yM)
            trivial = (
                (xa0 | xr0) & (xa1 | xr1) & (ya0 | yr0) & (ya1 | yr1)
            )
            passthrough = is_split & trivial
            slow_split = is_split & ~trivial

            parts: List[pd.DataFrame] = []
            cagg: dict = {}  # (z,x,y) -> this batch's child point partial
            # pass-through children: pure pandas slicing
            for dx, xacc in ((0, xa0), (1, xa1)):
                for dy, yacc in ((0, ya0), (1, ya1)):
                    sel = passthrough & xacc & yacc
                    if not sel.any():
                        continue
                    sub = pdf.loc[sel, TILED_COLS].copy(deep=False)
                    sub["z"] = (z[sel] + 1).astype(sub["z"].dtype)
                    sub["x"] = (x[sel] * 2 + dx).astype(sub["x"].dtype)
                    sub["y"] = (y[sel] * 2 + dy).astype(sub["y"].dtype)
                    sub.insert(0, "row_kind", RS_CHILD)
                    for c in _RS_RENDER_ONLY:
                        # explicit object-dtype nulls: keeps Arrow types
                        # clean and silences pandas' all-NA concat warning
                        # (np.full fills at C speed — a [None]*n list pays
                        # pandas' per-element listlike construction)
                        sub[c] = pd.Series(
                            np.full(len(sub), None, dtype=object),
                            index=sub.index,
                        )
                    parts.append(sub)
                    g = sub.groupby(["z", "x", "y"], sort=False)[
                        "num_points"
                    ].agg(["sum", "size"])
                    for k, pts, cnt in zip(
                        g.index, g["sum"].tolist(), g["size"].tolist()
                    ):
                        old = cagg.get(k, (0, 0))
                        cagg[k] = (old[0] + int(pts), old[1] + int(cnt))

            # vectorized render of the single-coordinate Point rows
            if is_pt.any():
                n_pt = int(is_pt.sum())
                zp = z[is_pt].astype(np.int64)
                z2p = np.ldexp(1.0, zp)
                ext_f = float(extent)
                lon = np.concatenate(list(pdf["xs"].to_numpy()[is_pt]))
                latv = np.concatenate(list(pdf["ys"].to_numpy()[is_pt]))
                txp = _round_half_away(
                    (lon * z2p - x[is_pt].astype(np.float64)) * ext_f
                ).astype(np.int64)
                typ = _round_half_away(
                    (latv * z2p - y[is_pt].astype(np.float64)) * ext_f
                ).astype(np.int64)
                d = {
                    c: np.full(n_pt, None, dtype=object) for c in RS_COLS
                }
                d.update(
                    row_kind=RS_RENDER,
                    z=z[is_pt], x=x[is_pt], y=y[is_pt],
                    world_copy=wc[is_pt],
                    feature_seq=seq[is_pt],
                    slice_path=sp[is_pt],
                    sub_idx=0,
                    type=TYPE_POINT,
                    kind=GEOM_POINT,
                    geometry_json=[
                        f"[[{a},{b}]]"
                        for a, b in zip(txp.tolist(), typ.tolist())
                    ],
                    tags_json=[
                        canon_tags(p)
                        for p in pdf["props_json"].to_numpy()[is_pt]
                    ],
                    id_str=pdf["id_str"].to_numpy()[is_pt],
                    id_num=pdf["id_num"].to_numpy()[is_pt],
                    id_float=pdf["id_float"].to_numpy()[is_pt],
                    n_emitted=1,
                )
                parts.append(pd.DataFrame(d, columns=RS_COLS))

            # one per-feature pass over the REST: render + clip straddlers;
            # the whole batch's transform ran in ONE numpy pass upstream
            pdf_np = pdf.loc[~is_pt]
            offs, btx, bty, bkeep = batch_pre_transform(
                pdf_np, extent, tol, max_zoom
            )
            z_np, x_np, y_np = z[~is_pt], x[~is_pt], y[~is_pt]
            wc_np, seq_np, sp_np = wc[~is_pt], seq[~is_pt], sp[~is_pt]
            slow_np = slow_split[~is_pt]
            out: List[dict] = []
            for i, f in enumerate(pdf_to_features(pdf_np)):
                zi, xi, yi = int(z_np[i]), int(x_np[i]), int(y_np[i])
                z2 = float(1 << zi)
                tolerance = (
                    0.0 if zi == max_zoom else tol / (z2 * extent)
                )
                em = TileEmitter(zi, xi, yi, extent, tolerance, lm)
                a, b = offs[i], offs[i + 1]
                em.add_feature(f, pre=(btx[a:b], bty[a:b], bkeep[a:b]))
                base = dict.fromkeys(RS_COLS) | dict(
                    row_kind=RS_RENDER, z=zi, x=xi, y=yi,
                    world_copy=int(wc_np[i]), feature_seq=int(seq_np[i]),
                    slice_path=sp_np[i],
                )
                if not em.features:
                    if em.num_simplified:
                        out.append(
                            base | dict(sub_idx=-1, n_emitted=em.num_simplified)
                        )
                else:
                    for si, tf in enumerate(em.features):
                        out.append(
                            base
                            | dict(
                                sub_idx=si,
                                type=tf["type"],
                                kind=tf["kind"],
                                geometry_json=json.dumps(
                                    tf["geometry"], separators=(",", ":")
                                ),
                                tags_json=(
                                    None
                                    if tf["tags"] is None
                                    else json.dumps(
                                        tf["tags"], separators=(",", ":")
                                    )
                                ),
                                id_str=tf["id_str"],
                                id_num=tf["id_num"],
                                id_float=tf["id_float"],
                                n_emitted=(
                                    em.num_simplified if si == 0 else 0
                                ),
                            )
                        )
                if slow_np[i]:
                    left = clip_feature(
                        f, 0, (xi - p) / z2, (xi + 0.5 + p) / z2, lm
                    )
                    right = clip_feature(
                        f, 0, (xi + 0.5 - p) / z2, (xi + 1.0 + p) / z2, lm
                    )
                    for dx, half in ((0, left), (1, right)):
                        for lf in half:
                            top = clip_feature(
                                lf, 1, (yi - p) / z2, (yi + 0.5 + p) / z2, lm
                            )
                            bot = clip_feature(
                                lf, 1, (yi + 0.5 - p) / z2,
                                (yi + 1.0 + p) / z2, lm,
                            )
                            for dy, quarter in ((0, top), (1, bot)):
                                for qf in quarter:
                                    row = dict.fromkeys(RS_COLS)
                                    row.update(feature_to_row(qf))
                                    row["row_kind"] = RS_CHILD
                                    row["z"] = zi + 1
                                    row["x"] = xi * 2 + dx
                                    row["y"] = yi * 2 + dy
                                    out.append(row)
                                    ck = (zi + 1, xi * 2 + dx, yi * 2 + dy)
                                    old = cagg.get(ck, (0, 0))
                                    cagg[ck] = (
                                        old[0] + qf.num_points,
                                        old[1] + 1,
                                    )
            if out:
                parts.append(pd.DataFrame(out, columns=RS_COLS))
            return parts, cagg

    return body


def _rs_cagg_frame(cagg: dict, sub_idx=None) -> pd.DataFrame:
    """(z,x,y) -> (num_points, row_count) partials as RS_CAGG rows.
    n_emitted doubles as the partial child ROW count so the driver can
    finish n_children without a job.  ``sub_idx=-1`` marks PARENT
    partials (the input tiles' own point sums, emitted by the optimistic
    first wave) apart from the default child partials (sub_idx NULL)."""
    keys = list(cagg)
    d = {c: [None] * len(keys) for c in RS_COLS}
    d.update(
        row_kind=RS_CAGG,
        z=[k[0] for k in keys],
        x=[k[1] for k in keys],
        y=[k[2] for k in keys],
        num_points=[int(v[0]) for v in cagg.values()],
        n_emitted=[int(v[1]) for v in cagg.values()],
    )
    if sub_idx is not None:
        d["sub_idx"] = sub_idx
    return pd.DataFrame(d, columns=RS_COLS)


def render_split_stage(
    df: DataFrame, options: Options, emit_parent_cagg: bool = False
) -> DataFrame:
    """ONE Python pass per pyramid level: renders every row (RS_RENDER
    rows, the per-feature RENDER_SCHEMA payload) and, for rows whose tile
    the driver decided to split (action == 'split'), also emits the child
    features (RS_CHILD rows) — the VtFeature is constructed once and
    shared by both, and the level runs one Spark job instead of a render
    job plus a split job.

    The split side keeps split_stage's columnar fast path: bbox-contained
    rows pass through as pandas slices with no per-feature Python.
    Input must carry the driver's ``action`` column ('leaf'/'split').

    ``emit_parent_cagg=True`` additionally emits per-batch partials of
    the INPUT tiles' own point sums as RS_CAGG rows with sub_idx = -1 —
    the optimistic first wave decides leaf-vs-split AFTER rendering from
    these, so the first level needs no separate decision agg job."""
    return df.mapInPandas(
        _render_split_kernel(options, emit_parent_cagg), schema=RS_SCHEMA
    )


def _render_split_kernel(options: Options, emit_parent_cagg: bool = False):
    """The render/split pandas kernel (see render_split_stage) as a
    reusable generator factory — composable behind the convert+wrap
    kernel for the fused first-turn wave."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        body = _rs_body(options)
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(columns=RS_COLS)
                continue
            parts, cagg = body(pdf)
            if cagg:
                parts.append(_rs_cagg_frame(cagg))
            if emit_parent_cagg:
                g = pdf.groupby(["z", "x", "y"], sort=False)[
                    "num_points"
                ].agg(["sum", "size"])
                pc = {
                    k: (int(s), int(c))
                    for k, s, c in zip(
                        g.index, g["sum"].tolist(), g["size"].tolist()
                    )
                }
                parts.append(_rs_cagg_frame(pc, sub_idx=-1))
            # yield each part as its own Arrow batch: pd.concat of mixed
            # all-NA object frames triggers an elementwise NA scan (~4s
            # per 100k-row batch measured) that the separate batches skip
            for part in parts:
                if len(part):
                    yield part[RS_COLS]

    return kernel


def convert_wrap_render_split_stage(
    df: DataFrame,
    tolerance: float,
    generate_id: bool,
    buffer: float,
    line_metrics: bool,
    options: Options,
    root: tuple = (0, 0, 0),
) -> DataFrame:
    """The ENTIRE optimistic first turn as ONE Python pass: raw features
    -> convert+wrap -> render root + clip children (+ parent RS_CAGG
    partials).  Composing the two kernels inside one mapInPandas saves a
    full-table Arrow round-trip at the pipeline head (consecutive
    mapInPandas operators each pay JVM->worker->JVM serde even within a
    stage), and the constant (z, x, y, action='split') columns the
    decision join used to add are synthesized in-kernel — byte-identical
    output to render_split_stage(frontier JOIN decisions) because the
    optimistic decision table is the single row (root, 'split')."""
    cw = _convert_wrap_kernel(tolerance, generate_id, buffer, line_metrics)
    rs = _render_split_kernel(options, emit_parent_cagg=True)
    rz, rx, ry = root

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def tiled() -> Iterator[pd.DataFrame]:
            for pdf in cw(batches):
                n = len(pdf)
                if n == 0:
                    continue
                pdf = pdf.copy(deep=False)
                pdf.insert(0, "z", np.full(n, rz, dtype=np.int32))
                pdf.insert(1, "x", np.full(n, rx, dtype=np.int32))
                pdf.insert(2, "y", np.full(n, ry, dtype=np.int32))
                pdf["action"] = "split"
                yield pdf

        yield from rs(tiled())

    return df.mapInPandas(kernel, schema=RS_SCHEMA)


def drill_descend_stage(
    df: DataFrame, options: Options, root: tuple, target: tuple,
    tile_sink: dict | None = None,
) -> DataFrame:
    """The ENTIRE root-to-target drill descent as ONE feature-parallel
    mapInPandas pass (get_tile cold-miss path, lib.rs:184-223).

    Key property making this possible: unlike the build, a drill's
    per-tile decisions are purely STRUCTURAL — a tile stops at max_zoom,
    is a leaf at the target zoom or off the target path, and otherwise
    splits (lib.rs:324-338).  No per-tile point count is needed, so no
    per-level driver round-trip: each batch of the ancestor's retained
    leaf rows walks all levels in-kernel (5-7 levels of the former loop
    = 5-7 Spark jobs + Arrow round-trips collapse into one job), while
    the rendering work stays parallel across partitions — the
    single-task fused-subtree alternative serializes ~tnp * depth
    feature emissions (measured 116s vs this pass's one wave at 1M
    points).

    Output row kinds: RS_RENDER (rendered tile features, with the
    persisted order keys), RS_LEAF (retained source rows of leaf tiles),
    RS_CAGG (per-tile (tnp, n_emitted) partials — num_points carries the
    tile's source-point sum, n_emitted the rendered-emission sum — the
    driver finishes stats rows from these without another job).

    ``tile_sink={"path": staging_dir, "existing": tile_key_set}`` moves
    the RS_RENDER rows OUT of the Arrow output entirely: each task
    writes its rendered tile features straight into the staging dir as
    store-schema parquet (pyarrow, one file per (task, z), dot-prefixed
    tmp + atomic os.replace under a DETERMINISTIC final name — retried
    or speculatively duplicated tasks overwrite with identical content,
    so the write is idempotent and the caller's stage-then-rename commit
    point is unchanged).  The render rows are ~85 % of the pass's output
    volume and only ever existed to be parquet-written by a follow-up
    job: sinking them in-kernel removes their Python->JVM boundary
    crossing, the JVM cache copy, AND the separate write job (4M drill
    pass 19.7 s -> see OPTIMIZATION_r06.md).  Rows of tiles already in
    ``existing`` are excluded in-kernel (the former broadcast
    anti-join); stats partials still count them, matching the Spark
    path.  The staging dir must be a shared POSIX path — the same
    contract CheckpointedPyramid's rename-based commits already
    require."""
    az, ax, ay = root
    cz, cx, cy = target
    max_zoom = options.max_zoom

    sink_path = None
    arrow_schema = None
    ex_keys = None
    if tile_sink is not None:
        from pyspark.sql.pandas.types import to_arrow_schema

        from geojson_vt_rs_spark.operators.schema import TILE_STORE_DDL

        store = T.StructType.fromDDL(TILE_STORE_DDL)
        arrow_schema = to_arrow_schema(
            T.StructType([f for f in store.fields if f.name != "z"])
        )
        sink_path = tile_sink["path"]
        ex_keys = np.asarray(
            sorted(
                (int(tz) << 56) | (int(tx) << 28) | int(ty)
                for tz, tx, ty in (tile_sink.get("existing") or ())
            ),
            dtype=np.int64,
        )

    def decide(tz: int, tx: int, ty: int) -> str:
        if tz == max_zoom:
            return "stop"
        if tz == cz:
            return "leaf"
        m = 1 << (cz - tz)
        return "split" if (tx == cx // m and ty == cy // m) else "leaf"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        body = _rs_body(options)
        if tile_sink is not None:
            import pyarrow as pa

            buf: dict = {}  # z -> [store-schema RecordBatch, ...]

            def sink_buffer(rend: pd.DataFrame) -> None:
                # store-shape the render rows (the column mapping the
                # Spark-side tiles write performed) and hold them as
                # Arrow batches until the task finishes
                zs = rend["z"].to_numpy().astype(np.int64)
                xs_ = rend["x"].to_numpy().astype(np.int64)
                ys_ = rend["y"].to_numpy().astype(np.int64)
                keep = np.asarray(
                    rend["sub_idx"].to_numpy() >= 0, dtype=bool
                )
                if len(ex_keys):
                    keep = keep & ~np.isin(
                        (zs << 56) | (xs_ << 28) | ys_, ex_keys
                    )
                if not keep.any():
                    return
                if not keep.all():
                    rend = rend.loc[keep]
                    zs = zs[keep]
                for zv in np.unique(zs):
                    m = zs == zv
                    sub = rend if m.all() else rend.loc[m]
                    n = len(sub)
                    none_i = np.full(n, None, dtype=object)
                    pdf_out = pd.DataFrame(
                        {
                            "x": sub["x"].to_numpy(),
                            "y": sub["y"].to_numpy(),
                            "feature_idx": none_i,
                            "type": sub["type"].to_numpy(),
                            "kind": sub["kind"].to_numpy(),
                            "geometry_json": sub["geometry_json"].to_numpy(),
                            "tags_json": sub["tags_json"].to_numpy(),
                            "tile_id_str": sub["id_str"].to_numpy(),
                            "tile_id_num": sub["id_num"].to_numpy(),
                            "tile_id_float": sub["id_float"].to_numpy(),
                            "tile_num_points": none_i,
                            "tile_num_simplified": none_i,
                            "action": np.full(n, "drill", dtype=object),
                            "world_copy": sub["world_copy"].to_numpy(),
                            "feature_seq": sub["feature_seq"].to_numpy(),
                            "slice_path": sub["slice_path"].to_numpy(),
                            "sub_idx": sub["sub_idx"].to_numpy(),
                        }
                    )
                    buf.setdefault(int(zv), []).append(
                        pa.RecordBatch.from_pandas(
                            pdf_out, schema=arrow_schema,
                            preserve_index=False,
                        )
                    )

            def sink_flush() -> None:
                if not buf:
                    return
                import os

                import pyarrow.parquet as pq
                from pyspark import TaskContext

                ctx = TaskContext.get()
                pid = ctx.partitionId() if ctx is not None else 0
                att = ctx.taskAttemptId() if ctx is not None else 0
                for zv, batches_z in buf.items():
                    d = os.path.join(sink_path, f"z={zv}")
                    os.makedirs(d, exist_ok=True)
                    final = os.path.join(d, f"part-{pid:05d}.parquet")
                    tmp = os.path.join(d, f".part-{pid:05d}.tmp{att}")
                    pq.write_table(
                        pa.Table.from_batches(batches_z, schema=arrow_schema),
                        tmp,
                        compression="snappy",
                    )
                    os.replace(tmp, final)
                buf.clear()

        for pdf in batches:
            if pdf.empty:
                continue
            stats: dict = {}  # (z,x,y) -> [tnp_partial, ns_partial]
            cur = pdf
            while len(cur):
                # the frontier holds at most 4 distinct tiles (the
                # previous path tile's children; the root at entry) —
                # dedupe first and assign actions with one vectorized
                # mask per tile (a per-row itertuples pass cost ~20 %
                # of the kernel at 10^5-row frontiers)
                zc = cur["z"].to_numpy()
                xc = cur["x"].to_numpy()
                yc = cur["y"].to_numpy()
                tiles = {
                    (int(tz), int(tx), int(ty))
                    for tz, tx, ty in cur[["z", "x", "y"]]
                    .drop_duplicates()
                    .itertuples(index=False)
                }
                amap = {t: decide(*t) for t in tiles}
                action = np.empty(len(cur), dtype=object)
                for (tz, tx, ty), act in amap.items():
                    action[(zc == tz) & (xc == tx) & (yc == ty)] = act
                cur = cur.reset_index(drop=True)
                cur["action"] = action
                # tnp partial per tile from its source rows
                g = cur.groupby(["z", "x", "y"], sort=False)["num_points"].sum()
                for k, v in g.items():
                    key = (int(k[0]), int(k[1]), int(k[2]))
                    stats.setdefault(key, [0, 0])[0] += int(v)
                # retained leaves out (target tile included; 'stop' tiles
                # render but retain nothing, matching the level loop)
                leaf_sel = (cur["action"] == "leaf").to_numpy()
                if leaf_sel.any():
                    lv = cur.loc[leaf_sel, TILED_COLS].copy(deep=False)
                    lv.insert(0, "row_kind", RS_LEAF)
                    for c in _RS_RENDER_ONLY:
                        lv[c] = pd.Series(
                            np.full(len(lv), None, dtype=object),
                            index=lv.index,
                        )
                    yield lv[RS_COLS]
                parts, _cagg = body(cur)
                nxt = []
                for part in parts:
                    rend = part[part["row_kind"] == RS_RENDER]
                    if len(rend):
                        # ns partial per tile from the render rows
                        ns = rend.groupby(["z", "x", "y"], sort=False)[
                            "n_emitted"
                        ].sum()
                        for k, v in ns.items():
                            key = (int(k[0]), int(k[1]), int(k[2]))
                            stats.setdefault(key, [0, 0])[1] += int(v)
                        if tile_sink is None:
                            yield rend[RS_COLS]
                        else:
                            sink_buffer(rend)
                    ch = part[part["row_kind"] == RS_CHILD]
                    if len(ch):
                        nxt.append(ch[TILED_COLS])
                # exactly one tile splits per level (the path tile), so
                # nxt is nearly always a single frame — skip the concat
                # (whose all-NA object scan costs ~0.2 s per 10^5 rows)
                if not nxt:
                    cur = pd.DataFrame(columns=TILED_COLS)
                elif len(nxt) == 1:
                    cur = nxt[0].reset_index(drop=True)
                else:
                    cur = pd.concat(nxt, ignore_index=True)
            if stats:
                yield _rs_cagg_frame(stats)[RS_COLS]
        if tile_sink is not None:
            sink_flush()

    return df.mapInPandas(kernel, schema=RS_SCHEMA)


def _emit_rows(
    feats_pdf: pd.DataFrame,
    z: int,
    x: int,
    y: int,
    extent: int,
    tolerance: float,
    line_metrics: bool,
) -> List[dict]:
    """Render one tile group -> TILE_ROW_SCHEMA dicts (incl. stats row)."""
    em = TileEmitter(z, x, y, extent, tolerance, line_metrics)
    ordered = feats_pdf.sort_values(
        ["world_copy", "feature_seq", "slice_path"], kind="stable"
    )
    for f in pdf_to_features(ordered):
        em.add_feature(f)
    rows = []
    for idx, tf in enumerate(em.features):
        rows.append(
            dict(
                z=z,
                x=x,
                y=y,
                feature_idx=idx,
                type=tf["type"],
                kind=tf["kind"],
                geometry_json=json.dumps(tf["geometry"], separators=(",", ":")),
                tags_json=(
                    None
                    if tf["tags"] is None
                    else json.dumps(tf["tags"], separators=(",", ":"))
                ),
                id_str=tf["id_str"],
                id_num=tf["id_num"],
                id_float=tf["id_float"],
                num_points=em.num_points,
                num_simplified=em.num_simplified,
            )
        )
    rows.append(
        dict(
            z=z,
            x=x,
            y=y,
            feature_idx=-1,
            type=None,
            kind=None,
            geometry_json=None,
            tags_json=None,
            id_str=None,
            id_num=None,
            id_float=None,
            num_points=em.num_points,
            num_simplified=em.num_simplified,
        )
    )
    return rows


def emit_stage(df: DataFrame, options: Options) -> DataFrame:
    """Render every (z,x,y) group into tile rows (tile.rs:43-101).

    The groupBy shuffle is the pyramid's only exchange per level; its key
    (z,x,y) is exactly the key of the downstream write partitioning.
    """
    extent = options.tile.extent
    tol = options.tile.tolerance
    max_zoom = options.max_zoom
    lm = options.tile.line_metrics

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = int(key[0]), int(key[1]), int(key[2])
        tolerance = 0.0 if z == max_zoom else tol / (float(1 << z) * extent)
        rows = _emit_rows(pdf, z, x, y, extent, tolerance, lm)
        return pd.DataFrame(rows, columns=[f.name for f in TILE_ROW_SCHEMA.fields])

    return df.groupBy("z", "x", "y").applyInPandas(render, schema=TILE_ROW_SCHEMA)
