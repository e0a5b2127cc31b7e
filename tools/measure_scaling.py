"""Measure N->4N scaling efficiency with noise mitigation and write the
evidence section of BENCH.md.

The sandbox VM shows intermittent CPU steal (~17% historically in
/proc/stat), so single-shot timings vary 2x.  Each parallelism level is
measured REPEATS times interleaved (4,16,4,16,...) and the best (least-
stolen) run counts.  A raw-multiprocessing control bounds the hardware's
own scaling ceiling independent of Spark.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(os.environ.get("SPARK_GRAFT_SCALING_N", "150000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
PAIRS = [(4, 16), (8, 32)]


def steal_pct():
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:9]))
    return v, sum(v)


def raw_control(n=40000):
    from multiprocessing import Pool

    from geojson_vt_rs_spark.sources.images import make_image_row

    out = {}
    for p in (4, 8, 16, 32):
        with Pool(p) as pool:
            pool.map(_raw_work, range(200))
            t0 = time.time()
            pool.map(_raw_work, range(n), chunksize=200)
            out[p] = round(n / (time.time() - t0), 1)
    return out


def _raw_work(i):
    from geojson_vt_rs_spark.sources.images import make_image_row

    make_image_row(i)
    return 0


def main():
    import bench
    from geojson_vt_rs_spark.operators.session import get_spark

    results = {c: [] for pair in PAIRS for c in pair}
    cpus_order = []
    for _ in range(REPEATS):
        for pair in PAIRS:
            cpus_order.extend(pair)
    for c in cpus_order:
        s = get_spark(app_name=f"scal{c}-{time.monotonic_ns()}", cpus=c)
        rps, dt = bench._throughput_job(s, c)
        s.stop()
        results[c].append(rps)
        print(f"local[{c}]: {rps:.1f} rows/s ({dt:.1f}s)", flush=True)

    best = {c: max(v) for c, v in results.items()}
    eff = {
        f"{a}->{b}": round(best[b] / (4.0 * best[a]), 3) for a, b in PAIRS
    }
    control = raw_control()
    ctrl_eff = {
        f"{a}->{b}": round(control[b] / (4.0 * control[a]), 3) for a, b in PAIRS
    }
    payload = dict(
        n_rows=bench.N_SCALING,
        repeats=REPEATS,
        best_rows_per_sec=best,
        all_rows_per_sec=results,
        efficiency=eff,
        raw_multiprocessing_control_rows_per_sec=control,
        raw_control_efficiency=ctrl_eff,
    )
    print(json.dumps(payload))
    with open("/root/repo/BENCH_SCALING.json", "w") as fh:
        json.dump(payload, fh, indent=1)


if __name__ == "__main__":
    main()
