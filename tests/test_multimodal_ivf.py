"""IVF ANN recall + video frame-sampling plumbing tests."""

import numpy as np

from geojson_vt_rs_spark.sources.png import decode_png

SF = "/root/testdata/sf0.01"


def test_ivf_topk_recall(spark):
    from geojson_vt_rs_spark.operators.ann import ivf_topk, with_ivf_cell
    from geojson_vt_rs_spark.operators.text_dedup import ann_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # deterministic centroid seeding: the first 16 vectors
    cents = [
        (int(r["vec_id"]), [float(v) for v in r["embedding"]])
        for r in emb.filter("vec_id < 16").collect()
    ]
    qv = [float(v) for v in emb.filter("vec_id = 0").collect()[0]["embedding"]]

    exact = {r["vec_id"] for r in ann_topk(emb, qv, k=10).collect()}
    approx = {
        r["vec_id"] for r in ivf_topk(emb, qv, cents, k=10, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"

    cells = with_ivf_cell(emb, cents).groupBy("ivf_cell").count().collect()
    assert len(cells) > 4  # vectors spread over multiple inverted lists
    assert max(r["count"] for r in cells) < emb.count()


def test_frame_sample(spark):
    from geojson_vt_rs_spark.operators.multimodal import (
        frame_sample,
        generate_videos,
        make_video_bytes,
        _decode_frames,
    )

    vids = generate_videos(spark, 20, 4)
    frames = frame_sample(vids, every=4).toPandas()
    # 12 frames sampled every 4 -> 3 per video
    assert len(frames) == 20 * 3
    assert sorted(frames["frame_idx"].unique()) == [0, 4, 8]

    # decoded sampled frame is byte-exact vs the source frame
    row = frames[(frames.video_id == "vid000007") & (frames.frame_idx == 4)].iloc[0]
    got = decode_png(bytes(row["frame_png"]))
    src = _decode_frames(make_video_bytes(7), 16, 16, 12, "rawv")[4]
    assert np.array_equal(got, src)
    assert abs(row["mean_lum"] - src.astype(np.float64).mean()) < 1e-9


def test_vtv_container_roundtrip():
    import pytest

    from geojson_vt_rs_spark.operators.multimodal import (
        _decode_frames,
        decode_vtv,
        encode_vtv,
        make_frames,
    )

    frames = make_frames(3, w=16, h=16, n_frames=12)
    data = encode_vtv(frames)
    back = decode_vtv(data)
    assert back.shape == (12, 16, 16, 3)
    assert all(np.array_equal(back[i], frames[i]) for i in range(12))
    # the container is self-describing; mismatched row metadata is caught
    with pytest.raises(ValueError):
        _decode_frames(data, 16, 16, 7, "vtv")
    with pytest.raises(ValueError):
        _decode_frames(b"xx", 2, 2, 1, "h264")
    with pytest.raises(ValueError):
        decode_vtv(b"nonsense")
    # hostile header: a huge claimed frame count must be rejected BEFORE
    # any allocation (bound-checked against payload size)
    import struct

    hostile = b"VTV1" + struct.pack(">HHI", 4096, 4096, 2**31 - 1)
    with pytest.raises(ValueError, match="claims"):
        decode_vtv(hostile)
    # hostile DIMS: (65535, 65535, 1) over a tiny real frame must fail the
    # shape check WITHOUT allocating the ~12.9 GB claimed array (the
    # frames buffer is only allocated after frame 0 decodes and matches)
    one = encode_vtv(frames[:1])
    hostile_dims = b"VTV1" + struct.pack(">HHI", 65535, 65535, 1) + one[12:]
    with pytest.raises(ValueError, match="header says"):
        decode_vtv(hostile_dims)
    # zero frames is well-formed: empty array, header dims echoed
    empty = b"VTV1" + struct.pack(">HHI", 8, 4, 0)
    assert decode_vtv(empty).shape == (0, 4, 8, 3)
    # truncated mid-frame -> clean ValueError, not struct/PNG internals
    with pytest.raises(ValueError):
        decode_vtv(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_vtv(data[:8])  # shorter than the fixed header
