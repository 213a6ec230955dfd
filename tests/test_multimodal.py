"""Multimodal plumbing tests: schema, batch shape, payload drop, and the
NotImplementedError contract for real codecs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from feature_store_spark.functions.multimodal import (
    decode_audio,
    decode_video_frames,
    fake_decode_audio,
    fake_encode_audio,
    fake_encode_video,
    with_audio_features,
    with_video_features,
)


def test_real_decoders_raise_with_named_dependency():
    with pytest.raises(NotImplementedError, match="libsndfile|ffmpeg"):
        decode_audio(b"x")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_video_frames(b"x")


def test_audio_pipeline(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(20):
        pcm = rng.normal(0, 0.1, size=16_000 * (1 + i % 3)).clip(-1, 1)
        rows.append({"clip_id": f"a{i}", "audio_bytes": fake_encode_audio(pcm)})
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    out = with_audio_features(sdf).toPandas()
    assert "audio_bytes" not in out.columns  # payload dropped pre-shuffle
    assert set(out.columns) == {"clip_id", "duration_s", "rms", "zero_crossings"}
    assert (out["duration_s"] >= 1.0).all()
    # parity with direct decode
    pcm0 = fake_decode_audio(rows[0]["audio_bytes"])
    got = out.set_index("clip_id").loc["a0"]
    assert got["duration_s"] == pytest.approx(len(pcm0) / 16_000.0)
    assert got["rms"] == pytest.approx(float(np.sqrt(np.mean(pcm0**2))), rel=1e-6)


def test_video_pipeline(spark):
    rng = np.random.default_rng(6)
    rows = []
    for i in range(10):
        frames = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
                  for _ in range(5 + i)]
        rows.append({"vid_id": f"v{i}", "video_bytes": fake_encode_video(frames)})
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    out = with_video_features(sdf).toPandas().set_index("vid_id")
    assert out.loc["v0", "n_frames"] == 5
    assert len(out.loc["v0", "sampled_frame_phashes"]) >= 1
    assert all(isinstance(int(h), int) for h in out.loc["v0", "sampled_frame_phashes"])


def test_grouped_apply_ops(spark):
    """applyInPandas custom ops: z-score parity with pandas, exact quantiles."""
    import numpy as np
    import pandas as pd

    from feature_store_spark.operators.grouped import (
        exact_quantiles,
        zscore_normalize,
    )

    rng = np.random.default_rng(8)
    pdf = pd.DataFrame({
        "entity": [f"e{i % 4}" for i in range(400)],
        "v": rng.normal(10, 3, 400),
    })
    sdf = spark.createDataFrame(pdf)
    z = zscore_normalize(sdf, "entity", "v").toPandas()
    for e, grp in pdf.groupby("entity"):
        want = (grp["v"] - grp["v"].mean()) / grp["v"].std(ddof=0)
        got = z[z.entity == e].set_index(z[z.entity == e]["v"])["zscore"]
        assert np.allclose(sorted(got), sorted(want))
    q = exact_quantiles(sdf, "entity", "v").toPandas().set_index("entity")
    for e, grp in pdf.groupby("entity"):
        assert q.loc[e, "q50"] == pytest.approx(grp["v"].quantile(0.5))
        assert q.loc[e, "n"] == len(grp)
