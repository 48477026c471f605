"""rawvid container + real frame sampler: roundtrip, O(k) seek,
Spark-path features, stub fallback, and malformed-payload containment.
"""

import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from sinter_spark.images import codecs, video
from sinter_spark.images.perceptual import dct_phash64
from sinter_spark.operators.multimodal import sample_video_frames


def _frames(n=10, h=24, w=32, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


class TestContainer:
    def test_roundtrip_every_frame(self):
        fr = _frames()
        data = video.encode_rawvid(fr)
        meta = video.probe_rawvid(data)
        assert meta == {"n_frames": 10, "w": 32, "h": 24, "channels": 3}
        for i in range(10):
            assert np.array_equal(video.decode_rawvid_frame(data, i), fr[i])

    def test_seek_decodes_only_requested_frame(self, monkeypatch):
        """The scale contract: sampling k frames costs k inflates, not
        n — the index is a real seek table, not decoration."""
        data = video.encode_rawvid(_frames(n=32))
        calls = {"n": 0}
        orig = zlib.decompress

        def counting(b, *a, **k):
            calls["n"] += 1
            return orig(b, *a, **k)

        monkeypatch.setattr(video.zlib, "decompress", counting)
        for i in video.sample_indices(32, 4):
            video.decode_rawvid_frame(data, i)
        assert calls["n"] == 4

    def test_sample_indices_spread(self):
        assert video.sample_indices(32, 4) == [0, 10, 21, 31]
        assert video.sample_indices(3, 4) == [0, 1, 2]  # short clip: all
        assert video.sample_indices(9, 1) == [4]
        assert video.sample_indices(0, 4) == []

    def test_malformed_payloads_raise_decode_error(self):
        data = video.encode_rawvid(_frames(n=4))
        for bad, frame in [
            (b"", 0),
            (b"RVIDx", 0),
            (data[:10], 0),
            (data[: len(data) // 2], 3),  # header ok, last frame truncated
            (b"JUNK" + data[4:], 0),
        ]:
            with pytest.raises(codecs.DecodeError):
                video.decode_rawvid_frame(bad, frame)
        with pytest.raises(codecs.DecodeError):
            video.decode_rawvid_frame(data, 99)
        # bit flip inside a frame blob → inflate or size error, contained
        flipped = bytearray(data)
        flipped[-3] ^= 0x40
        with pytest.raises(codecs.DecodeError):
            video.decode_rawvid_frame(bytes(flipped), 3)


class TestSparkSampler:
    def test_real_path_features_match_direct_decode(self, spark):
        clips = [
            ("v1", video.synth_video(16, 32, 24, seed=1), "rawvid"),
            ("v2", video.synth_video(6, 16, 16, seed=2), "rawvid"),
            ("v3", b"\x00\x01mp4junk" * 40, "mp4"),  # stub path
            ("v4", None, "rawvid"),  # null payload: skipped
        ]
        df = spark.createDataFrame(clips, "video_id string, bytes binary, fmt string")
        rows = sample_video_frames(df, n_frames=4, fmt_col="fmt").collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(r["row_key"], []).append(r)

        v1 = sorted(by_key["v1"], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in v1] == video.sample_indices(16, 4)
        data = clips[0][1]
        for r in v1:
            px = video.decode_rawvid_frame(data, r["frame_idx"])
            assert r["ok"] and r["err"] is None
            assert (r["frame_w"], r["frame_h"]) == (32, 24)
            assert r["brightness"] == pytest.approx(float(px.mean()))
            assert r["phash64"] == dct_phash64(px)  # exact int64 transit

        # 6-frame clip: uniform spread, endpoints included
        assert sorted(r["frame_idx"] for r in by_key["v2"]) == video.sample_indices(6, 4)
        # stub path: shape preserved, clearly marked
        assert all(not r["ok"] and r["err"] == "stub:mp4" for r in by_key["v3"])
        assert len(by_key["v3"]) == 4
        assert "v4" not in by_key

    def test_corrupt_clip_yields_error_row_not_task_crash(self, spark):
        clips = [("ok", video.synth_video(8, 16, 16), "rawvid"),
                 ("bad", b"RVID" + b"\xff" * 30, "rawvid")]
        df = spark.createDataFrame(clips, "video_id string, bytes binary, fmt string")
        rows = sample_video_frames(df, n_frames=2, fmt_col="fmt").collect()
        by_key = {r["row_key"]: r for r in rows if not r["ok"]}
        assert "bad" in by_key and by_key["bad"]["err"]

    def test_legacy_no_fmt_col_stub(self, spark):
        df = spark.createDataFrame(
            [("a", b"0123456789abcdef")], "video_id string, bytes binary"
        )
        rows = sample_video_frames(df, n_frames=4).collect()
        assert len(rows) == 4
        assert {r["frame_idx"] for r in rows} == {0, 1, 2, 3}
        assert all(r["err"] == "stub:unknown" for r in rows)
