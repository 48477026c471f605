"""WAV decode + audio feature kernel: roundtrip exactness, known-signal
feature values, stub fallback, malformed-payload containment (fuzz)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sinter_spark.images.codecs import DecodeError
from sinter_spark.operators import audio


class TestWavCodec:
    def test_roundtrip_int16_exact(self):
        rng = np.random.default_rng(1)
        s = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
        rate, back = audio.decode_wav(audio.encode_wav(s, 22_050))
        assert rate == 22_050 and back.shape == (500, 2)
        assert np.array_equal((back * 32768.0).round().astype(np.int16), s)

    def test_tolerates_extra_chunks(self):
        data = bytearray(audio.encode_wav(np.zeros(100), 8000))
        # splice a LIST chunk between fmt and data
        extra = b"LIST" + (6).to_bytes(4, "little") + b"INFOxx"
        spliced = bytes(data[:36]) + extra + bytes(data[36:])
        spliced = b"RIFF" + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
        rate, s = audio.decode_wav(spliced)
        assert rate == 8000 and len(s) == 100

    def test_malformed_raise_decode_error(self):
        good = audio.encode_wav(np.zeros(64), 8000)
        for bad in [b"", b"RIFF", good[:20], b"JUNK" + good[4:], good[:50]]:
            with pytest.raises(DecodeError):
                audio.decode_wav(bad)

    @settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
    @given(junk=st.binary(min_size=0, max_size=300))
    def test_fuzz_junk_contained(self, junk):
        try:
            rate, s = audio.decode_wav(junk)
        except DecodeError:
            return
        assert rate >= 1 and s.ndim == 2

    @settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
    @given(cut=st.integers(min_value=0, max_value=10_000), bit=st.integers(0, 7),
           pos=st.integers(min_value=0, max_value=10_000))
    def test_fuzz_truncate_and_flip_contained(self, cut, bit, pos):
        good = bytearray(audio.synth_audio(0.05))
        good[pos % len(good)] ^= 1 << bit
        try:
            audio.decode_wav(bytes(good)[: cut % (len(good) + 1)])
        except DecodeError:
            pass


class TestSparkFeatures:
    def test_known_tone_features(self, spark):
        clips = [
            ("a", audio.synth_audio(1.0, 16_000, freq=440.0), "wav"),
            ("b", audio.synth_audio(0.5, 8_000, freq=1000.0, seed=9), "wav"),
            ("c", b"\xffmp3junk" * 30, "mp3"),  # stub
            ("d", None, "wav"),  # null payload
        ]
        df = spark.createDataFrame(clips, "audio_id string, bytes binary, fmt string")
        rows = {r["row_key"]: r for r in audio.decode_audio_features(df).collect()}

        a = rows["a"]
        assert a["ok"] and a["sample_rate"] == 16_000 and a["channels"] == 1
        assert a["duration_s"] == pytest.approx(1.0)
        # 0.6-amplitude sine: rms ≈ 0.6/√2; centroid ≈ tone frequency
        assert a["rms"] == pytest.approx(0.6 / np.sqrt(2), rel=0.02)
        assert a["spectral_centroid_hz"] == pytest.approx(440.0, rel=0.15)
        # 440 Hz tone crosses zero ~880 times/s → zcr ≈ 880/16000
        assert a["zero_crossing_rate"] == pytest.approx(880 / 16_000, rel=0.1)

        b = rows["b"]
        assert b["ok"] and b["duration_s"] == pytest.approx(0.5)
        assert b["spectral_centroid_hz"] == pytest.approx(1000.0, rel=0.15)

        assert not rows["c"]["ok"] and rows["c"]["err"] == "stub:mp3"
        assert not rows["d"]["ok"] and rows["d"]["err"] == "null payload"

    def test_corrupt_payload_is_error_row(self, spark):
        df = spark.createDataFrame(
            [("x", b"RIFFxxxxWAVEgarbage", "wav")],
            "audio_id string, bytes binary, fmt string",
        )
        r = audio.decode_audio_features(df).collect()[0]
        assert not r["ok"] and r["err"]

    def test_strict_stub_raises(self, spark):
        df = spark.createDataFrame(
            [("x", b"z", "flac")], "audio_id string, bytes binary, fmt string"
        )
        with pytest.raises(Exception, match="not available"):
            audio.decode_audio_features(df, strict_stub=True).collect()
