"""Compressed-audio WAV decode (multimodal — ITU-T G.711 A-law/µ-law
companding + mono IMA/DVI ADPCM): byte-level G.711 identities, lossy SNR
bounds, format dispatch, and the audio_features kernel over compressed
columns."""

import numpy as np
import pytest

from lucene_spark.multimodal import (
    _alaw_decode,
    _alaw_encode,
    _mulaw_decode,
    _mulaw_encode,
    decode_wav,
    encode_wav,
    encode_wav_compressed,
)


def _sine(n=4000, period=50, amp=12000):
    return (np.sin(2 * np.pi * np.arange(n) / period) * amp).astype(np.int16)


def _snr(sig, rec):
    err = rec - sig
    return 10 * np.log10((sig.astype(float) ** 2).mean()
                         / max((err ** 2).mean(), 1e-9))


def test_alaw_byte_identity_all_codes():
    b = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(_alaw_encode(_alaw_decode(b)), b)


def test_mulaw_byte_identity_modulo_negative_zero():
    """encode(decode(byte)) == byte for every µ-law code except 0x7F —
    negative zero decodes to 0, which re-encodes as positive zero 0xFF
    (the reference G.711 C implementation has the same aliasing)."""
    b = np.arange(256, dtype=np.uint8)
    out = _mulaw_encode(_mulaw_decode(b))
    mism = np.where(out != b)[0]
    assert mism.tolist() == [0x7F]
    assert out[0x7F] == 0xFF


@pytest.mark.parametrize("codec,min_snr", [("mulaw", 35), ("alaw", 33),
                                           ("ima", 25), ("ms", 25)])
def test_compressed_wav_sine_snr(codec, min_snr):
    sig = _sine()
    s, rate = decode_wav(encode_wav_compressed(sig, 8000, codec))
    assert rate == 8000
    rec = (s[:, 0] * 32768.0)[: len(sig)]
    assert _snr(sig[: len(rec)], rec) > min_snr


def test_ima_stereo_rejected():
    with pytest.raises(ValueError):
        encode_wav_compressed(np.zeros((10, 2), np.int16), codec="ima")


def test_unknown_format_rejected():
    import struct

    data = b"\x00" * 100
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 0x55, 1, 8000, 8000, 1, 0)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    payload = hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data
    with pytest.raises(NotImplementedError):
        decode_wav(payload)  # MP3-in-WAV (format 0x55) stays rejected


def test_pcm_path_still_exact():
    sig = _sine(1000)
    s, rate = decode_wav(encode_wav(sig, 16000))
    np.testing.assert_allclose(s[:, 0] * 32768.0, sig, atol=0.5)
    assert rate == 16000


def test_audio_features_over_compressed_column(spark):
    from lucene_spark.multimodal import audio_features

    sig = _sine(2000)
    rows = [(0, bytearray(encode_wav(sig, 8000))),
            (1, bytearray(encode_wav_compressed(sig, 8000, "mulaw"))),
            (2, bytearray(encode_wav_compressed(sig, 8000, "alaw"))),
            (3, bytearray(encode_wav_compressed(sig, 8000, "ima"))),
            (4, bytearray(encode_wav_compressed(sig, 8000, "ms")))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = audio_features(df).toPandas().sort_values("doc_id")
    assert len(out) == 5
    # same underlying sine: every codec's RMS within 2% of the PCM row's
    rms = out.set_index("doc_id")["rms"]
    for i in (1, 2, 3, 4):
        assert abs(rms[i] - rms[0]) / rms[0] < 0.02
