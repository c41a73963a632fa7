"""Pure-numpy media codec correctness (functions/codecs.py): lossless
roundtrips for PPM/PGM/BMP/WAV, bounded-error roundtrip for Y4M (RGB<->YUV
is quantized), byte-level frame sampling, resize/feature known values."""

import numpy as np
import pytest

from anomaly_detector_spark.functions import codecs as C


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_rgb_and_gray():
    img = _img(32, 17)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), img)
    gray = img[:, :, 1]
    assert np.array_equal(C.decode_ppm(C.encode_ppm(gray)), gray)


def test_ppm_comment_and_whitespace_header():
    img = _img(4, 5)
    raw = C.encode_ppm(img)
    # insert a comment line after the magic — still a legal PPM
    patched = b"P6\n# synthetic test comment\n5 4\n255\n" + raw.split(b"255\n", 1)[1]
    assert np.array_equal(C.decode_ppm(patched), img)


def test_ppm_malformed():
    with pytest.raises(ValueError):
        C.decode_ppm(b"P7\n1 1\n255\nx")
    with pytest.raises(ValueError):
        C.decode_ppm(C.encode_ppm(_img(8, 8))[:-10])  # truncated raster


def test_bmp_roundtrip_row_padding():
    # width 17 -> 51-byte rows padded to 52: exercises the padding path
    img = _img(13, 17, seed=3)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)
    img4 = _img(8, 16, seed=4)  # no padding needed
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img4)), img4)


def test_wav_roundtrip_and_rms():
    rate = 8000
    t = np.arange(rate, dtype=np.float32) / rate
    amp = 0.5
    pcm = (np.sin(2 * np.pi * 440 * t) * amp * 32767).astype(np.int16)
    dec, got_rate = C.decode_wav(C.encode_wav(pcm, rate))
    assert got_rate == rate
    assert np.allclose(dec, pcm / 32768.0, atol=1e-6)
    feat = C.audio_feature(dec, n_frames=4)
    # full-scale sine RMS = amp/sqrt(2)
    assert feat[:4] == pytest.approx(amp / np.sqrt(2), rel=1e-2)
    assert len(feat) == 6


def test_y4m_roundtrip_and_byte_level_sampling():
    frames = np.stack([_img(16, 16, seed=i) for i in range(6)])
    payload = C.encode_y4m(frames, fps=30)
    dec, fps = C.decode_y4m(payload)
    assert fps == 30 and dec.shape == frames.shape
    # YUV444 roundtrip is quantized but tight
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 3
    sub, _ = C.decode_y4m(payload, every=3)
    assert sub.shape[0] == 2
    assert np.array_equal(sub[0], dec[0]) and np.array_equal(sub[1], dec[3])


def test_resize_area_exact_block_mean():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    assert np.allclose(C.resize_area(img, 2, 2), [[2.5, 4.5], [10.5, 12.5]])
    # non-divisible sizes conserve total mass (area-weighted average)
    img2 = np.arange(15, dtype=np.float32).reshape(3, 5)
    out = C.resize_area(img2, 2, 2)
    assert out.mean() == pytest.approx(img2.mean())


def test_resize_nearest_samples_centers():
    img = np.arange(16).reshape(4, 4)
    out = C.resize_nearest(img, 2, 2)
    assert np.array_equal(out, [[5, 7], [13, 15]])


def test_image_feature_constant_image():
    img = np.full((10, 10, 3), 128, dtype=np.uint8)
    feat = C.image_feature(img, grid=4)
    assert len(feat) == 18
    assert feat[:16] == pytest.approx(128 / 255.0, abs=1e-6)
    assert feat[17] == pytest.approx(0.0, abs=1e-6)  # std of constant


def test_sniff_kind():
    img = _img(4, 4)
    assert C.sniff_kind(C.encode_ppm(img)) == "ppm"
    assert C.sniff_kind(C.encode_ppm(img[:, :, 0])) == "pgm"
    assert C.sniff_kind(C.encode_bmp(img)) == "bmp"
    assert C.sniff_kind(C.encode_wav(np.zeros(4, dtype=np.int16))) == "wav"
    assert C.sniff_kind(C.encode_y4m(img[None])) == "y4m"
    assert C.sniff_kind(b"not media") is None
    assert C.sniff_kind(None) is None


def test_wav_truncated_chunks_raise_valueerror():
    """struct-level failures on truncated containers must surface as
    ValueError (the operators' malformed-payload contract)."""
    import struct

    truncated_fmt = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"fmt " + struct.pack("<I", 16)
    with pytest.raises(ValueError):
        C.decode_wav(truncated_fmt)
    with pytest.raises(ValueError):
        C.decode_bmp(b"BM" + b"\x00" * 60)
