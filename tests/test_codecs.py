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


# ------------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    gray=st.booleans(),
)
def test_ppm_roundtrip_property(h, w, seed, gray):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w) if gray else (h, w, 3), dtype=np.uint8)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), img)


@settings(max_examples=30, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 5000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    dec, got_rate = C.decode_wav(C.encode_wav(pcm, rate))
    assert got_rate == rate
    assert np.array_equal((dec * 32768.0).astype(np.int16), pcm)


@settings(max_examples=20, deadline=None)
@given(
    t=st.integers(1, 6), h=st.integers(2, 16), w=st.integers(2, 16),
    every=st.integers(1, 4), seed=st.integers(0, 2**31 - 1),
)
def test_y4m_roundtrip_and_sampling_property(t, h, w, every, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(t, h, w, 3), dtype=np.uint8)
    payload = C.encode_y4m(frames)
    dec, _ = C.decode_y4m(payload)
    assert dec.shape == frames.shape
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 3
    sub, _ = C.decode_y4m(payload, every=every)
    assert np.array_equal(sub, dec[::every])


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 32), w=st.integers(1, 32),
    oh=st.integers(1, 8), ow=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_area_conserves_mass_property(h, w, oh, ow, seed):
    """Area resize is an average over exact coverage weights, so the global
    mean is preserved for ANY size combination."""
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)).astype(np.float32) * 255
    out = C.resize_area(img, oh, ow)
    assert out.shape == (oh, ow)
    # per-output-cell weights each sum to 1; the global mean is conserved
    # when cells have equal area, i.e. always for this uniform grid
    assert float(out.mean()) == pytest.approx(float(img.mean()), rel=1e-4)


@settings(max_examples=40, deadline=None)
@given(payload=st.binary(max_size=200))
def test_decoders_never_raise_non_valueerror_property(payload):
    """Arbitrary bytes must yield ValueError (or decode), never any other
    exception type — the operators' malformed-payload contract."""
    for dec in (C.decode_ppm, C.decode_bmp, C.decode_wav, C.decode_y4m):
        try:
            dec(payload)
        except ValueError:
            pass
