"""Pure-numpy media codecs for the multimodal pipeline.

No imaging/audio libraries exist in this environment, so the formats chosen
are ones whose containers are simple enough to encode/decode exactly with
numpy + struct: binary PPM/PGM (P6/P5), uncompressed 24-bit BI_RGB BMP, and
PCM16 WAV.  These are real, interoperable encodings (a file produced here
opens in GIMP/ffmpeg), which makes the Spark-side multimodal operators
(`operators/multimodal.py`) genuinely end-to-end instead of stubbed.

Everything is vectorized; decoders validate headers and raise ValueError on
malformed payloads (surfaced per-row as nulls by the extract operator).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- PPM / PGM


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 (P6) or HxW uint8 (P5) as binary PPM/PGM."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 3 and pixels.shape[2] == 3:
        magic = b"P6"
        h, w = pixels.shape[:2]
    elif pixels.ndim == 2:
        magic = b"P5"
        h, w = pixels.shape
    else:
        raise ValueError(f"encode_ppm: unsupported shape {pixels.shape}")
    return b"%s\n%d %d\n255\n" % (magic, w, h) + pixels.tobytes()


def _ppm_tokens(buf: bytes, count: int, start: int) -> tuple[list[int], int]:
    """Read `count` whitespace-separated ASCII ints, skipping # comments."""
    tokens: list[int] = []
    i = start
    n = len(buf)
    while len(tokens) < count and i < n:
        c = buf[i : i + 1]
        if c == b"#":
            while i < n and buf[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not buf[j : j + 1].isspace():
                j += 1
            tokens.append(int(buf[i:j]))
            i = j
    if len(tokens) < count:
        raise ValueError("ppm: truncated header")
    return tokens, i + 1  # single whitespace after maxval precedes raster


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6 -> HxWx3) or PGM (P5 -> HxW) uint8."""
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in (b"5", b"6"):
        raise ValueError("ppm: bad magic")
    channels = 3 if payload[1:2] == b"6" else 1
    (w, h, maxval), off = _ppm_tokens(payload, 3, 2)
    if maxval != 255:
        raise ValueError(f"ppm: unsupported maxval {maxval}")
    need = w * h * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    if raster.size < need:
        raise ValueError("ppm: truncated raster")
    return raster.reshape((h, w, 3) if channels == 3 else (h, w))


# ------------------------------------------------------------------- BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 RGB as an uncompressed 24-bit BI_RGB BMP
    (bottom-up rows, BGR order, 4-byte row padding)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"encode_bmp: need HxWx3, got {pixels.shape}")
    h, w = pixels.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    bgr = pixels[::-1, :, ::-1]  # bottom-up, BGR
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    raster = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + dib + raster


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode uncompressed 24-bit BI_RGB BMP -> HxWx3 uint8 RGB.
    All malformed-container failures surface as ValueError."""
    # the 54-byte guard covers every header unpack below (max offset 34)
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"bmp: unsupported bpp={bpp} compression={compression}")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    need = row_bytes * h
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=data_off)
    if raster.size < need:
        raise ValueError("bmp: truncated raster")
    rows = raster.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


# ------------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode mono int16 PCM samples as a canonical RIFF/WAVE file."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM16 mono/stereo WAV -> (samples float32 in [-1,1], rate).
    Stereo is downmixed to mono.  All malformed-container failures surface
    as ValueError (struct/buffer errors on truncated chunks included)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav: bad magic")
    i = 12
    rate, channels, bits = None, None, None
    samples = None
    try:
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            size = struct.unpack_from("<I", payload, i + 4)[0]
            if cid == b"fmt ":
                fmt_tag, channels, rate = struct.unpack_from("<HHI", payload, i + 8)
                bits = struct.unpack_from("<H", payload, i + 22)[0]
                if fmt_tag != 1 or bits != 16:
                    raise ValueError(f"wav: unsupported fmt={fmt_tag} bits={bits}")
            elif cid == b"data":
                samples = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=i + 8)
            i += 8 + size + (size & 1)
    except (struct.error, ValueError) as e:
        if isinstance(e, ValueError) and "unsupported" in str(e):
            raise
        raise ValueError(f"wav: truncated chunk ({e})") from e
    if rate is None or samples is None:
        raise ValueError("wav: missing fmt/data chunk")
    out = samples.astype(np.float32) / 32768.0
    if channels and channels > 1:
        out = out[: len(out) - len(out) % channels].reshape(-1, channels).mean(axis=1)
    return out, rate


# ------------------------------------------------------------------- Y4M


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode TxHxWx3 uint8 RGB frames as YUV4MPEG2 (C444, full range).

    Y4M is a real container (ffmpeg/mpv play it) whose header is one ASCII
    line and whose frames are raw planes — exactly encodable with numpy."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"encode_y4m: need TxHxWx3, got {frames.shape}")
    t, h, w = frames.shape[:3]
    r = frames[..., 0].astype(np.float32)
    g = frames[..., 1].astype(np.float32)
    b = frames[..., 2].astype(np.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = np.stack(
        [np.clip(p, 0, 255).astype(np.uint8) for p in (y, u, v)], axis=1
    )  # (T, 3, H, W)
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for i in range(t):
        out.append(b"FRAME\n")
        out.append(planes[i].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes, every: int = 1) -> tuple[np.ndarray, int]:
    """Decode YUV4MPEG2 C444 -> (TxHxWx3 uint8 RGB, fps), sampling every
    `every`-th frame (frame-skip happens at the byte level — unsampled
    frames are never converted)."""
    end = payload.find(b"\n")
    if end < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("y4m: bad magic")
    w = h = fps = None
    for tok in payload[:end].split()[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps = int(tok[1:].split(b":")[0])
        elif tok[:1] == b"C" and tok != b"C444":
            raise ValueError(f"y4m: unsupported colorspace {tok!r}")
    if not w or not h:
        raise ValueError("y4m: missing geometry")
    frame_bytes = w * h * 3
    frames = []
    i = end + 1
    fidx = 0
    while i < len(payload):
        fend = payload.find(b"\n", i)
        if fend < 0 or payload[i : i + 5] != b"FRAME":
            raise ValueError("y4m: bad frame marker")
        data_start = fend + 1
        if fidx % every == 0:
            planes = np.frombuffer(
                payload, dtype=np.uint8, count=frame_bytes, offset=data_start
            )
            if planes.size < frame_bytes:
                raise ValueError("y4m: truncated frame")
            frames.append(planes.reshape(3, h, w))
        i = data_start + frame_bytes
        fidx += 1
    if not frames:
        raise ValueError("y4m: no frames")
    yuv = np.stack(frames).astype(np.float32)
    y, u, v = yuv[:, 0], yuv[:, 1] - 128.0, yuv[:, 2] - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8), fps or 25


# -------------------------------------------------------------- transforms


def to_gray(img: np.ndarray) -> np.ndarray:
    """HxW[x3] uint8 -> HxW float32 luma (ITU-R 601)."""
    img = np.asarray(img)
    if img.ndim == 2:
        return img.astype(np.float32)
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(np.float32)


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize (box filter) of HxW[xC] to out_h x out_w.
    Exact block mean-pool when dimensions divide; pixel-weighted overlap
    integral otherwise — pure numpy, vectorized."""
    img = np.asarray(img, dtype=np.float32)
    h, w = img.shape[:2]
    if h == out_h and w == out_w:
        return img.copy()

    def axis_weights(n_in: int, n_out: int) -> np.ndarray:
        # weight[i_out, i_in] = overlap of output cell i_out with input cell i_in
        scale = n_in / n_out
        lo = np.arange(n_out)[:, None] * scale
        hi = lo + scale
        cells = np.arange(n_in)[None, :]
        overlap = np.minimum(hi, cells + 1) - np.maximum(lo, cells)
        return np.clip(overlap, 0.0, 1.0) / scale

    wy = axis_weights(h, out_h)  # (out_h, h)
    wx = axis_weights(w, out_w)  # (out_w, w)
    if img.ndim == 2:
        return wy @ img @ wx.T
    return np.einsum("oh,hwc,pw->opc", wy, img, wx)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (sample at cell centers)."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(int), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(int), w - 1)
    return img[np.ix_(ys, xs)]


def image_feature(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """grid x grid mean-pooled luma in [0,1] + [mean, std] -> (grid^2+2,)
    float32 feature vector (a perceptual-hash-style descriptor)."""
    g = to_gray(img) / 255.0
    pooled = resize_area(g, grid, grid).ravel()
    return np.concatenate([pooled, [g.mean(), g.std()]]).astype(np.float32)


def audio_feature(samples: np.ndarray, n_frames: int = 14) -> np.ndarray:
    """Per-frame RMS energy over n_frames equal slices + [mean RMS,
    zero-crossing rate] -> (n_frames+2,) float32."""
    x = np.asarray(samples, dtype=np.float32)
    if len(x) == 0:
        return np.zeros(n_frames + 2, dtype=np.float32)
    edges = np.linspace(0, len(x), n_frames + 1).astype(int)
    rms = np.array(
        [
            np.sqrt(np.mean(np.square(x[a:b]))) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ],
        dtype=np.float32,
    )
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    return np.concatenate([rms, [rms.mean(), zcr]]).astype(np.float32)


def sniff_kind(payload: bytes) -> str | None:
    """Identify a payload by magic bytes: ppm|pgm|bmp|wav, else None."""
    if payload is None or len(payload) < 4:
        return None
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    return None
