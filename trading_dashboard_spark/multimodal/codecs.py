"""Dependency-free media codecs — real PNG and WAV decoding from bytes.

The container has no PIL/ffmpeg/torchaudio, but PNG and WAV need none of
them: PNG is zlib (stdlib) + per-scanline unfiltering, WAV is RIFF chunk
parsing + PCM struct reads. These are complete decoders — actual pixel
arrays and sample arrays, not just header sniffs — which makes
``decode_media_batch(fake=False)`` real for both formats.

Scope: PNG non-interlaced, 8-bit, grayscale/RGB/RGBA/gray+alpha (color
types 0/2/4/6 — the overwhelming majority of real PNGs); WAV integer PCM
8/16/32-bit. Anything else raises a precise NotImplementedError naming
the unsupported feature, never a wrong answer.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (3 = palette, unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[: len(PNG_SIGNATURE)] == PNG_SIGNATURE


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def png_chunks(payload: bytes):
    """Yield (type, data) for each chunk; validates the signature."""
    if not is_png(payload):
        raise ValueError("not a PNG: bad signature")
    i = len(PNG_SIGNATURE)
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        yield ctype, data
        i += 12 + length  # length + type + data + CRC
        if ctype == b"IEND":
            break


def png_header(payload: bytes) -> dict:
    """IHDR fields: width, height, bit_depth, color_type, interlace."""
    for ctype, data in png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            return {
                "width": w,
                "height": h,
                "bit_depth": depth,
                "color_type": color,
                "interlace": interlace,
            }
    raise ValueError("not a PNG: missing IHDR")


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG per-scanline filters (types 0-4). ``raw`` is the
    decompressed stream reshaped to (height, 1 + stride); returns
    (height, stride) recovered bytes."""
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0  # left
                b = prev[x]  # up
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    c = int(prev[x - bpp]) if x >= bpp else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Full PNG decode → (height, width, channels) uint8 pixel array."""
    hdr = png_header(payload)
    if hdr["interlace"] != 0:
        raise NotImplementedError("interlaced (Adam7) PNG not supported")
    if hdr["bit_depth"] != 8:
        raise NotImplementedError(f"PNG bit depth {hdr['bit_depth']} not supported")
    if hdr["color_type"] not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG color type {hdr['color_type']} (palette?) not supported"
        )
    channels = _PNG_CHANNELS[hdr["color_type"]]
    w, h = hdr["width"], hdr["height"]
    idat = b"".join(data for ctype, data in png_chunks(payload) if ctype == b"IDAT")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * channels
    if raw.size != h * (1 + stride):
        raise ValueError(
            f"PNG data size mismatch: got {raw.size}, expected {h * (1 + stride)}"
        )
    recovered = _unfilter(raw.reshape(h, 1 + stride), h, stride, channels)
    return recovered.reshape(h, w, channels)


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0, one IDAT) — the test-fixture
    counterpart of :func:`decode_png`; also lets pipelines materialize
    derived images without external encoders."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def wav_header(payload: bytes) -> dict:
    """fmt + data chunk fields: sample_rate, n_channels, bits_per_sample,
    n_frames, duration_ms."""
    if not is_wav(payload):
        raise ValueError("not a WAV: missing RIFF/WAVE header")
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= len(payload):
        ctype = payload[i : i + 4]
        (length,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if ctype == b"fmt ":
            audio_fmt, n_ch, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", payload[i + 8 : i + 24]
            )
            fmt = (audio_fmt, n_ch, rate, bits)
        elif ctype == b"data":
            data_size = length
        i += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    audio_fmt, n_ch, rate, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"WAV audio format {audio_fmt} (non-PCM) not supported")
    n_frames = data_size // (n_ch * (bits // 8))
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits_per_sample": bits,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 / rate) if rate else 0,
    }


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono PCM16 WAV writer (RIFF + fmt + data) — the inverse of
    :func:`decode_wav` for 16-bit mono, used to synthesize deterministic
    audio payloads in tests and oracle-checked queries."""
    data = np.asarray(samples).astype("<i2").tobytes()
    n = len(data)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
        + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Full PCM decode → ((n_frames, n_channels) int array, sample_rate)."""
    hdr = wav_header(payload)
    bits = hdr["bits_per_sample"]
    dtypes = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}
    if bits not in dtypes:
        raise NotImplementedError(f"WAV PCM bit depth {bits} not supported")
    i = 12
    while i + 8 <= len(payload):
        ctype = payload[i : i + 4]
        (length,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if ctype == b"data":
            raw = payload[i + 8 : i + 8 + length]
            samples = np.frombuffer(raw, dtype=dtypes[bits])
            n_ch = hdr["n_channels"]
            return samples[: (samples.size // n_ch) * n_ch].reshape(-1, n_ch), hdr[
                "sample_rate"
            ]
        i += 8 + length + (length & 1)
    raise ValueError("not a WAV: missing data chunk")


def media_features(payload: bytes | None, dim: int = 8) -> list[float]:
    """Real feature extraction for supported formats: a fixed-length
    summary vector (the engine's decoder+encoder contract).

    PNG  → [width, height, channels, mean, std, min, max, n_pixels]
    WAV  → [duration_ms, sample_rate, channels, rms, mean, min, max, n_frames]
    JPEG → [width, height, channels, bit_depth, progressive, 0, 0, n_pixels]
           (header-parse only — pixel statistics require entropy decoding,
           which needs an external library; zeros mark the absent slots)
    """
    if payload is None:
        return [0.0] * dim
    if is_png(payload):
        px = decode_png(payload).astype(np.float64)
        h, w, c = px.shape
        return [
            float(w), float(h), float(c),
            float(px.mean()), float(px.std()),
            float(px.min()), float(px.max()), float(h * w),
        ]
    if is_wav(payload):
        samples, rate = decode_wav(payload)
        s = samples.astype(np.float64)
        n_frames, n_ch = samples.shape
        hdr = wav_header(payload)
        return [
            float(hdr["duration_ms"]), float(rate), float(n_ch),
            float(np.sqrt((s ** 2).mean())) if s.size else 0.0,
            float(s.mean()) if s.size else 0.0,
            float(s.min()) if s.size else 0.0,
            float(s.max()) if s.size else 0.0,
            float(n_frames),
        ]
    if is_jpeg(payload):
        hdr = jpeg_header(payload)
        return [
            float(hdr["width"]), float(hdr["height"]),
            float(hdr["n_channels"]), float(hdr["bit_depth"]),
            float(hdr["progressive"]), 0.0, 0.0,
            float(hdr["width"] * hdr["height"]),
        ]
    raise NotImplementedError(
        f"unsupported media format (magic {payload[:4]!r}); real decoders "
        f"exist for PNG and WAV (JPEG: header-level), other codecs need "
        f"external libraries"
    )


#: JPEG SOF (start-of-frame) markers — every frame type that carries
#: dimensions (C4/C8/CC are DHT/JPG/DAC, not frames)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


def jpeg_header(payload: bytes) -> dict:
    """Scan segment markers to the first SOF frame header: width, height,
    channels, bit depth, progressive flag.

    Header parse only — baseline JPEG entropy decoding (Huffman + IDCT)
    is deliberately out of scope for a dependency-free codec; pixel-level
    requests on JPEG raise in `media_features`' callers, never return a
    wrong answer. The marker walk skips entropy-coded segments by
    honoring each segment's declared length, so it is O(#segments), not
    O(bytes).
    """
    if not is_jpeg(payload):
        raise ValueError("not a JPEG: bad SOI marker")
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError(f"bad marker sync at byte {i}")
        # the spec allows any number of 0xFF fill bytes before a marker:
        # advance to the last 0xFF so the byte after it is the marker code
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            break
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
            i += 2
            continue
        (length,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if marker in _JPEG_SOF:
            depth, h, w, n_ch = struct.unpack(">BHHB", payload[i + 4 : i + 10])
            return {
                "width": w,
                "height": h,
                "n_channels": n_ch,
                "bit_depth": depth,
                "progressive": marker == 0xC2,
            }
        i += 2 + length
    raise ValueError("no SOF frame header found")
