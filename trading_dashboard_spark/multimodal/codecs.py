"""Dependency-free media codecs — real PNG, WAV, and baseline JPEG
encode/decode from bytes.

The container has no PIL/ffmpeg/torchaudio, but these formats need none
of them: PNG is zlib (stdlib) + per-scanline unfiltering, WAV is RIFF
chunk parsing + PCM struct reads, and baseline JPEG is implemented in
full below (Annex-K Huffman entropy coding + 8×8 DCT via numpy matrix
products, both directions). These are complete codecs — actual pixel
arrays and sample arrays, not just header sniffs — which makes
``decode_media_batch(fake=False)`` real for all three formats.

Scope: PNG color types 0/2/3/4/6 at bit depths 1/2/4/8 (PLTE-indexed
and sub-byte grayscale included), non-interlaced AND Adam7 (r5); WAV
integer PCM 8/16/32-bit; JPEG 8-bit grayscale or color, sequential
baseline at any integer chroma sampling (4:4:4/4:2:2/4:2:0, r5) AND
progressive (SOF2, spectral selection + successive approximation, r5).
Baseline multi-scan (non-interleaved) layouts decode through the same
scan-accumulating path as progressive (r5). Anything else (16-bit
samples, paletted tRNS, fractional sampling ratios, non-PCM WAV)
raises a precise NotImplementedError naming the unsupported feature,
never a wrong answer.
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
    """Yield (type, data) for each chunk; validates the signature, each
    chunk's framing (a declared length running past the payload is a
    truncated stream) and its CRC (the r11 adversarial media battery
    found single-byte corruption sailing straight into the inflater,
    surfacing as zlib errors or silently wrong filter bytes — the CRC
    is exactly the integrity check the format carries for this)."""
    if not is_png(payload):
        raise ValueError("not a PNG: bad signature")
    i = len(PNG_SIGNATURE)
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        if i + 12 + length > len(payload):
            raise ValueError(
                f"truncated PNG: chunk {ctype!r} declares {length} bytes "
                f"past end of payload"
            )
        data = payload[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", payload[i + 8 + length : i + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        i += 12 + length  # length + type + data + CRC
        if ctype == b"IEND":
            return
    raise ValueError("truncated PNG: missing IEND chunk")


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


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unpack_scanlines(
    rec: np.ndarray, h: int, w: int, channels: int, depth: int
) -> np.ndarray:
    """Unfiltered scanline bytes → (h, w, channels) raw sample values
    (sub-byte depths unpack big-endian within each byte, per spec)."""
    if depth == 8:
        return rec.reshape(h, w, channels)
    bits = np.unpackbits(rec, axis=1)[:, : w * channels * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (bits.reshape(h, w * channels, depth) * weights).sum(axis=2)
    return vals.reshape(h, w, channels).astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Full PNG decode → (height, width, channels) uint8 pixel array.

    r5 scope: bit depths 1/2/4/8 (sub-byte for grayscale and palette,
    per spec), color types 0/2/3/4/6 including PLTE-indexed, and Adam7
    interlacing (seven independently filtered passes merged onto the
    pixel grid). 16-bit samples and paletted transparency (tRNS) raise
    a named NotImplementedError."""
    hdr = png_header(payload)
    depth, color = hdr["bit_depth"], hdr["color_type"]
    if depth not in (1, 2, 4, 8):
        raise NotImplementedError(f"PNG bit depth {depth} not supported")
    if color not in (0, 2, 3, 4, 6):
        raise NotImplementedError(f"PNG color type {color} not supported")
    if depth != 8 and color not in (0, 3):
        raise ValueError(f"PNG bit depth {depth} invalid for color type {color}")
    channels = 1 if color == 3 else _PNG_CHANNELS[color]
    w, h = hdr["width"], hdr["height"]
    plte = None
    for ctype, data in png_chunks(payload):
        if ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS" and color == 3:
            raise NotImplementedError("paletted PNG transparency (tRNS) not supported")
    if color == 3 and plte is None:
        raise ValueError("paletted PNG missing PLTE chunk")
    idat = b"".join(data for ctype, data in png_chunks(payload) if ctype == b"IDAT")
    try:
        raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    except zlib.error as exc:
        # the named-guard contract: untrusted bytes never surface a
        # low-level error class (r11 adversarial media battery)
        raise ValueError(f"PNG IDAT deflate stream corrupt: {exc}") from exc
    bpp = max(1, channels * depth // 8)

    def stride_bytes(width: int) -> int:
        return (width * channels * depth + 7) // 8

    if hdr["interlace"] == 0:
        passes = [(0, 0, 1, 1)]
    elif hdr["interlace"] == 1:
        passes = list(_ADAM7)
    else:
        raise ValueError(f"invalid PNG interlace method {hdr['interlace']}")

    out = np.zeros((h, w, channels), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass contributes no scanlines (spec)
        sb = stride_bytes(pw)
        need = ph * (1 + sb)
        if pos + need > raw.size:
            raise ValueError(
                f"PNG data size mismatch: need {pos + need}, got {raw.size}"
            )
        rec = _unfilter(raw[pos : pos + need].reshape(ph, 1 + sb), ph, sb, bpp)
        pos += need
        out[y0::dy, x0::dx] = _unpack_scanlines(rec, ph, pw, channels, depth)
    if pos != raw.size:
        raise ValueError(
            f"PNG data size mismatch: got {raw.size}, expected {pos}"
        )
    if color == 3:
        return plte[out[:, :, 0]]
    if depth != 8:  # grayscale sub-byte: left-bit replication == v·255/max
        out = (out.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    return out


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
        if i + 8 + length > len(payload):
            # a declared size running past the payload is a truncated
            # stream — decoding the partial bytes silently would hand
            # back wrong audio (r11 adversarial media battery)
            raise ValueError(
                f"truncated WAV: chunk {ctype!r} declares {length} bytes "
                f"past end of payload"
            )
        if ctype == b"fmt ":
            if length < 16:
                raise ValueError(f"truncated WAV fmt chunk ({length} bytes)")
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
        if i + 8 + length > len(payload):
            raise ValueError(
                f"truncated WAV: chunk {ctype!r} declares {length} bytes "
                f"past end of payload"
            )
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
    JPEG → [width, height, channels, mean, std, min, max, n_pixels]
           via the full baseline decoder below (Huffman + IDCT);
           progressive/subsampled frames fall back to
           [w, h, ch, bit_depth, progressive, 0, 0, n_pixels] with zeros
           marking the absent pixel-statistic slots.
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
        try:
            px = decode_jpeg(payload).astype(np.float64)
            return [
                float(hdr["width"]), float(hdr["height"]),
                float(hdr["n_channels"]),
                float(px.mean()), float(px.std()),
                float(px.min()), float(px.max()),
                float(hdr["width"] * hdr["height"]),
            ]
        except (NotImplementedError, ValueError):
            # progressive / subsampled / scanless-or-corrupt stream:
            # header-only, zeros mark the absent pixel-statistic slots
            return [
                float(hdr["width"]), float(hdr["height"]),
                float(hdr["n_channels"]), float(hdr["bit_depth"]),
                float(hdr["progressive"]), 0.0, 0.0,
                float(hdr["width"] * hdr["height"]),
            ]
    raise NotImplementedError(
        f"unsupported media format (magic {payload[:4]!r}); real decoders "
        f"exist for PNG, WAV, and baseline JPEG, other codecs need "
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

    Header parse only (the pixel path lives in `decode_jpeg`). The
    marker walk skips entropy-coded segments by honoring each segment's
    declared length, so it is O(#segments), not O(bytes).
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


# --------------------------------------------------------------------------
# Baseline JPEG codec — full pixel path, dependency-free (numpy only).
#
# Closes the one deliberate gap in the round-3 codec tier: JPEG was
# header-only. This implements the ITU T.81 BASELINE profile end to end:
# encoder (level shift → 8×8 DCT-II via matrix product → Annex-K quality-50
# quantization → zigzag → DC prediction → Annex-K Huffman entropy coding
# with 0xFF byte stuffing) and decoder (DQT/SOF0/DHT/SOS/DRI parse →
# canonical-Huffman MCU decode with restart-marker handling → dequantize →
# IDCT → level unshift → YCbCr→RGB). Scope is precise, as everywhere in
# this module: 8-bit grayscale or color, any integer chroma sampling
# (r5), sequential baseline here plus the progressive (SOF2) path
# further below; what remains out (fractional sampling ratios,
# non-interleaved multi-scan baseline, 12-bit) raises a named
# NotImplementedError, never a wrong pixel.
# --------------------------------------------------------------------------

#: zigzag scan order (spec Figure 5)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K quality-50 quantization tables (luma, chroma)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

#: Annex K Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis matrix C: dct = C @ B @ C.T."""
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    C[0, :] = 1.0
    C *= np.sqrt(np.where(k == 0, 1.0, 2.0) / 8.0)[:, None]
    return C


_DCT_C = _dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman per the spec: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude-code) per the spec's signed magnitude coding."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(
    pixels: np.ndarray, subsample: tuple[int, int] = (1, 1)
) -> bytes:
    """Encode uint8 pixels — (H, W) grayscale or (H, W, 3) RGB — as a
    sequential baseline JFIF JPEG (quality-50 Annex-K quantization,
    Annex-K Huffman tables).

    ``subsample`` is the LUMA (h, v) sampling factor pair relative to
    1×1 chroma: (1, 1) = 4:4:4 (default), (2, 1) = 4:2:2, (2, 2) =
    4:2:0. Chroma planes are box-downsampled (mean of each h×v cell) —
    the exact inverse of the decoder's box upsampling, so constant-
    chroma content round-trips to quantization error only."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError(f"encode_jpeg needs uint8 pixels, got {px.dtype}")
    gray = px.ndim == 2
    if not gray and not (px.ndim == 3 and px.shape[2] == 3):
        raise ValueError(f"encode_jpeg needs (H,W) or (H,W,3), got {px.shape}")
    sh, sv = subsample
    if gray:
        sh = sv = 1
    if not (1 <= sh <= 4 and 1 <= sv <= 4):
        raise ValueError(f"invalid subsample factors {subsample}")
    h, w = px.shape[:2]
    if gray:
        comps = [px.astype(np.float64)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]

    dc_l = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    # MCU grid sized by the luma factors; chroma box-downsampled
    mcux = (w + 8 * sh - 1) // (8 * sh)
    mcuy = (h + 8 * sv - 1) // (8 * sv)
    factors = [(sh, sv)] + [(1, 1)] * (len(comps) - 1)
    padded = []
    for ci, comp in enumerate(comps):
        fx, fv = factors[ci]
        if ci > 0 and (sh > 1 or sv > 1):
            # pad to a cell multiple with edge values, then box-mean
            ph = (h + sv - 1) // sv * sv
            pw = (w + sh - 1) // sh * sh
            c = np.pad(comp, ((0, ph - h), (0, pw - w)), mode="edge")
            comp = c.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        th, tw = mcuy * 8 * fv, mcux * 8 * fx
        p = np.pad(
            comp,
            ((0, th - comp.shape[0]), (0, tw - comp.shape[1])),
            mode="edge",
        )
        padded.append(p)

    writer = _BitWriter()
    dc_prev = [0] * len(comps)

    def put_block(comp: np.ndarray, by: int, bx: int, ci: int) -> None:
        qt = _QT_LUMA if ci == 0 else _QT_CHROMA
        dc_t = dc_l if ci == 0 else dc_c
        ac_t = ac_l if ci == 0 else ac_c
        block = comp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        coef = _DCT_C @ block @ _DCT_C.T
        q = np.round(coef / qt).astype(np.int64)
        zz = q.ravel()[_ZZ]
        # DC
        diff = int(zz[0]) - dc_prev[ci]
        dc_prev[ci] = int(zz[0])
        s, amp = _magnitude(diff)
        code, ln = dc_t[s]
        writer.put(code, ln)
        if s:
            writer.put(amp, s)
        # AC with run-length + EOB/ZRL
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_t[0xF0]
                writer.put(code, ln)
                run -= 16
            s, amp = _magnitude(v)
            code, ln = ac_t[run * 16 + s]
            writer.put(code, ln)
            writer.put(amp, s)
            run = 0
        if run:
            code, ln = ac_t[0x00]
            writer.put(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, comp in enumerate(padded):
                fx, fv = factors[ci]
                for bv in range(fv):
                    for bhh in range(fx):
                        put_block(comp, my * fv + bv, mx * fx + bhh, ci)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(_QT_LUMA.ravel()[_ZZ].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, b"\x01" + bytes(_QT_CHROMA.ravel()[_ZZ].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (sh << 4) | sv if ci == 0 else 0x11
        sof += struct.pack(">BBB", ci + 1, hv, 0 if ci == 0 else 1)
    out += seg(0xC0, sof)
    for tclass, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        if gray and tid == 1:
            continue
        out += seg(0xC4, bytes([tclass * 16 + tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.buf
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and restart-marker
    awareness (`marker` holds a pending RSTn/EOI when hit)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("unexpected end of JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                b = 0  # feed zero bits once a marker is pending
                self.pos += 0 if nxt else 1
                self.acc = (self.acc << 8) | 0
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def align_after_marker(self) -> None:
        """Consume a pending RST marker and realign to the byte stream."""
        self.acc = 0
        self.n = 0
        self.pos += 2  # skip FF Dn
        self.marker = None


def _huff_decoder(bits: list[int], vals: list[int]):
    """(min_code, max_code, val_index) arrays for canonical decode."""
    codes = _huff_codes(bits, vals)
    by_len: dict[int, dict[int, int]] = {}
    for val, (code, ln) in codes.items():
        by_len.setdefault(ln, {})[code] = val
    return by_len


def _read_huff(reader: _BitReader, by_len: dict[int, dict[int, int]]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.bits(1)
        tab = by_len.get(ln)
        if tab is not None and code in tab:
            return tab[code]
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a sequential baseline JPEG to uint8 pixels — (H, W) for
    grayscale, (H, W, 3) RGB otherwise. Subsampled chroma (4:2:0 /
    4:2:2 / any integer h×v ≤ 4, r5) decodes with box upsampling;
    progressive frames and non-interleaved multi-scan files raise
    NotImplementedError naming the feature.

    Guard surface (r11 adversarial media battery): a payload with no
    EOI marker is a truncated stream and refuses up front (in entropy
    data 0xFF is always stuffed or a restart marker, so a genuine
    FF D9 cannot occur before the real EOI — its absence is
    conclusive); any low-level error class escaping the segment walk
    on corrupt bytes (IndexError in a Huffman table, KeyError on a
    dangling component id, struct framing) converts to the contract's
    named ValueError instead of leaking."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG: bad SOI marker")
    if payload.rfind(b"\xff\xd9") < 0:
        raise ValueError("truncated JPEG: missing EOI marker")
    try:
        return _decode_jpeg_inner(payload)
    except (
        IndexError, KeyError, struct.error, ZeroDivisionError,
        OverflowError,  # corrupt magnitude category → 1<<s beyond C long
    ) as exc:
        raise ValueError(
            f"JPEG stream truncated or corrupt: "
            f"{type(exc).__name__}: {exc}"
        ) from exc


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    comps: list[dict] = []
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        (length,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + length]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ] = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                qts[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(body[j + 17 : j + 17 + cnt])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_decoder(bits, vals)
                j += 17 + cnt
        elif marker in _JPEG_SOF:
            if marker == 0xC2:
                return _decode_progressive(payload)
            if marker != 0xC0 and marker != 0xC1:
                raise NotImplementedError(f"JPEG SOF{marker - 0xC0} profile not supported")
            depth, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise NotImplementedError(f"JPEG bit depth {depth} not supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(f"invalid JPEG sampling factors {ch}x{cv}")
                comps.append({"id": cid, "tq": tq, "h": ch, "v": cv})
            if nc == 1:
                # single-component frames scan non-interleaved: one data
                # unit per MCU, sampling factors ignored (spec A.2.2)
                comps[0]["h"] = comps[0]["v"] = 1
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if hmax % c["h"] or vmax % c["v"]:
                    raise NotImplementedError(
                        "fractional JPEG chroma sampling ratios not supported"
                    )
            frame = (fh, fw, nc, hmax, vmax)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            sel = {}
            for ci in range(ns):
                cid, tabs = body[1 + ci * 2], body[2 + ci * 2]
                sel[cid] = (tabs >> 4, tabs & 0x0F)
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            fh, fw, nc, hmax, vmax = frame
            if ns != nc:
                # non-interleaved layout: scans cover component subsets —
                # decode through the scan-accumulating path (r5)
                return _decode_progressive(payload)
            mcux = (fw + 8 * hmax - 1) // (8 * hmax)
            mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
            planes = [
                np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]),
                         dtype=np.float64)
                for c in comps
            ]
            reader = _BitReader(payload, i + 2 + length)
            dc_prev = [0] * nc
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        # byte-align and consume the RST marker
                        while reader.marker is None:
                            reader.bits(1)
                        if not (0xD0 <= reader.marker <= 0xD7):
                            raise ValueError("expected JPEG restart marker")
                        reader.align_after_marker()
                        dc_prev = [0] * nc
                    for ci in range(nc):
                        cd = comps[ci]
                        dct, act = sel[cd["id"]]
                        # an MCU carries h x v data units per component,
                        # row-major (spec A.2.3 interleaved order)
                        for bv in range(cd["v"]):
                            for bhh in range(cd["h"]):
                                zz = np.zeros(64, dtype=np.int64)
                                s = _read_huff(reader, dc_tabs[dct])
                                diff = _extend(reader.bits(s), s) if s else 0
                                dc_prev[ci] += diff
                                zz[0] = dc_prev[ci]
                                k = 1
                                while k < 64:
                                    rs = _read_huff(reader, ac_tabs[act])
                                    r, s = rs >> 4, rs & 0x0F
                                    if s == 0:
                                        if r == 15:
                                            k += 16
                                            continue
                                        break  # EOB
                                    k += r
                                    if k > 63:
                                        raise ValueError("JPEG AC index overflow")
                                    zz[k] = _extend(reader.bits(s), s)
                                    k += 1
                                coef = np.zeros(64, dtype=np.float64)
                                coef[_ZZ] = zz
                                block = coef.reshape(8, 8) * qts[cd["tq"]]
                                px = _DCT_C.T @ block @ _DCT_C + 128.0
                                py0 = (my * cd["v"] + bv) * 8
                                px0 = (mx * cd["h"] + bhh) * 8
                                planes[ci][py0 : py0 + 8, px0 : px0 + 8] = px
                    mcu += 1
            # crop each component to its true size, then upsample to the
            # frame grid by sample replication (box upsampling — exact
            # for the box-downsampled encoder below; libjpeg's "fancy"
            # triangle filter is a documented divergence)
            up = []
            for ci, c in enumerate(comps):
                cw = (fw * c["h"] + hmax - 1) // hmax
                chh = (fh * c["v"] + vmax - 1) // vmax
                p = planes[ci][:chh, :cw]
                p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                              hmax // c["h"], axis=1)[:fh, :fw]
                up.append(p)
            planes = up
            if nc == 1:
                return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
            y, cb, cr = planes
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            rgb = np.stack([r, g, b], axis=-1)
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        i += 2 + length
    raise ValueError("no JPEG scan (SOS) found")


# --------------------------------------------------------------------------
# Progressive JPEG (SOF2) — spectral selection + successive approximation.
# The decoder accumulates quantized coefficients across scans and runs the
# IDCT once at end-of-image; the encoder exists chiefly so the decoder can
# be validated by EXACT roundtrip (progressive is a reordering of the same
# quantized coefficients, so decode(progressive(img)) must be bit-identical
# to decode(baseline(img)) at equal sampling). EOB runs are emitted as
# EOB0 only — Annex-K AC tables carry no EOBn>0 symbols.


def _next_marker(data: bytes, pos: int) -> int:
    """Index of the next non-stuffed, non-RST marker's 0xFF at/after
    ``pos`` (the terminator of an entropy-coded segment)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7) and nxt != 0xFF:
                return pos
            pos += 2 if nxt in (0x00,) or (0xD0 <= nxt <= 0xD7) else 1
        else:
            pos += 1
    return n


def _comp_block_grid(frame, comp) -> tuple[int, int]:
    """(block rows, block cols) of one component's NON-INTERLEAVED scan
    (spec A.2.2: ceil of the component's true dimensions / 8)."""
    fh, fw, _nc, hmax, vmax = frame
    cw = (fw * comp["h"] + hmax - 1) // hmax
    ch = (fh * comp["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_progressive(payload: bytes) -> np.ndarray:
    """Decode a multi-scan JPEG — progressive (SOF2) or NON-INTERLEAVED
    baseline (SOF0/1 whose scans cover component subsets): every scan
    deposits DC/AC
    coefficient bits (first scans shift by Al; refinement scans add
    correction bits — two's-complement for DC, magnitude-based for AC,
    exactly the G.1.2 point-transform rules); reconstruction
    (dequantize + IDCT + box chroma upsampling) runs once at EOI."""
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    comps: list[dict] = []
    coefs: list[np.ndarray] = []
    scanned: set[int] = set()
    restart_interval = 0
    eobrun = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        (length,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + length]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ] = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                qts[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(body[j + 17 : j + 17 + cnt])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_decoder(bits, vals)
                j += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):
            baseline = marker != 0xC2
            depth, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise NotImplementedError(f"JPEG bit depth {depth} not supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                ch, cv = hv >> 4, hv & 0x0F
                comps.append({"id": cid, "tq": tq, "h": ch, "v": cv})
            if nc == 1:
                comps[0]["h"] = comps[0]["v"] = 1
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if hmax % c["h"] or vmax % c["v"]:
                    raise NotImplementedError(
                        "fractional JPEG chroma sampling ratios not supported"
                    )
            frame = (fh, fw, nc, hmax, vmax)
            mcux = (fw + 8 * hmax - 1) // (8 * hmax)
            mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
            coefs = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in _JPEG_SOF:
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} profile not supported"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            fh, fw, nc, hmax, vmax = frame
            ns = body[0]
            sel = []
            for ci in range(ns):
                cid, tabs = body[1 + ci * 2], body[2 + ci * 2]
                idx = next(k for k, c in enumerate(comps) if c["id"] == cid)
                sel.append((idx, tabs >> 4, tabs & 0x0F))
                scanned.add(idx)
            ss, se, a = body[1 + ns * 2 : 4 + ns * 2]
            ah, al = a >> 4, a & 0x0F
            if baseline:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("invalid baseline scan header")
            else:
                if ss == 0 and se != 0:
                    raise ValueError(
                        "invalid progressive scan script: DC scan with Se != 0 "
                        "(baseline entropy data under an SOF2 header?)"
                    )
                if ss > 0 and ns != 1:
                    raise ValueError("interleaved progressive AC scan")
            reader = _BitReader(payload, i + 2 + length)
            eobrun = 0
            p1, m1 = 1 << al, -(1 << al)

            def refine_band(zz: np.ndarray, k0: int) -> None:
                for k2 in range(k0, se + 1):
                    c = int(zz[k2])
                    if c != 0 and reader.bits(1) and not (c & p1):
                        zz[k2] = c + (p1 if c >= 0 else m1)

            def decode_block(zz: np.ndarray, ci_sel: int) -> None:
                nonlocal eobrun
                _idx, dct, act = sel[ci_sel]
                if baseline:  # full DC+AC block, no point transform
                    s = _read_huff(reader, dc_tabs[dct])
                    diff = _extend(reader.bits(s), s) if s else 0
                    dc_pred[ci_sel] += diff
                    zz[0] = dc_pred[ci_sel]
                    k = 1
                    while k < 64:
                        rs = _read_huff(reader, ac_tabs[act])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        zz[k] = _extend(reader.bits(s), s)
                        k += 1
                    return
                if ss == 0:  # DC scan
                    if ah == 0:
                        s = _read_huff(reader, dc_tabs[dct])
                        diff = _extend(reader.bits(s), s) if s else 0
                        dc_pred[ci_sel] += diff
                        zz[0] = dc_pred[ci_sel] << al
                    else:
                        if reader.bits(1):
                            zz[0] = int(zz[0]) | p1
                    return
                if ah == 0:  # AC first scan
                    if eobrun > 0:
                        eobrun -= 1
                        return
                    k = ss
                    while k <= se:
                        rs = _read_huff(reader, ac_tabs[act])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC index overflow")
                        zz[k] = _extend(reader.bits(s), s) << al
                        k += 1
                    return
                # AC refinement scan
                if eobrun > 0:
                    eobrun -= 1
                    refine_band(zz, ss)
                    return
                k = ss
                hit_eob = False
                while k <= se:
                    rs = _read_huff(reader, ac_tabs[act])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.bits(r)
                            hit_eob = True
                            break
                        val = 0  # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("invalid AC refinement symbol")
                        val = p1 if reader.bits(1) else m1
                    while k <= se:
                        c = int(zz[k])
                        if c != 0:
                            if reader.bits(1) and not (c & p1):
                                zz[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                if val:
                                    zz[k] = val
                                k += 1
                                break
                            r -= 1
                        k += 1
                if hit_eob:
                    refine_band(zz, k)
                    eobrun -= 1

            dc_pred = [0] * ns
            mcu = 0

            def maybe_restart() -> None:
                nonlocal dc_pred, eobrun
                if restart_interval and mcu and mcu % restart_interval == 0:
                    while reader.marker is None:
                        reader.bits(1)
                    if not (0xD0 <= reader.marker <= 0xD7):
                        raise ValueError("expected JPEG restart marker")
                    reader.align_after_marker()
                    dc_pred = [0] * ns
                    eobrun = 0

            if ns > 1:  # interleaved (progressive: DC scans only, B.2.3)
                if ss != 0 and not baseline:
                    raise ValueError("interleaved progressive AC scan")
                mcux = (fw + 8 * hmax - 1) // (8 * hmax)
                mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
                for my in range(mcuy):
                    for mx in range(mcux):
                        maybe_restart()
                        for ci_sel, (idx, _d, _a) in enumerate(sel):
                            cd = comps[idx]
                            for bv in range(cd["v"]):
                                for bhh in range(cd["h"]):
                                    decode_block(
                                        coefs[idx][my * cd["v"] + bv,
                                                   mx * cd["h"] + bhh],
                                        ci_sel,
                                    )
                        mcu += 1
            else:
                idx = sel[0][0]
                bh_c, bw_c = _comp_block_grid(frame, comps[idx])
                for by in range(bh_c):
                    for bx in range(bw_c):
                        maybe_restart()
                        decode_block(coefs[idx][by, bx], 0)
                        mcu += 1
            i = _next_marker(payload, reader.pos)
            continue
        i += 2 + length
    if frame is None or not coefs:
        raise ValueError("no JPEG frame decoded")
    missing = set(range(len(comps))) - scanned
    if missing:
        raise ValueError(
            f"JPEG stream carries no scan for component(s) {sorted(missing)} "
            "— truncated or malformed; refusing to emit zeroed planes"
        )
    fh, fw, nc, hmax, vmax = frame
    planes = []
    for ci, c in enumerate(comps):
        grid = coefs[ci]
        gh, gw = grid.shape[:2]
        plane = np.zeros((gh * 8, gw * 8), dtype=np.float64)
        qt = qts[c["tq"]]
        for by in range(gh):
            for bx in range(gw):
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZZ] = grid[by, bx]
                block = coef.reshape(8, 8) * qt
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT_C.T @ block @ _DCT_C + 128.0
                )
        cw = (fw * c["h"] + hmax - 1) // hmax
        chh = (fh * c["v"] + vmax - 1) // vmax
        p = plane[:chh, :cw]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)[:fh, :fw]
        planes.append(p)
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _quantized_blocks(
    px: np.ndarray, subsample: tuple[int, int]
) -> tuple[list[np.ndarray], tuple, int, int]:
    """Shared encoder front half: color transform, chroma box-downsample,
    pad, forward DCT, quantize. Returns (per-comp zigzag coef grids of
    shape (bh, bw, 64), frame tuple, mcux, mcuy) — the same quantized
    coefficients the baseline encoder writes, so baseline and
    progressive encodings of one image decode bit-identically."""
    gray = px.ndim == 2
    sh, sv = (1, 1) if gray else subsample
    h, w = px.shape[:2]
    if gray:
        comps = [px.astype(np.float64)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    mcux = (w + 8 * sh - 1) // (8 * sh)
    mcuy = (h + 8 * sv - 1) // (8 * sv)
    factors = [(sh, sv)] + [(1, 1)] * (len(comps) - 1)
    grids = []
    for ci, comp in enumerate(comps):
        fx, fv = factors[ci]
        if ci > 0 and (sh > 1 or sv > 1):
            ph = (h + sv - 1) // sv * sv
            pw = (w + sh - 1) // sh * sh
            c = np.pad(comp, ((0, ph - h), (0, pw - w)), mode="edge")
            comp = c.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        th, tw = mcuy * 8 * fv, mcux * 8 * fx
        p = np.pad(
            comp,
            ((0, th - comp.shape[0]), (0, tw - comp.shape[1])),
            mode="edge",
        )
        qt = _QT_LUMA if ci == 0 else _QT_CHROMA
        bh, bw = th // 8, tw // 8
        grid = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _DCT_C @ block @ _DCT_C.T
                q = np.round(coef / qt).astype(np.int64)
                grid[by, bx] = q.ravel()[_ZZ]
        grids.append(grid)
    nc = len(comps)
    frame = (h, w, nc, sh if nc > 1 else 1, sv if nc > 1 else 1)
    return grids, frame, mcux, mcuy


def encode_jpeg_progressive(
    pixels: np.ndarray,
    subsample: tuple[int, int] = (1, 1),
    bands: tuple = ((1, 5), (6, 63)),
    al: int = 1,
) -> bytes:
    """Encode a progressive (SOF2) JPEG with a standard-shaped scan
    script: DC first (Al=``al``) interleaved, per-component AC first
    scans over each spectral ``band`` (Al=``al``), then DC and AC
    refinement scans down to Al=0 — exercising spectral selection AND
    successive approximation. Quantized coefficients are IDENTICAL to
    :func:`encode_jpeg`'s (shared front half), so the two encodings
    must decode bit-identically. EOB runs are emitted as EOB0 only
    (Annex-K AC tables carry no EOBn>0 symbols)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError(f"encode_jpeg_progressive needs uint8, got {px.dtype}")
    gray = px.ndim == 2
    if not gray and not (px.ndim == 3 and px.shape[2] == 3):
        raise ValueError(f"needs (H,W) or (H,W,3), got {px.shape}")
    grids, frame, mcux, mcuy = _quantized_blocks(px, subsample)
    fh, fw, nc, sh, sv = frame
    factors = [(sh, sv)] + [(1, 1)] * (nc - 1)
    comps_meta = [
        {"id": ci + 1, "h": factors[ci][0], "v": factors[ci][1],
         "tq": 0 if ci == 0 else 1}
        for ci in range(nc)
    ]

    dc_l = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(_QT_LUMA.ravel()[_ZZ].astype(np.uint8)))
    if nc > 1:
        out += seg(0xDB, b"\x01" + bytes(_QT_CHROMA.ravel()[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, fh, fw, nc)
    for c in comps_meta:
        sof += struct.pack(">BBB", c["id"], (c["h"] << 4) | c["v"], c["tq"])
    out += seg(0xC2, sof)
    for tclass, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        if nc == 1 and tid == 1:
            continue
        out += seg(0xC4, bytes([tclass * 16 + tid]) + bytes(bits) + bytes(vals))

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int,
                   a_low: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            tabs = (0 << 4) | 0 if cid == 1 else (1 << 4) | 1
            body += bytes([cid, tabs])
        body += bytes([ss, se, (ah << 4) | a_low])
        return seg(0xDA, body)

    def dc_first_scan(a_low: int) -> bytes:
        writer = _BitWriter()
        prev = [0] * nc
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    fx, fv = factors[ci]
                    dc_t = dc_l if ci == 0 else dc_c
                    for bv in range(fv):
                        for bhh in range(fx):
                            v = int(grids[ci][my * fv + bv, mx * fx + bhh, 0])
                            t = v >> a_low  # arithmetic shift (spec DC rule)
                            diff = t - prev[ci]
                            prev[ci] = t
                            s, amp = _magnitude(diff)
                            code, ln = dc_t[s]
                            writer.put(code, ln)
                            if s:
                                writer.put(amp, s)
        writer.flush()
        return bytes(writer.buf)

    def dc_refine_scan(a_low: int) -> bytes:
        writer = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    fx, fv = factors[ci]
                    for bv in range(fv):
                        for bhh in range(fx):
                            v = int(grids[ci][my * fv + bv, mx * fx + bhh, 0])
                            writer.put((v >> a_low) & 1, 1)
        writer.flush()
        return bytes(writer.buf)

    def comp_blocks(ci: int):
        bh_c, bw_c = _comp_block_grid(frame, comps_meta[ci])
        for by in range(bh_c):
            for bx in range(bw_c):
                yield grids[ci][by, bx]

    def ac_first_scan(ci: int, ss: int, se: int, a_low: int) -> bytes:
        writer = _BitWriter()
        ac_t = ac_l if ci == 0 else ac_c
        for zz in comp_blocks(ci):
            run = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> a_low  # magnitude shift (spec AC rule)
                if t == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = ac_t[0xF0]
                    writer.put(code, ln)
                    run -= 16
                s, amp = _magnitude(t if v > 0 else -t)
                code, ln = ac_t[run * 16 + s]
                writer.put(code, ln)
                writer.put(amp, s)
                run = 0
            if run:
                code, ln = ac_t[0x00]  # EOB0
                writer.put(code, ln)
        writer.flush()
        return bytes(writer.buf)

    def ac_refine_scan(ci: int, ss: int, se: int, a_low: int) -> bytes:
        writer = _BitWriter()
        ac_t = ac_l if ci == 0 else ac_c
        for zz in comp_blocks(ci):
            absv = [abs(int(zz[k])) >> a_low for k in range(64)]
            eob = 0
            for k in range(ss, se + 1):
                if absv[k] == 1:
                    eob = k
            run = 0
            pending: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    code, ln = ac_t[0xF0]
                    writer.put(code, ln)
                    run -= 16
                    for bit in pending:
                        writer.put(bit, 1)
                    pending = []
                if t > 1:  # history coefficient: append its correction bit
                    pending.append(t & 1)
                    continue
                # newly significant (t == 1)
                code, ln = ac_t[run * 16 + 1]
                writer.put(code, ln)
                writer.put(1 if int(zz[k]) >= 0 else 0, 1)
                for bit in pending:
                    writer.put(bit, 1)
                pending = []
                run = 0
            if run > 0 or pending:
                code, ln = ac_t[0x00]  # EOB0
                writer.put(code, ln)
                for bit in pending:
                    writer.put(bit, 1)
        writer.flush()
        return bytes(writer.buf)

    all_ids = [c["id"] for c in comps_meta]
    out += sos_header(all_ids, 0, 0, 0, al) + dc_first_scan(al)
    for ci in range(nc):
        for ss, se in bands:
            out += sos_header([comps_meta[ci]["id"]], ss, se, 0, al)
            out += ac_first_scan(ci, ss, se, al)
    for a_low in range(al - 1, -1, -1):
        out += sos_header(all_ids, 0, 0, a_low + 1, a_low)
        out += dc_refine_scan(a_low)
        for ci in range(nc):
            for ss, se in bands:
                out += sos_header([comps_meta[ci]["id"]], ss, se,
                                  a_low + 1, a_low)
                out += ac_refine_scan(ci, ss, se, a_low)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_noninterleaved(
    pixels: np.ndarray, subsample: tuple[int, int] = (1, 1)
) -> bytes:
    """Encode a baseline (SOF0) JPEG whose components ship in SEPARATE
    scans (ns=1 each) — the non-interleaved layout some encoders emit.
    Same quantized coefficients as :func:`encode_jpeg` (shared front
    half), so the two encodings decode bit-identically; exists chiefly
    to validate the decoder's multi-scan baseline path."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError(f"needs uint8 pixels, got {px.dtype}")
    gray = px.ndim == 2
    if not gray and not (px.ndim == 3 and px.shape[2] == 3):
        raise ValueError(f"needs (H,W) or (H,W,3), got {px.shape}")
    grids, frame, _mcux, _mcuy = _quantized_blocks(px, subsample)
    fh, fw, nc, sh, sv = frame
    factors = [(sh, sv)] + [(1, 1)] * (nc - 1)
    comps_meta = [
        {"id": ci + 1, "h": factors[ci][0], "v": factors[ci][1],
         "tq": 0 if ci == 0 else 1}
        for ci in range(nc)
    ]
    dc_l = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(_QT_LUMA.ravel()[_ZZ].astype(np.uint8)))
    if nc > 1:
        out += seg(0xDB, b"\x01" + bytes(_QT_CHROMA.ravel()[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, fh, fw, nc)
    for c in comps_meta:
        sof += struct.pack(">BBB", c["id"], (c["h"] << 4) | c["v"], c["tq"])
    out += seg(0xC0, sof)
    for tclass, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        if nc == 1 and tid == 1:
            continue
        out += seg(0xC4, bytes([tclass * 16 + tid]) + bytes(bits) + bytes(vals))

    for ci in range(nc):
        dc_t = dc_l if ci == 0 else dc_c
        ac_t = ac_l if ci == 0 else ac_c
        tabs = 0x00 if ci == 0 else 0x11
        out += seg(0xDA, bytes([1, comps_meta[ci]["id"], tabs, 0, 63, 0]))
        writer = _BitWriter()
        prev = 0
        bh_c, bw_c = _comp_block_grid(frame, comps_meta[ci])
        for by in range(bh_c):
            for bx in range(bw_c):
                zz = grids[ci][by, bx]
                diff = int(zz[0]) - prev
                prev = int(zz[0])
                s, amp = _magnitude(diff)
                code, ln = dc_t[s]
                writer.put(code, ln)
                if s:
                    writer.put(amp, s)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = ac_t[0xF0]
                        writer.put(code, ln)
                        run -= 16
                    s, amp = _magnitude(v)
                    code, ln = ac_t[run * 16 + s]
                    writer.put(code, ln)
                    writer.put(amp, s)
                    run = 0
                if run:
                    code, ln = ac_t[0x00]
                    writer.put(code, ln)
        writer.flush()
        out += bytes(writer.buf)
    out += b"\xff\xd9"
    return bytes(out)
