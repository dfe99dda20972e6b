"""Multimodal column plumbing tests — the Spark-side contract (schema,
batching, row expansion) is real even though the codec kernel is stubbed."""

import pytest
from pyspark.sql import Row

from trading_dashboard_spark.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_media_batch,
    frame_sample,
)


def _media_df(spark):
    rows = [
        Row(media_id=1, media_type="image", payload=b"\x89PNG-fake-bytes",
            meta=Row(width=64, height=64, duration_ms=None, codec="png")),
        Row(media_id=2, media_type="video", payload=b"fake-mp4",
            meta=Row(width=320, height=240, duration_ms=3500, codec="h264")),
        Row(media_id=3, media_type="audio", payload=None,
            meta=Row(width=None, height=None, duration_ms=1000, codec="wav")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_attach_metadata_jvm_side(spark):
    df = attach_media_metadata(_media_df(spark))
    out = {r["media_id"]: (r["n_bytes"], r["payload_md5"]) for r in df.collect()}
    assert out[1][0] == 15 and out[3][0] is None


def test_decode_batch_deterministic_features(spark):
    df = decode_media_batch(_media_df(spark))
    a = df.collect()
    b = decode_media_batch(_media_df(spark)).collect()
    fa = {r["media_id"]: r["features"] for r in a}
    fb = {r["media_id"]: r["features"] for r in b}
    assert fa == fb
    assert len(fa[1]) == 8 and all(0 <= x <= 1 for x in fa[1])
    assert fa[3] == [0.0] * 8  # null payload -> zero features


def test_decode_real_path_raises(spark):
    with pytest.raises(Exception):
        decode_media_batch(_media_df(spark), fake=False).collect()


def test_frame_sample_row_expansion(spark):
    out = frame_sample(_media_df(spark), every_ms=1000).toPandas()
    per = out.groupby("media_id").size().to_dict()
    # 3500ms video -> 3 frames; image (no duration) -> 1; 1000ms audio -> 1
    assert per == {1: 1, 2: 3, 3: 1}
    assert set(out.columns) == {"media_id", "frame_idx", "frame_ms", "frame_features"}


def test_media_from_documents_deterministic(spark, sf_dir):
    from trading_dashboard_spark.io.readers import load_table
    from trading_dashboard_spark.multimodal.columns import media_from_documents

    media = media_from_documents(load_table(spark, "documents", sf_dir))
    rows = media.limit(10).collect()
    assert {r["media_type"] for r in media.select("media_type").distinct().collect()} == {
        "image", "audio", "video"
    }
    for r in rows:
        if r["media_type"] == "image":
            assert r["meta"]["width"] is not None and r["meta"]["duration_ms"] is None
        else:
            assert r["meta"]["width"] is None and r["meta"]["duration_ms"] is not None
        assert r["payload"] is not None


def test_png_codec_roundtrip():
    """Real PNG decode: encode a known pixel array (stdlib-only writer),
    decode it back bit-exactly; header parse agrees; unsupported formats
    raise with the format named."""
    import numpy as np
    import pytest

    from trading_dashboard_spark.multimodal.codecs import (
        decode_png,
        encode_png,
        media_features,
        png_header,
    )

    rng = np.random.RandomState(11)
    for shape in [(5, 7, 3), (4, 4, 1), (3, 6, 4)]:
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        payload = encode_png(px)
        hdr = png_header(payload)
        assert (hdr["width"], hdr["height"]) == (shape[1], shape[0])
        assert np.array_equal(decode_png(payload), px)
        feats = media_features(payload)
        assert feats[0] == shape[1] and feats[1] == shape[0] and feats[2] == shape[2]
        assert abs(feats[3] - px.astype(float).mean()) < 1e-9
    with pytest.raises(NotImplementedError, match="magic"):
        media_features(b"GIF89a not a supported format")
    # JPEG bytes now route to the header parser; truncated ones raise
    # a precise ValueError, never a wrong answer
    with pytest.raises(ValueError, match="no SOF"):
        media_features(b"\xff\xd8\xff\xd9")


def test_png_decode_all_filter_types():
    """Decode PNGs whose scanlines use filters 1/2/3/4 (Sub/Up/Average/
    Paeth), hand-built at the zlib level — proves the unfilter path, not
    just the filter-0 writer round-trip."""
    import struct
    import zlib

    import numpy as np

    from trading_dashboard_spark.multimodal.codecs import PNG_SIGNATURE, decode_png

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    h, w, c = px.shape
    bpp = c

    # forward-filter each scanline with a distinct type (0..4)
    lines = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = px[y].reshape(-1).astype(np.int32)
        ftype = y % 5
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = (cur - left) & 0xFF
        elif ftype == 2:
            filt = (cur - prev) & 0xFF
        elif ftype == 3:
            filt = (cur - (left + prev) // 2) & 0xFF
        else:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            filt = (cur - pred) & 0xFF
        lines.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
        prev = cur

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), px)


def test_wav_codec_roundtrip():
    """Real WAV decode: write PCM16 with the stdlib wave module, decode
    samples and duration back exactly."""
    import io
    import wave

    import numpy as np

    from trading_dashboard_spark.multimodal.codecs import (
        decode_wav,
        media_features,
        wav_header,
    )

    rate, n_frames = 8000, 1600  # 200 ms
    t = np.arange(n_frames)
    samples = (np.sin(2 * np.pi * 440 * t / rate) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    payload = buf.getvalue()

    hdr = wav_header(payload)
    assert hdr["sample_rate"] == rate and hdr["n_frames"] == n_frames
    assert hdr["duration_ms"] == 200
    decoded, got_rate = decode_wav(payload)
    assert got_rate == rate and np.array_equal(decoded[:, 0], samples)
    feats = media_features(payload)
    assert feats[0] == 200.0 and feats[1] == float(rate) and feats[7] == float(n_frames)


def test_decode_media_batch_real_decoders(spark):
    """fake=False end-to-end through the mapInPandas stage: PNG and WAV
    payloads produce real decoded features on executors."""
    import io
    import wave

    import numpy as np

    from trading_dashboard_spark.multimodal.codecs import encode_png
    from trading_dashboard_spark.multimodal.columns import decode_media_batch

    png = encode_png(np.full((8, 6, 3), 128, dtype=np.uint8))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(b"\x00\x00" * 2 * 1600)  # 100 ms silence, stereo
    wav = buf.getvalue()

    df = spark.createDataFrame(
        [
            (1, "image", bytearray(png), (6, 8, None, "png")),
            (2, "audio", bytearray(wav), (None, None, 100, "pcm")),
        ],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:long,codec:string>",
    )
    out = {r["media_id"]: r for r in decode_media_batch(df, fake=False).collect()}
    assert out[1]["features"][:3] == [6.0, 8.0, 3.0]  # width, height, channels
    assert out[1]["features"][3] == 128.0  # mean pixel
    assert out[2]["features"][0] == 100.0  # duration_ms
    assert out[2]["features"][2] == 2.0  # channels


def _mini_jpeg(w, h, n_ch=3, marker=0xC0):
    import struct

    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof_len = 8 + 3 * n_ch
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(n_ch))
    sof = bytes([0xFF, marker]) + struct.pack(">HBHHB", sof_len, 8, h, w, n_ch) + comps
    return soi + app0 + sof + b"\xff\xd9"


def test_jpeg_header_parse():
    from trading_dashboard_spark.multimodal.codecs import (
        is_jpeg, jpeg_header, media_features,
    )

    payload = _mini_jpeg(640, 480)
    assert is_jpeg(payload)
    hdr = jpeg_header(payload)
    assert (hdr["width"], hdr["height"], hdr["n_channels"]) == (640, 480, 3)
    assert hdr["bit_depth"] == 8 and hdr["progressive"] is False
    feats = media_features(payload)
    assert feats[:3] == [640.0, 480.0, 3.0]
    assert feats[7] == 640.0 * 480.0

    prog = jpeg_header(_mini_jpeg(32, 16, n_ch=1, marker=0xC2))
    assert prog["progressive"] is True and prog["n_channels"] == 1


def test_jpeg_header_rejects_garbage():
    import pytest as _pytest

    from trading_dashboard_spark.multimodal.codecs import jpeg_header

    with _pytest.raises(ValueError, match="bad SOI"):
        jpeg_header(b"\x89PNG\r\n\x1a\n")
    with _pytest.raises(ValueError, match="no SOF"):
        jpeg_header(b"\xff\xd8\xff\xd9")


def test_jpeg_header_skips_fill_bytes():
    """The JPEG spec allows any run of 0xFF fill bytes before a marker;
    the walk must skip them instead of parsing 0xFF as a length-bearing
    marker (which misreads the stream or raises 'bad marker sync')."""
    import struct

    from trading_dashboard_spark.multimodal.codecs import jpeg_header

    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(3))
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 9, 8, 480, 640, 3) + comps
    # fill bytes before APP0 and before the SOF marker
    payload = soi + b"\xff\xff\xff" + app0 + b"\xff" * 5 + sof + b"\xff\xd9"
    hdr = jpeg_header(payload)
    assert (hdr["width"], hdr["height"], hdr["n_channels"]) == (640, 480, 3)


def test_encode_wav_roundtrip_and_rms_windows(spark):
    """encode_wav -> decode_wav is exact for PCM16 mono; the windowed
    RMS operator matches numpy per window and keeps the short tail
    window unpadded."""
    import numpy as np

    from trading_dashboard_spark.multimodal.codecs import decode_wav, encode_wav
    from trading_dashboard_spark.multimodal.columns import audio_rms_windows

    s = (np.arange(250) * 37 % 1999 - 999).astype("int16")
    payload = encode_wav(s, 8000)
    decoded, rate = decode_wav(payload)
    assert rate == 8000 and decoded.shape == (250, 1)
    assert (decoded[:, 0] == s).all()

    df = spark.createDataFrame([(7, bytearray(payload))], "media_id long, payload binary")
    rows = {r["window_idx"]: r for r in audio_rms_windows(df, 100).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert rows[2]["n_samples"] == 50  # tail window is short, not padded
    for w, r in rows.items():
        win = s[w * 100 : (w + 1) * 100].astype(np.float64)
        assert abs(r["rms"] - float(np.sqrt(np.mean(win * win)))) < 1e-9
        assert r["peak"] == int(np.max(np.abs(win)))


class TestJpegBaselineCodec:
    """Full baseline JPEG roundtrip — the r4 completion of the codec tier
    (r3 shipped header-parse only)."""

    def _gradient(self, h, w):
        import numpy as np

        yy, xx = np.mgrid[0:h, 0:w]
        return (128 + 60 * np.sin(xx / 17.0) + 50 * np.cos(yy / 11.0)).clip(
            0, 255
        ).astype(np.uint8)

    def test_grayscale_roundtrip(self):
        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            decode_jpeg,
            encode_jpeg,
            jpeg_header,
        )

        img = self._gradient(120, 200)
        enc = encode_jpeg(img)
        hdr = jpeg_header(enc)
        assert (hdr["width"], hdr["height"], hdr["n_channels"]) == (200, 120, 1)
        dec = decode_jpeg(enc)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert np.abs(dec.astype(float) - img).mean() < 3.0  # q50 error

    def test_rgb_roundtrip(self):
        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        g = self._gradient(64, 72)
        rgb = np.stack([g, np.roll(g, 7, 1), 255 - g], axis=-1)
        dec = decode_jpeg(encode_jpeg(rgb))
        assert dec.shape == rgb.shape
        assert np.abs(dec.astype(float) - rgb).mean() < 4.0

    def test_non_multiple_of_8_dims(self):
        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        img = self._gradient(13, 21)  # forces edge padding + crop
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == (13, 21)
        assert np.abs(dec.astype(float) - img).mean() < 4.0

    def test_flat_image_is_near_exact(self):
        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        img = np.full((32, 32), 137, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img))
        assert np.abs(dec.astype(float) - 137).max() <= 2

    def test_media_features_reports_real_jpeg_pixel_stats(self):
        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            encode_jpeg,
            media_features,
        )

        img = self._gradient(48, 64)
        feats = media_features(encode_jpeg(img))
        w, h, ch, mean, std, mn, mx, npx = feats
        assert (w, h, ch, npx) == (64.0, 48.0, 1.0, 64.0 * 48.0)
        assert abs(mean - img.mean()) < 3.0
        assert std > 10.0  # real statistics, not the old zero slots

    def test_mislabeled_progressive_raises_precisely(self):
        """r5: progressive DECODES now, so a baseline stream whose SOF
        marker is rewritten to SOF2 must fail the scan-script
        validation (DC scan with Se=63), never mis-decode."""
        import pytest

        from trading_dashboard_spark.multimodal.codecs import (
            decode_jpeg,
            encode_jpeg,
        )

        enc = bytearray(encode_jpeg(self._gradient(16, 16)))
        sof = enc.find(b"\xff\xc0")
        enc[sof + 1] = 0xC2  # rewrite frame marker to progressive
        with pytest.raises(ValueError, match="scan script"):
            decode_jpeg(bytes(enc))

    def test_progressive_decodes_bit_identical_to_baseline(self):
        """Progressive is a REORDERING of the same quantized
        coefficients: decode(progressive(img)) == decode(baseline(img))
        exactly, across subsampling, successive-approximation depths,
        odd dimensions, and noisy content (ZRL/EOB/refinement paths)."""
        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            decode_jpeg, encode_jpeg, encode_jpeg_progressive, jpeg_header,
        )

        rng = np.random.default_rng(9)
        for h, w in [(16, 16), (33, 47)]:
            noisy = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            for ss in [(1, 1), (2, 2), (2, 1)]:
                for al in (0, 1, 2):
                    base = decode_jpeg(encode_jpeg(noisy, subsample=ss))
                    prog = decode_jpeg(
                        encode_jpeg_progressive(noisy, subsample=ss, al=al)
                    )
                    assert (base == prog).all(), (h, w, ss, al)
        gray = rng.integers(0, 255, (17, 25)).astype(np.uint8)
        assert (
            decode_jpeg(encode_jpeg(gray))
            == decode_jpeg(encode_jpeg_progressive(gray, al=2))
        ).all()
        hdr = jpeg_header(encode_jpeg_progressive(gray))
        assert hdr["progressive"] is True


class TestJpegSubsampling:
    def test_subsampled_roundtrip_all_factors(self):
        """r5: 4:2:0 / 4:2:2 / 4:4:0 encode+decode — MCU interleave
        order, odd-dimension cropping, and box down/up-sampling must
        round-trip smooth content to quantization-level error."""
        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            decode_jpeg, encode_jpeg, jpeg_header,
        )

        yy, xx = np.mgrid[0:33, 0:47]
        img = np.stack(
            [
                (128 + 80 * np.sin(xx / 17) * np.cos(yy / 23)),
                (128 + 60 * np.cos(xx / 29)),
                (128 + 50 * np.sin(yy / 31)),
            ],
            axis=-1,
        ).astype(np.uint8)
        for ss in [(2, 2), (2, 1), (1, 2)]:
            enc = encode_jpeg(img, subsample=ss)
            hdr = jpeg_header(enc)
            assert (hdr["width"], hdr["height"]) == (47, 33)
            dec = decode_jpeg(enc)
            assert dec.shape == img.shape
            err = np.abs(dec.astype(float) - img.astype(float)).mean()
            assert err < 6.0, (ss, err)

    def test_constant_chroma_is_lossless_under_subsampling(self):
        """Box-downsampling a CONSTANT chroma plane loses nothing, so a
        solid-color image must decode identically under 4:4:4 and
        4:2:0 (quantization hits the same flat blocks either way)."""
        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            decode_jpeg, encode_jpeg,
        )

        img = np.full((24, 40, 3), (90, 160, 210), dtype=np.uint8)
        a = decode_jpeg(encode_jpeg(img, subsample=(1, 1)))
        b = decode_jpeg(encode_jpeg(img, subsample=(2, 2)))
        assert (a == b).all()

    def test_non_interleaved_baseline_decodes(self):
        """r5: baseline files whose components ship in separate ns=1
        scans decode bit-identically to the interleaved encoding of the
        same coefficients, across subsampling modes."""
        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            decode_jpeg, encode_jpeg, encode_jpeg_noninterleaved,
        )

        rng = np.random.default_rng(12)
        for h, w in [(16, 16), (33, 47)]:
            img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            for ss in [(1, 1), (2, 2), (2, 1)]:
                a = decode_jpeg(encode_jpeg(img, subsample=ss))
                b = decode_jpeg(encode_jpeg_noninterleaved(img, subsample=ss))
                assert (a == b).all(), (h, w, ss)

    def test_missing_component_scan_raises(self):
        """A stream whose scans never cover some component (truncated /
        malformed multi-scan) raises a NAMED error instead of emitting
        zeroed chroma planes — never a wrong pixel."""
        import numpy as np
        import pytest

        from trading_dashboard_spark.multimodal.codecs import (
            decode_jpeg, encode_jpeg,
        )

        img = np.full((8, 8, 3), 100, dtype=np.uint8)
        enc = bytearray(encode_jpeg(img))
        i = enc.find(b"\xff\xda")
        assert i > 0
        # rewrite Ns=3 -> 1 and shrink the SOS header accordingly: only
        # component 1 ever gets scan data
        length = int.from_bytes(enc[i + 2 : i + 4], "big")
        body = enc[i + 4 : i + 2 + length]
        new_body = bytes([1]) + bytes(body[1:3]) + bytes(body[7:])
        enc[i + 2 : i + 2 + length] = (
            (len(new_body) + 2).to_bytes(2, "big") + new_body
        )
        with pytest.raises(ValueError, match="no scan for component"):
            decode_jpeg(bytes(enc))


def test_jpeg_codec_property_fuzz():
    """Property (hypothesis): for ANY uint8 image, subsampling mode,
    and successive-approximation depth, the progressive encoding
    decodes bit-identically to the baseline encoding (they carry the
    same quantized coefficients), and shapes round-trip."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from trading_dashboard_spark.multimodal.codecs import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        gray=st.booleans(),
        ss=st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
        al=st.integers(0, 2),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, gray, ss, al, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        img = rng.integers(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsample=ss))
        prog = decode_jpeg(encode_jpeg_progressive(img, subsample=ss, al=al))
        assert base.shape == img.shape
        assert (base == prog).all()

    check()


class TestPngExtendedDecode:
    """r5: Adam7 interlacing, PLTE-indexed color at depths 1/2/4/8, and
    sub-byte grayscale — fixtures hand-built at the zlib level so the
    decoder is checked against the spec, not against our own writer."""

    @staticmethod
    def _chunk(ctype, data):
        import struct
        import zlib

        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    @staticmethod
    def _pack_rows(values, depth):
        import numpy as np

        stream = b""
        for row in values:
            bits = np.unpackbits(row[:, None].astype(np.uint8), axis=1)[
                :, 8 - depth:
            ].ravel()
            pad = (-len(bits)) % 8
            bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
            stream += b"\x00" + np.packbits(bits).tobytes()
        return stream

    def test_adam7_interlaced(self):
        import struct
        import zlib

        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            PNG_SIGNATURE, decode_png,
        )

        adam7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        rng = np.random.default_rng(2)
        for h, w in [(13, 11), (1, 1), (2, 3), (16, 17)]:
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            stream = b""
            for x0, y0, dx, dy in adam7:
                sub = img[y0::dy, x0::dx]
                if sub.size == 0:
                    continue  # empty passes carry no scanlines
                for row in sub:
                    stream += b"\x00" + row.tobytes()
            payload = (
                PNG_SIGNATURE
                + self._chunk(b"IHDR",
                              struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
                + self._chunk(b"IDAT", zlib.compress(stream))
                + self._chunk(b"IEND", b"")
            )
            assert np.array_equal(decode_png(payload), img), (h, w)

    def test_palette_all_depths(self):
        import struct
        import zlib

        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            PNG_SIGNATURE, decode_png,
        )

        rng = np.random.default_rng(4)
        for depth in (1, 2, 4, 8):
            npal = 1 << depth
            pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
            idx = rng.integers(0, npal, (5, 9)).astype(np.uint8)
            payload = (
                PNG_SIGNATURE
                + self._chunk(b"IHDR",
                              struct.pack(">IIBBBBB", 9, 5, depth, 3, 0, 0, 0))
                + self._chunk(b"PLTE", pal.tobytes())
                + self._chunk(b"IDAT",
                              zlib.compress(self._pack_rows(idx, depth)))
                + self._chunk(b"IEND", b"")
            )
            assert np.array_equal(decode_png(payload), pal[idx]), depth

    def test_grayscale_sub_byte_scaling(self):
        import struct
        import zlib

        import numpy as np

        from trading_dashboard_spark.multimodal.codecs import (
            PNG_SIGNATURE, decode_png,
        )

        rng = np.random.default_rng(6)
        gv = rng.integers(0, 16, (4, 6)).astype(np.uint8)
        payload = (
            PNG_SIGNATURE
            + self._chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 4, 0, 0, 0, 0))
            + self._chunk(b"IDAT", zlib.compress(self._pack_rows(gv, 4)))
            + self._chunk(b"IEND", b"")
        )
        got = decode_png(payload)
        # left-bit replication == v * 255 / 15 exactly at these depths
        assert np.array_equal(got[:, :, 0],
                              (gv.astype(int) * 255 // 15).astype(np.uint8))

    def test_remaining_raises_are_named(self):
        import struct
        import zlib

        import numpy as np
        import pytest

        from trading_dashboard_spark.multimodal.codecs import (
            PNG_SIGNATURE, decode_png,
        )

        # 16-bit still raises precisely
        payload = (
            PNG_SIGNATURE
            + self._chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
            + self._chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + self._chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError, match="bit depth 16"):
            decode_png(payload)
        # paletted transparency raises precisely
        pal = np.zeros((2, 3), np.uint8)
        payload = (
            PNG_SIGNATURE
            + self._chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 1, 3, 0, 0, 0))
            + self._chunk(b"PLTE", pal.tobytes())
            + self._chunk(b"tRNS", b"\x00")
            + self._chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + self._chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError, match="tRNS"):
            decode_png(payload)


def test_media_phash_dedup_finds_congruent_classes(spark, tmp_path):
    """doc_ids congruent mod lcm(48, 31, 17) = 25 296 generate
    byte-identical JPEGs and must surface as one verified duplicate
    class through decode -> dHash -> Hamming blocking -> md5 verify; an
    id sharing (w, h) and one phase but not the other (816 = 48*17,
    816 % 31 = 10) must be EXCLUDED by the exact verify even if its
    dHash lands within the Hamming radius."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = [0, 25296, 50592, 816, 6, 9]
    pdf = pd.DataFrame(
        {
            "doc_id": ids,
            "text": [f"doc {i}" for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": [10] * len(ids),
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf),
                   str(tmp_path / "documents.parquet"))

    from trading_dashboard_spark.queries_multimodal import media_phash_dedup

    got = {(r["width"], r["height"]): r.asDict() for r in
           media_phash_dedup(spark, str(tmp_path)).collect()}
    # ids 0/25296/50592/816 are all (w=8, h=8); 816 is its own class
    cell = got[(8, 8)]
    assert cell["n_images"] == 4
    assert cell["n_dup_pairs"] == 3      # C(3,2) verified via blocking
    assert cell["n_dup_classes"] == 1
    assert cell["max_class_size"] == 3
    assert got[(14, 14)]["n_dup_pairs"] == 0   # id 6, singleton
    assert got[(17, 17)]["n_images"] == 1      # id 9


def test_media_phash_near_pairs_match_direct_computation(spark, tmp_path):
    """include_near=True counts representative pairs at Hamming <= 3
    with DIFFERENT payloads; the expected count is computed here by
    running the same codec + dHash directly on each planted class
    representative."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trading_dashboard_spark.multimodal.codecs import (
        decode_jpeg,
        encode_jpeg,
    )
    from trading_dashboard_spark.queries_multimodal import (
        _dhash64,
        _gradient_image,
        media_phash_dedup,
    )

    # (8,8): class {0,25296} + {816}; {6, 2022} are distinct-payload
    # 14x14 images whose FIXED dHashes (the r10 wraparound grid for
    # width 8 changed width-8 hashes, retiring the old planted pair)
    # sit at Hamming 1 -- the near path's planted positive
    ids = [0, 25296, 816, 6, 9, 2022]
    pdf = pd.DataFrame(
        {
            "doc_id": ids,
            "text": [f"doc {i}" for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": [10] * len(ids),
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf),
                   str(tmp_path / "documents.parquet"))

    def fp(d):
        return _dhash64(decode_jpeg(encode_jpeg(_gradient_image(d))))

    # distinct-payload representatives (dHash is size-invariant by
    # design, so near pairs may cross sizes; each pair is attributed
    # to the LOWER id's (w, h) — the id_a side of the blocking join)
    reps = {d: fp(d) for d in (0, 6, 9, 816, 2022)}
    sizes = {d: (8 + d % 24, 8 + d % 16) for d in reps}
    expected = {}
    rep_ids = sorted(reps)
    for i, a in enumerate(rep_ids):
        for b in rep_ids[i + 1:]:
            (la, ha), (lb, hb) = reps[a], reps[b]
            dist = bin((la ^ lb) | ((ha ^ hb) << 32)).count("1")
            if dist <= 3:
                wh = sizes[a]
                expected[wh] = expected.get(wh, 0) + 1

    got = {(r["width"], r["height"]): r.asDict() for r in
           media_phash_dedup(spark, str(tmp_path), include_near=True)
           .collect()}
    cell = got[(8, 8)]
    assert cell["n_dup_pairs"] == 1          # the {0, 25296} class
    for wh, row in got.items():
        assert row["n_near_rep_pairs"] == expected.get(wh, 0), wh
    assert sum(expected.values()) >= 1  # the fixture must exercise it


def test_media_phash_oracle_residue_classes_are_md5_distinct():
    """The media_phash_dedup oracle equates duplicate classes with
    doc_id residue classes mod lcm(48, 31, 17) = 25 296 — sound only if
    DISTINCT residue classes always yield DISTINCT encoded payload
    BYTES (the docstring argues this in pixel space; two phase classes
    quantizing to identical JPEG coefficients would merge engine
    classes and fail the gate as a false alarm — ADVICE r9). This pins
    the claim exhaustively: every residue class the registered query
    can realize (doc_id % 3 == 0 → 8 432 classes) is encoded once and
    all payload md5s must be pairwise distinct."""
    import hashlib

    from trading_dashboard_spark.multimodal.codecs import encode_jpeg
    from trading_dashboard_spark.queries_multimodal import _gradient_image

    seen: dict[str, int] = {}
    for d in range(0, 25296, 3):
        h = hashlib.md5(encode_jpeg(_gradient_image(d))).hexdigest()
        assert h not in seen, (
            f"residue classes {seen[h]} and {d} encode byte-identically"
        )
        seen[h] = d
    assert len(seen) == 8432


def test_dhash64_width8_bits_all_carry_signal():
    """Width-8 images previously compared two pixels with themselves
    per row (the degenerate (j*(w-1))//8 grid — ADVICE r9); the
    wraparound grid must make every bit position attainable. A planted
    8-wide image with a strictly descending row makes bits 0..6 fire
    via adjacent comparisons and bit 7 via the col-7 > col-0 wrap being
    FALSE (descending), so instead plant the wrap case explicitly."""
    import numpy as np

    from trading_dashboard_spark.queries_multimodal import _dhash64

    # descending rows: cols 0..7 = 200,190,...,130 — every adjacent
    # comparison (bits j=0..6) fires; wrap bit (7 vs 0) is 130 > 200 = 0
    img = np.tile(np.arange(200, 120, -10, dtype=np.uint8), (8, 1))
    lo, hi = _dhash64(img)
    word = (hi << 32) | lo
    for row in range(8):
        assert (word >> (row * 8)) & 0x7F == 0x7F  # bits 0..6 set
        assert (word >> (row * 8 + 7)) & 1 == 0    # wrap bit clear
    # ascending rows flip it: adjacent bits clear, wrap bit set
    img2 = np.tile(np.arange(120, 200, 10, dtype=np.uint8), (8, 1))
    lo2, hi2 = _dhash64(img2)
    word2 = (hi2 << 32) | lo2
    for row in range(8):
        assert (word2 >> (row * 8)) & 0x7F == 0
        assert (word2 >> (row * 8 + 7)) & 1 == 1
