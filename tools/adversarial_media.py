#!/usr/bin/env python
"""Adversarial codec sweep for the multimodal tier (r10 verdict #4b).

The real-pixel PNG/JPEG/WAV codecs promise "a NAMED error, never a
wrong pixel" (`multimodal/codecs.py`) — but the promise had only been
probed at the specific malformations the unit tests plant. This sweep
drives the guard surface exhaustively:

- **degenerate geometry**: 1×1, 1×8, 8×1, 8×8, 16×16, 1×64, 64×1
  images × all-black / all-white / mid-gray / gradient fills,
  grayscale AND RGB — PNG roundtrip must be bit-exact, JPEG roundtrip
  within the codec's documented tolerance, WAV (length-analogue)
  sample-exact;
- **truncated streams**: every valid payload cut at EVERY byte
  boundary — decode must raise ValueError or NotImplementedError
  (the named-guard contract); any other exception class (IndexError,
  struct.error, ZeroDivisionError, KeyError…) is an unguarded crash
  path, and any SUCCESSFUL decode of a truncated stream must still
  produce the correct prefix semantics (for WAV) or is a silent-
  corruption finding (for PNG/JPEG);
- **bit-flip corruption**: single-byte flips at a seeded sample of
  offsets — same contract as truncation (named error or byte-exact
  detection via checksums; PNG has CRCs per chunk, JPEG has marker
  sync, WAV has declared sizes).

Usage: python tools/adversarial_media.py [--stride N]
Prints one line per finding and a summary. Pure Python/numpy — no
Spark session needed; the Spark-side media lanes are swept separately
by tools/adversarial_curation.py (media queries read documents).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trading_dashboard_spark.multimodal.codecs import (  # noqa: E402
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_jpeg,
    encode_png,
    encode_wav,
)

OK_ERRORS = (ValueError, NotImplementedError)

SHAPES = [(1, 1), (1, 8), (8, 1), (8, 8), (16, 16), (1, 64), (64, 1)]


def _fills(h: int, w: int, channels: int | None):
    shape = (h, w) if channels is None else (h, w, channels)
    yield "black", np.zeros(shape, np.uint8)
    yield "white", np.full(shape, 255, np.uint8)
    yield "gray", np.full(shape, 128, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    g = (128 + 60 * np.sin(xx / 17.0) + 50 * np.cos(yy / 11.0)).clip(
        0, 255
    ).astype(np.uint8)
    if channels:
        g = np.stack([g] * channels, axis=-1)
    yield "gradient", g


def sweep(stride: int = 1) -> tuple[int, list[str]]:
    findings: list[str] = []
    checks = 0

    def check(cond, msg):
        nonlocal checks
        checks += 1
        if not cond:
            findings.append(msg)
            print("FINDING " + msg, flush=True)

    payloads: list[tuple[str, bytes]] = []

    # ---- geometry × fill roundtrips --------------------------------
    for h, w in SHAPES:
        for ch in (None, 3):
            for fill, px in _fills(h, w, ch):
                tag = f"{h}x{w}/{'gray' if ch is None else 'rgb'}/{fill}"
                try:
                    png = encode_png(px)
                    back = decode_png(png)  # documented (h, w, ch)
                    want = px if px.ndim == 3 else px[:, :, None]
                    check(
                        back.shape == want.shape
                        and np.array_equal(back, want),
                        f"png-roundtrip-not-exact {tag}",
                    )
                    payloads.append((f"png/{tag}", png))
                except OK_ERRORS as e:
                    check(False, f"png-encode-refused {tag}: {e}")
                except Exception as e:  # noqa: BLE001
                    check(False,
                          f"png-crash {tag}: {type(e).__name__}: {e}")
                try:
                    jpg = encode_jpeg(px)
                    back = decode_jpeg(jpg)
                    # decode preserves the input shape (2D gray / 3D
                    # rgb) and the q50 contract is MEAN error < 4
                    # (tests/test_multimodal.py roundtrips)
                    check(back.shape == px.shape,
                          f"jpeg-shape {tag}: {back.shape} != {px.shape}")
                    err = float(
                        np.abs(back.astype(float) - px.astype(float)).mean()
                    )
                    check(err < 4.0,
                          f"jpeg-error-beyond-tolerance {tag}: {err:.2f}")
                    payloads.append((f"jpeg/{tag}", jpg))
                except OK_ERRORS as e:
                    check(False, f"jpeg-encode-refused {tag}: {e}")
                except Exception as e:  # noqa: BLE001
                    check(False,
                          f"jpeg-crash {tag}: {type(e).__name__}: {e}")

    # WAV: degenerate sample counts (the length analogue of 1×1)
    for n in (1, 2, 8, 64):
        for fill, mk in (
            ("zeros", lambda k: np.zeros(k, np.int16)),
            ("max", lambda k: np.full(k, 32767, np.int16)),
            ("min", lambda k: np.full(k, -32768, np.int16)),
            ("ramp", lambda k: (np.arange(k) * 1031 % 65536 - 32768)
             .astype(np.int16)),
        ):
            tag = f"wav/{n}/{fill}"
            try:
                samples = mk(n)
                wav = encode_wav(samples)
                back, rate = decode_wav(wav)  # documented (frames, ch)
                check(np.array_equal(back.reshape(-1), samples),
                      f"wav-roundtrip-not-exact {tag}")
                payloads.append((tag, wav))
            except Exception as e:  # noqa: BLE001
                check(False, f"wav-crash {tag}: {type(e).__name__}: {e}")

    # ---- truncation sweep ------------------------------------------
    decoders = {"png": decode_png, "jpeg": decode_jpeg,
                "wav": lambda p: decode_wav(p)[0]}
    for tag, payload in payloads:
        kind = tag.split("/", 1)[0]
        dec = decoders[kind]
        for cut in range(0, len(payload), stride):
            t = payload[:cut]
            try:
                dec(t)
                # a successful decode of a strict prefix is silent
                # corruption for framed formats (PNG IEND, JPEG EOI,
                # WAV declared sizes all make prefixes detectable)
                check(False, f"truncation-decoded-silently {tag}@{cut}")
            except OK_ERRORS:
                pass  # the contract
            except Exception as e:  # noqa: BLE001
                check(False,
                      f"truncation-crash {tag}@{cut}: "
                      f"{type(e).__name__}: {e}")

    # ---- single-byte corruption (seeded sample) --------------------
    rng = np.random.default_rng(777)
    for tag, payload in payloads:
        kind = tag.split("/", 1)[0]
        dec = decoders[kind]
        n = len(payload)
        for off in sorted(set(rng.integers(0, n, size=min(24, n)).tolist())):
            b = bytearray(payload)
            b[off] ^= 0x5A
            try:
                dec(bytes(b))
                # a flipped byte MAY decode (pixel-data bits are not
                # integrity-checked in JPEG; PNG CRCs are) — only PNG
                # treats this as a finding
                if kind == "png":
                    check(False, f"png-crc-miss {tag}@{off}")
            except OK_ERRORS:
                pass
            except Exception as e:  # noqa: BLE001
                check(False,
                      f"corruption-crash {tag}@{off}: "
                      f"{type(e).__name__}: {e}")

    return checks, findings


def main() -> None:
    stride = 1
    if "--stride" in sys.argv:
        stride = int(sys.argv[sys.argv.index("--stride") + 1])
    checks, findings = sweep(stride)
    print(f"\n{checks} checks, {len(findings)} findings")
    for f in findings:
        print("FINDING", f)


if __name__ == "__main__":
    main()
