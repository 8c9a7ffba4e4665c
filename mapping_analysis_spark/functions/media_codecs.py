"""Pure stdlib+numpy media codecs: real PNG and WAV decode without any
external media library.

The multimodal operators (``operators/multimodal.py``) ship payloads as
opaque binary columns through Arrow-batched kernels; this module supplies
the *decode* half for the two formats whose containers are fully specified
by the Python standard library plus numpy:

* **PNG** — chunk parse + ``zlib`` inflate + per-row unfiltering
  (None/Sub/Up/Average/Paeth per the PNG spec §9); 8-bit depth, color
  types 0/2/3/4/6, non-interlaced. The Sub filter is vectorized as a
  per-byte-lane cumulative sum; Average/Paeth walk pixels within a row
  (rows themselves stream).
* **WAV** — stdlib ``wave`` container parse + ``np.frombuffer`` PCM
  (8/16/32-bit) → float32 samples in [-1, 1].

Formats that require an entropy-coding library we do not have (JPEG, MP3,
H.264) remain behind the deterministic fallback in
``operators/multimodal.py`` — that boundary is now codec-accurate, not a
blanket stub.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/pixel


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Palette images (color type 3) are expanded to RGB. Supports bit depth
    8, interlace 0 — the shapes every lossless training-data pipeline
    actually writes; anything else raises ``ValueError`` so the caller's
    fallback path stays explicit.
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    # truncated/corrupt payloads surface struct.error, zlib.error, or shape
    # errors below — normalize ALL of them to the documented ValueError so
    # callers' fallback paths need exactly one except clause
    try:
        pos, idat, plte = 8, [], None
        w = h = depth = ctype = interlace = None
        saw_iend = False
        while pos < len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctag = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) < length or pos + 12 + length > len(payload):
                raise ValueError("PNG truncated mid-chunk")
            pos += 12 + length  # len + tag + data + crc
            if ctag == b"IHDR":
                w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
            elif ctag == b"PLTE":
                plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            elif ctag == b"IDAT":
                idat.append(data)
            elif ctag == b"IEND":
                saw_iend = True
                break
        if not saw_iend:
            raise ValueError("PNG truncated: stream ended without IEND")
        if w is None:
            raise ValueError("PNG missing IHDR")
        if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
            raise ValueError(
                f"unsupported PNG shape: depth={depth} ctype={ctype} interlace={interlace}"
            )
        ch = _CHANNELS[ctype]
        raw = zlib.decompress(b"".join(idat))
        stride = w * ch
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"malformed PNG: {exc}") from exc
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype, line = int(rows[y, 0]), rows[y, 1:].copy()
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: per-byte-lane cumulative sum mod 256
            lanes = line.reshape(w, ch).astype(np.uint64)
            rec = np.cumsum(lanes, axis=0).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            rec = line + prev
        elif ftype == 3:  # Average
            rec = line
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    img = out.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w[, ch]) array → PNG bytes (filter 0, one IDAT).

    The test-fixture encoder: deterministic, spec-conformant, round-trips
    bit-exactly through :func:`decode_png` (and any external viewer).
    """
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 samples shaped (n_frames, channels) in [-1, 1],
    sample_rate). PCM 8/16/32-bit via stdlib ``wave`` + one frombuffer."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        nch, sw, rate, nframes = (
            f.getnchannels(),
            f.getsampwidth(),
            f.getframerate(),
            f.getnframes(),
        )
        raw = f.readframes(nframes)
    if sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return x.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float32 (n[, ch]) in [-1, 1] → 16-bit PCM WAV bytes (test fixtures)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def _resize_axis0(a: np.ndarray, out_n: int) -> np.ndarray:
    """Area-style resize along axis 0: bin-average when shrinking, pixel
    replication (the area mapping's degenerate case) when growing."""
    n = a.shape[0]
    if out_n >= n:
        return a[(np.arange(out_n) * n) // out_n]
    bins = (np.arange(n) * out_n) // n
    acc = np.zeros((out_n,) + a.shape[1:], dtype=np.float64)
    np.add.at(acc, bins, a)
    cnt = np.bincount(bins, minlength=out_n).astype(np.float64)
    return acc / cnt.reshape((out_n,) + (1,) * (a.ndim - 1))


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-style resize to (out_h, out_w, ch), uint8 — each
    axis independently bin-averages when shrinking and replicates when
    growing, so ANY input size maps to ANY output size (a 1×1 payload
    thumbnailed to 4×4 must not read unmapped cells — found by the
    hypothesis round-trip property)."""
    if img.ndim == 2:
        img = img[:, :, None]
    a = _resize_axis0(img.astype(np.float64), out_h)
    a = np.swapaxes(_resize_axis0(np.swapaxes(a, 0, 1), out_w), 0, 1)
    return np.clip(np.round(a), 0, 255).astype(np.uint8)


def image_features(img: np.ndarray, thumb: int = 4) -> np.ndarray:
    """Fixed-dim float32 feature: [h, w, ch, mean, std] + a ``thumb``²
    block-averaged grayscale thumbnail (the 'resize' op, flattened)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    gray = img.astype(np.float32).mean(axis=2)
    tn = resize_image(gray.astype(np.uint8), thumb, thumb)[:, :, 0]
    head = np.array(
        [h, w, ch, float(img.mean()), float(img.std())], dtype=np.float32
    )
    return np.concatenate([head, (tn.astype(np.float32) / 255.0).ravel()])


def audio_features(samples: np.ndarray, rate: int, n_bands: int = 8) -> np.ndarray:
    """Fixed-dim float32 feature: [duration_s, rms, zero-crossing rate,
    spectral centroid (normalized to Nyquist)] + ``n_bands`` log-spaced
    FFT band energies (L1-normalized). Pure numpy (rfft)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        # spec-valid 0-frame WAV: the fixed-dim contract must hold (rfft of
        # 0 points raises) — all-zero features, not a fallback-length vector
        return np.zeros(4 + n_bands, dtype=np.float32)
    dur = n / float(rate)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, 1.0 / rate)
    tot = float(spec.sum())
    centroid = float((freqs * spec).sum() / tot / (rate / 2.0)) if tot > 0 else 0.0
    edges = np.unique(
        np.geomspace(1, len(spec) - 1, n_bands + 1).astype(int)
    ) if len(spec) > 1 else np.array([0, 1])
    bands = np.add.reduceat(spec, edges[:-1])[:n_bands]
    bands = np.pad(bands, (0, n_bands - len(bands)))
    bsum = float(bands.sum())
    bands = bands / bsum if bsum > 0 else bands
    return np.concatenate(
        [np.array([dur, rms, zcr, centroid], dtype=np.float32), bands.astype(np.float32)]
    )
