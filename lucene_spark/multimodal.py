"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: binary column + metadata struct,
processed by Arrow-batched ``mapInPandas`` so each task streams record
batches (bounded memory) instead of materializing whole partitions.

REAL decoders (pure numpy/struct + stdlib zlib, no codec library needed):
  - HTML → text extraction (the input_hint's html column, byte-exact),
  - BMP (uncompressed 24-bit) → HxWx3 uint8 array (:func:`decode_bmp`),
  - PNG (RFC 2083: 8/16-bit gray/RGB/palette/gray+alpha/RGBA,
    non-interlaced and Adam7-interlaced, all five scanline filters, zlib
    inflate) → HxWx3 uint8 RGB (:func:`decode_png`, with
    :func:`encode_png` producing real fixtures for every path; sub-byte
    1/2/4-bit depths a documented NotImplementedError subset),
  - baseline JPEG (ITU-T T.81 sequential DCT: Huffman entropy decode,
    dequant + float IDCT, 4:2:0/4:4:4, restart markers, JFIF color;
    :mod:`lucene_spark.jpeg`, with an Annex-K encoder for fixtures;
    progressive/arithmetic/12-bit a documented NotImplementedError
    subset),
  - GIF87a/89a (GIF-variant LZW both directions, interlace, local/global
    palettes, transparency — :mod:`lucene_spark.gif`),
  - WAV (RIFF: linear PCM 8/16-bit, G.711 A-law/µ-law companding, mono
    IMA/DVI and Microsoft ADPCM) → samples + rate (:func:`decode_wav`)
    with :func:`audio_features` (duration/RMS/peak/zero-crossings),
  - video: the RAWV raw container AND MJPEG AVI (RIFF walk + per-frame
    T.81 JPEG decode, :func:`decode_mjpeg_avi` / :func:`encode_mjpeg_avi`).
STUBBED: inter-frame video codecs (mp4/h264/vp9) raise
``NotImplementedError`` — out of reasonable from-scratch scope; the
dispatch, schema, batch shape, and partitioning around them are real and
tested, and unknown payloads fall back to a deterministic fake so
plumbing tests stay runnable.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_TAG_RE = re.compile(rb"<[^>]+>")


def extract_text_from_html(html: bytes) -> str:
    """Strip tags; byte-identical inverse of the FIXTURES.md html wrapper."""
    return _TAG_RE.sub(b"", html or b"").decode("utf-8", errors="replace")


def html_to_text(pages: DataFrame, html_col: str = "html", out_col: str = "extracted_text") -> DataFrame:
    """mapInPandas HTML→text: streams Arrow batches, appends one string col."""
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in pages.schema.fields)
    schema = f"{fields}, {out_col} string"

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [extract_text_from_html(h) for h in pdf[html_col]]
            yield pdf

    return pages.mapInPandas(run, schema=schema)


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → uncompressed 24-bit BMP bytes (BITMAPINFOHEADER,
    bottom-up, 4-byte row padding) — pure struct packing, used to produce
    real test fixtures without any codec library."""
    import struct

    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = img[y, :, ::-1].tobytes()
        body += bgr + b"\x00" * pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + dib + body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL image decode for uncompressed 24-bit BMP (the one raster format
    parseable with numpy alone): returns HxWx3 uint8 RGB.  Handles
    bottom-up and top-down row order and 4-byte row padding."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    topdown = h < 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=pixel_off)
    rows = data.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if not topdown:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"


def _png_filter_rows(rows: np.ndarray, filter_type: int,
                     bpp: int) -> bytearray:
    """Filter a (h, stride) byte sub-image with one PNG filter per row."""
    raw = bytearray()
    h, stride = rows.shape
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = rows[y]
        if filter_type == 0:
            filt = line
        else:
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            up = prev
            upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            if filter_type == 1:
                filt = line - left
            elif filter_type == 2:
                filt = line - up
            elif filter_type == 3:
                filt = line - ((left.astype(np.int16) + up) // 2).astype(np.uint8)
            else:  # Paeth
                filt = line - _paeth_predictor(left, up, upleft)
        raw.append(filter_type)
        raw += filt.astype(np.uint8).tobytes()
        prev = line
    return raw


def encode_png(img: np.ndarray, filter_type: int = 0,
               interlaced: bool = False, bit_depth: int = 8) -> bytes:
    """HxW (gray) or HxWx3 (RGB) or HxWx4 (RGBA) → PNG bytes (RFC 2083:
    IHDR + one zlib IDAT + IEND, CRC32 per chunk).  ``filter_type``
    applies that PNG filter (0..4) to every scanline; ``interlaced``
    writes the Adam7 pass layout; ``bit_depth=16`` takes uint16 samples
    (big-endian on the wire).  Non-default options exist to produce
    fixtures exercising each decode path."""
    import struct
    import zlib

    if bit_depth == 16:
        img = np.asarray(img, dtype=np.uint16)
    else:
        img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bps = bit_depth // 8
    bpp = ch * bps
    if bps == 2:
        rows_bytes = img.astype(">u2").view(np.uint8).reshape(h, w * bpp)
    else:
        rows_bytes = img.reshape(h, w * bpp)

    raw = bytearray()
    if not interlaced:
        raw += _png_filter_rows(rows_bytes, filter_type, bpp)
    else:
        full = rows_bytes.reshape(h, w, bpp)
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sub = full[y0::dy, x0::dx].reshape(hp, wp * bpp)
            raw += _png_filter_rows(np.ascontiguousarray(sub),
                                    filter_type, bpp)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0,
                       1 if interlaced else 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _paeth_predictor(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over a scanline's byte lanes
    (RFC 2083 §6.6): pick whichever of left/up/up-left is closest to
    a + b - c, ties preferring left, then up."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


# Adam7 pass grid: (x0, y0, dx, dy) per pass (RFC 2083 §2.6)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(raw: bytes, pos: int, h: int, stride: int,
                  bpp: int) -> tuple[np.ndarray, int]:
    """Unfilter ``h`` scanlines of ``stride`` bytes starting at raw[pos]
    (filter distance ``bpp`` bytes/pixel); returns ((h, stride) uint8,
    next offset)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=pos + 1).copy()
        pos += 1 + stride
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: per-byte-lane running sum mod 256
            rec = line.reshape(-1, bpp).cumsum(axis=0, dtype=np.uint64)
            rec = (rec % 256).astype(np.uint8).reshape(-1)
        elif ft == 2:  # Up
            rec = line + prev
        elif ft in (3, 4):  # Average / Paeth: sequential pixel walk
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(0, stride, bpp):
                left = rec[x - bpp : x] if x >= bpp else np.zeros(bpp, np.uint8)
                up = prev[x : x + bpp]
                if ft == 3:
                    pred = ((left.astype(np.int16) + up) // 2).astype(np.uint8)
                else:
                    upleft = (prev[x - bpp : x] if x >= bpp
                              else np.zeros(bpp, np.uint8))
                    pred = _paeth_predictor(left, up, upleft)
                rec[x : x + bpp] = line[x : x + bpp] + pred
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
        out[y] = rec
        prev = rec
    return out, pos


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode (RFC 2083, stdlib zlib + numpy — no codec library):
    8- and 16-bit depth, non-interlaced AND Adam7-interlaced, grayscale /
    RGB / palette / gray+alpha / RGBA, all five scanline filters
    (None/Sub/Up/Average/Paeth; Sub is a per-byte-lane cumsum mod 256, Up
    a vectorized add, Average/Paeth a sequential pixel walk with the
    vectorized Paeth predictor per step).  Returns HxWx3 uint8 RGB (alpha
    dropped, gray replicated, palette expanded via PLTE, 16-bit scaled to
    8).  Sub-byte depths (1/2/4-bit palette) raise NotImplementedError
    (documented subset)."""
    import struct
    import zlib

    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth not in (8, 16) or comp != 0 or filt_method != 0 or interlace > 1:
        raise NotImplementedError(
            f"PNG subset: 8/16-bit only (depth={depth}, "
            f"interlace={interlace})")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bps = depth // 8
    bpp = ch * bps
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        rows, end = _png_unfilter(raw, 0, h, w * bpp, bpp)
        if end != len(raw):
            raise ValueError("PNG IDAT length mismatch")
        samples = rows.reshape(h, w * ch * bps)
    else:  # Adam7: seven independently-filtered sub-images, scattered
        samples = np.zeros((h, w * ch * bps), dtype=np.uint8)
        full = samples.reshape(h, w, bpp)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sub, off = _png_unfilter(raw, off, hp, wp * bpp, bpp)
            full[y0::dy, x0::dx] = sub.reshape(hp, wp, bpp)
        if off != len(raw):
            raise ValueError("PNG IDAT length mismatch")
    if bps == 2:
        px = (samples.reshape(h, w, ch, 2)[:, :, :, 0]).copy()  # hi byte
    else:
        px = samples.reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[px[:, :, 0]]
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()


def decode_image(payload: bytes) -> np.ndarray | None:
    """Dispatching image decode: BMP, PNG and baseline JPEG are decoded for
    real (pure numpy/struct + stdlib zlib — :mod:`lucene_spark.jpeg` for
    the Huffman/DCT path); progressive JPEG and video codecs raise
    NotImplementedError; unknown payloads fall back to a deterministic 8x8
    fake so the Spark plumbing stays testable."""
    if payload is None:
        raise NotImplementedError("image decode of None payload")
    if len(payload) == 0:
        return None  # undecodable payload — callers skip the row
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload.startswith(_PNG_MAGIC):
        return decode_png(payload)
    if payload.startswith(_JPEG_MAGIC) or payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)
    arr = np.frombuffer((payload * ((64 // len(payload)) + 1))[:64], dtype=np.uint8)
    return arr.reshape(8, 8)


def decode_image_stub(payload: bytes) -> np.ndarray:
    """Backwards-compatible alias of :func:`decode_image`."""
    return decode_image(payload)


def image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Binary → fixed-size feature vector via :func:`decode_image`
    (real BMP/PNG/JPEG/GIF decode; deterministic fake for unknown bytes).

    Output schema: (id, width, height, mean_intensity, feature array<double>)
    — the exact shape a real embedding/resize kernel would produce.
    """
    schema = f"{id_col} long, width int, height int, mean_intensity double, feature array<double>"

    def run(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload)) if payload is not None else None
                if img is None:
                    continue
                if img.ndim == 3:  # real RGB decode -> 8x8 grayscale thumb
                    gray = img.mean(axis=2)
                    ys = np.linspace(0, gray.shape[0] - 1, 8).astype(int)
                    xs = np.linspace(0, gray.shape[1] - 1, 8).astype(int)
                    thumb = gray[np.ix_(ys, xs)]
                    width, height = img.shape[1], img.shape[0]
                else:
                    thumb = img.astype(np.float64)
                    width, height = img.shape[1], img.shape[0]
                rows.append(
                    {
                        id_col: int(i),
                        "width": width,
                        "height": height,
                        "mean_intensity": float(thumb.mean()),
                        "feature": (thumb.astype(np.float64).ravel() / 255.0).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "mean_intensity", "feature"])

    return df.mapInPandas(run, schema=schema)


def frame_sample_stub(payload: bytes, every_n: int = 10) -> list[bytes]:
    """Video frame sampling — STUB (no video codec).  Deterministic fake:
    chops the payload into pseudo-frames so batch-shape tests are real."""
    if not payload:
        return []
    size = max(len(payload) // 16, 1)
    frames = [payload[i : i + size] for i in range(0, len(payload), size)]
    return frames[::every_n] if len(frames) >= every_n else frames[:1]


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono/stereo samples → PCM WAV bytes (pure struct packing)."""
    import struct

    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def _mulaw_decode(b: np.ndarray) -> np.ndarray:
    """ITU-T G.711 µ-law byte → linear int16 (vectorized table form)."""
    u = (~b.astype(np.int64)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant << 3) + 0x84 << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.float64)


def _alaw_decode(b: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law byte → linear int16 (vectorized)."""
    a = (b.astype(np.int64) ^ 0x55) & 0xFF
    sign = a & 0x80  # G.711 A-law: sign bit SET means positive
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, mag, -mag).astype(np.float64)


_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_adpcm_decode(data: bytes, ch: int, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM (WAVE format 0x11, mono): per-block predictor header
    + 4-bit nibbles, the standard step-size/index tables."""
    if ch != 1:
        raise NotImplementedError("IMA ADPCM decode: mono only")
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4:
            break
        pred = int.from_bytes(block[0:2], "little", signed=True)
        index = min(88, max(0, block[2]))
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = int(_IMA_STEP[index])
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                if nib & 8:
                    pred -= diff
                else:
                    pred += diff
                pred = max(-32768, min(32767, pred))
                index = min(88, max(0, index + int(_IMA_INDEX[nib & 7])))
                out.append(pred)
    return np.array(out, dtype=np.float64)


_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
             (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]


def _ms_adpcm_decode(data: bytes, ch: int, block_align: int) -> np.ndarray:
    """Microsoft ADPCM (WAVE format 2, mono): per-block 7-byte header
    (predictor, initial delta, samples 2 and 1) then signed 4-bit nibbles,
    HIGH nibble first; the standard coefficient/adaptation tables."""
    if ch != 1:
        raise NotImplementedError("MS ADPCM decode: mono only")
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 7:
            break
        pred_idx = min(block[0], 6)
        c1, c2 = _MS_COEFS[pred_idx]
        delta = int.from_bytes(block[1:3], "little", signed=True)
        s1 = int.from_bytes(block[3:5], "little", signed=True)  # newer
        s2 = int.from_bytes(block[5:7], "little", signed=True)  # older
        out.append(s2)
        out.append(s1)
        for byte in block[7:]:
            for nib in (byte >> 4, byte & 0x0F):
                signed = nib - 16 if nib >= 8 else nib
                pred = (s1 * c1 + s2 * c2) >> 8
                sample = max(-32768, min(32767, pred + signed * delta))
                s2, s1 = s1, sample
                delta = max(16, (_MS_ADAPT[nib] * delta) >> 8)
                out.append(sample)
    return np.array(out, dtype=np.float64)


def _ms_adpcm_encode(samples: np.ndarray, block_samples: int = 500) -> tuple[bytes, int]:
    """linear int16 mono → MS ADPCM blocks (predictor 0, standard tables);
    returns (data, block_align)."""
    samples = np.asarray(samples, dtype=np.int64)
    block_align = 7 + (block_samples - 2 + 1) // 2
    c1, c2 = _MS_COEFS[0]
    out = bytearray()
    i = 0
    while i < len(samples):
        chunk = samples[i : i + block_samples]
        if len(chunk) < 2:
            break
        s2, s1 = int(chunk[0]), int(chunk[1])
        delta = 16
        out.append(0)  # predictor index
        out += int(delta).to_bytes(2, "little", signed=True)
        out += int(s1).to_bytes(2, "little", signed=True)
        out += int(s2).to_bytes(2, "little", signed=True)
        nibbles = []
        for s in chunk[2:]:
            pred = (s1 * c1 + s2 * c2) >> 8
            err = int(s) - pred
            nib_signed = max(-8, min(7, round(err / delta)))
            nib = nib_signed + 16 if nib_signed < 0 else nib_signed
            sample = max(-32768, min(32767, pred + nib_signed * delta))
            s2, s1 = s1, sample
            delta = max(16, (_MS_ADAPT[nib] * delta) >> 8)
            nibbles.append(nib)
        for j in range(0, len(nibbles), 2):
            hi = nibbles[j]
            lo = nibbles[j + 1] if j + 1 < len(nibbles) else 0
            out.append((hi << 4) | lo)
        out += b"\x00" * (block_align - 7 - (len(nibbles) + 1) // 2)
        i += block_samples
    return bytes(out), block_align


def _mulaw_encode(x: np.ndarray) -> np.ndarray:
    """linear int16 → G.711 µ-law byte (vectorized inverse of
    :func:`_mulaw_decode`; bias-133 segment search)."""
    x = np.clip(x.astype(np.int64), -32635, 32635)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.abs(x) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def _alaw_encode(x: np.ndarray) -> np.ndarray:
    """linear int16 → G.711 A-law byte (the standard 13-bit segment
    search, vectorized)."""
    x = x.astype(np.int64)
    pcm = x >> 3  # 16 -> 13 bit
    mask = np.where(pcm >= 0, 0xD5, 0x55)
    pcm = np.where(pcm >= 0, pcm, -pcm - 1)
    ends = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])
    seg = np.searchsorted(ends, pcm)
    shifted = np.where(seg < 2, pcm >> 1, pcm >> np.minimum(seg, 7))
    aval = np.where(seg >= 8, 0x7F, (seg << 4) | (shifted & 0x0F))
    return (aval ^ mask).astype(np.uint8)


def _ima_adpcm_encode(samples: np.ndarray, block_samples: int = 505) -> tuple[bytes, int]:
    """linear int16 mono → IMA ADPCM blocks; returns (data, block_align)."""
    samples = np.asarray(samples, dtype=np.int64)
    block_align = 4 + (block_samples - 1 + 1) // 2
    out = bytearray()
    i = 0
    index = 0
    while i < len(samples):
        chunk = samples[i : i + block_samples]
        pred = int(chunk[0])
        out += int(pred).to_bytes(2, "little", signed=True)
        out.append(index)
        out.append(0)
        nibbles = []
        for s in chunk[1:]:
            step = int(_IMA_STEP[index])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # reconstruct like the decoder
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            pred = pred - d if nib & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            index = min(88, max(0, index + int(_IMA_INDEX[nib & 7])))
            nibbles.append(nib)
        for j in range(0, len(nibbles), 2):
            lo = nibbles[j]
            hi = nibbles[j + 1] if j + 1 < len(nibbles) else 0
            out.append(lo | (hi << 4))
        out += b"\x00" * (block_align - 4 - (len(nibbles) + 1) // 2)
        i += block_samples
    return bytes(out), block_align


def encode_wav_compressed(samples: np.ndarray, sample_rate: int = 8000,
                          codec: str = "mulaw") -> bytes:
    """int16 mono samples → RIFF/WAVE with a compressed codec: 'mulaw'
    (format 7), 'alaw' (6), 'ima' (0x11), or 'ms' (2) — real fixtures
    for the companded/ADPCM decode paths."""
    import struct

    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim != 1:
        raise ValueError("mono only")
    if codec == "mulaw":
        data, fmt_code, bits, block_align = (
            _mulaw_encode(samples).tobytes(), 7, 8, 1)
    elif codec == "ms":
        data, block_align = _ms_adpcm_encode(samples)
        fmt_code, bits = 2, 4
    elif codec == "alaw":
        data, fmt_code, bits, block_align = (
            _alaw_encode(samples).tobytes(), 6, 8, 1)
    elif codec == "ima":
        data, block_align = _ima_adpcm_encode(samples)
        fmt_code, bits = 0x11, 4
    else:
        raise ValueError(f"unknown codec {codec!r}")
    byte_rate = sample_rate  # approximate for compressed forms
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, fmt_code, 1, sample_rate,
                      byte_rate, block_align, bits)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode for RIFF/WAVE: linear PCM (8/16-bit), the G.711
    companded formats (A-law = 6, µ-law = 7, vectorized expansion), and
    mono IMA/DVI ADPCM (0x11).  Returns (samples[n, channels] as float64
    in [-1, 1], sample_rate).  Walks the chunk list so extra chunks
    (LIST/INFO/fact) are skipped correctly."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, block_align, bits = fmt
    if audio_format == 1 and bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_format == 1 and bits == 8:
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_format == 6:  # A-law
        arr = _alaw_decode(np.frombuffer(data, np.uint8)) / 32768.0
    elif audio_format == 7:  # mu-law
        arr = _mulaw_decode(np.frombuffer(data, np.uint8)) / 32768.0
    elif audio_format == 0x11:  # IMA ADPCM
        arr = _ima_adpcm_decode(data, ch, block_align) / 32768.0
    elif audio_format == 2:  # MS ADPCM
        arr = _ms_adpcm_decode(data, ch, block_align) / 32768.0
    else:
        raise NotImplementedError(
            f"WAV format {audio_format}/{bits}-bit not decodable here "
            "(PCM 8/16, A-law, mu-law, mono IMA- and MS-ADPCM are)")
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch), rate


def audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """WAV binary column → (id, sample_rate, channels, duration_sec, rms,
    peak, zero_crossing_rate) via the REAL PCM decoder, one Arrow pass."""
    schema = (
        f"{id_col} long, sample_rate int, channels int, duration_sec double, "
        "rms double, peak double, zero_crossing_rate double"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    samples, rate = decode_wav(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                mono = samples.mean(axis=1)
                zc = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if len(mono) > 1 else 0.0
                rows.append({
                    id_col: int(i),
                    "sample_rate": int(rate),
                    "channels": samples.shape[1],
                    "duration_sec": samples.shape[0] / rate,
                    "rms": float(np.sqrt(np.mean(mono ** 2))) if len(mono) else 0.0,
                    "peak": float(np.max(np.abs(mono))) if len(mono) else 0.0,
                    "zero_crossing_rate": zc,
                })
            yield pd.DataFrame(rows, columns=[
                id_col, "sample_rate", "channels", "duration_sec", "rms",
                "peak", "zero_crossing_rate",
            ])

    return df.mapInPandas(run, schema=schema)


# ------------------------------------------------------------- raw video
# A deterministic uncompressed container (magic RAWV + u32 n/w/h/fps +
# raw RGB24 frames) makes the video PLUMBING — schema, partitioning,
# frame sampling, batch shapes — fully real while compressed codecs
# (mp4/h264/vp9) stay honestly stubbed behind NotImplementedError.


def encode_rawvideo(frames: np.ndarray, fps: int = 30) -> bytes:
    """(n, h, w, 3) uint8 frames → RAWV container bytes."""
    import struct

    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) uint8")
    n, h, w, _ = frames.shape
    return b"RAWV" + struct.pack("<IIII", n, w, h, fps) + frames.tobytes()


def decode_rawvideo(payload: bytes) -> tuple[np.ndarray, int]:
    """RAWV container → ((n, h, w, 3) uint8 frames, fps)."""
    if payload is None or len(payload) < 20 or payload[:4] != b"RAWV":
        raise NotImplementedError("not a RAWV payload")
    import struct

    n, w, h, fps = struct.unpack("<IIII", payload[4:20])
    need = n * h * w * 3
    body = payload[20:20 + need]
    if len(body) != need:
        raise ValueError("truncated RAWV payload")
    return np.frombuffer(body, dtype=np.uint8).reshape(n, h, w, 3), fps


def encode_mjpeg_avi(frames: np.ndarray, fps: int = 25,
                     quality: int = 90) -> bytes:
    """(n, h, w, 3) uint8 frames → minimal MJPEG AVI (RIFF 'AVI ' with an
    hdrl avih/strl header and one '00dc' baseline-JPEG chunk per frame) —
    a REAL compressed video container built entirely from this repo's
    T.81 encoder."""
    import struct

    from .jpeg import encode_jpeg

    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<IIIIIIIIIIIIII", 1_000_000 // max(fps, 1), 0, 0,
                       0x10, n, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, n, 0, 0, 0, 0)
            + struct.pack("<hhhh", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)  # BITMAPINFO, biCompression 'MJPG'
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = b"".join(chunk(b"00dc", encode_jpeg(fr, quality=quality))
                    for fr in frames)
    riff_body = b"AVI " + hdrl + lst(b"movi", movi)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_mjpeg_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """MJPEG AVI → ((n, h, w, 3) uint8 frames, fps): RIFF walk to the
    'movi' list, every '00dc'/'00db' chunk decoded by the pure-numpy
    baseline-JPEG decoder (:mod:`lucene_spark.jpeg`)."""
    import struct

    from .jpeg import decode_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError("not an AVI payload")
    fps = 25

    def walk(data, pos, end, frames):
        nonlocal fps
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if tag == b"LIST":
                walk(data, body_start + 4, body_start + size, frames)
            elif tag == b"avih":
                micro_per_frame = struct.unpack_from("<I", data, body_start)[0]
                if micro_per_frame:
                    fps = max(1, round(1_000_000 / micro_per_frame))
            elif tag[2:4] in (b"dc", b"db"):
                frames.append(decode_jpeg(data[body_start : body_start + size]))
            pos = body_start + size + (size & 1)

    frames: list[np.ndarray] = []
    walk(payload, 12, len(payload), frames)
    if not frames:
        raise ValueError("AVI without video frames")
    return np.stack(frames), fps


def decode_video(payload: bytes) -> tuple[np.ndarray, int]:
    """Dispatching video decode: the RAWV raw container and MJPEG AVI
    decode for real (the latter via the pure-numpy T.81 JPEG decoder);
    inter-frame codecs (h264/vp9/mp4) raise NotImplementedError — out of
    reasonable from-scratch scope; swap in pyav/ffmpeg at deploy time,
    the mapInPandas plumbing is unchanged."""
    if payload is None or len(payload) < 12:
        raise NotImplementedError("video decode of empty payload")
    if payload[:4] == b"RAWV":
        return decode_rawvideo(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return decode_mjpeg_avi(payload)
    raise NotImplementedError(
        f"no video codec for container magic {payload[:4]!r} "
        "(RAWV and MJPEG-AVI decode in this environment)")


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
) -> DataFrame:
    """Video → sampled frames: every ``every_n``-th frame of each doc's
    RAWV payload, emitted as one row per frame with a BMP re-encode of
    the frame — (id, frame_idx, width, height, mean_intensity,
    frame_bmp binary).  Arrow-batched mapInPandas; undecodable payloads
    are skipped (the usual corrupt-sample drop in a curation pipeline)."""
    schema = (f"{id_col} long, frame_idx int, width int, height int, "
              "mean_intensity double, frame_bmp binary")
    step = int(every_n)

    def run(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames, _ = decode_video(
                        bytes(payload) if payload is not None else None)
                except (NotImplementedError, ValueError):
                    continue
                for fi in range(0, len(frames), step):
                    fr = frames[fi]
                    rows.append({
                        id_col: int(i), "frame_idx": fi,
                        "width": int(fr.shape[1]), "height": int(fr.shape[0]),
                        "mean_intensity": float(fr.mean()),
                        "frame_bmp": encode_bmp(fr),
                    })
            yield pd.DataFrame(rows, columns=[
                id_col, "frame_idx", "width", "height", "mean_intensity",
                "frame_bmp"])

    return df.mapInPandas(run, schema=schema)


def video_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-video temporal features over the RAWV container: frame count,
    fps, duration, mean intensity, and temporal-difference energy (mean
    |frame_t - frame_{t-1}|) — the motion-proxy a data-quality filter
    thresholds on.  (id, n_frames, fps, duration_s, mean_intensity,
    temporal_energy)."""
    schema = (f"{id_col} long, n_frames int, fps int, duration_s double, "
              "mean_intensity double, temporal_energy double")

    def run(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames, fps = decode_video(
                        bytes(payload) if payload is not None else None)
                except (NotImplementedError, ValueError):
                    continue
                f64 = frames.astype(np.float64)
                te = (float(np.abs(np.diff(f64, axis=0)).mean())
                      if len(frames) > 1 else 0.0)
                rows.append({
                    id_col: int(i), "n_frames": len(frames), "fps": int(fps),
                    "duration_s": len(frames) / float(fps) if fps else 0.0,
                    "mean_intensity": float(f64.mean()),
                    "temporal_energy": te,
                })
            yield pd.DataFrame(rows, columns=[
                id_col, "n_frames", "fps", "duration_s", "mean_intensity",
                "temporal_energy"])

    return df.mapInPandas(run, schema=schema)
