"""Multimodal column conventions + processing plumbing (SURVEY.md
§2.12).

Convention: a modality column is ``content: binary`` plus a typed
``meta`` struct (mime, width/height/duration, source uri).  All
Spark-side plumbing — schema, partition sizing, Arrow batch shape —
is real, and so are the DEFAULT CODECS: pure-stdlib decoders for
uncompressed 24-bit BMP and binary PPM images (header parse, padded
bottom-up row walk, nearest-neighbor resize) power decode_features
and resize_images out of the box, and a 16-bit mono PCM WAV codec
(stdlib ``wave``) powers audio_features.  Codecs remain pluggable
callables for formats that genuinely need external libraries (JPEG,
MP3/OGG, video) — those paths raise NotImplementedError until one is
injected.

Scale notes: binary payloads dominate row size — ``mapInPandas``
streams Arrow record batches so peak memory is one batch, not one
partition; keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
aligned with payload size (10 MB images -> batches of ~100).  Decode
is embarrassingly parallel: no shuffle anywhere in these operators.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("uri", T.StringType()),
    ]
)


def media_schema(extra_fields: list[T.StructField] | None = None) -> T.StructType:
    return T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
        + (extra_fields or [])
    )


# --- real pure-stdlib image codecs (BMP 24-bit, PPM P6, PNG 8-bit) ---------
#
# No image libraries ship in this container, but BMP (BITMAPINFOHEADER,
# uncompressed 24-bit), binary PPM, and non-interlaced 8-bit PNG
# (stdlib ``zlib`` inflate + per-scanline unfilter: the five filter
# types of the PNG spec §9) are simple enough to implement from the
# published format specs with `struct`/`zlib` alone — so the default
# codec is REAL: it parses headers, walks padded bottom-up BMP rows /
# row-major PPM payloads / filtered PNG scanlines, and extracts
# deterministic features.  Codec injection stays supported for tests
# and for formats beyond these (JPEG/audio/video need real libraries —
# still explicit NotImplementedError guards, clearly marked).


def encode_bmp(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Encode row-major top-down (r, g, b) pixels as an uncompressed
    24-bit BMP (BITMAPINFOHEADER, bottom-up rows padded to 4 bytes)."""
    import struct

    row_size = (width * 3 + 3) & ~3
    img_size = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (row_size - len(row))
        rows += row
    return header + dib + bytes(rows)


def encode_ppm(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Encode row-major top-down (r, g, b) pixels as binary PPM (P6)."""
    head = f"P6\n{width} {height}\n255\n".encode()
    body = bytes(c for p in pixels for c in p)
    return head + body


def _decode_bmp(content: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", content, 10)[0]
    dib_size = struct.unpack_from("<I", content, 14)[0]
    if dib_size < 40:
        raise ValueError("unsupported BMP DIB header")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    pixels: list[tuple[int, int, int]] = [(0, 0, 0)] * (width * height)
    for row_idx in range(height):
        y = (height - 1 - row_idx) if bottom_up else row_idx
        base = data_off + row_idx * row_size
        for x in range(width):
            b, g, r = content[base + 3 * x : base + 3 * x + 3]
            pixels[y * width + x] = (r, g, b)
    return width, height, pixels


def _decode_ppm(content: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    if content[:2] != b"P6":
        raise ValueError("not a binary PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    body = content[pos : pos + width * height * 3]
    it = iter(body)
    pixels = [(r, g, b) for r, g, b in zip(it, it, it)]
    return width, height, pixels


# --- PNG (ISO/IEC 15948): 8-bit gray / truecolor / palette / RGBA ----------

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel for the supported 8-bit color types
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def encode_png(
    width: int,
    height: int,
    pixels: list[tuple[int, int, int]],
    color_type: int = 2,
) -> bytes:
    """Encode row-major top-down (r, g, b) pixels as a non-interlaced
    8-bit PNG.  ``color_type``: 2 = truecolor RGB (default), 0 =
    grayscale (uses the red channel), 6 = RGBA with alpha 255.

    Each scanline uses filter type ``y % 5`` — deliberately cycling
    through all five spec filters (None/Sub/Up/Average/Paeth) so any
    encode→decode round trip exercises every unfilter path, and the
    goldens pin all of them at once."""
    import struct
    import zlib

    ch = _PNG_CHANNELS[color_type]
    if color_type == 3:
        raise ValueError("palette encode not supported — use decode only")
    raws: list[bytes] = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            if color_type == 0:
                row.append(r)
            elif color_type == 2:
                row += bytes((r, g, b))
            else:  # 6
                row += bytes((r, g, b, 255))
        raws.append(bytes(row))
    stride = width * ch
    out = bytearray()
    prior = bytes(stride)
    for y, raw in enumerate(raws):
        ft = y % 5
        out.append(ft)
        for i in range(stride):
            left = raw[i - ch] if i >= ch else 0
            up = prior[i]
            ul = prior[i - ch] if i >= ch else 0
            if ft == 0:
                v = raw[i]
            elif ft == 1:
                v = raw[i] - left
            elif ft == 2:
                v = raw[i] - up
            elif ft == 3:
                v = raw[i] - (left + up) // 2
            else:
                v = raw[i] - _paeth(left, up, ul)
            out.append(v & 0xFF)
        prior = raw
    ihdr = struct.pack(">2I5B", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(content: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Parse a non-interlaced 8-bit PNG (color types 0 gray, 2 RGB,
    3 palette, 6 RGBA — alpha dropped) into row-major (r, g, b)
    pixels: chunk walk, zlib inflate over concatenated IDATs, then
    per-scanline unfilter of the five spec filter types."""
    import struct
    import zlib

    if content[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = -1
    color_type = bit_depth = interlace = 0
    idat = bytearray()
    plte: list[tuple[int, int, int]] = []
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">2I5B", data)
            )
        elif ctype == b"PLTE":
            plte = [
                (data[i], data[i + 1], data[i + 2])
                for i in range(0, len(data), 3)
            ]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width < 0:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"only 8-bit gray/RGB/palette/RGBA PNG supported "
            f"(depth={bit_depth}, color_type={color_type}) — inject a "
            "codec for other layouts"
        )
    if interlace != 0:
        raise NotImplementedError(
            "Adam7 interlaced PNG not supported — inject a codec"
        )
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline payload size mismatch")
    pixels: list[tuple[int, int, int]] = []
    prior = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        ft = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ft > 4:
            raise ValueError(f"bad PNG filter type {ft}")
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prior[i]
            ul = prior[i - ch] if i >= ch else 0
            if ft == 1:
                line[i] = (line[i] + left) & 0xFF
            elif ft == 2:
                line[i] = (line[i] + up) & 0xFF
            elif ft == 3:
                line[i] = (line[i] + (left + up) // 2) & 0xFF
            elif ft == 4:
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        for x in range(width):
            if color_type == 0:
                v = line[x]
                pixels.append((v, v, v))
            elif color_type == 2:
                pixels.append(tuple(line[3 * x : 3 * x + 3]))
            elif color_type == 3:
                pixels.append(plte[line[x]])
            else:  # 6: drop alpha
                pixels.append(tuple(line[4 * x : 4 * x + 3]))
        prior = line
    return width, height, pixels


FEATURE_DIM = 8

# Rec.601 luma weights — fixed constants shared with the oracle SQL.
_LUMA = (0.299, 0.587, 0.114)


def image_features(width: int, height: int, pixels: list[tuple[int, int, int]]) -> list[float]:
    """FEATURE_DIM deterministic features: [width, height, mean_r,
    mean_g, mean_b, mean_luma, min_luma, max_luma].  Sums accumulate
    in row-major pixel order so any engine replaying the same order
    (e.g. the DuckDB oracle's list_reduce) reproduces them
    bit-exactly."""
    n = width * height
    sr = sg = sb = sl = 0.0
    lmin, lmax = float("inf"), float("-inf")
    for r, g, b in pixels:
        sr += r
        sg += g
        sb += b
        luma = _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b
        sl += luma
        lmin = min(lmin, luma)
        lmax = max(lmax, luma)
    return [
        float(width),
        float(height),
        sr / n,
        sg / n,
        sb / n,
        sl / n,
        lmin,
        lmax,
    ]


def decode_image(content: bytes) -> dict:
    """REAL default codec: BMP (24-bit uncompressed), binary PPM, and
    non-interlaced 8-bit PNG decode via stdlib struct/zlib parsing;
    returns {'width', 'height', 'features'} with FEATURE_DIM
    features."""
    if content[:2] == b"BM":
        width, height, pixels = _decode_bmp(content)
    elif content[:2] == b"P6":
        width, height, pixels = _decode_ppm(content)
    elif content[:8] == PNG_SIG:
        width, height, pixels = _decode_png(content)
    else:
        raise NotImplementedError(
            "unsupported payload (only BMP/PPM/PNG decode ships in "
            "this container) — inject a codec callable (bytes -> "
            "{'width', 'height', 'features'}) for other formats"
        )
    return {
        "width": width,
        "height": height,
        "features": image_features(width, height, pixels),
    }


def resize_image_bytes(content: bytes, width: int, height: int) -> bytes:
    """REAL default resize codec: nearest-neighbor resample of a
    BMP/PPM/PNG payload, re-encoded in its source format (PNG always
    re-encodes as truecolor RGB)."""
    if content[:2] == b"BM":
        sw, sh, pixels = _decode_bmp(content)
        enc = encode_bmp
    elif content[:2] == b"P6":
        sw, sh, pixels = _decode_ppm(content)
        enc = encode_ppm
    elif content[:8] == PNG_SIG:
        sw, sh, pixels = _decode_png(content)
        enc = encode_png
    else:
        raise NotImplementedError(
            "unsupported payload for resize — inject a codec callable"
        )
    out = [
        pixels[(y * sh // height) * sw + (x * sw // width)]
        for y in range(height)
        for x in range(width)
    ]
    return enc(width, height, out)


_default_codec = decode_image


def decode_features(
    df: DataFrame,
    codec: Callable[[bytes], dict] = _default_codec,
    content_col: str = "content",
    id_col: str = "media_id",
    feature_dim: int = FEATURE_DIM,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched; the
    only sanctioned Python hot path).  Output: (id, width, height,
    features: array<double>)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            decoded = [codec(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    return df.select(id_col, content_col).mapInPandas(process, out_schema)


_SYNTH_ENCODERS: dict[str, tuple] = {
    "bmp": (encode_bmp, "image/bmp"),
    "ppm": (encode_ppm, "image/x-portable-pixmap"),
    "png": (encode_png, "image/png"),
}


def synth_images(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    formats: tuple[str, ...] = ("bmp", "ppm"),
) -> DataFrame:
    """Deterministic image fixtures from an id column: each id becomes
    a real encoded image — format ``formats[id % len(formats)]``
    (default: BMP for even ids, PPM for odd; "png" also supported) —
    whose grayscale pixel (x, y) has value (id*31 + y*w + x) % 256
    with w = 4 + id%5, h = 3 + id%4.  The closed pixel form lets an
    engine-independent oracle compute the decoded features without a
    decoder, turning encode->decode into a verifiable round trip (for
    PNG that round trip exercises all five scanline filters — the
    encoder cycles filter type per row).  Arrow-batched mapInPandas;
    one narrow pass, no shuffle."""
    encoders = [_SYNTH_ENCODERS[f] for f in formats]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(content_col, T.BinaryType()),
            T.StructField("mime", T.StringType()),
        ]
    )

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, blobs, mimes = [], [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 4 + mid % 5, 3 + mid % 4
                px = [((mid * 31 + i) % 256,) * 3 for i in range(w * h)]
                enc, mime = encoders[mid % len(encoders)]
                blobs.append(enc(w, h, px))
                mimes.append(mime)
                ids.append(mid)
            yield pd.DataFrame({id_col: ids, content_col: blobs, "mime": mimes})

    return df.select(id_col).mapInPandas(gen, out_schema)


def synth_decode_features(
    df: DataFrame,
    id_col: str = "media_id",
    formats: tuple[str, ...] = ("bmp", "ppm"),
    codec: Callable[[bytes], dict] = _default_codec,
) -> DataFrame:
    """Fused ``synth_images`` -> ``decode_features``: ONE mapInPandas
    pass with identical bytes and values to the two-stage chain.

    Each id's image is still fully encoded (real BMP/PPM/PNG payload)
    and immediately decoded by the REAL codec, so the encode->decode
    round trip the oracle proves is exercised byte-for-byte.  The
    fusion deletes the second Python stage: chaining two mapInPandas
    ships every encoded payload JVM->Python->JVM->Python->JVM (two
    Arrow boundary crossings, two worker handshakes per task, and an
    extra stage's scheduling) even though the intermediate ``content``
    column is never consumed JVM-side.  On tiny fixture payloads that
    overhead IS the query's entire cost — and it is the measured
    source of the entry's run-to-run variance (worker spawn under
    host load).
    """
    encoders = [_SYNTH_ENCODERS[f] for f in formats]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, widths, heights, feats = [], [], [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 4 + mid % 5, 3 + mid % 4
                px = [((mid * 31 + i) % 256,) * 3 for i in range(w * h)]
                enc, _mime = encoders[mid % len(encoders)]
                d = codec(enc(w, h, px))
                ids.append(mid)
                widths.append(d["width"])
                heights.append(d["height"])
                feats.append(d["features"])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": widths,
                    "height": heights,
                    "features": feats,
                }
            )

    return df.select(id_col).mapInPandas(process, out_schema)


def byte_stats(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Pure-JVM byte-level stats on binary columns (no decode):
    payload size + declared mime passthrough if present."""
    cols = [F.col(id_col), F.length(F.col(content_col)).alias("n_bytes")]
    if "meta" in df.columns:
        cols.append(F.col("meta.mime").alias("mime"))
    return df.select(*cols)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int,
    codec: Callable[[bytes, int], list[bytes]] | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Spark-side shape: mapInPandas generator emitting multiple rows per
    input (frame_idx, frame binary).  Codec pluggable as above.
    """
    if codec is None:
        # video containers genuinely need a real demuxer library —
        # this stays a clearly-marked stub until one is injected
        raise NotImplementedError(
            "no video demuxer in this environment — inject a codec "
            "callable (bytes, every_ms) -> list[bytes]"
        )
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                for i, frame in enumerate(codec(content, every_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, content_col).mapInPandas(process, out_schema)

def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    codec: Callable[[bytes, int, int], bytes] | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Image resize: (id, content) -> (id, content) at the target
    dimensions, meta.width/height rewritten when a meta struct rides
    along.  Same Arrow-batched mapInPandas plumbing as
    decode_features; codec is ``(bytes, w, h) -> bytes`` — defaults to
    the real stdlib nearest-neighbor BMP/PPM resampler
    (resize_image_bytes); injection stays supported for other
    formats."""
    if codec is None:
        codec = resize_image_bytes
    has_meta = "meta" in df.columns
    fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
    if has_meta:
        fields.append(T.StructField("meta", MEDIA_META))
    out_schema = T.StructType(fields)

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                id_col: pdf[id_col].values,
                "content": [codec(b, width, height) for b in pdf[content_col]],
            }
            if has_meta:
                out["meta"] = [
                    {**(m or {}), "width": width, "height": height}
                    for m in pdf["meta"]
                ]
            yield pd.DataFrame(out)

    cols = [id_col, content_col] + (["meta"] if has_meta else [])
    return df.select(*cols).mapInPandas(process, out_schema)


# --- real pure-stdlib audio codec (WAV / 16-bit mono PCM) ------------------
#
# Python ships `wave` in the stdlib, so — like BMP/PPM for images —
# the default AUDIO codec is REAL: RIFF/WAVE container, 16-bit mono
# PCM frames via struct.  Compressed audio (MP3/OGG/AAC) remains a
# documented injection point.

WAV_RATE = 16_000


def encode_wav(samples: list[int], sample_rate: int = WAV_RATE) -> bytes:
    """16-bit mono PCM WAV bytes from integer samples (clamped to
    int16) — stdlib wave + struct, no external codecs."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        clamped = [max(-32768, min(32767, int(s))) for s in samples]
        w.writeframes(struct.pack(f"<{len(clamped)}h", *clamped))
    return buf.getvalue()


def decode_wav(content: bytes) -> dict:
    """Parse a 16-bit mono PCM WAV and extract deterministic audio
    features: n_samples, sample_rate, duration_ms, rms, peak,
    zero-crossing rate.  Raises NotImplementedError for compressed /
    multi-channel forms (codec injection point, like JPEG)."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 2:
                raise NotImplementedError(
                    "only 16-bit mono PCM is implemented; inject a codec "
                    "for other layouts"
                )
            n = w.getnframes()
            rate = w.getframerate()
            samples = struct.unpack(f"<{n}h", w.readframes(n))
    except wave.Error as e:  # compressed containers etc.
        raise NotImplementedError(f"non-PCM wav: {e}") from e
    if n == 0:
        return {
            "n_samples": 0, "sample_rate": rate, "duration_ms": 0.0,
            "rms": 0.0, "peak": 0, "zcr": 0.0,
        }
    sq = sum(s * s for s in samples)  # exact int accumulation
    crossings = sum(
        1
        for a, b in zip(samples, samples[1:])
        if (a >= 0) != (b >= 0)
    )
    return {
        "n_samples": n,
        "sample_rate": rate,
        "duration_ms": round(n * 1000.0 / rate, 6),
        "rms": round((sq / n) ** 0.5, 6),
        "peak": max(abs(s) for s in samples),
        "zcr": round(crossings / (n - 1), 6) if n > 1 else 0.0,
    }


def synth_audio(
    df: DataFrame,
    id_col: str = "media_id",
    n_samples: int = 256,
    sample_rate: int = WAV_RATE,
) -> DataFrame:
    """Deterministic WAV synthesis per id (the audio twin of
    synth_images): sample i of id e is ``((e*31 + i*17) % 201) - 100``
    — integer, engine-reproducible, and closed-form for the oracle.
    Output: (id, content: binary WAV)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            contents = [
                encode_wav(
                    [((int(e) * 31 + i * 17) % 201) - 100
                     for i in range(n_samples)],
                    sample_rate,
                )
                for e in ids
            ]
            yield pd.DataFrame({id_col: ids.values, "content": contents})

    return df.select(id_col).mapInPandas(gen, out_schema)


def synth_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    n_samples: int = 256,
    sample_rate: int = WAV_RATE,
    codec: Callable[[bytes], dict] = decode_wav,
) -> DataFrame:
    """Fused ``synth_audio`` -> ``audio_features``: ONE mapInPandas
    pass, identical values to the two-stage chain (the WAV container
    round trip — encode_wav then the real stdlib ``wave`` decode — is
    still exercised byte-for-byte inside the worker).  Same rationale
    as ``synth_decode_features``: the intermediate binary ``content``
    column never touches the JVM, so shipping it across two Arrow
    boundaries and scheduling a second Python stage is pure overhead.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("duration_ms", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("zcr", T.DoubleType()),
        ]
    )

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            decoded = [
                codec(
                    encode_wav(
                        [((int(e) * 31 + i * 17) % 201) - 100
                         for i in range(n_samples)],
                        sample_rate,
                    )
                )
                for e in ids
            ]
            yield pd.DataFrame(
                {
                    id_col: ids.values,
                    "n_samples": [d["n_samples"] for d in decoded],
                    "sample_rate": [d["sample_rate"] for d in decoded],
                    "duration_ms": [d["duration_ms"] for d in decoded],
                    "rms": [d["rms"] for d in decoded],
                    "peak": [d["peak"] for d in decoded],
                    "zcr": [d["zcr"] for d in decoded],
                }
            )

    return df.select(id_col).mapInPandas(process, out_schema)


def audio_features(
    df: DataFrame,
    codec: Callable[[bytes], dict] = decode_wav,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode + feature-extract audio via mapInPandas (Arrow-batched,
    the image decode_features shape): (id, n_samples, sample_rate,
    duration_ms, rms, peak, zcr) — scalar columns, driver-hashable."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("duration_ms", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("zcr", T.DoubleType()),
        ]
    )

    def process(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            decoded = [codec(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_samples": [d["n_samples"] for d in decoded],
                    "sample_rate": [d["sample_rate"] for d in decoded],
                    "duration_ms": [d["duration_ms"] for d in decoded],
                    "rms": [d["rms"] for d in decoded],
                    "peak": [d["peak"] for d in decoded],
                    "zcr": [d["zcr"] for d in decoded],
                }
            )

    return df.select(id_col, content_col).mapInPandas(process, out_schema)
