"""Pure-stdlib codecs for uncompressed media formats.

Real end-to-end decode for one format per modality — no image/audio
libraries exist in this container, so the formats are the uncompressed
ones a few hundred lines of stdlib can parse exactly:

- **BMP** (Windows V3, 24-bit BI_RGB): bottom-up, BGR, 4-byte row
  padding — the classic uncompressed interchange format;
- **PPM** (P6 binary): header + raw RGB, the simplest real image format;
- **WAV** (RIFF PCM 16-bit mono/stereo) via the stdlib ``wave`` module.

Each decoder returns the image's logical pixel stream (row-major
top-down RGB bytes) or the audio's sample list, so
``encode → decode`` round-trips byte-identically (tests). Compressed
formats (JPEG/PNG/MP3/...) are NOT implementable without libraries and
raise ``NotImplementedError`` at the sniffer — the documented
integration point for a real PIL/librosa swap-in.
"""

from __future__ import annotations

import io
import struct
import wave


# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed (BITMAPFILEHEADER + BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode row-major top-down RGB pixels as a 24-bit BMP."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    row_size = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    pixel_bytes = row_size * height
    off = 14 + 40
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    out += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       pixel_bytes, 2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # BMP stores bottom-up
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        # logical RGB → stored BGR
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]
        out += bgr + pad
    return bytes(out)


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, row-major top-down RGB bytes) from a 24-bit BMP."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", data, 10)
    hdr_size, width, height, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={comp})"
        )
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    # The final stored row only needs its width*3 pixel bytes — writers
    # may legally omit the trailing row padding, so don't demand it.
    if len(data) < off + row_size * (height - 1) + width * 3:
        # explicit, like decode_ppm's check: a truncated pixel array
        # would otherwise yield silently short RGB output (step-1 slice
        # assignment resizes the bytearray) or an opaque slice error
        raise ValueError("truncated BMP pixel data")
    rgb = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = data[off + src_y * row_size : off + src_y * row_size + width * 3]
        out = bytearray(row)
        out[0::3], out[2::3] = row[2::3], row[0::3]  # stored BGR → RGB
        rgb[y * width * 3 : (y + 1) * width * 3] = out
    return width, height, bytes(rgb)


# ---------------------------------------------------------------------------
# PPM — P6 binary
# ---------------------------------------------------------------------------

def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, RGB bytes) from a binary P6 PPM (handles '#'
    comments and arbitrary header whitespace per the spec)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"only maxval=255 PPM supported, got {maxval}")
    pos += 1  # single whitespace after maxval
    n = width * height * 3
    rgb = data[pos : pos + n]
    if len(rgb) != n:
        raise ValueError("truncated PPM pixel data")
    return width, height, rgb


# ---------------------------------------------------------------------------
# WAV — RIFF PCM 16-bit (stdlib `wave`)
# ---------------------------------------------------------------------------

def encode_wav(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    """16-bit PCM WAV from interleaved int16 samples."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, channels, interleaved int16 samples) from PCM WAV."""
    if data[:4] != b"RIFF":
        raise ValueError("not a RIFF/WAV payload")
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only 16-bit PCM supported, got {8 * w.getsampwidth()}-bit"
            )
        n = w.getnframes() * w.getnchannels()
        samples = list(struct.unpack(f"<{n}h", w.readframes(w.getnframes())))
        return w.getframerate(), w.getnchannels(), samples


# ---------------------------------------------------------------------------
# Y4M — YUV4MPEG2, the uncompressed video container (mjpegtools lineage)
# ---------------------------------------------------------------------------
#
# Plain-text stream header "YUV4MPEG2 W<w> H<h> F<num>:<den> [...]\n",
# then per frame a "FRAME[params]\n" marker followed by the raw planar
# pixel data. Colorspaces supported here: C444 (full-resolution Y,U,V
# planes — frame is 3·W·H bytes, no chroma subsampling math) and Cmono
# (Y only, W·H bytes). Subsampled variants (C420*, C422) decode fine in
# principle but are NotImplementedError until something needs them —
# same honesty contract as compressed codecs.

_Y4M_MAGIC = b"YUV4MPEG2"
_Y4M_FRAME_BYTES = {"444": 3, "mono": 1}  # bytes per pixel


def encode_y4m(
    width: int,
    height: int,
    frames: list[bytes],
    fps: tuple[int, int] = (4, 1),
    colorspace: str = "444",
) -> bytes:
    """Encode raw planar frames as a YUV4MPEG2 stream."""
    bpp = _Y4M_FRAME_BYTES.get(colorspace)
    if bpp is None:
        raise NotImplementedError(
            f"colorspace C{colorspace} not supported (C444/Cmono only)"
        )
    frame_size = width * height * bpp
    out = bytearray(
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"C{colorspace}\n".encode("ascii")
    )
    for fr in frames:
        if len(fr) != frame_size:
            raise ValueError(f"need {frame_size} bytes per frame, got {len(fr)}")
        out += b"FRAME\n" + fr
    return bytes(out)


def decode_y4m(data: bytes) -> tuple[int, int, tuple[int, int], list[bytes]]:
    """(width, height, (fps_num, fps_den), frames) from a YUV4MPEG2
    stream; each frame is the raw planar bytes (3·W·H for C444,
    W·H for Cmono)."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream header")
    width = height = None
    fps = (25, 1)
    colorspace = "420jpeg"  # the format's documented default
    for tok in data[len(_Y4M_MAGIC):nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == b"C":
            colorspace = val
    if width is None or height is None:
        raise ValueError("Y4M header missing W or H")
    bpp = _Y4M_FRAME_BYTES.get(colorspace)
    if bpp is None:
        raise NotImplementedError(
            f"colorspace C{colorspace} not supported (C444/Cmono only)"
        )
    frame_size = width * height * bpp
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = data.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated FRAME header")
        start = fnl + 1
        fr = data[start : start + frame_size]
        if len(fr) != frame_size:
            raise ValueError("truncated Y4M frame data")
        frames.append(fr)
        pos = start + frame_size
    return width, height, fps, frames
