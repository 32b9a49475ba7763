"""Pure-Python image codecs for the multimodal decode seam.

The production codecs (PIL/av/librosa) are not installed in this
container, so the multimodal operators default to a deterministic fake.
This module provides a REAL decoder for two formats simple enough to
parse with the standard library — BMP (BITMAPINFOHEADER) and binary PPM
(P6) — so the swap-in seam in ``decode_features(codec=...)`` is
exercised end-to-end by a non-skipped test: real bytes in, real
dimensions out, through the same Arrow-batched ``mapInPandas`` plumbing
a PIL-backed codec would use.

``pure_python_image_codec`` is a FACTORY returning a closure on purpose:
cloudpickle serializes module-level functions by reference (executors
would need this package importable), but closures by value — the same
self-containment contract every mapInPandas body in this package keeps
(see decode_features' docstring).
"""

from __future__ import annotations

from collections.abc import Callable


def pure_python_image_codec() -> Callable[[bytes], tuple[int, int, int]]:
    """Returns ``decode(payload) -> (width, height, n_channels)`` for BMP
    and binary-PPM payloads; raises ValueError on anything else (the
    caller decides whether unknown formats are an error or a fallthrough
    to metadata-only handling)."""

    def decode(payload: bytes) -> tuple[int, int, int]:
        import struct

        if len(payload) >= 30 and payload[:2] == b"BM":
            # BITMAPINFOHEADER: width int32le @18, height int32le @22
            # (negative height = top-down rows), bits-per-pixel uint16le
            # @28.
            width = struct.unpack_from("<i", payload, 18)[0]
            height = abs(struct.unpack_from("<i", payload, 22)[0])
            bits = struct.unpack_from("<H", payload, 28)[0]
            if width <= 0 or height <= 0 or bits not in (8, 24, 32):
                raise ValueError("malformed BMP header")
            return width, height, bits // 8
        if payload[:2] == b"P6":
            # P6 <ws> width <ws> height <ws> maxval <single-ws> raster;
            # '#' starts a comment through end-of-line.
            tokens: list[int] = []
            i = 2
            while len(tokens) < 3:
                if i >= len(payload):
                    raise ValueError("truncated PPM header")
                c = payload[i : i + 1]
                if c == b"#":
                    while i < len(payload) and payload[i : i + 1] != b"\n":
                        i += 1
                elif c.isspace():
                    i += 1
                elif c.isdigit():
                    j = i
                    while j < len(payload) and payload[j : j + 1].isdigit():
                        j += 1
                    tokens.append(int(payload[i:j]))
                    i = j
                else:
                    raise ValueError("malformed PPM header")
            width, height, maxval = tokens
            if width <= 0 or height <= 0 or not 0 < maxval < 65536:
                raise ValueError("malformed PPM header")
            return width, height, 3
        raise ValueError("unrecognized image format")

    return decode


def pure_python_image_raster_codec() -> (
    Callable[[bytes], tuple[int, int, int, bytes]]
):
    """Returns ``decode_raster(payload) -> (width, height, n_channels,
    raster)`` for BMP and binary-PPM payloads, where ``raster`` is the
    row-major TOP-DOWN pixel buffer (``width * height * n_channels``
    bytes, BMP's bottom-up row order and 4-byte row padding already
    normalized away).  The pixel-level sibling of
    :func:`pure_python_image_codec` — it feeds operators that transform
    the image body (``resize_images``), not just its dimensions.
    Closure for the same pickle-by-value reason."""

    def decode_raster(payload: bytes) -> tuple[int, int, int, bytes]:
        import struct

        if len(payload) >= 30 and payload[:2] == b"BM":
            data_off = struct.unpack_from("<I", payload, 10)[0]
            width = struct.unpack_from("<i", payload, 18)[0]
            raw_h = struct.unpack_from("<i", payload, 22)[0]
            height = abs(raw_h)
            bits = struct.unpack_from("<H", payload, 28)[0]
            if width <= 0 or height <= 0 or bits not in (8, 24, 32):
                raise ValueError("malformed BMP header")
            ch = bits // 8
            stride = (width * ch + 3) // 4 * 4
            if data_off + stride * height > len(payload):
                raise ValueError("truncated BMP raster")
            rows = []
            for y in range(height):
                # negative height = already top-down; default is bottom-up
                sy = y if raw_h < 0 else height - 1 - y
                start = data_off + sy * stride
                rows.append(payload[start : start + width * ch])
            return width, height, ch, b"".join(rows)
        if payload[:2] == b"P6":
            tokens: list[int] = []
            i = 2
            while len(tokens) < 3:
                if i >= len(payload):
                    raise ValueError("truncated PPM header")
                c = payload[i : i + 1]
                if c == b"#":
                    while i < len(payload) and payload[i : i + 1] != b"\n":
                        i += 1
                elif c.isspace():
                    i += 1
                elif c.isdigit():
                    j = i
                    while j < len(payload) and payload[j : j + 1].isdigit():
                        j += 1
                    tokens.append(int(payload[i:j]))
                    i = j
                else:
                    raise ValueError("malformed PPM header")
            i += 1  # exactly one whitespace byte separates maxval & raster
            width, height, maxval = tokens
            if width <= 0 or height <= 0 or not 0 < maxval < 65536:
                raise ValueError("malformed PPM header")
            need = width * height * 3
            raster = payload[i : i + need]
            if len(raster) < need:
                raise ValueError("truncated PPM raster")
            return width, height, 3, raster
        raise ValueError("unrecognized image format")

    return decode_raster


def _gradient_row(width: int, y: int, channels: int) -> bytes:
    """Deterministic non-constant pixel row for fixtures: value depends
    on (x, y, channel), so a resize that samples the wrong source pixel
    changes the output hash (a zeroed raster would hide that)."""
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for x in range(width)
        for c in range(channels)
    )


def make_bmp(
    width: int, height: int, channels: int = 3, gradient: bool = False
) -> bytes:
    """A minimal valid BMP byte string (BITMAPINFOHEADER; zeroed pixel
    data, or a deterministic (x,y,c) gradient raster when ``gradient``) —
    the test fixture generator, kept next to the parser so the two stay
    in sync.  Gradient pixel bytes are written in logical (unreordered)
    channel order — this fixture/parser pair round-trips bytes as-is and
    deliberately ignores real BMP BGR convention (a PIL-backed codec
    would normalize that; the seam under test is the plumbing)."""
    import struct

    if channels not in (1, 3, 4):
        raise ValueError("channels must be 1, 3 or 4")
    bits = channels * 8
    row = (width * channels + 3) // 4 * 4  # rows pad to 4 bytes
    data_size = row * height
    header_size = 14 + 40
    out = b"BM" + struct.pack(
        "<IHHI", header_size + data_size, 0, 0, header_size
    )
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bits, 0, data_size, 2835, 2835, 0, 0
    )
    if not gradient:
        return out + b"\x00" * data_size
    pad = b"\x00" * (row - width * channels)
    # BMP default is BOTTOM-UP row order: last logical row first.
    body = b"".join(
        _gradient_row(width, y, channels) + pad
        for y in range(height - 1, -1, -1)
    )
    return out + body


def make_ppm(
    width: int, height: int, comment: str | None = None, gradient: bool = False
) -> bytes:
    """A minimal valid binary-PPM (P6) byte string (zeroed raster, or the
    same deterministic gradient as :func:`make_bmp` so the two formats
    encode the SAME logical image)."""
    head = b"P6\n"
    if comment:
        head += b"# " + comment.encode() + b"\n"
    head += f"{width} {height}\n255\n".encode()
    if not gradient:
        return head + b"\x00" * (width * height * 3)
    return head + b"".join(_gradient_row(width, y, 3) for y in range(height))


def pure_python_wav_codec() -> Callable[[bytes], tuple[int, int]]:
    """Returns ``decode(payload) -> (sample_rate, duration_ms)`` for WAV
    payloads via the standard library's ``wave`` module — the real-audio
    analog of :func:`pure_python_image_codec`, driving segment_audio's
    codec seam without any external demuxer.  Closure for the same
    pickle-by-value reason."""

    def decode(payload: bytes) -> tuple[int, int]:
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload)) as w:
                rate = w.getframerate()
                frames = w.getnframes()
        except (wave.Error, EOFError) as exc:
            raise ValueError(f"not a WAV payload: {exc}") from exc
        if rate <= 0:
            raise ValueError("malformed WAV: nonpositive frame rate")
        return rate, (frames * 1000) // rate

    return decode


def make_wav(sample_rate: int, n_frames: int, channels: int = 1) -> bytes:
    """A minimal valid PCM-16 WAV byte string with silent frames."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"\x00\x00" * channels * n_frames)
    return buf.getvalue()
