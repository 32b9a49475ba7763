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


def make_bmp(width: int, height: int, channels: int = 3) -> bytes:
    """A minimal valid BMP byte string (BITMAPINFOHEADER, zeroed pixel
    data) — the test fixture generator, kept next to the parser so the
    two stay in sync."""
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
    return out + b"\x00" * data_size


def make_ppm(width: int, height: int, comment: str | None = None) -> bytes:
    """A minimal valid binary-PPM (P6) byte string with zeroed raster."""
    head = b"P6\n"
    if comment:
        head += b"# " + comment.encode() + b"\n"
    head += f"{width} {height}\n255\n".encode()
    return head + b"\x00" * (width * height * 3)


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
