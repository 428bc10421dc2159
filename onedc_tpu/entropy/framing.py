"""Bitstream container framing, byte-compatible with the reference.

Container layout (see reference ``src/modules/entropy/utils.py:95-132``):
big-endian ``>2I`` (height, width) + ``>1I`` len(y-stream) + ``>1I``
caption length, followed by the raw y bytes, z bytes and caption bytes.
The z-stream length is *not* stored: it is derived at decode time from the
padded image dimensions as ``ceil((padH/ds) * (padW/ds) * index_bits / 8)``.
"""

from __future__ import annotations

import io
import math
import struct
from pathlib import Path


def get_padding_size(height: int, width: int, p: int = 64):
    """Right/bottom padding that brings (height, width) to multiples of p.

    Matches reference ``entropy/utils.py:7-16`` (pad only right/bottom).
    Returns (left, right, top, bottom).
    """
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return 0, new_w - width, 0, new_h - height


def get_downsampled_shape(height: int, width: int, p: int):
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return int(new_h / p + 0.5), int(new_w / p + 0.5)


def filesize(filepath) -> int:
    path = Path(filepath)
    if not path.is_file():
        raise ValueError(f'Invalid file "{filepath}".')
    return path.stat().st_size


def write_uints(fd, values, fmt=">{:d}I"):
    fd.write(struct.pack(fmt.format(len(values)), *values))


def write_uchars(fd, values, fmt=">{:d}B"):
    fd.write(struct.pack(fmt.format(len(values)), *values))


def read_uints(fd, n, fmt=">{:d}I"):
    sz = struct.calcsize("I")
    return struct.unpack(fmt.format(n), fd.read(n * sz))


def read_uchars(fd, n, fmt=">{:d}B"):
    sz = struct.calcsize("B")
    return struct.unpack(fmt.format(n), fd.read(n * sz))


def write_bytes(fd, values, fmt=">{:d}s"):
    if len(values) == 0:
        return
    fd.write(struct.pack(fmt.format(len(values)), values))


def read_bytes(fd, n, fmt=">{:d}s"):
    sz = struct.calcsize("s")
    return struct.unpack(fmt.format(n), fd.read(n * sz))[0]


def write_ushorts(fd, values, fmt=">{:d}H"):
    fd.write(struct.pack(fmt.format(len(values)), *values))


def read_ushorts(fd, n, fmt=">{:d}H"):
    sz = struct.calcsize("H")
    return struct.unpack(fmt.format(n), fd.read(n * sz))


def write_to_file(value: bytes, file_path):
    with Path(file_path).open("wb") as f:
        f.write(value)


def read_from_file(file_path) -> bytes:
    with Path(file_path).open("rb") as f:
        return f.read()


def encode_i(pic_height: int, pic_width: int, bit_stream_y: bytes,
             bit_stream_z: bytes, bit_stream_caption, caption_length: int) -> bytes:
    """Pack one coded image into the container format (utils.py:95-105)."""
    buffer = io.BytesIO()
    if isinstance(bit_stream_caption, str):
        bit_stream_caption = bit_stream_caption.encode("utf-8")
    write_uints(buffer, (pic_height, pic_width))
    write_uints(buffer, (len(bit_stream_y),))
    write_uints(buffer, (caption_length,))
    write_bytes(buffer, bit_stream_y)
    write_bytes(buffer, bit_stream_z)
    write_bytes(buffer, bit_stream_caption)
    return buffer.getvalue()


class CorruptBitstreamError(ValueError):
    pass


def decode_i(data: bytes, index_unit_length: int, ds: int) -> dict:
    """Unpack the container; z length derived from padded dims (utils.py:108-132)."""
    buffer = io.BytesIO(data)
    try:
        height, width = read_uints(buffer, 2)
        (stream_length,) = read_uints(buffer, 1)
        (caption_length,) = read_uints(buffer, 1)
    except struct.error as e:
        raise CorruptBitstreamError(
            f"container header truncated ({len(data)} bytes)") from e
    if not (0 < height <= 1 << 16 and 0 < width <= 1 << 16):
        raise CorruptBitstreamError(
            f"implausible image size {height}x{width}")

    padding_l, padding_r, padding_t, padding_b = get_padding_size(height, width, p=ds)
    pad_h = height + padding_t + padding_b
    pad_w = width + padding_l + padding_r
    stream_length_z = math.ceil((pad_h // ds) * (pad_w // ds) * index_unit_length / 8.0)

    expected = 16 + stream_length + stream_length_z + caption_length
    if len(data) < expected:
        raise CorruptBitstreamError(
            f"container truncated: {len(data)} bytes < {expected} expected "
            f"for a {height}x{width} image")
    bit_stream_y = read_bytes(buffer, stream_length) if stream_length else b""
    bit_stream_z = read_bytes(buffer, stream_length_z) if stream_length_z else b""
    bit_stream_caption = read_bytes(buffer, caption_length) if caption_length else b""
    return {
        "height": height,
        "width": width,
        "pad_height": pad_h,
        "pad_width": pad_w,
        "pad_tuple": (padding_l, padding_r, padding_t, padding_b),
        "bit_stream_y": bit_stream_y,
        "bit_stream_z": bit_stream_z,
        "bit_stream_caption": bit_stream_caption,
    }
