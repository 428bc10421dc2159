"""Bitstream container framing tests (byte layout compatibility)."""

import struct

from onedc_tpu.entropy.framing import (
    decode_i,
    encode_i,
    get_downsampled_shape,
    get_padding_size,
)


def test_padding_size():
    assert get_padding_size(768, 768, 64) == (0, 0, 0, 0)
    assert get_padding_size(512, 768, 64) == (0, 0, 0, 0)
    assert get_padding_size(500, 700, 64) == (0, 704 - 700, 0, 512 - 500)
    assert get_downsampled_shape(500, 700, 64) == (8, 11)


def test_container_layout():
    y = b"\x01\x02\x03\x04\x05"
    # ds=64, 128x64 image -> 2x1 z-grid, 14 bits each -> ceil(28/8)=4 bytes
    z = b"\xaa\xbb\xcc\xdd"
    blob = encode_i(128, 64, y, z, b"", 0)
    # header: >2I dims, >1I len(y), >1I caption len
    h, w, ylen, clen = struct.unpack(">4I", blob[:16])
    assert (h, w, ylen, clen) == (128, 64, 5, 0)
    assert blob[16:21] == y
    assert blob[21:25] == z

    out = decode_i(blob, index_unit_length=14, ds=64)
    assert out["height"] == 128 and out["width"] == 64
    assert out["pad_height"] == 128 and out["pad_width"] == 64
    assert out["bit_stream_y"] == y
    assert out["bit_stream_z"] == z
    assert out["bit_stream_caption"] == b""


def test_container_roundtrip_with_padding_and_caption():
    y = bytes(range(32))
    # 500x700 -> padded 512x704 -> z grid 8x11=88 indices, 14b -> 154 bytes
    z = bytes(154)
    cap = "hello".encode()
    blob = encode_i(500, 700, y, z, cap, len(cap))
    out = decode_i(blob, index_unit_length=14, ds=64)
    assert out["pad_tuple"] == (0, 4, 0, 12)
    assert out["bit_stream_y"] == y
    assert out["bit_stream_z"] == z
    assert out["bit_stream_caption"] == cap


def test_corrupt_bitstream_errors():
    import pytest
    from onedc_tpu.entropy.framing import CorruptBitstreamError, decode_i, encode_i
    good = encode_i(pic_height=60, pic_width=60, bit_stream_y=b"y" * 100,
                    bit_stream_z=b"zz", bit_stream_caption="", caption_length=0)
    with pytest.raises(CorruptBitstreamError, match="truncated"):
        decode_i(good[:10], 14, 64)
    with pytest.raises(CorruptBitstreamError, match="truncated"):
        decode_i(good[:40], 14, 64)
    with pytest.raises(CorruptBitstreamError, match="implausible"):
        decode_i(b"\xff" * 64, 14, 64)
