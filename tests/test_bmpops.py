"""Unit pins for the real BMP codec (htmlgraft/bmpops.py): round trips
across bit depths / row orders / padding classes, the exact integer luma
contract (incl. the BGR-order sensitivity the 24-bit synthesis channels
are designed to expose), palette mapping, hostile-input error lanes, and
a frozen literal byte vector so a symmetric encoder/decoder convention
slip cannot survive."""

import struct

import pytest

from htmlgraft.bmpops import (
    _luma,
    decode_bmp_pixels,
    encode_bmp,
    resample_bmp,
)
from htmlgraft.pixelops import synth_bmp, synth_bmp_pixels


def _plane(w, h):
    return bytes((x * 9 + y * 3 + 4) % 241 for y in range(h) for x in range(w))


@pytest.mark.parametrize("w", [13, 14, 15, 16])  # all mod-4 padding classes
@pytest.mark.parametrize("top_down", [False, True])
def test_roundtrip_8bit_all_paddings(w, top_down):
    h = 5
    px = _plane(w, h)
    blob = encode_bmp(w, h, px, bits=8, top_down=top_down)
    assert decode_bmp_pixels(blob) == (w, h, 1, px)


@pytest.mark.parametrize("top_down", [False, True])
def test_roundtrip_24bit_exact_luma_channels(top_down):
    w, h = 7, 4
    lum = _plane(w, h)
    rgb = b"".join(bytes((v + 2, v, v - 4)) for v in lum)
    blob = encode_bmp(w, h, rgb, bits=24, top_down=top_down)
    assert decode_bmp_pixels(blob) == (w, h, 1, lum)


def test_luma_transform_contract():
    # (i,i,i) grey maps to exactly i; the (L+2, L, L-4) split is exact;
    # swapping R and B on that split shifts luma by 1 — channel order is
    # therefore value-detectable, not a silent no-op
    for i in (0, 1, 127, 254, 255):
        assert _luma(i, i, i) == i
    for L in (4, 100, 244):
        assert _luma(L + 2, L, L - 4) == L
        assert _luma(L - 4, L, L + 2) == L - 1


def test_top_down_flag_is_load_bearing():
    w, h = 4, 3
    px = _plane(w, h)
    bu = encode_bmp(w, h, px, bits=8)
    td = encode_bmp(w, h, px, bits=8, top_down=True)
    assert bu != td
    # flipping the height sign on the top-down blob makes the decoder
    # read the rows in the wrong order: the vertically mirrored plane
    doctored = bytearray(td)
    struct.pack_into("<i", doctored, 14 + 8, h)
    _, _, _, mirrored = decode_bmp_pixels(bytes(doctored))
    rows = [px[y * w:(y + 1) * w] for y in range(h)]
    assert mirrored == b"".join(rows[::-1])


def test_nongrey_palette_luma_mapping():
    pal = [(0, 0, 0)] * 256
    pal[7] = (200, 100, 50)
    pal[9] = (10, 20, 30)
    blob = encode_bmp(2, 1, bytes([7, 9]), bits=8, palette=pal)
    assert decode_bmp_pixels(blob)[3] == bytes(
        [_luma(200, 100, 50), _luma(10, 20, 30)])


def test_palette_index_out_of_range_raises():
    blob = encode_bmp(2, 1, bytes([0, 3]), bits=8,
                      palette=[(0, 0, 0), (1, 1, 1)])
    with pytest.raises(ValueError, match="palette index"):
        decode_bmp_pixels(blob)


def test_error_lanes():
    good = encode_bmp(5, 4, _plane(5, 4), bits=8)
    with pytest.raises(ValueError, match="magic"):
        decode_bmp_pixels(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated BMP header"):
        decode_bmp_pixels(good[:20])
    with pytest.raises(ValueError, match="truncated pixel array"):
        decode_bmp_pixels(good[:-10])
    with pytest.raises(ValueError, match="truncated palette"):
        decode_bmp_pixels(good[: 14 + 40 + 100])
    rle = bytearray(good)
    struct.pack_into("<I", rle, 14 + 16, 1)  # biCompression = BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp_pixels(bytes(rle))
    depth = bytearray(good)
    struct.pack_into("<H", depth, 14 + 14, 4)
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_bmp_pixels(bytes(depth))
    with pytest.raises(ValueError, match="pixel count"):
        encode_bmp(3, 3, b"\x00" * 8, bits=8)


def test_frozen_byte_vector():
    """A 3x2 8-bit bottom-up BMP pinned field by field AND by literal
    byte slices: headers, the first grey palette quads, and the padded
    BOTTOM-UP pixel array (row y=1 stored first, one pad byte per row) —
    kills any symmetric encoder/decoder convention slip."""
    blob = encode_bmp(3, 2, bytes([1, 2, 3, 4, 5, 6]), bits=8)
    # offset = 14 + 40 + 256*4 = 1078; array = 2 rows * (3 + 1 pad)
    assert len(blob) == 1086
    assert blob[:2] == b"BM"
    assert struct.unpack_from("<I", blob, 2)[0] == 1086   # file size
    assert struct.unpack_from("<I", blob, 10)[0] == 1078  # pixel offset
    (hsize, w, h, planes, bits, comp, isize) = struct.unpack_from(
        "<IiiHHII", blob, 14)
    assert (hsize, w, h, planes, bits, comp, isize) == (40, 3, 2, 1, 8, 0, 8)
    assert struct.unpack_from("<I", blob, 14 + 32)[0] == 256  # biClrUsed
    # palette quads i -> (B,G,R,0) = (i,i,i,0)
    assert blob[54:66] == bytes.fromhex("000000000101010002020200")
    assert blob[54 + 4 * 255:54 + 4 * 256] == bytes([255, 255, 255, 0])
    # bottom-up: row (4,5,6) + pad first, then row (1,2,3) + pad
    assert blob[1078:1086] == bytes([4, 5, 6, 0, 1, 2, 3, 0])
    assert decode_bmp_pixels(blob) == (3, 2, 1, bytes([1, 2, 3, 4, 5, 6]))


def test_synth_carrier_axes_live():
    """The gated corpus must exercise both bit depths and both row
    orders, and every carrier decodes to the formula plane."""
    seen = set()
    for d in range(30):
        blob = synth_bmp(d)
        bits = struct.unpack_from("<H", blob, 14 + 14)[0]
        h_raw = struct.unpack_from("<i", blob, 14 + 8)[0]
        seen.add((bits, h_raw < 0))
        w, h, _, px = decode_bmp_pixels(blob)
        ww, hh, want = synth_bmp_pixels(d)
        assert (w, h, px) == (ww, hh, want), d
    assert seen == {(8, False), (8, True), (24, False), (24, True)}


def test_resample_bmp_nn_exact():
    w, h = 8, 6
    px = _plane(w, h)
    out = resample_bmp(encode_bmp(w, h, px, bits=8), 4, 3)
    nw, nh, _, rpx = decode_bmp_pixels(out)
    assert (nw, nh) == (4, 3)
    want = bytes(px[((y * h) // 3) * w + (x * w) // 4]
                 for y in range(3) for x in range(4))
    assert rpx == want
