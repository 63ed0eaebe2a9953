"""Unit pins for the ICO (favicon) container codec (htmlgraft/icoops.py):
mixed PNG+DIB round trips, the doubled-height DIB rule, the 0-means-256
directory dims, the dims cross-check, a frozen directory byte vector,
and the hostile-input error lanes."""

import struct

import pytest

from htmlgraft.icoops import decode_dib_member, decode_ico, encode_ico


def _plane(w, h):
    return bytes((x * 9 + y * 3 + 4) % 241 for y in range(h) for x in range(w))


def test_mixed_member_roundtrip():
    p1, p2 = _plane(6, 4), _plane(9, 8)
    blob = encode_ico([(6, 4, "dib", p1), (9, 8, "png", p2)])
    assert decode_ico(blob) == [(6, 4, "dib", p1), (9, 8, "png", p2)]


def test_frozen_directory_vector():
    """ICONDIR + the first ICONDIRENTRY pinned byte-by-byte."""
    blob = encode_ico([(3, 2, "dib", bytes([1, 2, 3, 4, 5, 6]))])
    assert blob[:6] == struct.pack("<HHH", 0, 1, 1)
    bw, bh, cc, res, planes, bits, size, off = struct.unpack_from(
        "<BBBBHHII", blob, 6)
    assert (bw, bh, cc, res, planes, bits, off) == (3, 2, 0, 0, 1, 8, 22)
    # member: 40-byte doubled-height header + 1024B palette + XOR + mask
    hdr = struct.unpack_from("<Iii", blob, 22)
    assert hdr == (40, 3, 4)  # biHeight = 2 * 2
    # XOR plane is bottom-up with 1 pad byte per row; mask rows are 4B
    xor_at = 22 + 40 + 1024
    assert blob[xor_at:xor_at + 8] == bytes([4, 5, 6, 0, 1, 2, 3, 0])
    assert blob[xor_at + 8:] == b"\x00" * 8
    assert size == 40 + 1024 + 8 + 8


def test_dib_height_not_doubled_is_loud():
    blob = encode_ico([(4, 3, "dib", _plane(4, 3))])
    doctored = bytearray(blob)
    struct.pack_into("<i", doctored, 22 + 4 + 4, 3)  # odd biHeight
    with pytest.raises(ValueError, match="doubled"):
        decode_ico(bytes(doctored))


def test_directory_member_dims_cross_checked():
    blob = encode_ico([(4, 3, "dib", _plane(4, 3))])
    doctored = bytearray(blob)
    doctored[6] = 5  # directory claims width 5, member says 4
    with pytest.raises(ValueError, match="!= directory"):
        decode_ico(bytes(doctored))


def test_zero_byte_means_256():
    row = bytes((x * 7) % 251 for x in range(256))
    blob = encode_ico([(256, 1, "png", row)])
    assert blob[6] == 0  # width byte 0
    got = decode_ico(blob)
    assert got[0][:3] == (256, 1, "png")


def test_error_lanes():
    good = encode_ico([(5, 4, "dib", _plane(5, 4))])
    with pytest.raises(ValueError, match="not an ICO"):
        decode_ico(b"\x00\x00\x02\x00" + good[4:])  # type 2 = cursor
    with pytest.raises(ValueError, match="truncated ICONDIR"):
        decode_ico(good[:4])
    with pytest.raises(ValueError, match="no members"):
        decode_ico(struct.pack("<HHH", 0, 1, 0))
    with pytest.raises(ValueError, match="overruns"):
        decode_ico(good[:-10])
    # truncated AND mask (cut inside the mask rows)
    member = good[22:]
    with pytest.raises(ValueError, match="AND mask"):
        decode_dib_member(member[:-4])
    # compressed member DIB
    doctored = bytearray(good)
    struct.pack_into("<I", doctored, 22 + 16, 2)  # biCompression = BI_RLE4
    with pytest.raises(NotImplementedError, match="compression"):
        decode_ico(bytes(doctored))


def test_synth_members_match_formulas():
    from htmlgraft.pixelops import synth_ico

    for d in range(14):
        b = d % 7
        members = decode_ico(synth_ico(d))
        kinds = {k: (w, h, px) for w, h, k, px in members}
        w1, h1, p1 = kinds["dib"]
        assert p1 == bytes((b * 67 + x * 19 + y * 11 + 5) % 229
                           for y in range(h1) for x in range(w1))
        w2, h2, p2 = kinds["png"]
        assert p2 == bytes((b * 71 + x * 23 + y * 3 + 7) % 211
                           for y in range(h2) for x in range(w2))
