"""GIF-tier pins: the LZW codec against a FROZEN literal byte vector (so
encoder and decoder cannot validate each other circularly — a symmetric
code-width-convention slip cannot survive a fixed expected byte string),
width-growth coverage at 9/10/12 bits, the KwKwK case, mid-stream Clear
resets, local-colour-table and luma-palette decode, every error lane, and
the phash-dedup group contract on the driver corpus."""

import hashlib
import struct

import pytest

from htmlgraft import gifops as G
from htmlgraft import pixelops as P

# --- frozen byte vector (generated once, hand-checked framing, committed) ----
#
# encode_gif(4, 3, bytes(range(12))): the entropy tail decodes as 9-bit
# LSB-first codes Clear(0x100), 12 literals, EOI(0x101) — the first two
# bytes 0x00 0x01 read LSB-first are exactly 0x100 = Clear.
_FROZEN_TAIL = bytes.fromhex(
    "21f904000000000021fe1d68746d6c67726166742073796e746865746963206772"
    "65797363616c65002c000000000400030000081000010410308040010307102450"
    "b02020003b")
_FROZEN_MD5 = "1868ff92d64c514ac66e31b70d51e741"


def test_frozen_byte_vector():
    blob = G.encode_gif(4, 3, bytes(range(12)))
    assert blob[:6] == b"GIF89a"
    assert blob[6:13] == struct.pack("<HH", 4, 3) + bytes([0xF7, 0, 0])
    assert blob[13:13 + 768] == G._GREY_GCT
    assert blob[13 + 768:] == _FROZEN_TAIL
    assert hashlib.md5(blob).hexdigest() == _FROZEN_MD5


def test_roundtrip_all_bases_and_formula():
    for d in range(14):
        w, h, px = P.synth_gif_pixels(d)
        assert G.decode_gif_pixels(G.encode_gif(w, h, px)) == (w, h, 1, px)
        # formula pin: distinct from the PNG tier's (41/11/5 mod 247)
        assert px[0] == ((d % 7) * 41) % 247
        assert px[1] == ((d % 7) * 41 + 11) % 247


def test_width_growth_coverage():
    # gated corpus planes reach 10-bit codes (dict past 512 entries)
    widths = set()
    for d in range(7):
        _, _, px = P.synth_gif_pixels(d)
        idx, mw = G._lzw_decode(G._lzw_encode(px))
        assert idx == px
        widths.add(mw)
    assert 10 in widths
    # a large plane fills the table to 12-bit codes and forces the
    # encoder's natural Clear-on-full reset; the round trip still holds
    big = bytes(((i * i * 7 + i * 13) >> 3) % 251 for i in range(120000))
    idx, mw = G._lzw_decode(G._lzw_encode(big))
    assert idx == big
    assert mw == 12


def test_kwkwk_case():
    # runs of one symbol generate code-not-yet-in-table references
    for n in (2, 3, 6, 40):
        px = bytes([5] * n)
        assert G._lzw_decode(G._lzw_encode(px))[0] == px


def test_midstream_clear_roundtrip():
    w, h, px = P.synth_gif_pixels(3)
    blob = G.encode_gif(w, h, px, clear_every=50)
    assert G.decode_gif_pixels(blob)[3] == px
    # the extra Clear codes + shallower dictionaries cost real bytes
    assert len(blob) > len(G.encode_gif(w, h, px))


def _lct_gif(w, h, px, palette):
    """Hand-built GIF with NO global table and a LOCAL colour table."""
    size_bits = (len(palette) // 3 - 1).bit_length() - 1
    min_code = max(2, size_bits + 1)
    return (b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x00, 0, 0])
            + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
            + bytes([0x80 | size_bits]) + palette
            + bytes([min_code]) + G._sub_blocks(G._lzw_encode(px, min_code))
            + b"\x3b")


def test_local_colour_table_and_luma_mapping():
    # 4-entry LCT: two grey entries decode as-is, a colour entry maps to
    # integer luma (299r + 587g + 114b) div 1000
    pal = bytes([0, 0, 0, 200, 200, 200, 255, 0, 0, 10, 20, 30])
    px = bytes([0, 1, 2, 3])
    out = G.decode_gif_pixels(_lct_gif(4, 1, px, pal))
    assert out == (4, 1, 1, bytes([0, 200, (299 * 255) // 1000,
                                   (2990 + 11740 + 3420) // 1000]))


def test_extension_skipping_is_real():
    # encode_gif writes a GCE and a multi-sub-block comment extension;
    # strip them and the stream still decodes identically
    w, h, px = P.synth_gif_pixels(1)
    blob = G.encode_gif(w, h, px)
    head = 13 + 768
    stripped = blob[:head] + blob[blob.index(b"\x2c", head):]
    assert len(stripped) < len(blob)
    assert G.decode_gif_pixels(stripped) == G.decode_gif_pixels(blob)


def test_error_lanes():
    w, h, px = P.synth_gif_pixels(2)
    blob = G.encode_gif(w, h, px)
    with pytest.raises(ValueError, match="not a GIF"):
        G.decode_gif_pixels(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):                 # cut inside the GCT
        G.decode_gif_pixels(blob[:100])
    with pytest.raises(ValueError):                 # cut inside LZW data
        G.decode_gif_pixels(blob[:-10])
    with pytest.raises(ValueError, match="no image data"):
        G.decode_gif_pixels(blob[:13 + 768] + b"\x3b")
    # index beyond a short local palette
    with pytest.raises(ValueError, match="beyond palette"):
        G.decode_gif_pixels(_lct_gif(2, 1, bytes([0, 3]),
                                     bytes([0, 0, 0, 9, 9, 9])))
    # LZW pixel-count mismatch: descriptor claims more pixels than coded
    short = _lct_gif(3, 2, bytes([0, 1, 0, 1]), bytes([0, 0, 0, 9, 9, 9]))
    with pytest.raises(ValueError, match="pixel count"):
        G.decode_gif_pixels(short)
    # truncated-GIF audit lane raises, never a short plane
    with pytest.raises(ValueError):
        G.decode_gif_pixels(P._truncated_gif(8))


def test_lzw_stream_validation():
    with pytest.raises(ValueError, match="exhausted"):
        G._lzw_decode(b"", 8)
    # a code beyond the table is loud
    bw = G._BitWriter()
    bw.write(256, 9)   # clear
    bw.write(7, 9)     # literal
    bw.write(300, 9)   # beyond table (next_code is 258)
    with pytest.raises(ValueError, match="beyond table"):
        G._lzw_decode(bw.flush(), 8)
    # first code after clear must be a literal
    bw = G._BitWriter()
    bw.write(256, 9)
    bw.write(258, 9)
    with pytest.raises(ValueError, match="not literal"):
        G._lzw_decode(bw.flush(), 8)


def test_pixel_phash_gif_groups(spark, sf_dir):
    df = P.pixel_phash_gif(spark, sf_dir).toPandas()
    base_hash = {}
    for r in df.itertuples():
        base_hash.setdefault(r.doc_id % P.PHASH_BASES, set()).add(r.phash)
    assert all(len(s) == 1 for s in base_hash.values())
    assert df.phash.nunique() == P.PHASH_BASES
    for b in range(P.PHASH_BASES):
        grp = df[df.doc_id % P.PHASH_BASES == b]
        assert (grp.keeper == grp.doc_id.min()).all()
        assert (grp.dup == (grp.doc_id != grp.doc_id.min())).all()
    for r in df.head(14).itertuples():
        w, h, px = P.synth_gif_pixels(r.doc_id)
        assert (r.width, r.height, r.px_sum) == (w, h, sum(px))


def test_decode_audit_lanes(spark, sf_dir):
    df = P.pixel_decode_audit(spark, sf_dir).toPandas()
    lanes = {0: ("png", 1), 1: ("jpeg", 1), 2: ("gif", 1),
             3: ("jpeg", 1), 4: ("jpeg", 0), 5: ("gif", 0),
             6: ("jpeg", 0), 7: ("bmp", 1), 8: ("bmp", 0),
             9: ("tiff", 1), 10: ("tiff", 0), 11: ("unknown", 0)}
    for r in df.itertuples():
        fmt, ok = lanes[r.doc_id % 12]
        assert (r.fmt, r.ok) == (fmt, ok), r
        assert (r.px_sum == -1) == (ok == 0)
    # the healthy-GIF lane's sums match a pure-Python recompute
    for r in df[df.doc_id % 12 == 2].head(7).itertuples():
        assert r.px_sum == sum(P.synth_gif_pixels(r.doc_id)[2])
    # the progressive lane's sums match the closed-form twin
    for r in df[df.doc_id % 12 == 3].head(7).itertuples():
        w, h, _ = P.synth_prog_coeffs(r.doc_id)
        assert r.px_sum == sum(P.prog_pixel(r.doc_id, x, y)
                               for y in range(h) for x in range(w))
    # the healthy-BMP lane's sums match the BMP-tier formula
    for r in df[df.doc_id % 12 == 7].head(7).itertuples():
        assert r.px_sum == sum(P.synth_bmp_pixels(r.doc_id)[2])
    # and the healthy-TIFF lane's sums match the TIFF-tier formula
    for r in df[df.doc_id % 12 == 9].head(7).itertuples():
        assert r.px_sum == sum(P.synth_tiff_pixels(r.doc_id)[2])


def test_interlace_row_order_pinned():
    # GIF89a appendix E example orders, h=10: pass1 0,8; pass2 4; pass3
    # 2,6; pass4 odd rows
    assert G.interlace_rows(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert G.interlace_rows(1) == [0]
    assert G.interlace_rows(5) == [0, 4, 2, 1, 3]


def test_interlaced_roundtrip_and_flag():
    w, h, px = P.synth_gif_pixels(3)
    blob = G.encode_gif(w, h, px, interlace=True)
    pos = blob.index(b"\x2c", 13 + 768)
    assert blob[pos + 9] & 0x40                     # flag actually set
    assert G.decode_gif_pixels(blob) == (w, h, 1, px)
    # and the bytes differ from the sequential carrier (rows really moved)
    assert blob != G.encode_gif(w, h, px)
    # the flag is load-bearing: stripping it yields the raw (permuted)
    # row order, so encoder and decoder cannot both ignore it
    stripped = bytearray(blob)
    stripped[pos + 9] &= ~0x40
    perm = G.decode_gif_pixels(bytes(stripped))[3]
    rows = [px[r * w:(r + 1) * w] for r in G.interlace_rows(h)]
    assert perm == b"".join(rows) != px


def test_interlaced_deep_lzw():
    # a 120x100 interlaced plane pushes LZW past 10-bit codes with the
    # de-interlace in the loop
    w, h = 120, 100
    px = bytes((x * 7 + y * 13) % 251 for y in range(h) for x in range(w))
    blob = G.encode_gif(w, h, px, interlace=True)
    assert G.decode_gif_pixels(blob) == (w, h, 1, px)


# --- animation (multi-frame, delays, loop, sub-canvas scope) ------------------


def _descriptor_positions(blob):
    """Structural walk to each image separator (0x2C also occurs as a
    DATA byte inside the grey GCT and LZW streams, so .index() lies)."""
    flags = blob[10]
    pos = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
    out = []
    while blob[pos] != 0x3B:
        if blob[pos] == 0x21:
            pos += 2
            _, pos = G._read_sub_blocks(blob, pos)
            continue
        assert blob[pos] == 0x2C
        out.append(pos)
        iflags = blob[pos + 9]
        pos += 10
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1
        _, pos = G._read_sub_blocks(blob, pos)
    return out


def test_anim_roundtrip_and_metadata():
    from htmlgraft.gifops import decode_gif_frames, encode_gif_anim

    w, h = 7, 5
    frames = [bytes((x * 3 + y * 5 + 40 * k) % 251
                    for y in range(h) for x in range(w)) for k in range(3)]
    blob = encode_gif_anim(w, h, frames, [10, 25, 7], loop=4)
    ww, hh, loop, got = decode_gif_frames(blob)
    assert (ww, hh, loop) == (w, h, 4)
    assert [d for d, _ in got] == [10, 25, 7]
    assert [p for _, p in got] == frames
    # odd frame indexes are stored interlaced: stripping frame 1's
    # interlace flag yields the permuted rows, so the flag is live
    desc2 = _descriptor_positions(blob)[1]
    assert blob[desc2 + 9] == 0x40
    doctored = bytearray(blob)
    doctored[desc2 + 9] = 0
    _, _, _, perm = decode_gif_frames(bytes(doctored))
    assert perm[1][1] != frames[1]


def test_anim_single_frame_and_no_netscape():
    from htmlgraft.gifops import decode_gif_frames, encode_gif

    w, h = 4, 3
    px = bytes(range(12))
    ww, hh, loop, got = decode_gif_frames(encode_gif(w, h, px))
    assert (ww, hh, loop) == (w, h, -1)  # -1 = no loop extension present
    assert got == [(0, px)]


def test_anim_subcanvas_frame_is_loud_scope():
    import struct as _s

    from htmlgraft.gifops import decode_gif_frames, encode_gif_anim
    import pytest

    w, h = 6, 4
    frames = [bytes((x + y) % 251 for y in range(h) for x in range(w))] * 2
    blob = bytearray(encode_gif_anim(w, h, frames, [1, 1]))
    # shrink frame 1's descriptor to a sub-canvas geometry
    desc2 = _descriptor_positions(bytes(blob))[1]
    _s.pack_into("<HHHH", blob, desc2 + 1, 1, 1, w - 1, h - 1)
    with pytest.raises(NotImplementedError, match="sub-canvas"):
        decode_gif_frames(bytes(blob))


def test_anim_truncation_raises():
    from htmlgraft.gifops import decode_gif_frames, encode_gif_anim
    import pytest

    w, h = 5, 4
    frames = [bytes((x * 7 + y) % 251 for y in range(h) for x in range(w))] * 2
    blob = encode_gif_anim(w, h, frames, [3, 3])
    with pytest.raises(ValueError):
        decode_gif_frames(blob[:-6])


def test_anim_synth_axes_live():
    from htmlgraft.pixelops import synth_gif_anim

    nfs, loops, delays = set(), set(), set()
    for d in range(24):
        w, h, nf, dl, loop, frames = synth_gif_anim(d)
        nfs.add(nf)
        loops.add(loop)
        delays.update(dl)
        assert len(frames) == nf and len(dl) == nf
        assert frames[0] != frames[1]  # frames genuinely differ
    assert nfs == {2, 3, 4, 5}
    assert loops == {0, 1, 2}
    assert len(delays) > 5
