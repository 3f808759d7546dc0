"""Pure-stdlib codec tests: FlateDecode PDF text, PNG decode/encode
(all filters), GIF LZW, BMP, EXIF TIFF walk, AVI/MKV headers.
These are the extraction paths the reference gets from PDFBox /
Thumbnailator / metadata-extractor (PdfReaderFactory.scala:52-67,
UnstructuredData.scala:195-202, VideoReaderFactory.scala:36-107)."""

from __future__ import annotations

import struct
import sys

import pytest
import zlib

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.sources import codecs  # noqa: E402


# -- fixture builders --------------------------------------------------------

def make_flate_pdf(*lines: str) -> bytes:
    """Minimal but real PDF: one page whose content stream is
    zlib-compressed (FlateDecode) — the shape virtually every real-world
    PDF uses, which the old uncompressed-regex stub could NOT read."""
    content = b"BT /F1 12 Tf 72 720 Td " + b" T* ".join(
        b"(" + ln.encode("latin-1") + b") Tj" for ln in lines) + b" ET"
    comp = zlib.compress(content)
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
        b"4 0 obj << /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >> stream\n" + comp + b"\nendstream endobj\n",
    ]
    return b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"


def gradient_rows(w: int, h: int) -> list[bytes]:
    return [bytes(c for x in range(w) for c in
                  ((x * 255) // max(1, w - 1), (y * 255) // max(1, h - 1), 128))
            for y in range(h)]


def apply_png_filter(ftype: int, rows: list[bytes], channels: int = 3) -> bytes:
    """Forward-filter scanlines so the decoder's un-filtering is tested
    against ground truth."""
    out = bytearray()
    prev = bytes(len(rows[0]))
    for row in rows:
        out.append(ftype)
        for i, v in enumerate(row):
            left = row[i - channels] if i >= channels else 0
            up = prev[i]
            ul = prev[i - channels] if i >= channels else 0
            if ftype == 0:
                f = v
            elif ftype == 1:
                f = v - left
            elif ftype == 2:
                f = v - up
            elif ftype == 3:
                f = v - ((left + up) >> 1)
            else:
                f = v - codecs._paeth(left, up, ul)
            out.append(f & 0xFF)
        prev = row
    return bytes(out)


def make_png_filtered(w: int, h: int, ftype: int) -> tuple[bytes, list[bytes]]:
    rows = gradient_rows(w, h)
    def chunk(typ, body):
        raw = typ + body
        return struct.pack(">I", len(body)) + raw + struct.pack(
            ">I", zlib.crc32(raw) & 0xFFFFFFFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(apply_png_filter(ftype, rows))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b"")), rows


def make_gif(w: int, h: int, pixels: list[int], colors: list[bytes]) -> bytes:
    """GIF with per-pixel clear codes — dead-simple valid LZW."""
    n = max(2, (max(len(colors) - 1, 1)).bit_length())
    table = b"".join(colors) + b"\x00\x00\x00" * ((1 << n) - len(colors))
    clear, end = 1 << n, (1 << n) + 1
    code_size = n + 1
    bits, acc, nbits = bytearray(), 0, 0
    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    for p in pixels:
        emit(clear)
        emit(p)
    emit(end)
    if nbits:
        bits.append(acc & 0xFF)
    sub = bytes([len(bits)]) + bytes(bits) + b"\x00"
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (n - 1), 0, 0)
            + table + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([n]) + sub + b"\x3B")


def make_bmp24(w: int, h: int, rows: list[bytes]) -> bytes:
    stride = (w * 3 + 3) & ~3
    pix = b"".join(
        bytes(b for x in range(w) for b in
              (rows[y][3 * x + 2], rows[y][3 * x + 1], rows[y][3 * x]))
        + b"\x00" * (stride - w * 3)
        for y in reversed(range(h)))  # bottom-up
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pix), 2835, 2835, 0, 0))
    return header + pix


def make_exif_jpeg(make: str = "TestCam", model: str = "X100") -> bytes:
    mk = make.encode() + b"\x00"
    md = model.encode() + b"\x00"
    # TIFF: II, IFD0 at 8 with 3 entries + next-IFD 0, then string data
    n_entries = 3
    data_off = 8 + 2 + 12 * n_entries + 4
    entries = (
        struct.pack("<HHI4s", 0x010F, 2, len(mk),
                    struct.pack("<I", data_off)) +
        struct.pack("<HHI4s", 0x0110, 2, len(md),
                    struct.pack("<I", data_off + len(mk))) +
        struct.pack("<HHIHH", 0x0112, 3, 1, 6, 0)  # Orientation=6 inline
    )
    tiff = (b"II*\x00" + struct.pack("<I", 8)
            + struct.pack("<H", n_entries) + entries
            + struct.pack("<I", 0) + mk + md)
    app1 = b"Exif\x00\x00" + tiff
    return (b"\xff\xd8" + b"\xff\xe1" + struct.pack(">H", len(app1) + 2)
            + app1 + b"\xff\xd9")


def make_avi(us_per_frame: int, frames: int, w: int, h: int) -> bytes:
    avih = struct.pack("<14I", us_per_frame, 0, 0, 0, frames, 0, 1, 0,
                       w, h, 0, 0, 0, 0)
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl" + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst


def _ebml(eid: int, body: bytes) -> bytes:
    id_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    assert len(body) < 127
    return id_bytes + bytes([0x80 | len(body)]) + body


def make_mkv(duration_s: float, timescale_ns: int, w: int, h: int) -> bytes:
    info = _ebml(0x1549A966,
                 _ebml(0x2AD7B1, timescale_ns.to_bytes(4, "big"))
                 + _ebml(0x4489, struct.pack(">d",
                                             duration_s * 1e9 / timescale_ns)))
    video = _ebml(0xE0, _ebml(0xB0, w.to_bytes(2, "big"))
                  + _ebml(0xBA, h.to_bytes(2, "big")))
    tracks = _ebml(0x1654AE6B, _ebml(0xAE, video))
    seg_body = info + tracks
    segment = (0x18538067).to_bytes(4, "big") + bytes([0x80 | len(seg_body)]) \
        + seg_body
    ebml_head = _ebml(0x1A45DFA3, b"")
    return ebml_head + segment


# -- tests -------------------------------------------------------------------

def test_pdf_flate_text():
    pdf = make_flate_pdf("Hello compressed world", "second line")
    text = codecs.pdf_text_flate(pdf, 1000)
    assert "Hello compressed world" in text
    assert "second line" in text
    # multi-line structure is preserved (T* emits a newline)
    assert text.index("Hello") < text.index("second")


def test_pdf_hex_and_escapes():
    content = rb"BT (paren \(x\) and \134backslash) Tj <48692068657821> Tj ET"
    comp = zlib.compress(content)
    pdf = (b"%PDF-1.4\n4 0 obj << /Length " + str(len(comp)).encode()
           + b" /Filter /FlateDecode >> stream\n" + comp
           + b"\nendstream endobj\n%%EOF")
    text = codecs.pdf_text_flate(pdf, 1000)
    assert "paren (x) and \\backslash" in text
    assert "Hi hex!" in text


_CMAP_BODY = b"""/CIDInit /ProcSet findresource begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
3 beginbfchar
<0001> <0048>
<0002> <0069>
<0005> <D83DDE00>
endbfchar
2 beginbfrange
<0010> <0019> <0030>
<0020> <0022> [<0058> <0059> <005A>]
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end end"""


def make_cid_pdf(content: bytes, objstm: bool = False) -> bytes:
    """PDF whose page font is a CID-keyed Type0 composite font with a
    /ToUnicode CMap — the case PDFBox handles via its CMap parser
    (pdf/PdfReaderFactory.scala:52-67) and a byte-level extractor must
    resolve through bfchar/bfrange. With objstm=True the page + font
    dicts are packed into an /ObjStm object stream (the modern
    compressed-xref layout)."""
    comp = zlib.compress(content)
    cmap_comp = zlib.compress(_CMAP_BODY)
    page = b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R " \
           b"/Resources << /Font << /F7 5 0 R >> >> >>"
    font = b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H " \
           b"/Encoding /Identity-H /ToUnicode 6 0 R >>"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"4 0 obj << /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >> stream\n" + comp
        + b"\nendstream endobj\n",
        b"6 0 obj << /Length " + str(len(cmap_comp)).encode()
        + b" /Filter /FlateDecode >> stream\n" + cmap_comp
        + b"\nendstream endobj\n",
    ]
    if objstm:
        inner = b"3 0 5 " + str(len(page) + 1).encode() + b" " \
                + page + b"\n" + font
        first = len(b"3 0 5 999 ")  # recompute precisely below
        header = b"3 0 5 " + str(len(page) + 1).encode() + b" "
        first = len(header)
        stm = zlib.compress(inner)
        objs.append(
            b"7 0 obj << /Type /ObjStm /N 2 /First " + str(first).encode()
            + b" /Length " + str(len(stm)).encode()
            + b" /Filter /FlateDecode >> stream\n" + stm
            + b"\nendstream endobj\n")
    else:
        objs.insert(2, b"3 0 obj " + page + b" endobj\n")
        objs.insert(3, b"5 0 obj " + font + b" endobj\n")
    return b"%PDF-1.5\n" + b"".join(objs) + b"%%EOF\n"


def test_pdf_cid_font_tounicode():
    """CID 2-byte codes resolve through bfchar (incl. a surrogate-pair
    emoji dst), a contiguous bfrange, and an array bfrange."""
    content = (b"BT /F7 12 Tf <00010002> Tj T* "
               b"<001000110019> Tj <002000210022> Tj <0005> Tj ET")
    text = codecs.pdf_text_flate(make_cid_pdf(content), 1000)
    assert "Hi" in text
    assert "019" in text          # bfrange <0010>-><0030> ('0'), 1, 9
    assert "XYZ" in text          # array-form bfrange
    assert "\U0001f600" in text   # UTF-16 surrogate pair dst


def test_pdf_cid_font_in_objstm():
    """Same, with page+font dicts packed in an /ObjStm object stream."""
    content = b"BT /F7 9 Tf [<0001> -120 <0002>] TJ ET"
    text = codecs.pdf_text_flate(make_cid_pdf(content, objstm=True), 1000)
    assert "Hi" in text


def test_pdf_mixed_simple_and_cid_fonts():
    """A Tf switch back to a simple (no-ToUnicode) font must return to
    Latin-1 decoding mid-stream."""
    content = (b"BT /F7 12 Tf <00010002> Tj "
               b"/F1 12 Tf (plain latin) Tj ET")
    text = codecs.pdf_text_flate(make_cid_pdf(content), 1000)
    assert "Hi" in text and "plain latin" in text


def test_png_roundtrip_and_all_filters():
    rows = gradient_rows(20, 11)
    enc = codecs.png_encode(20, 11, rows)
    w, h, dec = codecs.png_decode(enc)
    assert (w, h) == (20, 11) and dec == rows
    for ftype in (0, 1, 2, 3, 4):
        data, expect = make_png_filtered(13, 7, ftype)
        w, h, dec = codecs.png_decode(data)
        assert (w, h) == (13, 7)
        assert dec == expect, f"filter {ftype} mismatch"


def test_gif_decode():
    colors = [b"\xff\x00\x00", b"\x00\xff\x00", b"\x00\x00\xff",
              b"\xff\xff\xff"]
    gif = make_gif(2, 2, [0, 1, 2, 3], colors)
    w, h, rows = codecs.gif_decode(gif)
    assert (w, h) == (2, 2)
    assert rows[0] == b"\xff\x00\x00\x00\xff\x00"
    assert rows[1] == b"\x00\x00\xff\xff\xff\xff"


def test_bmp_decode():
    rows = gradient_rows(5, 3)
    w, h, dec = codecs.bmp_decode(make_bmp24(5, 3, rows))
    assert (w, h) == (5, 3) and dec == rows


def test_thumbnail_aspect_fit_and_no_upscale():
    rows = gradient_rows(64, 32)
    png = codecs.png_encode(64, 32, rows)
    thumb = codecs.thumbnail_png(png, 16, 16)
    w, h, trows = codecs.png_decode(thumb)
    assert (w, h) == (16, 8)  # aspect preserved
    # corners approximate the source gradient
    assert trows[0][0:3][2] == 128
    big = codecs.thumbnail_png(png, 500, 500)
    w2, h2, _ = codecs.png_decode(big)
    assert (w2, h2) == (64, 32)  # never upscaled


def test_thumbnail_gif_and_bmp_sources():
    gif = make_gif(2, 2, [0, 1, 2, 3],
                   [b"\xff\x00\x00", b"\x00\xff\x00", b"\x00\x00\xff",
                    b"\xff\xff\xff"])
    assert codecs.thumbnail_png(gif, 10, 10) is not None
    bmp = make_bmp24(5, 3, gradient_rows(5, 3))
    t = codecs.thumbnail_png(bmp, 2, 2)
    w, h, _ = codecs.png_decode(t)
    assert (w, h) <= (2, 2)


def test_exif_jpeg():
    tags = codecs.exif_tags(make_exif_jpeg("TestCam", "X100"))
    assert tags["Make"] == "TestCam"
    assert tags["Model"] == "X100"
    assert tags["Orientation"] == "6"


def test_avi_metadata():
    meta = codecs.avi_metadata(make_avi(40_000, 250, 640, 480))
    assert meta["format"] == "avi"
    assert meta["duration"] == 10.0  # 40ms * 250 frames
    assert (meta["width"], meta["height"]) == (640, 480)


def test_mkv_metadata():
    meta = codecs.mkv_metadata(make_mkv(12.5, 1_000_000, 1280, 720))
    assert meta["format"] == "matroska"
    assert abs(meta["duration"] - 12.5) < 0.01
    assert (meta["width"], meta["height"]) == (1280, 720)


# -- JPEG baseline decoder ----------------------------------------------------

# 16x16 baseline YCbCr JPEG (CPython test-suite fixture imghdrdata/
# python.jpg, PSF-licensed) — a real camera-toolchain-shaped file:
# two DQTs, four DHTs, 4:4:4 sampling.
_PYTHON_JPG = __import__("base64").b64decode(
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgKCgkI"
    "CQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkLEBAQEBAQ"
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAARCAAQABADASIA"
    "AhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAAAAAAAAAAAQIDBAYF"
    "BwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAECBQMFAAAAAAAAAAAAAAEC"
    "EQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLUlRzzEWPkJWW+ulrsaUVAseUg"
    "slSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks51+MiU/Iaad7UcUo4tILoS4kqcWke"
    "zS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKh"
    "QMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhS"
    "mCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwetf//Z")

_STD_LUM_QT = bytes([16] * 64)  # flat quant table -> exact arithmetic

# canonical "typical" Huffman tables from the JPEG spec (Annex K.3)
_DC_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
_DC_VALS = bytes(range(12))
_AC_BITS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
_AC_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def make_gray_dc_jpeg(dc_level: int) -> bytes:
    """Hand-assembled single-MCU grayscale baseline JPEG whose only
    coefficient is the DC term: decodes to one flat 8x8 block of value
    128 + 2*dc_level (flat qt=16, DCT DC scale 1/8 -> 16*dc/8)."""
    import struct as st

    def seg(marker, payload):
        return bytes([0xFF, marker]) + st.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + _STD_LUM_QT)
    sof = seg(0xC0, st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht = (seg(0xC4, bytes([0x00]) + _DC_BITS + _DC_VALS)
           + seg(0xC4, bytes([0x10]) + _AC_BITS + _AC_VALS))
    sos_hdr = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy: DC category + magnitude bits, then EOB (AC code 0x00)
    bits = ""
    cat = dc_level.bit_length() if dc_level > 0 else 0
    # DC table: category c encoded per _DC_BITS canonical assignment
    dc_codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(_DC_BITS[ln - 1]):
            dc_codes[_DC_VALS[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    ln, c = dc_codes[cat]
    bits += format(c, f"0{ln}b")
    if cat:
        bits += format(dc_level, f"0{cat}b")
    ac_codes = {}
    code = 0
    k = 0
    for ln2 in range(1, 17):
        for _ in range(_AC_BITS[ln2 - 1]):
            ac_codes[_AC_VALS[k]] = (ln2, code)
            code += 1
            k += 1
        code <<= 1
    ln2, c2 = ac_codes[0x00]  # EOB
    bits += format(c2, f"0{ln2}b")
    bits += "1" * (-len(bits) % 8)  # pad with 1s
    entropy = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    entropy = entropy.replace(b"\xff", b"\xff\x00")
    return (b"\xff\xd8" + dqt + sof + dht + sos_hdr + entropy
            + b"\xff\xd9")


def test_jpeg_dc_only_exact():
    """Ground-truth check: flat quant table 16, DC coefficient d ->
    every pixel is exactly 128 + 2*d (IDCT of a DC-only block)."""
    for d in (0, 5, 17):
        w, h, rows = codecs.jpeg_decode(make_gray_dc_jpeg(d))
        assert (w, h) == (8, 8)
        expect = 128 + 2 * d
        for r in rows:
            assert set(r) == {expect}, (d, set(r))


def test_jpeg_real_fixture_decodes():
    w, h, rows = codecs.jpeg_decode(_PYTHON_JPG)
    assert (w, h) == (16, 16)
    assert len(rows) == 16 and all(len(r) == 48 for r in rows)
    # real image content: not a constant field
    assert len({bytes(r) for r in rows}) > 1


def test_jpeg_thumbnail_path():
    """thumbnail_png now covers JPEG without Pillow (the previously
    documented gap, UnstructuredData.scala:195-202 parity)."""
    thumb = codecs.thumbnail_png(_PYTHON_JPG, 8, 8)
    assert thumb is not None and thumb[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, rows = codecs.png_decode(thumb)
    assert (w, h) == (8, 8)


def test_jpeg_mislabeled_progressive_rejected():
    """A baseline stream whose SOF marker was flipped to SOF2 must
    raise (its single scan has Ss=0/Se=63 — illegal in progressive),
    not silently mis-decode."""
    bad = _PYTHON_JPG.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(Exception):
        codecs.jpeg_decode(bad)


# ---------------------------------------------------------------------------
# progressive JPEG — exact conformance via a hand-built encoder
# ---------------------------------------------------------------------------
#
# The test encoder writes the SAME quantized coefficients as (a) one
# baseline JPEG and (b) a 6-scan progressive JPEG (DC first Al=1 -> AC
# band first scans Al=1 -> DC/AC refinement scans Al=0, the T.81 Annex G
# successive-approximation progression). Decoding both must give
# pixel-identical output — an exact spec-level cross-check of the
# progressive scan logic against the long-trusted baseline decoder.

class _BW:
    """MSB-first bit writer with 0xFF byte stuffing (entropy coding)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v, k):
        for i in range(k - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # pad with 1s
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _flat_huff(symbols):
    """Canonical table with every symbol at one code length: returns
    (counts16, values, {symbol: (code, length)})."""
    ln = max(2, (len(symbols) + 1).bit_length())  # leave all-1s unused
    counts = [0] * 16
    counts[ln - 1] = len(symbols)
    enc = {s: (i, ln) for i, s in enumerate(symbols)}
    return bytes(counts), bytes(symbols), enc


def _extend_bits(v):
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _jpeg_file(w, h, ncomp, sof, dqt_vals, dht_list, scans):
    """Assemble SOI + DQT + SOF + (DHT + SOS + entropy)* + EOI."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(dqt_vals))
    sof_payload = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof_payload += bytes([cid, 0x11, 0])
    out += _seg(sof, sof_payload)
    for counts, values, tc_th in dht_list:
        out += _seg(0xC4, bytes([tc_th]) + counts + values)
    for comp_specs, ss, se, ah, al, entropy in scans:
        payload = bytes([len(comp_specs)])
        for cid, dc_t, ac_t in comp_specs:
            payload += bytes([cid, (dc_t << 4) | ac_t])
        payload += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, payload) + entropy
    out += b"\xff\xd9"
    return bytes(out)


def _enc_dc_first(bw, enc_dc, blocks_dc, al):
    pred = 0
    for dc in blocks_dc:
        v = dc >> al                      # DC point transform: arithmetic
        diff = v - pred
        pred = v
        s, extra = _extend_bits(diff) if diff else (0, 0)
        code, ln = enc_dc[s]
        bw.bits(code, ln)
        if s:
            bw.bits(extra, s)


def _enc_dc_refine(bw, blocks_dc, al):
    for dc in blocks_dc:
        bw.bits((dc >> al) & 1, 1)


def _pt_ac(v, al):
    """AC point transform: magnitude shift (toward zero), T.81 G.1.2.2."""
    return -((-v) >> al) if v < 0 else v >> al


def _enc_ac_first(bw, enc_ac, block, ss, se, al):
    run = 0
    for k in range(ss, se + 1):
        t = _pt_ac(block[k], al)
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac[0xF0]
            bw.bits(code, ln)
            run -= 16
        s, extra = _extend_bits(t)
        code, ln = enc_ac[(run << 4) | s]
        bw.bits(code, ln)
        bw.bits(extra, s)
        run = 0
    if run:
        code, ln = enc_ac[0x00]           # EOB (EOBRUN = 1)
        bw.bits(code, ln)


def _enc_ac_refine(bw, enc_ac, block, ss, se, al):
    run = 0
    pending = []
    for k in range(ss, se + 1):
        t = abs(block[k]) >> al
        if t == 0:
            run += 1
            continue
        if (t >> 1) != 0:                 # history-nonzero: correction bit
            pending.append(t & 1)
            continue
        while run > 15:                   # newly nonzero (t == 1)
            code, ln = enc_ac[0xF0]
            bw.bits(code, ln)
            for b in pending:
                bw.bits(b, 1)
            pending = []
            run -= 16
        code, ln = enc_ac[(run << 4) | 1]
        bw.bits(code, ln)
        bw.bits(1 if block[k] > 0 else 0, 1)
        for b in pending:
            bw.bits(b, 1)
        pending = []
        run = 0
    if run or pending:
        code, ln = enc_ac[0x00]
        bw.bits(code, ln)
        for b in pending:
            bw.bits(b, 1)


# two 8x8 blocks of quantized coefficients (zigzag order): a mix of
# values visible at Al=1, values that only appear at the Al=0
# refinement (|v| == 1), sign changes, a long zero run, and a tail EOB
_BLK0 = [7, -5, 3, 0, 0, 1, -1, 0, 2] + [0] * 13 + [-3] + [0] * 41
_BLK1 = [-4, 0, 0, 1, 6, 0, -1] + [0] * 50 + [2] + [0] * 6
assert len(_BLK0) == 64 and len(_BLK1) == 64


def _build_pair():
    dc_counts, dc_values, enc_dc = _flat_huff(list(range(12)))
    ac_syms = sorted({0x00, 0xF0} |
                     {(r << 4) | s for r in range(16) for s in (1, 2, 3)})
    ac_counts, ac_values, enc_ac = _flat_huff(ac_syms)
    dht = [(dc_counts, dc_values, 0x00), (ac_counts, ac_values, 0x10)]
    blocks = [_BLK0, _BLK1]
    dqt = [4] * 64

    # baseline: one scan, DC+AC per block
    bw = _BW()
    pred = 0
    for blk in blocks:
        diff = blk[0] - pred
        pred = blk[0]
        s, extra = _extend_bits(diff) if diff else (0, 0)
        code, ln = enc_dc[s]
        bw.bits(code, ln)
        if s:
            bw.bits(extra, s)
        _enc_ac_first(bw, enc_ac, blk, 1, 63, 0)
    baseline = _jpeg_file(16, 8, 1, 0xC0, dqt, dht,
                          [([(1, 0, 0)], 0, 63, 0, 0, bw.flush())])

    # progressive: 6 scans (spectral selection + successive approx)
    scans = []
    bw = _BW()
    _enc_dc_first(bw, enc_dc, [b[0] for b in blocks], 1)
    scans.append(([(1, 0, 0)], 0, 0, 0, 1, bw.flush()))
    for lo, hi in ((1, 5), (6, 63)):
        bw = _BW()
        for blk in blocks:
            _enc_ac_first(bw, enc_ac, blk, lo, hi, 1)
        scans.append(([(1, 0, 0)], lo, hi, 0, 1, bw.flush()))
    bw = _BW()
    _enc_dc_refine(bw, [b[0] for b in blocks], 0)
    scans.append(([(1, 0, 0)], 0, 0, 1, 0, bw.flush()))
    for lo, hi in ((1, 5), (6, 63)):
        bw = _BW()
        for blk in blocks:
            _enc_ac_refine(bw, enc_ac, blk, lo, hi, 0)
        scans.append(([(1, 0, 0)], lo, hi, 1, 0, bw.flush()))
    progressive = _jpeg_file(16, 8, 1, 0xC2, dqt, dht, scans)
    return baseline, progressive


def test_jpeg_progressive_matches_baseline_exactly():
    """Same quantized coefficients through the baseline scan vs the
    6-scan successive-approximation progression -> identical pixels."""
    baseline, progressive = _build_pair()
    wb, hb, rows_b = codecs.jpeg_decode(baseline)
    wp, hp, rows_p = codecs.jpeg_decode(progressive)
    assert (wb, hb) == (wp, hp) == (16, 8)
    assert rows_b == rows_p
    # and the image is non-trivial (coefficients actually landed)
    assert len({bytes(r) for r in rows_b}) > 1


def test_jpeg_progressive_real_file():
    """A real-world libjpeg-progression file (from the local Rust doc
    tree) decodes fully and looks like a natural image: high
    neighboring-pixel correlation, which garbage decodes do not have."""
    import glob

    import numpy as np
    hits = glob.glob("/root/.rustup/toolchains/*/share/doc/rust/html/"
                     "embedded-book/assets/f3.jpg")
    if not hits:
        pytest.skip("no real progressive JPEG available on this image")
    data = open(hits[0], "rb").read()
    w, h, rows = codecs.jpeg_decode(data)
    assert (w, h) == (720, 477) and len(rows) == h
    arr = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w, 3)
    a = arr[:, :-1, 0].astype(float).ravel()
    b = arr[:, 1:, 0].astype(float).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.85
