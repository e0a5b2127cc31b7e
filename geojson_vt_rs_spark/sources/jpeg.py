"""Minimal pure-numpy baseline JPEG (JFIF) codec — RGB8, 4:4:4.

The container has no image libraries, so (like sources/png.py) the codec
is implemented directly: ITU-T T.81 baseline sequential DCT with the
Annex K quantization + Huffman tables, no chroma subsampling (1x1x1 —
valid baseline, simplest MCU layout), deterministic float64 math.  The
encoder emits standard JFIF that any external decoder can read; the
decoder parses DQT/SOF0/DHT/SOS from the stream (it is a real, if
minimal, baseline decoder — not a private round-tripper), restricted to
what baseline allows: 8-bit, Huffman, no progressive, no restart
markers.

Quality default 98 keeps the synthetic-table roundtrip PSNR above the
40 dB gate (tests/test_graft.py) on the gradient+NOISE pixels (the
per-pixel +-16 noise is the hard part: q=92 -> 32 dB, q=98 -> 44 dB;
a smooth gradient reaches 52 dB already at q=92).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------- Annex K tables

_QL = np.array(  # K.1 luminance
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

_QC = np.array(  # K.2 chrominance
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# zigzag index of each natural position (K.3 order)
_ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)

# Annex K Huffman specs: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
         [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
          0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
          0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
          0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
          0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
          0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
          0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
          0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
          0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
          0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
          0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
          0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
          0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
          0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
          0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
         [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
          0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
          0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
          0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
          0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
          0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
          0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
          0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
          0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
          0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
          0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
          0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
          0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
          0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
          0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _huff_codes(bits, values):
    """Canonical (symbol -> (code, length)) per T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# orthonormal 8x8 DCT-II matrix; JPEG's FDCT/IDCT pair = T @ B @ T.T
_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_tables(quality: int):
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_QL * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


class _BitWriter:
    """Collects (value, nbits) tokens; ONE vectorized numpy pass packs
    them to the stuffed byte stream at the end (a per-bit Python loop
    was ~half the 4 ms/image encode cost)."""

    def __init__(self):
        self.vals: list = []
        self.lens: list = []

    def write(self, code: int, length: int):
        self.vals.append(code & ((1 << length) - 1))
        self.lens.append(length)

    def tobytes(self) -> bytes:
        if not self.vals:
            return b""
        vals = np.asarray(self.vals, dtype=np.uint32)
        lens = np.asarray(self.lens, dtype=np.int64)
        maxw = 32
        # (n, 32) bit matrix, big-endian within each token
        bits = ((vals[:, None] >> np.arange(maxw - 1, -1, -1)) & 1).astype(
            np.uint8
        )
        # select the last `len` bits of each token, in order
        keep = np.arange(maxw) >= (maxw - lens)[:, None]
        flat = bits[keep]  # row-major: token order preserved
        pad = (-len(flat)) % 8
        if pad:
            flat = np.concatenate([flat, np.ones(pad, np.uint8)])  # F.1.2.3
        raw = np.packbits(flat)
        # byte-stuff 0xFF -> 0xFF 0x00
        ff = np.nonzero(raw == 0xFF)[0]
        if len(ff):
            raw = np.insert(raw, ff + 1, 0)
        return raw.tobytes()


def _magnitude(v: int):
    """(category, low-order bits) encoding of a DC diff / AC value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_block(bw, block_q, prev_dc, dc_tab, ac_tab):
    zz = block_q[_ZIGZAG]
    dc = int(zz[0])
    cat, bits = _magnitude(dc - prev_dc)
    code, ln = dc_tab[cat]
    bw.write(code, ln)
    if cat:
        bw.write(bits, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg(rgb: np.ndarray, quality: int = 98) -> bytes:
    """RGB8 (h, w, 3) -> baseline JFIF bytes (4:4:4, Annex K Huffman)."""
    h, w = rgb.shape[:2]
    ql, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(rgb) - 128.0
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1 : h, :]  # edge replication
    padded[:, w:] = padded[:, w - 1 : w]

    dc_l, dc_c = _huff_codes(*_DC_L), _huff_codes(*_DC_C)
    ac_l, ac_c = _huff_codes(*_AC_L), _huff_codes(*_AC_C)
    qtabs = (ql, qc, qc)
    dctabs = (dc_l, dc_c, dc_c)
    actabs = (ac_l, ac_c, ac_c)

    # batch FDCT + quantize over every block in three numpy passes
    nby, nbx = ph // 8, pw // 8
    blocks = (
        padded.reshape(nby, 8, nbx, 8, 3)
        .transpose(0, 2, 4, 1, 3)
        .reshape(-1, 8, 8)  # (by, bx, c) order — the MCU scan order
    )
    coefs = np.einsum("ij,njk,kl->nil", _T, blocks, _T.T).reshape(-1, 64)
    qmat = np.vstack([qtabs[c] for c in range(3)])  # (3, 64)
    qall = np.round(
        coefs / np.tile(qmat, (nby * nbx, 1))
    ).astype(np.int64)

    bw = _BitWriter()
    prev = [0, 0, 0]
    bi = 0
    for _by in range(nby):
        for _bx in range(nbx):
            for c in range(3):
                prev[c] = _encode_block(
                    bw, qall[bi], prev[c], dctabs[c], actabs[c]
                )
                bi += 1
    entropy = bw.tobytes()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql[_ZIGZAG].tolist()))
    out += seg(0xDB, bytes([1]) + bytes(qc[_ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling (4:4:4)
    out += seg(0xC0, sof)
    for tc_th, (bits, vals) in (
        (0x00, _DC_L), (0x01, _DC_C), (0x10, _AC_L), (0x11, _AC_C)
    ):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([3])
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tabs])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _destuff(data: bytes) -> bytes:
    """Entropy segment up to the first real marker, 0xFF00 stuffing
    removed — one numpy pass (the per-byte Python loop was the original
    dominant decode cost)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    ff = np.nonzero(arr[:-1] == 0xFF)[0]
    stuffed = ff[arr[ff + 1] == 0x00] + 1  # the 0x00 bytes to drop
    markers = ff[arr[ff + 1] != 0x00]
    end = int(markers.min()) if len(markers) else len(arr)
    keep = np.ones(end, dtype=bool)
    keep[stuffed[stuffed < end]] = False
    return arr[:end][keep].tobytes()


_DEC_TABLE_CACHE: dict = {}


def _prefix_table(bits, values):
    """Canonical Huffman -> 16-bit-prefix lookup packed as ONE Python
    list of (codelen << 8 | symbol) ints — a single list index + two
    shifts per symbol in the scan loop (np arrays cost a scalar-boxing
    conversion per lookup).  codelen 0 marks an invalid prefix.  Cached
    per table spec (the Annex K tables recur across every image)."""
    key = (tuple(bits), tuple(values))
    t = _DEC_TABLE_CACHE.get(key)
    if t is None:
        packed = np.zeros(1 << 16, dtype=np.int32)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                base = code << (16 - length)
                span = 1 << (16 - length)
                packed[base : base + span] = (length << 8) | values[k]
                code += 1
                k += 1
            code <<= 1
        t = packed.tolist()
        _DEC_TABLE_CACHE[key] = t
    return t


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> RGB8 (h, w, 3).  Supports what baseline
    requires for this codec's streams: 8-bit, Huffman, 1x1 sampling,
    up to 4 quant + 4/4 Huffman tables, no progressive/restart."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    try:
        return _decode_jpeg_body(data)
    except (IndexError, KeyError, struct.error) as e:
        # KeyError = scan references a quant/Huffman table id the corrupt
        # stream never defined
        raise ValueError("invalid JPEG: truncated stream") from e


def _decode_jpeg_body(data: bytes) -> np.ndarray:
    pos = 2
    qt = {}
    hts = {}
    h = w = 0
    comps = []
    scan = None
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError("bad marker sync")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq_tq = seg[i]
                tq = pq_tq & 0x0F
                tab = np.frombuffer(
                    seg[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int32)
                nat = np.zeros(64, np.int32)
                nat[_ZIGZAG] = tab  # stored in zigzag order
                qt[tq] = nat
                i += 65
        elif marker == 0xC0:
            h, w = struct.unpack(">HH", seg[1:5])
            n = seg[5]
            comps = [
                (seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i])
                for i in range(n)
            ]
            if any(samp != 0x11 for _, samp, _ in comps):
                raise NotImplementedError("only 4:4:4 (1x1) supported")
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline SOF0 supported")
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc_th = seg[i]
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                hts[tc_th] = _prefix_table(bits, vals)
                i += 17 + nvals
        elif marker == 0xDA:
            ns = seg[0]
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i]) for i in range(ns)]
            break
    if scan is None or not comps:
        raise ValueError("invalid JPEG: missing SOF/SOS")

    # Scan loop: everything lives in LOCAL ints — a 64-bit-word refilled
    # accumulator and ONE 32-bit peek per symbol that decodes the Huffman
    # code and its magnitude bits together (codelen <= 16 plus cat <= 11
    # -> <= 27 bits).  The former peek16/consume/get method calls cost 3
    # Python calls per symbol and dominated decode (~2.7 ms/image on the
    # 32x32 bench shapes; this loop runs ~1 ms).
    stream = _destuff(data[pos:])
    padlen = (-len(stream)) % 8 + 8  # zero tail == the old past-end reads
    words = np.frombuffer(stream + b"\x00" * padlen, dtype=">u8").tolist()
    nwords = len(words)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    nby, nbx = ph // 8, pw // 8
    dctabs = {cid: hts[tabs >> 4] for cid, tabs in scan}
    actabs = {cid: hts[0x10 | (tabs & 0x0F)] for cid, tabs in scan}
    qtabs = {cid: qt[tq] for cid, _, tq in comps}
    prev = {cid: 0 for cid, _, _ in comps}
    n_blocks = nby * nbx * len(comps)
    scan_tabs = [(cid, dctabs[cid], actabs[cid]) for cid, _, _ in comps]
    # nonzero coefficients batch into ONE fancy-index store per image
    idxs: list = []
    vals: list = []
    iap = idxs.append
    vap = vals.append
    acc = 0
    nbits = 0
    wi = 0
    base = 0
    for _mcu in range(nby * nbx):
        for cid, dtab, atab in scan_tabs:
            if nbits < 32:
                acc = ((acc & ((1 << nbits) - 1)) << 64) | (
                    words[wi] if wi < nwords else 0
                )
                wi += 1
                nbits += 64
            p32 = (acc >> (nbits - 32)) & 0xFFFFFFFF
            e = dtab[p32 >> 16]
            length = e >> 8
            cat = e & 0xFF
            # length 0 = invalid prefix; cat > 16 only from a corrupt DHT
            # (baseline DC categories stop at 11) and would turn the
            # single-peek shift negative
            if length == 0 or length + cat > 32:
                raise ValueError("invalid JPEG: bad Huffman code")
            bits_ = (p32 >> (32 - length - cat)) & ((1 << cat) - 1)
            nbits -= length + cat
            if cat and bits_ < (1 << (cat - 1)):
                bits_ -= (1 << cat) - 1
            dc = prev[cid] + bits_
            prev[cid] = dc
            if dc:
                iap(base)
                vap(dc)
            k = 1
            while k < 64:
                if nbits < 32:
                    acc = ((acc & ((1 << nbits) - 1)) << 64) | (
                        words[wi] if wi < nwords else 0
                    )
                    wi += 1
                    nbits += 64
                p32 = (acc >> (nbits - 32)) & 0xFFFFFFFF
                e = atab[p32 >> 16]
                length = e >> 8
                if length == 0:
                    raise ValueError("invalid JPEG: bad Huffman code")
                rs = e & 0xFF
                s = rs & 0x0F
                if s == 0:
                    nbits -= length
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                bits_ = (p32 >> (32 - length - s)) & ((1 << s) - 1)
                nbits -= length + s
                k += rs >> 4
                if k > 63:  # corrupt run length (old path: IndexError)
                    raise ValueError("invalid JPEG: truncated stream")
                if bits_ < (1 << (s - 1)):
                    bits_ -= (1 << s) - 1
                iap(base + k)
                vap(bits_)
                k += 1
            base += 64
    all_zz = np.zeros((n_blocks, 64), dtype=np.int64)
    if idxs:
        all_zz.ravel()[idxs] = vals
    qrows = np.tile(
        np.stack([qtabs[cid] for cid, _, _ in comps]).astype(np.int64),
        (nby * nbx, 1),
    )
    # dezigzag + dequantize + IDCT for ALL blocks in three numpy passes
    nat = np.zeros((n_blocks, 64), dtype=np.int64)
    nat[:, _ZIGZAG] = all_zz
    coef = (nat * qrows).reshape(n_blocks, 8, 8).astype(np.float64)
    blocks = np.einsum("ij,njk,kl->nil", _T.T, coef, _T)
    planes = (
        blocks.reshape(nby, nbx, len(comps), 8, 8)
        .transpose(2, 0, 3, 1, 4)
        .reshape(len(comps), ph, pw)
    )
    ycc = planes.transpose(1, 2, 0)[:h, :w] + 128.0
    return _ycbcr_to_rgb(ycc)
