"""Pure-stdlib media codecs for the multimodal column plumbing.

Round 4 widens the honest-decode surface beyond PNG
(operators/multimodal.py): GIF87a/89a with a full LZW coder, BMP
(24-bit uncompressed), WAV PCM via a manual RIFF chunk walk, and a
JPEG marker-walk header parser (dimensions only — pixel decode needs
libjpeg, absent in this sandbox, and stays honestly stubbed).

Everything here is executor-side pure Python (no Spark imports),
derived from the public format specifications (GIF89a spec, BMP
BITMAPINFOHEADER layout, RIFF/WAVE, ITU T.81 marker structure).  The
encoders exist so the deterministic fixture generator can build blobs
whose ground truth is stored alongside them; the decoders are the
operators under test and must reproduce that ground truth from the
bytes alone (see operators/multimodal.py media_metadata).

The reference crate (/root/reference) stops at HTML tokenization and
has no media surface; this module implements the training-data-pipeline
requirement (multimodal columns with real, value-oracled decode where
the sandbox allows).
"""

from __future__ import annotations

import io
import struct
import wave

# --------------------------------------------------------------- GIF LZW
#
# Variable-width LSB-first codes, CLEAR = 1<<min_code, EOI = CLEAR+1.
# Width starts at min_code+1 and grows when the next free slot would not
# fit; the decoder grows one code EARLY (next == (1<<width)-1) because
# its table construction lags the encoder by exactly one code.  At 4096
# entries the encoder emits CLEAR and resets (the decoder follows).


def _lzw_encode(data: bytes, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    width = min_code + 1
    emit(clear, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if nxt < 4096:
            table[wc] = nxt
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code + 1
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code + 1
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated stream: best-effort (EOI lost)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) == (1 << width) - 1 and width < 12:
            # decoder grows one code early: its table lags the encoder's
            # by one entry (the encoder has already assigned 1<<width)
            width += 1
        prev = entry
    # unreachable


# ------------------------------------------------------------------ GIF


def _gif_palette() -> bytes:
    """Deterministic 256-entry global color table."""
    pal = bytearray()
    for i in range(256):
        pal += bytes(((i * 3) & 0xFF, (i * 7) & 0xFF, (255 - i) & 0xFF))
    return bytes(pal)


def encode_gif(frames: list[bytes], width: int, height: int) -> bytes:
    """GIF89a encoder: 8-bit palette indices, global color table, one
    image descriptor per frame, real LZW sub-block data."""
    assert frames and all(len(f) == width * height for f in frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0xF7)  # GCT present, 8-bit resolution, 256 entries
    out.append(0)  # background color index
    out.append(0)  # pixel aspect ratio
    out += _gif_palette()
    for frame in frames:
        out.append(0x2C)  # image descriptor
        out += struct.pack("<HHHH", 0, 0, width, height)
        out.append(0)  # no local color table
        out.append(8)  # LZW min code size
        lzw = _lzw_encode(frame, 8)
        for off in range(0, len(lzw), 255):
            block = lzw[off : off + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    """GIF decode → (width, height, n_frames, concatenated index bytes).

    Supports the common still/animation profile: global color table,
    no interlace, 8-bit codes; skips extensions (GCE, comments, app
    blocks) by their sub-block structure, as the spec requires.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    width, height = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))
    frames = []
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < n and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _, _, fw, fh = struct.unpack_from("<HHHH", payload, pos)
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < n and payload[pos]:
                size = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1
            idx = _lzw_decode(bytes(lzw), min_code)
            if len(idx) < fw * fh:
                raise ValueError("GIF frame short of pixels")
            frames.append(idx[: fw * fh])
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF with no image data")
    return width, height, len(frames), b"".join(frames)


# ------------------------------------------------------------------ BMP


def encode_bmp(raw_rgb: bytes, width: int, height: int) -> bytes:
    """24-bit uncompressed BMP from top-down RGB bytes (stored
    bottom-up, BGR, rows padded to 4, per the public layout)."""
    assert len(raw_rgb) == width * height * 3
    pad = (-(width * 3)) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):
        row = raw_rgb[y * width * 3 : (y + 1) * width * 3]
        for x in range(width):
            r, g, b = row[x * 3 : x * 3 + 3]
            body += bytes((b, g, r))
        body += bytes(pad)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """BMP decode → (width, height, 3, top-down RGB bytes).  Supports
    the 24-bit uncompressed BITMAPINFOHEADER profile (bottom-up or
    top-down row order)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    planes, bpp, comp = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP profile: bpp={bpp} comp={comp}")
    topdown = height < 0
    height = abs(height)
    pad = (-(width * 3)) % 4
    stride = width * 3 + pad
    out = bytearray(width * height * 3)
    for row_i in range(height):
        y = row_i if topdown else height - 1 - row_i
        src = offset + row_i * stride
        if src + width * 3 > len(payload):
            raise ValueError("truncated BMP pixel data")
        dst = y * width * 3
        for x in range(width):
            b, g, r = payload[src + x * 3 : src + x * 3 + 3]
            out[dst + x * 3 : dst + x * 3 + 3] = bytes((r, g, b))
    return width, height, 3, bytes(out)


# ------------------------------------------------------------------ WAV


def encode_wav(pcm: bytes, channels: int, sample_rate: int) -> bytes:
    """16-bit PCM WAV via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm)
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """Manual RIFF chunk walk → (channels, sample_rate, n_frames,
    PCM bytes).  Only audio_format=1 (integer PCM); unknown chunks are
    skipped by their declared size (word-aligned), per RIFF."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    n = len(payload)
    channels = sample_rate = bits = -1
    pcm = None
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1:
                raise ValueError(f"non-PCM WAV unsupported (format {fmt})")
        elif tag == b"data":
            pcm = body
    if channels < 0 or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    frame_bytes = channels * (bits // 8)
    if frame_bytes <= 0:
        # corrupt fmt chunk (bits<8 or channels=0) must route to the
        # status column, not ZeroDivisionError the task
        raise ValueError(f"corrupt WAV fmt (channels={channels}, bits={bits})")
    return channels, sample_rate, len(pcm) // frame_bytes, pcm


# ----------------------------------------------------------------- JPEG


def encode_jpeg_fixture(width: int, height: int, entropy: bytes) -> bytes:
    """A syntactically valid JFIF byte stream (SOI, APP0, COM, DQT,
    SOF0, SOS + FF-stuffed entropy data, EOI) for header-parse tests.
    The entropy payload is arbitrary deterministic bytes — this encoder
    does NOT produce decodable pixels (that needs a DCT entropy coder;
    the pixel path is the honest stub, see decode_image)."""
    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    com = seg(0xFE, b"fixture")
    dqt = seg(0xDB, b"\x00" + bytes(range(1, 65)))
    sof0 = seg(
        0xC0,
        b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01",
    )
    sos = seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    stuffed = entropy.replace(b"\xff", b"\xff\x00")
    return b"\xff\xd8" + app0 + com + dqt + sof0 + sos + stuffed + b"\xff\xd9"


def jpeg_dimensions(payload: bytes) -> tuple[int, int, int]:
    """Marker-walk header parse → (width, height, n_components).  Walks
    segments by declared length until a SOF0/1/2 frame header (ITU T.81
    B.2.2); pixel decode is not attempted."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers
            continue
        (size,) = struct.unpack_from(">H", payload, pos + 2)
        if marker in (0xC0, 0xC1, 0xC2):
            height, width = struct.unpack_from(">HH", payload, pos + 5)
            ncomp = payload[pos + 9]
            return width, height, ncomp
        if marker == 0xDA:
            break  # entropy-coded data next; no SOF seen
        pos += 2 + size
    raise ValueError("JPEG without SOF frame header")


# -------------------------------------------------------------- sniffing


def sniff_format(payload: bytes) -> str:
    """Magic-byte container detection — the decode dispatch key.  The
    operator sniffs rather than trusting a format column: at corpus
    scale the metadata lies sometimes; the bytes don't."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"


# ---------------------------------------------------------- transforms


def resize_nearest(
    raw: bytes, width: int, height: int, channels: int,
    out_w: int, out_h: int,
) -> bytes:
    """Nearest-neighbor resize over interleaved 8-bit pixels — the
    deterministic, dependency-free thumbnail transform (the resize leg
    of decode → transform → fingerprint).  Source pixel for output
    (x, y) is (x * width // out_w, y * height // out_h)."""
    if len(raw) != width * height * channels:
        # ValueError (not assert): callers route it to the status
        # column, and asserts vanish under python -O
        raise ValueError(
            f"pixel buffer {len(raw)} != {width}x{height}x{channels}"
        )
    out = bytearray(out_w * out_h * channels)
    for y in range(out_h):
        sy = y * height // out_h
        src_row = sy * width * channels
        dst_row = y * out_w * channels
        for x in range(out_w):
            sx = x * width // out_w
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = raw[s : s + channels]
    return bytes(out)


def image_features(raw: bytes, channels: int) -> list:
    """Per-channel integer features: (mean_milli, min, max) — mean in
    thousandths (floor), exact integer arithmetic so any cross-engine
    or cross-run comparison is bit-stable."""
    n = len(raw) // channels
    feats = []
    for c in range(channels):
        vals = raw[c::channels]
        feats.append(
            (sum(vals) * 1000 // max(n, 1), min(vals), max(vals))
        )
    return feats


def audio_energy(pcm: bytes, channels: int) -> int:
    """Sum of squared 16-bit LE samples across all channels — the
    integer loudness feature (RMS without the float sqrt; monotone in
    RMS for fixed frame count, so threshold filters sort identically)."""
    import array

    samples = array.array("h")
    samples.frombytes(pcm[: len(pcm) - (len(pcm) % 2)])
    return sum(int(s) * int(s) for s in samples)
