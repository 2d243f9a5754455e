"""Binary media kernels: header-level metadata without decoder libraries.

Images/audio/video travel as opaque ``binary`` columns with typed metadata
(the multimodal-column model for training-data pipelines). What can be done
without PIL/ffmpeg (absent in-sandbox) is done for real — container sniff
and dimension extraction from JPEG SOF / PNG IHDR headers; pixel-level
decode is stubbed behind :class:`MediaDecodeUnavailable` with the Spark-side
plumbing (schemas, batching, partitioning) fully real and tested.
"""

from __future__ import annotations


class MediaDecodeUnavailable(NotImplementedError):
    """Raised by pixel/sample-level ops: no image/audio codec libraries are
    available in this environment. The surrounding Spark plumbing (schema,
    Arrow batching, partitioning) is real; swap in PIL/torchvision/ffmpeg
    here for production."""


def jpeg_dimensions(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOF0-SOF3 frame header, else None."""
    if not data.startswith(b"\xff\xd8"):
        return None
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if 0xC0 <= marker <= 0xC3:
            if i + 9 <= n:
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return w, h
            return None
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        i += 2 + seg_len
    return None


def png_dimensions(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the IHDR chunk, else None."""
    if not data.startswith(b"\x89PNG\r\n\x1a\n") or len(data) < 24:
        return None
    if data[12:16] != b"IHDR":
        return None
    w = int.from_bytes(data[16:20], "big")
    h = int.from_bytes(data[20:24], "big")
    return w, h


def image_metadata(data: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) — None format when not an image payload."""
    if not data:
        return None, None, None
    if data.startswith(b"\xff\xd8"):
        dims = jpeg_dimensions(data)
        return "jpeg", dims[0] if dims else None, dims[1] if dims else None
    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        dims = png_dimensions(data)
        return "png", dims[0] if dims else None, dims[1] if dims else None
    return None, None, None


def image_comment_text(data: bytes) -> str:
    """Extract embedded textual payload from image headers: the JPEG COM
    segment or the PNG ``tEXt`` chunk with keyword ``Description`` —
    real container formats, parsed by the segment/chunk walk (no codec).

    This is the in-sandbox stand-in for pixel-level OCR (the reference's
    Tesseract/TrOCR path): corpus fixtures carry their golden text in the
    comment chunk, so the routing, byte-identity goldens, and batching
    plumbing are exercised end-to-end; production swaps this kernel for a
    real OCR engine over :func:`decode_image` with everything else
    unchanged. Returns '' when no comment text is present.
    """
    if data.startswith(b"\xff\xd8"):
        i = 2
        n = len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFE:  # COM
                seg_len = int.from_bytes(data[i + 2:i + 4], "big")
                return data[i + 4:i + 2 + seg_len].decode(
                    "utf-8", errors="replace"
                )
            if marker in (0xD9, 0xDA):  # EOI / SOS: stop before entropy data
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(data[i + 2:i + 4], "big")
            i += 2 + seg_len
        return ""
    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        pos = 8
        n = len(data)
        while pos + 8 <= n:
            ln = int.from_bytes(data[pos:pos + 4], "big")
            typ = data[pos + 4:pos + 8]
            if typ == b"tEXt":
                body = data[pos + 8:pos + 8 + ln]
                kw, _, val = body.partition(b"\x00")
                if kw == b"Description":
                    return val.decode("utf-8", errors="replace")
            pos += 12 + ln  # len + type + body + crc
        return ""
    return ""


def wav_metadata(data: bytes) -> tuple[int, int, float] | None:
    """(channels, sample_rate, duration_secs) from a RIFF/WAVE header —
    walks the chunk list for ``fmt `` and ``data`` (pure byte math)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    channels = rate = block_align = None
    data_size = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not (channels and rate and block_align):
        return None
    duration = (
        round(data_size / (rate * block_align), 4)
        if data_size is not None else 0.0
    )
    return channels, rate, duration


def _mvhd_walk(data: bytes) -> tuple[int, int] | None:
    """Raw (timescale, duration_ticks) from the ``mvhd`` box inside
    ``moov`` — None when not ISO-BMFF at all, (0, 0) when it is but no
    readable timing exists (missing/malformed mvhd). Shared by
    :func:`mp4_metadata` (float seconds) and :func:`mp4_timing` (integer
    ticks for frame planning)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    pos = 0
    while pos + 8 <= len(data):
        size = int.from_bytes(data[pos:pos + 4], "big")
        if size < 8:
            break
        if data[pos + 4:pos + 8] == b"moov":
            # Walk moov's CHILD boxes by size headers (a raw find(b"mvhd")
            # can match the 4-byte sequence inside unrelated nested box
            # data — udta strings, codec blobs — and read garbage).
            moov = data[pos + 8:pos + size]
            j = 0
            while j + 8 <= len(moov):
                bsize = int.from_bytes(moov[j:j + 4], "big")
                if bsize < 8:
                    break
                if moov[j + 4:j + 8] == b"mvhd":
                    body = moov[j + 8:j + bsize]
                    # v0: ver/flags(4) ctime(4) mtime(4) ts(4) dur(4)
                    # v1: ver/flags(4) ctime(8) mtime(8) ts(4) dur(8)
                    if body and body[0] == 1 and len(body) >= 32:
                        return (int.from_bytes(body[20:24], "big"),
                                int.from_bytes(body[24:32], "big"))
                    if body and body[0] == 0 and len(body) >= 20:
                        return (int.from_bytes(body[12:16], "big"),
                                int.from_bytes(body[16:20], "big"))
                    return (0, 0)
                j += bsize
            return (0, 0)
        pos += size
    return (0, 0)


def mp4_metadata(data: bytes) -> tuple[str, float] | None:
    """(brand, duration_secs) from an ISO-BMFF header — reads the ``ftyp``
    major brand and the ``mvhd`` timescale/duration inside ``moov``
    (top-level box walk + one nested scan; no codec work)."""
    timing = _mvhd_walk(data)
    if timing is None:
        return None
    brand = data[8:12].decode("ascii", errors="replace").strip()
    timescale, duration = timing
    if timescale:
        return brand, round(duration / timescale, 4)
    return brand, 0.0


def mp4_timing(data: bytes | None) -> tuple[int, int] | None:
    """(timescale, duration_ticks) — the INTEGER-exact raw form of
    :func:`mp4_metadata`'s duration, for frame planning (tick arithmetic
    stays engine-portable; a float-seconds round trip would not). None
    when the payload is not ISO-BMFF or carries no readable mvhd."""
    if not data:
        return None
    timing = _mvhd_walk(data)
    if timing is None or timing[0] == 0:
        return None
    return timing


def build_wav(channels: int = 2, rate: int = 44100, seconds: int = 2) -> bytes:
    """Header-only RIFF/WAVE fixture (16-bit PCM, no sample body): the
    ``data`` chunk declares ``rate * block_align * seconds`` bytes so
    :func:`wav_metadata` reads back exactly (channels, rate, seconds).
    Deterministic — used by corpus-style media fixtures and tests."""
    block_align = channels * 2
    data_size = rate * block_align * seconds
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    data = b"data" + data_size.to_bytes(4, "little")
    riff_size = 4 + len(fmt) + len(data) + data_size
    return b"RIFF" + riff_size.to_bytes(4, "little") + b"WAVE" + fmt + data


def build_mp4(timescale: int = 600, duration: int = 1500,
              brand: bytes = b"isom") -> bytes:
    """Header-only ISO-BMFF fixture (``ftyp`` + ``moov`` containing a
    well-formed ``mvhd`` v0 child box with its own size header):
    :func:`mp4_metadata` reads back (brand, duration / timescale)."""
    body = b"ftyp" + brand + (0).to_bytes(4, "big") + brand + b"iso2"
    ftyp = (4 + len(body)).to_bytes(4, "big") + body
    mvhd_body = (
        bytes([0]) + b"\x00\x00\x00"                 # version 0 + flags
        + (0).to_bytes(4, "big") * 2                 # ctime, mtime
        + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
    )
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    return ftyp + moov


def decode_image(data: bytes):  # pragma: no cover - by design
    """Decode to a pixel array. STUB: no codec library in-sandbox."""
    raise MediaDecodeUnavailable(
        "image decode requires PIL/opencv; not available in this environment"
    )


def resize_image(data: bytes, width: int, height: int):  # pragma: no cover
    """Resize an image payload. STUB: no codec library in-sandbox — the
    distributed resize plumbing (header parse, integer fit plan, Arrow
    batching, schema) is REAL in ``operators.media.resize_images_stage``;
    production wraps PIL/cv2 and registers it via
    ``operators.media.register_media_kernel('resize_pixels', fn)``."""
    raise MediaDecodeUnavailable(
        "image resize requires PIL/opencv; not available in this environment"
    )


def sample_frames(data: bytes, every_n: int = 30):  # pragma: no cover
    """Sample frames from a video payload. STUB: no ffmpeg in-sandbox —
    the distributed plumbing (mvhd timing parse, engine-side tick plan,
    post-explode Arrow batching) is REAL in
    ``operators.media.sample_frames_stage``; production registers an
    ffmpeg-backed grab via
    ``operators.media.register_media_kernel('frame_pixels', fn)``."""
    raise MediaDecodeUnavailable(
        "video frame sampling requires ffmpeg; not available in this environment"
    )
