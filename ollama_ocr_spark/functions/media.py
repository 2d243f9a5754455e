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


def decode_image(data: bytes):  # pragma: no cover - by design
    """Decode to a pixel array. STUB: no codec library in-sandbox."""
    raise MediaDecodeUnavailable(
        "image decode requires PIL/opencv; not available in this environment"
    )


def sample_frames(data: bytes, every_n: int = 30):  # pragma: no cover
    """Sample frames from a video payload. STUB: no ffmpeg in-sandbox."""
    raise MediaDecodeUnavailable(
        "video frame sampling requires ffmpeg; not available in this environment"
    )
