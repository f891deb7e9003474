"""Self-contained OpenEXR I/O (uncompressed scanline format).

The reference reads/writes EXR via pyexr (wisp/ops/image/io.py:18-42, RTMV loader); neither
pyexr nor an imageio/cv2 EXR backend exists in this environment, so this module implements
the EXR 2.0 container directly for the subset the framework needs: single-part scanline
images, NONE compression, float32/float16 channels. Enough to write RenderBuffer channel
dumps and to read RTMV-style rgb(+depth) files.

Format reference: openexr.com/en/latest/OpenEXRFileLayout.html
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

_MAGIC = 20000630
_VERSION = 2

_PIXEL_HALF = 1
_PIXEL_FLOAT = 2


def _attr(name: str, type_name: str, data: bytes) -> bytes:
    return name.encode() + b"\0" + type_name.encode() + b"\0" + \
        struct.pack("<i", len(data)) + data


def _chlist(channel_names: List[str], pixel_type: int) -> bytes:
    out = b""
    for name in channel_names:  # must be alphabetically sorted
        out += name.encode() + b"\0"
        out += struct.pack("<i", pixel_type)      # pixel type
        out += struct.pack("<BBBB", 0, 0, 0, 0)   # pLinear + reserved
        out += struct.pack("<ii", 1, 1)           # x/y sampling
    return out + b"\0"


def write_exr(path: str, channels: Dict[str, np.ndarray], half: bool = False) -> None:
    """Write named single-plane channels (each [H, W] float) as an uncompressed EXR.

    Multi-channel arrays can be passed pre-split (e.g. {'R':..,'G':..,'B':..}); the rgb
    convenience wrapper lives in wisp_tpu.ops.image.io.write_exr.
    """
    names = sorted(channels.keys())
    first = np.asarray(channels[names[0]])
    h, w = first.shape[:2]
    dtype = np.float16 if half else np.float32
    pixel_type = _PIXEL_HALF if half else _PIXEL_FLOAT
    planes = {n: np.ascontiguousarray(np.asarray(channels[n]).reshape(h, w), dtype=dtype)
              for n in names}

    header = b""
    header += _attr("channels", "chlist", _chlist(names, pixel_type))
    header += _attr("compression", "compression", struct.pack("<B", 0))  # NONE
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", struct.pack("<B", 0))      # increasing y
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    bytes_per_px = 2 if half else 4
    line_data_size = w * bytes_per_px * len(names)
    block_size = 8 + line_data_size  # y + size prefix

    preamble = struct.pack("<ii", _MAGIC, _VERSION) + header
    table_start = len(preamble)
    data_start = table_start + 8 * h

    # vectorized block assembly: per scanline [y:i4][size:i4][ch0 row][ch1 row]...
    offsets = data_start + np.arange(h, dtype=np.uint64) * block_size
    blocks = np.empty((h, block_size), np.uint8)
    blocks[:, 0:4] = np.arange(h, dtype="<i4")[:, None].view(np.uint8)
    blocks[:, 4:8] = np.full((h, 1), line_data_size, "<i4").view(np.uint8)
    row_bytes = w * bytes_per_px
    for ci, n in enumerate(names):
        start = 8 + ci * row_bytes
        blocks[:, start:start + row_bytes] = planes[n].view(np.uint8).reshape(h, row_bytes)
    with open(path, "wb") as fh:
        fh.write(preamble)
        fh.write(offsets.astype("<u8").tobytes())
        fh.write(blocks.tobytes())


def read_exr(path: str) -> Dict[str, np.ndarray]:
    """Read an uncompressed single-part scanline EXR → {channel: [H, W] float32}."""
    with open(path, "rb") as fh:
        buf = fh.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _MAGIC:
        raise ValueError(f"{path} is not an EXR file")
    if version & 0x200:
        raise NotImplementedError("multi-part EXR not supported")

    pos = 8
    channels: List[Tuple[str, int]] = []
    data_window = None
    compression = None
    while True:
        end = buf.index(b"\0", pos)
        name = buf[pos:end].decode()
        pos = end + 1
        if name == "":
            break
        end = buf.index(b"\0", pos)
        type_name = buf[pos:end].decode()
        pos = end + 1
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        data = buf[pos:pos + size]
        pos += size
        if name == "channels":
            cpos = 0
            while data[cpos] != 0:
                cend = data.index(b"\0", cpos)
                cname = data[cpos:cend].decode()
                cpos = cend + 1
                (ptype,) = struct.unpack_from("<i", data, cpos)
                cpos += 16  # type + pLinear/reserved + samplings
                channels.append((cname, ptype))
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", data)
        elif name == "compression":
            compression = data[0]

    if compression != 0:
        raise NotImplementedError(
            f"only NONE-compressed EXR supported (got compression={compression}); "
            f"re-export uncompressed or install an EXR backend")
    x0, y0, x1, y1 = data_window
    w, h = x1 - x0 + 1, y1 - y0 + 1

    # scanline blocks are fixed-size for NONE compression: vectorize via the offset table
    offsets = np.frombuffer(buf, "<u8", h, pos).astype(np.int64)
    ch_bytes = [2 * w if p == _PIXEL_HALF else 4 * w for _, p in channels]
    block_size = 8 + sum(ch_bytes)
    raw = np.frombuffer(buf, np.uint8)
    if np.all(np.diff(offsets) == block_size):  # contiguous increasing-y fast path
        blocks = raw[offsets[0]:offsets[0] + h * block_size].reshape(h, block_size)
    else:  # arbitrary lineOrder / sparse layout
        blocks = raw[offsets[:, None] + np.arange(block_size)]
    ys = blocks[:, 0:4].copy().view("<i4")[:, 0] - y0
    out = {}
    cpos = 8
    for (cname, ptype), nb in zip(channels, ch_bytes):  # channels alphabetical per scanline
        rows = blocks[:, cpos:cpos + nb].copy()
        cpos += nb
        if ptype == _PIXEL_HALF:
            plane = rows.view("<f2").astype(np.float32)
        elif ptype == _PIXEL_FLOAT:
            plane = rows.view("<f4")
        else:  # uint32
            plane = rows.view("<u4").astype(np.float32)
        ordered = np.empty((h, w), np.float32)
        ordered[ys] = plane
        out[cname] = ordered
    return out


def read_exr_rgbd(path: str):
    """Convenience: (rgb [H,W,3], depth [H,W,1] or None) from channel names
    (R/G/B + Z/depth/Y variants — RTMV uses RGBA+depth layouts)."""
    chans = read_exr(path)
    lower = {k.lower(): k for k in chans}

    def pick(*names):
        for n in names:
            if n in lower:
                return chans[lower[n]]
        return None

    r, g, b = pick("r"), pick("g"), pick("b")
    if r is None:
        # single-channel (luminance) fallback
        y = next(iter(chans.values()))
        rgb = np.stack([y] * 3, -1)
    else:
        rgb = np.stack([r, g, b], -1)
    depth = pick("z", "depth", "distance")
    return rgb, None if depth is None else depth[..., None]
