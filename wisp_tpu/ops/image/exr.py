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
    planes = {n: np.ascontiguousarray(np.asarray(channels[n], dtype=np.float32)
                                      .reshape(h, w).astype(dtype)) for n in names}

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

    with open(path, "wb") as fh:
        fh.write(preamble)
        for y in range(h):  # scanline offset table
            fh.write(struct.pack("<Q", data_start + y * block_size))
        for y in range(h):
            fh.write(struct.pack("<ii", y, line_data_size))
            for n in names:
                fh.write(planes[n][y].tobytes())


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

    pos += 8 * h  # skip scanline offset table
    out = {n: np.empty((h, w), np.float32) for n, _ in channels}
    for _ in range(h):
        y, size = struct.unpack_from("<ii", buf, pos)
        pos += 8
        for cname, ptype in channels:  # channels stored alphabetically per scanline
            if ptype == _PIXEL_HALF:
                row = np.frombuffer(buf, np.float16, w, pos).astype(np.float32)
                pos += 2 * w
            elif ptype == _PIXEL_FLOAT:
                row = np.frombuffer(buf, np.float32, w, pos)
                pos += 4 * w
            else:  # uint32
                row = np.frombuffer(buf, np.uint32, w, pos).astype(np.float32)
                pos += 4 * w
            out[cname][y - y0] = row
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
