"""Image IO: PNG/PPM writers, simple PNG reader, DDS cubemap loader.

Replaces the reference's WIC/DirectXTex texture loading
(``VR/Renderer/Private/TextureFactory.cpp:29-147``) with dependency-free
codecs: PNG (zlib, filter 0/1/2/3/4 on read, filter 0 on write), binary PPM,
and DDS (uncompressed RGBA8 + DXT1/BC1, the formats the reference's skybox
pipeline produces).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def write_png(path: str, img: np.ndarray) -> None:
    """img: [H,W,3|4] uint8 or float in [0,1]."""
    if img.dtype != np.uint8:
        img = (np.clip(np.nan_to_num(img, nan=0.0), 0.0, 1.0)
               * 255.0 + 0.5).astype(np.uint8)
    h, w = img.shape[:2]
    channels = img.shape[2] if img.ndim == 3 else 1
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c))

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                           0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader: 8-bit gray/RGB/RGBA, non-interlaced."""
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    w = h = 0
    channels = 3
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", body)
            assert depth == 8 and interlace == 0, "unsupported PNG"
            channels = {0: 1, 2: 3, 6: 4, 4: 2}[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * channels
    out = _png_unfilter(raw, h, stride, channels)
    return out.reshape(h, w, channels)


def _png_unfilter(raw: bytes, h: int, stride: int,
                  channels: int) -> np.ndarray:
    """Reconstruct PNG scanlines (filters 0-4).  The sub/avg/paeth filters
    are serial byte recurrences along the row, so real asset sizes decode
    through the native C++ kernel; the NumPy path vectorizes what it can
    (none/up fully; sub via per-channel cumsum) and only falls back to the
    scalar loop for avg/paeth rows when the native lib is unavailable."""
    from vrt.native import lib as _native

    if _native:
        return _native.png_unfilter(raw, h, stride, channels)

    lines = np.frombuffer(raw, np.uint8, h * (stride + 1)).reshape(
        h, stride + 1)
    filters = lines[:, 0]
    data = lines[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = filters[y]
        line = data[y].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # up
            cur = (line + prev) & 0xFF
        elif f == 1:  # sub: per-channel cumulative sum mod 256
            cur = np.cumsum(line.reshape(-1, channels), axis=0,
                            dtype=np.int64).reshape(-1).astype(np.int32)
            cur &= 0xFF
        else:  # avg / paeth: serial in the reconstructed bytes
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                if f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                else:
                    raise ValueError(f"bad filter {f}")
                cur[i] = (line[i] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


# ---------------------------------------------------------------------------
# PPM
# ---------------------------------------------------------------------------

def write_ppm(path: str, img: np.ndarray) -> None:
    if img.dtype != np.uint8:
        img = (np.clip(np.nan_to_num(img, nan=0.0), 0.0, 1.0)
               * 255.0 + 0.5).astype(np.uint8)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(np.ascontiguousarray(img[..., :3]).tobytes())


# ---------------------------------------------------------------------------
# DDS (cubemaps for the skybox path)
# ---------------------------------------------------------------------------

_DDSCAPS2_CUBEMAP = 0x200
_FOURCC_DXT1 = b"DXT1"


def _decode_dxt1(data: bytes, w: int, h: int) -> np.ndarray:
    """Block-parallel BC1 decode: all blocks' palettes and 2-bit indices are
    computed as NumPy arrays at once (no per-pixel Python)."""
    bw, bh = (w + 3) // 4, (h + 3) // 4
    nb = bw * bh
    raw = np.frombuffer(data, np.uint8, nb * 8).reshape(nb, 8)
    c0 = raw[:, 0].astype(np.uint32) | (raw[:, 1].astype(np.uint32) << 8)
    c1 = raw[:, 2].astype(np.uint32) | (raw[:, 3].astype(np.uint32) << 8)
    bits = (raw[:, 4].astype(np.uint32)
            | (raw[:, 5].astype(np.uint32) << 8)
            | (raw[:, 6].astype(np.uint32) << 16)
            | (raw[:, 7].astype(np.uint32) << 24))

    def rgb565(c):
        return np.stack([(c >> 11) * 255 // 31,
                         ((c >> 5) & 63) * 255 // 63,
                         (c & 31) * 255 // 31], axis=-1).astype(np.int32)

    p0, p1 = rgb565(c0), rgb565(c1)                      # [NB,3]
    four = (c0 > c1)[:, None]
    p2 = np.where(four, (2 * p0 + p1) // 3, (p0 + p1) // 2)
    p3 = np.where(four, (p0 + 2 * p1) // 3, 0)
    pal = np.stack([p0, p1, p2, p3], axis=1)             # [NB,4,3]

    shifts = 2 * np.arange(16, dtype=np.uint32)          # py*4+px order
    idx = (bits[:, None] >> shifts[None, :]) & 3         # [NB,16]
    texels = np.take_along_axis(pal, idx[..., None].astype(np.int64),
                                axis=1)                  # [NB,16,3]
    # [bh,bw,py,px,3] -> [bh,py,bw,px,3] -> padded image
    img = texels.reshape(bh, bw, 4, 4, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(bh * 4, bw * 4, 3).astype(np.uint8)
    return img[:h, :w]


def write_dds_cubemap(path: str, env: np.ndarray) -> None:
    """float [6,E,E,3] (linear 0..1) -> uncompressed 32-bit BGRA DDS
    cubemap, 1 mip — the layout ``read_dds_cubemap`` (and DirectXTex's
    loader, ``VR/Renderer/Private/TextureFactory.cpp:29-69``) consumes."""
    env = np.asarray(env)
    assert env.ndim == 4 and env.shape[0] == 6 and env.shape[3] == 3, \
        env.shape
    edge = env.shape[1]
    assert env.shape[2] == edge, env.shape
    u8 = np.clip(np.round(env * 255.0), 0, 255).astype(np.uint8)
    flags = 0x1 | 0x2 | 0x4 | 0x1000
    header = struct.pack("<4sIIIIIII44x", b"DDS ", 124, flags, edge,
                         edge, edge * 4, 0, 1)
    pf = struct.pack("<IIIIIIII", 32, 0x41, 0, 32,
                     0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
    caps = struct.pack("<IIIII", 0x1000 | 0x8, 0x200 | 0xFE00, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header + pf + caps)
        for face in range(6):
            bgra = np.empty((edge, edge, 4), np.uint8)
            bgra[..., 0] = u8[face, ..., 2]
            bgra[..., 1] = u8[face, ..., 1]
            bgra[..., 2] = u8[face, ..., 0]
            bgra[..., 3] = 255
            f.write(bgra.tobytes())


def read_dds_cubemap(path: str) -> np.ndarray:
    """-> float32 [6,E,E,3] in face order +X,-X,+Y,-Y,+Z,-Z."""
    data = open(path, "rb").read()
    assert data[:4] == b"DDS ", "not a DDS file"
    (hdr_size, flags, h, w) = struct.unpack_from("<IIII", data, 4)
    pf_flags, fourcc = struct.unpack_from("<II", data, 80)
    fourcc = data[84:88]
    caps2 = struct.unpack_from("<I", data, 112)[0]
    assert caps2 & _DDSCAPS2_CUBEMAP, "DDS is not a cubemap"
    mip_count = max(1, struct.unpack_from("<I", data, 28)[0])
    pos = 4 + hdr_size
    faces = []
    for _ in range(6):
        fw, fh = w, h
        face = None
        for mip in range(mip_count):
            if fourcc == _FOURCC_DXT1:
                size = max(1, (fw + 3) // 4) * max(1, (fh + 3) // 4) * 8
                if mip == 0:
                    face = _decode_dxt1(data[pos:pos + size], fw, fh)
            else:  # uncompressed 32-bit
                size = fw * fh * 4
                if mip == 0:
                    arr = np.frombuffer(data[pos:pos + size],
                                        np.uint8).reshape(fh, fw, 4)
                    face = arr[..., [2, 1, 0]]  # BGRA -> RGB
            pos += size
            fw, fh = max(1, fw // 2), max(1, fh // 2)
        faces.append(face)
    return np.stack(faces).astype(np.float32) / 255.0
