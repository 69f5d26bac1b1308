"""Native (C++) kernels: voxelization, accel build, .vox codec.

Lazy-built with g++ (-O3 -fopenmp) on first use; everything has a pure
numpy/JAX fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "vrtnative.cpp")
_SO = os.path.join(_HERE, "libvrtnative.so")
_LOCK = threading.Lock()


class _NativeLib:
    def __init__(self, dll):
        self._dll = dll
        dll.vrt_voxelize.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)]
        dll.vrt_build_accel.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        dll.vrt_encode_voxels.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
        dll.vrt_decode_voxels.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)]
        dll.vrt_png_unfilter.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        dll.vrt_png_unfilter.restype = ctypes.c_int

    def voxelize(self, vertices, indices, resolution, extends):
        verts = np.ascontiguousarray(vertices, np.float64)
        idx = np.ascontiguousarray(indices, np.int64).reshape(-1)
        n = (1 << resolution) + 1
        sdf = np.empty((n, n, n), np.float32)
        mats = np.empty((n, n, n), np.uint8)
        self._dll.vrt_voxelize(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            verts.shape[0],
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), idx.size,
            resolution, float(extends),
            sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mats.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return sdf, mats

    def build_accel(self, sdf, resolution):
        sdf = np.ascontiguousarray(sdf, np.float32)
        n = sdf.shape[0]
        accel = np.empty((n - 1,) * 3, np.int32)
        self._dll.vrt_build_accel(
            sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            resolution,
            accel.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return accel

    def encode_voxels(self, sdf, mats):
        sdf = np.ascontiguousarray(sdf, np.float32)
        mats = np.ascontiguousarray(mats, np.uint8)
        n = sdf.shape[0]
        out = np.empty(n * n * n * 8, np.uint8)
        self._dll.vrt_encode_voxels(
            sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mats.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.tobytes()

    def png_unfilter(self, raw: bytes, h: int, stride: int, channels: int):
        raw_arr = np.frombuffer(raw, np.uint8, h * (stride + 1))
        raw_arr = np.ascontiguousarray(raw_arr)
        out = np.empty((h, stride), np.uint8)
        rc = self._dll.vrt_png_unfilter(
            raw_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, stride, channels,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise ValueError("bad PNG filter byte")
        return out

    def decode_voxels(self, buf, n):
        raw = np.frombuffer(buf, np.uint8, n * n * n * 8)
        raw = np.ascontiguousarray(raw)
        sdf = np.empty((n, n, n), np.float32)
        mats = np.empty((n, n, n), np.uint8)
        self._dll.vrt_decode_voxels(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
            sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mats.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return sdf, mats


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load():
    with _LOCK:
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            return _NativeLib(ctypes.CDLL(_SO))
        except OSError:
            return None


class _Lazy:
    _lib = None
    _tried = False

    def __getattr__(self, name):
        if not _Lazy._tried:
            _Lazy._lib = _load()
            _Lazy._tried = True
        if _Lazy._lib is None:
            raise RuntimeError("vrt native library unavailable")
        return getattr(_Lazy._lib, name)

    def __bool__(self):
        if not _Lazy._tried:
            _Lazy._lib = _load()
            _Lazy._tried = True
        return _Lazy._lib is not None


lib = _Lazy()
