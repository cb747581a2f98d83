# coding=utf-8
"""ctypes binding for the native FrameStore batch reader
(native/framestore_reader.cpp).

`NativeFrameStore.gather_batch` performs the entire hot host path — frame
gather, center-crop, uint8→float conversion and CLIP normalization — in C++
threads, producing the fixed-shape [B, T, 3, size, size] float32 batch with
no Python per-pixel work.  Falls back transparently when the shared library
has not been built (``make -C native``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from .transforms import CLIP_MEAN, CLIP_STD

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libframestore.so")
_LIB = None


def _load_library(build_if_missing: bool = True):
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.dirname(_SO_PATH)],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.fs_open.restype = ctypes.c_void_p
    lib.fs_open.argtypes = [ctypes.c_char_p]
    lib.fs_close.argtypes = [ctypes.c_void_p]
    lib.fs_num_entries.restype = ctypes.c_int64
    lib.fs_num_entries.argtypes = [ctypes.c_void_p]
    lib.fs_find_key.restype = ctypes.c_int64
    lib.fs_find_key.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fs_entry_info.restype = ctypes.c_int
    lib.fs_entry_info.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_int64)]
    lib.fs_gather_batch.restype = ctypes.c_int
    lib.fs_gather_batch.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    lib.fs_gather_batch_u8.restype = ctypes.c_int
    lib.fs_gather_batch_u8.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


class NativeFrameStore:
    """C++-backed FrameStore reader."""

    def __init__(self, path: str, num_threads: int = 4):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native framestore library unavailable; "
                               "run `make -C native`")
        self._lib = lib
        self.path = path
        self.num_threads = num_threads
        self._h = lib.fs_open(path.encode())
        if not self._h:
            raise IOError(f"failed to open FrameStore {path}")

    def __len__(self) -> int:
        return int(self._lib.fs_num_entries(self._h))

    def entry_id(self, key: str) -> int:
        eid = int(self._lib.fs_find_key(self._h, key.encode()))
        if eid < 0:
            raise KeyError(key)
        return eid

    def entry_info(self, entry_id: int) -> tuple:
        buf = (ctypes.c_int64 * 4)()
        rc = self._lib.fs_entry_info(self._h, entry_id, buf)
        if rc != 0:
            raise IndexError(entry_id)
        return tuple(int(v) for v in buf)

    def num_frames(self, key: str) -> int:
        return self.entry_info(self.entry_id(key))[0]

    def gather_batch(self, entry_ids: Sequence[int],
                     frame_indices: np.ndarray, size: int = 224,
                     mean=CLIP_MEAN, std=CLIP_STD,
                     out: Optional[np.ndarray] = None) -> np.ndarray:
        """Gather + transform a batch.

        Args:
            entry_ids: [B] framestore entry ids.
            frame_indices: [B, T] int frame indices (clamped in C++).
            out: optional preallocated [B, T, 3, size, size] float32 buffer.
        Returns:
            [B, T, 3, size, size] float32 CLIP-normalised batch.
        """
        eids = np.ascontiguousarray(entry_ids, np.int64)
        idx = np.ascontiguousarray(frame_indices, np.int64)
        B, T = idx.shape
        assert eids.shape == (B,)
        if out is None:
            out = np.empty((B, T, 3, size, size), np.float32)
        rc = self._lib.fs_gather_batch(
            self._h, eids, idx, B, T, size,
            np.asarray(mean, np.float32), np.asarray(std, np.float32),
            out, self.num_threads)
        if rc != 0:
            raise RuntimeError(f"fs_gather_batch failed with code {rc}")
        return out

    def gather_batch_u8(self, entry_ids: Sequence[int],
                        frame_indices: np.ndarray, size: int = 224,
                        out: Optional[np.ndarray] = None) -> np.ndarray:
        """Crop-only uint8 gather: [B, T, 3, size, size] uint8, zero-padded.
        Pair with the model's on-device normalization (uint8 inputs) to ship
        4x fewer bytes to the accelerator."""
        eids = np.ascontiguousarray(entry_ids, np.int64)
        idx = np.ascontiguousarray(frame_indices, np.int64)
        B, T = idx.shape
        if out is None:
            out = np.empty((B, T, 3, size, size), np.uint8)
        rc = self._lib.fs_gather_batch_u8(self._h, eids, idx, B, T, size,
                                          out, self.num_threads)
        if rc != 0:
            raise RuntimeError(f"fs_gather_batch_u8 failed with code {rc}")
        return out

    def close(self):
        if self._h:
            self._lib.fs_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __getstate__(self):
        return {"path": self.path, "num_threads": self.num_threads}

    def __setstate__(self, state):
        self.__init__(state["path"], state["num_threads"])
