"""ctypes bindings for the native CSV/windowing engine (native/fastwindow.cpp).

Drop-in accelerator for `data.dataset.create_data_arrays`'s hot path: one-pass
CSV parse + per-subject window assembly in C++, returning the flat float32
buffers the framework feeds to the device. Falls back to the pandas path
automatically when the shared library has not been built
(`make -C native`).
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger("hybrid_ode_tpu.native")

_LIB_PATHS = [
    Path(__file__).resolve().parents[2] / "native" / "libfastwindow.so",
    Path(__file__).resolve().parent / "libfastwindow.so",
]


class _FwCsv(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_double)),
        ("n_rows", ctypes.c_int64),
        ("n_cols", ctypes.c_int64),
        ("header", ctypes.c_char_p),
    ]


_lib = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.fw_parse_csv.argtypes = [ctypes.c_char_p, ctypes.POINTER(_FwCsv)]
            lib.fw_parse_csv.restype = ctypes.c_int
            lib.fw_build_windows.argtypes = [
                ctypes.POINTER(_FwCsv), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ]
            lib.fw_build_windows.restype = ctypes.c_int64
            lib.fw_free.argtypes = [ctypes.c_void_p]
            lib.fw_free_csv.argtypes = [ctypes.POINTER(_FwCsv)]
            _lib = lib
            return lib
    return None


def native_available() -> bool:
    return load_library() is not None


def parse_csv(path: str) -> Tuple[np.ndarray, List[str]]:
    """Parse a numeric CSV natively -> (column-major (n_cols, n_rows) f64, names)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("libfastwindow.so not built; run `make -C native`")
    csv = _FwCsv()
    rc = lib.fw_parse_csv(str(path).encode(), ctypes.byref(csv))
    if rc != 0:
        raise IOError(f"fw_parse_csv failed with code {rc} for {path}")
    names = csv.header.decode().split(",")
    n = csv.n_rows * csv.n_cols
    arr = np.ctypeslib.as_array(csv.data, shape=(int(csv.n_cols), int(csv.n_rows))).copy()
    lib.fw_free_csv(ctypes.byref(csv))
    return arr, names


def build_windows(
    path: str,
    columns: List[str],
    subject_col: str = "subject_id",
    seq_len: int = 61,
    stride: int = 30,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """One-pass native parse + window build.

    Returns (windows (N, seq_len, len(columns)) f32, subject_ids (N,), names).
    Missing columns raise KeyError (caller decides placeholder policy).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("libfastwindow.so not built; run `make -C native`")
    csv = _FwCsv()
    rc = lib.fw_parse_csv(str(path).encode(), ctypes.byref(csv))
    if rc != 0:
        raise IOError(f"fw_parse_csv failed with code {rc} for {path}")
    try:
        names = csv.header.decode().split(",")
        col_idx = {n: i for i, n in enumerate(names)}
        if subject_col not in col_idx:
            raise KeyError(f"missing column {subject_col!r}")
        sel = []
        for c in columns:
            if c not in col_idx:
                raise KeyError(f"missing column {c!r}")
            sel.append(col_idx[c])
        sel_arr = (ctypes.c_int64 * len(sel))(*sel)
        wins_p = ctypes.POINTER(ctypes.c_float)()
        subs_p = ctypes.POINTER(ctypes.c_int64)()
        n_windows = lib.fw_build_windows(
            ctypes.byref(csv), col_idx[subject_col], sel_arr, len(sel),
            seq_len, stride, ctypes.byref(wins_p), ctypes.byref(subs_p),
        )
        if n_windows < 0:
            raise MemoryError("fw_build_windows allocation failed")
        if n_windows == 0:
            return np.zeros((0, seq_len, len(sel)), np.float32), np.zeros(0, np.int64), names
        wins = np.ctypeslib.as_array(wins_p, shape=(int(n_windows), seq_len, len(sel))).copy()
        subs = np.ctypeslib.as_array(subs_p, shape=(int(n_windows),)).copy()
        lib.fw_free(ctypes.cast(wins_p, ctypes.c_void_p))
        lib.fw_free(ctypes.cast(subs_p, ctypes.c_void_p))
        return wins, subs, names
    finally:
        lib.fw_free_csv(ctypes.byref(csv))
