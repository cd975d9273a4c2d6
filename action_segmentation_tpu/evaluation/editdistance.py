"""Levenshtein distance with a native C++ backend.

Loads the ctypes shared library built from native/editdistance.cpp
(compiled on first use if a compiler is available), falling back to a
numpy DP. Both compute plain unit-cost edit distance over integer token
sequences, matching the reference's `editdistance.eval`.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "editdistance.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libeditdistance.so")


def _build():
    """Compile to a temp file and rename into place: concurrent or
    interrupted builds can never leave a half-written .so that the
    mtime check would treat as current forever."""
    tmp = "{}.{}.tmp".format(_SO, os.getpid())
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
        check=True,
        capture_output=True,
    )
    os.replace(tmp, _SO)


def _open():
    lib = ctypes.CDLL(_SO)
    lib.edit_distance.restype = ctypes.c_int64
    lib.edit_distance.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    return lib


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        # a shipped .so without the source tree is valid — only treat
        # the artifact as stale when the source EXISTS and is newer
        stale = os.path.exists(_SRC) and (
            not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        )
        if stale:
            _build()
        try:
            _LIB = _open()
        except OSError:
            # stale/corrupt artifact (e.g. from an interrupted build of
            # an older toolchain): rebuild once before giving up
            _build()
            _LIB = _open()
    except Exception as e:
        # fall back to the numpy DP, but say so: a silent fallback hides
        # a broken toolchain behind a 100x slower eval loop
        import logging

        logging.getLogger("action_segmentation_tpu").warning(
            "native editdistance unavailable ({}); using the numpy "
            "fallback".format(e)
        )
        _LIB = None
    return _LIB


def _eval_numpy(a, b):
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    for i in range(1, len(a) + 1):
        cur = np.empty_like(prev)
        cur[0] = i
        sub = prev[:-1] + (a[i - 1] != b)
        # running dependency on cur[j-1] forces a scalar loop; arrays here
        # are short segment sequences so this is cheap
        for j in range(1, len(b) + 1):
            cur[j] = min(sub[j - 1], prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return int(prev[-1])


def eval(a, b):
    """Edit distance between two integer sequences."""
    lib = _load()
    a = np.ascontiguousarray(np.asarray(a, np.int64))
    b = np.ascontiguousarray(np.asarray(b, np.int64))
    if lib is not None:
        return int(
            lib.edit_distance(
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(a),
                b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(b),
            )
        )
    return _eval_numpy(a, b)
