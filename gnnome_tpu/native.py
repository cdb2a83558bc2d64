"""ctypes bridge to the C++ support library (native/gnnome_native.cpp).

Auto-builds ``libgnnome.so`` with g++ on first use (cached); every entry point
has a pure-Python/numpy fallback so the framework degrades gracefully where no
compiler exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgnnome.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "gnnome_native.cpp")
    if not os.path.isfile(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-pthread", src, "-o", _SO_PATH],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_SO_PATH) or (
            os.path.isfile(os.path.join(_NATIVE_DIR, "gnnome_native.cpp"))
            and os.path.getmtime(_SO_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "gnnome_native.cpp"))
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None

        lib.gn_edit_distance.restype = ctypes.c_int64
        lib.gn_edit_distance.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
        lib.gn_overlap_edit_distance_batch.restype = None
        lib.gn_overlap_edit_distance_batch.argtypes = [
            ctypes.c_char_p,                     # blob
            np.ctypeslib.ndpointer(np.int64),    # offsets
            np.ctypeslib.ndpointer(np.int32),    # src
            np.ctypeslib.ndpointer(np.int32),    # dst
            np.ctypeslib.ndpointer(np.int64),    # ol
            ctypes.c_int64, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int64),    # out
        ]
        lib.gn_greedy_walk.restype = ctypes.c_int64
        lib.gn_greedy_walk.argtypes = [
            np.ctypeslib.ndpointer(np.int64),    # row_ptr
            np.ctypeslib.ndpointer(np.int32),    # col
            np.ctypeslib.ndpointer(np.int64),    # eid
            np.ctypeslib.ndpointer(np.float32),  # log_probs
            np.ctypeslib.ndpointer(np.uint8),    # visited
            np.ctypeslib.ndpointer(np.int32),    # stamp
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_float,      # use_early_stop, log_p_threshold
            np.ctypeslib.ndpointer(np.int32),    # out_walk
            ctypes.POINTER(ctypes.c_double),     # sum_log_prob
        ]
        lib.gn_greedy_walk_batch.restype = None
        lib.gn_greedy_walk_batch.argtypes = [
            np.ctypeslib.ndpointer(np.int64),    # row_ptr
            np.ctypeslib.ndpointer(np.int32),    # col
            np.ctypeslib.ndpointer(np.int64),    # eid
            np.ctypeslib.ndpointer(np.float32),  # log_probs
            np.ctypeslib.ndpointer(np.uint8),    # visited
            ctypes.c_int64,                      # n_nodes
            np.ctypeslib.ndpointer(np.int32),    # seed_src
            np.ctypeslib.ndpointer(np.int32),    # seed_dst
            ctypes.c_int64, ctypes.c_int64,      # n_cand, max_walk
            ctypes.c_int32, ctypes.c_float,      # use_early_stop, threshold
            ctypes.c_int32,                      # n_threads
            np.ctypeslib.ndpointer(np.int32),    # out_walks
            np.ctypeslib.ndpointer(np.int64),    # out_lens
            np.ctypeslib.ndpointer(np.float64),  # out_slp
        ]
        lib.gn_decode_round.restype = ctypes.c_int64
        lib.gn_decode_round.argtypes = [
            np.ctypeslib.ndpointer(np.int64),    # row_ptr
            np.ctypeslib.ndpointer(np.int32),    # col
            np.ctypeslib.ndpointer(np.int64),    # eid
            np.ctypeslib.ndpointer(np.float32),  # log_probs
            np.ctypeslib.ndpointer(np.int64),    # prefix_len (clamped)
            np.ctypeslib.ndpointer(np.int64),    # read_len
            np.ctypeslib.ndpointer(np.uint8),    # visited
            ctypes.c_int64,                      # n_nodes
            np.ctypeslib.ndpointer(np.int32),    # seed_src
            np.ctypeslib.ndpointer(np.int32),    # seed_dst
            ctypes.c_int64,                      # n_cand
            ctypes.c_int32, ctypes.c_float,      # use_early_stop, threshold
            ctypes.c_int32,                      # n_threads
            np.ctypeslib.ndpointer(np.int32),    # out_walk
            ctypes.POINTER(ctypes.c_int64),      # out_contig_len
            ctypes.POINTER(ctypes.c_double),     # out_slp
        ]
        lib.gn_sample_seed_edges.restype = ctypes.c_int64
        lib.gn_sample_seed_edges.argtypes = [
            np.ctypeslib.ndpointer(np.int32),    # src
            np.ctypeslib.ndpointer(np.int32),    # dst
            np.ctypeslib.ndpointer(np.float32),  # probs
            np.ctypeslib.ndpointer(np.uint8),    # visited
            ctypes.c_int64,                      # n_edges
            np.ctypeslib.ndpointer(np.float64),  # uniforms
            ctypes.c_int64, ctypes.c_int32,      # k, n_threads
            np.ctypeslib.ndpointer(np.int64),    # out seeds
        ]
        lib.gn_absorb_walk.restype = None
        lib.gn_absorb_walk.argtypes = [
            np.ctypeslib.ndpointer(np.int64),    # csr_ptr
            np.ctypeslib.ndpointer(np.int32),    # csr_col
            np.ctypeslib.ndpointer(np.int64),    # csc_ptr
            np.ctypeslib.ndpointer(np.int32),    # csc_row
            np.ctypeslib.ndpointer(np.int32),    # walk
            ctypes.c_int64,                      # walk_len
            np.ctypeslib.ndpointer(np.uint8),    # visited (mutated)
        ]
        lib.gn_walk_edge_ids.restype = ctypes.c_int64
        lib.gn_walk_edge_ids.argtypes = [
            np.ctypeslib.ndpointer(np.int64),    # row_ptr
            np.ctypeslib.ndpointer(np.int32),    # col
            np.ctypeslib.ndpointer(np.int64),    # eid
            np.ctypeslib.ndpointer(np.int32),    # walk
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64),    # out_eids
        ]
        _lib = lib
        return _lib


def have_native() -> bool:
    return get_lib() is not None
