"""ctypes bindings for the native host runtime (csrc/falcon_native.cpp).

Auto-builds the shared library on first import when a toolchain is present
(make + g++ are baked into the image); importers fall back to the numpy
paths if anything here fails (graph/sampler.py, graph/reorder.py catch
ImportError).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "csrc")
_SO = os.path.join(_DIR, "libfalcon_native.so")


def _build() -> None:
    subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                   capture_output=True, timeout=300)


if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        os.path.join(_DIR, "falcon_native.cpp")):
    _build()

_lib = ctypes.CDLL(_SO)

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

_lib.build_csr.argtypes = [_i64p, _i64p, ctypes.c_int64, ctypes.c_int64,
                           ctypes.c_int, _i64p, _i32p]
_lib.sample_neighbors.argtypes = [_i64p, _i32p, _i64p, ctypes.c_int64,
                                  ctypes.c_int32, ctypes.c_uint64, _i32p]
_lib.sample_block_multi.argtypes = [_i64p, _i32p, _i64p, ctypes.c_int64,
                                    _i32p, ctypes.c_int32, ctypes.c_uint64, _i32p]
_lib.partition_kway.argtypes = [_i64p, _i32p, ctypes.c_int64, ctypes.c_int32,
                                ctypes.c_uint64, _i32p]
_lib.rmat_edges.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
                            ctypes.c_double, ctypes.c_double, ctypes.c_double,
                            _i64p, _i64p]
_lib.falcon_native_version.restype = ctypes.c_int

VERSION = _lib.falcon_native_version()


def build_csr(src: np.ndarray, dst: np.ndarray, num_nodes: int,
              add_reverse: bool = True):
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    e = len(src) * (2 if add_reverse else 1)
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    indices = np.empty(e, dtype=np.int32)
    _lib.build_csr(src, dst, len(src), num_nodes, int(add_reverse), indptr, indices)
    return indptr, indices


def sample_neighbors(indptr: np.ndarray, indices: np.ndarray,
                     nodes: np.ndarray, fanout: int, seed: int) -> np.ndarray:
    nodes = np.ascontiguousarray(nodes, dtype=np.int64)
    out = np.empty((len(nodes), fanout), dtype=np.int32)
    _lib.sample_neighbors(np.ascontiguousarray(indptr, np.int64),
                          np.ascontiguousarray(indices, np.int32),
                          nodes, len(nodes), fanout, seed & (2**64 - 1), out)
    return out


def sample_block_multi(indptr: np.ndarray, indices: np.ndarray,
                       seeds: np.ndarray, fanouts, seed: int):
    """Returns list of per-level arrays [(B, f1), (B, f1*f2), ...]."""
    seeds = np.ascontiguousarray(seeds, dtype=np.int64)
    B = len(seeds)
    fo = np.ascontiguousarray(fanouts, dtype=np.int32)
    sizes, m = [], B
    for f in fanouts:
        m *= int(f)
        sizes.append(m)
    out = np.empty(sum(sizes), dtype=np.int32)
    _lib.sample_block_multi(np.ascontiguousarray(indptr, np.int64),
                            np.ascontiguousarray(indices, np.int32),
                            seeds, B, fo, len(fanouts), seed & (2**64 - 1), out)
    levels, off = [], 0
    for s in sizes:
        levels.append(out[off:off + s].reshape(B, -1))
        off += s
    return levels


def rmat_edges(num_nodes: int, num_edges: int, seed: int = 0,
               a: float = 0.57, b: float = 0.19, c: float = 0.19):
    src = np.empty(num_edges, dtype=np.int64)
    dst = np.empty(num_edges, dtype=np.int64)
    _lib.rmat_edges(num_nodes, num_edges, seed & (2**64 - 1), a, b, c, src, dst)
    return src, dst


def partition_kway(indptr: np.ndarray, indices: np.ndarray, k: int,
                   seed: int = 0) -> np.ndarray:
    n = len(indptr) - 1
    out = np.empty(n, dtype=np.int32)
    _lib.partition_kway(np.ascontiguousarray(indptr, np.int64),
                        np.ascontiguousarray(indices, np.int32),
                        n, k, seed & (2**64 - 1), out)
    return out
