"""ctypes binding to the native host library (native/desco_host.cpp).

Auto-builds ``libdesco_host.so`` with g++ on first use (cached by mtime).
Every entry point has a pure-Python fallback (``desco_tpu.truth.vf2``,
``desco_tpu.graph``) used when no C++ toolchain is available; tests assert
exact agreement between the two.

The C calls release the GIL, so ``parallel_canonical_counts`` gets real
multicore speedup from a plain thread pool — replacing the reference's
process pool (workload.py:655-671) without pickling whole graphs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import numpy as np

from ..graph.container import Graph

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libdesco_host.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "desco_host.cpp")

_lib = None
_lib_failed = False


def _build():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR, "-s"],
        check=True, capture_output=True,
    )


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.vf2_count.restype = ctypes.c_longlong
        lib.vf2_count.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.extract_neighborhoods.restype = ctypes.c_longlong
        lib.extract_neighborhoods.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.triangle_mask.restype = None
        lib.triangle_mask.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.prepare_samples.restype = ctypes.c_longlong
        lib.prepare_samples.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        assert lib.desco_host_abi_version() == 1
        _lib = lib
    except Exception as e:
        # fail OPEN to the pure-Python path, but never silently: a
        # broken toolchain or missing source would otherwise turn
        # minutes of truth computation into hours with no explanation
        import warnings

        warnings.warn(
            f"native desco_host library unavailable ({type(e).__name__}:"
            f" {e}) — falling back to the pure-Python VF2 path, which "
            f"is orders of magnitude slower", stacklevel=2)
        _lib_failed = True
    return _lib


def _edges_ptr(g: Graph):
    e = np.ascontiguousarray(g.edges, dtype=np.int32)
    return e, e.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def native_available() -> bool:
    return load_library() is not None


def vf2_count_native(
    target: Graph, query: Graph,
    per_node: Optional[np.ndarray] = None,
    target_labels: Optional[np.ndarray] = None,
    query_labels: Optional[np.ndarray] = None,
) -> int:
    lib = load_library()
    te, tp = _edges_ptr(target)
    qe, qp = _edges_ptr(query)
    pn = (per_node.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))
          if per_node is not None else None)
    tl = ql = None
    if target_labels is not None and query_labels is not None:
        tlab = np.ascontiguousarray(target_labels, dtype=np.int32)
        qlab = np.ascontiguousarray(query_labels, dtype=np.int32)
        tl = tlab.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        ql = qlab.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    return int(lib.vf2_count(
        target.n_nodes, target.n_edges, tp,
        query.n_nodes, query.n_edges, qp, tl, ql, pn))


def parallel_canonical_counts(
    targets: Sequence[Graph], queries: Sequence[Graph],
    num_workers: Optional[int] = None,
) -> List[np.ndarray]:
    """Canonical count truth for a dataset, thread-parallel over
    (target, query) tasks (GIL released inside the C call)."""
    from .vf2 import canonical_counts as py_canonical_counts
    from .vf2 import symmetric_factor

    if not native_available():
        return [py_canonical_counts(t, list(queries)) for t in targets]

    sf = [symmetric_factor_native(q) for q in queries]
    num_workers = num_workers or os.cpu_count() or 1
    results = [np.zeros((t.n_nodes, len(queries)), np.float64)
               for t in targets]

    def task(ti_qi):
        ti, qi = ti_qi
        per = np.zeros(targets[ti].n_nodes, dtype=np.int64)
        vf2_count_native(targets[ti], queries[qi], per)
        results[ti][:, qi] = per / sf[qi]

    tasks = [(ti, qi) for ti in range(len(targets))
             for qi in range(len(queries))]
    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        list(ex.map(task, tasks))
    return results


def symmetric_factor_native(query: Graph) -> int:
    return vf2_count_native(query, query)


def extract_neighborhoods_native(g: Graph, depth: int):
    """(sizes, flat_nodes): sizes[v] = neighborhood size (0 = dropped);
    flat_nodes concatenates each surviving neighborhood's sorted node
    list (ascending ids; v last)."""
    lib = load_library()
    e, ep = _edges_ptr(g)
    sizes = np.zeros(g.n_nodes, dtype=np.int32)
    total = lib.extract_neighborhoods(
        g.n_nodes, g.n_edges, ep,
        depth, sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), None)
    flat = np.zeros(int(total), dtype=np.int32)
    lib.extract_neighborhoods(
        g.n_nodes, g.n_edges, ep, depth,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return sizes, flat


def prepare_samples_native(g: Graph, depth: int):
    """Fused canonical partition + SHMP tconv sample prep (one C call
    per graph; see native/desco_host.cpp prepare_samples). Returns
    (sizes, esizes, flat_nodes, flat_src, flat_dst, flat_etype) —
    per-neighborhood slices are delimited by cumsum(sizes)/cumsum(esizes)
    over the surviving (sizes > 0) rows, in node-id order."""
    lib = load_library()
    e, ep = _edges_ptr(g)
    sizes = np.zeros(g.n_nodes, dtype=np.int32)
    esizes = np.zeros(g.n_nodes, dtype=np.int64)
    null_i = ctypes.POINTER(ctypes.c_int)()
    total_n = lib.prepare_samples(
        g.n_nodes, g.n_edges, ep, depth,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        esizes.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        null_i, null_i, null_i, null_i)
    total_e = int(esizes.sum())
    nodes = np.zeros(int(total_n), dtype=np.int32)
    src = np.zeros(total_e, dtype=np.int32)
    dst = np.zeros(total_e, dtype=np.int32)
    etype = np.zeros(total_e, dtype=np.int32)

    def ip(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

    lib.prepare_samples(
        g.n_nodes, g.n_edges, ep, depth,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        esizes.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        ip(nodes), ip(src), ip(dst), ip(etype))
    return sizes, esizes, nodes, src, dst, etype


def triangle_mask_native(g: Graph) -> np.ndarray:
    lib = load_library()
    e, ep = _edges_ptr(g)
    out = np.zeros(g.n_edges, dtype=np.uint8)
    lib.triangle_mask(
        g.n_nodes, g.n_edges, ep,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out.astype(bool)
