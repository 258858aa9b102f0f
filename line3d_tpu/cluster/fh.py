"""Felzenszwalb–Huttenlocher graph clustering with the reference's exact
merge semantics (reference: clustering.cc:6-47, universe.h:60-115).

Edges are sorted ASCENDING by weight (the reference applies the
image-segmentation formulation directly to its affinity weights,
clustering.cc:12) with a stable sort, so equal-weight edges keep emission
order.  Two components join iff the edge weight w satisfies
w <= threshold[a] and w <= threshold[b]; the merged component's threshold
becomes w + c / size.

Union-find is inherently sequential (SURVEY.md §7 hard part #2); a C++
implementation is used when the native extension is built, with a numpy/python
fallback that is semantically identical.
"""
from __future__ import annotations

import numpy as np

from ..native import load as native_load


def fh_cluster_python(edges_i: np.ndarray, edges_j: np.ndarray,
                      edges_w: np.ndarray, num_nodes: int,
                      c: float = 1.0) -> np.ndarray:
    """Pure-python reference implementation.  Returns [num_nodes] labels
    (representative ids, not compacted)."""
    order = np.argsort(edges_w, kind="stable")
    parent = np.arange(num_nodes, dtype=np.int64)
    rank = np.zeros(num_nodes, np.int32)
    size = np.ones(num_nodes, np.int64)
    threshold = np.full(num_nodes, c, np.float64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        parent[x] = root  # single-step compression (universe.h:81-89)
        return root

    ei = edges_i[order]
    ej = edges_j[order]
    ew = edges_w[order]
    for k in range(len(ew)):
        a = find(int(ei[k]))
        b = find(int(ej[k]))
        if a == b:
            continue
        w = float(ew[k])
        if w <= threshold[a] and w <= threshold[b]:
            # join (universe.h:92-107): rank-based
            if rank[a] > rank[b]:
                parent[b] = a
                size[a] += size[b]
                root = a
            else:
                parent[a] = b
                size[b] += size[a]
                if rank[a] == rank[b]:
                    rank[b] += 1
                root = b
            # threshold[find(a)] = w + c/size (clustering.cc:37-39)
            threshold[root] = w + c / size[root]
    return np.array([find(i) for i in range(num_nodes)], np.int64)


def fh_cluster(edges_i: np.ndarray, edges_j: np.ndarray,
               edges_w: np.ndarray, num_nodes: int,
               c: float = 1.0) -> np.ndarray:
    """Cluster labels via the native C++ extension if available."""
    lib = native_load.get_lib()
    if lib is not None and len(edges_w):
        order = np.argsort(edges_w, kind="stable").astype(np.int64)
        labels = np.zeros(num_nodes, np.int64)
        lib.fh_cluster(
            np.ascontiguousarray(edges_i[order], np.int64),
            np.ascontiguousarray(edges_j[order], np.int64),
            np.ascontiguousarray(edges_w[order], np.float64),
            len(order), num_nodes, float(c), labels)
        return labels
    return fh_cluster_python(edges_i, edges_j, edges_w, num_nodes, c)
