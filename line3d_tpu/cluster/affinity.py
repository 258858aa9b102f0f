"""Affinity-graph construction over best-match 2D segments.

Replicates clusterSegments2D's edge enumeration (reference:
line3D.cc:968-1221) including its order-dependent `used` deduplication:

For each source segment src with a best match (ascending (view, seg) order):
  A) every potential correspondent tgt (ascending order): if the unordered
     pair was already seen, skip it ENTIRELY (including step B); else mark
     it seen; if tgt also has a best match, the edge weight is
     w = 0.5 (score_src + score_tgt) * sim3D, kept if w > 0.25
     (L3D_MIN_AFFINITY).
  B) only when the A pair was fresh and tgt has a best match: tgt's
     collinear partners tgtc (same view as tgt): unseen-pair gate, weight
     as in A (no collinearity factor), kept if w > 0.01.
  C) src's own collinear partners (same view): unseen-pair gate, weight
     multiplied by the collinearity score, kept if w > 0.01.

The pair is marked seen *before* the threshold test, and a seen A pair
suppresses the target's whole collinear expansion (the `continue`,
line3D.cc:1001-1004) — so a failed A-edge is never reconsidered as a
C-edge, and B blocks of re-encountered targets never run.  Both behaviors
are order-dependent and preserved here.

The per-pair 3D similarity (similarity_coll3D, line3D.cc:1600-1681) is
evaluated vectorized over all candidate pairs after enumeration.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import L3DConfig
from ..core.cameras import CameraSet
from ..match.engine import BestMatches


@dataclasses.dataclass
class AffinityGraph:
    edges_i: np.ndarray       # [E] int32 local node ids (both directions)
    edges_j: np.ndarray       # [E] int32
    edges_w: np.ndarray       # [E] float32
    node_view: np.ndarray     # [B] int32: local id -> view
    node_seg: np.ndarray      # [B] int32: local id -> segment
    num_nodes: int


# batch size above which similarity_coll3d dispatches to the native
# OpenMP kernel (tests lower it to pin native == numpy equivalence)
NATIVE_SIM_THRESHOLD = 20000

# candidate count above which a multi-process run shards the finalize
# weight sweep across hosts (below it the collective overhead dominates;
# the multi-host worker test lowers it to pin sharded == single-host)
SHARDED_FINALIZE_MIN = 65536


def similarity_coll3d(cams: CameraSet, best: BestMatches,
                      src_rows: np.ndarray, tgt_rows: np.ndarray,
                      sigma_a: float) -> np.ndarray:
    """Vectorized similarity_coll3D (line3D.cc:1600-1681) over row pairs.

    Large batches dispatch to the native OpenMP kernel (same double-
    precision math, native/affinity_enum.cpp); the numpy body below is the
    readable twin and the fallback."""
    if len(src_rows) > NATIVE_SIM_THRESHOLD:
        from ..native.load import get_lib
        lib = get_lib()
        if lib is not None and hasattr(lib, "affinity_similarity"):
            n = len(src_rows)
            sim = np.empty(n, np.float64)
            lib.affinity_similarity(
                np.ascontiguousarray(src_rows, np.int64),
                np.ascontiguousarray(tgt_rows, np.int64), n,
                np.ascontiguousarray(best.P1, np.float64),
                np.ascontiguousarray(best.P2, np.float64),
                np.ascontiguousarray(best.dir, np.float64),
                np.ascontiguousarray(best.d1, np.float32),
                np.ascontiguousarray(best.d2, np.float32),
                np.ascontiguousarray(best.view, np.int32),
                np.ascontiguousarray(cams.k_lower, np.float64),
                np.ascontiguousarray(cams.k_upper, np.float64),
                np.ascontiguousarray(cams.median_depth, np.float64),
                float(sigma_a), sim)
            return sim
    def p2l(P1, dirv, X):
        # distance_point2line_3D (line3D.cc:1684-1691).  dist^2 =
        # |X - P1|^2 - (dir . (X - P1))^2 (dir is unit) — two reductions
        # instead of materializing the projection (~3x cheaper at the
        # multi-million-pair scale the affinity stage runs at)
        dx = X[:, 0] - P1[:, 0]
        dy = X[:, 1] - P1[:, 1]
        dz = X[:, 2] - P1[:, 2]
        t = dx * dirv[:, 0] + dy * dirv[:, 1] + dz * dirv[:, 2]
        d2 = dx * dx + dy * dy + dz * dz - t * t
        return np.sqrt(np.maximum(d2, 0.0))

    def endpoint_sims(a_rows, b_rows):
        """Gaussian sims of a's endpoints against b's 3D line."""
        P1b = best.P1[b_rows]; dirb = best.dir[b_rows]
        d1 = p2l(P1b, dirb, best.P1[a_rows])
        d2 = p2l(P1b, dirb, best.P2[a_rows])
        va = best.view[a_rows]
        min1 = cams.lower_uncertainty(va, best.d1[a_rows])
        min2 = cams.lower_uncertainty(va, best.d2[a_rows])
        s1sq = cams.uncertainty_sigma_sq(va, best.d1[a_rows])
        s2sq = cams.uncertainty_sigma_sq(va, best.d2[a_rows])
        with np.errstate(divide="ignore", invalid="ignore"):
            e1 = np.exp(-(d1 - min1) ** 2 / (2.0 * s1sq))
            e2 = np.exp(-(d2 - min2) ** 2 / (2.0 * s2sq))
        sim1 = np.where(d1 < min1, 1.0, e1)
        sim2 = np.where(d2 < min2, 1.0, e2)
        return np.minimum(sim1, sim2)

    w12 = endpoint_sims(src_rows, tgt_rows)
    w34 = endpoint_sims(tgt_rows, src_rows)
    w_d = np.minimum(w12, w34)

    dots = np.clip(np.sum(best.dir[src_rows] * best.dir[tgt_rows], axis=1),
                   -1.0, 1.0)
    ang = np.degrees(np.arccos(dots))
    ang = np.where(ang > 90.0, 180.0 - ang, ang)
    w_a = np.exp(-ang * ang / (2.0 * sigma_a * sigma_a))

    sim = np.minimum(w_d, w_a)
    return np.where(sim <= 0.01, 0.0, sim)


def potential_correspondence_lists(matches: list, num_views: int,
                                   max_segments: int):
    """Symmetric adjacency dict: node key -> sorted partner keys.

    Node key = view * max_segments + seg.  Mirrors
    potential_correspondences_ (line3D.cc:861-865) which is filled from the
    *verified* match lists.
    """
    allp = _correspondence_pairs(matches, num_views, max_segments)
    if not len(allp):
        return {}
    adj = {}
    keys, starts = np.unique(allp[:, 0], return_index=True)
    starts = np.append(starts, len(allp))
    for k, s, e in zip(keys, starts[:-1], starts[1:]):
        adj[int(k)] = allp[s:e, 1]
    return adj


def _build_affinity_graph_fast(best, adj, row_of, key_of, cams, config,
                               verbose):
    """Fully-vectorized A-candidate path (no collinearity).

    Without collinear candidates the traversal is src ascending x partner
    ascending, so the first visit of an unordered pair (a, b), a < b, is at
    src = a if a has a best match (all sources do), else at src = b.  Hence
    the `used` dedup reduces to: keep (src, tgt) iff src < tgt or tgt has no
    best match (and pairs without a best-match tgt produce no edge anyway).
    Candidate order, weights, thresholds, and node-id assignment match the
    loop path exactly (covered by tests/test_affinity.py).
    """
    # flatten adjacency into arrays in (src_rank, tgt) order
    order = np.argsort(key_of, kind="stable")
    srcs, tgts = [], []
    for r in order:
        partners = adj.get(int(key_of[r]))
        if partners is None:
            continue
        srcs.append(np.full(len(partners), r, np.int64))
        tgts.append(partners)
    if not srcs:
        return AffinityGraph(np.zeros(0, np.int32), np.zeros(0, np.int32),
                             np.zeros(0, np.float32),
                             np.zeros(0, np.int32), np.zeros(0, np.int32), 0)
    src_rows = np.concatenate(srcs)
    tgt_keys = np.concatenate(tgts)

    # partner -> best row.  Edges require BOTH ends to have best matches;
    # such pairs are first visited at the smaller key, so dedup = src < tgt.
    # (Pairs whose smaller end lacks a best match are first visited at the
    # larger end, but they produce no edge regardless.)
    tgt_rows = np.array([row_of.get(int(k), -1) for k in tgt_keys], np.int64)
    src_keys = key_of[src_rows]
    keep = (tgt_rows >= 0) & (src_keys < tgt_keys)
    src_rows = src_rows[keep]
    tgt_rows = tgt_rows[keep]

    sim = similarity_coll3d(cams, best, src_rows, tgt_rows, config.sigma_a)
    w = 0.5 * (best.score[src_rows].astype(np.float64) +
               best.score[tgt_rows].astype(np.float64)) * sim
    passed = w > config.min_affinity
    src_rows, tgt_rows, w = src_rows[passed], tgt_rows[passed], w[passed]

    # node ids in emission order: first occurrence over the interleaved
    # (src, tgt) sequence
    seq = np.empty(2 * len(src_rows), np.int64)
    seq[0::2] = src_rows
    seq[1::2] = tgt_rows
    uniq, first = np.unique(seq, return_index=True)
    id_order = np.argsort(first, kind="stable")
    node_rows = uniq[id_order]
    node_of = np.full(best.view.size, -1, np.int64)
    node_of[node_rows] = np.arange(len(node_rows))

    a = node_of[src_rows]
    b = node_of[tgt_rows]
    E = len(a)
    ei = np.empty(2 * E, np.int32)
    ej = np.empty(2 * E, np.int32)
    ew = np.empty(2 * E, np.float32)
    ei[0::2] = a; ej[0::2] = b
    ei[1::2] = b; ej[1::2] = a
    ew[0::2] = w; ew[1::2] = w

    if verbose:
        print(f"[L3D] A: #num_entries = {len(ei)}")
        print(f"[L3D] A: #num_rows    = {len(node_rows)}")
    return AffinityGraph(
        edges_i=ei, edges_j=ej, edges_w=ew,
        node_view=best.view[node_rows].astype(np.int32),
        node_seg=best.seg[node_rows].astype(np.int32),
        num_nodes=len(node_rows))


def _collin_csr(collin, num_views: int, S: int):
    """Global CSR over node key = view*S + seg -> (sorted partner segs,
    weights).  Fast path reads the flat arrays a CollinMaps carries;
    fallback iterates the dicts (tests may pass plain lists of dicts)."""
    n_keys = num_views * S
    if getattr(collin, "flat_view", None) is not None:
        fv = collin.flat_view.astype(np.int64)
        fi = collin.flat_i.astype(np.int64)
        fj = collin.flat_j.astype(np.int64)
        fw = collin.flat_w
        ikey = fv * S + fi                      # sorted ascending by export
    else:
        ik, jj, ww = [], [], []
        for v, d in enumerate(collin):
            for i, m in d.items():
                for j, wv in sorted(m.items()):
                    ik.append(v * np.int64(S) + i)
                    jj.append(j)
                    ww.append(wv)
        ikey = np.asarray(ik, np.int64)
        fj = np.asarray(jj, np.int64)
        fw = np.asarray(ww, np.float32)
        o = np.lexsort((fj, ikey))
        ikey, fj, fw = ikey[o], fj[o], fw[o]
    # out-of-range segment ids cannot collide with any real node key, so
    # dropping them preserves the loop path's semantics exactly
    ok = (ikey >= 0) & (ikey < n_keys) & (fj >= 0) & (fj < S)
    if not ok.all():
        ikey, fj, fw = ikey[ok], fj[ok], fw[ok]
    ptr = np.zeros(n_keys + 1, np.int64)
    np.add.at(ptr, ikey + 1, 1)
    np.cumsum(ptr, out=ptr)
    return ptr, fj, fw


def _build_affinity_graph_vec(best, allp, row_lookup, key_of, collin,
                              cams, config, max_segments, verbose):
    """Vectorized exact-order enumeration of the collinearity path.

    Reproduces the reference traversal (line3D.cc:984-1221) as one flat
    candidate stream ordered by (source rank, within-source ordinal) with
    the interleaving [A(t0), B(t0,*), A(t1), B(t1,*), ..., C(*)] per
    source; the order-dependent `used` dedup becomes "first occurrence of
    each unordered pair in stream order" (np.unique).  Equivalence with
    the loop enumerator is covered by tests/test_affinity.py.
    """
    S = max_segments
    V = cams.num_views
    M = np.int64(V) * S
    ptr, coll_j, coll_w = _collin_csr(collin, V, S)
    coll_cnt = np.diff(ptr)

    order = np.argsort(key_of, kind="stable")
    key_sorted = key_of[order]

    # --- A entries: per source, its sorted potential correspondents ------
    lo = np.searchsorted(allp[:, 0], key_sorted, side="left")
    hi = np.searchsorted(allp[:, 0], key_sorted, side="right")
    n_adj = hi - lo                                   # [B] per-src A count
    Na = int(n_adj.sum())
    starts = np.cumsum(n_adj) - n_adj                 # block start per src
    parent_src = np.repeat(np.arange(len(order)), n_adj)     # srcrank per A
    j_A = np.arange(Na) - np.repeat(starts, n_adj)    # index within src
    a_idx = np.repeat(lo, n_adj) + j_A
    tgt_A = allp[a_idx, 1]                            # ascending per src
    srcrow_A = order[parent_src]

    trow_A = row_lookup[tgt_A]
    blen = np.where(trow_A >= 0, coll_cnt[tgt_A], 0)

    # within-source ordinal of each A entry: own index + collinear
    # expansions of the previous A entries of the same source.
    # cum0[k] = total blen of A entries before global position k.
    cumb = np.cumsum(blen)
    cum0 = np.concatenate([[0], cumb])
    ord_A = j_A + (cum0[:-1] - np.repeat(cum0[starts], n_adj))

    # --- B entries: collinear partners of each matched A target ----------
    NB = int(blen.sum())
    parent_B = np.repeat(np.arange(Na), blen)
    k_B = np.arange(NB) - np.repeat(cumb - blen, blen)
    cj = coll_j[np.repeat(ptr[tgt_A], blen) + k_B]
    tgt_B = (tgt_A[parent_B] // S) * S + cj
    srcrank_B = parent_src[parent_B]
    srcrow_B = srcrow_A[parent_B]
    ord_B = ord_A[parent_B] + 1 + k_B

    # --- C entries: the source's own collinear partners ------------------
    clen = coll_cnt[key_sorted]
    NC = int(clen.sum())
    parent_C = np.repeat(np.arange(len(order)), clen)
    k_C = np.arange(NC) - np.repeat(np.cumsum(clen) - clen, clen)
    flat_C = coll_j[np.repeat(ptr[key_sorted], clen) + k_C]
    cw_C = coll_w[np.repeat(ptr[key_sorted], clen) + k_C]
    tgt_C = (key_sorted[parent_C] // S) * S + flat_C
    srcrow_C = order[parent_C]
    # per-source AB total = #A + (sum of blen within the source's block)
    ab_total = n_adj + (cum0[starts + n_adj] - cum0[starts])
    ord_C = ab_total[parent_C] + k_C

    # --- assemble the stream in traversal order ---------------------------
    # every entry's final stream position is directly computable (source
    # block offset + within-source ordinal), so the stream is built with
    # three scatter stores per array instead of a concatenate + lexsort +
    # per-array permutation (~3x fewer passes over the multi-M streams)
    n = Na + NB + NC
    total_per_src = ab_total + clen
    src_off = np.cumsum(total_per_src) - total_per_src
    pos_A = src_off[parent_src] + ord_A
    pos_B = src_off[srcrank_B] + ord_B
    pos_C = src_off[parent_C] + ord_C

    src_rows = np.empty(n, np.int64)
    src_rows[pos_A] = srcrow_A
    src_rows[pos_B] = srcrow_B
    src_rows[pos_C] = srcrow_C
    tgt_keys = np.empty(n, np.int64)
    tgt_keys[pos_A] = tgt_A
    tgt_keys[pos_B] = tgt_B
    tgt_keys[pos_C] = tgt_C
    kinds = np.empty(n, np.int8)
    kinds[pos_A] = 0
    kinds[pos_B] = 1
    kinds[pos_C] = 2
    cws = np.ones(n)
    cws[pos_C] = cw_C

    # --- order-dependent `used` dedup --------------------------------------
    # Sequential semantics: an entry is FRESH iff it executes and no
    # earlier executing entry marked the same unordered pair; A/C entries
    # always execute, a B entry executes iff its parent A entry was fresh
    # (the used-check `continue` skips the whole expansion,
    # line3D.cc:1001-1004).  Every dependency points to a strictly earlier
    # stream position, so forward chaotic iteration converges (one pass
    # per dependency level; 2-3 in practice).
    src_keys = key_of[src_rows]
    amin = np.minimum(src_keys, tgt_keys)
    amax = np.maximum(src_keys, tgt_keys)
    pair_key = amin * M + amax
    is_B = kinds == 1
    # stream position of each B entry's parent A entry, in stream order
    parent_pos_arr = np.empty(n, np.int64)
    parent_pos_arr[pos_B] = pos_A[parent_B]
    parent_pos = parent_pos_arr[is_B]

    grp = np.argsort(pair_key, kind="stable")    # (pair, stream pos) order
    gkey = pair_key[grp]
    new_group = np.empty(n, bool)
    if n:
        new_group[0] = True
        new_group[1:] = gkey[1:] != gkey[:-1]
    grp_id = np.cumsum(new_group) - 1
    grp_first = np.nonzero(new_group)[0]

    executes = np.ones(n, bool)
    fresh = executes
    for _ in range(n + 2):
        ex_g = executes[grp]
        c = np.cumsum(ex_g)
        excl = c - ex_g - (c[grp_first] - ex_g[grp_first])[grp_id]
        fresh_g = ex_g & (excl == 0)     # first executing entry of its pair
        fresh = np.empty(n, bool)
        fresh[grp] = fresh_g
        new_exec = executes.copy()
        new_exec[is_B] = fresh[parent_pos]
        if np.array_equal(new_exec, executes):
            break
        executes = new_exec

    keep_idx = np.nonzero(fresh)[0]
    src_rows, tgt_keys = src_rows[keep_idx], tgt_keys[keep_idx]
    kinds, cws = kinds[keep_idx], cws[keep_idx]

    trow = row_lookup[tgt_keys]
    has = trow >= 0
    src_rows, tgt_rows = src_rows[has], trow[has]
    kinds, cws = kinds[has], cws[has]

    return _finalize_candidates(best, src_rows, tgt_rows, kinds, cws,
                                cams, config, verbose)


def _finalize_candidates(best, src_rows, tgt_rows, kinds, cws,
                         cams, config, verbose):
    """Shared tail of every enumerator: similarity, weights, per-kind
    thresholds, node-id assignment in emission order (line3D.cc:1019-1050),
    symmetric edge list.  Large streams dispatch to the fused native pass
    (affinity_finalize — one OpenMP similarity+weight+threshold sweep plus
    one sequential emission pass; the numpy tail below makes ~10 passes
    over the stream and was the largest single cost of the 1000-view
    cluster stage)."""
    if not len(src_rows):
        return AffinityGraph(np.zeros(0, np.int32), np.zeros(0, np.int32),
                             np.zeros(0, np.float32),
                             np.zeros(0, np.int32), np.zeros(0, np.int32), 0)

    if _finalize_num_shards() > 1 and len(src_rows) >= SHARDED_FINALIZE_MIN:
        return _finalize_candidates_sharded(best, src_rows, tgt_rows, kinds,
                                            cws, cams, config, verbose)

    if len(src_rows) > NATIVE_SIM_THRESHOLD:
        from ..native.load import get_lib
        lib = get_lib()
        if lib is not None and hasattr(lib, "affinity_finalize"):
            return _finalize_candidates_native(
                lib, best, src_rows, tgt_rows, kinds, cws, cams, config,
                verbose)

    w = _candidate_weights_range(best, src_rows, tgt_rows, kinds, cws,
                                 cams, config, 0, len(src_rows))
    return _emit_graph(best, src_rows, tgt_rows, w, verbose)


def _finalize_num_shards() -> int:
    """Process count for the sharded finalize (1 when jax.distributed is
    not initialized or jax is unavailable in a host-only context)."""
    try:
        import jax
        return jax.process_count()
    except Exception:
        return 1


def _candidate_weights_range(best, src_rows, tgt_rows, kinds, cws,
                             cams, config, lo: int, hi: int) -> np.ndarray:
    """Thresholded edge weights for the candidate slice [lo, hi): w when it
    passes its kind's threshold, -1.0 sentinel otherwise.  Native OpenMP
    sweep (affinity_weights_range — identical double math), numpy twin
    below.  Dispatch is on the TOTAL stream length (not the slice length)
    so a sharded finalize uses the native kernel exactly when the
    single-host path would — otherwise numpy-vs-libm ulp drift would make
    marginal threshold passes depend on process count."""
    if len(src_rows) > NATIVE_SIM_THRESHOLD:
        from ..native.load import get_lib
        lib = get_lib()
        if lib is not None and hasattr(lib, "affinity_weights_range"):
            w = np.empty(hi - lo, np.float64)
            lib.affinity_weights_range(
                np.ascontiguousarray(src_rows, np.int64),
                np.ascontiguousarray(tgt_rows, np.int64),
                np.ascontiguousarray(kinds, np.int8),
                np.ascontiguousarray(cws, np.float64), lo, hi,
                np.ascontiguousarray(best.score, np.float32),
                np.ascontiguousarray(best.P1, np.float64),
                np.ascontiguousarray(best.P2, np.float64),
                np.ascontiguousarray(best.dir, np.float64),
                np.ascontiguousarray(best.d1, np.float32),
                np.ascontiguousarray(best.d2, np.float32),
                np.ascontiguousarray(best.view, np.int32),
                np.ascontiguousarray(cams.k_lower, np.float64),
                np.ascontiguousarray(cams.k_upper, np.float64),
                np.ascontiguousarray(cams.median_depth, np.float64),
                float(config.sigma_a), float(config.min_affinity),
                float(config.collinear_affinity), w)
            return w
    sl = slice(lo, hi)
    sim = similarity_coll3d(cams, best, src_rows[sl], tgt_rows[sl],
                            config.sigma_a)
    base = 0.5 * (best.score[src_rows[sl]].astype(np.float64) +
                  best.score[tgt_rows[sl]].astype(np.float64))
    w = np.where(kinds[sl] == 2, cws[sl], 1.0) * base * sim
    thr = np.where(kinds[sl] == 0, config.min_affinity,
                   config.collinear_affinity)
    return np.where(w > thr, w, -1.0)


def _finalize_candidates_sharded(best, src_rows, tgt_rows, kinds, cws,
                                 cams, config, verbose):
    """Multi-host finalize: the weight sweep — the dominant cluster-stage
    cost, ~10 s/1000 views single-host — is sharded by contiguous candidate
    range across processes and allgathered; the cheap sequential emission
    then runs identically on every host, so the graph stays host-replicated
    and bit-identical to the single-host path (tests/test_multihost.py).

    The candidate stream itself is host-replicated (the enumeration is the
    measured serial-exact Amdahl floor, ~5 s/1000 views — README.md), so no
    cross-host exchange of candidates is needed, only the [n/nproc] weight
    slices ride the DCN."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    n = len(src_rows)
    nproc = jax.process_count()
    per = -(-n // nproc)
    lo = min(jax.process_index() * per, n)
    hi = min(lo + per, n)
    w_local = np.full(per, -1.0, np.float64)
    if hi > lo:
        w_local[:hi - lo] = _candidate_weights_range(
            best, src_rows, tgt_rows, kinds, cws, cams, config, lo, hi)
    # Gather the raw f64 BITS as [per, 2] uint32 — jnp.asarray(f64) would
    # silently round the weights to f32 in transit (jax x64 is off), and
    # although pass/fail is decided pre-gather today, a future consumer of
    # the gathered weights (or a post-gather threshold) must see the exact
    # doubles the single-host path computes.
    bits = np.ascontiguousarray(w_local).view(np.uint32).reshape(per, 2)
    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(bits)))
    w = np.ascontiguousarray(gathered.reshape(-1, 2)).view(
        np.float64).reshape(-1)[:n]
    return _emit_graph(best, src_rows, tgt_rows, w, verbose)


def _emit_graph(best, src_rows, tgt_rows, w, verbose):
    """Emission-order graph assembly from sentinel weights (-1 = dropped):
    node ids at first touch + interleaved symmetric edges
    (line3D.cc:1019-1050).  Native sequential pass for large streams,
    numpy twin below (equivalence pinned in tests/test_affinity.py)."""
    if len(src_rows) > NATIVE_SIM_THRESHOLD:
        from ..native.load import get_lib
        lib = get_lib()
        if lib is not None and hasattr(lib, "affinity_emit"):
            n = len(src_rows)
            B = best.view.size
            edges_i = np.empty(2 * n, np.int32)
            edges_j = np.empty(2 * n, np.int32)
            edges_w = np.empty(2 * n, np.float32)
            node_rows = np.empty(B, np.int64)
            n_nodes = np.zeros(1, np.int64)
            E = lib.affinity_emit(
                np.ascontiguousarray(w, np.float64),
                np.ascontiguousarray(src_rows, np.int64),
                np.ascontiguousarray(tgt_rows, np.int64), n, B,
                edges_i, edges_j, edges_w, node_rows, n_nodes)
            nn = int(n_nodes[0])
            node_rows = node_rows[:nn]
            if verbose:
                print(f"[L3D] A: #num_entries = {2 * E}")
                print(f"[L3D] A: #num_rows    = {nn}")
            return AffinityGraph(
                edges_i=edges_i[:2 * E].copy(),
                edges_j=edges_j[:2 * E].copy(),
                edges_w=edges_w[:2 * E].copy(),
                node_view=best.view[node_rows].astype(np.int32),
                node_seg=best.seg[node_rows].astype(np.int32),
                num_nodes=nn)

    passed = w >= 0.0
    src_rows, tgt_rows, w = src_rows[passed], tgt_rows[passed], w[passed]

    # --- node ids in emission order ---------------------------------------
    # first-occurrence position per row via a reverse-order scatter (the
    # last store wins, so storing positions in reverse leaves the FIRST),
    # then sort only the ~#nodes first-positions — replaces an
    # np.unique(return_index) sort over the 2E-element stream (~5x at
    # 1000-view scale)
    seq = np.empty(2 * len(src_rows), np.int64)
    seq[0::2] = src_rows
    seq[1::2] = tgt_rows
    first_pos = np.full(best.view.size, -1, np.int64)
    first_pos[seq[::-1]] = np.arange(len(seq) - 1, -1, -1)
    rows_used = np.flatnonzero(first_pos >= 0)
    node_rows = rows_used[np.argsort(first_pos[rows_used], kind="stable")]
    node_of = np.full(best.view.size, -1, np.int64)
    node_of[node_rows] = np.arange(len(node_rows))

    a = node_of[src_rows]
    b = node_of[tgt_rows]
    E = len(a)
    ei = np.empty(2 * E, np.int32)
    ej = np.empty(2 * E, np.int32)
    ew = np.empty(2 * E, np.float32)
    ei[0::2] = a; ej[0::2] = b
    ei[1::2] = b; ej[1::2] = a
    ew[0::2] = w; ew[1::2] = w

    if verbose:
        print(f"[L3D] A: #num_entries = {len(ei)}")
        print(f"[L3D] A: #num_rows    = {len(node_rows)}")
    return AffinityGraph(
        edges_i=ei, edges_j=ej, edges_w=ew,
        node_view=best.view[node_rows].astype(np.int32),
        node_seg=best.seg[node_rows].astype(np.int32),
        num_nodes=len(node_rows))


def _finalize_candidates_native(lib, best, src_rows, tgt_rows, kinds, cws,
                                cams, config, verbose):
    """Fused native finalize (affinity_enum.cpp:affinity_finalize);
    edge-for-edge identical to the numpy tail (tests/test_affinity.py)."""
    n = len(src_rows)
    B = best.view.size
    edges_i = np.empty(2 * n, np.int32)
    edges_j = np.empty(2 * n, np.int32)
    edges_w = np.empty(2 * n, np.float32)
    node_rows = np.empty(B, np.int64)
    n_nodes = np.zeros(1, np.int64)
    E = lib.affinity_finalize(
        np.ascontiguousarray(src_rows, np.int64),
        np.ascontiguousarray(tgt_rows, np.int64),
        np.ascontiguousarray(kinds, np.int8),
        np.ascontiguousarray(cws, np.float64), n,
        np.ascontiguousarray(best.score, np.float32), B,
        np.ascontiguousarray(best.P1, np.float64),
        np.ascontiguousarray(best.P2, np.float64),
        np.ascontiguousarray(best.dir, np.float64),
        np.ascontiguousarray(best.d1, np.float32),
        np.ascontiguousarray(best.d2, np.float32),
        np.ascontiguousarray(best.view, np.int32),
        np.ascontiguousarray(cams.k_lower, np.float64),
        np.ascontiguousarray(cams.k_upper, np.float64),
        np.ascontiguousarray(cams.median_depth, np.float64),
        float(config.sigma_a), float(config.min_affinity),
        float(config.collinear_affinity),
        edges_i, edges_j, edges_w, node_rows, n_nodes)
    nn = int(n_nodes[0])
    node_rows = node_rows[:nn]
    if verbose:
        print(f"[L3D] A: #num_entries = {2 * E}")
        print(f"[L3D] A: #num_rows    = {nn}")
    return AffinityGraph(
        edges_i=edges_i[:2 * E].copy(), edges_j=edges_j[:2 * E].copy(),
        edges_w=edges_w[:2 * E].copy(),
        node_view=best.view[node_rows].astype(np.int32),
        node_seg=best.seg[node_rows].astype(np.int32),
        num_nodes=nn)


def _build_affinity_graph_native(lib, best, allp_packed, row_lookup, key_of,
                                 collin, cams, config, max_segments,
                                 verbose):
    """Native exact-order enumeration (native/affinity_enum.cpp): the
    reference's sequential traversal in C++ with an open-addressing pair
    set — ~20x the numpy stream formulation at 1000-view density.  Output
    is candidate-for-candidate identical to the loop/vec enumerators
    (tests/test_affinity.py).  Correspondence pairs stay in their packed
    a*M + b form end to end."""
    S = max_segments
    V = cams.num_views
    M = np.int64(V) * S
    ptr, coll_j, coll_w = _collin_csr(collin, V, S)
    coll_cnt = np.diff(ptr)

    order = np.ascontiguousarray(np.argsort(key_of, kind="stable"),
                                 np.int64)
    key_sorted = np.ascontiguousarray(key_of[order])
    pk = np.ascontiguousarray(allp_packed)
    ptr64 = np.ascontiguousarray(ptr, np.int64)
    # upper bound on candidates/insertions: every correspondence pair, its
    # target's collinear partners, and every source's collinear partners
    if hasattr(lib, "affinity_capacity"):
        coll_b = int(lib.affinity_capacity(pk, len(pk), ptr64, M))
    else:
        coll_b = int(coll_cnt[pk % M].sum())
    expected = int(len(pk) + coll_b + coll_cnt[key_sorted].sum())
    out_src = np.empty(expected, np.int64)
    out_tgt = np.empty(expected, np.int64)
    out_kind = np.empty(expected, np.int8)
    out_cw = np.empty(expected, np.float64)
    cnt = lib.affinity_enumerate_packed(
        key_sorted, order, len(order), pk, len(pk),
        np.ascontiguousarray(row_lookup, np.int64), ptr64,
        np.ascontiguousarray(coll_j, np.int64),
        np.ascontiguousarray(coll_w, np.float64),
        S, M, expected, out_src, out_tgt, out_kind, out_cw)
    return _finalize_candidates(best, out_src[:cnt], out_tgt[:cnt],
                                out_kind[:cnt], out_cw[:cnt],
                                cams, config, verbose)


def _correspondence_pairs_packed(matches: list, num_views: int,
                                 max_segments: int):
    """Sorted unique symmetric correspondence pairs PACKED as a*M + b over
    verified matches.  Packing makes the unique a single 1-D sort —
    np.unique(axis=0) on the 2-column form is ~15x slower at 1000-view
    scale — and the native enumerator consumes the packed form directly
    (unpacking to two columns costs two 30M-element divmod passes)."""
    S = max_segments
    M = np.int64(num_views) * S
    keys = []
    for vm in matches:
        a = vm.view * S + vm.src_seg.astype(np.int64)
        b = vm.tgt_view.astype(np.int64) * S + vm.tgt_seg.astype(np.int64)
        keys.append(a * M + b)
        keys.append(b * M + a)
    if not keys:
        return np.zeros(0, np.int64), M
    pk = np.ascontiguousarray(np.concatenate(keys))
    from ..native.load import get_lib
    lib = get_lib()
    if lib is not None and hasattr(lib, "sort_unique_i64") and len(pk):
        m = lib.sort_unique_i64(pk, len(pk))   # multi-core in-place
        pk = pk[:m]
    else:
        pk = np.unique(pk)
    return pk, M


def _correspondence_pairs(matches: list, num_views: int, max_segments: int):
    """Sorted unique symmetric (key_a, key_b) array (2-column form)."""
    pk, M = _correspondence_pairs_packed(matches, num_views, max_segments)
    if not len(pk):
        return np.zeros((0, 2), np.int64)
    return np.stack([pk // M, pk % M], axis=1)


def build_affinity_graph(best: BestMatches, matches: list,
                         collin: list | None, cams: CameraSet,
                         config: L3DConfig, max_segments: int,
                         verbose: bool = False,
                         force_loop: bool = False) -> AffinityGraph:
    S = max_segments
    B = best.view.size

    key_of = best.view.astype(np.int64) * S + best.seg.astype(np.int64)

    has_collin = collin is not None and any(len(c) for c in collin)
    if has_collin and not force_loop:
        pk, M = _correspondence_pairs_packed(matches, cams.num_views, S)
        row_lookup = np.full(cams.num_views * S, -1, np.int64)
        row_lookup[key_of] = np.arange(B)
        from ..native.load import get_lib
        lib = get_lib()
        if lib is not None and hasattr(lib, "affinity_enumerate_packed"):
            return _build_affinity_graph_native(
                lib, best, pk, row_lookup, key_of, collin, cams, config,
                S, verbose)
        allp = np.stack([pk // M, pk % M], axis=1) if len(pk) else \
            np.zeros((0, 2), np.int64)
        return _build_affinity_graph_vec(best, allp, row_lookup, key_of,
                                         collin, cams, config, S, verbose)

    adj = potential_correspondence_lists(matches, cams.num_views, S)
    # only the loop paths below need the python dict (O(B) to build —
    # megabytes at 1000-view scale, so not built for the vec/native paths)
    row_of = {int(k): r for r, k in enumerate(key_of)}

    def collin_partners(view: int, seg: int):
        if collin is None:
            return ()
        m = collin[view].get(seg)
        if not m:
            return ()
        return sorted(m.items())

    if not has_collin:
        return _build_affinity_graph_fast(best, adj, row_of, key_of, cams,
                                          config, verbose)

    # ---- enumeration (exact reference traversal order; kept as the
    # semantic reference for the vectorized path's equivalence test) ------
    used = set()
    cand_src, cand_tgt, cand_kind, cand_cw = [], [], [], []

    def consider(src_key, src_row, tgt_key, kind, cw=1.0):
        """Mark the unordered pair used and append a candidate if tgt has a
        best match.  Returns whether the pair was FRESH (unseen): a used
        pair is skipped before any marking (line3D.cc:1001-1004), and in
        the A loop the `continue` also skips the target's collinear
        expansion — the caller gates the B block on this return value."""
        pair = (src_key, tgt_key) if src_key < tgt_key else (tgt_key, src_key)
        if pair in used:
            return False
        used.add(pair)
        trow = row_of.get(tgt_key)
        if trow is not None:
            cand_src.append(src_row)
            cand_tgt.append(trow)
            cand_kind.append(kind)
            cand_cw.append(cw)
        return True

    order = np.argsort(key_of, kind="stable")
    for r in order:
        src_key = int(key_of[r])
        sview = int(best.view[r]); sseg = int(best.seg[r])
        for tgt_key in adj.get(src_key, ()):  # sorted ascending
            tgt_key = int(tgt_key)
            fresh = consider(src_key, r, tgt_key, 0)
            # B: collinear partners of tgt — only when the A pair was
            # fresh (the used-check `continue` skips this whole block,
            # line3D.cc:1001-1004) and tgt has a best match (the block is
            # nested inside the best_match_ check, line3D.cc:1007,1065)
            if fresh and tgt_key in row_of:
                tview, tseg = divmod(tgt_key, S)
                for cseg, _cw in collin_partners(tview, tseg):
                    consider(src_key, r, tview * S + int(cseg), 1)
        # C: src's own collinear partners
        for cseg, cw in collin_partners(sview, sseg):
            consider(src_key, r, sview * S + int(cseg), 2, float(cw))

    if not cand_src:
        return AffinityGraph(np.zeros(0, np.int32), np.zeros(0, np.int32),
                             np.zeros(0, np.float32),
                             np.zeros(0, np.int32), np.zeros(0, np.int32), 0)

    src_rows = np.asarray(cand_src, np.int64)
    tgt_rows = np.asarray(cand_tgt, np.int64)
    kinds = np.asarray(cand_kind, np.int8)
    cws = np.asarray(cand_cw, np.float64)

    sim = similarity_coll3d(cams, best, src_rows, tgt_rows, config.sigma_a)
    base = 0.5 * (best.score[src_rows].astype(np.float64) +
                  best.score[tgt_rows].astype(np.float64))
    w = np.where(kinds == 2, cws, 1.0) * base * sim
    thr = np.where(kinds == 0, config.min_affinity, config.collinear_affinity)
    keep = w > thr

    # ---- local id assignment in emission order (line3D.cc:1019-1050) -----
    node_of_row = {}
    node_view, node_seg = [], []
    ei, ej, ew = [], [], []

    def node_id(row):
        nid = node_of_row.get(row)
        if nid is None:
            nid = len(node_view)
            node_of_row[row] = nid
            node_view.append(int(best.view[row]))
            node_seg.append(int(best.seg[row]))
        return nid

    for idx in np.nonzero(keep)[0]:
        a = node_id(int(src_rows[idx]))
        b = node_id(int(tgt_rows[idx]))
        wv = float(w[idx])
        ei.append(a); ej.append(b); ew.append(wv)
        ei.append(b); ej.append(a); ew.append(wv)

    if verbose:
        print(f"[L3D] A: #num_entries = {len(ei)}")
        print(f"[L3D] A: #num_rows    = {len(node_view)}")

    return AffinityGraph(
        edges_i=np.asarray(ei, np.int32), edges_j=np.asarray(ej, np.int32),
        edges_w=np.asarray(ew, np.float32),
        node_view=np.asarray(node_view, np.int32),
        node_seg=np.asarray(node_seg, np.int32),
        num_nodes=len(node_view))
