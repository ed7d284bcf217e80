"""BSP vertex kernels — the algorithm plugin surface.

Python analog of Totem's ``engine_config_t`` callback bundle
(ss_kernel / par_kernel / scatter / gather / init / finalize / aggr,
src/totem/totem_engine.cuh:114-124): a kernel is a class of
staticmethods over a GraphShard's CSR state. Register new kernels in
``KERNELS`` — the user-extension surface (SURVEY.md §2.11).

Message discipline: ``compute`` returns one DENSE numpy array per
remote partition, aligned to the shard's sorted ghost-id list (the
grooves outbox, totem_grooves.h:39-50); ``apply`` scatters inboxes
into local state via the precomputed ``inbox_maps`` (the
engine_scatter_inbox_{add,min} reductions,
totem_engine_internal.cuh:116-183).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from totem_ray.nputil import group_ordinal as _group_ordinal
from totem_ray.nputil import group_starts_sizes as _group_starts
from totem_ray.nputil import slice_gather

I64MAX = np.iinfo(np.int64).max


class PageRankKernel:
    """PageRank, push direction.

    Two modes:
    * ``mode='rounds'`` — reference parity: exactly ``rounds``
      supersteps, damping 0.85, init 1/|V|; round 0 pushes the RAW
      rank (not degree-normalized), intermediate rounds store r/deg
      (zero-out-degree guarded as in the hybrid,
      totem_page_rank_hybrid.cu:153-154), the final round stores the
      unnormalized rank — exactly page_rank_cpu,
      src/alg/totem_page_rank.cu:351-409 (PAGE_RANK_ROUNDS=5 and
      damping, src/alg/totem_alg.h:60,70).
    * ``mode='converge'`` — the north-rule upgrade: standard power
      iteration (contrib = r/deg every round, no dangling-mass
      redistribution, same as the reference's math from round 1 on),
      float64, until the L1 residual sum|r_k - r_{k-1}| <= tol.
    """

    name = "pagerank"
    needs_total_vertices = True

    @staticmethod
    def init(sh, st, total_vertices: int = 0, damping: float = 0.85,
             mode: str = "converge", rounds: int = 5, tol: float = 1e-6):
        st["N"] = int(total_vertices)
        st["d"] = float(damping)
        st["mode"] = mode
        st["rounds"] = int(rounds)
        st["tol"] = float(tol)
        init = 1.0 / st["N"] if st["N"] else 0.0
        st["rank"] = np.full(sh.nv, init, dtype=np.float64)

    @staticmethod
    def _push_values(sh, st, superstep: int) -> np.ndarray:
        if st["mode"] == "rounds":
            # stored rank is already normalized after round 0
            return st["rank"]
        out = np.zeros(sh.nv, dtype=np.float64)
        nz = sh.out_deg > 0
        out[nz] = st["rank"][nz] / sh.out_deg[nz]
        return out

    @classmethod
    def compute(cls, sh, st, superstep: int):
        contrib = cls._push_values(sh, st, superstep)
        acc = np.zeros(sh.nv, dtype=np.float64)
        outboxes = {}
        for t, tgt in sh.tgt.items():
            vals = contrib[tgt["src"]]
            if t == sh.pid:
                acc += np.bincount(tgt["dst"], weights=vals, minlength=sh.nv)
            else:
                outboxes[t] = np.bincount(tgt["dst"], weights=vals,
                                          minlength=tgt["size"])
        st["acc"] = acc
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        acc = st.pop("acc")
        for p, arr in inboxes.items():
            # inbox_maps[p] is strictly increasing (unique): buffered
            # fancy-index += replaces the ~10x-slower unbuffered ufunc
            acc[sh.inbox_maps[p]] += arr  # one dense slot per sender
        N, d = st["N"], st["d"]
        # N==0 tolerated like init (empty graph -> no ranks to update)
        r_new = ((1.0 - d) / N if N else 0.0) + d * acc
        if st["mode"] == "rounds":
            if superstep < st["rounds"] - 1:
                stored = r_new.copy()
                nz = sh.out_deg > 0
                stored[nz] = r_new[nz] / sh.out_deg[nz]
            else:
                stored = r_new
            st["rank"] = stored
            return {"residual": float("inf"), "changed": sh.nv}
        resid = float(np.abs(r_new - st["rank"]).sum())
        st["rank"] = r_new
        return {"residual": resid, "changed": sh.nv}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        if st_params.get("mode", "converge") == "rounds":
            return superstep + 1 >= st_params.get("rounds", 5)
        return agg["residual"] <= st_params.get("tol", 1e-6)

    @staticmethod
    def done_static(superstep: int, st_params: dict):
        """Rounds mode terminates at a statically-known superstep —
        lets the fused loop skip the final discarded compute."""
        if st_params.get("mode", "converge") == "rounds":
            return superstep + 1 >= st_params.get("rounds", 5)
        return None

    @staticmethod
    def result(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "rank": pa.array(st["rank"], type=pa.float64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "rank": pa.array(st["rank"], type=pa.float64())})

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        v = np.asarray(t["v"])
        r = np.asarray(t["rank"], dtype=np.float64)
        idx = np.searchsorted(sh.verts, v)
        rank = np.array(st["rank"])
        rank[idx] = r
        st["rank"] = rank


class PageRankPullKernel:
    """PageRank, pull direction — the variant the reference benchmark
    actually runs (page_rank_incoming_hybrid,
    src/benchmark/totem_benchmark_binary.cu:202-205, GROOVES_PULL).

    Requires an engine built with ``route_by='dst'``: each superstep a
    shard publishes ONE contrib vector over its own vertices
    (broadcast_outbox) and gathers from the P vectors through its
    precomputed in-edge (owner, index) groups — per-superstep message
    volume is V floats total instead of P*V dense ghost slots, and
    co-located readers share each vector zero-copy. Math identical to
    PageRankKernel (same modes, same normalized-intermediate trick).
    """

    name = "pagerank_pull"
    needs_total_vertices = True
    broadcast_outbox = True

    init = None  # bound below (same params/behavior as push)

    @staticmethod
    def compute(sh, st, superstep: int) -> np.ndarray:
        if st["mode"] == "rounds":
            return st["rank"]  # already normalized after round 0
        out = np.zeros(sh.nv, dtype=np.float64)
        nz = sh.pull_out_deg > 0
        out[nz] = st["rank"][nz] / sh.pull_out_deg[nz]
        return out

    @classmethod
    def apply(cls, sh, st, inboxes, superstep: int) -> dict:
        acc = np.zeros(sh.nv, dtype=np.float64)
        for p, grp in sh.pull_src.items():
            vec = inboxes.get(p)
            if vec is None:
                # self-edges when the broadcast skipped own group:
                # recompute the pre-apply contrib locally
                vec = cls.compute(sh, st, superstep)
            acc += np.bincount(grp["dst"], weights=vec[grp["sidx"]],
                               minlength=sh.nv)
        N, d = st["N"], st["d"]
        # N==0 tolerated like init (empty graph -> no ranks to update)
        r_new = ((1.0 - d) / N if N else 0.0) + d * acc
        if st["mode"] == "rounds":
            if superstep < st["rounds"] - 1:
                stored = r_new.copy()
                nz = sh.pull_out_deg > 0
                stored[nz] = r_new[nz] / sh.pull_out_deg[nz]
            else:
                stored = r_new
            st["rank"] = stored
            return {"residual": float("inf"), "changed": sh.nv}
        resid = float(np.abs(r_new - st["rank"]).sum())
        st["rank"] = r_new
        return {"residual": resid, "changed": sh.nv}

    done = None  # bound below
    result = None
    state_table = None
    load_state = None


PageRankPullKernel.init = PageRankKernel.init
PageRankPullKernel.done = PageRankKernel.done
PageRankPullKernel.result = PageRankKernel.result
PageRankPullKernel.state_table = PageRankKernel.state_table
PageRankPullKernel.load_state = PageRankKernel.load_state


class ConnectedComponentsKernel:
    """Hash-min label propagation (cc_hybrid,
    src/alg/totem_cc_hybrid.cu): label init = the vertex's own global
    id (:392-396), every superstep min-combines labels across edges
    (:51-79 local, :239-263 remote scatter with min), terminating when
    no label changes anywhere (:74-78). Converged labels = minimum
    vertex id in each (weakly, as-given-adjacency) component — on a
    symmetrized graph, the connected component (tests pin exact ids,
    src/test/totem_cc_unittest.cu:114-142).

    Frontier discipline mirrors the reference's updated-bitmap
    (totem_cc_hybrid.cu:51-79): only vertices whose label CHANGED in
    the previous superstep re-send (min is monotone, so a neighbor has
    already absorbed every label version an unchanged sender could
    offer). Messages are sparse (dst, min-label) pairs, so per-
    superstep volume tracks the shrinking frontier instead of O(E).
    """

    name = "connected_components"

    @staticmethod
    def init(sh, st):
        st["label"] = sh.verts.copy()
        st["frontier"] = np.ones(sh.nv, dtype=bool)

    @staticmethod
    def compute(sh, st, superstep: int):
        lab, frontier = st["label"], st["frontier"]
        st["cand"] = (np.empty(0, np.int64), np.empty(0, np.int64))
        outboxes = {}
        for t, tgt in sh.tgt.items():
            m = frontier[tgt["src"]]
            if not m.any():
                continue
            d = tgt["dst"][m]
            vals = lab[tgt["src"][m]]
            ud, red = _seg_min_sparse(d, vals)
            if t == sh.pid:
                st["cand"] = (ud, red)
            else:
                outboxes[t] = _min_outbox(ud, red, tgt["size"], I64MAX)
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        cand_i, cand_v = st.pop("cand")
        cand = np.full(sh.nv, I64MAX, dtype=np.int64)
        if len(cand_i):
            cand[cand_i] = cand_v
        for p, msg in inboxes.items():
            _apply_min_inbox(cand, sh.inbox_maps[p], msg, I64MAX)
        better = cand < st["label"]
        st["label"] = np.where(better, cand, st["label"])
        st["frontier"] = better
        return {"changed": int(better.sum())}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["changed"] == 0

    @staticmethod
    def result(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "label": pa.array(st["label"], type=pa.int64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "label": pa.array(st["label"], type=pa.int64()),
                         "frontier": pa.array(st["frontier"])})

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        v = np.asarray(t["v"])
        lab = np.asarray(t["label"], dtype=np.int64)
        idx = np.searchsorted(sh.verts, v)
        cur = np.array(st["label"])
        cur[idx] = lab
        st["label"] = cur
        if "frontier" in t.column_names:
            fr = np.zeros(sh.nv, dtype=bool)
            fr[idx] = np.asarray(t["frontier"], dtype=bool)
            st["frontier"] = fr


class LabelPropagationKernel:
    """Community label propagation (LabelRank-lite, [Xie 2013]) —
    sparse reformulation of label_propagation_cpu
    (src/alg/totem_label_propagation.cu:82-217).

    The reference holds a dense |V| x |V| probability matrix
    (:176-186); at web scale that is infeasible and the matrix is
    sparse in practice, so state here is a per-shard COO table
    (vertex -> [(label, prob)...]) with optional per-vertex support
    cap for scale (``max_support``; None = exact, used for
    reference-parity fixtures).

    Exact semantics preserved:
    * init P[v][v] = 1, P[v][nbr] = 1/deg(v) (net effect of
      :86-98's overwrite order);
    * round: P'[v][l] = sum_nbr P[nbr][l] / deg(v) (:100-118),
      neighbor multiplicity counted;
    * new label = argmax with strict-``>`` scan from label index 0 —
      i.e. the LOWEST label id achieving the max (:120-145);
    * per-vertex stability counters; terminate when every counter
      >= 5 or after 25 rounds (:17-18, :195-215).

    Determinism: contributions are summed in (neighbor-id, then
    label) order via a lexsort before reduceat, so sums are bitwise
    identical under every partitioning (the reference's adjacency-
    order accumulation, guaranteed by sorted CSR neighbors).

    Pull-direction messages: each round a shard exports the state rows
    of the vertices its peers reference (GROOVES_PULL gather,
    totem_page_rank_incoming_hybrid.cu:290-294).
    """

    name = "label_propagation"

    MAX_ITERATIONS = 25          # totem_label_propagation.cu:17
    STABLE_ROUNDS = 5            # totem_label_propagation.cu:18

    @staticmethod
    def init(sh, st, max_support: int | None = None,
             max_iterations: int | None = None):
        st["max_support"] = max_support
        st["max_iterations"] = max_iterations or LabelPropagationKernel.MAX_ITERATIONS
        # init: diag 1 + neighbor slots 1/deg (overwrite order of
        # totem_label_propagation.cu:86-98: the neighbor slot wins, so
        # a self-loop vertex gets P[v][v] = 1/deg, not 1). Vectorized:
        # one (v, nbr_gid) pair per edge, deduped; diag rows added for
        # vertices whose own id is not among their neighbors.
        e_v = np.repeat(np.arange(sh.nv, dtype=np.int64), np.diff(sh.adj_indptr))
        gids = np.empty(sh.ne, dtype=np.int64)
        for t in range(sh.P):
            m = sh.adj_owner == t
            if not m.any():
                continue
            src_ids = sh.verts if t == sh.pid else sh.ghosts[t]
            gids[m] = src_ids[sh.adj_idx[m]]
        pairs = np.stack([e_v, gids], axis=1)
        if len(pairs):
            pairs = np.unique(pairs, axis=0)
        row_v, row_l = pairs[:, 0], pairs[:, 1]
        row_p = 1.0 / sh.out_deg[row_v].astype(np.float64)
        is_self = row_l == sh.verts[row_v]
        has_self = np.zeros(sh.nv, dtype=bool)
        has_self[row_v[is_self]] = True
        diag_v = np.flatnonzero(~has_self).astype(np.int64)
        row_v = np.concatenate([row_v, diag_v])
        row_l = np.concatenate([row_l, sh.verts[diag_v]])
        row_p = np.concatenate([row_p, np.ones(len(diag_v), dtype=np.float64)])
        order = np.lexsort((row_l, row_v))
        st["row_v"], st["row_l"], st["row_p"] = \
            row_v[order], row_l[order], row_p[order]
        st["label"] = sh.verts.copy()
        st["stable"] = np.zeros(sh.nv, dtype=np.int64)

    @staticmethod
    def _vptr(sh, st):
        return np.searchsorted(st["row_v"], np.arange(sh.nv + 1))

    @classmethod
    def compute(cls, sh, st, superstep: int):
        """Export state rows for each peer's ghost list (pull gather)."""
        vptr = cls._vptr(sh, st)
        outboxes = {}
        for p, idx_arr in sh.inbox_maps.items():
            counts = vptr[idx_arr + 1] - vptr[idx_arr]
            total = int(counts.sum())
            gather = slice_gather(vptr[idx_arr], counts) if total \
                else np.empty(0, np.int64)
            pos = np.repeat(np.arange(len(idx_arr), dtype=np.int64), counts)
            outboxes[p] = (pos, st["row_l"][gather], st["row_p"][gather])
        st["_vptr"] = vptr
        return outboxes

    @classmethod
    def apply(cls, sh, st, inboxes, superstep: int) -> dict:
        vptr = st.pop("_vptr")
        # ghost state tables per owner: (gptr, labels, probs) aligned
        # to sh.ghosts[q]
        gstate = {}
        for q, (pos, labs, probs) in inboxes.items():
            size = len(sh.ghosts[q])
            cnt = np.bincount(pos, minlength=size)
            gptr = np.concatenate([[0], np.cumsum(cnt)])
            gstate[q] = (gptr.astype(np.int64), labs, probs)

        # expand: one row per (edge, neighbor-state-entry)
        exp_v, exp_l, exp_p, exp_n = [], [], [], []
        # CSR constant — build the O(E) src-expansion ONCE per
        # superstep, not once per owner partition
        e_v_full = np.repeat(np.arange(sh.nv), np.diff(sh.adj_indptr))
        for t in range(sh.P):
            m = sh.adj_owner == t
            if not m.any():
                continue
            e_v = e_v_full[m]
            e_i = sh.adj_idx[m]
            if t == sh.pid:
                ptr, labs, probs = vptr, st["row_l"], st["row_p"]
                nbr_ids = sh.verts[e_i]
            else:
                ptr, labs, probs = gstate[t]
                nbr_ids = sh.ghosts[t][e_i]
            counts = ptr[e_i + 1] - ptr[e_i]
            gather = slice_gather(ptr[e_i], counts)
            exp_v.append(np.repeat(e_v, counts))
            exp_l.append(labs[gather])
            exp_p.append(probs[gather])
            exp_n.append(np.repeat(nbr_ids, counts))
        if exp_v:
            V = np.concatenate(exp_v)
            L = np.concatenate(exp_l)
            Pr = np.concatenate(exp_p)
            Nb = np.concatenate(exp_n)
            # deterministic order: (v, label, neighbor-id)
            order = np.lexsort((Nb, L, V))
            V, L, Pr = V[order], L[order], Pr[order]
            key_change = np.flatnonzero((np.diff(V) != 0) | (np.diff(L) != 0)) + 1
            starts = np.concatenate([[0], key_change])
            gv = V[starts]
            gl = L[starts]
            gp = np.add.reduceat(Pr, starts)
            deg = sh.out_deg[gv].astype(np.float64)
            gp = gp / deg
        else:
            gv = np.empty(0, np.int64)
            gl = np.empty(0, np.int64)
            gp = np.empty(0, np.float64)

        # optional support cap for web scale (documented truncation)
        cap = st["max_support"]
        if cap is not None and len(gv):
            order = np.lexsort((gl, -gp, gv))  # per v: prob desc, label asc
            gv, gl, gp = gv[order], gl[order], gp[order]
            pos_in_group = _group_ordinal(gv)
            keep = pos_in_group < cap
            gv, gl, gp = gv[keep], gl[keep], gp[keep]
            order = np.lexsort((gl, gv))
            gv, gl, gp = gv[order], gl[order], gp[order]

        st["row_v"], st["row_l"], st["row_p"] = gv, gl, gp

        # argmax with strict-> scan => lowest label id at max prob
        new_label = sh.verts.copy()  # isolated vertices keep own label
        if len(gv):
            starts, sizes = _group_starts(gv)
            gmax = np.maximum.reduceat(gp, starts)
            is_max = gp == np.repeat(gmax, sizes)
            grp_of_row = np.repeat(np.arange(len(starts)), sizes)
            _, first_idx = np.unique(grp_of_row[is_max], return_index=True)
            winners_rows = np.flatnonzero(is_max)[first_idx]
            new_label[gv[starts]] = gl[winners_rows]

        same = new_label == st["label"]
        st["stable"] = np.where(same, st["stable"] + 1, 0)
        st["label"] = new_label
        not_stable = int((st["stable"] < LabelPropagationKernel.STABLE_ROUNDS).sum())
        return {"changed": not_stable, "not_stable": not_stable}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        max_it = st_params.get("max_iterations") or LabelPropagationKernel.MAX_ITERATIONS
        return agg["not_stable"] == 0 or superstep + 1 >= max_it

    @staticmethod
    def result(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "label": pa.array(st["label"], type=pa.int64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        # zero-loop list columns: one offsets vector + the flat value
        # arrays (the per-vertex Python slice/tolist loop this replaces
        # was O(nv) interpreted work per checkpoint interval)
        vptr = np.searchsorted(st["row_v"], np.arange(sh.nv + 1))
        # large_list: int64 offsets — a web-scale shard's flat support
        # rows can exceed int32
        offs = pa.array(vptr.astype(np.int64))
        return pa.table({
            "v": pa.array(sh.verts, type=pa.int64()),
            "label": pa.array(st["label"], type=pa.int64()),
            "stable": pa.array(st["stable"], type=pa.int64()),
            "support_l": pa.LargeListArray.from_arrays(
                offs, pa.array(st["row_l"], type=pa.int64())),
            "support_p": pa.LargeListArray.from_arrays(
                offs, pa.array(st["row_p"], type=pa.float64())),
        })

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        v = np.asarray(t["v"])
        idx = np.searchsorted(sh.verts, v)
        assert np.array_equal(sh.verts[idx], v)
        lab = np.array(st["label"])
        stab = np.array(st["stable"])
        lab[idx] = np.asarray(t["label"])
        stab[idx] = np.asarray(t["stable"])
        st["label"], st["stable"] = lab, stab
        # decode via the ListArray's flat values + offsets (iterating
        # the column yields pyarrow scalars numpy cannot coerce — the
        # old per-scalar np.asarray loop crashed every restore)
        sup_l = t["support_l"].combine_chunks()
        sup_p = t["support_p"].combine_chunks()
        loff = np.asarray(sup_l.offsets, dtype=np.int64)
        counts = np.diff(loff)
        row_v = np.repeat(idx, counts)
        row_l = np.asarray(sup_l.flatten(), dtype=np.int64)
        row_p = np.asarray(sup_p.flatten(), dtype=np.float64)
        order = np.lexsort((row_l, row_v))
        st["row_v"], st["row_l"], st["row_p"] = \
            row_v[order], row_l[order], row_p[order]


class DegreeKernel:
    """Toy in-degree-by-message kernel, mirroring the reference's
    engine unit-test algorithm (totem_engine_unittest.cu:159-174):
    every vertex pushes 1 to each neighbor; after one superstep each
    vertex holds its in-degree. Used to validate the message plumbing.
    """

    name = "degree"

    @staticmethod
    def init(sh, st):
        st["indeg"] = np.zeros(sh.nv, dtype=np.float64)

    @staticmethod
    def compute(sh, st, superstep: int):
        ones = np.ones(sh.nv, dtype=np.float64)
        acc = np.zeros(sh.nv, dtype=np.float64)
        outboxes = {}
        for t, tgt in sh.tgt.items():
            vals = ones[tgt["src"]]
            if t == sh.pid:
                acc += np.bincount(tgt["dst"], weights=vals, minlength=sh.nv)
            else:
                outboxes[t] = np.bincount(tgt["dst"], weights=vals,
                                          minlength=tgt["size"])
        st["acc"] = acc
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        acc = st.pop("acc")
        for p, arr in inboxes.items():
            acc[sh.inbox_maps[p]] += arr  # unique slots: buffered +=
        st["indeg"] = acc
        return {"changed": 0}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return True

    @staticmethod
    def done_static(superstep: int, st_params: dict):
        return True

    @staticmethod
    def result(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "in_degree": pa.array(st["indeg"].astype(np.int64))})

    state_table = result

    @staticmethod
    def load_state(sh, st, t):
        idx = np.searchsorted(sh.verts, np.asarray(t["v"]))
        st["indeg"][idx] = np.asarray(t["in_degree"], dtype=np.float64)


def _seg_min_sparse(dst: np.ndarray, vals: np.ndarray):
    """dst must be sorted ascending; -> (unique_dst, min val per dst)."""
    starts, _ = _group_starts(dst)
    return dst[starts], np.minimum.reduceat(vals, starts)


def _seg_reduceat(ufunc, arr: np.ndarray, indptr: np.ndarray, identity):
    """Segmented ``ufunc.reduceat`` over CSR ``indptr`` that is SAFE
    for empty segments ANYWHERE, including trailing zero-degree
    vertices: reduceat runs over the non-empty segments only — their
    retained starts are strictly increasing and < len(arr), and each
    retained segment's true end equals the next retained start (an
    empty segment shares its successor's start). The clamp idiom this
    replaces (``np.minimum(indptr[:-1], len(arr) - 1)``) silently
    TRUNCATED the last edge-owning vertex's segment whenever trailing
    empty segments existed, dropping its final edge from the
    reduction. Empty segments get ``identity``."""
    out = np.full(len(indptr) - 1, identity, dtype=arr.dtype)
    nz = indptr[:-1] < indptr[1:]
    if nz.any():
        out[nz] = ufunc.reduceat(arr, indptr[:-1][nz])
    return out


def _min_outbox(ud, red, size: int, fill):
    """Message format choice for min-combine scatters: sparse
    (slot, val) pairs while the frontier is thin, ONE dense per-slot
    value array when more than half the target's ghost slots are
    touched (8 B/slot beats 16 B/pair) — the Ray analog of the
    reference's dense bitmap scatter in early CC rounds
    (totem_cc_hybrid.cu:239-263) and engine_report_no_comm's
    format switching (totem_bfs_hybrid.cu:58-76)."""
    if 2 * len(ud) > size:
        arr = np.full(size, fill, dtype=red.dtype)
        arr[ud] = red
        return arr
    return (ud, red)


def _apply_min_inbox(cand: np.ndarray, imap: np.ndarray, msg, fill):
    """Min-combine one inbox message (sparse pair tuple or dense
    per-slot array) into the candidate vector. Slots are unique, so
    fancy-index min assignment replaces np.minimum.at (~10x faster)."""
    if isinstance(msg, np.ndarray):
        m = msg < fill
        idx = imap[m]
        cand[idx] = np.minimum(cand[idx], msg[m])
    else:
        ud, red = msg
        idx = imap[ud]
        cand[idx] = np.minimum(cand[idx], red)


class BfsKernel:
    """Level-synchronous BFS (bfs_hybrid, src/alg/totem_bfs.cu /
    totem_bfs_hybrid.cu): cost[source]=0, each superstep every frontier
    vertex offers cost+1 to its neighbors with a min-combine (the 1-bit
    push messages + visited bitmaps of totem_benchmark_binary.cu:32,
    totem_bfs_hybrid.cu:58-76 become sparse (dst, level) pairs —
    message volume tracks the frontier, the engine_report_no_comm
    optimization). Terminates when the frontier empties. Unreachable
    vertices report cost -1 (the INF_COST sentinel, totem_alg.h:21-22).
    """

    name = "bfs"

    @staticmethod
    def init(sh, st, source: int):
        st["source"] = int(source)
        cost = np.full(sh.nv, I64MAX, dtype=np.int64)
        frontier = np.zeros(sh.nv, dtype=bool)
        i = np.searchsorted(sh.verts, source)
        if i < sh.nv and sh.verts[i] == source:
            cost[i] = 0
            frontier[i] = True
        st["cost"], st["frontier"] = cost, frontier

    @staticmethod
    def compute(sh, st, superstep: int):
        cost, frontier = st["cost"], st["frontier"]
        cand_i = np.empty(0, dtype=np.int64)
        cand_v = np.empty(0, dtype=np.int64)
        outboxes = {}
        for t, tgt in sh.tgt.items():
            m = frontier[tgt["src"]]
            if not m.any():
                continue
            d = tgt["dst"][m]
            vals = cost[tgt["src"][m]] + 1
            ud, red = _seg_min_sparse(d, vals)
            if t == sh.pid:
                cand_i, cand_v = ud, red
            else:
                outboxes[t] = _min_outbox(ud, red, tgt["size"], I64MAX)
        st["cand"] = (cand_i, cand_v)
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        cand_i, cand_v = st.pop("cand")
        cand = np.full(sh.nv, I64MAX, dtype=np.int64)
        if len(cand_i):
            cand[cand_i] = cand_v
        for p, msg in inboxes.items():
            _apply_min_inbox(cand, sh.inbox_maps[p], msg, I64MAX)
        better = cand < st["cost"]
        st["cost"] = np.where(better, cand, st["cost"])
        st["frontier"] = better
        return {"changed": int(better.sum())}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["changed"] == 0

    @staticmethod
    def result(sh, st) -> pa.Table:
        cost = np.where(st["cost"] >= I64MAX, -1, st["cost"])
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "cost": pa.array(cost, type=pa.int64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "cost": pa.array(st["cost"], type=pa.int64()),
                         "frontier": pa.array(st["frontier"])})

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        idx = np.searchsorted(sh.verts, np.asarray(t["v"]))
        st["cost"][idx] = np.asarray(t["cost"], dtype=np.int64)
        st["frontier"][idx] = np.asarray(t["frontier"], dtype=bool)


class Graph500Kernel:
    """BFS tree (graph500_hybrid, src/alg/totem_graph500*.cu): like
    BFS but messages carry (level, parent-id) and the combine is the
    lexicographic min, so every vertex records its level and the
    MINIMUM-id parent among its level-1 predecessors (the reference
    accepts any valid parent; pinning min makes the output
    deterministic under every partitioning). Root's parent = itself.
    """

    name = "bfs_tree"

    @staticmethod
    def init(sh, st, source: int):
        st["source"] = int(source)
        cost = np.full(sh.nv, I64MAX, dtype=np.int64)
        parent = np.full(sh.nv, -1, dtype=np.int64)
        frontier = np.zeros(sh.nv, dtype=bool)
        i = np.searchsorted(sh.verts, source)
        if i < sh.nv and sh.verts[i] == source:
            cost[i] = 0
            parent[i] = source
            frontier[i] = True
        st["cost"], st["parent"], st["frontier"] = cost, parent, frontier

    @staticmethod
    def _lexmin_per_dst(d, c, p):
        order = np.lexsort((p, c, d))
        d, c, p = d[order], c[order], p[order]
        starts, _ = _group_starts(d)
        return d[starts], c[starts], p[starts]

    @classmethod
    def compute(cls, sh, st, superstep: int):
        cost, frontier = st["cost"], st["frontier"]
        st["cand"] = (np.empty(0, np.int64),) * 3
        outboxes = {}
        for t, tgt in sh.tgt.items():
            m = frontier[tgt["src"]]
            if not m.any():
                continue
            src_i = tgt["src"][m]
            trip = cls._lexmin_per_dst(tgt["dst"][m], cost[src_i] + 1,
                                       sh.verts[src_i])
            if t == sh.pid:
                st["cand"] = trip
            else:
                outboxes[t] = trip
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        cand_c = np.full(sh.nv, I64MAX, dtype=np.int64)
        cand_p = np.full(sh.nv, I64MAX, dtype=np.int64)
        ud, c, p = st.pop("cand")
        pieces = [(ud, c, p)] + \
            [(sh.inbox_maps[q][u], cc, pp) for q, (u, cc, pp) in inboxes.items()]
        for idx, cc, pp in pieces:
            if not len(idx):
                continue
            bc = cand_c[idx]
            better = (cc < bc) | ((cc == bc) & (pp < cand_p[idx]))
            # idx may repeat across pieces but not within one (lexmin'd);
            # sequential per-piece update keeps the min pair
            cand_c[idx[better]] = cc[better]
            cand_p[idx[better]] = pp[better]
        # all same-cost candidates for a vertex arrive in one apply (the
        # lexmin above already picked the min parent among them), so a
        # plain < on cost is the full settle rule
        better = cand_c < st["cost"]
        st["cost"] = np.where(better, cand_c, st["cost"])
        st["parent"] = np.where(better, cand_p, st["parent"])
        st["frontier"] = better
        return {"changed": int(better.sum())}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["changed"] == 0

    @staticmethod
    def result(sh, st) -> pa.Table:
        cost = np.where(st["cost"] >= I64MAX, -1, st["cost"])
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "cost": pa.array(cost, type=pa.int64()),
                         "parent": pa.array(st["parent"], type=pa.int64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "cost": pa.array(st["cost"], type=pa.int64()),
                         "parent": pa.array(st["parent"], type=pa.int64()),
                         "frontier": pa.array(st["frontier"])})

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        idx = np.searchsorted(sh.verts, np.asarray(t["v"]))
        st["cost"][idx] = np.asarray(t["cost"], dtype=np.int64)
        st["parent"][idx] = np.asarray(t["parent"], dtype=np.int64)
        st["frontier"][idx] = np.asarray(t["frontier"], dtype=bool)


class SsspKernel:
    """Single-source shortest paths, Bellman-Ford-style frontier
    relaxation (sssp_hybrid, src/alg/totem_sssp.cu /
    totem_sssp_hybrid.cu): each superstep every vertex whose distance
    improved relaxes its out-edges, messages are sparse
    (dst, dist+weight) pairs with a min-combine (the 33-bit min-scatter
    messages, totem_benchmark_binary.cu:48-58). Unweighted graphs use
    weight 1 (totem_graph.h:95). Terminates when no distance improves;
    unreachable vertices report +inf.
    """

    name = "sssp"

    @staticmethod
    def init(sh, st, source: int):
        st["source"] = int(source)
        dist = np.full(sh.nv, np.inf, dtype=np.float64)
        frontier = np.zeros(sh.nv, dtype=bool)
        i = np.searchsorted(sh.verts, source)
        if i < sh.nv and sh.verts[i] == source:
            dist[i] = 0.0
            frontier[i] = True
        st["dist"], st["frontier"] = dist, frontier

    @staticmethod
    def compute(sh, st, superstep: int):
        dist, frontier = st["dist"], st["frontier"]
        st["cand"] = (np.empty(0, np.int64), np.empty(0, np.float64))
        outboxes = {}
        for t, tgt in sh.tgt.items():
            m = frontier[tgt["src"]]
            if not m.any():
                continue
            d = tgt["dst"][m]
            w = tgt["w"][m] if "w" in tgt else 1.0
            vals = dist[tgt["src"][m]] + w
            ud, red = _seg_min_sparse(d, vals)
            if t == sh.pid:
                st["cand"] = (ud, red)
            else:
                outboxes[t] = _min_outbox(ud, red, tgt["size"], np.inf)
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        cand_i, cand_v = st.pop("cand")
        cand = np.full(sh.nv, np.inf, dtype=np.float64)
        if len(cand_i):
            cand[cand_i] = cand_v
        for p, msg in inboxes.items():
            _apply_min_inbox(cand, sh.inbox_maps[p], msg, np.inf)
        better = cand < st["dist"]
        st["dist"] = np.where(better, cand, st["dist"])
        st["frontier"] = better
        return {"changed": int(better.sum())}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["changed"] == 0

    @staticmethod
    def result(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "dist": pa.array(st["dist"], type=pa.float64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "dist": pa.array(st["dist"], type=pa.float64()),
                         "frontier": pa.array(st["frontier"])})

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        idx = np.searchsorted(sh.verts, np.asarray(t["v"]))
        st["dist"][idx] = np.asarray(t["dist"], dtype=np.float64)
        st["frontier"][idx] = np.asarray(t["frontier"], dtype=bool)


class BfsSigmaKernel:
    """Brandes forward pass (betweenness_hybrid forward BFS,
    src/alg/totem_betweenness.cu / _hybrid.cu): level-synchronous BFS
    that also counts shortest paths — sigma[v] = number of shortest
    s-v paths. Level-sync means every predecessor contribution to a
    newly-reached vertex arrives in the same superstep, so the
    combine is (uniform candidate level, SUM of sender sigmas).
    """

    name = "bfs_sigma"

    @staticmethod
    def init(sh, st, source: int):
        st["source"] = int(source)
        cost = np.full(sh.nv, I64MAX, dtype=np.int64)
        sigma = np.zeros(sh.nv, dtype=np.float64)
        frontier = np.zeros(sh.nv, dtype=bool)
        i = np.searchsorted(sh.verts, source)
        if i < sh.nv and sh.verts[i] == source:
            cost[i] = 0
            sigma[i] = 1.0
            frontier[i] = True
        st["cost"], st["sigma"], st["frontier"] = cost, sigma, frontier

    @staticmethod
    def compute(sh, st, superstep: int):
        frontier, sigma = st["frontier"], st["sigma"]
        st["cand"] = (np.empty(0, np.int64), np.empty(0, np.float64))
        outboxes = {}
        for t, tgt in sh.tgt.items():
            m = frontier[tgt["src"]]
            if not m.any():
                continue
            d = tgt["dst"][m]
            vals = sigma[tgt["src"][m]]
            starts, _ = _group_starts(d)
            ud, ssum = d[starts], np.add.reduceat(vals, starts)
            if t == sh.pid:
                st["cand"] = (ud, ssum)
            else:
                outboxes[t] = (ud, ssum)
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        ud, ssum = st.pop("cand")
        acc = np.zeros(sh.nv, dtype=np.float64)
        if len(ud):
            acc[ud] += ssum          # ud unique (run-starts of sorted dst)
        for p, (u, s) in inboxes.items():
            acc[sh.inbox_maps[p][u]] += s
        newly = (st["cost"] == I64MAX) & (acc > 0)
        st["cost"][newly] = superstep + 1
        st["sigma"][newly] = acc[newly]
        st["frontier"] = newly
        return {"changed": int(newly.sum()),
                "max_level": int(superstep + 1) if newly.any() else 0}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["changed"] == 0

    @staticmethod
    def result(sh, st) -> pa.Table:
        cost = np.where(st["cost"] >= I64MAX, -1, st["cost"])
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "cost": pa.array(cost, type=pa.int64()),
                         "sigma": pa.array(st["sigma"], type=pa.float64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "cost": pa.array(st["cost"], type=pa.int64()),
                         "sigma": pa.array(st["sigma"], type=pa.float64()),
                         "frontier": pa.array(st["frontier"])})

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        idx = np.searchsorted(sh.verts, np.asarray(t["v"]))
        st["cost"][idx] = np.asarray(t["cost"], dtype=np.int64)
        st["sigma"][idx] = np.asarray(t["sigma"], dtype=np.float64)
        st["frontier"][idx] = np.asarray(t["frontier"], dtype=bool)


class BrandesBackKernel:
    """Brandes backward dependency accumulation (the pull/backward
    engine configs of totem_betweenness_hybrid.cu:1003-1040): walks
    levels max_level..1; every vertex v at the current level sends
    m_v = (1 + delta_v) / sigma_v to all neighbors; a receiver u at
    level-1 accumulates delta_u += sigma_u * sum(m). Reads the
    forward pass's (cost, sigma) straight from the shard's retained
    bfs_sigma state (engine reuse). delta over the symmetrized
    adjacency == dependency over predecessors (only level-1 receivers
    accumulate).
    """

    name = "brandes_back"

    @staticmethod
    def init(sh, st, max_level: int):
        fwd = sh.state["bfs_sigma"]
        st["cost"] = fwd["cost"]
        st["sigma"] = fwd["sigma"]
        st["delta"] = np.zeros(sh.nv, dtype=np.float64)
        st["max_level"] = int(max_level)

    @staticmethod
    def compute(sh, st, superstep: int):
        level = st["max_level"] - superstep
        at_level = st["cost"] == level
        st["cand"] = (np.empty(0, np.int64), np.empty(0, np.float64))
        outboxes = {}
        if level < 1:
            return outboxes
        msg = np.zeros(sh.nv, dtype=np.float64)
        nz = at_level & (st["sigma"] > 0)
        msg[nz] = (1.0 + st["delta"][nz]) / st["sigma"][nz]
        for t, tgt in sh.tgt.items():
            m = nz[tgt["src"]]
            if not m.any():
                continue
            d = tgt["dst"][m]
            vals = msg[tgt["src"][m]]
            starts, _ = _group_starts(d)
            ud, s = d[starts], np.add.reduceat(vals, starts)
            if t == sh.pid:
                st["cand"] = (ud, s)
            else:
                outboxes[t] = (ud, s)
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        level = st["max_level"] - superstep
        ud, s = st.pop("cand")
        acc = np.zeros(sh.nv, dtype=np.float64)
        if len(ud):
            acc[ud] += s             # ud unique (run-starts of sorted dst)
        for p, (u, vv) in inboxes.items():
            acc[sh.inbox_maps[p][u]] += vv
        recv = st["cost"] == level - 1
        st["delta"][recv] += st["sigma"][recv] * acc[recv]
        return {"changed": 1 if level > 1 else 0}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["changed"] == 0

    @staticmethod
    def result(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "delta": pa.array(st["delta"], type=pa.float64())})

    state_table = result

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        idx = np.searchsorted(sh.verts, np.asarray(t["v"]))
        st["delta"][idx] = np.asarray(t["delta"], dtype=np.float64)


class StressBackKernel:
    """Stress-centrality backward sweep (stress_cpu back propagation,
    src/alg/totem_stress.cu:376-396): like Brandes but the dependency
    is a PATH COUNT, not a ratio — a vertex v at the current level
    sends m_v = 1 + delta_v to its neighbors; a receiver u at level-1
    accumulates delta_u += sum(m) (no sigma division), and the
    per-source stress contribution is sigma(v) * delta(v)
    (totem_stress.cu:393). Reads the forward pass's (cost, sigma)
    from the shard's retained bfs_sigma state (engine reuse, the
    betweenness chaining pattern).
    """

    name = "stress_back"

    @staticmethod
    def init(sh, st, max_level: int):
        fwd = sh.state["bfs_sigma"]
        st["cost"] = fwd["cost"]
        st["sigma"] = fwd["sigma"]
        st["delta"] = np.zeros(sh.nv, dtype=np.float64)
        st["max_level"] = int(max_level)

    @staticmethod
    def compute(sh, st, superstep: int):
        level = st["max_level"] - superstep
        st["cand"] = (np.empty(0, np.int64), np.empty(0, np.float64))
        outboxes = {}
        if level < 1:
            return outboxes
        at_level = st["cost"] == level
        msg = np.zeros(sh.nv, dtype=np.float64)
        msg[at_level] = 1.0 + st["delta"][at_level]
        for t, tgt in sh.tgt.items():
            m = at_level[tgt["src"]]
            if not m.any():
                continue
            d = tgt["dst"][m]
            vals = msg[tgt["src"][m]]
            starts, _ = _group_starts(d)
            ud, s = d[starts], np.add.reduceat(vals, starts)
            if t == sh.pid:
                st["cand"] = (ud, s)
            else:
                outboxes[t] = (ud, s)
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        level = st["max_level"] - superstep
        ud, s = st.pop("cand")
        acc = np.zeros(sh.nv, dtype=np.float64)
        if len(ud):
            acc[ud] += s             # ud unique (run-starts of sorted dst)
        for p, (u, vv) in inboxes.items():
            acc[sh.inbox_maps[p][u]] += vv
        recv = st["cost"] == level - 1
        st["delta"][recv] += acc[recv]
        return {"changed": 1 if level > 1 else 0}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["changed"] == 0

    @staticmethod
    def result(sh, st) -> pa.Table:
        contrib = st["sigma"] * st["delta"]
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "contrib": pa.array(contrib, type=pa.float64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "delta": pa.array(st["delta"], type=pa.float64())})

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        idx = np.searchsorted(sh.verts, np.asarray(t["v"]))
        st["delta"][idx] = np.asarray(t["delta"], dtype=np.float64)


class DirOptBfsKernel:
    """Direction-optimizing BFS (bfs_stepwise_hybrid,
    src/alg/totem_bfs_stepwise_hybrid.cu:984-1005; 10% switch
    threshold, totem_alg.h:37).

    Per superstep every shard picks the SAME direction from the
    previous superstep's GLOBAL frontier size (the engine's prev_agg
    hook — the Ray analog of the reference's three chained engine
    configs):

    * top-down  (frontier <= alpha * |V|): frontier vertices push
      sparse (dst, level) offers — message volume tracks the frontier;
    * bottom-up (frontier >  alpha * |V|): each shard ships its
      frontier MEMBERSHIP for exactly the vertices each peer's
      adjacency references (one byte per ghost slot, independent of
      frontier size); unvisited vertices then scan their own edges for
      a frontier neighbor — O(cut) bytes instead of O(frontier x
      fanout) rows, the classic bottom-up win on web-graph middle
      levels.

    SYMMETRIC-GRAPH ASSUMPTION: the bottom-up scan walks each
    unvisited vertex's stored (out-)adjacency, i.e. traverses edges
    against their direction — valid only when every edge exists in
    both directions (Graph500-style inputs, like the reference's
    stepwise variant). Callers with directed graphs disable bottom-up
    by passing alpha > 1 (algs.bfs_stepwise(undirected=False) does).
    """

    name = "bfs_dirop"
    needs_total_vertices = True
    needs_global_hook = True  # direction choice needs the global
    # frontier size of the immediately previous superstep

    @staticmethod
    def init(sh, st, source: int, total_vertices: int = 0,
             alpha: float = 0.1):
        st["source"] = int(source)
        st["N"] = int(total_vertices)
        st["alpha"] = float(alpha)
        cost = np.full(sh.nv, I64MAX, dtype=np.int64)
        frontier = np.zeros(sh.nv, dtype=bool)
        i = np.searchsorted(sh.verts, source)
        if i < sh.nv and sh.verts[i] == source:
            cost[i] = 0
            frontier[i] = True
        st["cost"], st["frontier"] = cost, frontier

    @staticmethod
    def _mode(sh, st, superstep: int) -> str:
        prev = getattr(sh, "prev_agg", None)
        if superstep == 0 or prev is None or not st["N"]:
            return "td"
        return "bu" if prev.get("changed", 0) > st["alpha"] * st["N"] \
            else "td"

    @classmethod
    def compute(cls, sh, st, superstep: int):
        mode = cls._mode(sh, st, superstep)
        st["_mode"] = mode
        cost, frontier = st["cost"], st["frontier"]
        outboxes = {}
        if mode == "bu":
            # ship frontier membership for the slots each peer reads
            st["cand"] = None
            for p, idx_arr in sh.inbox_maps.items():
                outboxes[p] = ("bu", frontier[idx_arr])
            return outboxes
        st["cand"] = (np.empty(0, np.int64), np.empty(0, np.int64))
        for t, tgt in sh.tgt.items():
            m = frontier[tgt["src"]]
            if not m.any():
                continue
            d = tgt["dst"][m]
            vals = cost[tgt["src"][m]] + 1
            ud, red = _seg_min_sparse(d, vals)
            if t == sh.pid:
                st["cand"] = (ud, red)
            else:
                # dense per-slot array on wide frontiers (the exact
                # steps direction-optimization targets), sparse pairs
                # otherwise — same format switch as BfsKernel
                outboxes[t] = ("td", _min_outbox(ud, red, tgt["size"],
                                                 I64MAX))
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        mode = st.pop("_mode")
        if mode == "bu":
            st.pop("cand", None)
            # per-edge frontier flags through the src-major adjacency
            flags = np.zeros(sh.ne, dtype=bool)
            for t in range(sh.P):
                m = sh.adj_owner == t
                if not m.any():
                    continue
                if t == sh.pid:
                    flags[m] = st["frontier"][sh.adj_idx[m]]
                else:
                    _, gf = inboxes[t]
                    flags[m] = gf[sh.adj_idx[m]]
            unvisited = st["cost"] == I64MAX
            # any frontier neighbor? segmented OR over the CSR rows
            hit = np.zeros(sh.nv, dtype=bool)
            if sh.ne:
                hit = _seg_reduceat(np.logical_or, flags,
                                    sh.adj_indptr, False)
            newly = unvisited & hit
            st["cost"][newly] = superstep + 1
            st["frontier"] = newly
            return {"changed": int(newly.sum()), "bu_steps": 1}
        cand_i, cand_v = st.pop("cand")
        cand = np.full(sh.nv, I64MAX, dtype=np.int64)
        if len(cand_i):
            cand[cand_i] = cand_v
        for p, payload in inboxes.items():
            tag, msg = payload
            _apply_min_inbox(cand, sh.inbox_maps[p], msg, I64MAX)
        better = cand < st["cost"]
        st["cost"] = np.where(better, cand, st["cost"])
        st["frontier"] = better
        return {"changed": int(better.sum()), "bu_steps": 0}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["changed"] == 0

    result = None       # bound below (same contract as BfsKernel)
    state_table = None
    load_state = None


DirOptBfsKernel.result = BfsKernel.result
DirOptBfsKernel.state_table = BfsKernel.state_table
DirOptBfsKernel.load_state = BfsKernel.load_state


class Graph500StepwiseKernel:
    """Direction-optimizing BFS tree (graph500_stepwise_hybrid,
    src/alg/totem_graph500_stepwise_hybrid.cu): Graph500Kernel's
    (level, min-id-parent) tracking combined with DirOptBfsKernel's
    global 10% direction switch.

    Top-down supersteps push lexmin (dst, level, parent) triples;
    bottom-up supersteps ship frontier MEMBERSHIP per ghost slot (one
    byte per slot) and each unvisited vertex scans its own adjacency,
    adopting its MINIMUM-id frontier neighbor as parent — the same
    min-parent rule the top-down lexmin applies, so the result is
    bitwise identical to ``bfs_tree`` under every direction schedule.
    Same symmetric-graph assumption as DirOptBfsKernel (bottom-up
    traverses stored edges against their direction)."""

    name = "bfs_tree_dirop"
    needs_total_vertices = True
    needs_global_hook = True

    @staticmethod
    def init(sh, st, source: int, total_vertices: int = 0,
             alpha: float = 0.1):
        Graph500Kernel.init(sh, st, source)
        st["N"] = int(total_vertices)
        st["alpha"] = float(alpha)

    @classmethod
    def compute(cls, sh, st, superstep: int):
        mode = DirOptBfsKernel._mode(sh, st, superstep)
        st["_mode"] = mode
        cost, frontier = st["cost"], st["frontier"]
        outboxes = {}
        if mode == "bu":
            st["cand"] = None
            for p, idx_arr in sh.inbox_maps.items():
                outboxes[p] = ("bu", frontier[idx_arr])
            return outboxes
        st["cand"] = (np.empty(0, np.int64),) * 3
        for t, tgt in sh.tgt.items():
            m = frontier[tgt["src"]]
            if not m.any():
                continue
            src_i = tgt["src"][m]
            trip = Graph500Kernel._lexmin_per_dst(
                tgt["dst"][m], cost[src_i] + 1, sh.verts[src_i])
            if t == sh.pid:
                st["cand"] = trip
            else:
                outboxes[t] = ("td", trip)
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        mode = st.pop("_mode")
        if mode == "bu":
            st.pop("cand", None)
            # min frontier-neighbor id per vertex through the
            # src-major adjacency (I64MAX = no frontier neighbor)
            nbr_id = np.full(sh.ne, I64MAX, dtype=np.int64)
            for t in range(sh.P):
                m = sh.adj_owner == t
                if not m.any():
                    continue
                if t == sh.pid:
                    f = st["frontier"][sh.adj_idx[m]]
                    ids = sh.verts[sh.adj_idx[m]]
                else:
                    _, gf = inboxes[t]
                    f = gf[sh.adj_idx[m]]
                    ids = sh.ghosts[t][sh.adj_idx[m]]
                nbr_id[m] = np.where(f, ids, I64MAX)
            parent_min = np.full(sh.nv, I64MAX, dtype=np.int64)
            if sh.ne:
                parent_min = _seg_reduceat(np.minimum, nbr_id,
                                           sh.adj_indptr, I64MAX)
            newly = (st["cost"] == I64MAX) & (parent_min < I64MAX)
            st["cost"][newly] = superstep + 1
            st["parent"][newly] = parent_min[newly]
            st["frontier"] = newly
            return {"changed": int(newly.sum()), "bu_steps": 1}
        cand_c = np.full(sh.nv, I64MAX, dtype=np.int64)
        cand_p = np.full(sh.nv, I64MAX, dtype=np.int64)
        ud, c, p = st.pop("cand")
        pieces = [(ud, c, p)] + \
            [(sh.inbox_maps[q][u], cc, pp)
             for q, (_, (u, cc, pp)) in inboxes.items()]
        for idx, cc, pp in pieces:
            if not len(idx):
                continue
            bc = cand_c[idx]
            better = (cc < bc) | ((cc == bc) & (pp < cand_p[idx]))
            cand_c[idx[better]] = cc[better]
            cand_p[idx[better]] = pp[better]
        better = cand_c < st["cost"]
        st["cost"] = np.where(better, cand_c, st["cost"])
        st["parent"] = np.where(better, cand_p, st["parent"])
        st["frontier"] = better
        return {"changed": int(better.sum()), "bu_steps": 0}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["changed"] == 0

    result = None       # bound below (same contract as Graph500Kernel)
    state_table = None
    load_state = None


Graph500StepwiseKernel.result = Graph500Kernel.result
Graph500StepwiseKernel.state_table = Graph500Kernel.state_table
Graph500StepwiseKernel.load_state = Graph500Kernel.load_state


HINF = np.int64(1) << 62
_MF_EPS = 1e-9


class MaxflowKernel:
    """Push-relabel max flow (maxflow_cpu/gpu,
    src/alg/totem_maxflow.cu, per [Hong08] — dynamically tuned
    push-relabel with batched kernel cycles, KERNEL_CYCLES=35,
    totem_maxflow.cu:19).

    Input must be the RESIDUAL graph (graph_create_bidirectional /
    totem_ray.graph.edges.create_bidirectional: every edge has its
    reverse, added reverses have capacity 0) with no parallel edges,
    so the mirror of edge (u, v) is identified by the pair (v, u).

    BSP mapping: one superstep = KERNEL_CYCLES local push/relabel
    sweeps over each shard (local heights live, ghost heights frozen
    — the same staleness the reference's kernel tolerates per
    [Hong08]), then an exchange of (excess delta, mirror-flow delta)
    messages to dst owners plus refreshed heights for each peer's
    ghost slots. Flow f(u,v) lives on u's shard; antisymmetry
    f(v,u) = -f(u,v) is maintained through the mirror messages.
    Terminates when no push or relabel applies anywhere; the max flow
    is the sink's excess (totem_maxflow.cu:570).
    """

    name = "maxflow"
    KERNEL_CYCLES = 35  # totem_maxflow.cu:19
    # height init needs N (source height = N); without this a direct
    # engine.run('maxflow', ...) would get N=0 and silently "converge"
    # with no pushes at all
    needs_total_vertices = True

    @staticmethod
    def init(sh, st, source: int, sink: int, total_vertices: int = 0,
             cycles: int = 0):
        st["source"], st["sink"] = int(source), int(sink)
        st["N"] = int(total_vertices)
        st["cycles"] = int(cycles) or MaxflowKernel.KERNEL_CYCLES
        parts_src, parts_own, parts_didx, parts_w, parts_gid = \
            [], [], [], [], []
        for t, tgt in sh.tgt.items():
            n = len(tgt["src"])
            parts_src.append(tgt["src"])
            parts_own.append(np.full(n, t, dtype=np.int32))
            parts_didx.append(tgt["dst"])
            parts_w.append(tgt["w"] if "w" in tgt
                           else np.ones(n, dtype=np.float64))
            ids = sh.verts if t == sh.pid else sh.ghosts[t]
            parts_gid.append(ids[tgt["dst"]])
        if parts_src:
            e_src = np.concatenate(parts_src)
            e_own = np.concatenate(parts_own)
            e_didx = np.concatenate(parts_didx)
            e_w = np.concatenate(parts_w)
            e_gid = np.concatenate(parts_gid)
        else:
            e_src = np.empty(0, np.int64)
            e_own = np.empty(0, np.int32)
            e_didx = np.empty(0, np.int64)
            e_w = np.empty(0, np.float64)
            e_gid = np.empty(0, np.int64)
        order = np.lexsort((e_gid, e_src))
        # int64 throughout: the composite (src, dst-code) key below
        # multiplies src by the code cardinality
        e_src = e_src[order].astype(np.int64)
        e_own = e_own[order]
        e_didx = e_didx[order].astype(np.int64)
        e_w, e_gid = e_w[order], e_gid[order]
        st["e_src"], st["e_own"], st["e_didx"] = e_src, e_own, e_didx
        st["e_w"], st["e_gid"] = e_w, e_gid
        st["e_sgid"] = sh.verts[e_src] if len(e_src) else \
            np.empty(0, np.int64)
        st["vptr"] = np.searchsorted(e_src, np.arange(sh.nv + 1))
        st["m_local"] = e_own == sh.pid
        st["own_masks"] = {t: e_own == t for t in sh.ghosts}
        # composite (src_local, dst_gid) -> edge position (sorted)
        ugids = np.unique(e_gid)
        st["ugids"] = ugids
        st["comp"] = e_src * max(len(ugids), 1) + \
            np.searchsorted(ugids, e_gid)
        # mirror positions for LOCAL-dst edges (both endpoints here)
        mirror = np.full(len(e_src), -1, dtype=np.int64)
        ml = st["m_local"]
        if ml.any():
            # membership check BEFORE composing: a src gid absent from
            # ugids would clamp onto a different gid whose composite
            # can alias an unrelated edge and pass the comp guard
            mcode = np.searchsorted(ugids, st["e_sgid"][ml])
            mcode = np.minimum(mcode, max(len(ugids) - 1, 0))
            if not len(ugids) or not np.array_equal(
                    ugids[mcode], st["e_sgid"][ml]):
                raise ValueError("maxflow needs a residual graph: some "
                                 "local edge has no reverse "
                                 "(run create_bidirectional first)")
            mcomp = e_didx[ml] * max(len(ugids), 1) + mcode
            pos = np.searchsorted(st["comp"], mcomp)
            pos = np.minimum(pos, max(len(e_src) - 1, 0))
            if len(e_src) and not np.array_equal(st["comp"][pos], mcomp):
                raise ValueError("maxflow needs a residual graph: some "
                                 "local edge has no reverse "
                                 "(run create_bidirectional first)")
            mirror[np.flatnonzero(ml)] = pos
        st["mirror"] = mirror
        st["f"] = np.zeros(len(e_src), dtype=np.float64)
        st["height"] = np.zeros(sh.nv, dtype=np.int64)
        st["excess"] = np.zeros(sh.nv, dtype=np.float64)
        gh = {}
        for t, ids in sh.ghosts.items():
            h = np.zeros(len(ids), dtype=np.int64)
            # the source's height is N from the start — peers must not
            # see a stale 0 (premature flow return, totem_maxflow.cu:540)
            i = np.searchsorted(ids, st["source"])
            if i < len(ids) and ids[i] == st["source"]:
                h[i] = st["N"]
            gh[t] = h
        st["ghost_h"] = gh
        excl = np.zeros(sh.nv, dtype=bool)
        pending: dict[int, tuple] = {}
        for name_ in ("source", "sink"):
            i = np.searchsorted(sh.verts, st[name_])
            if i < sh.nv and sh.verts[i] == st[name_]:
                excl[i] = True
                st[name_ + "_loc"] = int(i)
            else:
                st[name_ + "_loc"] = -1
        st["excl"] = excl
        # preflow (totem_maxflow.cu:540-551): saturate source out-edges
        s_loc = st["source_loc"]
        if s_loc >= 0:
            st["height"][s_loc] = st["N"]
            lo, hi = st["vptr"][s_loc], st["vptr"][s_loc + 1]
            sel = np.arange(lo, hi)[e_w[lo:hi] > 0]
            st["f"][sel] = e_w[sel]
            st["excess"][s_loc] -= float(e_w[sel].sum())
            mlsel = ml[sel]
            loc_sel = sel[mlsel]
            if len(loc_sel):
                np.add.at(st["excess"], e_didx[loc_sel], e_w[loc_sel])
                np.subtract.at(st["f"], mirror[loc_sel], e_w[loc_sel])
            for t in sh.ghosts:
                ts = sel[e_own[sel] == t]
                if len(ts):
                    pending[t] = (e_didx[ts], st["e_sgid"][ts],
                                  e_w[ts].copy())
        st["pending"] = pending

    @staticmethod
    def compute(sh, st, superstep: int):
        N = st["N"]
        e_src, e_didx, e_w = st["e_src"], st["e_didx"], st["e_w"]
        f, height, excess = st["f"], st["height"], st["excess"]
        vptr, ml = st["vptr"], st["m_local"]
        mirror, excl = st["mirror"], st["excl"]
        ne = len(e_src)
        h_edge = np.full(ne, HINF, dtype=np.int64)
        for t, m in st["own_masks"].items():
            if m.any():
                h_edge[m] = st["ghost_h"][t][e_didx[m]]
        rem: dict[int, list] = {t: [] for t in sh.ghosts}
        ops = 0
        for _ in range(st["cycles"]):
            if ml.any():
                h_edge[ml] = height[e_didx[ml]]
            resid = (e_w - f) > _MF_EPS
            eh = np.where(resid, h_edge, HINF)
            h_prime = np.full(sh.nv, HINF, dtype=np.int64)
            if ne:
                h_prime = _seg_reduceat(np.minimum, eh, vptr, HINF)
            active = (excess > _MF_EPS) & (height < N) & ~excl
            if not active.any():
                break
            pushable = active & (height > h_prime)
            relab = active & ~pushable & (h_prime < HINF)
            did = 0
            ci = np.flatnonzero(resid & pushable[e_src] &
                                (eh == h_prime[e_src]))
            if len(ci):
                us, first = np.unique(e_src[ci], return_index=True)
                be = ci[first]
                amt = np.minimum(excess[us], (e_w - f)[be])
                f[be] += amt
                excess[us] -= amt
                mloc = ml[be]
                if mloc.any():
                    np.add.at(excess, e_didx[be[mloc]], amt[mloc])
                    np.subtract.at(f, mirror[be[mloc]], amt[mloc])
                mrem = ~mloc
                if mrem.any():
                    own = st["e_own"][be]
                    for t in sh.ghosts:
                        mt = mrem & (own == t)
                        if mt.any():
                            rem[t].append((e_didx[be[mt]],
                                           st["e_sgid"][be[mt]],
                                           amt[mt]))
                did += len(us)
            if relab.any():
                height[relab] = h_prime[relab] + 1
                did += int(relab.sum())
            ops += did
            if not did:
                break
        pend = st.pop("pending", None) or {}
        ops += sum(len(p[0]) for p in pend.values())
        st["_ops"] = ops
        out = {}
        targets = set(sh.inbox_maps) | {t for t, v in rem.items() if v} \
            | set(pend)
        for t in targets:
            parts = list(pend.get(t) and [pend[t]] or []) + rem.get(t, [])
            if parts:
                di = np.concatenate([p[0] for p in parts])
                ug = np.concatenate([p[1] for p in parts])
                am = np.concatenate([p[2] for p in parts])
            else:
                di = np.empty(0, np.int64)
                ug = np.empty(0, np.int64)
                am = np.empty(0, np.float64)
            out[t] = {"di": di, "ug": ug, "am": am,
                      "h": height[sh.inbox_maps[t]]
                      if t in sh.inbox_maps else None}
        st["pending"] = {}
        return out

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        for p, msg in inboxes.items():
            if msg.get("h") is not None:
                st["ghost_h"][p] = msg["h"]
            di = msg["di"]
            if not len(di):
                continue
            loc = sh.inbox_maps[p][di]
            np.add.at(st["excess"], loc, msg["am"])
            code = np.searchsorted(st["ugids"], msg["ug"])
            code = np.minimum(code, max(len(st["ugids"]) - 1, 0))
            # a pushed-along gid absent from ugids would clamp onto a
            # neighboring gid and could alias an unrelated edge's comp
            if not len(st["ugids"]) or \
                    not np.array_equal(st["ugids"][code], msg["ug"]):
                raise ValueError("mirror edge not found — input is not "
                                 "a residual (bidirectional) graph")
            comp = loc * max(len(st["ugids"]), 1) + code
            pos = np.searchsorted(st["comp"], comp)
            pos = np.minimum(pos, max(len(st["comp"]) - 1, 0))
            if len(st["comp"]) and not np.array_equal(st["comp"][pos], comp):
                raise ValueError("mirror edge not found — input is not "
                                 "a residual (bidirectional) graph")
            np.subtract.at(st["f"], pos, msg["am"])
        return {"ops": st.pop("_ops")}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["ops"] == 0

    @staticmethod
    def result(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "excess": pa.array(st["excess"],
                                            type=pa.float64()),
                         "height": pa.array(st["height"],
                                            type=pa.int64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        raise NotImplementedError(
            "maxflow checkpointing needs the per-edge flow vector; "
            "rerun from scratch (the reference is likewise fail-stop)")

    @staticmethod
    def load_state(sh, st, t):
        # a bare `load_state = state_table` alias would die with an
        # arity TypeError before reaching the informative message
        raise NotImplementedError(
            "maxflow checkpointing needs the per-edge flow vector; "
            "rerun from scratch (the reference is likewise fail-stop)")


class PCoreKernel:
    """p-core decomposition (pcore_cpu/gpu, src/alg/totem_pcores.cu —
    the weighted k-core peel of [Batagelj & Zaversnik 2002]).

    Semantics matched to the reference:
    * wdeg[v] init = sum of incident edge weights (init_state_kernel;
      weight 1 when unweighted, totem_graph.h:95);
    * outer rounds: threshold p = start + round*step; inner cascade:
      any active vertex with wdeg <= p is deactivated, assigned the
      CURRENT round number, and its weights are subtracted from its
      neighbors' wdeg (pcore_kernel, note the <=);
    * the round advances only when an inner iteration removes nothing
      (finish_flags[ROUND_INDEX]); processing ends when every vertex
      is assigned a round.

    One superstep = one inner cascade iteration; the round/threshold
    bump is driven by the engine's global prev_agg hook (removed == 0
    last superstep), so all shards advance in lockstep.
    """

    name = "pcore"
    needs_global_hook = True  # threshold bump needs the GLOBAL
    # removed-count of the immediately previous superstep — the engine
    # must run the two-phase loop (no fused pipelining)

    @staticmethod
    def init(sh, st, start: int = 0, step: int = 1):
        st["start"], st["step"] = int(start), int(step)
        st["thr"] = float(start)
        st["round"] = 0
        wdeg = np.zeros(sh.nv, dtype=np.float64)
        for tgt in sh.tgt.values():
            w = tgt["w"] if "w" in tgt else np.ones(len(tgt["src"]))
            wdeg += np.bincount(tgt["src"], weights=w, minlength=sh.nv)
        st["wdeg"] = wdeg
        st["active"] = np.ones(sh.nv, dtype=bool)
        st["out_round"] = np.full(sh.nv, -1, dtype=np.int64)

    @staticmethod
    def compute(sh, st, superstep: int):
        prev = getattr(sh, "prev_agg", None)
        if superstep > 0 and prev is not None and prev.get("removed", 0) == 0:
            st["thr"] += st["step"]
            st["round"] += 1
        newly = st["active"] & (st["wdeg"] <= st["thr"])
        st["out_round"][newly] = st["round"]
        st["active"] &= ~newly
        st["_removed"] = int(newly.sum())
        outboxes = {}
        st["cand"] = (np.empty(0, np.int64), np.empty(0, np.float64))
        for t, tgt in sh.tgt.items():
            m = newly[tgt["src"]]
            if not m.any():
                continue
            d = tgt["dst"][m]
            w = tgt["w"][m] if "w" in tgt else np.ones(int(m.sum()))
            starts, _ = _group_starts(d)
            ud, dec = d[starts], np.add.reduceat(w, starts)
            if t == sh.pid:
                st["cand"] = (ud, dec)
            else:
                outboxes[t] = (ud, dec)
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        ud, dec = st.pop("cand")
        if len(ud):
            st["wdeg"][ud] -= dec    # ud unique (run-starts of sorted dst)
        for p, (u, d) in inboxes.items():
            st["wdeg"][sh.inbox_maps[p][u]] -= d
        return {"removed": st.pop("_removed"),
                "active": int(st["active"].sum())}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return agg["active"] == 0

    @staticmethod
    def result(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "round": pa.array(st["out_round"], type=pa.int64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "round": pa.array(st["out_round"], type=pa.int64()),
                         "wdeg": pa.array(st["wdeg"], type=pa.float64()),
                         "active": pa.array(st["active"]),
                         "thr": pa.array(np.full(sh.nv, st["thr"])),
                         "cur_round": pa.array(
                             np.full(sh.nv, st["round"], dtype=np.int64))})

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        idx = np.searchsorted(sh.verts, np.asarray(t["v"]))
        st["out_round"][idx] = np.asarray(t["round"], dtype=np.int64)
        st["wdeg"][idx] = np.asarray(t["wdeg"], dtype=np.float64)
        st["active"][idx] = np.asarray(t["active"], dtype=bool)
        if t.num_rows:
            st["thr"] = float(np.asarray(t["thr"])[0])
            st["round"] = int(np.asarray(t["cur_round"])[0])


class PersonalizedPageRankKernel(PageRankKernel):
    """Personalized PageRank: teleport mass restricted to a seed set
    (random-walk-with-restart). Not a reference kernel — added for the
    link-graph query surface; it rides PageRankKernel's push machinery
    unchanged (compute / result / checkpoint are inherited).

    Math (power iteration; contributions are degree-normalized every
    round, dangling mass dropped exactly like the base kernel's
    converge mode):

        r_0      = 1_S / |S|
        r_{k+1}  = (1-d) * 1_S/|S|  +  d * sum_{u->v} r_k(u)/deg(u)

    ``mode='rounds'`` (default) runs exactly ``rounds`` supersteps —
    the SQL-oracle form; ``mode='converge'`` iterates to an L1
    residual <= tol. Seeds absent from the graph keep their teleport
    slot empty while |S| still counts them, so the distribution sums
    to < 1 — matching an oracle that builds the seed indicator with a
    LEFT JOIN against the vertex universe. A vertex listed s times in
    ``seeds`` accumulates s/|S| teleport mass (additive restart
    weights, |S| counting duplicates).
    """

    name = "ppr"
    needs_total_vertices = False

    @staticmethod
    def init(sh, st, seeds=(), damping: float = 0.85,
             mode: str = "rounds", rounds: int = 4, tol: float = 1e-6):
        seeds = np.asarray(list(seeds), dtype=np.int64)
        if seeds.size == 0:
            raise ValueError("ppr needs a non-empty seed set")
        st["d"] = float(damping)
        st["mode"] = mode
        st["rounds"] = int(rounds)
        st["tol"] = float(tol)
        idx = np.searchsorted(sh.verts, seeds)
        ok = idx < sh.nv
        ok[ok] = sh.verts[idx[ok]] == seeds[ok]
        tele = np.zeros(sh.nv, dtype=np.float64)
        # accumulate (not assign): duplicate seed ids carry additive
        # restart weight, keeping total teleport mass at 1 for any
        # multiset of in-graph seeds
        np.add.at(tele, idx[ok], 1.0 / seeds.size)
        st["seed_frac"] = tele
        st["rank"] = tele.copy()

    @staticmethod
    def _push_values(sh, st, superstep: int) -> np.ndarray:
        # always degree-normalized — no round-0 raw-rank quirk here
        out = np.zeros(sh.nv, dtype=np.float64)
        nz = sh.out_deg > 0
        out[nz] = st["rank"][nz] / sh.out_deg[nz]
        return out

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        acc = st.pop("acc")
        for p, arr in inboxes.items():
            acc[sh.inbox_maps[p]] += arr
        r_new = (1.0 - st["d"]) * st["seed_frac"] + st["d"] * acc
        resid = float(np.abs(r_new - st["rank"]).sum())
        st["rank"] = r_new
        return {"residual": resid, "changed": sh.nv}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        if st_params.get("mode", "rounds") == "rounds":
            return superstep + 1 >= st_params.get("rounds", 4)
        return agg["residual"] <= st_params.get("tol", 1e-6)

    @staticmethod
    def done_static(superstep: int, st_params: dict):
        if st_params.get("mode", "rounds") == "rounds":
            return superstep + 1 >= st_params.get("rounds", 4)
        return None


class WeightedPageRankKernel(PageRankKernel):
    """Edge-weighted PageRank: each vertex distributes its rank over
    out-edges proportionally to edge weight (contribution =
    r(u) * w(u,v) / wdeg(u), wdeg = sum of u's out-weights). Not a
    reference kernel — added for the link-graph query surface (the
    reference's randWeights graphs feed only SSSP); push machinery
    and checkpointing inherited from PageRankKernel.

    ``mode='rounds'`` runs exactly ``rounds`` plain weighted power
    iterations (no round-0 raw-rank quirk — that quirk is reference
    parity for the UNWEIGHTED kernel only); ``mode='converge'``
    iterates to an L1 residual <= tol. Zero-weight-degree vertices
    drop their mass exactly like the base kernel's dangling vertices.
    """

    name = "pagerank_weighted"
    needs_total_vertices = True

    @staticmethod
    def init(sh, st, total_vertices: int = 0, damping: float = 0.85,
             mode: str = "rounds", rounds: int = 4, tol: float = 1e-6):
        wdeg = np.zeros(sh.nv, dtype=np.float64)
        for t, tgt in sh.tgt.items():
            if "w" not in tgt:
                raise ValueError("pagerank_weighted needs a weighted "
                                 "edge table (weight column)")
            wdeg += np.bincount(tgt["src"], weights=tgt["w"],
                                minlength=sh.nv)
        st["wdeg"] = wdeg
        st["N"] = int(total_vertices)
        st["d"] = float(damping)
        st["mode"] = mode
        st["rounds"] = int(rounds)
        st["tol"] = float(tol)
        init = 1.0 / st["N"] if st["N"] else 0.0
        st["rank"] = np.full(sh.nv, init, dtype=np.float64)

    @staticmethod
    def _push_values(sh, st, superstep: int) -> np.ndarray:
        out = np.zeros(sh.nv, dtype=np.float64)
        nz = st["wdeg"] > 0
        out[nz] = st["rank"][nz] / st["wdeg"][nz]
        return out

    @classmethod
    def compute(cls, sh, st, superstep: int):
        contrib = cls._push_values(sh, st, superstep)
        acc = np.zeros(sh.nv, dtype=np.float64)
        outboxes = {}
        for t, tgt in sh.tgt.items():
            vals = contrib[tgt["src"]] * tgt["w"]
            if t == sh.pid:
                acc += np.bincount(tgt["dst"], weights=vals,
                                   minlength=sh.nv)
            else:
                outboxes[t] = np.bincount(tgt["dst"], weights=vals,
                                          minlength=tgt["size"])
        st["acc"] = acc
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        acc = st.pop("acc")
        for p, arr in inboxes.items():
            acc[sh.inbox_maps[p]] += arr
        N, d = st["N"], st["d"]
        r_new = ((1.0 - d) / N if N else 0.0) + d * acc
        resid = float(np.abs(r_new - st["rank"]).sum())
        st["rank"] = r_new
        return {"residual": resid, "changed": sh.nv}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        if st_params.get("mode", "rounds") == "rounds":
            return superstep + 1 >= st_params.get("rounds", 4)
        return agg["residual"] <= st_params.get("tol", 1e-6)

    @staticmethod
    def done_static(superstep: int, st_params: dict):
        if st_params.get("mode", "rounds") == "rounds":
            return superstep + 1 >= st_params.get("rounds", 4)
        return None


class HitsKernel:
    """HITS hubs & authorities (Kleinberg 1999), L1-normalized per
    half-step. Not a reference kernel — added for the link-graph query
    surface (hub/authority scoring is the classic companion to
    PageRank on web link graphs); it runs on this engine's standard
    message machinery (the engine_config_t callback shape,
    totem_engine.cuh:114-124).

    The push engine moves messages src->dst only, while HITS needs
    both directions (authority pulls from in-edges, hub pulls from
    out-edges). The input graph must therefore be the direction-TAGGED
    double cover built by ``totem_ray.graph.edges.tag_directions``:
    every original edge (u,v) appears as (u,v,weight=1) [forward —
    carries hub->authority mass] and (v,u,weight=2) [reverse — carries
    authority->hub mass].

    Superstep schedule for ``rounds`` R (supersteps 0..2R):

      even s=2i   push hub_i along forward edges; apply accumulates
                  raw authority and reports its global L1 mass.
      odd  s=2i+1 push auth_{i+1} = raw/auth_sum (normalized with the
                  engine's prev_agg global hook) along reverse edges;
                  apply accumulates raw hub + its mass.
      s=2R        finish half-step: normalize the final hub with the
                  global hub_sum; no messages.

    hub_0 = 1 (unnormalized start), matching the standard formulation
    and the unrolled-CTE oracle.
    """

    name = "hits"
    needs_global_hook = True  # per-half-step L1 normalization needs
    # the GLOBAL mass of the vector accumulated one superstep earlier

    @staticmethod
    def init(sh, st, rounds: int = 5):
        st["rounds"] = int(rounds)
        fwd: dict[int, np.ndarray] = {}
        rev: dict[int, np.ndarray] = {}
        for t, tgt in sh.tgt.items():
            if "w" not in tgt:
                raise ValueError(
                    "hits requires a direction-tagged graph: build the "
                    "engine over tag_directions(edges) "
                    "(weight 1=forward, 2=reverse)")
            w = tgt["w"]
            f = np.flatnonzero(w == 1.0)
            r = np.flatnonzero(w == 2.0)
            if len(f) + len(r) != len(w):
                raise ValueError("hits edge weights must be direction "
                                 "tags 1.0/2.0 (see tag_directions)")
            fwd[t], rev[t] = f, r
        st["fwd"], st["rev"] = fwd, rev
        st["hub_raw"] = np.ones(sh.nv, dtype=np.float64)
        st["auth_raw"] = np.zeros(sh.nv, dtype=np.float64)
        st["hub"] = np.ones(sh.nv, dtype=np.float64)
        st["auth"] = np.zeros(sh.nv, dtype=np.float64)
        # last GLOBAL masses seen via prev_agg — carried in checkpoints
        # so a resumed compute can still normalize (the engine also
        # re-seeds prev_agg from the checkpoint manifest)
        st["g_hub_sum"] = 0.0
        st["g_auth_sum"] = 0.0

    @staticmethod
    def compute(sh, st, superstep: int):
        prev = getattr(sh, "prev_agg", None) or {}
        if superstep >= 2 * st["rounds"]:
            hs = prev.get("hub_sum", st["g_hub_sum"])
            st["g_hub_sum"] = hs
            st["hub"] = st["hub_raw"] / hs if hs > 0 \
                else st["hub_raw"].copy()
            return {}
        if superstep % 2 == 0:
            hs = prev.get("hub_sum", st["g_hub_sum"])
            if hs > 0:
                st["g_hub_sum"] = hs
            contrib = st["hub_raw"] / hs if hs > 0 else st["hub_raw"]
            st["hub"] = contrib
            sel = st["fwd"]
        else:
            asum = prev.get("auth_sum", st["g_auth_sum"])
            if asum > 0:
                st["g_auth_sum"] = asum
            contrib = st["auth_raw"] / asum if asum > 0 else st["auth_raw"]
            st["auth"] = contrib
            sel = st["rev"]
        acc = np.zeros(sh.nv, dtype=np.float64)
        outboxes = {}
        for t, tgt in sh.tgt.items():
            idx = sel[t]
            if not len(idx):
                continue
            vals = contrib[tgt["src"][idx]]
            n = sh.nv if t == sh.pid else tgt["size"]
            counts = np.bincount(tgt["dst"][idx], weights=vals, minlength=n)
            if t == sh.pid:
                acc += counts
            else:
                outboxes[t] = counts
        st["acc"] = acc
        return outboxes

    @staticmethod
    def apply(sh, st, inboxes, superstep: int) -> dict:
        acc = st.pop("acc", None)
        if acc is None:  # finish half-step — nothing was pushed
            return {"changed": 0}
        for p, arr in inboxes.items():
            acc[sh.inbox_maps[p]] += arr
        if superstep % 2 == 0:
            st["auth_raw"] = acc
            return {"auth_sum": float(acc.sum()), "changed": sh.nv}
        st["hub_raw"] = acc
        return {"hub_sum": float(acc.sum()), "changed": sh.nv}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        return superstep >= 2 * st_params.get("rounds", 5)

    @staticmethod
    def result(sh, st) -> pa.Table:
        return pa.table({"v": pa.array(sh.verts, type=pa.int64()),
                         "auth": pa.array(st["auth"], type=pa.float64()),
                         "hub": pa.array(st["hub"], type=pa.float64())})

    @staticmethod
    def state_table(sh, st) -> pa.Table:
        nv = sh.nv
        return pa.table({
            "v": pa.array(sh.verts, type=pa.int64()),
            "hub_raw": pa.array(st["hub_raw"], type=pa.float64()),
            "auth_raw": pa.array(st["auth_raw"], type=pa.float64()),
            "hub": pa.array(st["hub"], type=pa.float64()),
            "auth": pa.array(st["auth"], type=pa.float64()),
            "g_hub_sum": pa.array(np.full(nv, st["g_hub_sum"])),
            "g_auth_sum": pa.array(np.full(nv, st["g_auth_sum"]))})

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        idx = np.searchsorted(sh.verts, np.asarray(t["v"]))
        for k in ("hub_raw", "auth_raw", "hub", "auth"):
            st[k][idx] = np.asarray(t[k], dtype=np.float64)
        if t.num_rows:
            st["g_hub_sum"] = float(np.asarray(t["g_hub_sum"])[0])
            st["g_auth_sum"] = float(np.asarray(t["g_auth_sum"])[0])


class HyperBallKernel:
    """HyperBall (Boldi & Vigna, 2013): per-vertex neighborhood-size
    estimation by iterating HyperLogLog counters over the graph —
    after t supersteps vertex v's counter sketches |B(v, t)|, the set
    of vertices reachable INTO v within t hops (equal to the out-ball
    on symmetric graphs; reverse the edges for out-balls on directed
    ones). Not a reference kernel — added for the link-graph surface
    (effective-diameter / centrality estimation at web scale).

    State: an (nv, m=2^p) uint8 register matrix seeded with each
    vertex's own hash (splitmix64 of the id — SQL-transcribable).
    Superstep: every vertex pushes its register row to its out-
    neighbors; rows max-combine (HLL union is elementwise max, so the
    message combiner is a per-destination np.maximum.reduceat — no
    per-element scatter). Terminates after ``rounds`` supersteps or
    when no register changes (the exact fixpoint = transitive
    closure). Registers are an exact integer function of ids and
    topology — the oracle checks them value-for-value.
    """

    name = "hyperball"

    @staticmethod
    def _seed_registers(verts: np.ndarray, p: int) -> np.ndarray:
        from totem_ray.hashing import as_u64, splitmix64
        from totem_ray.nputil import bit_length_u64
        m = 1 << p
        low = 64 - p
        hv = splitmix64(as_u64(verts))
        bucket = (hv >> np.uint64(low)).astype(np.int64)
        w = hv & ((np.uint64(1) << np.uint64(low)) - np.uint64(1))
        rho = (low - bit_length_u64(w) + 1).astype(np.uint8)
        reg = np.zeros((len(verts), m), dtype=np.uint8)
        reg[np.arange(len(verts)), bucket] = rho
        return reg

    @classmethod
    def init(cls, sh, st, p: int = 6, rounds: int | None = 2):
        if not 4 <= p <= 12:
            raise ValueError("hyperball p must be in [4, 12] "
                             "(m = 2^p bytes/vertex of state)")
        st["p"] = int(p)
        st["rounds"] = None if rounds is None else int(rounds)
        st["R"] = cls._seed_registers(sh.verts, p)

    @staticmethod
    def compute(sh, st, superstep: int):
        R = st["R"]
        acc = np.zeros_like(R)
        outboxes = {}
        for t, tgt in sh.tgt.items():
            starts, _ = _group_starts(tgt["dst"])  # dst-sorted groups
            rows = np.maximum.reduceat(R[tgt["src"]], starts, axis=0)
            ud = tgt["dst"][starts]
            if t == sh.pid:
                acc[ud] = np.maximum(acc[ud], rows)  # ud unique
            else:
                # the ghost list is exactly the unique dsts, so the
                # dst-sorted unique indices are a full arange(size):
                # rows already IS the dense per-slot outbox
                if len(ud) == tgt["size"]:
                    outboxes[t] = rows
                else:  # invariant drift guard — scatter explicitly
                    out = np.zeros((tgt["size"], R.shape[1]),
                                   dtype=np.uint8)
                    out[ud] = rows
                    outboxes[t] = out
        st["acc"] = acc
        return outboxes

    @staticmethod
    def _estimate_rows(R: np.ndarray) -> np.ndarray:
        """Vectorized per-vertex HLL estimate over an (nv, m) register
        matrix (same math as algs.linkrank.hyperball_estimates)."""
        from totem_ray.functions.sketch import hll_alpha
        m = R.shape[1]
        s = np.exp2(-R.astype(np.float64)).sum(axis=1)
        e = hll_alpha(m) * m * m / s
        zeros = (R == 0).sum(axis=1)
        lc_ok = (e <= 2.5 * m) & (zeros > 0)
        e[lc_ok] = m * np.log(m / zeros[lc_ok])
        return e

    @classmethod
    def apply(cls, sh, st, inboxes, superstep: int) -> dict:
        acc = st.pop("acc")
        for q, arr in inboxes.items():
            idx = sh.inbox_maps[q]
            acc[idx] = np.maximum(acc[idx], arr)
        new_r = np.maximum(st["R"], acc)
        changed = int((new_r != st["R"]).any(axis=1).sum())
        st["R"] = new_r
        # N(t) for free: the engine sums ball_sum across shards, so
        # the metrics stream IS the neighborhood function
        return {"changed": changed,
                "ball_sum": float(cls._estimate_rows(new_r).sum())}

    @staticmethod
    def done(agg: dict, superstep: int, st_params: dict) -> bool:
        rounds = st_params.get("rounds", 2)
        if rounds is not None and superstep + 1 >= rounds:
            return True
        return agg["changed"] == 0

    @staticmethod
    def done_static(superstep: int, st_params: dict):
        rounds = st_params.get("rounds", 2)
        if rounds is not None:
            return superstep + 1 >= rounds
        return None

    @staticmethod
    def result(sh, st) -> pa.Table:
        R = st["R"]
        vi, bucket = np.nonzero(R)
        return pa.table({
            "v": pa.array(sh.verts[vi], type=pa.int64()),
            "bucket": pa.array(bucket.astype(np.int64), type=pa.int64()),
            "rho": pa.array(R[vi, bucket].astype(np.int64),
                            type=pa.int64())})

    state_table = None  # = result (rebound below)

    @staticmethod
    def load_state(sh, st, t: pa.Table):
        idx = np.searchsorted(sh.verts, np.asarray(t["v"]))
        st["R"][idx, np.asarray(t["bucket"])] = \
            np.asarray(t["rho"]).astype(np.uint8)


HyperBallKernel.state_table = HyperBallKernel.result


KERNELS = {
    PageRankKernel.name: PageRankKernel,
    PageRankPullKernel.name: PageRankPullKernel,
    ConnectedComponentsKernel.name: ConnectedComponentsKernel,
    LabelPropagationKernel.name: LabelPropagationKernel,
    DegreeKernel.name: DegreeKernel,
    BfsKernel.name: BfsKernel,
    Graph500Kernel.name: Graph500Kernel,
    SsspKernel.name: SsspKernel,
    PCoreKernel.name: PCoreKernel,
    BfsSigmaKernel.name: BfsSigmaKernel,
    BrandesBackKernel.name: BrandesBackKernel,
    StressBackKernel.name: StressBackKernel,
    DirOptBfsKernel.name: DirOptBfsKernel,
    Graph500StepwiseKernel.name: Graph500StepwiseKernel,
    MaxflowKernel.name: MaxflowKernel,
    PersonalizedPageRankKernel.name: PersonalizedPageRankKernel,
    WeightedPageRankKernel.name: WeightedPageRankKernel,
    HitsKernel.name: HitsKernel,
    HyperBallKernel.name: HyperBallKernel,
}
