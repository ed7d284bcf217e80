import ray, numpy as np
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from totem_ray.sources.fixtures import topology_edges
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.algs import pagerank, connected_components, label_propagation, triangle_counts, clustering_coefficient

def np_pagerank_rounds(n, e, rounds=5, d=0.85):
    rank = np.full(n, 1.0/n); 
    deg = np.bincount(e[:,0].astype(int), minlength=n)
    for r in range(rounds):
        mail = np.zeros(n)
        np.add.at(mail, e[:,1].astype(int), rank[e[:,0].astype(int)])
        new = (1-d)/n + d*mail
        if r < rounds-1:
            stored = new.copy(); nz = deg>0; stored[nz] = new[nz]/deg[nz]; rank = stored
        else: rank = new
    return rank

def np_pagerank_converge(n, e, d=0.85, tol=1e-6):
    rank = np.full(n, 1.0/n)
    deg = np.bincount(e[:,0].astype(int), minlength=n)
    it = 0
    while True:
        contrib = np.zeros(n); nz = deg>0; contrib[nz] = rank[nz]/deg[nz]
        mail = np.zeros(n); np.add.at(mail, e[:,1].astype(int), contrib[e[:,0].astype(int)])
        new = (1-d)/n + d*mail
        it += 1
        if np.abs(new-rank).sum() <= tol: rank = new; break
        rank = new
    return rank, it

for name in ["chain_100", "star_1000", "complete_300", "grid_15"]:
    n, e = topology_edges(name)
    ds = edges_from_arrays(e, num_blocks=4)
    # rounds parity
    out = pagerank(ds, num_partitions=4, mode="rounds")
    got = out["result"].to_pandas().sort_values("v")["rank"].to_numpy()
    exp = np_pagerank_rounds(n, e)
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12), (name, "rounds", np.abs(got-exp).max())
    # converge
    out = pagerank(ds, num_partitions=3, mode="converge")
    got = out["result"].to_pandas().sort_values("v")["rank"].to_numpy()
    exp, it = np_pagerank_converge(n, e)
    assert np.allclose(got, exp, rtol=0, atol=1e-6), (name, "conv", np.abs(got-exp).max())
    print(name, "pagerank OK, iters", out["iterations"], "np iters", it)

# chain symmetry / complete equal / star hub
n, e = topology_edges("chain_100"); out = pagerank(edges_from_arrays(e), mode="rounds")
r = out["result"].to_pandas().sort_values("v")["rank"].to_numpy()
assert np.allclose(r, r[::-1]), "chain symmetry"
n, e = topology_edges("complete_300"); r = pagerank(edges_from_arrays(e), mode="rounds")["result"].to_pandas()["rank"].to_numpy()
assert np.allclose(r, r[0]), "complete equal"
n, e = topology_edges("star_1000"); df = pagerank(edges_from_arrays(e), mode="rounds")["result"].to_pandas().set_index("v")
assert df.loc[0,"rank"] > df.drop(0)["rank"].max(), "hub"
spokes = df.drop(0)["rank"].to_numpy(); assert np.allclose(spokes, spokes[0])
print("pagerank invariants OK")

# CC
n, e = topology_edges("chain_4_comp_40")
out = connected_components(edges_from_arrays(e, num_blocks=3), num_partitions=4)
lab = out["result"].to_pandas().sort_values("v")["label"].to_numpy()
exp = np.concatenate([np.full(10,0), np.full(10,10), np.full(11,20), np.full(9,31)])
assert np.array_equal(lab, exp), lab
import pandas as pd
vs = ray.data.from_pandas(pd.DataFrame({"v": np.arange(1000, dtype=np.int64)}))
out = connected_components(edges_from_arrays(np.empty((0,2),dtype=np.uint64)), vertices=vs, num_partitions=4)
lab = out["result"].to_pandas().sort_values("v")
assert np.array_equal(lab["v"].to_numpy(), lab["label"].to_numpy()), "disconnected"
print("cc OK, iters:", out["iterations"])

# triangles
n, e = topology_edges("complete_300")
tri = triangle_counts(edges_from_arrays(e, num_blocks=4), num_buckets=8, num_join_partitions=4).to_pandas()
assert (tri["triangles"] == 299*298//2).all() and len(tri)==300, tri.head()
cc = clustering_coefficient(edges_from_arrays(e), num_buckets=8, num_join_partitions=4).to_pandas()
assert np.allclose(cc["cc"], 1.0)
n, e = topology_edges("wheel_1000")
cc = clustering_coefficient(edges_from_arrays(e), num_buckets=8, num_join_partitions=4).to_pandas().set_index("v")
assert cc.loc[0, "triangles"] == 999, cc.loc[0]
assert (cc.drop(0)["triangles"] == 2).all()  # (r, r+-1, hub)
assert np.allclose(cc.drop(0)["cc"], 2/3)

# brute-force oracle on rmat
def brute_tri(n, e):
    import collections
    adj = [set() for _ in range(n)]
    for s_, d_ in e:
        if s_ != d_:
            adj[int(s_)].add(int(d_)); adj[int(d_)].add(int(s_))
    T = np.zeros(n, dtype=np.int64)
    for v in range(n):
        for w in adj[v]:
            if w > v:
                common = adj[v] & adj[w]
                for u in common:
                    if u > w:
                        T[v] += 1; T[w] += 1; T[u] += 1
    return T
n, e = topology_edges("rmat_s8_ef8")
T = brute_tri(n, e)
tri = triangle_counts(edges_from_arrays(e, num_blocks=3), num_buckets=8, num_join_partitions=4).to_pandas().set_index("v")["triangles"]
got = np.zeros(n, dtype=np.int64); got[tri.index.to_numpy()] = tri.to_numpy()
assert np.array_equal(got, T), (got[:20], T[:20])
print("rmat brute-force triangles OK, total:", T.sum()//3)
n, e = topology_edges("chain_1000")
cc = clustering_coefficient(edges_from_arrays(e), num_buckets=8, num_join_partitions=4).to_pandas()
assert (cc["triangles"]==0).all() and (cc["cc"]==0).all()
print("triangles OK")

# label prop
n, e = topology_edges("grid_15")
out = label_propagation(edges_from_arrays(e, num_blocks=2), num_partitions=3)
lab = out["result"].to_pandas().sort_values("v")["label"].to_numpy()
exp = np.array([6,6,7,8,8, 6,6,7,8,8, 6,6,7,8,8])
print("grid labels:", lab, "iters", out["iterations"])
assert np.array_equal(lab, exp), lab
n, e = topology_edges("complete_300")
out = label_propagation(edges_from_arrays(e), num_partitions=4)
lab = out["result"].to_pandas()["label"].to_numpy()
assert (lab == 0).all(), lab[:10]
n, e = topology_edges("star_1000")
lab = label_propagation(edges_from_arrays(e), num_partitions=4)["result"].to_pandas()["label"].to_numpy()
assert (lab == 0).all()
n, e = topology_edges("chain_1000")
out = label_propagation(edges_from_arrays(e), num_partitions=4)
df = out["result"].to_pandas().sort_values("v")
print("chain_1000 labels 0..5:", df["label"].to_numpy()[:6], "iters", out["iterations"])
print("labelprop OK")
ray.shutdown()
print("ALL ENGINE SMOKE OK")
