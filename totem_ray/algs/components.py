"""Connected components (hash-min label propagation) wrapper.

Reference: cc_hybrid (src/alg/totem_cc_hybrid.cu) — labels converge to
the minimum vertex id of each component over the adjacency as given
(exact-label tests, src/test/totem_cc_unittest.cu:114-142). Edgeless
graphs naturally yield label[v] = v (:33-49's special case falls out
of min-propagation with no messages).
"""

from __future__ import annotations

from totem_ray.engine.bsp import BspEngine


def connected_components(edges, num_partitions: int = 4, partitioner=None,
                         vertices=None, engine: BspEngine | None = None,
                         max_supersteps: int = 100_000,
                         checkpoint_dir: str | None = None,
                         checkpoint_every: int = 0, resume: bool = False) -> dict:
    """Returns {result: Dataset(v, label), iterations, ...}; label =
    min vertex id (int64 order) in the component."""
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices)
    out = engine.run("connected_components", {},
                     max_supersteps=max_supersteps,
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out


def component_sizes(cc_result_ds):
    """Per-component vertex counts + the biggest component — the
    component_set_t summary (get_components_cpu,
    src/totem/totem_components.cu:105-146)."""
    from ray.data.aggregate import Count

    sizes = cc_result_ds.groupby("label").aggregate(Count(alias_name="size"))
    biggest = sizes.sort("size", descending=True).take(1)
    return sizes, (biggest[0] if biggest else None)
