"""Community label propagation (LabelRank-lite) wrapper.

Reference: label_propagation_cpu
(src/alg/totem_label_propagation.cu:159-217). Sparse reformulation —
see engine/kernels.LabelPropagationKernel for the exact-semantics
notes. ``max_support=None`` is exact (reference parity); set a cap
(e.g. 64) for web-scale runs, where truncation keeps per-vertex
support bounded (documented deviation).
"""

from __future__ import annotations

from totem_ray.engine.bsp import BspEngine


def label_propagation(edges, num_partitions: int = 4, partitioner=None,
                      vertices=None, engine: BspEngine | None = None,
                      max_support: int | None = None,
                      max_iterations: int | None = None,
                      checkpoint_dir: str | None = None,
                      checkpoint_every: int = 0, resume: bool = False) -> dict:
    """Returns {result: Dataset(v, label), iterations, ...}.

    Labels are vertex ids; a vertex's final label is the argmax-
    probability label with ties to the lowest id, stopped when every
    vertex is stable for 5 rounds or after 25 rounds
    (totem_label_propagation.cu:17-18).
    """
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices)
    out = engine.run("label_propagation",
                     {"max_support": max_support,
                      "max_iterations": max_iterations},
                     max_supersteps=max_iterations or 25,
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out
