from totem_ray.pipelines.tpch_graph import (  # noqa: F401
    copurchase_pair_stream,
    copurchase_edges,
    read_table,
)
