from totem_ray.graph.edges import (  # noqa: F401
    edges_from_arrays,
    symmetrize,
    reverse_edges,
    dedup_edges,
    degree_table,
    vertex_degrees,
    subgraph,
    permute_ids,
    add_random_weights,
    sort_edges,
)
from totem_ray.graph.analysis import (  # noqa: F401
    degree_histogram,
    repeated_edges,
    count_repeated_edges,
    check_symmetry,
    vertex_universe,
    singleton_count,
    modularity,
)
from totem_ray.graph.partition import (  # noqa: F401
    HashPartitioner,
    DegreePartitioner,
    partition_stats,
)
