from totem_ray.algs.pagerank import pagerank  # noqa: F401
from totem_ray.algs.components import connected_components  # noqa: F401
from totem_ray.algs.labelprop import label_propagation  # noqa: F401
from totem_ray.algs.triangles import (triangle_counts,  # noqa: F401
                                      clustering_coefficient,
                                      edge_supports)
from totem_ray.algs.ktruss import ktruss  # noqa: F401
from totem_ray.algs.linkrank import (effective_diameter,  # noqa: F401
                                     hits, hyperball,
                                     hyperball_estimates,
                                     neighborhood_function,
                                     pagerank_weighted,
                                     personalized_pagerank)
from totem_ray.algs.traversal import (apsp, bfs, bfs_stepwise,  # noqa: F401
                                      bfs_tree, bfs_tree_stepwise,
                                      closeness, sssp, st_connectivity)
from totem_ray.algs.pcore import pcore  # noqa: F401
from totem_ray.algs.betweenness import betweenness  # noqa: F401
from totem_ray.algs.stress import stress  # noqa: F401
from totem_ray.algs.maxflow import maxflow  # noqa: F401
