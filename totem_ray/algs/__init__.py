from totem_ray.algs.pagerank import pagerank  # noqa: F401
from totem_ray.algs.components import connected_components  # noqa: F401
from totem_ray.algs.labelprop import label_propagation  # noqa: F401
from totem_ray.algs.triangles import triangle_counts, clustering_coefficient  # noqa: F401
from totem_ray.algs.traversal import (bfs, bfs_tree, closeness,  # noqa: F401
                                      sssp, st_connectivity)
from totem_ray.algs.pcore import pcore  # noqa: F401
from totem_ray.algs.betweenness import betweenness  # noqa: F401
