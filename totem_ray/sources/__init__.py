from totem_ray.sources.fixtures import (  # noqa: F401
    topology_edges,
    rmat_edges,
    uniform_edges,
    TOPOLOGIES,
)
from totem_ray.sources.pages import render_pages_table, write_pages_parquet  # noqa: F401
from totem_ray.sources.extract import (  # noqa: F401
    extract_text_batch,
    extract_links_batch,
    pages_to_edges,
    pages_to_text,
)
from totem_ray.sources.sink import write_parquet_resumable  # noqa: F401
