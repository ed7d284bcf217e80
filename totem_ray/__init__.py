"""totem_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the query / data-processing
capabilities of netsyslab/Totem (hybrid CPU+GPU BSP graph framework,
see /root/reference and SURVEY.md) on top of ``ray.data.Dataset``:

* pages (Common-Crawl-style Parquet: url, warc_ts, html, text, lang)
  -> link extraction -> url-hashed edge table (``sources/``)
* edge-table transforms / analysis passes (``graph/``)
* a partition-parallel BSP engine: per-partition CSR shards held in
  stateful Ray actors, dense pre-aggregated message exchange playing
  the role of Totem's Grooves inbox/outbox tables (``engine/``)
* the four benchmark kernels — PageRank, connected components
  (hash-min label propagation), community label propagation, triangle
  counting / clustering coefficient (``engine/kernels.py``,
  ``algs/``)
* training-data-pipeline operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search,
  text analysis, windowed aggregates, multimodal stubs
  (``functions/``)

This is NOT a port: Totem's CUDA/OpenMP execution machinery is
replaced by Ray Data streaming execution, Arrow zero-copy batches and
actor pools. Reference citations in docstrings are ``file:line`` into
/root/reference for semantic parity checking only.
"""

__version__ = "0.1.0"

# Load polars eagerly at package root. The root is the FIRST totem_ray
# module lock any importer takes, so polars finishes initializing
# before any submodule import can be mid-flight on another worker
# thread — without this, two threads deserializing UDFs concurrently
# can deadlock-break Python's import locks and one of them observes a
# partially-initialized polars (“module 'polars' has no attribute
# 'Series'”). See _polars_compat for the retry fallback.
from totem_ray import _polars_compat as _polars_preload  # noqa: E402,F401
