"""Thread-safe polars access.

Under Ray Data's threaded map workers, two threads can race the first
``import polars`` and one of them can observe a partially-initialized
module (``module 'polars' has no attribute 'Series'``). Importing THIS
module instead retries until the attributes are materialized, so user
code always sees a fully-loaded polars. Always
``from totem_ray._polars_compat import pl``.
"""

import time


def _load():
    last = None
    for _ in range(100):
        try:
            import pyarrow as _pa
            import polars as pl
            # Exercise the call paths the library uses. Construction and
            # string ops trigger polars' internal lazy imports
            # (polars._reexport etc.); doing it here — under this
            # module's import lock, with retry — guarantees every
            # needed submodule is fully in sys.modules before any
            # worker thread calls into polars.
            df = pl.DataFrame({
                "a": pl.from_arrow(_pa.array(['x="1" x="2"'])),
                "i": pl.Series([1]),
            })
            (df.with_columns(pl.col("a").str.extract_all(r'x="[^"]*"')
                             .alias("t"))
               .explode("t", empty_as_null=False).drop_nulls("t")
               .with_columns(pl.col("t").str.slice(3, None).str.head(-1),
                             pl.col("a").str.split(" "))
               .filter(pl.col("i") > 0)
               .to_arrow())
            return pl
        except (AttributeError, ImportError) as exc:  # partial module — wait
            last = exc
            time.sleep(0.05)
    raise ImportError(f"polars failed to initialize: {last}")


pl = _load()
