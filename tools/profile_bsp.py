import ray, numpy as np, time
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from totem_ray.sources.fixtures import topology_edges
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.engine.bsp import BspEngine

n, e = topology_edges("chain_100")
ds = edges_from_arrays(e, num_blocks=4)
t0 = time.perf_counter()
eng = BspEngine(4)
t1 = time.perf_counter()
eng.build(ds)
t2 = time.perf_counter()
out = eng.run("pagerank", {"mode": "converge"}, max_supersteps=200)
t3 = time.perf_counter()
df = out["result"].to_pandas()
t4 = time.perf_counter()
print(f"actors {t1-t0:.2f}s build {t2-t1:.2f}s run {t3-t2:.2f}s ({out['iterations']} iters, {(t3-t2)/max(out['iterations'],1)*1000:.0f} ms/step) collect {t4-t3:.2f}s")
ms = out["metrics"][:3] + out["metrics"][-2:]
for m in ms: print({k: round(v,2) if isinstance(v,float) else v for k,v in m.items()})
ray.shutdown()
