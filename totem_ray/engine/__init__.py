from totem_ray.engine.bsp import BspEngine  # noqa: F401
from totem_ray.engine.kernels import KERNELS  # noqa: F401
