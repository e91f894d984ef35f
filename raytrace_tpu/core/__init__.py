from raytrace_tpu.core import vec, spectrum, sampling
from raytrace_tpu.core.config import RenderConfig
