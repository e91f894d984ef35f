from raytrace_tpu.renderers.simple import render_simple
from raytrace_tpu.renderers.photon import render_photon
