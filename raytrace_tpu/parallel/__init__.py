from raytrace_tpu.parallel.sharded import (
    make_mesh,
    render_photon_sharded,
    train_step_sharded,
)
