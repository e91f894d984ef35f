from raytrace_tpu.diff.render import (
    SceneParams,
    apply_params,
    extract_params,
    render_image_from_params,
)
