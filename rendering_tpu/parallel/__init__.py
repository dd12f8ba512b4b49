from rendering_tpu.parallel.shard import (
    make_ray_mesh,
    render_scene_sharded,
    render_sharded,
)

__all__ = ["make_ray_mesh", "render_scene_sharded", "render_sharded"]
