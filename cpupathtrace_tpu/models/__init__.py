from .scenes import (
    bench_box_scene,
    bench_camera,
    bench_dragon_scene,
    cornell_demo_camera,
    cornell_demo_options,
    cornell_demo_scene,
    standin_dragon_obj,
)
