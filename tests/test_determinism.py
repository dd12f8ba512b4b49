"""Two renders must be bitwise identical — unlike the reference, whose
thread scheduling is benign-racy (SURVEY section 5.2), the jitted
pipeline is pure and the CI asserts it stays that way."""

import numpy as np

from rendering_tpu.models.scene import load_scene
from rendering_tpu.models.settings import RenderSettings
from rendering_tpu.render.pipeline import render


def test_bitwise_deterministic(in_workspace):
    scene = load_scene(
        "t01_simple_shapes.scene",
        RenderSettings(ssaa_capacity_fraction=1.0),
    )
    import dataclasses

    st = scene.static
    scene = dataclasses.replace(
        scene,
        static=dataclasses.replace(
            st, settings=st.settings.replace(width=80, height=60)
        ),
    )
    f1, _ = render(scene)
    f2, _ = render(scene)
    assert np.array_equal(f1, f2)
