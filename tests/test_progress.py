"""outputProgress (src/scene.cpp:486-492): strip-rendered progress
prints, with output identical to the one-shot render."""

import dataclasses
import itertools

import numpy as np

from rendering_tpu.models.scene import load_scene
from rendering_tpu.models.settings import RenderSettings
from rendering_tpu.render.pipeline import render, render_with_progress


def _shrink(scene, w, h, **kw):
    st = scene.static
    return dataclasses.replace(
        scene,
        static=dataclasses.replace(
            st, settings=st.settings.replace(width=w, height=h, **kw)
        ),
    )


def test_progress_render_matches_and_prints(in_workspace):
    scene = load_scene(
        "t01_simple_shapes.scene", RenderSettings(ssaa_capacity_fraction=1.0)
    )
    scene = _shrink(scene, 64, 48)

    f_ref, aux_ref = render(scene)

    # Fake clock: +2s per poll -> every strip triggers a print.
    clock = itertools.count(step=2.0)
    lines = []
    f_prog, aux = render_with_progress(
        scene, strip_rows=16, _now=lambda: next(clock),
        _print=lines.append,
    )
    # t01 has transparent materials: strip-local continuation queues
    # scatter-add a pixel's two children in a different slot order than
    # the whole-frame queue, so equality is up to f32 add reassociation.
    np.testing.assert_allclose(f_ref, f_prog, atol=2e-6, rtol=3e-4)
    # 48 rows / 16-row strips = 3 strips -> 3 once-per-"second" prints,
    # reference format: fixed precision-0 percentage + '%'.
    assert lines == ["33%", "67%", "100%"]
    # strip stats must cover the same primary rays as the one-shot
    assert aux["stats"]["rays_casted"] >= 64 * 48
