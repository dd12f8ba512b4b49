"""Inverse rendering end-to-end: gradient-descent recovery of perturbed
scene parameters against a target render (the north-star demo of the
differentiable redesign — SURVEY section 7 step 8; the reference is
forward-only and has no counterpart)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from rendering_tpu.diff.checkpoint import load_checkpoint, save_checkpoint
from rendering_tpu.diff.inverse import (
    apply_params,
    extract_params,
    make_train_step,
)
from rendering_tpu.models.parser import LightDef, ObjectDef, SceneDef
from rendering_tpu.models.scene import build_scene
from rendering_tpu.models.settings import RenderSettings
from rendering_tpu.render.pipeline import render_scene


def _scene(intensity=0.6, color=(1.0, 0.3, 0.2)):
    st = RenderSettings(
        width=20, height=16, enable_ssaa=False, enable_output=False,
        output_progress=False, background_color=(0.15, 0.15, 0.2),
    )
    sd = SceneDef(settings=st)
    sd.lights = [
        LightDef("distant", color=(1, 1, 1), intensity=intensity,
                 dir=(0.2, -0.4, -1.0)),
    ]
    sd.objects = [
        ObjectDef("plane", pos=(0, -1.2, 0), normal=(0, 1, 0),
                  color=(0.8, 0.8, 0.8)),
        ObjectDef("sphere", pos=(0, 0, -3), radius=0.9, color=color),
    ]
    return build_scene(sd)


def test_recover_light_and_color():
    """Start from wrong light intensity + sphere color; adam on the
    pixel MSE must recover both (loss drops >100x, params approach the
    target values)."""
    import optax

    target_scene = _scene(intensity=0.6, color=(1.0, 0.3, 0.2))
    target, _ = render_scene(target_scene)

    start = _scene(intensity=0.25, color=(0.4, 0.7, 0.6))
    paths = (("lights", 0, "intensity"), ("obj_color",))
    params = extract_params(start, paths)

    init_fn, step_fn = make_train_step(paths, optimizer=optax.adam(5e-2))
    opt_state = init_fn(params)
    losses = []
    for _ in range(120):
        params, opt_state, loss = step_fn(params, opt_state, start, target)
        losses.append(float(loss))

    assert losses[-1] < losses[0] * 1e-3, (losses[0], losses[-1])
    # intensity and albedo are only identifiable as a product from a
    # diffuse image (classic scale ambiguity): assert the product.
    rec_i = float(params["lights/0/intensity"])
    rec_color = np.asarray(params["obj_color"])[1]
    np.testing.assert_allclose(
        rec_i * rec_color, 0.6 * np.array([1.0, 0.3, 0.2]), atol=0.02
    )


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    import optax

    scene = _scene()
    paths = (("lights", 0, "intensity"),)
    params = extract_params(scene, paths)
    init_fn, step_fn = make_train_step(paths, optimizer=optax.adam(1e-2))
    opt_state = init_fn(params)
    target, _ = render_scene(_scene(intensity=0.9))
    params, opt_state, _ = step_fn(params, opt_state, scene, target)

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, 7, params, opt_state)
    step, p2, o2, frame, mask = load_checkpoint(path, params, opt_state)
    assert step == 7 and frame is None and mask is None
    np.testing.assert_allclose(
        np.asarray(p2["lights/0/intensity"]),
        np.asarray(params["lights/0/intensity"]),
    )
    # resumed step must run with the restored optimizer state
    p3, o3, loss = step_fn(p2, o2, scene, target)
    assert np.isfinite(float(loss))
