"""Inverse-rendering demo: recover perturbed scene parameters by
gradient descent on pixel MSE — the capability the TPU-native redesign
adds over the forward-only C++ reference.

Renders a target frame from a scene file, perturbs light intensity and
an object color, then optimizes them back with adam. Works on CPU or
TPU; any scene in tests/scenes/ (or the reference's input/) works.

Usage (from a directory whose input/ holds the scene's assets):
    python examples/inverse_demo.py [scene.scene] [--steps 150]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    args = argparse.ArgumentParser(description=__doc__)
    args.add_argument("scene", nargs="?", default="input/simple_shapes.scene")
    args.add_argument("--steps", type=int, default=150)
    args.add_argument("--lr", type=float, default=5e-2)
    ns = args.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from rendering_tpu.diff.inverse import (
        apply_params,
        extract_params,
        make_train_step,
    )
    from rendering_tpu.models.scene import load_scene
    from rendering_tpu.models.settings import RenderSettings
    from rendering_tpu.render.pipeline import render_scene

    # SSAA off: the Sobel mask is a discrete function of the frame, so
    # keeping it out of the loop gives cleaner gradients.
    scene = load_scene(ns.scene, RenderSettings(enable_ssaa=False))

    paths = (("lights", 0, "intensity"), ("obj_color",))
    true_params = extract_params(scene, paths)
    target, _ = render_scene(scene)
    target = jnp.asarray(target)

    # Perturb: the optimizer has to find its way back.
    start_params = {
        k: v * 0.4 + 0.1 for k, v in true_params.items()
    }
    start_scene = apply_params(scene, start_params, paths)

    init_fn, step_fn = make_train_step(paths, optimizer=optax.adam(ns.lr))
    params = extract_params(start_scene, paths)
    opt_state = init_fn(params)

    for i in range(ns.steps):
        params, opt_state, loss = step_fn(
            params, opt_state, start_scene, target
        )
        if i % 10 == 0 or i == ns.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.3e}")

    print(
        "\nrecovered vs true (note: light intensity x albedo is only"
        "\nidentifiable as a product from a single image, and channels"
        "\nthe camera never sees keep their init):"
    )
    for k in params:
        rec = np.asarray(params[k]).ravel()
        true = np.asarray(true_params[k]).ravel()
        err = float(np.abs(rec - true).max())
        print(f"  {k}: max abs err {err:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
