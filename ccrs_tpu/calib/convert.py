"""Camera-model conversion.

Rebuilds ``convert_model`` (``src/util.rs:225-282``) and the grid-fit
ModelConvertFactor (``src/optimization/factors.rs:11-76``): UCM embeds
analytically into EUCM/EUCMT; any other target is fitted by projecting a
dense unprojected pixel grid through both models and minimizing the
difference with the dense LM core (Huber 1.0, standard bounds, disabled
distortions honored).  The 10000-px penalty for unprojectable grid points
mirrors factors.rs:71.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import GenericModel
from ..models.projections import project_fn, unproject_fn
from ..solve.lm import LMOptions, lm_solve
from .single import build_bounds, disabled_free_mask

INVALID_PENALTY = 10000.0  # factors.rs:71


import jax
from functools import partial


@partial(jax.jit, static_argnames=("unproj",))
def _unproject_grid(unproj, params, grid):
    return unproj(params, grid)


def conversion_grid(source: GenericModel, edge_ratio: int = 100, step_ratio: int = 30):
    """The reference's conversion grid (factors.rs:33-43 + util.rs:246-247):
    pixels on a [edge, size-edge) lattice with step max(w,h)/30, unprojected
    through the source model (invalid points dropped)."""
    size = max(source.width, source.height)
    edge = int(size) // 100
    step = int(size / step_ratio)
    rr = np.arange(edge, int(source.height) - edge, step)
    cc = np.arange(edge, int(source.width) - edge, step)
    grid = np.stack(np.meshgrid(cc, rr), -1).reshape(-1, 2).astype(np.float64)
    rays, valid = _unproject_grid(
        unproject_fn(source.name), jnp.asarray(source.params), jnp.asarray(grid)
    )
    rays = np.asarray(rays)[np.asarray(valid)]
    return rays


def convert_model(
    source: GenericModel, target: GenericModel, disabled_distortions: int = 0
) -> None:
    """Fit ``target``'s parameters to reproduce ``source`` (in place)."""
    if source.name == "ucm" and target.name in ("eucm", "eucmt"):
        # analytic embed: alpha copies, beta=1 (+ t1=t2=0) — util.rs:230-244
        p = source.params
        extra = [1.0] if target.name == "eucm" else [1.0, 0.0, 0.0]
        target.set_params(np.concatenate([p, extra]))
        return

    p3ds = conversion_grid(source)
    proj_src = project_fn(source.name)
    src_p2d, src_valid = proj_src(jnp.asarray(source.params), jnp.asarray(p3ds))
    proj_tgt = project_fn(target.name)
    p3ds_j = jnp.asarray(p3ds)
    src_p2d = jnp.asarray(src_p2d)
    src_valid = jnp.asarray(src_valid)

    def residual(theta):
        tgt_p2d, tgt_valid = proj_tgt(theta, p3ds_j)
        diff = src_p2d - tgt_p2d
        ok = src_valid & tgt_valid
        diff = jnp.where(ok[:, None], diff, INVALID_PENALTY)
        return diff, jnp.ones(diff.shape[0], dtype=theta.dtype)

    theta0 = target.params.copy()
    theta0[:4] = source.camera_params()  # util.rs:256-258
    lo, hi = build_bounds(target, one_focal=False)
    free = disabled_free_mask(target, False, disabled_distortions)
    theta0 = np.where(free == 0.0, 0.0, theta0)
    lo = np.where(free == 0.0, -np.inf, lo)
    hi = np.where(free == 0.0, np.inf, hi)

    theta, cost, _ = lm_solve(
        residual,
        jnp.asarray(theta0),
        lo=jnp.asarray(lo),
        hi=jnp.asarray(hi),
        free=jnp.asarray(free),
        opts=LMOptions(huber_delta=1.0),
    )
    target.set_params(np.asarray(theta))
