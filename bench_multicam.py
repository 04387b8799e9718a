#!/usr/bin/env python
"""Secondary benchmark: the synthetic 8-camera rig, 1000 frames/cam
(BASELINE.json configs[4]) — one joint bundle adjustment over 8 cameras'
intrinsics, 7 extrinsics, and 1000 shared board poses, fully batched on
device (~2.3M reprojection residuals, Schur-eliminated to a 96-dim system).

Prints one JSON line with the joint-BA wall-clock and the recovered-rig
accuracy.  (bench.py remains the driver's headline metric.)
"""

import json
import sys
import time

import numpy as np


def run(C=8, F=1000, vis_frac=0.75):
    import jax
    import jax.numpy as jnp

    from ccrs_tpu.board import create_default_6x6_board
    from ccrs_tpu.models.projections import project_eucm
    from ccrs_tpu.solve import se3
    from ccrs_tpu.solve.lm import ba_solve_multi_mixed
    from ccrs_tpu.testdata import default_rig_extrinsics

    rng = np.random.default_rng(0)
    board = create_default_6x6_board()
    p3d = board.p3d.astype(np.float64)
    N = p3d.shape[0]
    gt_params = np.stack(
        [
            np.array([190.9, 190.87, 254.94, 256.86, 0.628, 1.046])
            * (1 + 0.01 * rng.standard_normal(6) * [1, 1, 0.2, 0.2, 0.5, 0.5])
            for _ in range(C)
        ]
    )
    rig = default_rig_extrinsics(C)

    # board poses (cam0 frame) + observations per camera — generated in a
    # single jitted graph (eager op-by-op execution costs a remote compile
    # per primitive on this backend)
    print("generating observations...", file=sys.stderr)

    @jax.jit
    def generate(perts, dists, rig_j, params_j):
        base = jnp.asarray([0.0, 0.0, np.pi])
        rv, _ = se3.compose(
            perts, jnp.zeros_like(perts),
            jnp.broadcast_to(base, perts.shape), jnp.zeros_like(perts),
        )
        R = se3.exp_so3(rv)
        center = jnp.asarray(p3d).mean(0)
        tv = (
            jnp.stack([jnp.zeros(F), jnp.zeros(F), dists], axis=1)
            - jnp.einsum("fij,j->fi", R, center)
        )
        poses = jnp.concatenate([rv, tv], axis=1)

        def per_cam(c_rig, c_params):
            rv_all, tv_all = se3.compose(
                jnp.broadcast_to(c_rig[:3], (F, 3)),
                jnp.broadcast_to(c_rig[3:], (F, 3)),
                poses[:, :3], poses[:, 3:],
            )
            pc = jnp.einsum("fij,nj->fni", se3.exp_so3(rv_all), jnp.asarray(p3d)) + tv_all[:, None, :]
            pr, valid = project_eucm(c_params, pc)
            inside = (
                valid
                & (pr[..., 0] >= 0) & (pr[..., 0] < 512)
                & (pr[..., 1] >= 0) & (pr[..., 1] < 512)
            )
            return pr, inside

        pr, inside = jax.vmap(per_cam)(rig_j, params_j)
        return poses, pr, inside

    perts = rng.normal(size=(F, 3)) * 0.25
    dists = rng.uniform(0.5, 1.1, F)
    poses_j, pr, inside = generate(
        jnp.asarray(perts), jnp.asarray(dists), jnp.asarray(rig), jnp.asarray(gt_params)
    )
    poses = np.asarray(poses_j)
    pr = np.asarray(pr) + rng.normal(size=(C, F, N, 2)) * 0.1
    inside = np.asarray(inside)
    p2d = np.where(inside[..., None], pr, 0.0)
    sel = np.ones((C, F), bool)
    sel[1:] = rng.uniform(size=(C - 1, F)) < vis_frac
    w = inside * sel[:, :, None]
    cam_frame_valid = (sel & (w.sum(2) >= 24)).astype(float)

    frame_valid = (cam_frame_valid.sum(0) > 0).astype(float)

    # perturbed inits (what per-camera calibration would hand over)
    theta0 = jnp.asarray(gt_params * (1 + 0.01 * rng.standard_normal(gt_params.shape)))
    ext0 = jnp.asarray(
        np.concatenate([np.zeros((1, 6)), rig[1:] + rng.normal(size=(C - 1, 6)) * 5e-3])
    )
    poses0 = jnp.asarray(poses + rng.normal(size=poses.shape) * 5e-3)
    lo = jnp.asarray(np.tile([0, 0, 0, 0, 1e-6, 1e-6], (C, 1)))
    hi = jnp.asarray(np.tile([1e4, 1e4, 512, 512, 1, 10], (C, 1)))

    n_dev = len(jax.devices())
    if n_dev > 1:
        # multi-chip: frame-shard the joint solve over the device mesh
        # (the CLI joint BA routes the same way; one psum per iteration)
        from ccrs_tpu.parallel.mesh import multi_ba_sharded_mixed

        print(f"sharding over {n_dev} devices", file=sys.stderr)

        def solve():
            return multi_ba_sharded_mixed(
                project_eucm, theta0, ext0, poses0, jnp.asarray(p3d),
                jnp.asarray(p2d), jnp.asarray(w), lo, hi, jnp.ones((C, 6)),
                jnp.asarray(cam_frame_valid), jnp.asarray(frame_valid),
            )

    else:

        def solve():
            # two-stage mixed precision: bulk descent in native f32, short
            # f64 polish — reproduces the pure-f64 solution (see solve.lm)
            # while skipping most double-float-emulated iterations
            return ba_solve_multi_mixed(
                project_eucm, theta0, ext0, poses0, jnp.asarray(p3d),
                jnp.asarray(p2d), jnp.asarray(w), lo, hi, jnp.ones((C, 6)),
                jnp.asarray(cam_frame_valid), jnp.asarray(frame_valid),
            )

    print("warmup/compile...", file=sys.stderr)
    res = solve()
    jax.block_until_ready(res.theta)
    t0 = time.perf_counter()
    res = solve()
    jax.block_until_ready(res.theta)
    dt = time.perf_counter() - t0

    theta = np.asarray(res.theta)
    ext = np.asarray(res.ext)
    focal_err = np.abs(theta[:, :2] - gt_params[:, :2]).max() / 190.0
    ext_err = np.abs(ext[1:] - rig[1:]).max()
    n_res = int(np.asarray(w).sum()) * 2

    # convergence gate: the recovered rig must sit at the injected-noise
    # floor (0.1 px/axis gaussian) — neither under-converged (rms high)
    # nor cost-gamed (rms can't go below the noise floor on this many
    # residuals), so the wall-clock can't be bought with a loose solve
    @jax.jit
    def rms_of(theta_j, ext_j, poses_j, w_j, p2d_j, p3d_j):
        # w/p2d/p3d enter as jit ARGUMENTS: closing over the numpy arrays
        # baked ~tens of MB of observations into the executable as HLO
        # constants, shipped over the tunnel on every fresh compile
        def per_cam(c_params, c_ext, w_c, p2d_c):
            rv, tv = se3.compose(
                jnp.broadcast_to(c_ext[:3], (F, 3)),
                jnp.broadcast_to(c_ext[3:], (F, 3)),
                poses_j[:, :3], poses_j[:, 3:],
            )
            pc = jnp.einsum(
                "fij,nj->fni", se3.exp_so3(rv), p3d_j
            ) + tv[:, None, :]
            pr, _ = project_eucm(c_params, pc)
            r2 = ((pr - p2d_c) ** 2).sum(-1)
            return (r2 * w_c).sum(), w_c.sum()

        s2, n = jax.vmap(per_cam)(theta_j, ext_j, w_j, p2d_j)
        return jnp.sqrt(s2.sum() / (2.0 * n.sum()))

    rms = float(
        rms_of(
            res.theta, res.ext, res.poses,
            jnp.asarray(w), jnp.asarray(p2d), jnp.asarray(p3d),
        )
    )
    print(
        f"iters={int(res.n_iters)} cost={float(res.cost):.4f} "
        f"focal_rel_err={focal_err:.2e} ext_err={ext_err:.2e} "
        f"rms={rms:.4f} px (noise floor 0.1)",
        file=sys.stderr,
    )
    assert focal_err < 3e-3, focal_err
    assert ext_err < 3e-3, ext_err
    assert 0.07 < rms < 0.13, f"rms {rms:.4f} px off the 0.1 px noise floor"
    return {
        "metric": f"joint {C}-camera BA wall-clock ({F} frames/cam, {n_res} residuals)",
        "value": round(dt, 2),
        "unit": "seconds",
        "iters": int(res.n_iters),
        "max_focal_rel_err": float(focal_err),
        "max_extrinsic_err": float(ext_err),
        "rms_px": round(rms, 4),
        "rms_gate": "0.07 < rms < 0.13 (0.1 px injected noise)",
    }


if __name__ == "__main__":
    print(json.dumps(run()))
