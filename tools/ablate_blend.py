"""Ablation timings of the Pallas forward blend: monkeypatch kernel pieces
(scan, exp2, early exit, chunk width) to attribute the per-chunk cost.
Results are WRONG numerically — this is a pure cost-attribution tool."""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpu_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import lichtfeld_studio_tpu.kernels.blend_pallas as bp
    from lichtfeld_studio_tpu.core.camera import look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.ops.projection import project_gaussians
    from lichtfeld_studio_tpu.ops.tiles import build_tile_assignment, pack_features_t

    W, H = 1296, 840
    TS = 32
    CAP = 1_000_000
    N0 = 600_000
    ICAP = 1_500_000
    grid_w, grid_h = -(-W // TS), -(-H // TS)
    rng = np.random.default_rng(0)
    pos = rng.uniform(-3, 3, (N0, 3)).astype(np.float32)
    col = rng.uniform(0, 1, (N0, 3)).astype(np.float32)
    splats = SplatData(
        means=jnp.asarray(np.pad(pos, ((0, CAP - N0), (0, 0)))),
        sh0=jnp.asarray(np.pad(((col - 0.5) / 0.2821)[:, None, :], ((0, CAP - N0), (0, 0), (0, 0)))),
        shN=jnp.zeros((CAP, 15, 3)),
        scaling=jnp.full((CAP, 3), float(np.log(0.02))),
        rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (CAP, 1)),
        opacity=jnp.full((CAP, 1), 0.0),
        n_active=jnp.asarray(N0, jnp.int32),
        active_sh_degree=jnp.asarray(3, jnp.int32),
        max_sh_degree=3,
        scene_scale=3.0,
    )
    cam = look_at_camera(
        np.array([0.0, 0.0, -8.0]), np.zeros(3), np.array([0.0, -1.0, 0.0]),
        fx=1000.0, fy=1000.0, width=W, height=H,
    ).device_params()

    # splats/cam as ARGS: the closure form constant-folds the binning at
    # compile time (PERFNOTES r4 compile-time section)
    @jax.jit
    def prep(splats, cam):
        proj = project_gaussians(
            splats.means, splats.scaling, splats.rotation, splats.opacity,
            splats.sh0, splats.shN, splats.active_mask(), splats.active_sh_degree,
            cam.w2c, cam.cam_position, cam.K,
            width=W, height=H, tile_size=TS, exact_tile_cap=16,
        )
        assignment = build_tile_assignment(
            proj, grid_w=grid_w, grid_h=grid_h, instance_cap=ICAP,
            chunk_align=1, need_grad=True,
        )
        return pack_features_t(proj), assignment, proj.n_touched

    packed_t, assignment, n_touched = jax.block_until_ready(prep(splats, cam))

    def run(label):
        def fwd(p, asg, nt):
            return bp.blend_pallas_fused(
                p, asg, nt, grid_w=grid_w, grid_h=grid_h, tile_size=TS,
            )
        f = jax.jit(fwd)

        @jax.jit
        def probe(x):
            return x[0].ravel()[0]

        out = f(packed_t, assignment, n_touched)
        float(probe(out))
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(packed_t, assignment, n_touched)
        float(probe(out))
        dt = (time.perf_counter() - t0) / 10
        print(f"{label:34s} {dt*1000:8.2f} ms", flush=True)

    orig_scan = bp._prefix_prod_rows
    orig_alpha = bp._alpha_mxu
    orig_sumscan = bp._prefix_sum_rows

    run("A baseline fwd")

    # B: no early exit — walk every chunk (cost scales with TOTAL chunks)
    import lichtfeld_studio_tpu.ops.projection as proj_mod
    orig_thr = bp.TRANSMITTANCE_THRESHOLD
    bp.TRANSMITTANCE_THRESHOLD = -1.0
    run("B no early exit")
    bp.TRANSMITTANCE_THRESHOLD = orig_thr

    # C: scan removed (prefix product -> identity)
    bp._prefix_prod_rows = lambda x: x
    run("C no prefix scan")
    bp._prefix_prod_rows = orig_scan

    # D: no exp2 (linear alpha surrogate, masks kept)
    def alpha_linear(feat_s, basis, cx, cy, in_range, exact=True):
        alpha, s, nlo = orig_alpha(feat_s, basis, cx, cy, in_range, exact)
        # rebuild alpha without the transcendental: same mask structure
        a2 = jnp.where((s >= nlo) & (s <= -bp._LOG2_MIN_ALPHA), 0.01, 0.0)
        return a2, s, nlo

    # patch exp2 out entirely: clone of _alpha_mxu minus exp
    def alpha_noexp(feat_s, basis, cx, cy, in_range, exact=True):
        import functools as ft
        mxc = feat_s[0, :] - cx
        myc = feat_s[1, :] - cy
        ca = feat_s[2, :] * bp._INV_LN2
        cb = feat_s[3, :] * bp._INV_LN2
        cc = feat_s[4, :] * bp._INV_LN2
        op = feat_s[5, :]
        nlog_op = -jnp.log2(jnp.maximum(op, 1e-12))
        q0 = 0.5 * (ca * mxc * mxc + cc * myc * myc) + cb * mxc * myc + nlog_op
        q0 = jnp.where(in_range[0], q0, 1e10)
        q1 = -(ca * mxc + cb * myc)
        q2 = -(cc * myc + cb * mxc)
        q = jnp.stack([q0, q1, q2, 0.5 * ca, cb, 0.5 * cc])
        dims = (((0,), (0,)), ((), ()))
        s = jax.lax.dot_general(
            q, basis, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        nlog_op_col = nlog_op[:, None]
        alpha = jnp.minimum(jnp.abs(s) * 1e-4, bp.MAX_FRAGMENT_ALPHA)
        keep = (s >= nlog_op_col) & (s <= -bp._LOG2_MIN_ALPHA)
        return jnp.where(keep, alpha, 0.0), s, nlog_op_col

    bp._alpha_mxu = alpha_noexp
    run("D no exp2 (abs surrogate)")
    bp._alpha_mxu = orig_alpha

    # E: both C and D removed
    bp._alpha_mxu = alpha_noexp
    bp._prefix_prod_rows = lambda x: x
    run("E no scan + no exp2")
    bp._alpha_mxu = orig_alpha
    bp._prefix_prod_rows = orig_scan

    # F: early exit disabled AND no vector->scalar sync in the cond
    # (vs B which still evaluates max(t_run) >= -1 each iteration).
    # If F << B, the per-iteration wall is the VPU->SREG reduce readback:
    # patch the module's jnp so the cond's max() folds to a constant.
    bp.TRANSMITTANCE_THRESHOLD = -1.0
    orig_jnp_max = bp.jnp.max

    class _JnpShim:
        def __getattr__(self, k):
            return getattr(jnp, k)

        @staticmethod
        def max(x, **kw):
            return jnp.float32(1.0)  # constant: no vector reduce, no readback

    bp.jnp = _JnpShim()
    run("F no early exit, scalar cond")
    bp.jnp = jnp
    bp.TRANSMITTANCE_THRESHOLD = orig_thr


if __name__ == "__main__":
    main()
