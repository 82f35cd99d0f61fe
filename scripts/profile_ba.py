"""Scan-slope profile of local BA's sub-stages on the real TPU.

The full-pipeline bench (round 3) measured bundle_adjust at ~7 s/call on
device at production shapes (P=16384, OBS_CAP=32, Kl=80) — the mapper
would hog the chip for seconds per keyframe. This isolates which stage:
edge terms, the batched 3x3 point-block linalg, the Hcc/bc scatters, the
O^2 Schur scatter loop, or the dense reduced solve.

Usage: python scripts/profile_ba.py [P] [O] [Kl]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    P = int(_sys.argv[1]) if len(_sys.argv) > 1 else 16384
    O = int(_sys.argv[2]) if len(_sys.argv) > 2 else 32
    Kl = int(_sys.argv[3]) if len(_sys.argv) > 3 else 80
    K = 128
    rng = np.random.default_rng(0)

    kf_pose = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (K, 1, 1)))
    pt_pos = jnp.asarray(np.stack(
        [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
         rng.uniform(4, 10, P)], 1).astype(np.float32))
    obs_kf = jnp.asarray(rng.integers(0, 90, (P, O)), jnp.int32)
    uv = jnp.asarray(rng.uniform([0, 0], [640, 480], (P, O, 2))
                     .astype(np.float32))
    w = jnp.asarray((rng.random((P, O)) < 0.2).astype(np.float32))
    cam_opt = jnp.asarray(np.arange(K) < 90) & (jnp.arange(K) > 0)
    pt_opt = jnp.ones((P,), bool)
    K_mat = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]],
                        jnp.float32)

    from orb_slam_tpu.solvers.local_ba import (
        _edge_terms, _camera_compaction,
    )

    def slope(name, fn, n_lo=2, n_hi=6):
        @jax.jit
        def f(xs):
            def body(c, dx):
                out = fn(dx)
                s = sum(jnp.sum(x.astype(jnp.float32))
                        for x in jax.tree.leaves(out))
                return c + s, None
            return jax.lax.scan(body, 0.0, xs)[0]
        float(f(jnp.linspace(0, 1e-6, n_lo)))
        float(f(jnp.linspace(0, 1e-6, n_hi)))
        ts = []
        for n in (n_lo, n_hi):
            best = 1e9
            for k in range(3):
                t0 = time.perf_counter()
                float(f(jnp.linspace((k + 1) * 1e-7, 1e-6, n)))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        ms = (ts[1] - ts[0]) / (n_hi - n_lo) * 1e3
        print(f"{name:40s} {ms:9.2f} ms (device)", flush=True)
        return ms

    def edge(dx):
        return _edge_terms(kf_pose + dx, pt_pos, obs_kf, uv, K_mat)[0]

    slope("B1 edge terms r/Jc/Jp", edge)

    def ptblocks(dx):
        r, Jc, Jp, z = _edge_terms(kf_pose + dx, pt_pos, obs_kf, uv, K_mat)
        wJp = Jp * w[..., None, None]
        Hpp = jnp.einsum("pokx,poky->pxy", wJp, Jp)
        Hpp = Hpp + 1e-3 * jnp.broadcast_to(jnp.eye(3), Hpp.shape)
        Hpp_inv = jnp.linalg.inv(Hpp)
        L = jnp.linalg.cholesky(
            0.5 * (Hpp_inv + jnp.swapaxes(Hpp_inv, -1, -2))
            + 1e-12 * jnp.broadcast_to(jnp.eye(3), Hpp.shape))
        return jnp.where(jnp.isfinite(L), L, 0.0)

    slope("B2 point blocks (batched inv+chol)", ptblocks)

    def schur_scatter(dx):
        r, Jc, Jp, z = _edge_terms(kf_pose + dx, pt_pos, obs_kf, uv, K_mat)
        local_id, opt_cams, slot_used = _camera_compaction(cam_opt, Kl)
        wJc = Jc * w[..., None, None]
        kf_idx = jnp.where(w > 0, local_id[jnp.clip(obs_kf, 0, K - 1)], Kl)
        L = ptblocks(dx)
        C = jnp.einsum("pokx,poky->poxy", wJc, Jp)
        D = jnp.einsum("poxy,pyz->poxz", C, L)
        S = jnp.zeros((Kl + 1, Kl + 1, 6, 6))
        for o2 in range(O):
            V = jnp.einsum("poxz,pyz->poxy", D, D[:, o2])
            cols = jnp.broadcast_to(kf_idx[:, o2:o2 + 1], kf_idx.shape)
            S = S.at[kf_idx, cols].add(-V)
        return S

    slope("B3 ..+O^2 Schur scatter loop", schur_scatter)

    def schur_matmul(dx):
        r, Jc, Jp, z = _edge_terms(kf_pose + dx, pt_pos, obs_kf, uv, K_mat)
        local_id, opt_cams, slot_used = _camera_compaction(cam_opt, Kl)
        wJc = Jc * w[..., None, None]
        kf_idx = jnp.where(w > 0, local_id[jnp.clip(obs_kf, 0, K - 1)], Kl)
        L = ptblocks(dx)
        C = jnp.einsum("pokx,poky->poxy", wJc, Jp)
        D = jnp.einsum("poxy,pyz->poxz", C, L)
        # one-hot segment-sum per point, then ONE matmul
        E = jax.nn.one_hot(kf_idx, Kl + 1, dtype=jnp.bfloat16)  # [P,O,Kl+1]
        G = jnp.einsum("poa,poxz->paxz", E, D.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        S = -jnp.einsum("paxz,pbyz->abxy", G, G,
                        preferred_element_type=jnp.float32)
        return S

    slope("B4 ..+one-hot G + matmul S", schur_matmul)

    def linsolve(dx):
        H = jnp.eye(Kl * 6) * (1.0 + dx) + 0.01
        b = jnp.ones((Kl * 6,)) * (1.0 + dx)
        return jnp.linalg.solve(H, b)

    slope("B5 dense [Kl*6] solve", linsolve)


if __name__ == "__main__":
    main()
