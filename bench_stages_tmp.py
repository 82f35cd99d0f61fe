import json, time
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from functools import partial
    from orb_slam_tpu.frontend.orb_extractor import ORBConfig, ORBExtractor
    from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
    from orb_slam_tpu.ops.fast_stack import (
        build_pyramid_stack, detect_keypoints_stack, fast_score_stack)
    from orb_slam_tpu.ops.descriptor_stack import (
        gaussian_blur_stack, ic_angles_batch, rbrief_batch)
    from orb_slam_tpu.utils.timing import dispatch_fused

    W, H = 640, 480
    N_IT = 15
    cfg = ORBConfig(n_features=1000)
    ex = ORBExtractor(cfg)
    scene = SyntheticScene(n_points=800, width=W, height=H)
    poses = lateral_trajectory(N_IT + 1, step=0.05)
    images = [jnp.asarray(scene.render_image(poses[i])) for i in range(N_IT + 1)]
    consts = ex.pyramid_consts((H, W))
    quotas = tuple(cfg.level_quotas())

    shapes_holder = {}
    def stage_pyr(img, consts):
        stack, shapes = build_pyramid_stack(img, cfg.n_levels, cfg.scale_factor, consts=consts)
        shapes_holder['s'] = tuple(shapes)
        return stack
    pyr = jax.jit(dispatch_fused(stage_pyr))
    touch = jax.jit(lambda x: x + 0.0)
    for img in images: float(jnp.sum(touch(img)))
    stacks = []
    for img in images:
        st = pyr(img, consts); np.asarray(st); stacks.append(st)
    shapes_t = shapes_holder['s']

    t0 = time.perf_counter()
    outs = [pyr(images[i], consts) for i in range(N_IT)]
    float(sum(jnp.sum(o) for o in outs)); t_pyr = (time.perf_counter()-t0)/N_IT

    det = jax.jit(dispatch_fused(partial(
        detect_keypoints_stack, shapes=shapes_t, quotas=quotas,
        th_ini=cfg.fast_th_ini, th_min=cfg.fast_th_min,
        cell_size=cfg.cell_size, border=cfg.edge_threshold)))
    r = det(stacks[-1]); jax.tree.map(np.asarray, r)
    dets = []
    for st in stacks:
        r = det(st); jax.tree.map(np.asarray, r); dets.append(r)
    t0 = time.perf_counter()
    outs = [det(stacks[i]) for i in range(N_IT)]
    float(sum(jnp.sum(o[1]) for o in outs)); t_det = (time.perf_counter()-t0)/N_IT

    def stage_desc(stack, xy_l):
        blurred = jnp.round(gaussian_blur_stack(stack))
        ang = ic_angles_batch(stack, xy_l, shapes_t)
        desc = rbrief_batch(blurred, xy_l, ang, shapes_t)
        return desc
    dsc = jax.jit(dispatch_fused(stage_desc))
    np.asarray(dsc(stacks[-1], dets[-1][0]))
    t0 = time.perf_counter()
    outs = [dsc(stacks[i], dets[i][0]) for i in range(N_IT)]
    float(sum(jnp.sum(o) for o in outs)); t_dsc = (time.perf_counter()-t0)/N_IT

    # just FAST score for reference
    fsc = jax.jit(dispatch_fused(fast_score_stack))
    np.asarray(fsc(stacks[-1]))
    t0 = time.perf_counter()
    outs = [fsc(stacks[i]) for i in range(N_IT)]
    float(sum(jnp.sum(o) for o in outs)); t_fsc = (time.perf_counter()-t0)/N_IT

    print(json.dumps({"pyramid_ms": round(t_pyr*1e3,2),
                      "detect_ms": round(t_det*1e3,2),
                      "fast_score_only_ms": round(t_fsc*1e3,2),
                      "blur_angle_desc_ms": round(t_dsc*1e3,2)}))

main()
