"""Synthetic smoke scene — runs anywhere, no dataset files needed.

Schema-compatible with the reference scene configs
(/root/reference/configs/replica/room0.py): a module-level `config` dict.
"""

scene_name = "smoke"
seed = 3

config = dict(
    workdir="./experiments/Synthetic",
    run_name=f"{scene_name}_{seed}",
    seed=seed,
    primary_device="tpu:0",
    map_every=1,
    keyframe_every=1,
    mapping_window_size=3,
    report_global_progress_every=1000,
    eval_mode=False,
    eval_every=1,
    scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    report_iter_progress=False,
    load_checkpoint=False,
    checkpoint_time_idx=0,
    save_checkpoints=False,
    checkpoint_interval=100,
    use_wandb=False,
    baseframe_every=5,
    data=dict(
        dataset_name="synthetic",
        synthetic=dict(num_frames=11, height=48, width=64, seed=1,
                       motion_scale=0.1),
        sequence=scene_name,
        desired_image_height=48,
        desired_image_width=64,
        start=0,
        end=-1,
        stride=1,
        num_frames=-1,
    ),
    tracking=dict(
        use_gt_poses=False,
        forward_prop=True,
        num_iters=40,
        use_sil_for_loss=True,
        sil_thres=0.95,
        use_l1=True,
        ignore_outlier_depth_loss=False,
        visualize_tracking_loss=False,
        frustum=True,
        onlybase_overlap=True,
        edge=20,
        p2p_method="sum",
        keyframe_thresh=0.5,
        loss_weights=dict(im=0.5, depth=0.025),
        lrs=dict(
            means3D=0.0, rgb_colors=0.0, unnorm_rotations=0.0,
            logit_opacities=0.0, log_scales=0.0,
            cam_unnorm_rots=0.0004, cam_trans=0.002,
        ),
    ),
    mapping=dict(
        num_iters=60,
        add_new_gaussians=True,
        sil_thres=0.5,
        use_l1=True,
        use_sil_for_loss=False,
        ignore_outlier_depth_loss=False,
        loss_weights=dict(im=1.0, depth=1.0),
        lrs=dict(
            means3D=0.0, rgb_colors=0.0025, unnorm_rotations=0.0,
            logit_opacities=0.05, log_scales=0.005,
            cam_unnorm_rots=1e-8, cam_trans=1e-7,
        ),
        fixed_lrs=dict(
            means3D=0, rgb_colors=0, unnorm_rotations=0,
            logit_opacities=0, log_scales=0,
            cam_unnorm_rots=0.0, cam_trans=0.0,
        ),
        prune_gaussians=False,
        use_gaussian_splatting_densification=False,
    ),
    viz=dict(render_mode="color"),
    # at 48x64 there are only 12 tiles, so each tile sees ~N_active*span^2/12
    # pairs; max_pairs_per_tile is just the floor — auto_pair_budget (on by
    # default) re-buckets it upward with scene density (validated: this scene
    # needs 2048; at a pinned 256 silhouettes truncate and densification
    # death-spirals)
    tpu=dict(capacity_quantum=4096, span_cap=3, max_pairs_per_tile=256,
             blend_chunk=64, baseframe_capacity_quantum=8),
)
