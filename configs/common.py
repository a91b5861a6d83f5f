"""Shared scene-config builder.

Every scene config is the reference's nested dict schema
(/root/reference/configs/*/*.py); this builder centralizes the per-dataset
hyperparameter tables (values matched to the reference configs, cited below)
so the 20+ scene files stay one-liners. Scene files remain directly loadable
by `python src/vtgaussian_slam.py configs/<dataset>/<scene>.py`.
"""
from __future__ import annotations

# per-dataset knob tables
# replica:    /root/reference/configs/replica/room0.py
# tum:        /root/reference/configs/tum/fr1_config.py
# scannet:    /root/reference/configs/scannet/scene00_config.py
# scannetpp:  /root/reference/configs/scannetpp/2e_config.py
_DATASETS = {
    "replica": dict(
        group="Replica", basedir="./data/Replica",
        data_cfg="./configs/data/replica.yaml",
        H=680, W=1200, dH=1360, dW=2400,
        baseframe_every=40, overlap_every=None, far_depth_factor=None,
        eval_every=1000, scene_radius_depth_ratio=3,
        track=dict(num_iters=60, base1_num_iters=80, sil_thres=0.999,
                   ignore_outlier=False, im=0.5, depth=0.025,
                   lr_rot=0.0004, lr_trans=0.002, kf_depth_thresh=0.01,
                   earliest_thres=0.5, topk_base=3),
        map=dict(num_iters=100, im=1.0, depth=1.0),
    ),
    "tum": dict(
        group="TUM", basedir="./data/TUM_RGBD",
        data_cfg=None,  # per-scene yaml
        H=480, W=640, dH=960, dW=1280,
        baseframe_every=30, overlap_every=5, far_depth_factor=1.5,
        eval_every=500, scene_radius_depth_ratio=2,
        track=dict(num_iters=200, base1_num_iters=200, sil_thres=0.99,
                   ignore_outlier=False, im=0.5, depth=1.0,
                   lr_rot=0.002, lr_trans=0.002, kf_depth_thresh=0.01,
                   earliest_thres=0.26, topk_base=3),
        map=dict(num_iters=30, im=1.0, depth=1.0),
    ),
    "scannet": dict(
        group="ScanNet", basedir="./data/scannet",
        data_cfg="./configs/data/scannet.yaml",
        H=480, W=640, dH=960, dW=1280,
        baseframe_every=30, overlap_every=5, far_depth_factor=3.5,
        eval_every=500, scene_radius_depth_ratio=3,
        track=dict(num_iters=100, base1_num_iters=100, sil_thres=0.98,
                   ignore_outlier=False, im=0.5, depth=0.1,
                   lr_rot=0.002, lr_trans=0.002, kf_depth_thresh=0.01,
                   earliest_thres=0.24, topk_base=3),
        map=dict(num_iters=30, im=1.0, depth=1.0),
    ),
    "scannetpp": dict(
        group="ScanNetPP", basedir="./data/ScanNet++",
        data_cfg=None,
        H=584, W=876, dH=1168, dW=1752,
        baseframe_every=100, overlap_every=5, far_depth_factor=1.5,
        eval_every=1, scene_radius_depth_ratio=3,
        track=dict(num_iters=200, base1_num_iters=200, sil_thres=0.99,
                   ignore_outlier=True, im=0.5, depth=1.0,
                   lr_rot=0.001, lr_trans=0.01, kf_depth_thresh=0.05,
                   earliest_thres=0.24, topk_base=3),
        map=dict(num_iters=120, im=0.5, depth=1.0),
    ),
}


def make_config(dataset: str, scene_name: str, seed: int = 2,
                sequence: str | None = None, num_frames: int = -1,
                use_train_split: bool = True, **overrides) -> dict:
    d = _DATASETS[dataset]
    tr, mp = d["track"], d["map"]
    run_name = f"{scene_name}_{seed}" if dataset == "replica" else \
        f"{scene_name}_seed{seed}"

    config = dict(
        workdir=f"./experiments/{d['group']}",
        run_name=run_name,
        seed=seed,
        # which dataset family's keyframe/base-frame selection strategy to
        # run (the reference keys this on dataset name). Only consulted when
        # the data is replaced by a synthetic proxy (e.g. bench.py swaps
        # config["data"] for a generator): the proxy then keeps the
        # FAMILY's selection behavior instead of falling into the
        # tum/scannet default.
        selection_style=dataset,
        primary_device="tpu:0",
        map_every=1,
        keyframe_every=1,
        mapping_window_size=3,
        report_global_progress_every=1,
        eval_mode=False,
        eval_every=d["eval_every"],
        scene_radius_depth_ratio=d["scene_radius_depth_ratio"],
        mean_sq_dist_method="projective",
        gaussian_distribution="isotropic",
        report_iter_progress=False,
        load_checkpoint=False,
        checkpoint_time_idx=0,
        save_checkpoints=False,
        checkpoint_interval=100,
        # reference configs all set use_wandb=True; the logger
        # degrades to JSONL when wandb is not installed
        use_wandb=True,
        baseframe_every=d["baseframe_every"],
        wandb=dict(entity="", project="VTGaussian-SLAM-TPU",
                   group=d["group"], name=run_name,
                   save_qual=False, eval_save_qual=True),
        data=dict(
            basedir=d["basedir"],
            sequence=sequence or scene_name,
            desired_image_height=d["H"],
            desired_image_width=d["W"],
            densification_image_height=d["dH"],
            densification_image_width=d["dW"],
            start=0, end=-1, stride=1, num_frames=num_frames,
        ),
        tracking=dict(
            use_gt_poses=False,
            forward_prop=True,
            num_iters=tr["num_iters"],
            base1_num_iters=tr["base1_num_iters"],
            use_sil_for_loss=True,
            sil_thres=tr["sil_thres"],
            use_l1=True,
            ignore_outlier_depth_loss=tr["ignore_outlier"],
            visualize_tracking_loss=False,
            frustum=True,
            onlybase_overlap=True,
            edge=20,
            p2p_method="sum",
            keyframe_thresh=0.5,
            kf_depth_thresh=tr["kf_depth_thresh"],
            vis_mask_thres=0.05,
            earliest_thres=tr["earliest_thres"],
            lower_earliest_thres_percent=0.8,
            topk_base=tr["topk_base"],
            loss_weights=dict(im=tr["im"], depth=tr["depth"]),
            lrs=dict(means3D=0.0, rgb_colors=0.0, unnorm_rotations=0.0,
                     logit_opacities=0.0, log_scales=0.0,
                     cam_unnorm_rots=tr["lr_rot"], cam_trans=tr["lr_trans"]),
        ),
        mapping=dict(
            num_iters=mp["num_iters"],
            add_new_gaussians=True,
            sil_thres=0.5,
            use_l1=True,
            use_sil_for_loss=False,
            ignore_outlier_depth_loss=False,
            loss_weights=dict(im=mp["im"], depth=mp["depth"]),
            lrs=dict(means3D=0.0, rgb_colors=0.0025, unnorm_rotations=0.0,
                     logit_opacities=0.05, log_scales=0.005,
                     cam_unnorm_rots=1e-8, cam_trans=1e-7),
            fixed_lrs=dict(means3D=0, rgb_colors=0, unnorm_rotations=0,
                           logit_opacities=0, log_scales=0,
                           cam_unnorm_rots=0.0, cam_trans=0.0),
            prune_gaussians=False,
            pruning_dict=dict(start_after=0, remove_big_after=0, stop_after=20,
                              prune_every=20, removal_opacity_threshold=0.005,
                              final_removal_opacity_threshold=0.005,
                              reset_opacities=False,
                              reset_opacities_every=500),
            use_gaussian_splatting_densification=False,
            densify_dict=dict(start_after=500, remove_big_after=3000,
                              stop_after=5000, densify_every=100,
                              grad_thresh=0.0002, num_to_split_into=2,
                              removal_opacity_threshold=0.005,
                              final_removal_opacity_threshold=0.005,
                              reset_opacities_every=3000),
        ),
        viz=dict(render_mode="color", offset_first_viz_cam=True,
                 show_sil=False, visualize_cams=True, viz_w=600, viz_h=340,
                 viz_near=0.01, viz_far=100.0, view_scale=2, viz_fps=5,
                 enter_interactive_post_online=False),
        # span_cap 2 (vs the conservative default 3) at these resolutions:
        # splats project to a few pixels (scale init ~ z/f meters ~ 1 px),
        # so a 2x2-tile rect never truncates a visible disc, while binning
        # sorts 4N instead of 9N pairs and the mapping backward gathers 4
        # inverse columns instead of 9 (~45% cheaper mapping iteration).
        # Tiny-image scenes (tests) keep the default 3 — see
        # core/config.py and ROADMAP.md.
        tpu=dict(span_cap=2),
    )

    if dataset == "replica":
        config["data"]["gradslam_data_cfg"] = d["data_cfg"]
        config["data"]["downsample_image_height"] = 340
        config["data"]["downsample_image_width"] = 600
    elif dataset == "tum":
        config["data"]["gradslam_data_cfg"] = \
            f"./configs/data/TUM/{scene_name}.yaml"
        config["overlap_every"] = d["overlap_every"]
        config["far_depth_factor"] = d["far_depth_factor"]
    elif dataset == "scannet":
        config["data"]["gradslam_data_cfg"] = d["data_cfg"]
        config["overlap_every"] = d["overlap_every"]
        config["far_depth_factor"] = d["far_depth_factor"]
    elif dataset == "scannetpp":
        config["data"]["dataset_name"] = "scannetpp"
        config["data"]["ignore_bad"] = False
        config["data"]["use_train_split"] = use_train_split
        config["overlap_every"] = d["overlap_every"]
        config["far_depth_factor"] = d["far_depth_factor"]
        config["odometry_type"] = "const_speed"
        config["help_camera_initialization"] = True
        config["init_err_ratio"] = 50
        config["odometer_method"] = "point_to_plane"
        config["tracking"]["multiavg"] = False

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    merge(config, overrides)
    return config
