"""Default configuration.

Key-for-key compatible with the reference config surface
(`/root/reference/configs/config.py:10-25` plus
`/root/reference/configs/default.yaml`), so per-subject yaml overlays written
for the reference load unchanged.  Module-path values are mapped through the
registry in :mod:`occnerf_tpu.registry`; the reference's torch module paths
are accepted as aliases of our implementations.
"""

from .node import CfgNode


def get_default_cfg() -> CfgNode:
    c = CfgNode()

    # ---- top-level runtime flags (reference configs/config.py:10-25) -----
    c.resume = False
    c.eval_iter = 10_000_000          # iteration value used at eval time
    c.render_folder_name = ""
    c.ignore_non_rigid_motions = False
    c.render_skip = 1
    c.render_frames = 100
    c.num_workers = 4

    c.category = "occnerf"
    c.eval = False

    # ---- module selection (registry keys; torch paths are aliased) -------
    c.network_module = "core.nets.occnerf.network"
    c.trainer_module = "core.train.trainers.occnerf.trainer"
    c.lr_updater_module = "core.train.trainers.occnerf.lr_updaters.exp_decay"
    c.optimizer_module = "core.train.optimizers.occnerf.optimizer"

    c.upsample_pc = False

    # ---- synthetic occlusion (reference default.yaml:17-20) --------------
    c.occlusion = CfgNode(dict(range=405, mid=451, width=86))

    # ---- embedders --------------------------------------------------------
    c.embedder = CfgNode(dict(module="core.nets.occnerf.embedders.fourier"))
    c.non_rigid_embedder = CfgNode(
        dict(module="core.nets.occnerf.embedders.hannw_fourier"))

    # ---- canonical mlp ----------------------------------------------------
    c.canonical_mlp = CfgNode(dict(
        module="core.nets.occnerf.canonical_mlps.mlp_rgb_sigma",
        mlp_depth=8,
        mlp_width=256,
        multires=10,
        i_embed=0,
        # hash-grid geometry (occnerf_mlp only; matches gridencoder
        # defaults `occnerf_mlp.py:45`).  log2_hashmap_size <= 15 selects
        # the MXU one-hot kernel on TPU (~20x faster than the XLA
        # gather/scatter path; smaller table = more hash collisions)
        num_levels=16,
        level_dim=2,
        base_resolution=16,
        log2_hashmap_size=19,
    ))

    # ---- motion weight volume --------------------------------------------
    c.mweight_volume = CfgNode(dict(
        module="core.nets.occnerf.mweight_vol_decoders.deconv_vol_decoder",
        embedding_size=256,
        volume_size=32,
        dst_voxel_size=0.0625,
        # TPU extension (not in the reference surface): scales the
        # ConvDecoder3D channel plan; 1024 = reference-exact.  Small
        # values let test meshes cover the conv-transpose sharding path.
        base_channels=1024,
    ))

    # ---- non-rigid motion mlp ---------------------------------------------
    c.non_rigid_motion_mlp = CfgNode(dict(
        module="core.nets.occnerf.non_rigid_motion_mlps.mlp_offset",
        condition_code_size=69,
        mlp_width=128,
        mlp_depth=6,
        skips=[4],
        multires=6,
        i_embed=0,
        kick_in_iter=1_000_000,
        full_band_iter=50_000,
    ))

    # ---- pose decoder ------------------------------------------------------
    c.pose_decoder = CfgNode(dict(
        module="core.nets.occnerf.pose_decoders.mlp_delta_body_pose",
        embedding_size=69,
        mlp_width=256,
        mlp_depth=4,
    ))

    # ---- data keyfilters ---------------------------------------------------
    c.train_keyfilter = ["rays", "motion_bases", "motion_weights_priors",
                         "cnl_bbox", "dst_posevec_69"]
    c.test_keyfilter = ["rays", "target_rgbs", "motion_bases",
                        "motion_weights_priors", "cnl_bbox", "dst_posevec_69"]

    # ---- training ----------------------------------------------------------
    c.train = CfgNode(dict(
        perturb=1.0,
        batch_size=1,
        shuffle=True,
        drop_last=False,
        maxiter=50_000,
        lr=0.0005,
        lr_point_dist=0.0001,
        lr_neural_point=0.0005,
        lr_point_cloud=0.0005,
        lr_mweight_vol_decoder=0.00005,
        lr_pose_decoder=0.00005,
        lr_non_rigid_mlp=0.00005,
        lrate_decay=500,
        optimizer="adam",
        log_interval=20,
        save_checkpt_interval=2000,
        save_model_interval=40_000,
        ray_shoot_mode="patch",
        lossweights=CfgNode(dict(lpips=1.0, mse=0.2)),
    ))

    # ---- per-split loader blocks -------------------------------------------
    # dataset_module / dataset usually come from the per-subject yaml
    # (`configs/occnerf/zju_mocap/387/occnerf.yaml:40-59`); the defaults
    # point at the train pipeline with the synthetic subject.
    c.train.dataset_module = "core.data.occnerf.train"
    c.train.dataset = "synthetic_train"
    c.progress = CfgNode(dict(batch_size=1, shuffle=False, drop_last=False,
                              dump_interval=500,
                              dataset_module="core.data.occnerf.train",
                              dataset="synthetic_test"))
    c.movement = CfgNode(dict(batch_size=1, shuffle=False, drop_last=False,
                              dataset_module="core.data.occnerf.train",
                              dataset="synthetic_test"))
    c.freeview = CfgNode(dict(batch_size=1, shuffle=False, drop_last=False,
                              frame_idx=0,
                              dataset_module="core.data.occnerf.freeview",
                              dataset="synthetic_test"))
    c.backview = CfgNode(dict(batch_size=1, shuffle=False, drop_last=False,
                              frame_idx=0,
                              dataset_module="core.data.occnerf.backview",
                              dataset="synthetic_test"))
    c.allview = CfgNode(dict(batch_size=1, shuffle=False, drop_last=False,
                             frame_idx=0,
                             dataset_module="core.data.occnerf.allview",
                             dataset="synthetic_test"))
    c.tpose = CfgNode(dict(batch_size=1, shuffle=False, drop_last=False,
                           dataset_module="core.data.occnerf.tpose",
                           dataset="synthetic_test"))

    # ---- misc ---------------------------------------------------------------
    c.task = "task"
    c.subject = "subject"
    c.experiment = "experiment"
    c.bgcolor = [255.0, 255.0, 255.0]
    c.occlude = False
    c.include_img = False
    c.smpl_model_dir = "third_parties/smpl/models"
    c.sex = "neutral"
    c.total_bones = 24
    c.bbox_offset = 0.3

    c.load_net = "latest"
    c.save_all = True

    c.patch = CfgNode(dict(sample_subject_ratio=0.8, N_patches=6, size=32))

    c.N_samples = 128
    c.crop_image_scale = [-1, -1]
    c.perturb = 1.0
    c.resize_img_scale = 1.0

    c.netchunk_per_gpu = 300_000
    c.chunk = 32_768
    c.n_gpus = 1

    c.show_alpha = False
    c.show_truth = False

    # ---- TPU-native additions (absent from the reference; all optional) ---
    c.tpu = CfgNode(dict(
        mesh_shape=[-1],            # -1: use all local devices on one axis
        mesh_axis_names=["data"],
        # Pallas kernels' default matmul compute mode — what the
        # DIFFERENTIABLE train pass runs at.  'float32' = exact f32
        # (6 MXU passes), 'tfloat32' = bf16x3 (~1e-6 relative error,
        # ~2x the f32 rate), 'bfloat16' = one pass (~2e-3, fastest).
        # NOTE the TPU MXU never multiplies in true f32 hardware; see
        # ops/_dtypes.py.  rank/eval knobs below override per-path.
        compute_dtype="float32",
        # precision of the XLA-side (non-Pallas) dots — MLP stacks, KNN
        # distance matmuls, LPIPS convs.  'default' = JAX's standard TPU
        # schedule (one bf16 pass, f32 accumulation — the mixed-precision
        # training idiom all shipped quality gates passed under);
        # 'tensorfloat32' = bf16x3 (~1e-6); 'float32' = exact.
        xla_matmul_precision="default",
        knn_backend="approx",       # 'approx' (lax.approx_max_k) | 'exact'
        knn_recall=0.95,            # approx_max_k recall target
        # per-sample hash-grid encode backend: 'auto' | 'pallas' (MXU
        # one-hot, tables <= 2^15) | 'sorted' (scatter-free sorted
        # backward, any size) | 'xla' (AD oracle path)
        hashgrid_backend="auto",
        # KNN vertex-feature aggregation backend: 'auto' | 'pallas'
        # (attention-weighted one-hot MXU matmul, V-block tiled +
        # per-scale group factorized, any table size — kills the
        # per-chunk scatter-add backward) | 'xla' (gather+einsum oracle)
        vertagg_backend="auto",
        # rank compaction candidates with a max-pooled+dilated HALF-RES
        # proxy volume (a provable upper bound of the exact trilinear
        # foreground likelihood: positive-mass samples can never be
        # hidden from the ranking) instead of the full-resolution motion
        # pass — ~4x cheaper ranking; the kept rows then get the exact
        # full-res motion pass (train: differentiable; eval: no-grad)
        motion_rank_proxy=False,
        # EVAL-path refinement of motion_rank_proxy: bake the per-bone
        # ranking bound into ONE observation-space volume per frame
        # (ops/trilinear.build_obs_proxy) so ranking costs a single
        # volume lookup per sample instead of total_bones lookups.
        # Requires motion_rank_proxy; training path is unaffected.
        obs_rank_proxy=False,
        # matmul compute mode for the STOP-GRADIENT ranking pass of
        # two-pass compacted training (models/network.py); accepts
        # 'float32' | 'tfloat32' | 'bfloat16' like compute_dtype.
        # bfloat16 runs its MXU work at ~6x the f32 rate; only the
        # compaction ranking, the comp-loss zero-count and the
        # visibility counter see the rounding (the differentiable
        # kept-row pass stays at compute_dtype)
        rank_compute_dtype="float32",
        # matmul compute mode for the no-grad eval/render path (motion
        # kernel + per-sample hash encode); same accepted values.
        # bfloat16 = ~0.4% feature rounding; training is unaffected
        eval_compute_dtype="float32",
        eval_ray_bucket=8192,       # rays padded to a multiple of this at eval
        # eval/render-path compaction fraction; < 0 follows
        # sample_compaction.  The no-grad path tolerates a lower
        # fraction than training (nothing differentiates through
        # dropped rows), making render throughput tunable without
        # touching the training recipe
        eval_sample_compaction=-1.0,
        train_chunk=1024,           # rays per rematerialized train chunk
        eval_chunk=2048,            # rays per eval/render chunk (occnerf mlp)
        # occupancy-guided sample compaction: fraction of per-chunk samples
        # (ranked by foreground likelihood) queried through the canonical
        # MLP; 1.0 = off.  Exact when every positive-likelihood sample
        # fits in the fraction; see models/network.py
        sample_compaction=1.0,
        prefetch=2,                 # host->device prefetch depth
        # write checkpoints on a background thread after a device-side
        # snapshot (train/checkpoint.py AsyncCheckpointer): hides the
        # ~780 MB device->host transfer + npz write behind training
        # compute.  Identical bytes on disk; the Trainer drains the
        # queue at end of training and before any abort
        async_checkpoint=False,
        seed=42,
        profile_dir="",             # jax profiler trace dir ("" = off)
        profile_steps=5,            # iterations captured per trace
    ))

    return c
