"""The documented public surface imports and stays stable."""


def test_public_api_imports():
    from sp_gan_tpu import ops, config  # noqa: F401
    from sp_gan_tpu.ops import (  # noqa: F401
        pairwise_sqdist, knn_indices, edge_features, gather_neighbors,
        chamfer, chamfer_sums, nn_distance, emd_auction, emd_cost,
        farthest_point_sample, gather_points, ball_query, three_nn,
        three_interpolate, minimum_density_sample, knn_query, group_points,
        query_and_group, expansion_penalty, voxel_occupancy)
    from sp_gan_tpu.nn import (  # noqa: F401
        Generator, Discriminator, EdgeBlock, AdaptivePointNorm, Attention,
        TorchDense, EqualDense)
    from sp_gan_tpu.nn.pointnet import (  # noqa: F401
        SetAbstraction, SetAbstractionMSG, FeaturePropagation, PointConv,
        PointTransformerLayer)
    from sp_gan_tpu.losses import (  # noqa: F401
        gen_loss, dis_loss, mix_loss, r1_penalty, wgan_gp, cutmix,
        shape_preserving_loss, repulsion_loss, uniform_loss)
    from sp_gan_tpu.data import (  # noqa: F401
        H5Dataset, SyntheticDataset, sphere_template, sample_z,
        prefetch_to_device, augment_batch, normalize_point_cloud)
    from sp_gan_tpu.train import (  # noqa: F401
        TrainState, create_train_state, make_train_step, make_sample_fn,
        Trainer)
    from sp_gan_tpu.eval import (  # noqa: F401
        compute_all_metrics, pairwise_cd_matrix, pairwise_emd_matrix,
        coverage, mmd, knn_two_sample, jsd, f_score, frechet_distance, FPD)
    from sp_gan_tpu.parallel import (  # noqa: F401
        make_mesh, batch_sharding, shard_batch)
    from sp_gan_tpu.parallel.points import (  # noqa: F401
        knn_pointsharded, edge_features_pointsharded, chamfer_pointsharded,
        pairwise_emd_matrix_pointsharded)
    from sp_gan_tpu.manipulate import (  # noqa: F401
        Manipulator, from_checkpoint, blend_z, replace_z, flip_z, exchange_z,
        half_space_mask, region_mask)
    from sp_gan_tpu.compat import (  # noqa: F401
        convert_generator, convert_discriminator, load_reference_checkpoint)
    from sp_gan_tpu.viz import (  # noqa: F401
        plot_grid, plot_three_views, save_xyz, save_ply, load_ply, load_pcd,
        draw_point_cloud, point_cloud_three_views)
    from sp_gan_tpu import native  # noqa: F401
    from sp_gan_tpu.utils import (  # noqa: F401
        AverageValueMeter, enable_compile_cache)
    from sp_gan_tpu.utils.profiling import StepTimer, trace, annotate  # noqa: F401
