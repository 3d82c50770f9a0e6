"""SPI inversion CLI.

Flag names and defaults mirror spi/run_inversion.py:18-42; output
directory layout mirrors :60-79. Loads the converted EG3D checkpoint
(see spi_tpu.convert) or a randomly initialized generator with
--random_init (useful for smoke/perf runs without weights).

Usage:
    python -m spi_tpu.cli.run_inversion \
        --data_root <root with crop/ c/ mask/ lm/> \
        --output_root out/ \
        --eg3d_ckpt checkpoints/ffhqrebalanced512-128.npz \
        --first_inv_type mir --first_inv_steps 500 \
        --G_1_type RotBbox --G_1_step 1000 \
        --pt_rot_lambda 0.1 --pt_mirror_rot_lambda 0.05 --pt_depth_lambda 1
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="TPU-native SPI inversion")
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--data_mode", type=str, default="png")
    parser.add_argument("--output_root", type=str, default="test/output/")
    parser.add_argument("--eg3d_ckpt", type=str, default="checkpoints/ffhqrebalanced512-128.npz")
    parser.add_argument("--perception_ckpt", type=str, default=None,
                        help="npz bundle from spi_tpu.convert with VGG/ArcFace weights")
    parser.add_argument("--random_init", action="store_true", default=False,
                        help="random generator/perception weights (smoke/perf runs)")
    parser.add_argument("--use_adapt_yaw_range", action="store_true", default=False)
    parser.add_argument("--not_use_wandb", action="store_true", default=False)

    parser.add_argument("--first_inv_type", type=str, default="sg")
    parser.add_argument("--first_inv_steps", type=int, default=500)
    parser.add_argument("--G_1_step", type=int, default=500)
    parser.add_argument("--G_1_type", type=str, default="RotBbox")
    parser.add_argument("--G_2_step", type=int, default=500)
    parser.add_argument("--load_embedding_coach_name", type=str, default=None)

    parser.add_argument("--pt_rot_lambda", type=float, default=0)
    parser.add_argument("--pt_mirror_rot_lambda", type=float, default=0)
    parser.add_argument("--pt_depth_lambda", type=float, default=0)
    parser.add_argument("--pt_tv_lambda", type=float, default=0)
    parser.add_argument("--LPIPS_value_threshold", type=float, default=0.05,
                        help="early-stop when the recon LPIPS drops below "
                             "this (hyperparameters.py:13); negative disables")

    parser.add_argument("--description", type=str, default=None)
    parser.add_argument("--dataset_block", type=str, default=None,
                        help="'i/N' worklist slice (images_dataset.py:149-158)"
                             "; 'auto' derives it from the multi-host "
                             "process grid (spi_tpu.parallel.multihost)")
    parser.add_argument("--select_range", type=int, default=None)
    parser.add_argument("--filter_index", type=str, default=None, help="1,2,3")
    parser.add_argument("--save_video", action="store_true", default=False)
    parser.add_argument("--log_snapshot", type=int, default=0,
                        help="save the in-progress reconstruction every N "
                             "tuning steps (reference global_config.py:7 "
                             "uses 100); 0 = off")
    parser.add_argument("--parallel_images", type=int, default=1,
                        help="invert N images per SPMD program, image axis "
                             "sharded across the device mesh (TPU-native "
                             "replacement for the reference's dataset_block "
                             "+ one-process-per-GPU fan-out)")
    parser.add_argument("--fp32", action="store_true", default=False,
                        help="disable the bfloat16 compute path (slower, "
                             "reference-exact numerics)")
    parser.add_argument("--tiny", action="store_true", default=False,
                        help="scaled-down generator (128^2, 4+4 depth "
                             "samples) for smoke runs / CI; implies the "
                             "dataset is resized to match")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax

    from spi_tpu.data.dataset import PTIDataset
    from spi_tpu.models.triplane import ffhq512_128_config
    from spi_tpu.training.pipeline import InversionPipeline, PipelineConfig

    if args.tiny:
        from spi_tpu.models.triplane import tiny_test_config

        generator = tiny_test_config(
            compute_dtype="float32" if args.fp32 else "bfloat16"
        )
    else:
        generator = ffhq512_128_config(
            compute_dtype="float32" if args.fp32 else "bfloat16"
        )
    if args.random_init:
        g_params = generator.init(jax.random.PRNGKey(0))
        perception = None
    else:
        from spi_tpu.utils.checkpoint import load_pytree

        like = generator.init(jax.random.PRNGKey(0))
        g_params = load_pytree(args.eg3d_ckpt, like=like)
        perception = None
        if args.perception_ckpt:
            perception = load_pytree(args.perception_ckpt)

    config = PipelineConfig(
        output_root=args.output_root,
        first_inv_type=args.first_inv_type,
        first_inv_steps=args.first_inv_steps,
        G_1_type=args.G_1_type,
        G_1_step=args.G_1_step,
        pt_rot_lambda=args.pt_rot_lambda,
        pt_mirror_rot_lambda=args.pt_mirror_rot_lambda,
        pt_depth_lambda=args.pt_depth_lambda,
        pt_tv_lambda=args.pt_tv_lambda,
        lpips_threshold=args.LPIPS_value_threshold,
        use_adapt_yaw_range=args.use_adapt_yaw_range,
        load_embedding_coach_name=args.load_embedding_coach_name,
        description=args.description,
        save_video=args.save_video,
        parallel_images=args.parallel_images,
        log_snapshot=args.log_snapshot,
    )

    if args.dataset_block == "auto":
        import warnings

        from spi_tpu.parallel.multihost import host_block, initialize

        # Without an initialized multi-process runtime every launched
        # process would see process_count()==1 and resolve to block
        # "1/1" — i.e. silently invert the FULL worklist. initialize()
        # is a safe no-op for genuinely single-process runs.
        if not initialize():
            warnings.warn(
                "--dataset_block auto: jax.process_count()==1 after "
                "jax.distributed.initialize(); this process takes the "
                "whole worklist (block 1/1). If you launched several "
                "processes, set the multi-process env (coordinator "
                "address etc.) or pass explicit --dataset_block i/N.")
        args.dataset_block = host_block()

    dataset = PTIDataset(
        source_root=os.path.join(args.data_root, "crop"),
        c_root=os.path.join(args.data_root, "c"),
        mask_root=os.path.join(args.data_root, "mask"),
        lm_root=os.path.join(args.data_root, "lm"),
        target_name="target",
        mode=args.data_mode,
        dataset_block=args.dataset_block,
        select_range=args.select_range,
        filter_index=args.filter_index.split(",") if args.filter_index else None,
        size=generator.img_resolution,
    )

    pipeline = InversionPipeline(generator, g_params, config, perception)
    results = pipeline.run(dataset)
    for r in results:
        print(
            f"{r.get('w').shape} stage1={r['stage1_s']:.1f}s "
            f"stage2={r['stage2_s']:.1f}s steps={r['steps_run']} "
            f"metrics={r.get('metrics')}"
        )

    # Multi-host runs: combine per-host metric sums into global means
    # (one process_allgather per run — the only cross-host traffic in
    # the pipeline; parallel/multihost.py).
    import jax

    if jax.process_count() > 1:
        from spi_tpu.parallel.multihost import aggregate_metrics

        # EVERY process must enter the collective — with the reference
        # block arithmetic (block = n//total + 1) trailing hosts can get
        # empty stripes, and a host that skipped the allgather would
        # leave the others blocked inside process_allgather forever.
        # aggregate_metrics uses a fixed metric-name layout, so an empty
        # host contributes a zero vector.
        sums: dict[str, float] = {"n": float(len(results))}
        for r in results:
            for k, v in (r.get("metrics") or {}).items():
                sums[k] = sums.get(k, 0.0) + float(v)
        global_means = aggregate_metrics(sums)
        if jax.process_index() == 0:
            print(f"global metric means over all hosts: {global_means}")
            with open(os.path.join(
                pipeline.dirs["experiments"], "metric_log_global.txt"
            ), "a") as f:
                f.write(f"{global_means}\n")
    return results


if __name__ == "__main__":
    main()
