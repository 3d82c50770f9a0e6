"""EG3D GAN training CLI (host loop around the SPMD step).

Behavioral spec: eg3d/training/training_loop.py — per-phase updates,
G_ema, ADA p adjustment, stats.jsonl + snapshot cadence. Vendored in
the reference but unused by the SPI inversion workflow (SURVEY.md §1);
provided here for full-framework parity.

Usage:
    python -m spi_tpu.cli.run_gan_training \
        --data path/to/images_or_zip --outdir runs/gan \
        --batch 8 --kimg 25000 [--n_devices 8]
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native EG3D GAN training")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--batch", type=int, default=8, help="global batch")
    p.add_argument("--kimg", type=float, default=25000.0)
    p.add_argument("--glr", type=float, default=0.0025)
    p.add_argument("--dlr", type=float, default=0.002)
    p.add_argument("--gamma", type=float, default=1.0, help="R1 weight")
    p.add_argument("--density_reg", type=float, default=0.25)
    p.add_argument("--aug", type=str, default="ada", choices=["ada", "noaug", "fixed"])
    p.add_argument("--p", type=float, default=0.0, help="fixed aug p")
    p.add_argument("--target", type=float, default=0.6, help="ADA target")
    p.add_argument("--snap", type=int, default=50, help="snapshot every N ticks")
    p.add_argument("--tick_kimg", type=float, default=4.0)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--neural_rendering_resolution", type=int, default=64)
    p.add_argument("--sr_variant", type=str, default="SuperresolutionHybrid8XDC",
                   help="must match --resolution (8XDC->512, 8X->256, 2X->128)")
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_steps", type=int, default=None,
                   help="debug: stop after N steps regardless of kimg")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from spi_tpu.data.gan_dataset import ImageFolderDataset, batch_iterator
    from spi_tpu.models.discriminator import DualDiscriminator
    from spi_tpu.models.triplane import ffhq512_128_config
    from spi_tpu.training.augment import AugmentPipe
    from spi_tpu.training.gan import GANConfig, GANTrainer, adjust_ada_p
    from spi_tpu.utils.checkpoint import save_pytree
    from spi_tpu.utils.stats import Collector

    os.makedirs(args.outdir, exist_ok=True)

    dataset = ImageFolderDataset(args.data, resolution=args.resolution)
    print(f"dataset: {len(dataset)} images, label_dim {dataset.label_dim}")

    n_dev = args.n_devices or len(jax.devices())
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("data",)) if n_dev > 1 else None
    assert args.batch % n_dev == 0

    generator = ffhq512_128_config(
        img_resolution=args.resolution,
        neural_rendering_resolution=args.neural_rendering_resolution,
        sr_variant=args.sr_variant,
        compute_dtype="bfloat16",
    )
    discriminator = DualDiscriminator(
        c_dim=dataset.label_dim, img_resolution=args.resolution
    )
    config = GANConfig(
        batch_per_device=args.batch // n_dev,
        g_lr=args.glr, d_lr=args.dlr,
        r1_gamma=args.gamma, density_reg=args.density_reg,
        ada_target=args.target,
    )
    augment = AugmentPipe() if args.aug != "noaug" else None
    # The pipe lives INSIDE the trainer: run_D must augment both real
    # and generated pairs (upstream EG3D loss), not just the real batch.
    trainer = GANTrainer(generator, discriminator, config, augment=augment)

    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    step_fn = trainer.make_step(mesh=mesh)
    aug_p = args.p

    stats = Collector()
    batches = batch_iterator(dataset, args.batch, seed=args.seed)
    rng = jax.random.PRNGKey(args.seed + 1)

    total_steps = int(args.kimg * 1000 / args.batch)
    if args.max_steps is not None:
        total_steps = min(total_steps, args.max_steps)
    tick_interval = max(int(args.tick_kimg * 1000 / args.batch), 1)

    t0 = time.time()
    for step in range(total_steps):
        real, labels = next(batches)
        rng, k_step = jax.random.split(rng)
        real = jnp.asarray(real)
        z = jax.random.normal(
            jax.random.fold_in(rng, step), (args.batch, generator.z_dim)
        )
        c = jnp.asarray(labels)
        step_rng = (
            jax.random.split(k_step, args.batch) if mesh is not None else k_step
        )
        # aug_p enters as an ARRAY: a python float would retrace the jit
        # for every new ADA probability (it changes every ada_interval).
        state, metrics = step_fn(state, real, z, c, step_rng,
                                 jnp.asarray(aug_p, jnp.float32))

        if args.aug == "ada" and (step + 1) % config.ada_interval == 0:
            aug_p = adjust_ada_p(
                aug_p, float(metrics["rt"]), config, args.batch
            )

        stats.report("Loss/G", metrics["loss_g"])
        stats.report("Loss/D", metrics["loss_d"])
        stats.report("Progress/augment_p", aug_p)

        if (step + 1) % tick_interval == 0:
            kimg_done = (step + 1) * args.batch / 1000
            print(
                f"tick kimg {kimg_done:.1f} lossG {stats.mean('Loss/G'):.3f} "
                f"lossD {stats.mean('Loss/D'):.3f} p {aug_p:.3f} "
                f"({time.time() - t0:.0f}s)"
            )
            stats.write_jsonl(os.path.join(args.outdir, "stats.jsonl"),
                              kimg=kimg_done)
            stats.reset()
            tick = (step + 1) // tick_interval
            if tick % args.snap == 0:
                save_pytree(
                    os.path.join(args.outdir, f"network-{int(kimg_done):06d}.npz"),
                    state["g_ema"],
                )

    save_pytree(os.path.join(args.outdir, "network-final.npz"), state["g_ema"])
    print(f"done: {total_steps} steps in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
