"""CLIP-guided domain editing CLI (StyleGAN-NADA / ZSSGAN over EG3D).

Flag names and defaults mirror ZSSGAN/train.py + ZSSGAN/options/
train_options.py (lr 0.002, iter, batch 2, clip_models ViT-B/32+16,
lambda_* weights, auto_layer_*). Loads a converted (usually SPI-tuned)
EG3D generator npz and converted CLIP npz weights, runs the twin-
generator directional-CLIP loop, snapshots the trainable generator.

Usage:
    python -m spi_tpu.cli.run_editing \
        --frozen_gen_ckpt out/tuned_g.npz \
        --output_dir experiments/edit_sketch \
        --source_class "photo" --target_class "sketch" \
        --clip_ckpt_dir checkpoints/clip \
        --bpe_path checkpoints/clip/bpe_simple_vocab_16e6.txt.gz
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native ZSSGAN editing")
    p.add_argument("--frozen_gen_ckpt", type=str, required=True)
    p.add_argument("--train_gen_ckpt", type=str, default=None,
                   help="defaults to frozen_gen_ckpt (twin init)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--source_class", type=str, default="photo")
    p.add_argument("--target_class", type=str, default="sketch")
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--g_reg_every", type=int, default=4)
    p.add_argument("--iter", type=int, default=301)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--n_sample", type=int, default=4)
    p.add_argument("--sample_truncation", type=float, default=0.7)
    p.add_argument("--output_interval", type=int, default=50)
    p.add_argument("--save_interval", type=int, default=None)
    p.add_argument("--clip_models", nargs="+", type=str,
                   default=["ViT-B/32", "ViT-B/16"])
    p.add_argument("--clip_model_weights", nargs="+", type=float,
                   default=[1.0, 1.0])
    p.add_argument("--lambda_direction", type=float, default=1.0)
    p.add_argument("--lambda_patch", type=float, default=0.0)
    p.add_argument("--lambda_global", type=float, default=0.0)
    p.add_argument("--lambda_manifold", type=float, default=0.0)
    p.add_argument("--lambda_texture", type=float, default=0.0)
    p.add_argument("--auto_layer_iters", type=int, default=0)
    p.add_argument("--auto_layer_k", type=int, default=0)
    p.add_argument("--auto_layer_batch", type=int, default=8)
    p.add_argument("--clip_ckpt_dir", type=str, default="checkpoints/clip",
                   help="dir with ViT-B-32.npz / ViT-B-16.npz / RN50.npz "
                        "from `python -m spi_tpu.convert clip ...`")
    p.add_argument("--bpe_path", type=str, default=None,
                   help="bpe_simple_vocab_16e6.txt.gz for the tokenizer")
    p.add_argument("--ide3d", action="store_true", default=False,
                   help="IDE3D-flavored layer selection: train ALL "
                        "synthesis-block layers incl. ToRGB "
                        "(ZSSGAN_IDE3D.py:49-51) instead of the EG3D "
                        "conv-only set")
    p.add_argument("--random_init", action="store_true", default=False,
                   help="random generator/CLIP weights (smoke runs)")
    p.add_argument("--seed", type=int, default=2)  # train.py:62
    return p.parse_args(argv)


_CLIP_BUILDERS = {
    "ViT-B/32": ("vit_b32", "ViT-B-32.npz"),
    "ViT-B/16": ("vit_b16", "ViT-B-16.npz"),
    "RN50": ("rn50", "RN50.npz"),
}


def main(argv=None):
    args = parse_args(argv)

    import jax
    import numpy as np

    from spi_tpu.editing.clip_loss import DirectionalCLIPLoss
    from spi_tpu.editing.zssgan import (
        EditingSettings, IDE3DZSSGANTrainer, ZSSGANTrainer,
    )
    from spi_tpu.models.perception import clip as clip_models
    from spi_tpu.models.perception.clip_tokenizer import Tokenizer
    from spi_tpu.models.triplane import ffhq512_128_config
    from spi_tpu.utils.checkpoint import load_pytree, save_pytree, unflatten_to_nested
    from spi_tpu.utils.image import save_image_grid

    generator = ffhq512_128_config()
    like = generator.init(jax.random.PRNGKey(0))
    if args.random_init:
        frozen = like
    else:
        frozen = load_pytree(args.frozen_gen_ckpt, like=like)
    trainable = (
        load_pytree(args.train_gen_ckpt, like=like)
        if args.train_gen_ckpt
        else frozen
    )

    losses, weights, clip_params = {}, {}, {}
    for name, w in zip(args.clip_models, args.clip_model_weights):
        builder, fname = _CLIP_BUILDERS[name]
        model = getattr(clip_models, builder)()
        losses[name] = DirectionalCLIPLoss(
            model,
            lambda_direction=args.lambda_direction,
            lambda_patch=args.lambda_patch,
            lambda_global=args.lambda_global,
            lambda_manifold=args.lambda_manifold,
            lambda_texture=args.lambda_texture,
        )
        weights[name] = w
        if args.random_init:
            clip_params[name] = model.init(jax.random.PRNGKey(hash(name) % 2**31))
        else:
            flat = dict(np.load(os.path.join(args.clip_ckpt_dir, fname)))
            clip_params[name] = unflatten_to_nested(flat)

    settings = EditingSettings(
        source_class=args.source_class,
        target_class=args.target_class,
        lr=args.lr,
        g_reg_every=args.g_reg_every,
        batch=args.batch,
        iterations=args.iter,
        sample_truncation=args.sample_truncation,
        auto_layer_iters=args.auto_layer_iters,
        auto_layer_k=args.auto_layer_k,
        auto_layer_batch=args.auto_layer_batch,
        lambda_direction=args.lambda_direction,
        lambda_patch=args.lambda_patch,
        lambda_global=args.lambda_global,
        lambda_manifold=args.lambda_manifold,
        lambda_texture=args.lambda_texture,
    )
    trainer_cls = IDE3DZSSGANTrainer if args.ide3d else ZSSGANTrainer
    trainer = trainer_cls(
        generator=generator, clip_losses=losses, clip_weights=weights,
        settings=settings,
    )

    if args.bpe_path:
        tokenizer = Tokenizer(args.bpe_path)
    else:
        if not args.random_init:
            raise SystemExit("--bpe_path is required unless --random_init")

        class _HashTok:
            def tokenize(self, texts, context_length=77):
                if isinstance(texts, str):
                    texts = [texts]
                out = np.zeros((len(texts), context_length), np.int32)
                for i, t in enumerate(texts):
                    toks = [1] + [hash(w) % 40000 + 2 for w in t.split()]
                    toks = toks[: context_length - 1] + [49407]
                    out[i, : len(toks)] = toks
                return out

        tokenizer = _HashTok()

    states = trainer.build_states(clip_params, tokenizer)
    step = trainer.make_step(frozen_params=frozen)
    opt_state = trainer.init_opt_state(trainable)

    sample_dir = os.path.join(args.output_dir, "sample")
    ckpt_dir = os.path.join(args.output_dir, "checkpoint")
    os.makedirs(sample_dir, exist_ok=True)
    os.makedirs(ckpt_dir, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    fixed_rng, rng = jax.random.split(rng)
    t0 = time.time()
    for i in range(args.iter):
        rng, krng = jax.random.split(rng)
        trainable, opt_state, loss = step(
            trainable, opt_state, clip_params, states, krng
        )
        if i % 10 == 0:
            print(f"iter {i}: clip loss {float(loss):.4f} "
                  f"({time.time() - t0:.1f}s)")
        if i % args.output_interval == 0:
            ws = trainer.sample_w(
                frozen, fixed_rng, args.n_sample, truncation=args.sample_truncation
            )
            dst = trainer.render(trainable, fixed_rng, ws)
            save_image_grid(
                np.asarray(dst), os.path.join(sample_dir, f"dst_{i:06d}.jpg")
            )
        if args.save_interval and i > 0 and i % args.save_interval == 0:
            save_pytree(os.path.join(ckpt_dir, f"{i:06d}.npz"), trainable)

    save_pytree(os.path.join(ckpt_dir, "final.npz"), trainable)
    print(f"done in {time.time() - t0:.1f}s -> {ckpt_dir}/final.npz")


if __name__ == "__main__":
    main()
