"""Tests for the CLIP editing layer (models/perception/clip.py,
editing/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spi_tpu.editing.clip_loss import CLIPLossState, DirectionalCLIPLoss
from spi_tpu.editing.zssgan import EditingSettings, ZSSGANTrainer, conv_mask
from spi_tpu.models.perception.clip import (
    CLIP,
    preprocess_gan_output,
    rn50,
    tiny_test_clip,
    vit_b16,
    vit_b32,
)


class FakeTokenizer:
    """Deterministic stand-in: hashes words into the tiny vocab."""

    def tokenize(self, texts, context_length=16):
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            toks = [1] + [hash(w) % 200 + 2 for w in t.split()][: context_length - 2]
            toks.append(255)  # high id acts as EOT for argmax pooling
            out[i, : len(toks)] = toks
        return out


@pytest.fixture(scope="module")
def clip_model():
    model = tiny_test_clip()
    params = model.init(jax.random.PRNGKey(0))
    return model, params


class TestCLIPModel:
    def test_encode_image_shape(self, clip_model):
        model, params = clip_model
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
        feat = model.encode_image(params, x)
        assert feat.shape == (2, model.embed_dim)
        assert jnp.isfinite(feat).all()

    def test_encode_text_eot_pooling(self, clip_model):
        model, params = clip_model
        tok = FakeTokenizer().tokenize(["hello world", "a photo of a cat"])
        feat = model.encode_text(params, jnp.asarray(tok))
        assert feat.shape == (2, model.embed_dim)
        # padding after EOT must not change the pooled feature
        tok2 = np.array(tok)
        # moving on: same tokens -> same features (determinism)
        feat2 = model.encode_text(params, jnp.asarray(tok2))
        np.testing.assert_allclose(feat, feat2, rtol=1e-6)

    def test_logits_symmetry(self, clip_model):
        model, params = clip_model
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32, 32))
        tok = jnp.asarray(FakeTokenizer().tokenize(["a", "b"]))
        li, lt = model(params, x, tok)
        np.testing.assert_allclose(li, lt.T, rtol=1e-5)

    def test_rn50_tower(self):
        # Structure check at reduced resolution via config override.
        model = CLIP(
            embed_dim=16, image_resolution=64, vision_layers=(1, 1, 1, 1),
            vision_width=16, vision_patch_size=None, context_length=8,
            vocab_size=64, transformer_width=32, transformer_heads=2,
            transformer_layers=1,
        )
        params = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 64, 64))
        feat = model.encode_image(params, x)
        assert feat.shape == (1, 16)
        assert jnp.isfinite(feat).all()

    def test_standard_configs_structurally_valid(self):
        # init only (no forward: full-size towers are slow on CPU)
        for cfg in (vit_b32(), vit_b16(), rn50()):
            assert cfg.visual is not None
            assert cfg.transformer.layers == 12

    def test_preprocess_range(self):
        img = jnp.zeros((1, 3, 64, 64))  # GAN midpoint
        out = preprocess_gan_output(img, 32)
        assert out.shape == (1, 3, 32, 32)
        # [-1,1] -> [0,1] -> normalized: 0.5-mean/std per channel
        expected = (0.5 - 0.48145466) / 0.26862954
        np.testing.assert_allclose(out[0, 0, 0, 0], expected, rtol=1e-5)


class TestCLIPLoss:
    @pytest.fixture(scope="class")
    def loss_setup(self):
        model = tiny_test_clip()
        params = model.init(jax.random.PRNGKey(0))
        loss = DirectionalCLIPLoss(model)
        state = loss.build_state(params, FakeTokenizer(), "photo", "sketch")
        return loss, params, state

    def test_state_shapes(self, loss_setup):
        loss, params, state = loss_setup
        d = loss.model.embed_dim
        assert state.target_direction.shape == (1, d)
        np.testing.assert_allclose(
            jnp.linalg.norm(state.target_direction), 1.0, rtol=1e-5
        )
        assert state.patch_text_directions.shape[1] == d

    def test_directional_loss_zero_for_aligned(self, loss_setup):
        loss, params, state = loss_setup
        src = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 48, 48))
        tgt = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 48, 48))
        val = loss.directional_loss(params, src, tgt, state.target_direction)
        assert val.shape == ()
        assert 0.0 <= float(val) <= 2.0 + 1e-6

    def test_global_loss_finite(self, loss_setup):
        loss, params, state = loss_setup
        img = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 48, 48))
        val = loss.global_loss(params, img, state.target_tokens)
        assert jnp.isfinite(val)

    def test_combined_loss_jits(self, loss_setup):
        loss, params, state = loss_setup
        loss = DirectionalCLIPLoss(
            loss.model, lambda_direction=1.0, lambda_global=0.5,
            lambda_patch=0.3, lambda_manifold=0.2,
        )
        src = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 48, 48))
        tgt = src * 0.9

        @jax.jit
        def f(p, rng):
            return loss(p, rng, src, tgt, state)

        val = f(params, jax.random.PRNGKey(7))
        assert jnp.isfinite(val)

    def test_img2img_direction(self, loss_setup):
        loss, params, _ = loss_setup
        src = jax.random.normal(jax.random.PRNGKey(8), (2, 3, 48, 48))
        tgt = jax.random.normal(jax.random.PRNGKey(9), (3, 3, 48, 48))
        d = loss.img2img_direction(params, src, tgt)
        np.testing.assert_allclose(jnp.linalg.norm(d), 1.0, rtol=1e-5)


class TestZSSGAN:
    @pytest.fixture(scope="class")
    def trainer(self):
        from spi_tpu.models.rendering.renderer import RenderingOptions
        from spi_tpu.models.triplane import TriPlaneGenerator

        generator = TriPlaneGenerator(
            z_dim=16, c_dim=25, w_dim=16, img_resolution=128,
            backbone_resolution=32, neural_rendering_resolution=16,
            rendering=RenderingOptions(depth_resolution=4, depth_resolution_importance=4),
            sr_variant="SuperresolutionHybrid2X",
            channel_base=512, channel_max=32,
        )
        clip = tiny_test_clip()
        loss = DirectionalCLIPLoss(clip)
        settings = EditingSettings(batch=1, auto_layer_iters=1, auto_layer_batch=1)
        trainer = ZSSGANTrainer(
            generator=generator,
            clip_losses={"tiny": loss},
            clip_weights={"tiny": 1.0},
            settings=settings,
        )
        g_params = generator.init(jax.random.PRNGKey(0))
        clip_params = {"tiny": clip.init(jax.random.PRNGKey(1))}
        states = trainer.build_states(clip_params, FakeTokenizer())
        return trainer, g_params, clip_params, states

    def test_conv_mask_selects_only_synthesis_convs(self, trainer):
        _, g_params, _, _ = trainer
        mask = conv_mask(g_params)
        leaves = jax.tree_util.tree_leaves_with_path(mask)
        trainable = [p for p, v in leaves if v]
        frozen = [p for p, v in leaves if not v]
        assert trainable, "mask selected nothing"
        for p, v in leaves:
            names = [str(getattr(k, "key", k)) for k in p]
            if v:
                assert "conv0" in names or "conv1" in names
                assert names[0] == "backbone" and names[1] == "synthesis"
            else:
                assert not (
                    names[0] == "backbone"
                    and names[1] == "synthesis"
                    and len(names) >= 4
                    and names[3] in ("conv0", "conv1")
                )
        assert frozen, "everything trainable — mask is not masking"

    def test_step_moves_only_masked_params(self, trainer):
        tr, g_params, clip_params, states = trainer
        step = tr.make_step(frozen_params=g_params)
        opt_state = tr.init_opt_state(g_params)
        new_params, _, loss = step(
            g_params, opt_state, clip_params, states, jax.random.PRNGKey(2)
        )
        assert jnp.isfinite(loss)
        mask = conv_mask(g_params)

        def changed(a, b):
            return bool(jnp.any(a != b))

        any_moved = False
        for (path, old), (_, new), (_, m) in zip(
            jax.tree_util.tree_leaves_with_path(g_params),
            jax.tree_util.tree_leaves_with_path(new_params),
            jax.tree_util.tree_leaves_with_path(mask),
        ):
            if m:
                any_moved = any_moved or changed(old, new)
            else:
                assert not changed(old, new), f"frozen param moved: {path}"
        assert any_moved, "no trainable param moved"

    def test_rank_w_slots(self, trainer):
        tr, g_params, clip_params, states = trainer
        ranks = tr.rank_w_slots(
            g_params, clip_params, states, jax.random.PRNGKey(3), g_params
        )
        assert ranks.shape == (tr.generator.num_ws,)
        assert jnp.isfinite(ranks).all()

    def test_ide3d_mask_trains_all_synthesis_layers(self, trainer):
        """ZSSGAN_IDE3D.get_training_layers = every synthesis-block
        child incl. ToRGB (ZSSGAN_IDE3D.py:35-51), a strict superset of
        the EG3D conv-only selection."""
        from spi_tpu.editing.zssgan import synthesis_mask

        _, g_params, _, _ = trainer
        m_ide3d = synthesis_mask(g_params)
        m_eg3d = conv_mask(g_params)
        saw_torgb = False
        for (path, v3d), (_, veg) in zip(
            jax.tree_util.tree_leaves_with_path(m_ide3d),
            jax.tree_util.tree_leaves_with_path(m_eg3d),
        ):
            names = [str(getattr(k, "key", k)) for k in path]
            in_synth = names[0] == "backbone" and names[1] == "synthesis"
            assert v3d == in_synth, (names, v3d)
            if veg:
                assert v3d, f"conv selected by EG3D mask but not IDE3D: {names}"
            if v3d and "torgb" in names:
                saw_torgb = True
        assert saw_torgb, "IDE3D mask missed the torgb layers"

    def test_ide3d_step_moves_torgb(self, trainer):
        from spi_tpu.editing.zssgan import IDE3DZSSGANTrainer, synthesis_mask

        tr, g_params, clip_params, states = trainer
        tr3d = IDE3DZSSGANTrainer(
            generator=tr.generator, clip_losses=tr.clip_losses,
            clip_weights=tr.clip_weights, settings=tr.settings,
        )
        step = tr3d.make_step(frozen_params=g_params)
        new_params, _, loss = step(
            g_params, tr3d.init_opt_state(g_params), clip_params, states,
            jax.random.PRNGKey(4),
        )
        assert jnp.isfinite(loss)
        mask = synthesis_mask(g_params)
        torgb_moved = False
        for (path, old), (_, new), (_, m) in zip(
            jax.tree_util.tree_leaves_with_path(g_params),
            jax.tree_util.tree_leaves_with_path(new_params),
            jax.tree_util.tree_leaves_with_path(mask),
        ):
            names = [str(getattr(k, "key", k)) for k in path]
            if not m:
                assert not bool(jnp.any(old != new)), f"frozen moved: {names}"
            elif "torgb" in names and bool(jnp.any(old != new)):
                torgb_moved = True
        assert torgb_moved, "IDE3D step left every torgb param unchanged"


class TestZSSGAN2D:
    def test_step_masks_and_moves(self):
        from spi_tpu.editing.zssgan2d import ZSSGAN2DTrainer, conv_mask_2d
        from spi_tpu.models.stylegan2 import Generator

        gen = Generator(z_dim=16, c_dim=0, w_dim=16, img_resolution=32,
                        img_channels=3, channel_base=512, channel_max=32)
        clip = tiny_test_clip()
        loss = DirectionalCLIPLoss(clip)
        trainer = ZSSGAN2DTrainer(
            generator=gen, clip_losses={"tiny": loss},
            clip_weights={"tiny": 1.0},
            settings=EditingSettings(batch=2), mixing_prob=0.5,
        )
        g_params = gen.init(jax.random.PRNGKey(0))
        clip_params = {"tiny": clip.init(jax.random.PRNGKey(1))}
        states = trainer.build_states(clip_params, FakeTokenizer())
        step = trainer.make_step(frozen_params=g_params)
        opt_state = trainer.init_opt_state(g_params)
        new_params, _, l = step(g_params, opt_state, clip_params, states,
                                jax.random.PRNGKey(2))
        assert jnp.isfinite(l)
        mask = conv_mask_2d(g_params)
        moved = frozen = 0
        for (_, old), (_, new), (_, m) in zip(
            jax.tree_util.tree_leaves_with_path(g_params),
            jax.tree_util.tree_leaves_with_path(new_params),
            jax.tree_util.tree_leaves_with_path(mask),
        ):
            changed = bool(jnp.any(old != new))
            if m:
                moved += changed
            else:
                assert not changed
                frozen += 1
        assert moved > 0 and frozen > 0

    def test_mixing_shapes(self):
        from spi_tpu.editing.zssgan2d import ZSSGAN2DTrainer
        from spi_tpu.models.stylegan2 import Generator

        gen = Generator(z_dim=8, c_dim=0, w_dim=8, img_resolution=16,
                        img_channels=3, channel_base=256, channel_max=16)
        clip = tiny_test_clip()
        trainer = ZSSGAN2DTrainer(
            generator=gen, clip_losses={}, clip_weights={}, mixing_prob=0.9,
        )
        p = gen.init(jax.random.PRNGKey(0))
        ws = trainer.sample_w(p, jax.random.PRNGKey(1), 4)
        assert ws.shape == (4, gen.num_ws, gen.w_dim)


class TestStyleCLIPMapper:
    def test_levels_mapper_shapes(self):
        from spi_tpu.editing.styleclip_mapper import LevelsMapper

        m = LevelsMapper(dim=16, num_ws=14)
        p = m.init(jax.random.PRNGKey(0))
        w = jax.random.normal(jax.random.PRNGKey(1), (2, 14, 16))
        d = m(p, w)
        assert d.shape == w.shape
        assert jnp.isfinite(d).all()
        m2 = LevelsMapper(dim=16, num_ws=14, use_fine=False)
        p2 = m2.init(jax.random.PRNGKey(0))
        d2 = m2(p2, w)
        np.testing.assert_allclose(np.asarray(d2[:, 8:]), 0.0)

    def test_coach_step_improves_nothing_blows_up(self):
        from spi_tpu.editing.styleclip_mapper import (
            LevelsMapper,
            StyleCLIPCoach,
            StyleCLIPSettings,
        )

        clip = tiny_test_clip()
        clip_params = clip.init(jax.random.PRNGKey(0))
        tok = jnp.asarray(FakeTokenizer().tokenize(["a sketch"]))

        mapper = LevelsMapper(dim=16, num_ws=4)
        coach = StyleCLIPCoach(mapper, StyleCLIPSettings(batch=1, id_lambda=0.0))
        m_params = mapper.init(jax.random.PRNGKey(1))

        def render(g_params, rng, ws):
            # toy "generator": broadcast w into an image
            return jnp.tanh(
                jnp.mean(ws) + jax.random.normal(rng, (ws.shape[0], 3, 32, 32)) * 0.01
            )

        def clip_global(cp, img, tokens):
            from spi_tpu.models.perception.clip import preprocess_gan_output

            x = preprocess_gan_output(img, clip.image_resolution)
            logits, _ = clip(cp, x, tokens)
            return jnp.mean(1.0 - logits / 100.0)

        step = coach.make_step(render, clip_global)
        opt_state = coach.optimizer().init(m_params)
        ws = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16))
        m2, opt_state, loss = step(
            m_params, opt_state, None, clip_params, tok, None, ws,
            jax.random.PRNGKey(3),
        )
        assert jnp.isfinite(loss)
        moved = any(
            bool(jnp.any(a != b))
            for a, b in zip(jax.tree_util.tree_leaves(m_params),
                            jax.tree_util.tree_leaves(m2))
        )
        assert moved


class TestBPETokenizer:
    @pytest.fixture(scope="class")
    def tokenizer(self, tmp_path_factory):
        """Synthetic merges file in the released vocab's format (first
        line is a header, then one merge per line)."""
        import gzip

        from spi_tpu.models.perception.clip_tokenizer import Tokenizer

        merges = ["#version: synthetic"]
        # enough merges to exercise the BPE loop on simple words
        for pair in ["h e", "he l", "hel l", "hell o</w>", "w o", "wo r",
                     "wor l", "worl d</w>", "a</w> a</w>"]:
            merges.append(pair)
        path = tmp_path_factory.mktemp("bpe") / "vocab.txt.gz"
        with gzip.open(path, "wt", encoding="utf-8") as f:
            f.write("\n".join(merges) + "\n")
        return Tokenizer(str(path))

    def test_encode_decode_roundtrip(self, tokenizer):
        text = "hello world"
        ids = tokenizer.encode(text)
        assert len(ids) >= 2
        assert tokenizer.decode(ids).strip() == "hello world"

    def test_merges_applied(self, tokenizer):
        # 'hello' must merge into a single token via the merge chain
        ids = tokenizer.encode("hello")
        assert len(ids) == 1

    def test_tokenize_padding_and_eot(self, tokenizer):
        out = tokenizer.tokenize(["hello", "hello world hello world"],
                                 context_length=8)
        assert out.shape == (2, 8)
        sot = tokenizer.encoder["<|startoftext|>"]
        eot = tokenizer.encoder["<|endoftext|>"]
        assert out[0, 0] == sot
        assert eot in out[0]
        # over-long prompt truncates but keeps EOT last
        assert out[1, -1] == eot or eot in out[1]

    def test_unicode_and_casefold(self, tokenizer):
        ids = tokenizer.encode("HELLO")
        assert ids == tokenizer.encode("hello")
