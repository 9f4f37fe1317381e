"""Model-layer tests: shapes, jit-ability, gradient flow, block semantics
(tiny configs — full-size parity runs against converted checkpoints when
weights are available; SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoworld_tpu.models.unet import UNetSpatioTemporal, UNetConfig
from evoworld_tpu.models.vae import AutoencoderKLTemporal, VAEConfig
from evoworld_tpu.models.clip import CLIPVisionTower, CLIPVisionConfig, clip_preprocess

TINY_UNET = UNetConfig(block_out_channels=(32, 64, 128, 128), num_attention_heads=(2, 4, 8, 8))
TINY_VAE = VAEConfig(block_out_channels=(32, 64, 128, 128))
TINY_CLIP = CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128)


@pytest.fixture(scope="module")
def unet_and_params():
    model = UNetSpatioTemporal(TINY_UNET)
    sample = jnp.zeros((1, 3, 16, 32, 18))
    params = model.init(jax.random.key(0), sample, jnp.asarray(1.0), jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)))
    return model, params


class TestUNet:
    def test_output_shape(self, unet_and_params):
        model, params = unet_and_params
        out = model.apply(params, jnp.ones((1, 3, 16, 32, 18)), jnp.asarray(0.5), jnp.ones((1, 1, 1024)), jnp.ones((1, 3)))
        assert out.shape == (1, 3, 16, 32, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_full_config_param_count(self):
        """The full architecture must land at the reference's ~1.5B params."""
        model = UNetSpatioTemporal(UNetConfig())
        shapes = jax.eval_shape(
            lambda k: model.init(k, jnp.ones((1, 2, 8, 16, 18)), jnp.asarray(1.0), jnp.ones((1, 1, 1024)), jnp.ones((1, 3))),
            jax.random.key(0),
        )
        n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
        assert 1.4e9 < n < 1.6e9, n

    def test_timestep_batch_broadcast(self, unet_and_params):
        model, params = unet_and_params
        x = jnp.ones((2, 3, 16, 32, 18))
        out = model.apply(params, x, jnp.asarray([0.5, 1.5]), jnp.ones((2, 1, 1024)), jnp.ones((2, 3)))
        assert out.shape == (2, 3, 16, 32, 4)

    def test_temporal_mixing_sees_frames(self, unet_and_params):
        """Changing frame k must influence other frames (temporal attention/conv)."""
        model, params = unet_and_params
        base = jnp.zeros((1, 3, 16, 32, 18))
        pert = base.at[:, 2].set(1.0)
        o1 = model.apply(params, base, jnp.asarray(1.0), jnp.ones((1, 1, 1024)), jnp.ones((1, 3)))
        o2 = model.apply(params, pert, jnp.asarray(1.0), jnp.ones((1, 1, 1024)), jnp.ones((1, 3)))
        diff_frame0 = float(jnp.abs(o1[:, 0] - o2[:, 0]).max())
        assert diff_frame0 > 1e-6, "temporal paths are not mixing frames"


class TestVAE:
    def test_roundtrip_shapes(self):
        model = AutoencoderKLTemporal(TINY_VAE)
        imgs = jnp.ones((2, 64, 64, 3))
        params = model.init(jax.random.key(0), imgs, 2)
        z = model.apply(params, imgs, method=AutoencoderKLTemporal.encode_mode)
        assert z.shape == (2, 8, 8, 4)
        out = model.apply(params, z, 2, method=AutoencoderKLTemporal.decode)
        assert out.shape == (2, 64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_encode_sample_differs_from_mode(self):
        model = AutoencoderKLTemporal(TINY_VAE)
        imgs = jnp.ones((1, 64, 64, 3))
        params = model.init(jax.random.key(0), imgs, 1)
        mode = model.apply(params, imgs, method=AutoencoderKLTemporal.encode_mode)
        samp = model.apply(params, imgs, jax.random.key(1), method=AutoencoderKLTemporal.encode_sample)
        assert not np.allclose(np.asarray(mode), np.asarray(samp))


class TestCLIP:
    def test_projection_shape(self):
        model = CLIPVisionTower(TINY_CLIP)
        x = jnp.zeros((2, 224, 224, 3))
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, TINY_CLIP.projection_dim)

    def test_preprocess_stats(self):
        x = jnp.full((1, 224, 224, 3), 0.5)
        out = np.asarray(clip_preprocess(x))
        # 0.5 is near the CLIP mean, so outputs should be small.
        assert np.abs(out).max() < 0.5


class TestFlashAttention:
    def test_matches_xla_reference(self):
        from evoworld_tpu.ops.attention import _xla_attention
        from evoworld_tpu.ops.flash_attention import flash_attention

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 200, 3, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 333, 3, 32)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 333, 3, 32)).astype(np.float32))
        want = np.asarray(_xla_attention(q, k, v, scale=1 / np.sqrt(32)))
        got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_exp2_softmax_is_exact(self):
        """use_exp2 (log2e folded into the scale, 2^x softmax) must be the
        same softmax, not an approximation: 2^((s-m)*log2e) == e^(s-m)."""
        from evoworld_tpu.ops.flash_attention import flash_attention

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 200, 2, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 333, 2, 32)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 333, 2, 32)).astype(np.float32))
        base = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                          interpret=True))
        exp2 = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                          interpret=True, use_exp2=True))
        np.testing.assert_allclose(exp2, base, atol=2e-6)

    def test_pad_with_segment_mask_semantics(self):
        """The pad+segment-mask arithmetic feeding the TPU builtin flash
        kernel, validated on CPU: emulating the kernel's segment-id rule
        (attend only where id_q == id_kv) on the padded arrays and slicing
        to orig_seq_q must exactly reproduce unpadded attention."""
        from evoworld_tpu.ops.attention import (
            _flash_tile,
            _pad_with_segment_mask,
            _xla_attention,
        )

        rng = np.random.default_rng(2)
        for sq, skv in [(1041, 1041), (200, 333), (9216, 1041)]:
            q = jnp.asarray(rng.normal(size=(2, sq, 2, 16)).astype(np.float32))
            k = jnp.asarray(rng.normal(size=(2, skv, 2, 16)).astype(np.float32))
            v = jnp.asarray(rng.normal(size=(2, skv, 2, 16)).astype(np.float32))
            qp, kp, vp, (ids_q, ids_kv), orig = _pad_with_segment_mask(q, k, v)
            assert orig == sq
            # Padded lengths are tileable — the kernel's hard precondition.
            assert _flash_tile(qp.shape[1]) is not None
            assert _flash_tile(kp.shape[1]) is not None
            assert int(ids_q.sum()) == 2 * sq and int(ids_kv.sum()) == 2 * skv

            scale = 1 / np.sqrt(16)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) * scale
            mask = (ids_q[:, None, :, None] == ids_kv[:, None, None, :])
            probs = jax.nn.softmax(jnp.where(mask, logits, -jnp.inf), axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, vp)[:, :orig]
            want = _xla_attention(q, k, v, scale=scale)
            np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    def test_kv1_broadcast_is_exact(self):
        """Softmax over one key == 1, so auto's kv=1 shortcut must equal xla."""
        from evoworld_tpu.ops.attention import _xla_attention, multi_head_attention

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(3, 57, 4, 16)).astype(np.float32))
        kv = jnp.asarray(rng.normal(size=(3, 1, 4, 16)).astype(np.float32))
        want = np.asarray(_xla_attention(q, kv, kv, scale=0.25))
        got = np.asarray(multi_head_attention(q, kv, kv, impl="auto"))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_blockdiag_small_seq_matches_xla(self):
        """Block-diagonal batched tiny-seq attention is exact (incl. ragged B)."""
        from evoworld_tpu.ops.attention import _blockdiag_small_seq, _xla_attention

        rng = np.random.default_rng(2)
        for b in (7, 8):  # ragged and exact group multiples
            q = jnp.asarray(rng.normal(size=(b, 25, 2, 16)).astype(np.float32))
            k = jnp.asarray(rng.normal(size=(b, 25, 2, 16)).astype(np.float32))
            v = jnp.asarray(rng.normal(size=(b, 25, 2, 16)).astype(np.float32))
            want = np.asarray(_xla_attention(q, k, v, scale=0.25))
            got = np.asarray(_blockdiag_small_seq(q, k, v, 0.25, group=4, pad_to=32))
            np.testing.assert_allclose(got, want, atol=2e-5)


class TestTrainStep:
    def test_one_step_decreases_nothing_blows_up(self):
        from evoworld_tpu.models.clip import CLIPVisionTower
        from evoworld_tpu.train.train_step import (
            TrainConfig, TrainState, make_optimizer, make_sharded_train_step,
        )

        unet = UNetSpatioTemporal(TINY_UNET)
        vae = AutoencoderKLTemporal(TINY_VAE)
        clip_tower = CLIPVisionTower(TINY_CLIP)
        key = jax.random.key(0)
        f, h, w = 2, 64, 128
        unet_params = unet.init(key, jnp.zeros((1, f, 8, 16, 18)), jnp.asarray(1.0), jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)))
        frozen = {
            "vae": vae.init(key, jnp.zeros((1, h, w, 3)), 1),
            "clip": clip_tower.init(key, jnp.zeros((1, 224, 224, 3))),
        }
        config = TrainConfig(total_steps=10, warmup_steps=1)
        opt = make_optimizer(config, unet_params)
        state = TrainState(unet_params, opt.init(unet_params), jnp.zeros((), jnp.int32))
        step = make_sharded_train_step(unet, vae, clip_tower, frozen, opt, config, compute_dtype=jnp.float32)
        batch = {
            "pixel_values": jnp.zeros((1, f, h, w, 3)),
            "memory_values": jnp.zeros((1, f, h, w, 3)),
            "plucker": jnp.zeros((1, f, 8, 16, 6)),
        }
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1

    def test_freeze_master_cast_policy(self):
        """fp32 masters only for trainable leaves (reference DeepSpeed-fp16
        policy): a step on the mixed-dtype tree runs, updates only trainable
        leaves, and preserves every frozen leaf bit-for-bit in bf16."""
        from evoworld_tpu.models.clip import CLIPVisionTower
        from evoworld_tpu.train.train_step import (
            TrainConfig, TrainState, freeze_master_cast, make_optimizer,
            make_sharded_train_step, trainable_mask,
        )

        unet = UNetSpatioTemporal(TINY_UNET)
        vae = AutoencoderKLTemporal(TINY_VAE)
        clip_tower = CLIPVisionTower(TINY_CLIP)
        key = jax.random.key(0)
        f, h, w = 2, 64, 128
        unet_params = freeze_master_cast(
            unet.init(key, jnp.zeros((1, f, 8, 16, 18)), jnp.asarray(1.0),
                      jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3))),
            jnp.bfloat16,
        )
        mask = trainable_mask(unet_params)
        for p, m in zip(jax.tree.leaves(unet_params), jax.tree.leaves(mask)):
            assert p.dtype == (jnp.float32 if m else jnp.bfloat16)
        before = jax.tree.map(np.asarray, unet_params)

        frozen = {
            "vae": vae.init(key, jnp.zeros((1, h, w, 3)), 1),
            "clip": clip_tower.init(key, jnp.zeros((1, 224, 224, 3))),
        }
        # constant lr: the warmup schedule is 0.0 at step 0, which would make
        # "trainable leaves moved" vacuously false after one step.
        config = TrainConfig(total_steps=10, warmup_steps=1, lr_schedule="constant")
        opt = make_optimizer(config, unet_params)
        state = TrainState(unet_params, opt.init(unet_params), jnp.zeros((), jnp.int32))
        step = make_sharded_train_step(unet, vae, clip_tower, frozen, opt, config)
        rng = np.random.default_rng(5)
        batch = {
            "pixel_values": jnp.asarray(rng.uniform(-1, 1, (1, f, h, w, 3)), jnp.float32),
            "memory_values": jnp.asarray(rng.uniform(-1, 1, (1, f, h, w, 3)), jnp.float32),
            "plucker": jnp.asarray(rng.normal(size=(1, f, 8, 16, 6)), jnp.float32),
        }
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        moved = 0
        for got, was, m in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(before), jax.tree.leaves(mask)
        ):
            assert got.dtype == (jnp.float32 if m else jnp.bfloat16)
            if m:
                moved += int(not np.array_equal(np.asarray(got), was))
            else:
                np.testing.assert_array_equal(np.asarray(got), was)
        assert moved > 0

    def test_vae_encode_chunking_is_exact(self):
        """Per-frame encodes are independent, so the chunked loss must equal
        the unchunked one exactly (same rng stream, same math)."""
        from evoworld_tpu.models.clip import CLIPVisionTower
        from evoworld_tpu.train.train_step import TrainConfig, edm_loss

        unet = UNetSpatioTemporal(TINY_UNET)
        vae = AutoencoderKLTemporal(TINY_VAE)
        clip_tower = CLIPVisionTower(TINY_CLIP)
        key = jax.random.key(0)
        f, h, w = 3, 64, 128
        unet_params = unet.init(key, jnp.zeros((1, f, 8, 16, 18)), jnp.asarray(1.0),
                                jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)))
        frozen = {
            "vae": vae.init(key, jnp.zeros((1, h, w, 3)), 1),
            "clip": clip_tower.init(key, jnp.zeros((1, 224, 224, 3))),
        }
        rng = np.random.default_rng(7)
        batch = {
            "pixel_values": jnp.asarray(rng.uniform(-1, 1, (1, f, h, w, 3)), jnp.float32),
            "memory_values": jnp.asarray(rng.uniform(-1, 1, (1, f, h, w, 3)), jnp.float32),
            "plucker": jnp.asarray(rng.normal(size=(1, f, 8, 16, 6)), jnp.float32),
        }
        losses = [
            float(edm_loss(
                unet, vae, clip_tower, unet_params, frozen, batch,
                jax.random.key(3),
                TrainConfig(total_steps=10, warmup_steps=1, vae_encode_chunk=chunk),
                jnp.float32,
            ))
            for chunk in (0, 2)  # 0 = all 2*f(+1) frames at once; 2 = ragged chunks
        ]
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    def test_grad_accumulation_matches_averaged_grads(self):
        """accum_steps=N must equal one optimizer update on the N-microbatch
        grad average (reference accelerator.accumulate semantics,
        train_evoworld.py:525)."""
        from evoworld_tpu.models.clip import CLIPVisionTower
        from evoworld_tpu.train.train_step import (
            TrainConfig, TrainState, edm_loss, make_optimizer, make_sharded_train_step,
        )

        unet = UNetSpatioTemporal(TINY_UNET)
        vae = AutoencoderKLTemporal(TINY_VAE)
        clip_tower = CLIPVisionTower(TINY_CLIP)
        key = jax.random.key(0)
        f, h, w = 2, 64, 128
        unet_params = unet.init(key, jnp.zeros((1, f, 8, 16, 18)), jnp.asarray(1.0), jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)))
        frozen = {
            "vae": vae.init(key, jnp.zeros((1, h, w, 3)), 1),
            "clip": clip_tower.init(key, jnp.zeros((1, 224, 224, 3))),
        }
        config = TrainConfig(total_steps=10, warmup_steps=1)
        opt = make_optimizer(config, unet_params)
        state = TrainState(unet_params, opt.init(unet_params), jnp.zeros((), jnp.int32))

        rng = np.random.default_rng(3)
        micro = [
            {
                "pixel_values": jnp.asarray(rng.uniform(-1, 1, (1, f, h, w, 3)), jnp.float32),
                "memory_values": jnp.asarray(rng.uniform(-1, 1, (1, f, h, w, 3)), jnp.float32),
                "plucker": jnp.asarray(rng.normal(size=(1, f, 8, 16, 6)), jnp.float32),
            }
            for _ in range(2)
        ]
        step_rng = jax.random.key(9)

        # Manual reference first (the jitted step donates + deletes `state`):
        # average per-microbatch grads, single optimizer update.
        import optax
        keys = jax.random.split(step_rng, 2)
        grads = [
            jax.grad(lambda p, mb=mb, k=k: edm_loss(
                unet, vae, clip_tower, p, frozen, mb, k, config, jnp.float32
            ))(state.params)
            for mb, k in zip(micro, keys)
        ]
        mean_grads = jax.tree.map(lambda a, b: (a + b) / 2.0, *grads)
        updates, _ = opt.update(mean_grads, state.opt_state, state.params)
        want_params = optax.apply_updates(state.params, updates)
        jax.block_until_ready(want_params)

        # Accumulating step: stacked micro-batches, one update.
        step = make_sharded_train_step(
            unet, vae, clip_tower, frozen, opt, config,
            compute_dtype=jnp.float32, accum_steps=2,
        )
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *micro)
        new_state, metrics = step(state, stacked, step_rng)
        assert int(new_state.step) == 1

        for got, want in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(want_params)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_trainable_mask_semantics(self):
        from evoworld_tpu.train.train_step import trainable_mask

        unet = UNetSpatioTemporal(TINY_UNET)
        params = jax.eval_shape(
            lambda k: unet.init(k, jnp.ones((1, 2, 16, 32, 18)), jnp.asarray(1.0), jnp.ones((1, 1, 1024)), jnp.ones((1, 3))),
            jax.random.key(0),
        )
        mask = trainable_mask(params)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        paths = {"/".join(str(getattr(p, "key", p)) for p in path): m for path, m in flat}
        # conv_in and all norms train; spatial attention to_q does not.
        assert any(v for k, v in paths.items() if "conv_in" in k)
        assert any(v for k, v in paths.items() if "temporal_transformer_blocks_0" in k)
        spatial_attn = [v for k, v in paths.items() if "transformer_blocks_0/attn1/to_q" in k and "temporal" not in k]
        assert spatial_attn and not any(spatial_attn)
