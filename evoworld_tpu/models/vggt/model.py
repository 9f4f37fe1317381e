"""VGGT: feed-forward multi-view 3D reconstruction.

Satisfies the contract the reference consumes (SURVEY.md §2.9,
/root/reference/unified_loop_consistency.py:49-52,125-136,336-368):

    preds = model(images)   # (B, S, H, W, 3) normalized
    preds["pose_enc"]   (B, S, 9)
    preds["depth"]      (B, S, H, W, 1)
    preds["depth_conf"] (B, S, H, W)
    preds["world_points"], preds["world_points_conf"]  (optional pointmap head)
    preds["images"]     input images (for point colors)

plus `load_and_preprocess_images` (resize to width 518, height to a multiple
of 14) and the geometry decoders in `vggt.geometry`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from evoworld_tpu.models.vggt.aggregator import Aggregator, AggregatorConfig
from evoworld_tpu.models.vggt.heads import CameraHead, DPTConfig, DPTHead
from evoworld_tpu.models.vggt.geometry import (
    pose_encoding_to_extri_intri,
    unproject_depth_map_to_point_map,
)


@dataclasses.dataclass(frozen=True)
class VGGTConfig:
    aggregator: AggregatorConfig = AggregatorConfig()
    with_point_head: bool = True
    camera_trunk_depth: int = 4
    dpt_features: int = 256
    dpt_layer_dims: tuple = (256, 512, 1024, 1024)


def decode_depth(depth_out: jnp.ndarray):
    """(..., 2) raw DPT output -> (depth (..., 1), conf (...)).

    Positive depth via exp-style activation; conf stays raw + 1 offset
    (upstream uses expm1-activated depth and 1+exp conf).
    """
    depth_out = depth_out.astype(jnp.float32)
    depth = jnp.expm1(jnp.clip(depth_out[..., 0:1], -10.0, 12.0))
    depth = jnp.maximum(depth, 1e-4)
    conf = 1.0 + jnp.exp(jnp.clip(depth_out[..., 1], -10.0, 10.0))
    return depth, conf


class VGGT(nn.Module):
    """Aggregator + camera / depth / point heads.

    setup-based (not @nn.compact) so the reconstructor can call the stages
    separately (`aggregate` / `predict_cameras` / `apply_depth_head`) and
    chunk the dense heads over frames — at 49 frames x 518x392 the one-shot
    depth head materializes multi-GB full-resolution transients that do not
    fit HBM next to the resident diffusion stack. Param paths are identical
    to the previous compact layout (aggregator / camera_head / depth_head /
    point_head), so models/vggt/weights.py converts unchanged.
    """

    config: VGGTConfig = VGGTConfig()

    def setup(self):
        cfg = self.config
        tap_dim = 2 * cfg.aggregator.embed_dim
        self.aggregator = Aggregator(cfg.aggregator)
        self.camera_head = CameraHead(
            dim_in=tap_dim,
            trunk_depth=cfg.camera_trunk_depth,
            num_heads=cfg.aggregator.num_heads,
        )
        dpt_kw = dict(
            features=cfg.dpt_features, layer_dims=cfg.dpt_layer_dims, dim=tap_dim
        )
        self.depth_head = DPTHead(DPTConfig(out_channels=2, **dpt_kw))
        if cfg.with_point_head:
            self.point_head = DPTHead(DPTConfig(out_channels=4, **dpt_kw))

    def aggregate(self, images: jnp.ndarray):
        """(B, S, H, W, 3) -> (tap outputs list, patch_hw)."""
        return self.aggregator(images)

    def predict_cameras(self, outputs) -> jnp.ndarray:
        """Aggregator taps -> (B, S, 9) pose encoding."""
        return self.camera_head(outputs[-1][:, :, 0, :])

    def tap_patch_tokens(self, outputs):
        """Strip special tokens: list of (B, S, T, 2C) -> list of (B*S, P, 2C)."""
        num_special = 1 + self.config.aggregator.num_register_tokens
        tap_dim = 2 * self.config.aggregator.embed_dim
        # DPTHead expects exactly 4 taps; fail loudly if the config diverges
        # (silently slicing [:4] would drop taps without a shape error).
        assert len(outputs) == 4, (
            f"DPT heads consume 4 aggregator taps, config yields {len(outputs)}"
        )
        b, s = outputs[0].shape[:2]
        return [
            o[:, :, num_special:, :].reshape(b * s, -1, tap_dim) for o in outputs
        ]

    def apply_depth_head(self, layer_tokens, patch_hw, image_hw) -> jnp.ndarray:
        """4x (N, P, 2C) patch tokens -> raw (N, H, W, 2) depth+conf output."""
        return self.depth_head(layer_tokens, patch_hw, image_hw)

    def apply_point_head(self, layer_tokens, patch_hw, image_hw) -> jnp.ndarray:
        return self.point_head(layer_tokens, patch_hw, image_hw)

    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        b, s, height, width, _ = images.shape

        outputs, patch_hw = self.aggregate(images)
        pose_enc = self.predict_cameras(outputs)
        layer_tokens = self.tap_patch_tokens(outputs)

        depth_out = self.apply_depth_head(layer_tokens, patch_hw, (height, width))
        depth_out = depth_out.reshape(b, s, height, width, 2)
        depth, depth_conf = decode_depth(depth_out)

        preds: Dict[str, jnp.ndarray] = {
            "pose_enc": pose_enc,
            "depth": depth,
            "depth_conf": depth_conf,
            "images": images,
        }

        if cfg.with_point_head:
            point_out = self.apply_point_head(layer_tokens, patch_hw, (height, width))
            point_out = point_out.reshape(b, s, height, width, 4).astype(jnp.float32)
            preds["world_points"] = point_out[..., 0:3]
            preds["world_points_conf"] = 1.0 + jnp.exp(jnp.clip(point_out[..., 3], -10.0, 10.0))

        return preds


def load_and_preprocess_images(images: np.ndarray, target_width: int = 518) -> jnp.ndarray:
    """(S, H, W, 3) uint8/float [0,1] -> (1, S, H', W', 3) normalized batch.

    Matches the upstream loader's contract (resize to width 518, height to
    the nearest multiple of the 14-px patch), ImageNet-free [0, 1] scaling
    (upstream VGGT normalizes to [0, 1] only).
    """
    import jax.image

    # Integer inputs rescale to [0, 1]; float inputs are assumed [0, 1]
    # already (a traced value's range cannot drive Python control flow).
    rescale = np.issubdtype(np.asarray(images).dtype if not hasattr(images, "dtype") else images.dtype, np.integer)
    arr = jnp.asarray(images, jnp.float32)
    if rescale:
        arr = arr / 255.0
    s, h, w, _ = arr.shape
    new_w = target_width
    new_h = int(round(h * new_w / w / 14)) * 14
    arr = jax.image.resize(arr, (s, new_h, new_w, 3), "bilinear")
    return arr[None]


def _try_host_offload(params):
    """Park a param tree in the accelerator HOST's RAM (pinned_host).

    In the evolving-memory loop VGGT idles while the 25-step denoise runs;
    parking its ~2.6 GB of bf16 params in host memory frees that HBM for the
    denoise peak (16 GB/chip budget, SURVEY.md §7 hard-part #5 "stage VGGT
    in/out between segments"). The per-segment restage rides PCIe on the TPU
    host, not the dev tunnel. Returns (params, device_sharding-or-None);
    backends without memory kinds keep params on device.
    """
    try:
        from jax.sharding import SingleDeviceSharding

        dev = jax.devices()[0]
        host_sh = SingleDeviceSharding(dev, memory_kind="pinned_host")
        dev_sh = SingleDeviceSharding(dev, memory_kind="device")
        # Two hops: a normal batched put to device (the fast transport path),
        # then an EAGER relocation to pinned host (pure PJRT DMA, no compile
        # — a jitted identity with pinned out_shardings fails AOT compile on
        # the axon backend: "Unimplemented DMA", and a direct
        # client->pinned_host device_put serializes per-leaf over the dev
        # tunnel). Rebinding drops the transient device copy.
        params = jax.device_put(params)
        params = jax.device_put(params, host_sh)
        return params, dev_sh
    except Exception:  # noqa: BLE001 — memory kinds unsupported on backend
        return params, None


def make_reconstructor(model: VGGT, params, compute_dtype=jnp.bfloat16,
                       offload_params: bool = True, head_chunk: int = 8,
                       mesh=None, head_shard_min_seq: int | None = None):
    """Wrap a VGGT model as the UnifiedLoop reconstructor callable.

    Returns fn(images (S, Hp, Wp, 3) in [0,1]) -> dict with world_points,
    conf, extrinsic, colors — running preprocessing, the model, pose
    decoding, and depth unprojection in one jitted program (reference flow:
    unified_loop_consistency.py:336-368 with prediction_mode
    "depth_unproject").

    With `mesh`, reconstruction runs sharded: params replicate, the frame
    axis shards over the mesh for the per-frame work (patch embed, DINO
    encoder, frame attention, DPT heads — GSPMD propagation), and the
    global attention — the dominant cost, S = frames x 1041 tokens —
    shard_maps over the HEAD axis (ops/attention.py::head_sharded_attention),
    which needs no collectives inside the region. Param host-offload is
    skipped on meshes (memory pressure per chip already drops ~ndev-fold).
    `head_shard_min_seq` overrides the sequence-length threshold at which
    that shard_map engages (None = production default; tiny-shape gates and
    tests lower it so their sequences still exercise the sharded path).

    The depth head runs `lax.map`-chunked over frames (`head_chunk` per
    step): its full-resolution transients scale with frame count, and at
    the 3-clip loop's second rebuild (49 frames x 518x392) the one-shot
    head OOMs a 16 GB chip next to the resident diffusion stack. The
    per-frame head is embarrassingly parallel, so chunking costs nothing
    but schedule.
    """
    dev_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        params = jax.device_put(params, NamedSharding(mesh, PartitionSpec()))
        n_mesh_devices = int(np.prod(list(mesh.shape.values())))
        frame_sh = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))
        replicated_sh = NamedSharding(mesh, PartitionSpec())
    elif offload_params:
        params, dev_sh = _try_host_offload(params)
    if mesh is None and dev_sh is None:
        # No offload: pin params on device ONCE (numpy leaves would otherwise
        # re-transfer on every call).
        params = jax.device_put(params)

    # Params are a jit ARGUMENT, not a closure: closed-over params lower to
    # HLO constants (2.3 GB for the 1B model), which is what broke the
    # remote-compile transport in round 1.
    @jax.jit
    def reconstruct(p, images):
        batch = load_and_preprocess_images(jnp.asarray(images))
        x = batch.astype(compute_dtype)
        b, s = x.shape[:2]
        hw = x.shape[2:4]

        outputs, patch_hw = model.apply(p, x, method="aggregate")
        pose_enc = model.apply(p, outputs, method="predict_cameras")
        layer_tokens = model.apply(p, outputs, method="tap_patch_tokens")
        del outputs

        n = layer_tokens[0].shape[0]
        chunk = max(1, min(head_chunk, n))
        pad = (-n) % chunk
        toks = jnp.stack(layer_tokens)                       # (4, N, P, 2C)
        toks = jnp.pad(toks, ((0, 0), (0, pad), (0, 0), (0, 0)))
        toks = toks.reshape(4, -1, chunk, *toks.shape[2:]).swapaxes(0, 1)

        def head_body(t4):
            return model.apply(
                p, [t4[i] for i in range(4)], patch_hw, hw,
                method="apply_depth_head",
            )

        depth_out = jax.lax.map(head_body, toks)             # (nc, chunk, H, W, 2)
        depth_out = depth_out.reshape(-1, *depth_out.shape[2:])[:n]
        depth, conf = decode_depth(depth_out.reshape(b, s, *hw, 2))

        extrinsic, intrinsic = pose_encoding_to_extri_intri(pose_enc[0], hw)
        points = unproject_depth_map_to_point_map(depth[0], extrinsic, intrinsic)
        return {
            "world_points": points,
            "conf": conf[0],
            "extrinsic": extrinsic,
            "colors": batch[0],
        }

    def call(images):
        if mesh is not None:
            # Frame-axis sharding in (when the frame count divides the mesh —
            # NamedSharding requires divisibility; otherwise inputs replicate
            # and the speedup comes from the head-sharded global attention,
            # the dominant term at large frame counts), head-sharded global
            # attention inside. The context only matters while `reconstruct`
            # TRACES; it is a per-factory jit instance, so the mesh never
            # flips for a given cache entry.
            from evoworld_tpu.ops.attention import head_sharded_attention

            images = jnp.asarray(images)
            sh = frame_sh if images.shape[0] % n_mesh_devices == 0 else replicated_sh
            images = jax.device_put(images, sh)
            with head_sharded_attention(mesh, min_seq=head_shard_min_seq):
                return reconstruct(params, images)
        # Restage offloaded params into HBM EAGERLY (PJRT DMA on the TPU
        # host); the transient device copy is dropped when the call returns,
        # so only the pinned-host copy survives into the denoise phase.
        p = jax.device_put(params, dev_sh) if dev_sh is not None else params
        # Align image placement with the params: on a multi-device mesh the
        # pipeline's perspective frames arrive replicated across all chips,
        # while VGGT runs single-device — mixed shardings fail jit.
        leaf = jax.tree_util.tree_leaves(p)[0]
        devices = getattr(leaf, "devices", None)
        if devices is not None and len(devices()) == 1:
            images = jax.device_put(jnp.asarray(images), next(iter(devices())))
        return reconstruct(p, images)

    return call
