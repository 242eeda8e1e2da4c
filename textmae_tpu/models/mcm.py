"""MCM — Masked Compression Model, TPU-native.

From-scratch JAX/flax re-design of the reference MCM
(/root/reference/models/Compression/MCM.py:25-968): a ViT-MAE autoencoder that
encodes only the score-selected top patches, with a channel-conditional
hyperprior entropy model between MAE-encoder output and MAE-decoder input.

Architecture (defaults match the reference constructor, MCM.py:34-52):
  encoder  : PatchEmbed 16x16 -> +sincos pos -> score masking (keep 144/196)
             -> cls -> 12 x Block(768, 12 heads) -> LN -> strip cls
  g_a      : 1x1 conv ladder 768->704->640->512->384 on the 12x12 token grid
  h_a      : 3x3 conv ladder 384->...->192, spatial 12->3
  h_s      : mean & scale synthesis back to 384 @ 12x12 (subpel upsampling)
  slices   : 12 x 32-channel slices, mu/sigma from cc-transforms conditioned on
             the first 6 decoded slices, +0.5*tanh(LRP) residual
  g_s      : 1x1 ladder 384->...->768
  decoder  : Linear 768->512, mask-token unshuffle via ids_restore,
             8 x Block(512, 16 heads), pred 512->768, strip first token

TPU-first choices (vs. the reference's CUDA/torch idioms):
  * score masking is vectorized XLA (textmae_tpu.masking), not a host loop,
  * the 12-slice chain is one `lax.scan` over stacked slice-net parameters
    with zero-padded support channels (see models/slice_nets.py),
  * NHWC conv layouts, bf16-able transformer stacks, f32 entropy math,
  * compress() device math is a single jit producing all slices' symbols and
    indexes (the host rANS coder runs outside, overlapped across batches);
    decompress() alternates a tiny per-slice jit with host stream decoding —
    exactly the data dependency the format imposes, and nothing more.

Behavioral quirks preserved deliberately (SURVEY.md §2.1):
  * the encoder strips cls before returning, so the "cls" token the decoder
    re-attaches (MCM.py:664,672) is actually the first kept patch token,
  * mask-token count is L + 1 - num_keep (MCM.py:660-662),
  * likelihoods use noise quantization in training, round-to-mu in eval,
    while the decoder path always sees STE-quantized values (MCM.py:741-784).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from textmae_tpu.entropy.entropy_bottleneck import EntropyBottleneck
from textmae_tpu.entropy.gaussian import (
    gaussian_build_indexes,
    gaussian_likelihood,
    gaussian_quantize_symbols,
)
from textmae_tpu.losses.vgg import VGG16Features, vgg_feature_loss
from textmae_tpu.masking import apply_masking
from textmae_tpu.models.slice_nets import StackedSliceNet
from textmae_tpu.ops.convs import Conv3x3, ConvStack1x1, SubpelConv3x3
from textmae_tpu.ops.patches import patchify, unpatchify
from textmae_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from textmae_tpu.ops.ssim import ssim as ssim_fn
from textmae_tpu.ops.ste import quantize_ste
from textmae_tpu.ops.vit import Block, PatchEmbed

Dtype = Any


@dataclasses.dataclass(frozen=True)
class MCMConfig:
    """Hyperparameters; defaults mirror MCM.__init__ (MCM.py:34-52)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    latent_depth: int = 384
    hyperprior_depth: int = 192
    num_slices: int = 12
    num_keep_patches: int = 144
    # canonical (ascending-index) kept-token order: the ids_restore side info
    # then codes as the kept SET (~log2 C(L,K) bits via coding/subset.py,
    # ~7.6x smaller than the permutation) and the latent grid keeps raster
    # locality. False reproduces the reference's score-ordered arrangement
    # (required when importing reference-trained checkpoints).
    canonical_keep_order: bool = True
    norm_pix_loss: bool = False
    dtype: Any = jnp.float32  # transformer compute dtype (bf16 for TPU training)
    use_pallas: bool = True
    remat: bool = False
    # matmul input dtype for the slice-net convs (cc mean/scale + LRP):
    # bfloat16 runs them on the MXU's fast path with f32 accumulation (the
    # chain is ~34% of forward FLOPs and f32 convs pay ~2x); None = exact
    # legacy f32 expressions (torch-oracle parity / bit-identity default).
    # Applied consistently in the forward AND both codec paths, so streams
    # stay self-consistent either way.
    slice_conv_dtype: Any = None
    # run slices >= max_support as ONE vmapped step instead of sequential
    # scan steps (they only read the context buffer, never extend it — the
    # same structural fact the codec's tail-parallel decode exploits).
    # Equivalence with the sequential form is suite-pinned; False restores
    # the fully sequential chain (measurement / debugging).
    slice_tail_parallel: bool = True
    # mixture-of-experts MAE encoder (V-MoE placement, parallel/moe.py):
    # every moe_every'th encoder block's MLP becomes moe_experts routed
    # expert FFNs. 0 = dense (reference semantics). Expert parallelism comes
    # from parallel.shard_moe_params placing the stacked expert weights over
    # an "expert" mesh axis; no reference counterpart (its parallelism is
    # DP-only, SURVEY.md §2.8).
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_every: int = 2
    moe_capacity_factor: float = 1.25

    def __post_init__(self):
        if self.img_size % self.patch_size:
            raise ValueError("img_size must be divisible by patch_size (MCM.py:511)")
        if self.latent_depth % self.num_slices:
            raise ValueError(
                f"num_slices ({self.num_slices}) must divide latent_depth "
                f"({self.latent_depth}) evenly"
            )
        if self.num_keep_patches > self.num_patches:
            raise ValueError(
                f"num_keep_patches ({self.num_keep_patches}) exceeds the "
                f"patch count ({self.num_patches})"
            )
        if self.keep_grid < 4:
            raise ValueError(
                "num_keep_patches grid must be >= 4x4: h_a downsamples the "
                "token grid twice by stride 2 (MCM.py:115-129)"
            )

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def keep_grid(self) -> int:
        g = int(round(self.num_keep_patches ** 0.5))
        if g * g != self.num_keep_patches:
            raise ValueError("num_keep_patches must be a perfect square (MCM.py:729)")
        return g

    @property
    def hyper_grid(self) -> int:
        """Hyperlatent grid side: h_a downsamples the keep grid 2x by stride 2."""
        return (self.keep_grid + 3) // 4

    @property
    def group_ch(self) -> int:
        return self.latent_depth // self.num_slices

    @property
    def max_support(self) -> int:
        return self.num_slices // 2

    # channel ladders -----------------------------------------------------
    @property
    def ga_channels(self):
        e, d, l = self.encoder_embed_dim, self.decoder_embed_dim, self.latent_depth
        return (int(d + (e - d) * 3 / 4), int(d + (e - d) * 2 / 4), d, l)

    @property
    def gs_channels(self):
        e, d = self.encoder_embed_dim, self.decoder_embed_dim
        return (d, int(d + (e - d) * 2 / 4), int(d + (e - d) * 3 / 4), e)

    @property
    def ha_channels(self):
        l, h = self.latent_depth, self.hyperprior_depth
        return (l, int(h + (l - h) * 3 / 4), int(h + (l - h) * 2 / 4), int(h + (l - h) / 4), h)

    @property
    def hs_channels(self):
        l, h = self.latent_depth, self.hyperprior_depth
        return (int(h + (l - h) / 4), int(h + (l - h) * 2 / 4), int(h + (l - h) * 3 / 4), l, l)

    @property
    def cc_channels(self):
        g, m = self.group_ch, self.max_support
        return (
            int(g * (m + 1)),
            int(g * (m * 3 / 4 + 1)),
            int(g * (m * 2 / 4 + 1)),
            int(g * (m * 1 / 4 + 1)),
            g,
        )


class MCM(nn.Module):
    config: MCMConfig = MCMConfig()

    def setup(self):
        cfg = self.config
        dt = cfg.dtype

        # ---------------- MAE encoder ----------------
        self.encoder_embed = PatchEmbed(cfg.patch_size, cfg.encoder_embed_dim, dtype=dt)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.encoder_embed_dim)
        )
        grid = cfg.img_size // cfg.patch_size
        self.encoder_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(cfg.encoder_embed_dim, grid, cls_token=True)
        )[None]
        if cfg.moe_experts > 0:
            from textmae_tpu.parallel.moe import MoEBlock

            moe_cls = nn.remat(MoEBlock) if cfg.remat else MoEBlock
            is_moe = lambda i: i % cfg.moe_every == cfg.moe_every - 1
        else:
            moe_cls, is_moe = None, lambda i: False
        self.encoder_blocks = [
            moe_cls(
                cfg.encoder_embed_dim,
                cfg.encoder_num_heads,
                num_experts=cfg.moe_experts,
                mlp_ratio=cfg.mlp_ratio,
                top_k=cfg.moe_top_k,
                capacity_factor=cfg.moe_capacity_factor,
                use_pallas=cfg.use_pallas,
                dtype=dt,
                name=f"encoder_blocks_{i}",
            )
            if is_moe(i)
            else Block(
                cfg.encoder_embed_dim,
                cfg.encoder_num_heads,
                mlp_ratio=cfg.mlp_ratio,
                use_pallas=cfg.use_pallas,
                dtype=dt,
                name=f"encoder_blocks_{i}",
            )
            for i in range(cfg.encoder_depth)
        ]
        self.encoder_norm = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")

        # ---------------- MAE decoder ----------------
        self.decoder_embed = nn.Dense(
            cfg.decoder_embed_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=dt,
            name="decoder_embed",
        )
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, cfg.decoder_embed_dim)
        )
        self.decoder_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(cfg.decoder_embed_dim, grid, cls_token=True)
        )[None]
        self.decoder_blocks = [
            Block(
                cfg.decoder_embed_dim,
                cfg.decoder_num_heads,
                mlp_ratio=cfg.mlp_ratio,
                use_pallas=cfg.use_pallas,
                dtype=dt,
                name=f"decoder_blocks_{i}",
            )
            for i in range(cfg.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6, name="decoder_norm")
        self.decoder_pred = nn.Dense(
            cfg.patch_size ** 2 * cfg.in_chans,
            kernel_init=nn.initializers.xavier_uniform(),
            name="decoder_pred",
        )

        # ---------------- hyperprior transforms ----------------
        self.g_a = ConvStack1x1(cfg.ga_channels, name="g_a")
        self.g_s = ConvStack1x1(cfg.gs_channels, name="g_s")
        ha = cfg.ha_channels
        self.h_a_convs = [
            Conv3x3(ha[i], stride=(1, 1, 2, 1, 2)[i], name=f"h_a_{i}") for i in range(5)
        ]
        hs = cfg.hs_channels
        self.h_s_mean_layers = self._make_hs("h_s_mean", hs)
        self.h_s_scale_layers = self._make_hs("h_s_scale", hs)

        cc_in = cfg.latent_depth + cfg.group_ch * cfg.max_support
        lrp_in = cfg.latent_depth + cfg.group_ch * (cfg.max_support + 1)
        self.cc_transform_mean = StackedSliceNet(
            cfg.num_slices, cc_in, cfg.cc_channels, name="cc_transform_mean"
        )
        self.cc_transform_scale = StackedSliceNet(
            cfg.num_slices, cc_in, cfg.cc_channels, name="cc_transform_scale"
        )
        self.lrp_transform = StackedSliceNet(
            cfg.num_slices, lrp_in, cfg.cc_channels, name="lrp_transform"
        )

        self.entropy_bottleneck = EntropyBottleneck(
            cfg.hyperprior_depth, name="entropy_bottleneck"
        )

    def _make_hs(self, prefix, hs):
        return [
            Conv3x3(hs[0], name=f"{prefix}_0"),
            SubpelConv3x3(hs[1], r=2, name=f"{prefix}_1"),
            Conv3x3(hs[2], name=f"{prefix}_2"),
            SubpelConv3x3(hs[3], r=2, name=f"{prefix}_3"),
            Conv3x3(hs[4], name=f"{prefix}_4"),
        ]

    # ------------------------------------------------------------------
    # MAE encoder / decoder
    # ------------------------------------------------------------------
    def forward_encoder(self, imgs: jnp.ndarray, total_scores: jnp.ndarray):
        """(N, C, H, W), (N, L) -> kept tokens (N, K, D) and ids_restore (N, L).
        Mirrors MCM.forward_encoder (MCM.py:590-634)."""
        cfg = self.config
        x = self.encoder_embed(imgs)
        x = x + self.encoder_pos_embed[:, 1:, :].astype(x.dtype)
        x_remain, ids_restore = apply_masking(
            x, total_scores, cfg.num_keep_patches, canonical=cfg.canonical_keep_order
        )
        cls = (self.cls_token + self.encoder_pos_embed[:, :1, :]).astype(x.dtype)
        cls = jnp.broadcast_to(cls, (x_remain.shape[0], 1, cls.shape[-1]))
        x_remain = jnp.concatenate([cls, x_remain], axis=1)
        for blk in self.encoder_blocks:
            x_remain = blk(x_remain)
        x_remain = self.encoder_norm(x_remain.astype(jnp.float32))
        return x_remain[:, 1:, :], ids_restore

    def forward_decoder(self, x_remain: jnp.ndarray, ids_restore: jnp.ndarray) -> jnp.ndarray:
        """Token unshuffle + decoder stack (MCM.py:636-688, quirks preserved)."""
        cfg = self.config
        x_decode = self.decoder_embed(x_remain)
        n = x_decode.shape[0]
        l_full = ids_restore.shape[1]
        num_mask = l_full + 1 - x_decode.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token.astype(x_decode.dtype), (n, num_mask, cfg.decoder_embed_dim)
        )
        x_ = jnp.concatenate([x_decode[:, 1:, :], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x = jnp.concatenate([x_decode[:, :1, :], x_], axis=1)
        x = x + self.decoder_pos_embed.astype(x.dtype)
        for blk in self.decoder_blocks:
            x = blk(x)
        x = self.decoder_norm(x.astype(jnp.float32))
        x = self.decoder_pred(x)
        return x[:, 1:, :]

    # ------------------------------------------------------------------
    # hyperprior pieces
    # ------------------------------------------------------------------
    def _tokens_to_grid(self, x_remain: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        g = cfg.keep_grid
        return x_remain.reshape(-1, g, g, cfg.encoder_embed_dim).astype(jnp.float32)

    def _grid_to_tokens(self, y: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        return y.reshape(-1, cfg.num_keep_patches, cfg.encoder_embed_dim)

    def run_h_a(self, y: jnp.ndarray) -> jnp.ndarray:
        x = y
        for i, conv in enumerate(self.h_a_convs):
            x = conv(x)
            if i < len(self.h_a_convs) - 1:
                x = nn.gelu(x, approximate=False)
        return x

    def run_h_s(self, layers, z_hat: jnp.ndarray) -> jnp.ndarray:
        x = z_hat
        for i, layer in enumerate(layers):
            x = layer(x)
            if i < len(layers) - 1:
                x = nn.gelu(x, approximate=False)
        # odd keep grids (e.g. 7 for keep=49 / 75% masked): the two subpel x2
        # stages overshoot ceil(g/4)*4; crop back to the latent grid. Exact
        # for grids divisible by 4 (the reference only works for those).
        g = self.config.keep_grid
        return x[:, :g, :g, :]

    def _split_slices(self, y: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, latent) -> (S, N, H, W, g) matching torch chunk order."""
        cfg = self.config
        n, h, w, _ = y.shape
        return y.reshape(n, h, w, cfg.num_slices, cfg.group_ch).transpose(3, 0, 1, 2, 4)

    def _merge_slices(self, slices: jnp.ndarray) -> jnp.ndarray:
        """(S, N, H, W, g) -> (N, H, W, latent) matching torch cat order."""
        s, n, h, w, g = slices.shape
        return slices.transpose(1, 2, 3, 0, 4).reshape(n, h, w, s * g)

    def _support(self, buf: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        """mean/scale support: latents (N,H,W,latent) ++ decoded-slice buffer."""
        return jnp.concatenate([latents, buf], axis=-1)

    # Shared slice-chain core. The codec's bit-identity contract (see
    # eval/codec.py) requires the training scan, the one-jit encode path and
    # the per-slice decode programs to compute mu/sigma/LRP with the SAME
    # expression trees; these three helpers are the single definition all
    # call sites use — edit here, never inline at a call site.
    def _slice_mu_sigma(self, buf, latent_means, latent_scales, apply_mean, apply_scale):
        """Per-slice context math: (mu, sigma, mean_support) from the buffer
        and hyper latents. `apply_*` bind the slice's conv net (stacked-scan
        or per-slice module form)."""
        mean_support = self._support(buf, latent_means)
        scale_support = self._support(buf, latent_scales)
        return apply_mean(mean_support), apply_scale(scale_support), mean_support

    def _lrp_refine(self, y_hat, mean_support, apply_lrp):
        """Latent residual prediction: y_hat += 0.5*tanh(lrp(support ++ y_hat))
        (MCM.py:252-293, applied at :779-784)."""
        lrp_support = jnp.concatenate([mean_support, y_hat], axis=-1)
        return y_hat + 0.5 * jnp.tanh(apply_lrp(lrp_support))

    def _buf_update(self, buf, y_hat, slice_index):
        """Write slice `slice_index` into the context buffer (first
        max_support slices only — later slices never serve as context)."""
        g = self.config.group_ch
        return jax.lax.cond(
            slice_index < self.config.max_support,
            lambda b: jax.lax.dynamic_update_slice(
                b, y_hat, (0, 0, 0, slice_index * g)
            ),
            lambda b: b,
            buf,
        )

    def _slice_scan(
        self,
        y: jnp.ndarray,
        latent_means: jnp.ndarray,
        latent_scales: jnp.ndarray,
        noise_rng: Optional[jax.Array],
    ):
        """Run the 12-slice conditional chain as one lax.scan.

        Returns (y_hat (N,H,W,latent), y_likelihoods (N,H,W,latent)).
        """
        cfg = self.config
        y_slices = self._split_slices(y)
        s, n, h, w, g = y_slices.shape

        ccm_k, ccm_b = self.cc_transform_mean.stacked_params()
        ccs_k, ccs_b = self.cc_transform_scale.stacked_params()
        lrp_k, lrp_b = self.lrp_transform.stacked_params()

        if noise_rng is not None:
            noises = jax.random.uniform(noise_rng, y_slices.shape, jnp.float32, -0.5, 0.5)
        else:
            noises = jnp.zeros_like(y_slices)

        buf0 = jnp.zeros((n, h, w, g * cfg.max_support), jnp.float32)
        idxs = jnp.arange(s, dtype=jnp.int32)

        def step(buf, xs):
            i, y_slice, noise, (cm_k, cm_b), (cs_k, cs_b), (lp_k, lp_b) = xs
            mu, sigma, mean_support = self._slice_mu_sigma(
                buf,
                latent_means,
                latent_scales,
                lambda x: StackedSliceNet.apply_one(cm_k, cm_b, x, cfg.slice_conv_dtype),
                lambda x: StackedSliceNet.apply_one(cs_k, cs_b, x, cfg.slice_conv_dtype),
            )
            if noise_rng is not None:
                y_for_lik = y_slice + noise
            else:
                y_for_lik = jnp.round(y_slice - mu) + mu
            lik = gaussian_likelihood(y_for_lik, sigma, mu)
            y_hat = self._lrp_refine(
                quantize_ste(y_slice - mu) + mu,
                mean_support,
                lambda x: StackedSliceNet.apply_one(lp_k, lp_b, x, cfg.slice_conv_dtype),
            )
            return self._buf_update(buf, y_hat, i), (y_hat, lik)

        m = cfg.max_support if cfg.slice_tail_parallel else s
        take = lambda tree, sl: jax.tree.map(lambda a: a[sl], tree)
        head_xs = take(
            (idxs, y_slices, noises, (ccm_k, ccm_b), (ccs_k, ccs_b), (lrp_k, lrp_b)),
            slice(0, m),
        )
        buf_final, (y_hat_head, lik_head) = jax.lax.scan(step, buf0, head_xs)

        # TAIL PARALLELISM: _buf_update never writes slices >= max_support, so
        # slices m..s-1 depend only on buf_final, not on each other — they run
        # as ONE vmapped step instead of s-m sequential scan steps (the same
        # structural fact eval/codec.py's tail-parallel decode exploits; the
        # shared helpers keep the expression trees — and therefore the bits —
        # identical to the sequential form, suite-pinned).
        def tail_one(y_slice, noise, cm, cs, lp):
            mu, sigma, mean_support = self._slice_mu_sigma(
                buf_final,
                latent_means,
                latent_scales,
                lambda x: StackedSliceNet.apply_one(cm[0], cm[1], x, cfg.slice_conv_dtype),
                lambda x: StackedSliceNet.apply_one(cs[0], cs[1], x, cfg.slice_conv_dtype),
            )
            if noise_rng is not None:
                y_for_lik = y_slice + noise
            else:
                y_for_lik = jnp.round(y_slice - mu) + mu
            lik = gaussian_likelihood(y_for_lik, sigma, mu)
            y_hat = self._lrp_refine(
                quantize_ste(y_slice - mu) + mu,
                mean_support,
                lambda x: StackedSliceNet.apply_one(lp[0], lp[1], x, cfg.slice_conv_dtype),
            )
            return y_hat, lik

        y_hat_tail, lik_tail = jax.vmap(tail_one)(
            *take((y_slices, noises), slice(m, s)),
            take((ccm_k, ccm_b), slice(m, s)),
            take((ccs_k, ccs_b), slice(m, s)),
            take((lrp_k, lrp_b), slice(m, s)),
        )
        y_hat_slices = jnp.concatenate([y_hat_head, y_hat_tail])
        y_liks = jnp.concatenate([lik_head, lik_tail])
        return self._merge_slices(y_hat_slices), self._merge_slices(y_liks)

    # ------------------------------------------------------------------
    # losses
    # ------------------------------------------------------------------
    def forward_loss(
        self, imgs: jnp.ndarray, preds: jnp.ndarray, vgg_variables=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(ssim_loss, l1_loss, vgg_loss) — MCM.forward_loss (MCM.py:690-712)."""
        cfg = self.config
        recon = unpatchify(preds.astype(jnp.float32), cfg.patch_size, cfg.in_chans)
        imgs = imgs.astype(jnp.float32)
        ssim_loss = 1.0 - ssim_fn(recon, imgs, data_range=1.0)
        l1_loss = jnp.abs(recon - imgs).mean()
        if vgg_variables is not None:
            vgg = VGG16Features()
            vgg_loss = vgg_feature_loss(
                vgg, jax.lax.stop_gradient(vgg_variables), recon, imgs
            )
        else:
            vgg_loss = jnp.float32(0.0)
        return ssim_loss, l1_loss, vgg_loss

    # ------------------------------------------------------------------
    # forward (training / entropy estimation)
    # ------------------------------------------------------------------
    def __call__(
        self,
        imgs: jnp.ndarray,
        total_scores: jnp.ndarray,
        training: bool = False,
        vgg_variables=None,
        compute_loss: bool = True,
    ) -> Dict:
        """Full R-D forward pass (MCM.forward, MCM.py:714-803).

        Returns {loss: (ssim, l1, vgg), likelihoods: {y, z}, x_hat, aux_loss}.
        """
        x_remain, ids_restore = self.forward_encoder(imgs, total_scores)
        y = self.g_a(self._tokens_to_grid(x_remain))
        z = self.run_h_a(y)

        if training:
            eb_rng = self.make_rng("noise")
            slice_rng = self.make_rng("noise")
        else:
            eb_rng = slice_rng = None

        _, z_likelihood = self.entropy_bottleneck(z, rng=eb_rng, training=training)
        medians = self.entropy_bottleneck.medians().reshape(1, 1, 1, -1)
        z_hat = quantize_ste(z - medians) + medians

        latent_scales = self.run_h_s(self.h_s_scale_layers, z_hat)
        latent_means = self.run_h_s(self.h_s_mean_layers, z_hat)

        y_hat, y_likelihood = self._slice_scan(y, latent_means, latent_scales, slice_rng)

        y_hat_tokens = self._grid_to_tokens(self.g_s(y_hat))
        preds = self.forward_decoder(y_hat_tokens.astype(self.config.dtype), ids_restore)
        preds = preds.astype(jnp.float32)

        out = {
            "likelihoods": {"y": y_likelihood, "z": z_likelihood},
            "x_hat": unpatchify(preds, self.config.patch_size, self.config.in_chans),
            "aux_loss": self.entropy_bottleneck.aux_loss(),
            "ids_restore": ids_restore,
        }
        if compute_loss:
            out["loss"] = self.forward_loss(imgs, preds, vgg_variables)
        return out

    # ------------------------------------------------------------------
    # codec device halves (host rANS lives in textmae_tpu.eval.codec)
    # ------------------------------------------------------------------
    def encode_device(
        self, imgs: jnp.ndarray, total_scores: jnp.ndarray, scale_table: jnp.ndarray
    ) -> Dict:
        """Device math for compress (MCM.py:805-894): one jit for everything.

        Produces z symbols and all 12 slices' (symbols, indexes) so the host
        coder never waits on the device mid-stream.
        """
        cfg = self.config
        x_remain, ids_restore = self.forward_encoder(imgs, total_scores)
        y = self.g_a(self._tokens_to_grid(x_remain))
        z = self.run_h_a(y)

        medians = self.entropy_bottleneck.medians().reshape(1, 1, 1, -1)
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        z_hat = z_sym.astype(jnp.float32) + medians

        latent_scales = self.run_h_s(self.h_s_scale_layers, z_hat)
        latent_means = self.run_h_s(self.h_s_mean_layers, z_hat)

        y_slices = self._split_slices(y)
        s, n, h, w, g = y_slices.shape
        ccm_k, ccm_b = self.cc_transform_mean.stacked_params()
        ccs_k, ccs_b = self.cc_transform_scale.stacked_params()
        lrp_k, lrp_b = self.lrp_transform.stacked_params()
        buf0 = jnp.zeros((n, h, w, g * cfg.max_support), jnp.float32)
        idxs = jnp.arange(s, dtype=jnp.int32)

        def step(buf, xs):
            i, y_slice, (cm_k, cm_b), (cs_k, cs_b), (lp_k, lp_b) = xs
            mu, sigma, mean_support = self._slice_mu_sigma(
                buf,
                latent_means,
                latent_scales,
                lambda x: StackedSliceNet.apply_one(cm_k, cm_b, x, cfg.slice_conv_dtype),
                lambda x: StackedSliceNet.apply_one(cs_k, cs_b, x, cfg.slice_conv_dtype),
            )
            index = gaussian_build_indexes(sigma, scale_table)
            y_q = gaussian_quantize_symbols(y_slice, mu)
            y_hat = self._lrp_refine(
                y_q.astype(jnp.float32) + mu,
                mean_support,
                lambda x: StackedSliceNet.apply_one(lp_k, lp_b, x, cfg.slice_conv_dtype),
            )
            return self._buf_update(buf, y_hat, i), (y_q, index)

        _, (symbols, indexes) = jax.lax.scan(
            step, buf0, (idxs, y_slices, (ccm_k, ccm_b), (ccs_k, ccs_b), (lrp_k, lrp_b))
        )
        return {
            "z_sym": z_sym,  # (N, hz, wz, Cz)
            "z_shape": z.shape[1:3],
            "symbols": symbols,  # (S, N, H, W, g)
            "indexes": indexes,  # (S, N, H, W, g)
            "ids_restore": ids_restore,
        }

    def encode_front(self, imgs: jnp.ndarray, total_scores: jnp.ndarray) -> Dict:
        """Analysis front half: images -> (y grid, z symbols, ids_restore).

        Used by MCMCodec's bit-safe compress path: everything downstream of
        z_sym (hyper synthesis, slice mu/sigma) runs through the SAME jitted
        programs as decompress, so encoder and decoder see bit-identical
        floats (XLA programs are deterministic; *different* fusions of the
        same math need not be).
        """
        x_remain, ids_restore = self.forward_encoder(imgs, total_scores)
        y = self.g_a(self._tokens_to_grid(x_remain))
        z = self.run_h_a(y)
        medians = self.entropy_bottleneck.medians().reshape(1, 1, 1, -1)
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        return {"y": y, "z_sym": z_sym, "ids_restore": ids_restore}

    def quantize_slice(self, y: jnp.ndarray, mu: jnp.ndarray, slice_index) -> jnp.ndarray:
        """Symbols round(y_slice - mu) for slice `slice_index` of the y grid."""
        g = self.config.group_ch
        y_slice = jax.lax.dynamic_slice_in_dim(y, slice_index * g, g, axis=-1)
        return gaussian_quantize_symbols(y_slice, mu)

    def decode_hyper(self, z_hat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """z_hat -> (latent_means, latent_scales) (MCM.py:900-904)."""
        return (
            self.run_h_s(self.h_s_mean_layers, z_hat),
            self.run_h_s(self.h_s_scale_layers, z_hat),
        )

    def decode_slice_params(
        self,
        buf: jnp.ndarray,
        latent_means: jnp.ndarray,
        latent_scales: jnp.ndarray,
        slice_index: int,
        scale_table: jnp.ndarray,
    ):
        """Per-slice mu/sigma/indexes for host stream decoding (MCM.py:921-944)."""
        mu, sigma, mean_support = self._slice_mu_sigma(
            buf,
            latent_means,
            latent_scales,
            lambda x: self.cc_transform_mean(x, slice_index),
            lambda x: self.cc_transform_scale(x, slice_index),
        )
        return mu, gaussian_build_indexes(sigma, scale_table), mean_support

    def decode_slice_update(
        self,
        buf: jnp.ndarray,
        mean_support: jnp.ndarray,
        mu: jnp.ndarray,
        symbols: jnp.ndarray,
        slice_index: int,
    ):
        """Incorporate host-decoded symbols into the running slice buffer."""
        y_hat = self._lrp_refine(
            symbols.astype(jnp.float32) + mu,
            mean_support,
            lambda x: self.lrp_transform(x, slice_index),
        )
        return self._buf_update(buf, y_hat, slice_index), y_hat

    def decode_tail_params(
        self,
        buf: jnp.ndarray,
        latent_means: jnp.ndarray,
        latent_scales: jnp.ndarray,
        scale_table: jnp.ndarray,
    ):
        """mu/indexes for ALL tail slices (max_support..num_slices-1) at once.

        The context buffer freezes after slice max_support-1 (MCM.py:755-768
        uses only the first 6 decoded slices), so tail slices are mutually
        independent: one dispatch + one host round trip decodes all of them,
        collapsing the decode alternation count from num_slices to
        max_support+1. The reference's per-slice loop serializes them
        needlessly.
        """
        cfg = self.config
        mean_support = self._support(buf, latent_means)
        scale_support = self._support(buf, latent_scales)
        t0 = cfg.max_support
        ccm_k, ccm_b = self.cc_transform_mean.stacked_params()
        ccs_k, ccs_b = self.cc_transform_scale.stacked_params()
        tail_m = ([k[t0:] for k in ccm_k], [b[t0:] for b in ccm_b])
        tail_s = ([k[t0:] for k in ccs_k], [b[t0:] for b in ccs_b])

        def one(mk, mb, sk, sb):
            mu = StackedSliceNet.apply_one(mk, mb, mean_support, cfg.slice_conv_dtype)
            sigma = StackedSliceNet.apply_one(sk, sb, scale_support, cfg.slice_conv_dtype)
            return mu, gaussian_build_indexes(sigma, scale_table)

        mu, index = jax.vmap(one)(tail_m[0], tail_m[1], tail_s[0], tail_s[1])
        return mu, index, mean_support  # (T, N, h, w, g) each

    def decode_tail_update(
        self,
        mean_support: jnp.ndarray,
        mu_stack: jnp.ndarray,
        sym_stack: jnp.ndarray,
    ) -> jnp.ndarray:
        """Stacked y_hat for the tail slices from their decoded symbols."""
        cfg = self.config
        t0 = cfg.max_support
        lrp_k, lrp_b = self.lrp_transform.stacked_params()
        tail = ([k[t0:] for k in lrp_k], [b[t0:] for b in lrp_b])

        def one(lk, lb, mu, sym):
            return self._lrp_refine(
                sym.astype(jnp.float32) + mu,
                mean_support,
                lambda x: StackedSliceNet.apply_one(lk, lb, x, cfg.slice_conv_dtype),
            )

        return jax.vmap(one)(tail[0], tail[1], mu_stack, sym_stack)

    def quantize_tail(self, y: jnp.ndarray, mu_stack: jnp.ndarray) -> jnp.ndarray:
        """Symbols for all tail slices: round(y_tail - mu) stacked (T,N,h,w,g)."""
        cfg = self.config
        g, t0 = cfg.group_ch, cfg.max_support
        n, h, w, _ = y.shape
        t = cfg.num_slices - t0
        y_tail = y[..., t0 * g :].reshape(n, h, w, t, g).transpose(3, 0, 1, 2, 4)
        return gaussian_quantize_symbols(y_tail, mu_stack)

    def decode_slice_step(
        self,
        buf: jnp.ndarray,
        mean_support_prev: jnp.ndarray,
        mu_prev: jnp.ndarray,
        sym_prev: jnp.ndarray,
        latent_means: jnp.ndarray,
        latent_scales: jnp.ndarray,
        prev_index,
        next_index,
        scale_table: jnp.ndarray,
    ):
        """Fused: finish slice `prev_index` (buf update) + params for
        `next_index`. One dispatch instead of two in the decode alternation;
        compress shares this exact program so buf stays bit-identical."""
        buf, y_hat_prev = self.decode_slice_update(
            buf, mean_support_prev, mu_prev, sym_prev, prev_index
        )
        mu, index, mean_support = self.decode_slice_params(
            buf, latent_means, latent_scales, next_index, scale_table
        )
        return buf, y_hat_prev, mu, index, mean_support

    def decode_device(
        self,
        z_sym: jnp.ndarray,
        symbols: jnp.ndarray,
        ids_restore: jnp.ndarray,
    ) -> jnp.ndarray:
        """Device math for decompress as ONE jit: entropy-decoded symbols ->
        reconstructed image (mirror of encode_device's slice scan; the host
        rANS stage in between is the only non-XLA step of the codec).

        Mainly the AOT-export unit (eval/export.py): together with
        encode_device it pins the full device codec math in a serialized
        artifact. The interactive codec path keeps the per-slice programs
        (eval/codec.py) because streaming decode needs symbols slice by
        slice; this method needs them all up front.
        """
        cfg = self.config
        medians = self.entropy_bottleneck.medians().reshape(1, 1, 1, -1)
        z_hat = z_sym.astype(jnp.float32) + medians
        latent_scales = self.run_h_s(self.h_s_scale_layers, z_hat)
        latent_means = self.run_h_s(self.h_s_mean_layers, z_hat)

        s, n, h, w, g = symbols.shape
        ccm_k, ccm_b = self.cc_transform_mean.stacked_params()
        ccs_k, ccs_b = self.cc_transform_scale.stacked_params()
        lrp_k, lrp_b = self.lrp_transform.stacked_params()
        buf0 = jnp.zeros((n, h, w, g * cfg.max_support), jnp.float32)
        idxs = jnp.arange(s, dtype=jnp.int32)

        def step(buf, xs):
            i, sym, (cm_k, cm_b), (cs_k, cs_b), (lp_k, lp_b) = xs
            mu, _sigma, mean_support = self._slice_mu_sigma(
                buf,
                latent_means,
                latent_scales,
                lambda x: StackedSliceNet.apply_one(cm_k, cm_b, x, cfg.slice_conv_dtype),
                lambda x: StackedSliceNet.apply_one(cs_k, cs_b, x, cfg.slice_conv_dtype),
            )
            y_hat = self._lrp_refine(
                sym.astype(jnp.float32) + mu,
                mean_support,
                lambda x: StackedSliceNet.apply_one(lp_k, lp_b, x, cfg.slice_conv_dtype),
            )
            return self._buf_update(buf, y_hat, i), y_hat

        _, y_hat_slices = jax.lax.scan(
            step,
            buf0,
            (idxs, symbols, (ccm_k, ccm_b), (ccs_k, ccs_b), (lrp_k, lrp_b)),
        )
        y_hat = y_hat_slices.transpose(1, 2, 3, 0, 4).reshape(n, h, w, s * g)
        return self.decode_finish(y_hat, ids_restore)

    def decode_finish(self, y_hat: jnp.ndarray, ids_restore: jnp.ndarray) -> jnp.ndarray:
        """All decoded slices -> reconstructed image (MCM.py:954-968)."""
        cfg = self.config
        y_hat_tokens = self._grid_to_tokens(self.g_s(y_hat))
        preds = self.forward_decoder(y_hat_tokens.astype(cfg.dtype), ids_restore)
        return unpatchify(preds.astype(jnp.float32), cfg.patch_size, cfg.in_chans)
