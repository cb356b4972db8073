"""WaveGlow vocoder, TPU-native.

Rebuilds the flow architecture of ``/root/reference/waveglow/glow.py`` (12
flows of invertible-1x1-conv + WN affine coupling on audio grouped by 8, mel
conditioning upsampled by ConvTranspose(k=1024, s=256), early outputs of 2
channels every 4 flows) with TPU-first choices:

* channels-last [B, T, C] layout throughout (XLA TPU conv native layout);
  the public API accepts/returns the torch shapes ([B, n_mel, frames] mel in,
  [B, samples] audio out);
* the 8 per-layer 1x1 conditioning convs of each WN block
  (``glow.py:141-143,161``) are fused into ONE [640 -> 2*C*n_layers] matmul per
  block computed once outside the dilated-conv loop — numerically identical,
  8x fewer kernel launches and one big MXU op;
* the gated tanh/sigmoid activation (``glow.py:33-40``, the reference's single
  ``@torch.jit.script`` fused kernel) is left to XLA fusion here, with a Pallas
  fused variant in :mod:`..ops.pallas.gated` used on TPU;
* 1x1-conv logdet and inverse run in fp32 islands regardless of compute dtype
  (the reference keeps convinv fp32 under fp16 too, ``waveglow/inference.py:41-43``);
* inference is a single jitted reverse pass — no sequential dependency over
  time, so batched synthesis shards trivially over the frame axis/ICI.

Weight-normalized convs (``glow.py:123-152``) are explicitly parametrized as
(g, v); ``fold_weightnorm`` bakes them into plain kernels for serving
(replacing ``remove_weightnorm``, ``glow.py:294-302``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import WaveGlowConfig
from ..ops.pallas.gated import gated_activation


class WNConv(nn.Module):
    """1-D conv with weight normalization: kernel = g * v / ||v||, norms taken
    per output channel over (k, in) — torch ``weight_norm`` semantics.

    ``conv_impl`` picks the k>1 lowering: ``"xla_conv"`` (default,
    measured FASTER for fwd+bwd training: 599k vs 539k samples/s on v5e —
    XLA's dilated-conv kernels beat the shifted-matmul form, a negative
    result recorded in docs/KERNELS.md) or ``"taps"`` (k shifted matmuls,
    the serving kernels' formulation).  1x1 convs always lower to one
    einsum (that change took reference-config training 494k -> 599k).
    Identical math either way."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    conv_impl: str = "xla_conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, cin, cout = self.kernel_size, x.shape[-1], self.features
        v = self.param(
            "v",
            nn.initializers.lecun_normal(),
            (k, cin, cout),
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                v.reshape(-1, cout), axis=0
            ).reshape(shape),
            (cout,),
        )
        bias = self.param("bias", nn.initializers.zeros, (cout,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
        kernel = (v / norm * g[None, None, :]).astype(self.dtype)
        pad = self.dilation * (k - 1) // 2
        xc = x.astype(self.dtype)
        if k == 1:
            return jnp.einsum("btc,co->bto", xc, kernel[0]) + bias.astype(
                self.dtype
            )
        if self.conv_impl == "taps":
            T = xc.shape[1]
            xp = jnp.pad(xc, ((0, 0), (pad, pad), (0, 0)))
            y = jnp.einsum("btc,co->bto", xp[:, :T], kernel[0])
            for t in range(1, k):
                y = y + jnp.einsum(
                    "btc,co->bto",
                    xp[:, t * self.dilation : t * self.dilation + T],
                    kernel[t],
                )
            return y + bias.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            xc,
            kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias.astype(self.dtype)


def subpixel_upsample(x, kernel, bias, k: int, s: int):
    """The subpixel transposed-conv math on raw params: x [B, T, C_in],
    kernel [k, C_in, C_out], bias [C_out] -> [B, (T-1)*s + k, C_out].
    Shared by :class:`SubpixelUpsample` (the flax module) and the
    tensor-parallel serving path (``parallel/tp.py``) so the upsample
    lives ONCE (r4 review dedup)."""
    r = k // s
    B, T, cin = x.shape
    cout = kernel.shape[-1]
    kq = kernel.reshape(r, s, cin, cout)
    # y[b, t, q, p, o] = sum_i x[b, t, i] * kq[q, p, i, o]
    y = jnp.einsum("bti,qpio->btqpo", x, kq)
    out = jnp.zeros((B, T + r - 1, s, cout), y.dtype)
    for q in range(r):
        out = out.at[:, q : q + T].add(y[:, :, q])
    return out.reshape(B, (T + r - 1) * s, cout) + bias.astype(y.dtype)


class SubpixelUpsample(nn.Module):
    """Transposed-conv upsampling expressed as one MXU einsum + r shifted adds.

    Numerically identical to ``ConvTranspose1d(k, stride)`` with k = r*stride
    (the reference's mel upsampler, ``glow.py:183-185``: k=1024, s=256), but
    avoids the lhs-dilated convolution XLA lowers conv_transpose to — where
    255 of every 256 input positions are zeros.  Kernel layout matches flax
    ``ConvTranspose`` ((k, in, out)) so weights interconvert.
    """

    features: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, T, C_in] -> [B, (T-1)*stride + kernel, features]."""
        k, s, cout = self.kernel_size, self.stride, self.features
        assert k % s == 0, "subpixel path needs kernel % stride == 0"
        r = k // s
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, cin, cout)
        )
        bias = self.param("bias", nn.initializers.zeros, (cout,))
        return subpixel_upsample(
            x.astype(self.dtype), kernel.astype(self.dtype), bias, k, s)


class Invertible1x1Conv(nn.Module):
    """Invertible pointwise mixing across group channels with exact logdet
    (``glow.py:62-102``).  Initialized to a random rotation (det = +1).
    Matmul + slogdet stay fp32 for invertibility on TPU."""

    channels: int

    @nn.compact
    def __call__(self, z: jnp.ndarray, reverse: bool = False):
        c = self.channels

        def init_orthonormal(key, shape):
            w = jax.random.normal(key, shape, jnp.float32)
            q, _ = jnp.linalg.qr(w)
            q = jnp.where(jnp.linalg.det(q) < 0, q.at[:, 0].multiply(-1.0), q)
            return q

        W = self.param("W", init_orthonormal, (c, c)).astype(jnp.float32)
        zf = z.astype(jnp.float32)
        if reverse:
            W_inv = jnp.linalg.inv(W)
            return (zf @ W_inv.T).astype(z.dtype)
        out = (zf @ W.T).astype(z.dtype)
        _, logdet = jnp.linalg.slogdet(W)
        B, T = z.shape[0], z.shape[1]
        return out, B * T * logdet


class WN(nn.Module):
    """Non-causal WaveNet-style coupling net (``glow.py:105-175``):
    start 1x1 -> n_layers x [dilated conv 2C + fused cond + gated act +
    res/skip 1x1] -> zero-init end 1x1 producing (log_s, b)."""

    n_in_channels: int      # n_half
    n_channels: int = 512
    n_layers: int = 8
    kernel_size: int = 3
    dtype: Any = jnp.float32
    conv_impl: str = "xla_conv"

    @nn.compact
    def __call__(self, audio_half: jnp.ndarray, spect: jnp.ndarray,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """``mask``: optional ``[*, T, 1]`` validity mask (True = real
        position).  When given, the hidden state is re-zeroed before every
        dilated conv, so positions past the valid length contribute exactly
        what the conv zero padding of an exact-length call would — ONE
        fixed-width program then serves any *traced* valid length (the
        serving exact-pass path, ``WaveGlow.infer(length=...)``), instead
        of one XLA program per distinct short-utterance length."""
        C, L = self.n_channels, self.n_layers
        x = WNConv(C, 1, dtype=self.dtype, name="start")(audio_half)
        if mask is not None:
            x = jnp.where(mask, x, jnp.zeros_like(x))

        # All layers' conditioning projections as one fused matmul
        # (equivalent to the reference's per-layer cond_layers).
        cond_all = WNConv(2 * C * L, 1, dtype=self.dtype, name="cond")(spect)

        output = jnp.zeros(x.shape[:-1] + (C,), x.dtype)
        for i in range(L):
            in_act = WNConv(
                2 * C, self.kernel_size, dilation=2 ** i, dtype=self.dtype,
                conv_impl=self.conv_impl, name=f"in{i}",
            )(x)
            cond_i = cond_all[..., 2 * C * i : 2 * C * (i + 1)]
            acts = gated_activation(in_act, cond_i)
            res_skip_feats = 2 * C if i < L - 1 else C
            res_skip = WNConv(
                res_skip_feats, 1, dtype=self.dtype, name=f"res_skip{i}"
            )(acts)
            if i < L - 1:
                x = x + res_skip[..., :C]
                if mask is not None:
                    x = jnp.where(mask, x, jnp.zeros_like(x))
                output = output + res_skip[..., C:]
            else:
                output = output + res_skip

        end = nn.Conv(
            2 * self.n_in_channels,
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="end",
        )
        # coupling terms (log_s, b) back in fp32: exp/affine stays exact
        return end(output).astype(jnp.float32)  # [..., 0:n_half] = b, [..., n_half:] = log_s


class WaveGlow(nn.Module):
    """Full normalizing flow (``glow.py:178-292``).

    ``compute_dtype=jnp.bfloat16`` runs the WN/upsample matmuls MXU-native;
    the 1x1-conv inverse/logdet and the affine coupling arithmetic stay fp32
    (the reference's fp16-with-fp32-convinv policy, waveglow/inference.py:41-43).
    """

    cfg: WaveGlowConfig
    compute_dtype: Any = jnp.float32
    conv_impl: str = "xla_conv"
    remat: bool = False   # rematerialize WN blocks in backward: ~12x less
                          # activation memory (one block's instead of all
                          # flows'), +1 forward recompute — lets training
                          # batches ~4x past the non-remat HBM OOM point

    def setup(self):
        cfg = self.cfg
        self.upsample = SubpixelUpsample(
            cfg.n_mel_channels,
            cfg.upsample_kernel,
            cfg.upsample_stride,
            dtype=self.compute_dtype,
            name="upsample",
        )
        convinv = []
        wn = []
        n_half = cfg.n_group // 2
        n_rem = cfg.n_group
        wn_cls = nn.remat(WN) if self.remat else WN
        for k in range(cfg.n_flows):
            if k % cfg.n_early_every == 0 and k > 0:
                n_half -= cfg.n_early_size // 2
                n_rem -= cfg.n_early_size
            convinv.append(Invertible1x1Conv(n_rem, name=f"convinv{k}"))
            wn.append(
                wn_cls(
                    n_half,
                    cfg.wn_n_channels,
                    cfg.wn_n_layers,
                    cfg.wn_kernel_size,
                    dtype=self.compute_dtype,
                    conv_impl=self.conv_impl,
                    name=f"wn{k}",
                )
            )
        self.convinv = convinv
        self.wn = wn

    # -- shared helpers -----------------------------------------------------

    def _upsample_group_spect(self, spect: jnp.ndarray, n_samples: int | None):
        """[B, n_mel, frames] -> grouped conditioning [B, T_g, n_mel*n_group].

        Forward truncates the upsampled spect to the audio length
        (``glow.py:214-221``); inference trims the transposed-conv tail
        (``glow.py:252-258``).
        """
        cfg = self.cfg
        x = self.upsample(spect.transpose(0, 2, 1))     # [B, T_up, n_mel]
        if n_samples is None:
            cut = cfg.upsample_kernel - cfg.upsample_stride
            x = x[:, : x.shape[1] - cut]
        else:
            x = x[:, :n_samples]
        B, T, M = x.shape
        G = cfg.n_group
        T_g = T // G
        # unfold time into groups: [B, T_g, G, M] -> [B, T_g, M*G]
        # (matching torch's unfold(2, G, G) + view: channel-major within group)
        x = x[:, : T_g * G].reshape(B, T_g, G, M)
        x = x.transpose(0, 1, 3, 2).reshape(B, T_g, M * G)
        return x

    @staticmethod
    def _group_audio(audio: jnp.ndarray, n_group: int) -> jnp.ndarray:
        """[B, T] -> [B, T//G, G]."""
        B, T = audio.shape
        T_g = T // n_group
        return audio[:, : T_g * n_group].reshape(B, T_g, n_group)

    # -- training forward ---------------------------------------------------

    def __call__(self, spect: jnp.ndarray, audio: jnp.ndarray):
        """(mel [B, n_mel, frames], audio [B, T]) ->
        (z [B, T_g, n_group], log_s_total, log_det_w_total)
        — the flow forward pass (``glow.py:207-249``)."""
        cfg = self.cfg
        cond = self._upsample_group_spect(spect, audio.shape[1])
        x = self._group_audio(audio, cfg.n_group)
        cond = cond[:, : x.shape[1]]

        outputs = []
        log_s_total = jnp.float32(0.0)
        log_det_total = jnp.float32(0.0)
        for k in range(cfg.n_flows):
            if k % cfg.n_early_every == 0 and k > 0:
                outputs.append(x[..., : cfg.n_early_size])
                x = x[..., cfg.n_early_size :]

            x, log_det = self.convinv[k](x)
            log_det_total = log_det_total + log_det

            n_half = x.shape[-1] // 2
            x0, x1 = x[..., :n_half], x[..., n_half:]
            wn_out = self.wn[k](x0, cond)
            b = wn_out[..., :n_half]
            log_s = wn_out[..., n_half:]
            x1 = jnp.exp(log_s) * x1 + b
            log_s_total = log_s_total + jnp.sum(log_s)
            x = jnp.concatenate([x0, x1], axis=-1)

        outputs.append(x)
        z = jnp.concatenate(outputs, axis=-1)
        return z, log_s_total, log_det_total

    # -- inference ----------------------------------------------------------

    def infer(
        self,
        spect: jnp.ndarray,
        key: jax.Array | None,
        sigma: float = 1.0,
        noise: tuple[jnp.ndarray, ...] | None = None,
        length: jnp.ndarray | int | None = None,
    ):
        """mel [B, n_mel, frames] -> audio [B, samples]
        (``glow.py:251-292``): run flows in reverse from Gaussian noise,
        re-injecting sigma*z at the early-output points.

        ``noise`` optionally supplies the standard-normal draws explicitly
        (deterministic serving / cross-framework parity): a tuple whose first
        element is the initial [B, T_g, n_remaining_channels] draw, followed
        by one [B, T_g, n_early_size] draw per early-injection point in
        consumption order (descending k with k % n_early_every == 0, k > 0 —
        the order ``glow.py:270-289`` consumes them).

        ``length`` (optional, TRACED): valid mel frames.  The input must be
        zero-padded past ``length`` (mel AND noise); every WN hidden state
        is re-zeroed past it before each dilated conv, which makes the
        in-tensor zero tail contribute exactly what the conv zero padding
        of an exact ``length``-frame call contributes — so
        ``infer(padded, ..., length=t)[:, :t*hop]`` equals
        ``infer(exact_t,...)`` and ONE fixed-width compiled program serves
        every short-utterance length in serving (the exact-pass path used
        for sessions shorter than one vocoder window, which otherwise
        costs one multi-minute tunnel compile per distinct length).
        """
        cfg = self.cfg
        cond = self._upsample_group_spect(spect, None)
        B, T_g, _ = cond.shape
        mask = None
        if length is not None:
            gpf = cfg.upsample_stride // cfg.n_group
            mask = (
                jnp.arange(T_g)[None, :, None] < length * gpf
            )

        noise_iter = iter(noise) if noise is not None else None

        def next_noise(sub, shape):
            if noise_iter is not None:
                z = next(noise_iter, None)
                assert z is not None, (
                    "noise tuple exhausted: need 1 initial draw + one per "
                    "early-injection point"
                )
                assert z.shape == shape, (z.shape, shape)
                return jnp.asarray(z, cond.dtype)
            return jax.random.normal(sub, shape, cond.dtype)

        if key is None:
            key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        x = sigma * next_noise(sub, (B, T_g, cfg.n_remaining_channels))

        for k in reversed(range(cfg.n_flows)):
            n_half = x.shape[-1] // 2
            x0, x1 = x[..., :n_half], x[..., n_half:]
            wn_out = self.wn[k](x0, cond, mask)
            b = wn_out[..., :n_half]
            s = wn_out[..., n_half:]
            x1 = (x1 - b) * jnp.exp(-s)
            x = jnp.concatenate([x0, x1], axis=-1)
            x = self.convinv[k](x, reverse=True)

            if k % cfg.n_early_every == 0 and k > 0:
                key, sub = jax.random.split(key)
                z = sigma * next_noise(sub, (B, T_g, cfg.n_early_size))
                x = jnp.concatenate([z, x], axis=-1)

        return x.reshape(B, T_g * cfg.n_group)


def fold_weightnorm(params: dict) -> dict:
    """Bake (g, v) weight-norm parametrizations into plain kernels for
    serving (replaces ``remove_weightnorm``, ``glow.py:294-310``)."""

    def fold(tree):
        if isinstance(tree, dict):
            if set(tree.keys()) >= {"g", "v"}:
                v, g = tree["v"], tree["g"]
                norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
                folded = dict(tree)
                folded["v"] = v / norm * g[None, None, :]
                # WNConv normalizes v at every call; with g' = ||v'|| = |g|
                # the computed kernel equals v' exactly.
                folded["g"] = jnp.abs(g)
                return folded
            return {k: fold(v) for k, v in tree.items()}
        return tree

    return fold(params)
