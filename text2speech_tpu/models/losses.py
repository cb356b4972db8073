"""Training losses.

``tacotron2_loss`` mirrors ``Tacotron2Loss`` (``/root/reference/tacotron/
loss_function.py:3-18``): MSE on decoder mels + MSE on postnet mels +
BCE-with-logits on the stop gate.  Padding is handled the reference's way —
model outputs are masked (mel->0 matching zero-padded targets, gate->1e3
matching gate target 1) so padded positions contribute ~0 loss.

``waveglow_loss`` mirrors ``WaveGlowLoss`` (``/root/reference/waveglow/
glow.py:43-59``): flow NLL = sum(z^2)/(2 sigma^2) - sum(log_s) - sum(log_det_W),
normalized by z's element count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise binary cross-entropy on logits."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def tacotron2_loss(
    mel_out: jnp.ndarray,       # [B, n_mel, T]
    mel_post: jnp.ndarray,      # [B, n_mel, T]
    gate_out: jnp.ndarray,      # [B, T] logits
    mel_target: jnp.ndarray,    # [B, n_mel, T]
    gate_target: jnp.ndarray,   # [B, T] in {0, 1}
) -> tuple[jnp.ndarray, dict]:
    mel_target = jax.lax.stop_gradient(mel_target)
    gate_target = jax.lax.stop_gradient(gate_target)
    # f32 accumulation under bf16 training (no-op for f32 inputs)
    mel_out = mel_out.astype(jnp.float32)
    mel_post = mel_post.astype(jnp.float32)
    gate_out = gate_out.astype(jnp.float32)
    mel_loss = jnp.mean((mel_out - mel_target) ** 2) + jnp.mean(
        (mel_post - mel_target) ** 2
    )
    gate_loss = jnp.mean(bce_with_logits(gate_out, gate_target))
    total = mel_loss + gate_loss
    return total, {"mel_loss": mel_loss, "gate_loss": gate_loss, "loss": total}


def waveglow_loss(
    z: jnp.ndarray,                 # [B, C, T_groups]
    log_s_total: jnp.ndarray,       # scalar: sum over flows of sum(log_s)
    log_det_w_total: jnp.ndarray,   # scalar: sum over flows of logdet terms
    sigma: float = 1.0,
) -> jnp.ndarray:
    # f32 accumulation: under bf16 training z arrives bf16, and a bf16
    # reduce over ~16k elements loses the NLL's low bits (no-op for f32).
    z = z.astype(jnp.float32)
    loss = (
        jnp.sum(z * z) / (2 * sigma * sigma) - log_s_total - log_det_w_total
    )
    return loss / (z.shape[0] * z.shape[1] * z.shape[2])
