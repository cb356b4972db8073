"""Frame-axis chunked WaveGlow synthesis for arbitrarily long utterances.

Implements the design written in ``docs/SCALING.md`` §Long-utterance: the
WaveGlow reverse pass has no sequential dependency across time, so a long
mel is split on the frame axis into fixed-width windows (chunk + overlap on
each side), every window is synthesized in ONE batched device call (the
window axis is an ordinary batch axis — it shards over the data mesh axis
like any batch, turning utterance length into free parallelism), and the
interiors are concatenated.

Equivalence story (tested in ``tests/test_chunked.py``):

* the standard-normal draws are made ONCE for the full utterance and sliced
  per window, so corresponding time positions see identical noise;
* the first/last windows are pinned to the utterance boundaries, so their
  outer edges see the exact same conv zero-padding as a single-pass
  ``WaveGlow.infer`` — bitwise the same computation;
* interior seams differ only within the receptive field of the dilated WN
  stacks; with ``overlap_frames * hop / n_group`` grouped steps of overlap
  larger than that receptive field, the kept interiors match single-pass
  inference to float tolerance.

Reference behavior being scaled: ``/root/reference/waveglow/glow.py:251-292``
(whole-utterance reverse pass; the reference has no long-form path and simply
grows activation memory linearly with utterance length).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import WaveGlowConfig
from .waveglow import WaveGlow


def noise_schedule(cfg: WaveGlowConfig) -> list[int]:
    """Channel widths of the standard-normal draws ``WaveGlow.infer``
    consumes, in consumption order: the initial draw, then one per
    early-injection point (descending k, ``glow.py:270-289``)."""
    widths = [cfg.n_remaining_channels]
    for k in reversed(range(cfg.n_flows)):
        if k % cfg.n_early_every == 0 and k > 0:
            widths.append(cfg.n_early_size)
    return widths


def draw_noise(
    cfg: WaveGlowConfig, key: jax.Array, batch: int, t_groups: int,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, ...]:
    """Draw the full-utterance noise tuple for ``WaveGlow.infer(noise=...)``."""
    draws = []
    for width in noise_schedule(cfg):
        key, sub = jax.random.split(key)
        draws.append(jax.random.normal(sub, (batch, t_groups, width), dtype))
    return tuple(draws)


def receptive_overlap_frames(cfg: WaveGlowConfig) -> int:
    """One-sided receptive field of the full flow stack, in mel frames.

    Each WN stack sees ``(kernel//2) * (2**n_layers - 1)`` grouped steps to
    each side; the flows compose, so the stack-total is ``n_flows`` times
    that, rounded up to whole frames (``gpf = hop // n_group`` grouped steps
    per frame) — PLUS the upsample transposed-conv's reach: each grouped
    conditioning step is a linear image of ``upsample_kernel/stride``
    consecutive mel frames, extending the dependency window by r-1 frames
    (omitting this term left the default ~3 frames short at reference size;
    verified empirically — interiors match exactly only past it).
    Overlapping by at least this many frames makes chunked interiors match
    single-pass inference to float tolerance.
    """
    per_flow = (cfg.wn_kernel_size // 2) * (2 ** cfg.wn_n_layers - 1)
    gpf = cfg.upsample_stride // cfg.n_group
    up_reach = cfg.upsample_kernel // cfg.upsample_stride - 1
    return -(-cfg.n_flows * per_flow // gpf) + up_reach


def infer_long(
    model: WaveGlow,
    variables: dict,
    spect: jnp.ndarray,
    key: jax.Array | None,
    sigma: float = 1.0,
    chunk_frames: int = 256,
    overlap_frames: int | None = None,
    noise: tuple[jnp.ndarray, ...] | None = None,
    fused: bool = False,
    int8_params: dict | None = None,
    mesh=None,
    data_axis: str = "data",
) -> jnp.ndarray:
    """mel [B, n_mel, frames] -> audio [B, frames * hop], chunked on frames.

    All windows have identical width (``chunk + 2*overlap`` frames; boundary
    windows are position-clamped, not shortened), so the stacked
    ``[B * n_windows]`` batch compiles once and runs as one device call.
    Falls back to a single pass when the utterance is shorter than one
    window.

    ``overlap_frames`` defaults to :func:`receptive_overlap_frames` — the
    flow stack's one-sided receptive field — so default-argument chunking
    keeps the documented interior equivalence at any config size; pass a
    smaller value explicitly to trade seam exactness for compute.

    ``noise`` optionally supplies the full-utterance draws explicitly (see
    :func:`draw_noise`); otherwise they are drawn from ``key``.  ``fused``
    vocodes each window through the fused-Pallas serving path
    (:func:`..models.waveglow_fused.infer_fused`) instead of the flax
    reverse pass — the production long-form serving configuration.
    ``int8_params`` (from :func:`..models.waveglow_fused.
    quantize_waveglow_int8`) routes each window through the int8 kernel
    path instead; ``variables`` is then unused.

    ``mesh``: shard the stacked window batch over ``mesh``'s ``data_axis``
    — SEQUENCE parallelism for free (SURVEY.md §5): WaveGlow has no
    dependency across time frames, so an arbitrarily long utterance's
    frame axis becomes window rows spread across chips on ICI.  The window
    count is padded to a multiple of the axis size (duplicate last window,
    discarded after), so any utterance length shards.  Composes with
    ``fused``/``int8_params`` — those windows run through ``shard_map``
    (each device's Pallas kernels see only its window rows; params
    replicated).  The window stack is assembled under jit with sharded
    output shardings, so no device ever holds the full stack; the
    full-utterance ``spect``/``noise`` inputs themselves do live on their
    source device (shard those upstream if the utterance alone exceeds one
    HBM).  A short utterance (``frames <= chunk + 2*overlap``) returns via
    the single-pass path UNSHARDED — one window has no frame parallelism
    to extract.
    """
    cfg = model.cfg
    if overlap_frames is None:
        overlap_frames = receptive_overlap_frames(cfg)
    hop = cfg.upsample_stride
    if hop % cfg.n_group != 0:
        raise ValueError("chunked synthesis needs hop % n_group == 0")
    gpf = hop // cfg.n_group          # audio groups per mel frame

    B, _, frames = spect.shape
    t_groups = frames * gpf
    if noise is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        noise = draw_noise(cfg, key, B, t_groups, jnp.float32)

    if int8_params is not None:
        from .waveglow_fused import infer_fused_int8

        def vocode_p(p, mel_w, noise_w):
            return infer_fused_int8(p, cfg, mel_w, None, sigma, noise=noise_w)

        vocode_params = int8_params
    elif fused:
        from .waveglow_fused import infer_fused

        def vocode_p(p, mel_w, noise_w):
            return infer_fused(p, cfg, mel_w, None, sigma, noise=noise_w)

        vocode_params = variables["params"]
    else:

        def vocode_p(p, mel_w, noise_w):
            return model.apply(
                p, mel_w, None, sigma, noise=noise_w, method=WaveGlow.infer,
            )

        vocode_params = variables

    def vocode(mel_w, noise_w):
        return vocode_p(vocode_params, mel_w, noise_w)

    width = chunk_frames + 2 * overlap_frames
    if frames <= width:
        return vocode(spect, noise)

    n_windows = -(-frames // chunk_frames)
    starts = [i * chunk_frames for i in range(n_windows)]
    win_starts = [
        min(max(s - overlap_frames, 0), frames - width) for s in starts
    ]

    # [n, B, ...] stacks -> [n*B, ...] batch
    n_pad = n_windows
    if mesh is not None:
        nd = mesh.shape[data_axis]
        n_pad = -(-n_windows // nd) * nd
    pad_starts = win_starts + [win_starts[-1]] * (n_pad - n_windows)

    def assemble(spect, noise):
        mel_w = jnp.concatenate(
            [spect[:, :, ws : ws + width] for ws in pad_starts], axis=0
        )
        noise_w = tuple(
            jnp.concatenate(
                [z[:, ws * gpf : (ws + width) * gpf] for ws in pad_starts],
                axis=0,
            )
            for z in noise
        )
        return mel_w, noise_w

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import shard_map_norep

        # each device materializes only ITS window rows (out_shardings on
        # the assembly jit), and the vocoder runs per-device on its shard
        # via shard_map — Pallas kernels (fused/int8) compose because every
        # device sees an ordinary unsharded [rows/nd, ...] batch
        sh = NamedSharding(mesh, P(data_axis))
        mel_w, noise_w = jax.jit(
            assemble, out_shardings=(sh, tuple(sh for _ in noise))
        )(spect, noise)
        dax = P(data_axis)
        audio_w = jax.jit(shard_map_norep(
            vocode_p, mesh,
            in_specs=(P(), dax, dax), out_specs=dax,
        ))(vocode_params, mel_w, noise_w)
    else:
        mel_w, noise_w = assemble(spect, noise)
        audio_w = vocode(mel_w, noise_w)   # [n_pad*B, width * hop]
    audio_w = audio_w.reshape(n_pad, B, width * hop)

    pieces = []
    for i, (s, ws) in enumerate(zip(starts, win_starts)):
        keep = min(chunk_frames, frames - s)
        off = (s - ws) * hop
        pieces.append(audio_w[i, :, off : off + keep * hop])
    return jnp.concatenate(pieces, axis=1)
