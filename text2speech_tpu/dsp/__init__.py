"""Audio DSP: STFT/mel as MXU matmuls, jittable offline + online chains."""

from .audio import (  # noqa: F401
    amp_to_db,
    db_to_amp,
    denormalize_spec,
    griffin_lim,
    inv_linear_spectrogram,
    inv_mel_spectrogram,
    inv_mulaw,
    inv_mulaw_quantize,
    inv_preemphasis,
    frames_to_hours,
    get_duration,
    inv_spectrogram,
    linear_spectrogram,
    load_wav,
    mel_and_linear_spectrogram,
    mel_spectrogram,
    mulaw,
    mulaw_quantize,
    normalize_spec,
    preemphasis,
    save_wav,
    start_and_end_indices,
    trim_silence,
    trim_silence_bounds,
)
from .filters import fourier_basis, hann_window, mel_filterbank  # noqa: F401
from .mel import MelFrontend, dynamic_range_compression  # noqa: F401
from .stft import STFTParams, istft, num_frames, stft_mag_phase, stft_magnitude  # noqa: F401
