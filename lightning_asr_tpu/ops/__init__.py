from .frontend import MelFrontendConfig, log_mel_spectrogram, normalize_features, mel_num_frames
from .augment import spec_augment, cutout, sample_aug, sub_sequence_crop
from .ctc import ctc_loss
from .ctc_pallas import ctc_loss_pallas
from .lstm import LSTMWeights, lstm
from .lstm_pallas import lstm_pallas
from .masking import length_mask, lengths_from_percents, percents_from_lengths

__all__ = [
    "MelFrontendConfig",
    "log_mel_spectrogram",
    "normalize_features",
    "mel_num_frames",
    "spec_augment",
    "cutout",
    "sample_aug",
    "sub_sequence_crop",
    "ctc_loss",
    "ctc_loss_pallas",
    "lstm",
    "lstm_pallas",
    "LSTMWeights",
    "length_mask",
    "lengths_from_percents",
    "percents_from_lengths",
]
