"""Prebuilt pipeline families (the five benchmark configs, BASELINE.md) and a
trainable feature-frontend for gradient-based use."""

from .pipelines import (
    beat_graph,
    cqt_frontend,
    delta_fbank_frontend,
    denoise_master_chain,
    eq_bands_default,
    eq_chain_graph,
    kaldi_fbank_frontend,
    kws_frontend,
    log_mel_frontend,
    master_chain_graph,
    onset_frontend,
    stft_magnitude_graph,
    vad_graph,
    wire_egress_graph,
)
from .trainable import TrainableFrontend, make_train_step

__all__ = [
    "TrainableFrontend",
    "beat_graph",
    "cqt_frontend",
    "onset_frontend",
    "eq_bands_default",
    "eq_chain_graph",
    "log_mel_frontend",
    "make_train_step",
    "master_chain_graph",
    "stft_magnitude_graph",
    "kaldi_fbank_frontend",
    "vad_graph",
    "wire_egress_graph",
]
