"""Mel frontend parity vs the reference extractor.

The reference's feature extraction happens inside the HF ASR pipeline
(vocalis/core/audio_pipeline.py:195-200). transformers'
WhisperFeatureExtractor is the local oracle — it reproduces
openai/whisper's extractor bit-for-bit, so allclose here is the
BASELINE.md "mel allclose" gate.
"""

import numpy as np
import pytest

from turbo_whisper_workspace_tpu.ops import mel


def _ref_features(audio_batch, num_mels):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=num_mels)
    out = fe(
        list(audio_batch),
        sampling_rate=mel.SAMPLE_RATE,
        return_tensors="np",
        padding="max_length",
    )
    return np.asarray(out.input_features)


@pytest.mark.parametrize("num_mels", [80, 128])
def test_log_mel_matches_reference(rng, num_mels):
    # mixture of tones + noise, various lengths (sub-30s gets zero-padded)
    clips = [
        np.sin(2 * np.pi * 440.0 * np.arange(16000 * 3) / 16000).astype(np.float32),
        rng.standard_normal(16000 * 30).astype(np.float32) * 0.1,
        rng.standard_normal(12345).astype(np.float32) * 0.5,
    ]
    ref = _ref_features(clips, num_mels)
    padded = np.stack([mel.pad_or_trim(c) for c in clips])
    ours = np.asarray(mel.log_mel_spectrogram(padded, num_mels=num_mels))
    assert ours.shape == ref.shape == (3, num_mels, mel.N_FRAMES)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=0)


def test_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank as hf_mel

    for num_mels in (80, 128):
        ref = hf_mel(
            num_frequency_bins=mel.N_FREQS,
            num_mel_filters=num_mels,
            min_frequency=0.0,
            max_frequency=8000.0,
            sampling_rate=mel.SAMPLE_RATE,
            norm="slaney",
            mel_scale="slaney",
        ).T  # transformers returns (n_freqs, n_mels)
        ours = mel.mel_filter_bank(num_mels)
        np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_int16_input_matches_f32(rng):
    # decoders emit int16 PCM; the frontend converts on device so the
    # H2D feed ships half the bytes (docs/SCALING.json host-feed gate)
    pcm = (rng.standard_normal(16000 * 2) * 3000).astype(np.int16)
    padded = mel.pad_or_trim(pcm)
    ours_i = np.asarray(mel.log_mel_spectrogram(padded))
    ours_f = np.asarray(
        mel.log_mel_spectrogram(padded.astype(np.float32) / 32768.0))
    np.testing.assert_allclose(ours_i, ours_f, atol=1e-6, rtol=0)


def test_pad_or_trim():
    x = np.ones(100, np.float32)
    assert mel.pad_or_trim(x).shape == (mel.N_SAMPLES,)
    assert mel.pad_or_trim(np.ones(mel.N_SAMPLES + 5)).shape == (mel.N_SAMPLES,)
    assert mel.pad_or_trim(x)[100:].sum() == 0
