"""VAD tests: the reference's own unit cases (vad.rs:211-298) plus a serial
python oracle replaying vad.rs:97-176 exactly over random energy sequences."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu.ops import VadConfig, vad_init, vad_scan
from audioflow_tpu.ops.dynamics import mean_square_energy
from audioflow_tpu.ops.vad import ENDING, SILENCE, SPEECH, vad_energy_db


class _OracleVad:
    """Line-by-line port of vad.rs VoiceActivityDetector (f32 arithmetic)."""

    def __init__(self, cfg: VadConfig):
        self.cfg = cfg
        self.smoothed = np.float32(0.0)
        self.silence = 0
        self.speech = 0
        self.state = SILENCE

    def detect(self, frame: np.ndarray) -> int:
        f = frame.astype(np.float32)
        energy = np.float32((f * f).sum() / len(f)) if len(f) else np.float32(0.0)
        a = np.float32(self.cfg.smoothing_factor)
        self.smoothed = np.float32(a * energy + (np.float32(1.0) - a) * self.smoothed)
        det = self.smoothed if self.cfg.smoothing_factor > 0.0 else energy
        dbfs = np.float32(-np.inf) if det <= 0 else np.float32(20.0) * np.log10(det)
        is_speech = dbfs > self.cfg.threshold_db
        if self.state == SILENCE:
            if is_speech:
                self.speech, self.silence, self.state = 1, 0, SPEECH
        elif self.state == SPEECH:
            if is_speech:
                self.speech += 1
                self.silence = 0
            else:
                self.silence += 1
                if self.silence >= self.cfg.silence_timeout_frames:
                    self.state = ENDING if self.speech >= self.cfg.min_speech_frames else SILENCE
                    self.speech = 0
        else:  # ENDING
            self.state = SILENCE
            self.silence = 0
        return self.state


def _run(frames, cfg):
    carry, states = vad_scan(jnp.asarray(frames), cfg)
    return carry, np.asarray(states)


def test_silence_detection():
    """vad.rs:211-223."""
    frames = np.full((1, 480), 0.0001, np.float32)
    _, states = _run(frames, VadConfig())
    assert states[0] == SILENCE


def test_speech_detection():
    """vad.rs:226-237."""
    frames = np.full((1, 480), 0.5, np.float32)
    _, states = _run(frames, VadConfig())
    assert states[0] == SPEECH


def test_state_transitions():
    """vad.rs:239-265: Speech -> (timeout) -> Ending -> Silence."""
    cfg = VadConfig(threshold_db=-50.0, silence_timeout_frames=2, min_speech_frames=1, smoothing_factor=0.0)
    frames = np.stack(
        [np.full(480, 0.5), np.full(480, 0.0001), np.full(480, 0.0001), np.full(480, 0.0001)]
    ).astype(np.float32)
    _, states = _run(frames, cfg)
    assert list(states) == [SPEECH, SPEECH, ENDING, SILENCE]


def test_short_speech_dropped():
    """Speech shorter than min_speech_frames ends in Silence, not Ending."""
    cfg = VadConfig(silence_timeout_frames=2, min_speech_frames=5, smoothing_factor=0.0)
    frames = np.concatenate(
        [np.full((2, 480), 0.5), np.full((3, 480), 0.0001)]
    ).astype(np.float32)
    _, states = _run(frames, cfg)
    assert ENDING not in states
    assert states[-1] == SILENCE


def test_energy_is_mean_square_not_rms():
    """vad.rs:284-298: energy(0.5 const) == 0.25, not 0.5."""
    e = float(mean_square_energy(jnp.full((480,), 0.5)))
    assert abs(e - 0.25) < 1e-4
    assert float(mean_square_energy(jnp.zeros(480))) == 0.0


@pytest.mark.parametrize("alpha", [0.0, 0.3, 1.0])
@pytest.mark.parametrize("seed", [1, 2])
def test_matches_serial_oracle(alpha, seed):
    rng = np.random.default_rng(seed)
    cfg = VadConfig(threshold_db=-30.0, smoothing_factor=alpha, silence_timeout_frames=4, min_speech_frames=2)
    # alternating bursts of loud/quiet frames
    amps = rng.choice([0.0001, 0.02, 0.4], size=200)
    frames = (rng.standard_normal((200, 160)) * amps[:, None]).astype(np.float32)
    oracle = _OracleVad(cfg)
    want = [oracle.detect(f) for f in frames]
    carry, got = _run(frames, cfg)
    assert list(got) == want
    np.testing.assert_allclose(float(carry.smoothed), oracle.smoothed, rtol=1e-5, atol=1e-9)
    assert int(carry.silence_frames) == oracle.silence
    assert int(carry.speech_frames) == oracle.speech


def test_streaming_carry_equivalence():
    rng = np.random.default_rng(3)
    cfg = VadConfig(threshold_db=-35.0)
    frames = (rng.standard_normal((60, 160)) * 0.1).astype(np.float32)
    c_full, s_full = _run(frames, cfg)
    c1, s1 = vad_scan(jnp.asarray(frames[:30]), cfg)
    c2, s2 = vad_scan(jnp.asarray(frames[30:]), cfg, carry=c1)
    assert list(np.concatenate([np.asarray(s1), np.asarray(s2)])) == list(s_full)


def test_energy_db_neg_inf_at_init():
    carry = vad_init()
    assert np.isneginf(float(vad_energy_db(carry)))


def test_vad_level_presets_plumbed():
    """Named levels resolve to VAD_LEVELS thresholds on nodes, graphs, specs,
    and config (vad.rs:8-17 / commands.rs:482-511 parity)."""
    from audioflow_tpu.config import UserConfig, graph_from_spec, graph_to_spec
    from audioflow_tpu.errors import AudioError
    from audioflow_tpu.graph import Vad, VadGate
    from audioflow_tpu.models import vad_graph
    from audioflow_tpu.ops.vad import VAD_LEVELS

    for name, cfg in VAD_LEVELS.items():
        assert Vad(level=name).threshold_db == cfg.threshold_db
        assert VadGate(level=name).threshold_db == cfg.threshold_db
        g = vad_graph(16000, level=name)
        assert g.nodes[0].threshold_db == cfg.threshold_db
        # GraphSpec round-trip preserves the resolved threshold
        g2 = graph_from_spec(graph_to_spec(g))
        assert g2.nodes[0].threshold_db == cfg.threshold_db

    with pytest.raises(AudioError):
        Vad(level="extreme")
    # explicit threshold wins when no level is set
    assert Vad(threshold_db=-33.0).threshold_db == -33.0
    # config carries a named default
    assert UserConfig().audio.vad_level == "balanced"
