import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops
from audioflow_tpu.config import (
    ConfigManager,
    EnvKeyStorage,
    FileKeyStorage,
    UserConfig,
    dumps_toml,
    graph_from_spec,
    graph_to_spec,
    loads_toml,
)
from audioflow_tpu.errors import ConfigError
from audioflow_tpu.graph import BiquadChain, MelProject, Power, Resample, Stft, chain


def test_toml_round_trip():
    cfg = UserConfig()
    cfg.audio.sample_rate = 44100
    cfg.api.language_code = "zh"
    text = dumps_toml(cfg.to_dict())
    back = UserConfig.from_dict(loads_toml(text))
    assert back.audio.sample_rate == 44100
    assert back.api.language_code == "zh"
    assert back.session.chunk_in == cfg.session.chunk_in


def test_config_manager_save_load(tmp_path):
    p = tmp_path / "cfg.toml"
    m = ConfigManager(p)
    m.update(lambda c: setattr(c.audio, "n_mels", 80))
    m.save()
    m2 = ConfigManager(p)
    cfg = m2.load()
    assert cfg.audio.n_mels == 80


def test_config_manager_update_closure():
    """Read-modify-write parity (manager.rs:142-147)."""
    m = ConfigManager("/nonexistent/never-written.toml")
    out = m.update(lambda c: setattr(c.obs, "log_level", "debug"))
    assert out.obs.log_level == "debug"
    assert m.current().obs.log_level == "debug"
    # snapshots are isolated
    snap = m.current()
    snap.obs.log_level = "warn"
    assert m.current().obs.log_level == "debug"


def test_missing_file_keeps_defaults(tmp_path):
    m = ConfigManager(tmp_path / "missing.toml")
    cfg = m.load()
    assert cfg.audio.sample_rate == 48000


def test_unknown_key_rejected():
    with pytest.raises(ConfigError):
        UserConfig.from_dict({"audio": {"bogus_knob": 1}})
    with pytest.raises(ConfigError):
        UserConfig.from_dict({"mystery_section": {}})


def test_bad_toml_raises(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text("this is [not toml")
    with pytest.raises(ConfigError):
        ConfigManager(p).load()


def test_env_key_storage(monkeypatch):
    s = EnvKeyStorage()
    monkeypatch.setenv("AUDIOFLOW_API_KEY_ELEVENLABS", "sk-test")
    assert s.retrieve("elevenlabs") == "sk-test"
    monkeypatch.delenv("AUDIOFLOW_API_KEY_ELEVENLABS")
    monkeypatch.setenv("AUDIOFLOW_API_KEY", "sk-fallback")
    assert s.retrieve("elevenlabs") == "sk-fallback"
    monkeypatch.delenv("AUDIOFLOW_API_KEY")
    with pytest.raises(ConfigError):
        s.retrieve("elevenlabs")


def test_file_key_storage(tmp_path):
    s = FileKeyStorage(tmp_path / "secrets.json")
    s.store("elevenlabs", "sk-1")
    s.store("elevenlabs", "sk-2")  # upsert
    assert s.retrieve("elevenlabs") == "sk-2"
    assert (tmp_path / "secrets.json").stat().st_mode & 0o777 == 0o600
    s.delete("elevenlabs")
    s.delete("elevenlabs")  # deleting absent key tolerated
    with pytest.raises(ConfigError):
        s.retrieve("elevenlabs")


def test_graph_spec_round_trip(rng):
    g = chain(
        Resample(48000, 16000, "kaiser"),
        BiquadChain((ops.highpass(80.0, 16000.0), ops.peaking(1000.0, 16000.0, 3.0))),
        Stft(512, 128, center=False),
        Power(),
        MelProject(n_mels=40),
        input_rate=48000,
    )
    spec = graph_to_spec(g)
    g2 = graph_from_spec(spec)
    assert g2.nodes == g.nodes
    x = jnp.asarray(rng.standard_normal(9600).astype(np.float32))
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(g2(x)), atol=1e-6)


def test_graph_spec_unknown_node():
    with pytest.raises(ConfigError):
        graph_from_spec({"nodes": [{"type": "Bogus"}], "input_rate": 16000})
    with pytest.raises(ConfigError):
        graph_from_spec({"nodes": [{"type": "Gain", "nope": 1}], "input_rate": 16000})
