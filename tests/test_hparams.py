import os

import yaml

from diffsvc_tpu.config import HParams, load_config_chain, set_hparams
from diffsvc_tpu.config.hparams import parse_hparams_string, save_hparams


def test_base_config_chain(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"a": 1, "b": {"x": 1, "y": 2}, "c": "base"}))
    child = tmp_path / "child.yaml"
    child.write_text(yaml.safe_dump(
        {"base_config": [str(base)], "b": {"y": 3}, "c": "child"}))
    cfg = load_config_chain(str(child))
    assert cfg["a"] == 1
    assert cfg["b"] == {"x": 1, "y": 3}  # nested child-overrides-parent
    assert cfg["c"] == "child"


def test_shipped_serving_profiles_resolve():
    """The shipped fast/turbo profiles must resolve through the config
    chain to the documented sampler levers (they inherit everything else
    from config_44k.yaml, so a chain regression silently changes what
    users serve)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fast = load_config_chain(os.path.join(repo, "configs/config_44k_fast.yaml"))
    assert (fast["sampler"], fast["pndm_speedup"],
            fast["sampler_clip_x0"], fast["dpmpp_grid"]) == \
        ("dpmpp", 50, 1.0, "lambda")
    turbo = load_config_chain(
        os.path.join(repo, "configs/config_44k_turbo.yaml"))
    assert (turbo["sampler"], turbo["pndm_speedup"],
            turbo["sampler_clip_x0"]) == ("dpmpp", 100, 1.0)
    # both stay reference-checkpoint compatible (the model geometry is
    # config_44k's)
    for prof in (fast, turbo):
        assert prof["residual_layers"] == 20
        assert prof["residual_channels"] == 384
        assert prof["audio_num_mel_bins"] == 128


def test_relative_base_config(tmp_path):
    (tmp_path / "base.yaml").write_text(yaml.safe_dump({"a": 10}))
    child = tmp_path / "child.yaml"
    child.write_text(yaml.safe_dump({"base_config": "base.yaml", "b": 2}))
    cfg = load_config_chain(str(child))
    assert cfg == {"a": 10, "b": 2}


def test_hparams_string_coercion():
    hp = HParams(lr=0.1, n=5, flag=False, name="x")
    parse_hparams_string(hp, "lr=0.5,n=7,flag=true,name=y,new_key=z")
    assert hp["lr"] == 0.5 and hp["n"] == 7 and hp["flag"] is True
    assert hp["name"] == "y" and hp["new_key"] == "z"


def test_work_dir_saved_config_precedence(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg_fn = tmp_path / "cfg.yaml"
    cfg_fn.write_text(yaml.safe_dump({"lr": 0.1, "work_dir": ""}))
    hp = set_hparams(str(cfg_fn), exp_name="exp1", print_hparams=False,
                     global_hparams=False, reset=True)
    assert hp["work_dir"].endswith(os.path.join("checkpoints", "exp1"))
    hp["lr"] = 0.9
    save_hparams(hp)
    # without reset, saved config wins over file config
    hp2 = set_hparams(str(cfg_fn), exp_name="exp1", print_hparams=False,
                      global_hparams=False, reset=False)
    assert hp2["lr"] == 0.9
    # with reset, file config wins
    hp3 = set_hparams(str(cfg_fn), exp_name="exp1", print_hparams=False,
                      global_hparams=False, reset=True)
    assert hp3["lr"] == 0.1
