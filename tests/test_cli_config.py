"""YAML experiment configs (`--config`) + run records (run.json).

The reference hardcodes hyperparameters at module scope
(Model.py:17-21, FCT.py:273-276) and records nothing about how a
checkpoint was produced; here configs are files, CLI flags win over
them, and every training command writes a reproducibility record."""

import argparse
import json
import os

import pytest

from tchvp_tpu.cli import _config_defaults, main


def _parser():
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--model", default="hybrid", choices=("hybrid", "ae4k"))
    p.add_argument("--fsdp", action="store_true")
    p.add_argument("--config", default=None)
    return p


def _write(tmp_path, text):
    f = tmp_path / "exp.yaml"
    f.write_text(text)
    return str(f)


def test_config_defaults_types_and_dashes(tmp_path):
    path = _write(tmp_path, "image-size: 64\nlr: 3e-4\nmodel: ae4k\nfsdp: true\n")
    out = _config_defaults(path, _parser())
    assert out == {"image_size": 64, "lr": 3e-4, "model": "ae4k", "fsdp": True}
    # string-typed numbers coerce through the flag's type=
    path2 = _write(tmp_path, "image-size: '128'\n")
    assert _config_defaults(path2, _parser()) == {"image_size": 128}


def test_config_defaults_rejects_unknown_and_bad_values(tmp_path):
    with pytest.raises(SystemExit, match="unknown key"):
        _config_defaults(_write(tmp_path, "imgsize: 64\n"), _parser())
    with pytest.raises(SystemExit, match="not in"):
        _config_defaults(_write(tmp_path, "model: resnet\n"), _parser())
    with pytest.raises(SystemExit, match="not a valid int"):
        _config_defaults(_write(tmp_path, "image-size: wide\n"), _parser())
    with pytest.raises(SystemExit, match="true/false"):
        _config_defaults(_write(tmp_path, "fsdp: 3\n"), _parser())
    with pytest.raises(SystemExit, match="mapping"):
        _config_defaults(_write(tmp_path, "- a\n- b\n"), _parser())


def test_cli_flags_override_config(tmp_path, capsys):
    """End-to-end through main(): the config sets the model and depth for
    `tchvp summary`; an explicit CLI flag must still win."""
    cfg = _write(tmp_path, "model: unet\nimage-size: 64\ndepth: 1\n")
    main(["summary", "--config", cfg])
    out = capsys.readouterr().out
    assert "UNet" in out and "7,763,041" in out  # the reference's count
    assert "Input: (1, 64, 64, 3)" in out  # image-size from the YAML

    main(["summary", "--config", cfg, "--model", "ae"])
    out = capsys.readouterr().out
    assert "UNet" not in out  # explicit --model beat the config's value
    assert "Input: (1, 64, 64, 3)" in out  # non-overridden keys still apply


def test_training_writes_run_record(tmp_path, capsys):
    """A tiny real train must leave run.json with the resolved flags
    (post-config merge), environment, and command."""
    cfg = _write(tmp_path, "epochs: 1\nbatch-size: 2\nimage-size: 64\n")
    ckdir = str(tmp_path / "ck")
    main([
        "video", "--config", cfg, "--model", "ae4k", "--synthetic", "1",
        "--clip-len", "2", "--checkpoint-dir", ckdir, "--save-every", "99",
    ])
    rec = json.loads(open(os.path.join(ckdir, "run.json")).read())
    assert rec["command"] == "video"
    assert rec["resolved_args"]["epochs"] == 1  # from the YAML
    assert rec["resolved_args"]["model"] == "ae4k"  # CLI value
    assert rec["resolved_args"]["checkpoint_dir"] == ckdir
    assert rec["environment"]["device_count"] >= 1
    assert "timestamp_utc" in rec and "argv" in rec


def test_cli_doctor_reports_environment(capsys):
    """`tchvp doctor` prints devices, cache states, the native-loader
    build, and the smoke matmul — the ops-side diagnostic."""
    main(["doctor", "--smoke"])
    out = capsys.readouterr().out
    assert "backend" in out and "devices:" in out
    assert "compile cache:" in out
    assert "autotune cache:" in out
    assert "native clippack loader:" in out
    assert "backend executes" in out
