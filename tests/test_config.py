"""Config system: include chains, overrides, bare flags, prefix keys."""
import os

import pytest

from egonerf_tpu.train.config import Config, export_config, load_config, parse_cli


def write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_include_chain_override_order(tmp_path):
    write(tmp_path, "root.txt", """
coordinates = yinyang
n_iters = 100000
batch_size = 4096
interval_th
r0 = 0.05
resampling
use_coarse_sample
n_lamb_sigma = [16,16,16]
N_voxel_init = 27000000 # 300**3
""")
    write(tmp_path, "mid.txt", """
include = ./root.txt
density_shift = -8
r0 = 0.03
near_far = [0.01, 15.]
""")
    leaf = write(tmp_path, "leaf.txt", """
include = ./mid.txt
expname = barbershop
TV_weight_density = 0
""")
    cfg = load_config(leaf)
    # deeper files override shallower ones
    assert cfg.r0 == 0.03
    assert cfg.coordinates_name == "yinyang"  # prefix key resolves
    assert cfg.interval_th is True and cfg.resampling is True
    assert cfg.use_coarse_sample is True
    assert cfg.n_lamb_sigma == [16, 16, 16]
    assert cfg.N_voxel_init == 27_000_000  # inline comment stripped
    assert cfg.near_far == [0.01, 15.0]
    assert cfg.expname == "barbershop"
    assert cfg.n_iters == 100000


def test_cli_overrides_all(tmp_path):
    leaf = write(tmp_path, "leaf.txt", "n_iters = 5000\nexpname = a\n")
    cfg = parse_cli(["--config", leaf, "--n_iters", "77", "--use_envmap"])
    assert cfg.n_iters == 77
    assert cfg.use_envmap is True
    assert cfg.expname == "a"


def test_bare_flags_for_int_typed_fields(tmp_path):
    """Several reference flags are 0/1 INTS (render_test, evaluation, ...);
    a valueless CLI flag or bare config line must coerce to 1, not crash
    on int(float('True'))."""
    cfg = parse_cli(["--render_test", "--render_train"])
    assert cfg.render_test == 1 and cfg.render_train == 1
    leaf = write(tmp_path, "bare.txt", "render_test\nexp_sampling\n")
    cfg2 = load_config(leaf)
    assert cfg2.render_test == 1 and cfg2.exp_sampling is True


def test_none_clears_optional_list_fields(tmp_path):
    """'upsamp_list = None' means the Optional default (disabled), not
    [None] — which would crash the trainer's event scheduler."""
    leaf = write(tmp_path, "none.txt",
                 "upsamp_list = None\nupdate_AlphaMask_list = None\n")
    cfg = load_config(leaf)
    assert cfg.upsamp_list is None
    assert cfg.update_AlphaMask_list is None


def test_unknown_key_raises(tmp_path):
    leaf = write(tmp_path, "bad.txt", "definitely_not_a_flag = 3\n")
    with pytest.raises(KeyError):
        load_config(leaf)


def test_export_config_roundtrip(tmp_path):
    leaf = write(tmp_path, "leaf.txt", "expname = exported\nn_iters = 42\n")
    cfg = load_config(leaf)
    logdir = str(tmp_path / "log")
    export_config(cfg, logdir)
    assert os.path.exists(os.path.join(logdir, "args.txt"))
    assert os.path.exists(os.path.join(logdir, "config.txt"))
    text = open(os.path.join(logdir, "args.txt")).read()
    assert "n_iters = 42" in text


def test_include_cycle_detected(tmp_path):
    a = write(tmp_path, "a.txt", "include = ./b.txt\n")
    write(tmp_path, "b.txt", "include = ./a.txt\n")
    with pytest.raises(ValueError):
        load_config(a)
